from .nar import NARModel, NAROutputs, NARAux, l2_regularization
from .towers import FeatureTowers

__all__ = ["NARModel", "NAROutputs", "NARAux", "FeatureTowers", "l2_regularization"]
