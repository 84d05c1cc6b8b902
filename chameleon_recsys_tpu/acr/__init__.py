from .trainer import ACRTrainer, export_ace_pickle

__all__ = ["ACRTrainer", "export_ace_pickle"]
