from .steps import NARTrainState, build_nar_train, nar_init_state

__all__ = ["NARTrainState", "build_nar_train", "nar_init_state"]
