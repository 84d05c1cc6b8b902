from .sampling import sample_negatives, sample_from_buffer
from .rnn import ugrnn_scan, gru_scan, StackedUGRNN
from .normalization import (
    log_base,
    log1p_base,
    masked_moments,
    normalize_values,
    min_max_normalization,
)

__all__ = [
    "sample_negatives",
    "sample_from_buffer",
    "ugrnn_scan",
    "gru_scan",
    "StackedUGRNN",
    "log_base",
    "log1p_base",
    "masked_moments",
    "normalize_values",
    "min_max_normalization",
]
