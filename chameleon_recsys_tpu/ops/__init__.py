from .sampling import sample_negatives, sample_from_buffer
from .rnn import ugrnn_scan, gru_scan, lstm_scan, StackedUGRNN, StackedGRU, StackedLSTM
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
    "StackedGRU",
    "StackedLSTM",
    "lstm_scan",
    "log_base",
    "log1p_base",
    "masked_moments",
    "normalize_values",
    "min_max_normalization",
]
