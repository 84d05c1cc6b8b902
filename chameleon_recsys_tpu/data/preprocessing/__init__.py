from .tokenization import (
    build_vocabulary,
    convert_tokens_to_int,
    simple_word_tokenize,
)
from .word_embeddings import build_embedding_matrix_for_vocab
from .sessionization import sessionize_clicks
from .time_features import cycled_feature, local_time_features

__all__ = [
    "build_vocabulary",
    "convert_tokens_to_int",
    "simple_word_tokenize",
    "build_embedding_matrix_for_vocab",
    "sessionize_clicks",
    "cycled_feature",
    "local_time_features",
]
