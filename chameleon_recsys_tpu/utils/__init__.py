from .io import (
    append_json_lines,
    deserialize,
    save_eval_benchmark_metrics_csv,
    serialize,
)

__all__ = [
    "append_json_lines",
    "deserialize",
    "save_eval_benchmark_metrics_csv",
    "serialize",
]
