from .collate import Session, collate_sessions
from .synthetic import SyntheticCorpus, synthetic_hour_sessions

__all__ = [
    "Session",
    "collate_sessions",
    "SyntheticCorpus",
    "synthetic_hour_sessions",
]
