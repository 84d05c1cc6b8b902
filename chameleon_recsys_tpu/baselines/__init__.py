from .benchmarks import BenchmarkRecommender, StreamStateView
from .recently_popular import RecentlyPopularRecommender
from .content_based import ContentBasedRecommender
from .item_cooccurrence import ItemCooccurrenceRecommender
from .item_knn import ItemKNNRecommender
from .sequential_rules import SequentialRulesRecommender
from .session_knn import SessionBasedKNNRecommender

__all__ = [
    "BenchmarkRecommender",
    "StreamStateView",
    "RecentlyPopularRecommender",
    "ContentBasedRecommender",
    "ItemCooccurrenceRecommender",
    "ItemKNNRecommender",
    "SequentialRulesRecommender",
    "SessionBasedKNNRecommender",
]
