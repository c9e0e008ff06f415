"""factstore_spark — a PySpark-native fact/event store + analytics engine.

Re-expresses the capabilities of the reference event store (see
SURVEY.md) Spark-first: DataFrame plans for all reads, a transactional
commit protocol for appends, Structured Streaming for subscriptions,
plus large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) under ``factstore_spark.operators``.
"""

from .model import (
    AllConditions,
    ExpectedLastFact,
    Fact,
    FactInput,
    FactPayload,
    NoCondition,
    ReadDirection,
    ReplayStart,
    StartPosition,
    StoreMetadata,
    TagOnlyQueryItem,
    TagQuery,
    TagQueryBased,
    TagTypeItem,
    TimeRange,
)
from .store import FactStore

__all__ = [
    "FactStore",
    "Fact",
    "FactInput",
    "FactPayload",
    "StoreMetadata",
    "TimeRange",
    "ReadDirection",
    "TagQuery",
    "TagOnlyQueryItem",
    "TagTypeItem",
    "NoCondition",
    "ExpectedLastFact",
    "AllConditions",
    "TagQueryBased",
    "StartPosition",
    "ReplayStart",
]

__version__ = "0.1.0"
