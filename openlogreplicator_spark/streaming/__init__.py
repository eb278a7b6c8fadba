from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline
from openlogreplicator_spark.streaming.state import PendingStore

__all__ = ["CDCStreamPipeline", "PendingStore"]
