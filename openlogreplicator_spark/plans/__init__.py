from openlogreplicator_spark.plans.replay import replay_batch, bootstrap_target

__all__ = ["replay_batch", "bootstrap_target"]
