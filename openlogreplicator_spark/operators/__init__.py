from openlogreplicator_spark.operators.decode import decode_events
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_sql,
    assemble_transactions_pandas,
)
from openlogreplicator_spark.operators.lww import net_changes

__all__ = [
    "decode_events",
    "assemble_transactions_sql",
    "assemble_transactions_pandas",
    "net_changes",
]
