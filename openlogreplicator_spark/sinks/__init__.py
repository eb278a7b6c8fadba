from openlogreplicator_spark.sinks.json_stream import (  # noqa: F401
    JsonFormat,
    change_stream_brackets,
    change_stream_messages,
    change_stream_ops,
    json_schema_columns_for,
    write_change_stream,
)
from openlogreplicator_spark.sinks.kafka import (  # noqa: F401
    kafka_records,
    produce,
)
from openlogreplicator_spark.sinks.network import (  # noqa: F401
    NetworkWriter,
    serve_change_stream,
)
from openlogreplicator_spark.sinks.protobuf_stream import (  # noqa: F401
    protobuf_stream_messages,
    protobuf_stream_ops,
    write_protobuf_stream,
)
