"""The ONE Spark-type -> Oracle-type dispatch shared by both wire formats.

The reference renders column types in its JSON schema section by NAME
(OutputBufferJson.cpp:270-358) and in its protobuf ``Schema.column``
sub-messages by the OraProtoBuf ColumnType ENUM (OraProtoBuf.pb.h); both
derive from the same dictionary type. This module is the format-neutral
home of that mapping so the two sinks can never drift on a type and
neither has to import the other (round-5 review finding: json_stream
previously reached into protobuf_stream for a private constant).
"""

# Spark simpleString -> (Oracle type NAME as the reference's JSON schema
# renders it, OraProtoBuf ColumnType enum value)
SPARK_TO_ORACLE = {
    "string": ("varchar2", 1),       # VARCHAR2
    "int": ("number", 2),            # NUMBER
    "bigint": ("number", 2),
    "smallint": ("number", 2),
    "tinyint": ("number", 2),
    "decimal": ("number", 2),
    "boolean": ("number", 2),        # NUMBER(1)
    "float": ("binary_float", 9),    # BINARY_FLOAT
    "double": ("binary_double", 10),  # BINARY_DOUBLE
    "binary": ("raw", 5),            # RAW
    "date": ("date", 4),             # DATE
    "timestamp": ("timestamp", 13),  # TIMESTAMP
}
