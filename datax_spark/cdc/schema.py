"""Canonical schemas for the transcripts table and its change feed.

Shapes fixed by FIXTURES.md / the target contract: a multi-turn
conversation/agent transcript table keyed by (conv_id, turn_idx) and a
binlog/WAL-style change feed with op ∈ {I,U,D} (the row-level collapse of the
reference change-stream reader's op taxonomy, otsstreamreader
SingleVerAndUpOnlyModeRecordSender.java:43-52).
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_COLS = ["conv_id", "turn_idx"]
SEQ_COL = "seq"
OP_COL = "op"
TS_COL = "ts"
VALID_OPS_SQL = ["I", "U", "D"]

TRANSCRIPTS_SCHEMA_V1 = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TOOL_FIELD = T.StructField("tool", T.StringType(), True)

TRANSCRIPTS_SCHEMA_V2 = T.StructType(list(TRANSCRIPTS_SCHEMA_V1.fields) + [TOOL_FIELD])


def changes_schema(with_tool: bool) -> T.StructType:
    fields = [
        T.StructField("seq", T.LongType(), False),
        T.StructField("epoch_hint", T.IntegerType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
    if with_tool:
        fields.append(T.StructField("tool", T.StringType(), True))
    fields.append(T.StructField("ts", T.TimestampType(), True))
    return T.StructType(fields)


CHANGES_SCHEMA_V1 = changes_schema(False)
CHANGES_SCHEMA_V2 = changes_schema(True)
