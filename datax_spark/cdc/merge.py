"""Latest-wins dedupe + validation split for CDC micro-batches.

Reference contract: keyed apply where the LAST event per key wins (mysqlwriter
``ON DUPLICATE KEY UPDATE``, WriterUtil.java:111-168; otswriter
PUT/UPDATE/DELETE_ROW, OTSOpType.java:3-8). A replayed micro-batch may carry
many events for one key (multiple Us, D-then-I resurrection); only the event
with the greatest ``seq`` survives into the MERGE source.

Scale note — dedupe is ``groupBy(key).agg(max_by(payload, seq))`` rather than a
row_number window: aggregation gets a map-side partial combine (hot keys are
pre-collapsed on every input partition before the shuffle), so a key with 10^4
updates in one epoch ships O(partitions) rows through the shuffle instead of
10^4. That plus AQE skew handling is the explicit hot-conv_id answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.cdc.schema import KEY_COLS, OP_COL, SEQ_COL, VALID_OPS_SQL


def dirty_reason_expr():
    """Malformation rules (ErrorRecordChecker.java:18-82 semantics — bad records
    are quarantined, never applied, and counted against an error limit):
    null/empty key parts, negative turn_idx, unknown op, null payload."""
    return (
        F.when(F.col("conv_id").isNull() | (F.col("conv_id") == ""), F.lit("null_key"))
        .when(F.col("turn_idx").isNull() | (F.col("turn_idx") < 0), F.lit("bad_turn_idx"))
        .when(~F.col(OP_COL).isin(*VALID_OPS_SQL), F.lit("bad_op"))
        .when((F.col(OP_COL) != "D") & F.col("text").isNull(), F.lit("null_payload"))
    )


def split_valid_dirty(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Validate events; returns (valid, dirty-with-reason)."""
    tagged = batch.withColumn("_dirty_reason", dirty_reason_expr())
    valid = tagged.filter(F.col("_dirty_reason").isNull()).drop("_dirty_reason")
    dirty = tagged.filter(F.col("_dirty_reason").isNotNull())
    return valid, dirty


def make_arrow_validator(op_col: str = OP_COL):
    """Arrow-side twin of :func:`dirty_reason_expr` for the zero-shuffle
    aligned apply path, where events never pass through Catalyst. Returns a
    picklable closure ``table -> StringArray`` (reason, NULL = valid). The
    rule set and priority order MUST stay in sync with dirty_reason_expr."""
    valid_ops = [s.strip("'") for s in VALID_OPS_SQL]

    def validate(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        conv = t.column("conv_id").combine_chunks()
        turn = t.column("turn_idx").combine_chunks()
        op = t.column(op_col).combine_chunks()
        text = t.column("text").combine_chunks()
        null_key = pc.fill_null(
            pc.or_kleene(pc.is_null(conv), pc.equal(conv, "")), True
        )
        bad_turn = pc.fill_null(
            pc.or_kleene(pc.is_null(turn), pc.less(turn, 0)), True
        )
        bad_op = pc.fill_null(
            pc.invert(pc.is_in(op, value_set=pa.array(valid_ops))), True
        )
        null_payload = pc.fill_null(
            pc.and_kleene(pc.not_equal(op, "D"), pc.is_null(text)), False
        )
        reason = pc.if_else(
            null_payload, pa.scalar("null_payload"), pa.nulls(len(conv), pa.string())
        )
        reason = pc.if_else(bad_op, pa.scalar("bad_op"), reason)
        reason = pc.if_else(bad_turn, pa.scalar("bad_turn_idx"), reason)
        reason = pc.if_else(null_key, pa.scalar("null_key"), reason)
        return reason

    return validate


def dedupe_latest(batch: DataFrame, key_cols: list[str] | None = None, seq_col: str = SEQ_COL) -> DataFrame:
    """One row per key: the event with max seq (vectorized, map-side combined)."""
    key_cols = key_cols or KEY_COLS
    payload = [c for c in batch.columns if c not in key_cols]
    ordered = [seq_col] + [c for c in payload if c != seq_col]
    agg = batch.groupBy(*key_cols).agg(F.max(F.struct(*ordered)).alias("_latest"))
    return agg.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in ordered])
