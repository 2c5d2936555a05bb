"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC fold on sf0.001; ``queries()`` exposes
one callable per implemented operator (SURVEY.md §2 mapping) and
``oracle_sql()`` the equivalent DuckDB SQL over the same parquet views.

The CDC-flavored queries derive a deterministic change feed from the driver's
``events`` table (seq = event_id, key = (user_id, event_id % 100), op from
event_id % 20) so that the engine's latest-wins fold — the core MERGE-apply
semantic (datax_spark.cdc.merge.dedupe_latest) — is checkable against a plain
ANSI-SQL window oracle. The full stateful engine (lake table, checkpoints,
exactly-once manifests) is exercised by tests/ and bench.py, which replay a
synthetic transcript feed and compare against an independent Python fold.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datax_spark.cdc.merge import dedupe_latest  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------- CDC queries

def _derived_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.pmod(F.col("event_id"), F.lit(20)) == 0, F.lit("D"))
        .when(F.pmod(F.col("event_id"), F.lit(20)) < 6, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("user_id"),
        F.pmod(F.col("event_id"), F.lit(100)).alias("turn_idx"),
        op.alias("op"),
        F.col("event_type"),
        F.col("value"),
        F.col("ts"),
    )


_CHANGES_ORACLE = """
    SELECT event_id AS seq, user_id, event_id % 100 AS turn_idx,
           CASE WHEN event_id % 20 = 0 THEN 'D'
                WHEN event_id % 20 < 6 THEN 'U'
                ELSE 'I' END AS op,
           event_type, value, ts
    FROM events
"""


def q_cdc_fold_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC fold: dedupe to max-seq per key, drop deletes.

    This is the engine's MERGE-source computation (groupBy max(struct) —
    map-side combined, hot-key safe) run as a standalone operator.
    """
    ch = _derived_changes(spark, sf_dir)
    latest = dedupe_latest(ch, ["user_id", "turn_idx"], "seq")
    return latest.filter(F.col("op") != "D").select(
        "user_id", "turn_idx", "seq", "event_type", "value", "ts"
    )


def q_cdc_op_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-dedupe op distribution (dirty/metrics accounting shape)."""
    ch = _derived_changes(spark, sf_dir)
    latest = dedupe_latest(ch, ["user_id", "turn_idx"], "seq")
    return latest.groupBy("op").agg(F.count("*").alias("n")).select("op", "n")


# ------------------------------------------------- dx_* transformer queries

def q_dx_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dx_substr + dx_pad + dx_replace + dx_digest chained (SURVEY.md §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.substring(F.col("l_returnflag"), 1, 1).alias("flag_sub"),
        F.lpad(F.col("l_linenumber").cast("string"), 4, "0").alias("line_pad"),
        F.regexp_replace(F.col("l_linestatus"), "O", "X").alias("status_rep"),
        F.md5(
            F.concat(F.col("l_returnflag"), F.col("l_linestatus"), F.col("l_orderkey").cast("string"))
        ).alias("digest"),
    )


def q_dx_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dx_filter semantics: typed compares drop non-matching rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_shipdate") > F.lit("1995-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --------------------------------------------------------- analytic queries

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (loghub/tsdb-style time-range read shape)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select("event_type", "hour", "n", "sum_value")
    )


def q_region_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-joined dimension rollup (small-dim join pattern)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
        .select("r_name", "n_customers")
    )


# -------------------------------------------------- training-data ops (docs)

def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on text, keep min doc_id."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("dup_count") > 1)
        .select("keep_id", "dup_count")
    )


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality flags (whitespace tokenizer, vectorized)."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.expr("length(trim(text)) - length(replace(trim(text), ' ', '')) + 1")
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        (F.length("text") < 100).cast("int").alias("is_short"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_fold_latest": q_cdc_fold_latest,
    "cdc_op_mix": q_cdc_op_mix,
    "dx_transform_chain": q_dx_transform_chain,
    "dx_filter": q_dx_filter,
    "events_hourly": q_events_hourly,
    "region_customers": q_region_customers,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_stats": q_doc_token_stats,
}

ORACLES: dict[str, str] = {
    "cdc_fold_latest": f"""
        SELECT user_id, turn_idx, seq, event_type, value, ts
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, turn_idx ORDER BY seq DESC) AS rn
            FROM ({_CHANGES_ORACLE})
        ) WHERE rn = 1 AND op <> 'D'
    """,
    "cdc_op_mix": f"""
        SELECT op, count(*) AS n
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, turn_idx ORDER BY seq DESC) AS rn
            FROM ({_CHANGES_ORACLE})
        ) WHERE rn = 1 GROUP BY op
    """,
    "dx_transform_chain": """
        SELECT l_orderkey, l_linenumber,
               substr(l_returnflag, 1, 1) AS flag_sub,
               lpad(CAST(l_linenumber AS VARCHAR), 4, '0') AS line_pad,
               replace(l_linestatus, 'O', 'X') AS status_rep,
               md5(l_returnflag || l_linestatus || CAST(l_orderkey AS VARCHAR)) AS digest
        FROM lineitem
    """,
    "dx_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_quantity >= 30 AND l_returnflag <> 'A'
          AND l_shipdate > TIMESTAMP '1995-01-01 00:00:00'
    """,
    "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS n, round(sum(value), 3) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "region_customers": """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "doc_exact_dedup": """
        SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        FROM documents GROUP BY text HAVING count(*) > 1
    """,
    "doc_token_stats": """
        SELECT doc_id, lang,
               length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS n_tokens,
               length(text) AS n_chars_actual,
               CAST(length(text) < 100 AS INT) AS is_short
        FROM documents
    """,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest-wins CDC fold on sf0.001 (the engine's MERGE source)."""
    return q_cdc_fold_latest(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
