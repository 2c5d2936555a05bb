"""Deterministic, Spark-native change-feed generator (the test/bench fixture).

Design mirrors the reference's synthetic source plugin (streamreader
StreamReader.java:241-301: per-column literal-or-random spec), upgraded to
emit a binlog/WAL-style CDC feed of conversation transcripts per FIXTURES.md.

Every random draw is a pure function of (seed, entity id, tag) via xxhash64 —
no driver-side RNG, no per-row Python — so the generator is columnar,
distributed, and reproducible at any scale (`spark.range(n)` + expressions).

Output layout: ``feed_dir/epoch=K/*.parquet``. Epochs before the
schema-evolution point are written WITHOUT the ``tool`` column (writer schema
v1); later epochs include it (schema v2) — modeling an upstream DDL mid-stream.

Sequence numbers are globally dense and strictly increasing. Dense global
numbering is inherently a total order, so it is assigned with a deterministic
two-pass scheme (no sampling, no zipWithIndex):
  1. each event gets an analytic range-bucket ``pid`` from its event time,
  2. bucket counts → cumulative offsets (tiny driver collect, ≤ n_buckets),
  3. ``applyInPandas`` per bucket sorts locally and assigns
     ``seq = offset[pid] + local_rank`` (vectorized, one group per bucket).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH_S = 1735689600  # 2025-01-01T00:00:00Z

VALID_OPS = ("I", "U", "D")
TOOLS = ("search", "python", "browser", "sql")


@dataclass
class ChangeFeedSpec:
    seed: int = 42
    n_convs: int = 200
    mean_turns: float = 8.0
    max_turns: int = 256
    update_rate: float = 0.45      # mean U events per live key (before hot multiplier)
    delete_prob: float = 0.07      # P(key gets a D)
    resurrect_prob: float = 0.3    # P(deleted key gets a later I)
    hot_exponent: float = 0.7      # conv update multiplier ~ u^-hot_exponent (heavy tail)
    hot_cap: int = 500             # cap on the hot-key multiplier
    tool_prob: float = 0.15        # P(assistant turn has a tool)
    n_epochs: int = 8
    evolve_frac: float = 0.5       # tool column appears at this fraction of epochs
    dirty_frac: float = 0.0        # fraction of extra malformed events
    max_text_chars: int = 2000
    # Files per epoch dir. A real binlog/WAL feed arrives as per-shard files
    # (otsstreamreader shards, loghub cursors); one fat file per epoch caps the
    # consumer's scan parallelism at 1 task — shard by conv_id so each shard
    # carries whole conversation streams, like a key-partitioned binlog.
    shards_per_epoch: int = 32

    @property
    def evolve_epoch(self) -> int:
        return int(math.floor(self.evolve_frac * self.n_epochs))


def _u(tag: str, *cols) -> F.Column:
    """Deterministic uniform in [0,1) from (tag, cols) via xxhash64."""
    h = F.xxhash64(F.lit(tag), *cols)
    return F.pmod(h, F.lit(1 << 30)).cast("double") / float(1 << 30)


def _events_df(spark: SparkSession, spec: ChangeFeedSpec) -> DataFrame:
    s = f"s{spec.seed}"
    convs = (
        spark.range(spec.n_convs)
        .withColumnRenamed("id", "cid")
        .withColumn("conv_id", F.format_string("conv-%08d", F.col("cid")))
        # turns ~ 1 + Exp(mean_turns) (deterministic inverse-CDF), capped
        .withColumn(
            "n_turns",
            F.least(
                F.lit(spec.max_turns),
                (1 + F.floor(-spec.mean_turns * F.log(1.0 - _u(s + ":nt", F.col("cid")) + 1e-12))).cast("int"),
            ),
        )
        # heavy-tailed hot-key multiplier: a few conversations get 10^2-10^3x updates
        .withColumn(
            "hot_mult",
            F.least(
                F.lit(float(spec.hot_cap)),
                F.pow(_u(s + ":hot", F.col("cid")) + 1e-9, F.lit(-spec.hot_exponent)),
            ),
        )
        .withColumn("conv_offset", F.pmod(F.xxhash64(F.lit(s + ":off"), F.col("cid")), F.lit(1_000_000)))
        .withColumn("step", (30 + F.pmod(F.xxhash64(F.lit(s + ":step"), F.col("cid")), F.lit(600))).cast("long"))
    )

    keys = convs.select(
        "cid", "conv_id", "conv_offset", "step", "hot_mult",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    ku = _u(s + ":nu", F.col("cid"), F.col("turn_idx"))
    keys = (
        keys.withColumn(
            "n_upd",
            F.floor(F.col("hot_mult") * spec.update_rate * 2.0 * ku).cast("int"),
        )
        .withColumn("has_del", (_u(s + ":del", F.col("cid"), F.col("turn_idx")) < spec.delete_prob).cast("int"))
        .withColumn(
            "has_res",
            (F.col("has_del") * (_u(s + ":res", F.col("cid"), F.col("turn_idx")) < spec.resurrect_prob).cast("int")),
        )
        .withColumn("n_events", F.col("n_upd") + 1 + F.col("has_del") + F.col("has_res"))
    )

    ev = keys.select(
        "cid", "conv_id", "turn_idx", "conv_offset", "step", "n_upd", "has_del", "has_res",
        F.explode(F.sequence(F.lit(0), F.col("n_events") - 1)).alias("v"),
    )

    op = (
        F.when(F.col("v") == 0, F.lit("I"))
        .when(F.col("v") <= F.col("n_upd"), F.lit("U"))
        .when((F.col("has_del") == 1) & (F.col("v") == F.col("n_upd") + 1), F.lit("D"))
        .otherwise(F.lit("I"))  # resurrection insert
    )

    role = F.when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user")).otherwise(F.lit("assistant"))

    # deterministic text: prefix + hash-derived body with lognormal-ish length; byte-exact reproducible
    body_hash = F.hex(F.xxhash64(F.lit(s + ":txt"), F.col("cid"), F.col("turn_idx"), F.col("v")))
    body_len = (
        20 + F.floor(F.exp(F.log(F.lit(float(spec.max_text_chars - 20))) * _u(s + ":len", F.col("cid"), F.col("turn_idx"), F.col("v"))))
    ).cast("int")
    n_rep = spec.max_text_chars // 16 + 1
    body = F.repeat(body_hash, n_rep).substr(F.lit(1), body_len)
    text = F.concat(
        F.format_string("[%s/%d] v%d ", F.col("conv_id"), F.col("turn_idx"), F.col("v")),
        body,
    )

    tool = F.when(
        (role == "assistant") & (_u(s + ":tp", F.col("cid"), F.col("turn_idx"), F.col("v")) < spec.tool_prob),
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (F.pmod(F.xxhash64(F.lit(s + ":tool"), F.col("cid"), F.col("turn_idx"), F.col("v")), F.lit(len(TOOLS))) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    ts_s = F.lit(BASE_EPOCH_S) + F.col("conv_offset") + F.col("turn_idx") * F.col("step") + F.col("v") * F.lit(7)

    out = ev.select(
        op.alias("op"),
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(op == "D", F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(op == "D", F.lit(None).cast("string")).otherwise(text).alias("text"),
        F.when(op == "D", F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        F.timestamp_seconds(ts_s).alias("ts"),
        ts_s.alias("_ts_s"),
        F.xxhash64(F.lit(s + ":uid"), F.col("cid"), F.col("turn_idx"), F.col("v")).alias("_uid"),
    )

    if spec.dirty_frac > 0:
        # malformed events (ErrorRecordChecker fixture): null key / negative turn / bad op
        du = _u(s + ":dirty", F.col("_uid"))
        kind = F.pmod(F.xxhash64(F.lit(s + ":dk"), F.col("_uid")), F.lit(3))
        out = out.select(
            F.when(du < spec.dirty_frac, F.when(kind == 2, F.lit("X")).otherwise(F.col("op"))).otherwise(F.col("op")).alias("op"),
            F.when((du < spec.dirty_frac) & (kind == 0), F.lit(None).cast("string")).otherwise(F.col("conv_id")).alias("conv_id"),
            F.when((du < spec.dirty_frac) & (kind == 1), F.lit(-1)).otherwise(F.col("turn_idx")).alias("turn_idx"),
            "role", "text", "tool", "ts", "_ts_s", "_uid",
        )
    return out


def _assign_seq(df: DataFrame, spec: ChangeFeedSpec, n_range_buckets: int = 64) -> DataFrame:
    """Dense global seq via analytic range bucketing + per-bucket vectorized rank.

    Ordering key: (_ts_s, _uid) — unique, deterministic. Buckets come from the
    known ts domain (no sampling → reproducible across runs and parallelism).
    """
    max_off = 1_000_000 + spec.max_turns * 630 + 600 * 7
    lo, hi = BASE_EPOCH_S, BASE_EPOCH_S + max_off
    df = df.withColumn(
        "_pid",
        F.least(F.lit(n_range_buckets - 1), ((F.col("_ts_s") - lo) * n_range_buckets / (hi - lo)).cast("int")),
    )
    counts = {r["_pid"]: r["cnt"] for r in df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in range(n_range_buckets):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    total = acc

    spark = df.sparkSession
    boff = spark.sparkContext.broadcast(offsets)
    n_epochs = spec.n_epochs

    out_schema = (
        "seq long, epoch_hint int, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp"
    )

    def rank_group(pdf):
        import numpy as np

        pdf = pdf.sort_values(["_ts_s", "_uid"], kind="mergesort").reset_index(drop=True)
        base = boff.value[int(pdf["_pid"].iloc[0])]
        pdf["seq"] = base + np.arange(len(pdf), dtype="int64")
        pdf["epoch_hint"] = (pdf["seq"] * n_epochs // max(total, 1)).clip(upper=n_epochs - 1).astype("int32")
        return pdf[["seq", "epoch_hint", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    return df.groupBy("_pid").applyInPandas(rank_group, schema=out_schema)


def generate_change_feed(spark: SparkSession, feed_dir: str, spec: ChangeFeedSpec) -> dict:
    """Materialize the feed as ``feed_dir/epoch=K/`` parquet dirs; returns stats."""
    # bound the per-group pandas batch in _assign_seq: ~events/bucket stays
    # small enough that 32 concurrent Python workers don't blow the RAM at
    # tens of millions of events (text columns are ~1 KB/row)
    n_range_buckets = max(64, min(4096, spec.n_convs // 2000))
    # scale the seq-assignment job's shuffle width with the bucket count so
    # per-task Arrow stream volume stays bounded: at 350M events over the
    # session default 64 partitions each applyInPandas task streamed ~5.5 GB
    # through its Python worker and deterministically deadlocked in the
    # runner's flow control (JVM select()ing for output, worker recv()ing
    # for input — observed via jstack + /proc, both sides idle); at the
    # proven <=2 GB/task regime the same job has never hung
    gen_partitions = max(
        int(spark.conf.get("spark.sql.shuffle.partitions")), n_range_buckets // 8
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # DISK_ONLY: the feed is consumed by two writes + a count; the in-memory
    # columnar cache of tens of millions of ~1 KB text rows OOMs small heaps,
    # and generation is never the measured path.
    from pyspark import StorageLevel

    spark.conf.set("spark.sql.shuffle.partitions", str(gen_partitions))
    try:
        events = _assign_seq(_events_df(spark, spec), spec,
                             n_range_buckets=n_range_buckets)
        events = events.persist(StorageLevel.DISK_ONLY)
        # count() materializes the persisted partitions while the widened
        # shuffle conf is ACTIVE (it is consulted at action-planning time);
        # the downstream writes reuse the persisted blocks
        total = events.count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    ev_epoch = spec.evolve_epoch

    v1 = events.filter(F.col("epoch_hint") < ev_epoch).drop("tool")
    v2 = events.filter(F.col("epoch_hint") >= ev_epoch)
    for part, dfp in (("v1", v1), ("v2", v2)):
        if part == "v1" and ev_epoch == 0:
            continue
        if part == "v2" and ev_epoch >= spec.n_epochs:
            continue
        # NULL conv_id must shard to NULL explicitly — xxhash64(NULL) returns
        # the seed (42), which would silently hash NULL-key events into a
        # regular shard instead of the hive default partition
        shard = F.when(
            F.col("conv_id").isNull(), F.lit(None).cast("long")
        ).otherwise(F.pmod(F.xxhash64(F.col("conv_id")), F.lit(spec.shards_per_epoch)))
        (
            # deterministic conv_id-hash sharding, written as explicit
            # epoch=K/shard=S partition dirs — the layout of a key-partitioned
            # binlog (Kafka keyed topic / OTS PK shards). Malformed events with
            # NULL conv_id land in the hive default-partition dir.
            dfp.withColumn("shard", shard)
            .repartition(spec.shards_per_epoch, F.col("shard"))
            .sortWithinPartitions("epoch_hint", "seq")
            .withColumnRenamed("epoch_hint", "epoch")
            .write.mode("append")
            .partitionBy("epoch", "shard")
            .parquet(feed_dir)
        )
    events.unpersist()
    # feed metadata contract: consumers that bucket their table with the SAME
    # key hash and modulus may use the zero-shuffle aligned apply path
    with open(os.path.join(feed_dir, "_dsx_feed.json"), "w") as f:
        json.dump(
            {
                "shards_per_epoch": spec.shards_per_epoch,
                "shard_fn": "pmod(xxhash64(conv_id), shards_per_epoch)",
                "key_cols": ["conv_id", "turn_idx"],
                "seq_col": "seq",
            },
            f,
        )
    epochs = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(feed_dir) if d.startswith("epoch=")
    )
    return {"total_events": total, "epochs": epochs, "evolve_epoch": ev_epoch}
