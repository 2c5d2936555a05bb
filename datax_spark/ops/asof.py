"""As-of (point-in-time) join — one shuffle, no range explosion.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive emulation —
an inequality join ``l.ts >= r.ts`` + latest-wins dedupe — is a range join
that explodes to O(|l| x |r|) per key before pruning. This implementation is
the scalable union+window form:

    tag right rows (side=0) and left rows (side=1), union, then one window
    per key ordered by (ts, side) carrying ``last(right_payload,
    ignorenulls=True)`` forward — each left row picks up the most recent
    right row with right.ts <= left.ts.

Cost: ONE shuffle of |l| + |r| rows on the join key (the same partitioning
both inputs would need anyway), sort within partitions, no join blowup —
the shape that survives 100x growth of either side. Skewed keys behave like
any keyed window (AQE handles moderate skew; pre-salt pathological keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (left outer: no match
    → NULLs).

    ``right_cols`` selects which right columns to carry (default: all except
    key/ts), emitted as ``{prefix}{col}`` plus ``{prefix}ts``. ``tolerance_s``
    optionally voids matches older than the given lookback seconds (pandas
    ``merge_asof(tolerance=...)`` semantics).

    Ties on ``right_ts`` within a key resolve to the LAST right row in the
    union sort — callers needing determinism under exact-ts duplicates should
    dedupe the right side first (one row per (key, ts)).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[c for c in left.columns if c not in keys],
    )
    # right rows sort before left rows at equal ts → right.ts <= left.ts holds
    w = (
        Window.partitionBy(*keys)
        .orderBy("__evt_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        fresh = (
            F.col("__evt_ts").cast("double")
            - F.col("__match.__ts").cast("double")
        ) <= F.lit(float(tolerance_s))
        matched = matched.withColumn(
            "__match", F.when(fresh, F.col("__match"))
        )
    out_left = [c for c in left.columns if c not in keys]
    return matched.select(
        *keys,
        *out_left,
        F.col("__match.__ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
