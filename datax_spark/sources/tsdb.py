"""Time-series range reader: the tsdbreader/opentsdbreader analog.

The reference pulls datapoints from a TSDB over HTTP and parallelizes by
tiling the query window into ``splitIntervalMs`` slices crossed with the
metric list (``tsdbreader/.../TSDBReader.java:163-270`` — "split by time in
hour" then "split by metric"), emitting either raw TSDB JSON datapoints or
flat RDB rows (``columns4RDB``: metric, timestamp, tag columns, value;
``conn/TSDBDump.java:96``).

Spark-first re-expression: a tall series table (one row per datapoint,
tags as columns) is a parquet/lake scan, and the reference's entire split
machinery collapses into predicate pushdown — the metric IN-list, the
half-open time range, and tag equality filters all reach the parquet
footer (row-group pruning on ``ts`` min/max stats), and on a LakeTable the
same predicate prunes FILES via manifest zone maps before any footer is
opened (``LakeTable.read(where=...)``). :func:`split_plan` keeps the
reference's task-tiling arithmetic as the cluster-shaped artifact (what a
driver would hand N executors pulling from a REAL remote TSDB, where the
store cannot push predicates itself); :func:`series_read` is the data
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_RESERVED = ("metric", "timestamp", "value")


def split_plan(begin_ms: int, end_ms: int, interval_ms: int,
               metrics: list[str], combine: bool = False) -> list[dict]:
    """Tile ``[begin_ms, end_ms)`` into ``interval_ms`` slices crossed with
    ``metrics`` — the reference's task split (``TSDBReader.java:163-270``).
    ``combine=True`` keeps all metrics in one task per slice (the
    reference's multi-metric mquery mode); otherwise one task per
    (slice, metric). Slices are half-open, tile the window exactly (the
    last slice may be short), and never overlap — tests assert the tiling
    property the reference relies on for exactly-once extraction."""
    if interval_ms <= 0:
        raise ValueError(f"splitIntervalMs must be > 0, got {interval_ms}")
    if end_ms <= begin_ms:
        raise ValueError(f"empty window: begin {begin_ms} >= end {end_ms}")
    if not metrics:
        raise ValueError("at least one metric required")
    tasks = []
    start = begin_ms
    while start < end_ms:
        stop = min(start + interval_ms, end_ms)
        if combine:
            tasks.append({"metrics": list(metrics), "start": start, "end": stop})
        else:
            for m in metrics:
                tasks.append({"metrics": [m], "start": start, "end": stop})
        start = stop
    return tasks


def series_read(df: DataFrame, metrics: list[str],
                begin=None, end=None, tags: dict | None = None,
                output: str = "rdb",
                metric_col: str = "metric", ts_col: str = "ts",
                value_col: str = "value",
                tag_cols: list[str] | None = None) -> DataFrame:
    """Range-read a tall series DataFrame.

    Filters (metric IN-list, half-open ``[begin, end)`` on ``ts_col``, tag
    equality from ``tags``) are plain Catalyst predicates, so on a parquet
    scan they push down to the reader (PushedFilters — row-group pruning on
    ts), and composed over ``LakeTable.read(where=...)`` the same range
    prunes files by zone map. ``output``:

    - ``"rdb"`` — the reference's columns4RDB row shape: ``metric,
      timestamp, <tag columns...>, value`` (``TSDBDump.dump4RDB``).
    - ``"tsdb"`` — one JSON datapoint string per row, the reference's
      native dump shape ``{"metric","tags":{...},"timestamp","value"}``
      (timestamp in epoch millis).
    """
    tag_cols = tag_cols or []
    out = df.filter(F.col(metric_col).isin(list(metrics)))
    if begin is not None:
        out = out.filter(F.col(ts_col) >= F.lit(begin))
    if end is not None:
        out = out.filter(F.col(ts_col) < F.lit(end))
    for k, v in (tags or {}).items():
        out = out.filter(F.col(k) == F.lit(v))
    if output == "rdb":
        return out.select(
            F.col(metric_col).alias("metric"),
            F.col(ts_col).alias("timestamp"),
            *[F.col(c) for c in tag_cols],
            F.col(value_col).alias("value"),
        )
    if output == "tsdb":
        bad = [c for c in tag_cols if c in _RESERVED]
        if bad:
            raise ValueError(f"tag columns collide with datapoint fields: {bad}")
        return out.select(
            F.to_json(F.struct(
                F.col(metric_col).alias("metric"),
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in tag_cols]),
                    F.array(*[F.col(c).cast("string") for c in tag_cols]),
                ).alias("tags"),
                (F.col(ts_col).cast("double") * 1000).cast("long").alias("timestamp"),
                F.col(value_col).alias("value"),
            )).alias("datapoint")
        )
    raise ValueError(f"output must be 'rdb' or 'tsdb', got {output!r}")
