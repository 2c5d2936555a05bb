"""DataX-flavored JSON job runner: reader → [transformer chain] → writer.

A drop-in-shaped job spec (the reference's job JSON tree, Configuration.java /
SURVEY.md §3) executed as one declarative Spark plan per content entry:

{
  "job": {
    "setting": {
      "speed":      {"record": N/s, "byte": B/s, "channel": C},  # ENFORCED (chunked+paced)
      "errorLimit": {"record": N, "percentage": 0.02},           # ErrorRecordChecker semantics
      "preHandler": "pkg.mod:fn",   # JobContainer.preHandle parity (or callables
      "postHandler": "pkg.mod:fn"   #  passed directly when building the dict in Python)
    },
    "content": [{
      "reader":      {"name": "parquetreader", "parameter": {...}},
      "transformer": [{"name": "dx_substr", "parameter": {...}}, ...],
      "writer":      {"name": "lakewriter", "parameter": {...}}
    }]
  }
}

Rate governance parity: the reference clamps per-channel bytes/records per
second by sleeping in the channel (Channel.statPush:176-239) and derives the
channel count from global/channel speed (JobContainer.adjustChannelNumber:
416-486). Here a speed cap slices the content into per-second chunks
(deterministic hash slicing) and paces the chunk writes so measured rows/s
and bytes/s stay at or under the cap — and the derived channel count is
recorded in the stats for parity.

Dirty-record parity: readers that parse text formats (csv/json) can quarantine
malformed rows (PERMISSIVE corrupt-record capture → quarantine parquet with a
``_dirty_reason`` + per-reason counts), matching the CDC path's
ErrorRecordChecker/TaskPluginCollector semantics; errorLimit counts BOTH
parse-dirty and chain-filtered rows.

Differences from the reference (deliberate, Spark-first): split/schedule/
channel/taskgroup sections are unnecessary — Catalyst plans the scan splits
and the shuffle replaces the in-memory channel; metrics come from observe().
"""

from __future__ import annotations

import importlib
import json
import math
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from datax_spark.sources.readers import build_reader
from datax_spark.sources.writers import build_writer
from datax_spark.transforms.registry import apply_transform_chain

_CORRUPT = "_corrupt_record"


class JobErrorLimitExceeded(Exception):
    pass


def _resolve_handler(h):
    """'pkg.mod:fn' → callable (JobContainer.preHandle plugin-loading parity);
    callables pass through."""
    if h is None or callable(h):
        return h
    mod, _, fn = str(h).partition(":")
    return getattr(importlib.import_module(mod), fn)


def _estimate_row_bytes(df: DataFrame, sample: int = 1000) -> float:
    """Average serialized row size from an Arrow-collected sample (used to
    convert a byte/s cap into a records/chunk budget)."""
    import pyarrow as pa

    pdf = df.limit(sample).toPandas()
    if len(pdf) == 0:
        return 1.0
    return max(pa.Table.from_pandas(pdf).nbytes / len(pdf), 1.0)


def _quarantine_corrupt(df: DataFrame, reader_param: dict, entry: dict) -> DataFrame:
    """Split PERMISSIVE corrupt records out of a csv/json read: quarantine
    them as parquet with ``_dirty_reason`` and count them, return clean rows."""
    qdir = reader_param.get("quarantineDir")
    if not qdir or _CORRUPT not in df.columns:
        entry["parse_dirty_rows"] = 0
        return df.drop(_CORRUPT) if _CORRUPT in df.columns else df
    df = df.persist()  # Spark disallows corrupt-column-only queries on raw scans
    dirty = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("_raw"), F.lit("parse_error").alias("_dirty_reason")
    )
    n_dirty = dirty.count()
    if n_dirty:
        dirty.write.mode("append").parquet(qdir)
    entry["parse_dirty_rows"] = n_dirty
    return df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def _check_error_limit(err: dict, dirty: int, read_rows: int, label: str) -> None:
    limit_n = err.get("record")
    limit_pct = err.get("percentage")
    if limit_n is not None and dirty > limit_n:
        raise JobErrorLimitExceeded(f"{label}: {dirty} dirty/filtered > {limit_n}")
    if limit_pct is not None and read_rows and dirty / read_rows > limit_pct:
        raise JobErrorLimitExceeded(
            f"{label}: dirty fraction {dirty / read_rows:.4f} > {limit_pct}"
        )


def _paced_write(out: DataFrame, writer_name: str, writer_param: dict,
                 speed: dict, entry: dict) -> dict:
    """Enforce setting.speed: slice into per-second chunks and pace the writes
    (Channel.statPush sleep-to-clamp parity, at batch-job granularity)."""
    rec_cap = speed.get("record")
    byte_cap = speed.get("byte")
    out = out.persist()
    total = out.count()
    per_chunk = float("inf")
    if rec_cap:
        per_chunk = min(per_chunk, float(rec_cap))
    row_bytes = None
    if byte_cap:
        row_bytes = _estimate_row_bytes(out)
        per_chunk = min(per_chunk, max(float(byte_cap) / row_bytes, 1.0))
    n_chunks = max(1, math.ceil(total / per_chunk)) if total else 1
    # adjustChannelNumber parity: global speed / per-channel speed → channels
    channels = None
    if speed.get("channel"):
        channels = int(speed["channel"])
    chunk_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in out.columns]), F.lit(n_chunks)
    )
    t0 = time.time()
    result = None
    for i in range(n_chunks):
        chunk = out.filter(chunk_col == i)
        p = dict(writer_param)
        if i > 0:
            # subsequent chunks accumulate into the same target: file/lake
            # writers switch to append; keyed DB writes already accumulate
            if writer_name != "dbapiwriter":
                p["writeMode"] = "append"
            p.pop("preSql", None)
        if i < n_chunks - 1:
            p.pop("postSql", None)
        result = build_writer(chunk, writer_name, p)
        # budget pacing (the reference sleeps in Channel.statPush the same
        # way): after chunk i, wait until the time its cumulative row budget
        # allows — including after the last chunk, so the job's overall
        # rows/s (and bytes/s) can never exceed the cap
        cum_rows = total * (i + 1) / n_chunks
        sleep = cum_rows / per_chunk - (time.time() - t0)
        if sleep > 0:
            time.sleep(sleep)
    elapsed = max(time.time() - t0, 1e-9)
    out.unpersist()
    entry.update(
        speed_chunks=n_chunks,
        rows_total=total,
        rows_per_sec=round(total / elapsed, 2),
        bytes_per_sec=round(total / elapsed * row_bytes, 2) if row_bytes else None,
        channels=channels,
    )
    return result


def run_job(spark: SparkSession, job: dict) -> dict:
    cfg = job["job"]
    setting = cfg.get("setting", {})
    stats = {"contents": [], "setting": {k: v for k, v in setting.items()
                                         if not callable(v)}}
    pre = _resolve_handler(setting.get("preHandler"))
    post = _resolve_handler(setting.get("postHandler"))
    if pre is not None:
        pre(spark, job)
    t_job = time.time()
    for i, content in enumerate(cfg["content"]):
        t0 = time.time()
        r = content["reader"]
        df = build_reader(spark, r["name"], r.get("parameter", {}))

        chain = content.get("transformer", [])
        err = setting.get("errorLimit")
        entry = {
            "reader": r["name"],
            "writer": content["writer"]["name"],
            "transforms": [t["name"] for t in chain],
        }
        df = _quarantine_corrupt(df, r.get("parameter", {}), entry)
        out = apply_transform_chain(df, chain) if chain else df

        if err:
            # filtered-record accounting (TransformerExchanger counters /
            # ErrorRecordChecker thresholds), in ONE pass: an Observation on
            # the pre-chain plan counts read rows during the same action that
            # materializes the chained output into cache, so neither the scan
            # nor the chain runs twice (CollectMetrics is a pushdown barrier,
            # which is exactly the required "rows entering the chain"
            # semantics). NB: chain "dirty" ≈ rows dropped by the chain —
            # failed typed casts become NULLs, not exceptions.
            obs = Observation()
            observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
            out = (apply_transform_chain(observed, chain)
                   if chain else observed).persist()
            out_rows = out.count()
            read_rows = obs.get["n"] + entry.get("parse_dirty_rows", 0)
            filtered = read_rows - out_rows
            entry.update(read_rows=read_rows, written_rows=out_rows,
                         filtered_rows=filtered)
            try:
                _check_error_limit(err, filtered, read_rows, f"content {i}")
            except JobErrorLimitExceeded:
                out.unpersist()
                raise

        w = content["writer"]
        speed = setting.get("speed") or {}
        if speed.get("record") or speed.get("byte"):
            entry["writer_result"] = _paced_write(
                out, w["name"], w.get("parameter", {}), speed, entry
            )
        else:
            entry["writer_result"] = build_writer(out, w["name"], w.get("parameter", {}))
        if err:
            out.unpersist()
        entry["duration_s"] = round(time.time() - t0, 3)
        stats["contents"].append(entry)
    stats["duration_s"] = round(time.time() - t_job, 3)
    if post is not None:
        post(spark, job, stats)
    return stats


def run_job_file(spark: SparkSession, path: str) -> dict:
    with open(path) as f:
        return run_job(spark, json.load(f))
