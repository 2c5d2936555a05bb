"""DataX-flavored JSON job runner: reader → [transformer chain] → writer.

A drop-in-shaped job spec (the reference's job JSON tree, Configuration.java /
SURVEY.md §3) executed as one declarative Spark plan per content entry:

{
  "job": {
    "setting": {
      "speed":      {"record": ..., "byte": ...},          # recorded; Spark paces natively
      "errorLimit": {"record": N, "percentage": 0.02}      # ErrorRecordChecker semantics
    },
    "content": [{
      "reader":      {"name": "parquetreader", "parameter": {...}},
      "transformer": [{"name": "dx_substr", "parameter": {...}}, ...],
      "writer":      {"name": "lakewriter", "parameter": {...}}
    }]
  }
}

Differences from the reference (deliberate, Spark-first): split/schedule/
channel/taskgroup sections are unnecessary — Catalyst plans the scan splits
and the shuffle replaces the in-memory channel; metrics come from observe().
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

from datax_spark.sources.readers import build_reader
from datax_spark.sources.writers import build_writer
from datax_spark.transforms.registry import apply_transform_chain


class JobErrorLimitExceeded(Exception):
    pass


def run_job(spark: SparkSession, job: dict) -> dict:
    cfg = job["job"]
    setting = cfg.get("setting", {})
    stats = {"contents": [], "setting": setting}
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
        out = apply_transform_chain(df, chain) if chain else df

        if err and chain:
            # filtered-record accounting (TransformerExchanger counters /
            # ErrorRecordChecker thresholds). NB: in this engine "dirty" ≈ rows
            # dropped by the chain — failed typed casts become NULLs, not
            # exceptions. One extra pass over the (cached) source.
            df = df.persist()
            out = apply_transform_chain(df, chain)
            read_rows = df.count()
            out_rows = out.count()
            filtered = read_rows - out_rows
            entry.update(read_rows=read_rows, written_rows=out_rows, filtered_rows=filtered)
            limit_n = err.get("record")
            limit_pct = err.get("percentage")
            if limit_n is not None and filtered > limit_n:
                df.unpersist()
                raise JobErrorLimitExceeded(f"content {i}: {filtered} filtered > {limit_n}")
            if limit_pct is not None and read_rows and filtered / read_rows > limit_pct:
                df.unpersist()
                raise JobErrorLimitExceeded(
                    f"content {i}: filtered fraction {filtered / read_rows:.4f} > {limit_pct}"
                )

        w = content["writer"]
        entry["writer_result"] = build_writer(out, w["name"], w.get("parameter", {}))
        if err and chain:
            df.unpersist()
        entry["duration_s"] = round(time.time() - t0, 3)
        stats["contents"].append(entry)
    stats["duration_s"] = round(time.time() - t_job, 3)
    return stats


def run_job_file(spark: SparkSession, path: str) -> dict:
    with open(path) as f:
        return run_job(spark, json.load(f))
