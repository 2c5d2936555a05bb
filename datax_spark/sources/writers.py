"""Writer factories — the reference's writer-plugin surface on Spark sinks.

``writeMode`` parity:
- file writers (hdfswriter HdfsWriter.java:83-92): append / truncate
  (→ overwrite) / nonConflict (→ errorifexists); two-phase tmp+rename commit
  is superseded by Spark's commit protocol (and by LakeTable snapshots).
- keyed writers (mysqlwriter insert/replace/update → WriterUtil.java:111-168;
  otswriter PUT/UPDATE/DELETE): ``lakewriter`` writeMode insert(append) /
  truncate(overwrite) / upsert (MERGE on keyCols) / cdc (op-column apply with
  deletes).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WRITERS: dict[str, Callable] = {}

_FILE_MODES = {"append": "append", "truncate": "overwrite", "nonConflict": "errorifexists",
               "overwrite": "overwrite", "errorifexists": "errorifexists"}


def writer(name: str):
    def deco(fn):
        WRITERS[name] = fn
        return fn

    return deco


def _file_write(df: DataFrame, p: dict, fmt: str) -> dict:
    mode = _FILE_MODES[p.get("writeMode", "append")]
    w = df.write.mode(mode).options(**p.get("options", {}))
    if p.get("partitionBy"):
        w = w.partitionBy(*p["partitionBy"])
    getattr(w, fmt)(p["path"])
    return {"path": p["path"], "mode": mode}


@writer("parquetwriter")
def parquet_writer(df: DataFrame, p: dict) -> dict:
    return _file_write(df, p, "parquet")


@writer("orcwriter")
def orc_writer(df: DataFrame, p: dict) -> dict:
    return _file_write(df, p, "orc")


@writer("jsonwriter")
def json_writer(df: DataFrame, p: dict) -> dict:
    return _file_write(df, p, "json")


@writer("txtfilewriter")
@writer("csvwriter")
def csv_writer(df: DataFrame, p: dict) -> dict:
    mode = _FILE_MODES[p.get("writeMode", "append")]
    opts = {
        "sep": p.get("fieldDelimiter", ","),
        "header": str(p.get("header", False)).lower(),
        "nullValue": p.get("nullFormat", "\\N"),
        "compression": p.get("compress", "none"),
    }
    opts.update(p.get("options", {}))
    df.write.mode(mode).options(**opts).csv(p["path"])
    return {"path": p["path"], "mode": mode}


@writer("jdbcwriter")
def jdbc_writer(df: DataFrame, p: dict) -> dict:
    """Batched JDBC writes (CommonRdbmsWriter): insert → append; upsert/replace
    require DB-side MERGE — for lake-backed upserts use lakewriter."""
    mode = {"insert": "append", "truncate": "overwrite"}.get(p.get("writeMode", "insert"), "append")
    opts = {"url": p["jdbcUrl"], "dbtable": p["table"], "driver": p.get("driver")}
    for k in ("user", "password", "batchsize"):
        if p.get(k):
            opts[k] = str(p[k])
    df.write.format("jdbc").mode(mode).options(**{k: v for k, v in opts.items() if v}).save()
    return {"table": p["table"], "mode": mode}


@writer("lakewriter")
def lake_writer(df: DataFrame, p: dict) -> dict:
    """Keyed lake sink: the MERGE-capable writer (upsert/delete parity with
    the reference's keyed writers, on snapshot-committed ACID storage)."""
    from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1  # noqa: F401
    from datax_spark.lake.table import LakeTable

    root = p["root"]
    mode = p.get("writeMode", "append")
    spark = df.sparkSession
    if not LakeTable.exists(root):
        schema_df = df.drop(p.get("opColumn", "op"), p.get("seqColumn", "seq"))
        t = LakeTable.create(
            spark, root, schema_df.schema, bucket_key=p["bucketKey"],
            n_buckets=int(p.get("buckets", 32)),
        )
    else:
        t = LakeTable(spark, root)
    if mode in ("append", "insert"):
        snap = t.append(df)
    elif mode in ("truncate", "overwrite"):
        snap = t.overwrite(df)
    elif mode in ("upsert", "update", "replace"):
        src = df.withColumn(p.get("opColumn", "op"), F.lit("U")) if p.get("opColumn", "op") not in df.columns else df
        snap = t.merge(src, key_cols=p["keyCols"], op_col=p.get("opColumn", "op"))
    elif mode == "cdc":
        snap = t.apply_cdc(
            df, key_cols=p["keyCols"], op_col=p.get("opColumn", "op"),
            seq_col=p.get("seqColumn", "seq"),
        )
    else:
        raise ValueError(f"lakewriter: unknown writeMode {mode!r}")
    return {"root": root, "mode": mode, "snapshot_version": snap.version}


@writer("streamwriter")
def stream_writer(df: DataFrame, p: dict) -> dict:
    """Test sink (streamwriter): print/collect."""
    n = int(p.get("limit", 20))
    if p.get("print", True):
        df.show(n, truncate=int(p.get("truncate", 40)))
    return {"shown": min(n, df.count())}


def build_writer(df: DataFrame, name: str, parameter: dict) -> dict:
    if name not in WRITERS:
        raise KeyError(f"unknown writer {name!r}; available: {sorted(WRITERS)}")
    return WRITERS[name](df, parameter)
