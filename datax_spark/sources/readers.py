"""Reader factories — the reference's reader-plugin surface on Spark sources.

Every reader accepts the common pushdown knobs of the reference's RDBMS/file
readers (SURVEY.md §2.1/§2.2): ``columns`` (projection → Catalyst column
pruning), ``where`` (predicate → pushdown into the scan). Parallel-split
parity: file formats split by file/row-group natively; JDBC exposes the same
min/max range-split design (splitPk → partitionColumn/lowerBound/upperBound/
numPartitions, CommonRdbmsReader/SingleTableSplitUtil).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READERS: dict[str, Callable] = {}


def reader(name: str):
    def deco(fn):
        READERS[name] = fn
        return fn

    return deco


def _apply_pushdown(df: DataFrame, p: dict) -> DataFrame:
    if p.get("where"):
        df = df.filter(p["where"])
    cols = p.get("columns") or p.get("column")
    if cols and cols != ["*"]:
        df = df.select(*cols)
    return df


@reader("parquetreader")
def parquet_reader(spark: SparkSession, p: dict) -> DataFrame:
    df = spark.read.options(**p.get("options", {})).parquet(*_paths(p))
    return _apply_pushdown(df, p)


@reader("orcreader")
def orc_reader(spark: SparkSession, p: dict) -> DataFrame:
    df = spark.read.options(**p.get("options", {})).orc(*_paths(p))
    return _apply_pushdown(df, p)


_CORRUPT = "_corrupt_record"


def _corrupt_capture(reader_fn, p: dict, opts: dict):
    """PERMISSIVE corrupt-record capture for text formats: malformed rows land
    in ``_corrupt_record`` instead of being silently nulled; run_job
    quarantines them (StdoutPluginCollector/ErrorRecordChecker parity).
    Requires an explicit ``schema`` (DDL string) — same contract as the
    reference's file readers, whose ``column`` spec fixes the types."""
    schema = p.get("schema")
    if p.get("quarantineDir"):
        if not schema:
            raise ValueError("quarantineDir requires an explicit schema (DDL string)")
        opts = dict(opts, mode="PERMISSIVE", columnNameOfCorruptRecord=_CORRUPT)
        return reader_fn(opts, f"{schema}, {_CORRUPT} string")
    return reader_fn(opts, schema)


@reader("jsonreader")
def json_reader(spark: SparkSession, p: dict) -> DataFrame:
    def do_read(opts, schema):
        r = spark.read.options(**{**opts, **p.get("options", {})})
        if schema:
            r = r.schema(schema)
        return r.json(*_paths(p))

    return _apply_pushdown(_corrupt_capture(do_read, p, {}), p)


@reader("txtfilereader")
@reader("csvreader")
def csv_reader(spark: SparkSession, p: dict) -> DataFrame:
    """txtfilereader/ftpreader/ossreader CSV surface
    (UnstructuredStorageReaderUtil: fieldDelimiter/encoding/compress/
    skipHeader/nullFormat). gzip/bzip2 are inferred natively by Spark;
    ``compress: "zip"`` routes to the zip member-extraction path below,
    ``"lzo"``/``"lzo_deflate"`` to the LZO whole-file path (sources/lzo.py),
    completing the reference codec matrix
    (UnstructuredStorageReaderUtil.java:104-135)."""
    compress = str(p.get("compress", "")).lower()
    if compress == "zip":
        return zip_csv_reader(spark, p)
    if compress in ("lzo", "lzo_deflate"):
        return lzo_csv_reader(spark, p)
    opts = {
        "sep": p.get("fieldDelimiter", ","),
        "encoding": p.get("encoding", "UTF-8"),
        "header": str(p.get("skipHeader", False)).lower(),
        "nullValue": p.get("nullFormat", "\\N"),
    }
    opts.update(p.get("options", {}))

    def do_read(o, schema):
        r = spark.read.options(**o)
        if schema:
            r = r.schema(schema)
        return r.csv(*_paths(p))

    return _apply_pushdown(_corrupt_capture(do_read, p, opts), p)


def _csv_records(text: str, names: list[str], sep: str, skip_header: bool,
                 null_fmt: str) -> list[list]:
    """Parse one CSV text into raw string records + corrupt capture — the
    shared record layer of zip/remote readers (UnstructuredStorageReaderUtil
    parity: fieldDelimiter/skipHeader/nullFormat; malformed lines keep the
    raw line in ``_corrupt_record`` instead of erroring)."""
    import csv as _csv
    import io

    rows: list[list] = []
    rdr = _csv.reader(io.StringIO(text), delimiter=sep)
    for i, rec in enumerate(rdr):
        if skip_header and i == 0:
            continue
        if not rec:
            continue
        if len(rec) != len(names):
            rows.append([None] * len(names) + [sep.join(rec)])
            continue
        vals = [None if v == null_fmt else v for v in rec]
        rows.append(vals + [None])
    return rows


def _typed_from_raw(df: DataFrame, target, capture: bool) -> DataFrame:
    """Cast the all-string record layer to the declared schema in Catalyst;
    without quarantine capture, DROPMALFORMED semantics."""
    casted = [F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields]
    if capture:
        return df.select(*casted, F.col(_CORRUPT))
    return df.filter(F.col(_CORRUPT).isNull()).select(*casted)


@reader("zipcsvreader")
def zip_csv_reader(spark: SparkSession, p: dict) -> DataFrame:
    """ZIP-compressed CSV (UnstructuredStorageReaderUtil's ``compress: zip``
    — the one codec Spark's text sources don't handle natively;
    ZipCycleInputStream in the reference walks every archive member).

    Plan shape: ``binaryFile`` scan (one row per archive, content as bytes)
    → ``mapInPandas`` extracting every member and parsing CSV in-batch →
    typed cast in Catalyst. Parallelism is per-archive — the correct unit,
    since zip (like the reference's stream) is not splittable; at scale many
    small archives parallelize naturally and one giant archive is a data
    layout problem no engine can shard.

    Contract matches csv_reader: explicit ``schema`` DDL required;
    ``fieldDelimiter``/``encoding``/``skipHeader``/``nullFormat`` honored;
    with ``quarantineDir`` malformed lines land in ``_corrupt_record``
    (PERMISSIVE parity) for run_job's quarantine pass instead of erroring.
    ``maxBytesPerArchive`` (default 1 GiB) fails fast with the archive's
    path instead of OOMing a task — zip is not splittable, so each archive
    is held whole in executor memory by design.
    """
    schema = p.get("schema")
    if not schema:
        raise ValueError("zip csv reader requires an explicit schema (DDL string)")
    from pyspark.sql import types as T

    target = T._parse_datatype_string(schema)
    names = [f.name for f in target.fields]
    sep = p.get("fieldDelimiter", ",")
    encoding = p.get("encoding", "UTF-8")
    skip_header = bool(p.get("skipHeader", False))
    null_fmt = p.get("nullFormat", "\\N")
    capture = bool(p.get("quarantineDir"))
    max_bytes = int(p.get("maxBytesPerArchive", 1 << 30))

    bin_df = spark.read.format("binaryFile").load(*_paths(p)).select("path", "content")
    raw_schema = ", ".join(f"`{n}` string" for n in names) + f", {_CORRUPT} string"

    def extract(batches):
        import io
        import zipfile

        import pandas as pd

        for pdf in batches:
            rows: list[list] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if len(content) > max_bytes:
                    raise ValueError(
                        f"zip archive {path} is {len(content)} bytes > "
                        f"maxBytesPerArchive={max_bytes}; zip is not "
                        f"splittable — split the archive or raise the limit"
                    )
                with zipfile.ZipFile(io.BytesIO(content)) as z:
                    for member in z.namelist():
                        if member.endswith("/"):
                            continue
                        text = z.read(member).decode(encoding, errors="replace")
                        rows += _csv_records(text, names, sep, skip_header, null_fmt)
            yield pd.DataFrame(rows, columns=names + [_CORRUPT], dtype=object)

    df = bin_df.mapInPandas(extract, schema=raw_schema)
    return _apply_pushdown(_typed_from_raw(df, target, capture), p)


@reader("lzocsvreader")
def lzo_csv_reader(spark: SparkSession, p: dict) -> DataFrame:
    """LZO-compressed CSV — ``compress: "lzo"`` (lzop file,
    ExpandLzopInputStream parity) and ``"lzo_deflate"`` (bare block stream,
    org.anarres LzoInputStream parity), decoded by sources/lzo.py.

    Same plan shape and contract as zip_csv_reader: lzo text is not
    splittable, so the parallel unit is the file (binaryFile scan →
    mapInPandas decompress+parse → Catalyst cast); explicit ``schema`` DDL
    required; quarantine capture via ``quarantineDir``. The pure-Python
    block decoder is a compatibility path for legacy lzo drops — python-lzo
    is picked up automatically when shipped to the cluster."""
    schema = p.get("schema")
    if not schema:
        raise ValueError("lzo csv reader requires an explicit schema (DDL string)")
    from pyspark.sql import types as T

    target = T._parse_datatype_string(schema)
    names = [f.name for f in target.fields]
    sep = p.get("fieldDelimiter", ",")
    encoding = p.get("encoding", "UTF-8")
    skip_header = bool(p.get("skipHeader", False))
    null_fmt = p.get("nullFormat", "\\N")
    capture = bool(p.get("quarantineDir"))
    deflate = str(p.get("compress", "lzo")).lower() == "lzo_deflate"

    bin_df = spark.read.format("binaryFile").load(*_paths(p)).select("content")
    raw_schema = ", ".join(f"`{n}` string" for n in names) + f", {_CORRUPT} string"

    def extract(batches):
        import pandas as pd

        from datax_spark.sources.lzo import (
            lzo_block_stream_decompress,
            lzop_decompress,
        )

        decode = lzo_block_stream_decompress if deflate else lzop_decompress
        for pdf in batches:
            rows: list[list] = []
            for content in pdf["content"]:
                text = decode(bytes(content)).decode(encoding, errors="replace")
                rows += _csv_records(text, names, sep, skip_header, null_fmt)
            yield pd.DataFrame(rows, columns=names + [_CORRUPT], dtype=object)

    df = bin_df.mapInPandas(extract, schema=raw_schema)
    return _apply_pushdown(_typed_from_raw(df, target, capture), p)


@reader("ftpreader")
@reader("ossreader")
@reader("remotecsvreader")
def remote_csv_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Remote-transport CSV read — the ftpreader/ossreader surface
    (FtpReader.java:17,437 login+stream; OssReader.java bucket-object walk)
    over the Transport seam (sources/transport.py).

    Plan shape: the driver LISTs object names through the transport (a
    metadata call, like the reference's master splitting files across
    channels), names are distributed one-per-task-slice, and EACH TASK opens
    its own connection and streams its files' bytes — the DataX
    one-connection-per-channel model, so bytes never flow through the
    driver. Parsing reuses the shared CSV record layer (same
    fieldDelimiter/skipHeader/nullFormat/quarantine semantics as local
    csv/zip readers); ``compress`` supports none/gzip/zip per object.
    """
    from datax_spark.sources.transport import make_transport

    schema = p.get("schema")
    if not schema:
        raise ValueError("remote csv reader requires an explicit schema (DDL string)")
    from pyspark.sql import types as T

    target = T._parse_datatype_string(schema)
    names = [f.name for f in target.fields]
    sep = p.get("fieldDelimiter", ",")
    encoding = p.get("encoding", "UTF-8")
    skip_header = bool(p.get("skipHeader", False))
    null_fmt = p.get("nullFormat", "\\N")
    capture = bool(p.get("quarantineDir"))
    compress = str(p.get("compress", "")).lower()
    tspec = p["transport"]

    driver_tr = make_transport(tspec)
    suffix = p.get("suffix")
    objects = [n for n in driver_tr.walk(p["path"])
               if not suffix or n.endswith(suffix)]
    if not objects:
        empty = spark.createDataFrame([], target)
        return _apply_pushdown(empty, p)
    n_tasks = min(len(objects), max(spark.sparkContext.defaultParallelism, 1))
    names_df = spark.createDataFrame([(o,) for o in objects], "name string") \
        .repartition(n_tasks)
    raw_schema = ", ".join(f"`{n}` string" for n in names) + f", {_CORRUPT} string"

    def fetch(batches):
        import gzip as _gzip
        import io
        import zipfile

        import pandas as pd

        tr = make_transport(tspec)  # one connection per task
        for pdf in batches:
            rows: list[list] = []
            for obj in pdf["name"]:
                data = tr.read_bytes(obj)
                if compress == "zip":
                    with zipfile.ZipFile(io.BytesIO(data)) as z:
                        texts = [z.read(m).decode(encoding, errors="replace")
                                 for m in z.namelist() if not m.endswith("/")]
                elif compress in ("gzip", "gz"):
                    texts = [_gzip.decompress(data).decode(encoding, errors="replace")]
                elif compress in ("lzo", "lzo_deflate"):
                    from datax_spark.sources.lzo import (
                        lzo_block_stream_decompress,
                        lzop_decompress,
                    )

                    dec = (lzo_block_stream_decompress
                           if compress == "lzo_deflate" else lzop_decompress)
                    texts = [dec(data).decode(encoding, errors="replace")]
                else:
                    texts = [data.decode(encoding, errors="replace")]
                for text in texts:
                    rows += _csv_records(text, names, sep, skip_header, null_fmt)
            yield pd.DataFrame(rows, columns=names + [_CORRUPT], dtype=object)

    df = names_df.mapInPandas(fetch, schema=raw_schema)
    return _apply_pushdown(_typed_from_raw(df, target, capture), p)


@reader("jdbcreader")
def jdbc_reader(spark: SparkSession, p: dict) -> DataFrame:
    """RDBMS reader surface: table or querySql; splitPk → partitioned range
    scan (Spark JDBC mirrors SingleTableSplitUtil's min/max+range design)."""
    opts = {"url": p["jdbcUrl"], "driver": p.get("driver")}
    if p.get("querySql"):
        opts["query"] = p["querySql"]
    else:
        opts["dbtable"] = p["table"]
    if p.get("splitPk"):
        opts.update(
            partitionColumn=p["splitPk"],
            lowerBound=str(p["lowerBound"]),
            upperBound=str(p["upperBound"]),
            numPartitions=str(p.get("numPartitions", 8)),
        )
    for k in ("user", "password", "fetchsize"):
        if p.get(k):
            opts[k] = str(p[k])
    df = spark.read.format("jdbc").options(**{k: v for k, v in opts.items() if v}).load()
    return _apply_pushdown(df, p)


@reader("dbapireader")
def dbapi_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Parallel range-split DB read over a Python DB-API driver (the
    reference's CommonRdbmsReader knobs; see sources/dbapi.py:dbapi_read —
    tested against real sqlite3 in-sandbox). Projection/predicate are pushed
    into each split's SELECT; splitPk gives min/max even ranges plus the
    IS NULL residual; querySql may be a list, one entry per task."""
    from datax_spark.sources.dbapi import dbapi_read

    qs = p.get("querySql")
    if isinstance(qs, str):
        qs = [qs]
    return dbapi_read(
        spark,
        driver=p.get("driver", "sqlite3"),
        database=p["database"],
        schema=p["schema"],
        table=p.get("table"),
        columns=p.get("column") or p.get("columns"),
        where=p.get("where"),
        split_pk=p.get("splitPk"),
        num_partitions=int(p.get("numPartitions", p.get("channel", 4))),
        query_sqls=qs,
        fetch_size=int(p.get("fetchSize", 2048)),
        connect_args=p.get("connectArgs"),
    )


@reader("streamreader")
def stream_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Synthetic source (streamreader StreamReader.java:175-301): N rows from
    per-column {value|random} specs — deterministic hash randomness, columnar."""
    n = int(p.get("sliceRecordCount", p.get("count", 100)))
    df = spark.range(n)
    exprs = []
    for i, spec in enumerate(p.get("column", [])):
        name = spec.get("name", f"c{i}")
        typ = spec.get("type", "string")
        if "random" in spec:
            lo, hi = (int(x) for x in str(spec["random"]).split(","))
            col = (F.lit(lo) + F.pmod(F.xxhash64(F.lit(f"sr:{i}"), F.col("id")), F.lit(max(hi - lo, 1) + 1))).cast("long")
            if typ == "string":
                col = F.hex(F.xxhash64(col))
            elif typ == "double":
                col = col.cast("double")
        else:
            col = F.lit(spec.get("value"))
            col = col.cast({"long": "long", "double": "double", "string": "string",
                            "bool": "boolean", "date": "timestamp"}.get(typ, "string"))
        exprs.append(col.alias(name))
    return df.select(*exprs) if exprs else df


@reader("seqfilereader")
def seqfile_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Hadoop SequenceFile reader (hdfsreader's SEQ format,
    HdfsReader.java:82-89): key/value Text pairs → (key string, value string)
    DataFrame, then the shared CSV column-spec layer can split the value.
    Spark's sequenceFile API ships with the distribution (no extra serde)."""
    rdd = spark.sparkContext.sequenceFile(",".join(_paths(p)))
    df = spark.createDataFrame(rdd, "key string, value string")
    sep = p.get("fieldDelimiter")
    if sep is not None:
        import re as _re

        cols = p.get("column") or []
        names = [c.get("name", f"c{i}") for i, c in enumerate(cols)]
        split = F.split(F.col("value"), _re.escape(sep))
        if names:
            df = df.select(
                "key",
                *[split.getItem(i).cast(cols[i].get("type", "string")).alias(n)
                  for i, n in enumerate(names)],
            )
    # "column" here is the field-spec list, not a projection — pass only the
    # shared pushdown knobs through.
    return _apply_pushdown(df, {"where": p.get("where"), "columns": p.get("columns")})


def _hive_ddl_cols(p: dict) -> str:
    if "schema" in p:
        return p["schema"]
    cols = p.get("column") or []
    return ", ".join(f"{c['name']} {c.get('type', 'string')}" for c in cols)


@reader("rcfilereader")
def rcfile_reader(spark: SparkSession, p: dict) -> DataFrame:
    """RCFile reader (hdfsreader's RC format, HdfsReader.java:82-89) via the
    Hive serde that ships with the Spark distribution: an external
    STORED AS RCFILE table over the path. Requires a hive-enabled session
    (``get_spark(hive=True)`` / ``enableHiveSupport``); columnar projection
    pushdown comes from the RCFile serde itself. The declared schema must
    match the writer's column types exactly — the serde surfaces a mismatch
    as ArrayIndexOutOfBounds at scan time, not as a type error."""
    if spark.conf.get("spark.sql.catalogImplementation", "in-memory") != "hive":
        raise NotImplementedError(
            "rcfilereader needs a hive-enabled SparkSession "
            "(SparkSession.builder.enableHiveSupport() / get_spark(hive=True))"
        )
    import uuid

    name = f"dsx_rc_{uuid.uuid4().hex[:12]}"
    spark.sql(
        f"CREATE EXTERNAL TABLE {name} ({_hive_ddl_cols(p)}) "
        f"STORED AS RCFILE LOCATION '{_paths(p)[0]}'"
    )
    # the external table stays registered for the session (dropping it here
    # would invalidate the lazy plan); names are uuid-suffixed
    return _apply_pushdown(
        spark.table(name), {"where": p.get("where"), "columns": p.get("columns")}
    )


@reader("cassandrareader")
def cassandra_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Token-range-split Cassandra read (CassandraReaderHelper.splitJob:
    416-469); see sources/nosql.py for the split-arithmetic parity."""
    from datax_spark.sources.nosql import cassandra_read

    return cassandra_read(spark, p)


@reader("gdbreader")
def gdb_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Gremlin graph-dump export with DefaultGdbMapper columnType rules
    (GdbReader.java / DefaultGdbMapper.getMapper:28-71)."""
    from datax_spark.sources.nosql import gdb_read

    return gdb_read(spark, p)


@reader("clickhousereader")
def clickhouse_reader(spark: SparkSession, p: dict) -> DataFrame:
    """ClickHouse read over the HTTP interface (sources/clickhouse_http.py):
    column/where/splitPk/querySql parity with the reference's JDBC-dialect
    reader, per-task HTTP split queries, from_json typed decode."""
    from datax_spark.sources.clickhouse_http import clickhouse_http_read

    return clickhouse_http_read(
        spark, p["httpUrl"], p["schema"], table=p.get("table"),
        columns=p.get("column"), where=p.get("where"),
        split_pk=p.get("splitPk"), n_splits=int(p.get("splits", 1)),
        query_sql=p.get("querySql"), database=p.get("database"),
        user=p.get("username"), password=p.get("password"),
    )


@reader("mongodbreader")
def mongodb_reader(spark: SparkSession, p: dict) -> DataFrame:
    """mongoexport extended-JSON dump mode (sources/mongo_json.py): the
    reference's column meta {name,type,splitter} and _id range-split task
    predicate (MongoDBReader.java:110-188) over a dump path; the live BSON
    wire protocol stays out of sandbox reach (documented)."""
    from datax_spark.sources.mongo_json import mongo_export_read

    bounds = p.get("idBounds")
    df = mongo_export_read(
        spark, p["path"], p["column"],
        id_bounds=tuple(bounds) if bounds else None,
        id_type=p.get("idType", "objectid"),
    )
    return _apply_pushdown(df, {k: v for k, v in p.items() if k != "column"})


@reader("hbase20xsqlreader")
def hbase20xsql_reader(spark: SparkSession, p: dict) -> DataFrame:
    """Phoenix SQL-over-HBase read (sources/phoenix.py): reference config
    keys (hbase20xsqlreader Key.java — table/column/schema/splitKey/
    splitPoint/where/querySql) mapped onto the shared DB-API seam;
    ``queryServerAddress`` becomes the driver's connect target (`phoenixdb`
    on a cluster, sqlite3 in-sandbox tests)."""
    from datax_spark.sources.phoenix import phoenix_read

    return phoenix_read(
        spark, p.get("driver", "phoenixdb"), p["queryServerAddress"],
        p["outputSchema"], table=p.get("table"), columns=p.get("column"),
        where=p.get("where"), split_key=p.get("splitKey"),
        split_points=p.get("splitPoint"),
        split_point_kind=p.get("splitPointKind", "long"),
        num_partitions=int(p.get("numPartitions", 4)),
        query_sqls=p.get("querySql"), catalog_sql=p.get("catalogSql"),
        fetch_size=int(p.get("fetchSize", 1024)),
        connect_args=p.get("connectArgs"), schema_name=p.get("schema"),
    )


@reader("hbase11xreader")
def hbase11x_reader(spark: SparkSession, p: dict) -> DataFrame:
    """HBase scan through the REST gateway (sources/hbase_rest.py): one task
    per region overlapping [startRowkey, endRowkey) (Hbase11xHelper.doSplit
    parity), normal or multi-version cell mode."""
    from datax_spark.sources.hbase_rest import hbase_read

    mode = p.get("mode", "normal")
    maxv = int(p.get("maxVersion", 1))
    return hbase_read(
        spark, p["gatewayUrl"], p["table"], p["column"],
        start_rowkey=p.get("startRowkey", ""),
        end_rowkey=p.get("endRowkey", ""),
        mode="multiversion" if mode.lower().startswith("multiversion") else "normal",
        max_versions=(2**31 - 1) if maxv == -1 else maxv,  # -1 = all versions
        batch=int(p.get("batch", 1000)),
    )


@reader("lakereader")
def lake_reader(spark: SparkSession, p: dict) -> DataFrame:
    from datax_spark.lake.table import LakeTable

    t = LakeTable(spark, p["root"])
    # `where` pushes into the lake read: manifest zone-map file pruning +
    # the parquet-scan predicate pushdown, not just a post-scan filter
    df = t.read(version=p.get("version"), buckets=p.get("buckets"),
                where=p.get("where"))
    return _apply_pushdown(df, {k: v for k, v in p.items() if k != "where"})


# ---------------------------------------------------------------------------
# Reference plugin-name aliases.
#
# DataX ships ~20 RDBMS reader plugins that are one class each: a subclass of
# CommonRdbmsReader pinned to a DataBaseType constant (mysqlreader/.../
# MysqlReader.java:24, oraclereader, postgresqlreader, ...). The mechanism —
# column/where/splitPk/fetchSize/querySql with range + string + quantile
# splits — lives in the shared core, implemented here once as the DB-API
# reader (sources/dbapi.py, tested over real sqlite3). Each reference name
# resolves to that core (the dialect only matters on the write side, where
# dbapi_write renders per-dialect upsert templates).
_RDBMS_READER_NAMES = (
    "mysqlreader", "oraclereader", "postgresqlreader", "sqlserverreader",
    "rdbmsreader", "drdsreader", "gaussdbreader", "kingbaseesreader",
    "oceanbasev10reader", "sybasereader", "dorisreader", "starrocksreader",
    "tdenginereader",
)
for _n in _RDBMS_READER_NAMES:
    READERS[_n] = dbapi_reader

# hbase11xsqlreader (Phoenix 4.x over HBase 1.x) shares the Phoenix
# splitPoints/thin-JDBC semantics of hbase20xsqlreader
READERS["hbase11xsqlreader"] = READERS["hbase20xsqlreader"]
# hbase094x speaks the same REST scan surface as the 1.x gateway reader
READERS["hbase094xreader"] = READERS["hbase11xreader"]
# odpsreader (partitioned lake scan) and otsreader (keyed PK-range scan)
# are the lake table's read modes in this engine — documented analogs
# (SURVEY §2.1 #7/#13): partition pruning = bucket/zone-map pruning,
# GetRow = keyed lookup pushdown
READERS["odpsreader"] = READERS["lakereader"]
READERS["otsreader"] = READERS["lakereader"]


@reader("datahubreader")
@reader("loghubreader")
def loghub_reader(spark: SparkSession, p: dict) -> DataFrame:
    """loghub/datahub batch pull (LogHubReader's cursor-window analog —
    reference loghubreader pulls [beginCursor, endCursor) per shard): the
    keyed epoch=K/shard=S feed layout IS the topic; ``beginEpoch``/
    ``endEpoch`` select the half-open cursor window via partition pruning
    (epoch is a partition column — no data read outside the window), and
    ``shards`` restricts to a shard subset like a consumer group split."""
    df = spark.read.options(**p.get("options", {})).parquet(p["path"])
    if p.get("beginEpoch") is not None:
        df = df.filter(F.col("epoch") >= int(p["beginEpoch"]))
    if p.get("endEpoch") is not None:
        df = df.filter(F.col("epoch") < int(p["endEpoch"]))
    if p.get("shards"):
        df = df.filter(F.col("shard").isin([int(x) for x in p["shards"]]))
    return _apply_pushdown(df, p)


@reader("hdfsreader")
def hdfs_reader(spark: SparkSession, p: dict) -> DataFrame:
    """hdfsreader (HdfsReader.java:82-89): fileType dispatch over the six
    storage formats — TEXT/CSV delimited, ORC, PARQUET, SEQ, RC. Path
    globbing, column specs, and compression ride each format reader."""
    ft = str(p.get("fileType", "text")).lower()
    target = {"text": "txtfilereader", "csv": "csvreader",
              "orc": "orcreader", "parquet": "parquetreader",
              "seq": "seqfilereader", "rc": "rcfilereader"}.get(ft)
    if target is None:
        raise ValueError(f"hdfsreader: unsupported fileType {ft!r}")
    return READERS[target](spark, p)


@reader("opentsdbreader")
@reader("tsdbreader")
def tsdb_reader(spark: SparkSession, p: dict) -> DataFrame:
    """OpenTSDB/TSDB range read (TSDBReader.java:163-270): metric IN-list +
    half-open [beginDateTime, endDateTime) + tag equality, pushed down into
    the tall-series scan (sources/tsdb.py:series_read)."""
    from datax_spark.sources.tsdb import series_read

    fmt = p.get("format", "parquet")
    src = spark.read.options(**p.get("options", {}))
    df = src.parquet(p["path"]) if fmt == "parquet" else src.json(p["path"])
    return series_read(
        df, p["column"] if isinstance(p.get("column"), list)
        else [p.get("metric")],
        begin=p.get("beginDateTime"), end=p.get("endDateTime"),
        tags=p.get("tags"), output=p.get("output", "rdb"),
        metric_col=p.get("metricCol", "metric"),
        ts_col=p.get("tsCol", "ts"), value_col=p.get("valueCol", "value"),
        tag_cols=p.get("tagCols"))


# otsstreamreader (the CDC tail) batch-pulls an epoch window of the keyed
# feed — the engine/streaming source are its continuous forms
READERS["otsstreamreader"] = READERS["loghubreader"]


def _paths(p: dict) -> list[str]:
    path = p.get("path")
    if isinstance(path, str):
        return [path]
    return list(path)


def build_reader(spark: SparkSession, name: str, parameter: dict) -> DataFrame:
    if name not in READERS:
        raise KeyError(f"unknown reader {name!r}; available: {sorted(READERS)}")
    return READERS[name](spark, parameter)
