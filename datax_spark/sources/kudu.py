"""Kudu writer re-expressed Spark-first (reference ``kuduwriter`` plugin).

The reference plugin (kuduwriter/.../Kudu11xWriterTask.java, Kudu11xHelper.java)
pulls rows off the channel one at a time, parses every cell from its string
form into the declared Kudu type, applies an Insert or Upsert through a
MANUAL_FLUSH session, and flushes at 80% of ``writeBatchSize``. This module
keeps those *semantics* but frames them as DataFrame work:

- spec validation — column types, primary-key prefix rule
  (``Kudu11xHelper.getPrimaryKeyIndexUntil:243-253`` walks the spec from the
  front and stops at the first non-pk column, so pk columns MUST lead);
- blank-pk dirty rule (``KuduWriterTask.startWriter:76-86``: a pk cell whose
  string form is null/blank makes the record dirty, not fatal);
- string→type coercion per cell (``KuduWriterTask:104-150``:
  ``column.asString()`` then ``Integer.parseInt`` etc.; a parse failure is a
  record failure → dirty under ``skipFail``, fatal otherwise; note Java's
  ``Boolean.parseBoolean`` accepts only the literal ``"true"``);
- insertMode insert/upsert/update (``InsertModeType.java``;
  ``KuduWriterTask:52`` maps update→upsert: ``isUpsert = !mode.equals
  ("insert")``, and the task never issues a Kudu Update op);
- tablet partitioning (``Kudu11xHelper.setTablePartition:255-293``): default
  hash×3 on the FIRST spec column, explicit hash partitioning on named
  columns, or range partitioning with string [lower, upper) bounds — a row
  outside every range has no tablet (real Kudu raises
  ``NonCoveredRangeException``) → dirty under ``skipFail``, fatal otherwise;
- MANUAL_FLUSH batching (``KuduWriterTask:168-173``): ops accumulate per
  session and flush at ``0.8 * writeBatchSize`` — reproduced as explicit
  flush framing in the operation stream.

Tablet routing uses ``xxhash64 % hashNum`` as the hash analog (real Kudu
hashes the Kudu-encoded key with Murmur2-64; the property that matters for
the writer — a deterministic, balanced key→tablet map that co-locates equal
keys — is preserved, and the map is documented as an analog).

At scale the write is one tablet-partitioned shuffle: rows route to
``n_tablets`` reducers, each reducer owns whole tablets, and the fold /
conflict checks are per-tablet-local — no cross-tablet traffic, exactly how
a real Kudu session fans out to tablet servers.
"""

from __future__ import annotations


from datax_spark.sources.store_swap import staged_swap, store_exists

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ColumnType.java — the seven accepted spec types and their Kudu targets
# (Kudu11xHelper.getSchema:215-221 maps BIGINT/LONG→INT64, INT→INT32).
KUDU_TYPES: dict[str, str] = {
    "int": "int",
    "long": "bigint",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
}

DEFAULT_HASH_NUM = 3  # Kudu11xHelper.setTablePartition:262 / CreateTable default


def kudu_normalize_spec(p: dict) -> dict:
    """Validate the writer parameter block and return a normalized spec.

    Mirrors ``Kudu11xHelper.validateParameter`` + ``getSchema``: required
    table/column, known types, at least one primaryKey, and the pk-prefix
    rule (pk columns must be the leading spec entries — the reference's
    ``getPrimaryKeyIndexUntil`` silently treats a pk column after a non-pk
    column as data, which corrupts the dirty check; we make it an error).
    """
    cols = p.get("column")
    if not cols:
        raise ValueError("kuduwriter: 'column' is required and non-empty")
    norm = []
    pk_until = 0
    past_pk = False
    for i, c in enumerate(cols):
        name = c.get("name")
        if not name:
            raise ValueError(f"kuduwriter: column[{i}] missing 'name'")
        ctype = str(c.get("type", "string")).lower()
        if ctype not in KUDU_TYPES:
            raise ValueError(
                f"kuduwriter: unsupported type {ctype!r} for {name!r}; "
                f"supported: {sorted(KUDU_TYPES)}")
        is_pk = bool(c.get("primaryKey", False))
        if is_pk:
            if past_pk:
                raise ValueError(
                    "kuduwriter: primaryKey columns must be the leading "
                    f"spec entries (column {name!r} declared primaryKey "
                    "after a non-pk column; the reference's pk-prefix walk "
                    "Kudu11xHelper.getPrimaryKeyIndexUntil would ignore it)")
            pk_until = i + 1
        else:
            past_pk = True
        norm.append({"name": name, "type": ctype,
                     "spark_type": KUDU_TYPES[ctype], "primaryKey": is_pk})
    if pk_until == 0:
        raise ValueError("kuduwriter: at least one leading primaryKey "
                         "column is required")
    mode = str(p.get("insertMode", "upsert")).lower()
    if mode not in ("insert", "upsert", "update"):
        # validateParameter falls back to the default on an unknown mode
        mode = "upsert"
    batch = int(p.get("writeBatchSize", 512))
    partition = p.get("partition") or {}
    if partition.get("range") and len(partition["range"]) != 1:
        raise ValueError("kuduwriter: exactly one range column is supported "
                         "(the reference's multi-column loop sets only one "
                         "bound column per partition, which real Kudu rejects)")
    return {
        "columns": norm,
        "pk": [c["name"] for c in norm[:pk_until]],
        "insert_mode": mode,
        "is_upsert": mode != "insert",  # KuduWriterTask:52 — update ⇒ upsert
        "batch": batch,
        "skip_fail": bool(p.get("skipFail", False)),
        "partition": partition,
        "hash_num": int(p.get("hashNum", DEFAULT_HASH_NUM)),
    }


def kudu_tablet_expr(spec: dict) -> tuple[Column, int]:
    """Column assigning each row its tablet id, plus the tablet count.

    Default / hash partitioning → ``xxhash64(cols) pmod n`` (analog of
    Kudu's Murmur2-64 bucket over the encoded key). Range partitioning →
    index of the first [lower, upper) string range covering the row's range
    column, ``-1`` when none covers it (real Kudu: NonCoveredRangeException).
    """
    part = spec["partition"]
    if part.get("range"):
        (col_name, bounds), = part["range"].items()
        expr = F.lit(-1)
        # later ranges win ties, so build from the back; bounds are string
        # [lower, upper) exactly like PartialRow.addString in setTablePartition
        for i in range(len(bounds) - 1, -1, -1):
            b = bounds[i]
            c = F.col(col_name).cast("string")
            expr = F.when(
                (c >= F.lit(str(b["lower"]))) & (c < F.lit(str(b["upper"]))),
                F.lit(i)).otherwise(expr)
        return expr, len(bounds)
    if part.get("hash"):
        hcols = part["hash"]["column"]
        n = spec["hash_num"]
    else:
        hcols = [spec["columns"][0]["name"]]  # setTablePartition:261-264
        n = DEFAULT_HASH_NUM
    return F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in hcols]),
                  F.lit(n)).cast("int"), n


def _coerced(df: DataFrame, spec: dict) -> DataFrame:
    """Apply the reference's per-cell string→type coercion.

    Adds ``_dirty`` (blank pk → 'primarykey field is null', parse failure →
    'type coercion failed: <col>') alongside the typed columns. NULL cells
    stay NULL (``row.setNull`` path, KuduWriterTask:108-113).
    """
    dirty = F.lit(None).cast("string")
    # blank-pk rule first — it wins (the task checks pks before any parsing)
    blank = F.lit(False)
    for name in spec["pk"]:
        s = F.trim(F.col(name).cast("string"))
        blank = blank | s.isNull() | (s == "")
    dirty = F.when(blank, F.lit("primarykey field is null")).otherwise(dirty)
    # one select so every raw expression resolves against the ORIGINAL
    # columns (withColumn would replace them before dirty evaluates)
    typed_cols = []
    for c in spec["columns"]:
        raw = F.col(c["name"]).cast("string")
        if c["type"] == "boolean":
            # Java Boolean.parseBoolean: the literal "true" (any case) is
            # true, EVERYTHING else — "1", "yes", garbage — is false
            typed = F.when(raw.isNull(), F.lit(None).cast("boolean")) \
                     .otherwise(F.lower(raw) == "true")
        else:
            typed = raw.try_cast(c["spark_type"])
            # non-null string that fails to parse = record failure
            dirty = F.when(
                dirty.isNull() & raw.isNotNull() & typed.isNull(),
                F.lit(f"type coercion failed: {c['name']}")).otherwise(dirty)
        typed_cols.append(typed.alias(c["name"]))
    return df.select(*typed_cols, dirty.alias("_dirty"))


def kudu_operations(df: DataFrame, p: dict) -> DataFrame:
    """The operation stream a Kudu session applies — the cluster-mode
    artifact (one task per tablet, MANUAL_FLUSH framing).

    Columns: ``tablet`` (target tablet id), ``op`` (UPSERT or INSERT —
    KuduWriterTask:92-99), ``flush`` (flush-group ordinal within the tablet
    task: the session flushes at 80% of ``writeBatchSize``,
    KuduWriterTask:168-173), ``row`` (JSON cell map). Dirty rows are
    excluded — they go to the collector, never to the session.
    """
    spec = kudu_normalize_spec(p)
    tablet, n = kudu_tablet_expr(spec)
    typed = _coerced(df, spec)
    clean = typed.filter(F.col("_dirty").isNull()).drop("_dirty")
    flush_every = max(1, int(spec["batch"] * 0.8))
    op = F.lit("UPSERT" if spec["is_upsert"] else "INSERT")
    routed = (clean.withColumn("tablet", tablet)
              .filter(F.col("tablet") >= 0)
              .repartition(max(n, 1), "tablet"))
    # monotonically_increasing_id is contiguous per task, so floor-div frames
    # consecutive ops of ONE tablet task into session flush groups
    return routed.withColumn(
        "flush", F.floor(
            F.pmod(F.monotonically_increasing_id(), F.lit(1 << 33))
            / flush_every)) \
        .select("tablet", op.alias("op"), "flush",
                F.to_json(F.struct(*[c["name"] for c in spec["columns"]]))
                .alias("row"))


def kudu_write(spark: SparkSession, df: DataFrame, p: dict) -> dict:
    """Apply the writer's semantics to the local tablet-store analog.

    ``p``: path, column (spec list with primaryKey flags), insertMode,
    writeBatchSize, skipFail, partition {hash|range}, hashNum.

    Semantics preserved from the reference: blank-pk and parse-failure rows
    are dirty (skipFail) or fatal; a row no range covers is dirty/fatal;
    insert mode fails on an existing key (Kudu 'key already present');
    upsert/update supersede by pk. Duplicate pks arriving in one batch fold
    to a deterministic survivor (max over non-key columns) — the reference's
    arrival-order winner is nondeterministic under Spark's shuffle, so the
    analog picks a stable one. The store is parquet partitioned by tablet
    (one directory per tablet, as a tablet server would own it), staged and
    atomically swapped like the other writer analogs.
    """
    spec = kudu_normalize_spec(p)
    path = p["path"]
    pk = spec["pk"]
    names = [c["name"] for c in spec["columns"]]
    non_pk = [c for c in names if c not in pk]

    typed = _coerced(df, spec).cache()
    try:
        n_dirty = typed.filter(F.col("_dirty").isNotNull()).count()
        if n_dirty and not spec["skip_fail"]:
            sample = typed.filter(F.col("_dirty").isNotNull()) \
                          .select("_dirty").first()[0]
            raise RuntimeError(
                f"kuduwriter: {n_dirty} record(s) failed ({sample}); set "
                "skipFail to collect them as dirty instead")
        clean = typed.filter(F.col("_dirty").isNull()).drop("_dirty")

        tablet, n_tablets = kudu_tablet_expr(spec)
        routed = clean.withColumn("_tablet", tablet)
        n_uncovered = routed.filter(F.col("_tablet") < 0).count()
        if n_uncovered and not spec["skip_fail"]:
            raise RuntimeError(
                f"kuduwriter: {n_uncovered} record(s) fall outside every "
                "range partition (NonCoveredRangeException); set skipFail "
                "to collect them as dirty instead")
        routed = routed.filter(F.col("_tablet") >= 0)

        # tablet dirs are `_tablet=N` — underscore-prefixed but real data
        exists = store_exists(path, ("_tablet=",))
        old = spark.read.parquet(path).select(*names) if exists else None

        n_conflict = 0
        if spec["insert_mode"] == "insert" and old is not None:
            conflicts = routed.join(old.select(*pk), pk, "left_semi")
            n_conflict = conflicts.count()
            if n_conflict and not spec["skip_fail"]:
                raise RuntimeError(
                    f"kuduwriter: insert mode — {n_conflict} key(s) already "
                    "present; use upsert or set skipFail")
            routed = routed.join(old.select(*pk), pk, "left_anti") \
                .select(*names, "_tablet")

        # fold batch-internal duplicate pks to one deterministic survivor
        if non_pk:
            ranked = routed.withColumn(
                "_s", F.struct(*[F.col(c) for c in non_pk]))
            incoming = ranked.groupBy(*pk).agg(
                F.max("_s").alias("_s"), F.max("_tablet").alias("_tablet")
            ).select(*pk,
                     *[F.col(f"_s.{c}").alias(c) for c in non_pk], "_tablet")
        else:
            incoming = routed.dropDuplicates(pk)

        if old is not None:
            if spec["is_upsert"]:
                keep = old.join(incoming.select(*pk), pk, "left_anti")
            else:  # insert mode: conflicts already removed from incoming
                keep = old
            keep_t, _ = kudu_tablet_expr(spec)
            merged = incoming.unionByName(
                keep.withColumn("_tablet", keep_t)
                    .filter(F.col("_tablet") >= 0))
        else:
            merged = incoming

        def write_tmp(tmp: str) -> int:
            merged.repartition(max(n_tablets, 1), "_tablet") \
                  .write.partitionBy("_tablet").parquet(tmp)
            return spark.read.parquet(tmp).count()

        n_rows = staged_swap(path, write_tmp)
        return {"written": True, "rows": n_rows,
                "dirty": n_dirty + n_uncovered
                + (n_conflict if spec["insert_mode"] == "insert"
                   and spec["skip_fail"] else 0),
                "tablets": n_tablets}
    finally:
        typed.unpersist()


def kudu_read(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """Read the tablet-store analog back (drops the tablet routing column)."""
    return spark.read.parquet(path).select(*columns)
