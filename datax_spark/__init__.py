"""datax_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Capabilities re-expressed Spark-first from the reference data-movement engine
(Alibaba DataX, surveyed in SURVEY.md): partitioned parallel extract, per-event
vectorized transforms, keyed MERGE apply with insert/update/delete semantics,
checkpointed incremental replay with exactly-once commit manifests, schema
evolution, rate/error governance, and throughput metrics.

Layout:
- ``lake``       snapshot-committed ACID parquet table (Iceberg-style semantics)
- ``cdc``        change-feed generator, latest-wins dedupe, batch epoch engine,
                 changelog-maintained views (rollups, dedup/ANN indexes,
                 per-group audits)
- ``streaming``  Structured Streaming front-end (readStream + foreachBatch)
- ``transforms`` DataX dx_* transformer equivalents as DataFrame expressions
- ``sources``    reader/writer factories (parquet/csv/json/orc/jdbc/synthetic)
- ``plans``      DataX-flavored JSON job-spec runner
- ``ops``        large-scale training-data ops (dedup, similarity, text,
                 curation, transcripts, multimodal)
"""

__version__ = "0.1.0"

from datax_spark.session import get_spark  # noqa: F401
