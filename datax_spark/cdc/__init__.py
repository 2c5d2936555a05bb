from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed  # noqa: F401
from datax_spark.cdc.merge import dedupe_latest  # noqa: F401
from datax_spark.cdc.engine import CdcEngine, EngineConfig  # noqa: F401
from datax_spark.cdc.sync import ChangelogFollower, IncrementalSync, SyncTarget  # noqa: F401
from datax_spark.cdc.rollup import AggSpec, ContinuousAggregate  # noqa: F401
from datax_spark.cdc.dedup_index import EmbeddingLshIndex, MinHashIndex  # noqa: F401
from datax_spark.cdc.audit import GroupedRecomputeIndex, transcript_audit_index  # noqa: F401
