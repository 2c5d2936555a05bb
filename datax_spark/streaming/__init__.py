from datax_spark.streaming.changelog import (  # noqa: F401
    LakeChangelogDataSource,
    read_changelog_stream,
)
from datax_spark.streaming.dedup import dedup_stream  # noqa: F401
from datax_spark.streaming.feed import StreamingCdcEngine  # noqa: F401
from datax_spark.streaming.stateful import conversation_sessions  # noqa: F401
from datax_spark.streaming.windowed import (  # noqa: F401
    run_windowed_rollup,
    session_rollup,
    windowed_rollup,
)
