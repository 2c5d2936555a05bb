from datax_spark.streaming.changelog import (  # noqa: F401
    LakeChangelogDataSource,
    read_changelog_stream,
)
from datax_spark.streaming.feed import StreamingCdcEngine  # noqa: F401
