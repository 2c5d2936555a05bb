from datax_spark.streaming.feed import StreamingCdcEngine  # noqa: F401
