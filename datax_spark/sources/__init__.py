from datax_spark.sources.readers import READERS, build_reader  # noqa: F401
from datax_spark.sources.writers import WRITERS, build_writer  # noqa: F401
