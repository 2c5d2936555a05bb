from datax_spark.lake.fs import LakeFS, LocalFS  # noqa: F401
from datax_spark.lake.objectstore import (  # noqa: F401
    LocalEmulatedObjectStore,
    ObjectFS,
    ObjectStoreClient,
    S3ObjectStore,
)
from datax_spark.lake.table import LakeTable  # noqa: F401
