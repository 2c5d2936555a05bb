from datax_spark.transforms.registry import (  # noqa: F401
    TRANSFORMS,
    apply_transform_chain,
    register_transform,
)
