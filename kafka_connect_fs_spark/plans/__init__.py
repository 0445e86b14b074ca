from kafka_connect_fs_spark.plans.lake import LakeTable  # noqa: F401
from kafka_connect_fs_spark.plans.materialized import (  # noqa: F401
    IncrementalRollup,
    RefreshStats,
)
