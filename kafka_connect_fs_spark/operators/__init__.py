from kafka_connect_fs_spark.operators.asof import asof_join  # noqa: F401
from kafka_connect_fs_spark.operators.lww import lww_dedup  # noqa: F401
from kafka_connect_fs_spark.operators.rangejoin import interval_join  # noqa: F401
