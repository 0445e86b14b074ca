from kafka_connect_fs_spark.operators.lww import lww_dedup  # noqa: F401
