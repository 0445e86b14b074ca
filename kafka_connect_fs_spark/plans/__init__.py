from kafka_connect_fs_spark.plans.lake import LakeTable  # noqa: F401
