from kafka_connect_fs_spark.functions import dedup, multimodal, similarity, text  # noqa: F401
