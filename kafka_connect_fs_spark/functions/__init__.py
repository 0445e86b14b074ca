from kafka_connect_fs_spark.functions import dedup, multimodal, sampling, similarity, text  # noqa: F401
