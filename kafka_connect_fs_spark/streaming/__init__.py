from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine  # noqa: F401
from kafka_connect_fs_spark.streaming.triggers import (  # noqa: F401
    CronPolicy,
    SimplePolicy,
    SleepyPolicy,
)
