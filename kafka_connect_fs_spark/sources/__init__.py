from kafka_connect_fs_spark.sources.cobol import read_cobol  # noqa: F401  (registers 'cobol')
from kafka_connect_fs_spark.sources.discovery import expand_dynamic_uri, list_files  # noqa: F401
from kafka_connect_fs_spark.sources.hdfs_inotify import HdfsInotifyPolicy  # noqa: F401
from kafka_connect_fs_spark.sources.s3_events import S3EventNotificationsPolicy  # noqa: F401
from kafka_connect_fs_spark.sources.watermarks import WatermarkStore  # noqa: F401
