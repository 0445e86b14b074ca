from kafka_connect_fs_spark.testing.generator import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    expected_final_state,
    transcript_change_events,
    write_csv,
    write_jsonl,
)
