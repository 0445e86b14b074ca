"""Subprocess smoke tests for the spark-submit entry points — the last
previously-untested surface: argument parsing, schema-json loading, policy
wiring, and JSON result emission, end to end in a child interpreter (the
shape `spark-submit jobs/ingest_job.py ...` executes on a cluster)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA_JSON = {
    "type": "struct",
    "fields": [
        {"name": "conv_id", "type": "string", "nullable": True, "metadata": {}},
        {"name": "turn_idx", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "role", "type": "string", "nullable": True, "metadata": {}},
        {"name": "text", "type": "string", "nullable": True, "metadata": {}},
        {"name": "tool", "type": "string", "nullable": True, "metadata": {}},
        {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
    ],
}


def run_job(script: str, args: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # local[2] keeps the child session light; on a cluster spark-submit
    # provides the session instead
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[2] --conf spark.sql.shuffle.partitions=2 "
        "--conf spark.ui.enabled=false pyspark-shell"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", script), *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # last stdout line is the job's JSON result
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_ingest_then_maintenance_jobs_end_to_end(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    rows = [
        {
            "conv_id": f"c{i % 3}",
            "turn_idx": i,
            "role": "user",
            "text": f"t{i}",
            "tool": None,
            "ts": f"2024-01-01T00:00:{i:02d}",
        }
        for i in range(12)
    ]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(json.dumps(SCHEMA_JSON))
    table = str(tmp_path / "table")

    out = run_job(
        "ingest_job.py",
        [
            "--uris", str(src),
            "--format", "jsonl",
            "--schema-json", str(schema_path),
            "--table", table,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--n-buckets", "2",
            "--policy", "sleepy",
            "--sleep", "0.01",
            "--max-execs", "2",
        ],
    )
    assert out["events"] == 12 and out["rows_written"] == 12
    assert out["batches"] == 2  # second trigger was a no-op batch

    # maintenance over the same table root, separate process
    m1 = run_job(
        "maintenance_job.py", ["--table", table, "compact", "--min-files-per-bucket", "1"]
    )
    assert m1["cmd"] == "compact"
    m2 = run_job(
        "maintenance_job.py", ["--table", table, "vacuum", "--retain-versions", "1"]
    )
    assert m2["files_removed"] >= 0


def test_table_state_after_jobs(spark, tmp_path):
    """Same flow, then reopen in-process and assert final state."""
    src = tmp_path / "src"
    os.makedirs(src)
    with open(src / "a.jsonl", "w") as f:
        for i in range(5):
            f.write(
                json.dumps(
                    {
                        "conv_id": "c1",
                        "turn_idx": i,
                        "role": "user",
                        "text": f"t{i}",
                        "tool": None,
                        "ts": f"2024-01-01T00:00:{i:02d}",
                    }
                )
                + "\n"
            )
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(json.dumps(SCHEMA_JSON))
    table = str(tmp_path / "table")
    out = run_job(
        "ingest_job.py",
        [
            "--uris", str(src),
            "--schema-json", str(schema_path),
            "--table", table,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--n-buckets", "2",
            "--policy", "simple",
        ],
    )
    assert out["rows_written"] == 5
    from kafka_connect_fs_spark.plans.lake import LakeTable

    t = LakeTable(spark, table)
    assert {(r.conv_id, r.turn_idx) for r in t.read().collect()} == {
        ("c1", i) for i in range(5)
    }


def test_ingest_job_cobol_with_reader_options_json(tmp_path):
    """EBCDIC source through the CLI: --format agnostic dispatches .dt to
    the cobol reader, with the copybook passed via --reader-options-json
    and the moved files gaining --cleanup-move-prefix."""
    sys.path.insert(0, REPO)
    from tests.test_cobol import CPY, ROWS, write_fixture

    src = tmp_path / "src"
    os.makedirs(src)
    write_fixture(str(src / "dump.dt"), ROWS[:40])
    opts_path = tmp_path / "reader.json"
    with open(opts_path, "w") as f:
        json.dump({"copybook_content": CPY, "schema_policy": "collapse_root"}, f)
    out = run_job(
        "ingest_job.py",
        [
            "--uris", str(src),
            "--format", "agnostic",
            "--reader-options-json", str(opts_path),
            "--table", str(tmp_path / "table"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--keys", "CONV_ID", "TURN_IDX",
            "--ts-col", "TS",
            "--n-buckets", "2",
            "--cleanup", "move",
            "--cleanup-move-dir", str(tmp_path / "done"),
            "--cleanup-move-prefix", "ok-",
            "--policy", "sleepy", "--sleep", "0.1", "--max-execs", "3",
        ],
    )
    assert out["events"] == 40
    assert (tmp_path / "done" / "ok-dump.dt").exists()
