"""End-to-end IngestEngine tests — the reference's FsSourceTaskTest analog.

Covers: full replay == oracle, no-op re-run, append tailing (resume from
committed offset — FsSourceTaskTest.java:171-185), skip-finished files
(:260-271), batching across triggers (:189-256), error tolerance (:285-316),
cleanup MOVE/DELETE (PolicyTestBase.java:162-232), regex filtering
(:141-157), crash recovery between MERGE and watermark commit (exactly-once,
beyond the reference's at-least-once).
"""

from __future__ import annotations

import os

import pytest

from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
from kafka_connect_fs_spark.testing.generator import (
    CHANGE_EVENT_SCHEMA,
    append_jsonl,
    expected_final_state,
    transcript_change_events,
    write_jsonl,
)


def make_engine(spark, tmp_path, src_dir="src", **overrides) -> IngestEngine:
    os.makedirs(tmp_path / src_dir, exist_ok=True)
    kwargs = dict(
        uris=[str(tmp_path / src_dir)],
        table_root=str(tmp_path / "table"),
        checkpoint_root=str(tmp_path / "ckpt"),
        fmt="jsonl",
        schema=CHANGE_EVENT_SCHEMA,
        n_buckets=4,
    )
    kwargs.update(overrides)
    return IngestEngine(spark, IngestConfig(**kwargs))


def table_state(engine) -> dict:
    return {
        (r.conv_id, r.turn_idx): r.text for r in engine.lake.read().collect()
    }


def assert_matches_oracle(engine, rows):
    exp = {k: v["text"] for k, v in expected_final_state(rows).items()}
    assert table_state(engine) == exp


def test_full_replay_matches_oracle_with_duplicates_and_out_of_order(spark, tmp_path):
    rows = transcript_change_events(20, 5, n_versions=3, shuffle=True)
    third = len(rows) // 3
    engine = make_engine(spark, tmp_path)
    write_jsonl(rows[:third], str(tmp_path / "src" / "a.jsonl"))
    write_jsonl(rows[third : 2 * third], str(tmp_path / "src" / "b.jsonl"))
    write_jsonl(rows[2 * third :], str(tmp_path / "src" / "c.jsonl"))
    res = engine.run_once()
    assert res.n_files == 3 and res.n_events == len(rows)
    assert_matches_oracle(engine, rows)


def test_second_run_is_noop(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(5, 3)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()
    res2 = engine.run_once()
    assert res2.n_files == 0 and res2.n_events == 0
    assert_matches_oracle(engine, rows)


def test_append_tail_resumes_from_offset(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(10, 4, n_versions=2)
    half = len(rows) // 2
    p = str(tmp_path / "src" / "grow.jsonl")
    write_jsonl(rows[:half], p)
    r1 = engine.run_once()
    assert r1.n_events == half
    append_jsonl(rows[half:], p)
    r2 = engine.run_once()
    assert r2.n_events == len(rows) - half  # ONLY the tail, not a re-read
    assert_matches_oracle(engine, rows)


def test_mid_batch_crash_recovery_is_exactly_once(spark, tmp_path, monkeypatch):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(8, 3)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))

    real_commit = engine.watermarks.commit
    calls = {"n": 0}

    def exploding_commit(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash between MERGE and watermark commit")

    monkeypatch.setattr(engine.watermarks, "commit", exploding_commit)
    with pytest.raises(RuntimeError):
        engine.run_once()
    assert calls["n"] == 1
    monkeypatch.setattr(engine.watermarks, "commit", real_commit)

    res = engine.run_once()  # replay of the same batch
    assert res.recovered is True
    assert_matches_oracle(engine, rows)
    # and the batch after that sees nothing new
    res3 = engine.run_once()
    assert res3.n_events == 0 and res3.recovered is False


def test_files_per_trigger_batches_deterministically(spark, tmp_path):
    engine = make_engine(spark, tmp_path, files_per_trigger=2)
    rows = transcript_change_events(9, 2)
    per_file = len(rows) // 3
    for i in range(3):
        write_jsonl(rows[i * per_file : (i + 1) * per_file], str(tmp_path / "src" / f"f{i}.jsonl"))
    r1, r2 = engine.run_once(), engine.run_once()
    assert (r1.n_files, r2.n_files) == (2, 1)
    assert_matches_oracle(engine, rows)


def test_regex_filters_on_file_name(spark, tmp_path):
    engine = make_engine(spark, tmp_path, regexp=r"^keep.*\.jsonl$")
    rows = transcript_change_events(4, 2)
    write_jsonl(rows, str(tmp_path / "src" / "keep_these.jsonl"))
    write_jsonl(
        transcript_change_events(2, 2, seed=7), str(tmp_path / "src" / "skip_these.jsonl")
    )
    res = engine.run_once()
    assert res.n_files == 1
    assert_matches_oracle(engine, rows)


def test_empty_files_skipped(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(3, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    open(tmp_path / "src" / "empty.jsonl", "w").close()
    res = engine.run_once()
    assert res.n_files == 1
    assert_matches_oracle(engine, rows)


def test_corrupt_lines_are_quarantined_not_fatal(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(3, 2)
    p = str(tmp_path / "src" / "a.jsonl")
    write_jsonl(rows, p)
    with open(p, "a") as f:
        f.write("this is not json\n{\"op\": \"upsert\"\n")
    res = engine.run_once()
    assert res.n_events == len(rows) + 2  # raw records seen
    assert_matches_oracle(engine, rows)  # but corrupt ones never reach the table


def test_cleanup_delete_after_fully_consumed(spark, tmp_path):
    engine = make_engine(spark, tmp_path, cleanup="delete")
    rows = transcript_change_events(3, 2)
    p = tmp_path / "src" / "a.jsonl"
    write_jsonl(rows, str(p))
    engine.run_once()  # ingests; file now fully consumed
    assert p.exists()  # cleanup happens on *re-encounter*, like the reference
    res2 = engine.run_once()
    assert not p.exists() and res2.cleaned
    assert_matches_oracle(engine, rows)


def test_cleanup_move_after_fully_consumed(spark, tmp_path):
    dest = tmp_path / "done"
    engine = make_engine(spark, tmp_path, cleanup="move", cleanup_move_dir=str(dest))
    rows = transcript_change_events(3, 2)
    p = tmp_path / "src" / "a.jsonl"
    write_jsonl(rows, str(p))
    engine.run_once()
    engine.run_once()
    assert not p.exists() and (dest / "a.jsonl").exists()
    assert_matches_oracle(engine, rows)


def test_cleanup_move_prefix_applied(spark, tmp_path):
    """policy.cleanup.move.prefix parity (AbstractPolicy.java:288):
    moved files gain the configured filename prefix."""
    dest = tmp_path / "done"
    engine = make_engine(
        spark, tmp_path, cleanup="move", cleanup_move_dir=str(dest),
        cleanup_move_prefix="done-",
    )
    rows = transcript_change_events(3, 2)
    p = tmp_path / "src" / "a.jsonl"
    write_jsonl(rows, str(p))
    engine.run_once()
    engine.run_once()
    assert not p.exists() and (dest / "done-a.jsonl").exists()


def test_delete_op_removes_turn(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(3, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()
    del_row = dict(rows[0])
    del_row.update(op="delete", conv_id="conv_000001", turn_idx=0)
    del_row["ts"] = max(r["ts"] for r in rows) + __import__("datetime").timedelta(seconds=5)
    write_jsonl([del_row], str(tmp_path / "src" / "b.jsonl"))
    engine.run_once()
    assert_matches_oracle(engine, rows + [del_row])
    assert ("conv_000001", 0) not in table_state(engine)


def test_metrics_jsonl_written_with_per_bucket_lineage(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    write_jsonl(transcript_change_events(5, 2), str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "ckpt" / "metrics.jsonl")]
    assert lines and lines[0]["rows_written"] == 10
    assert sum(lines[0]["rows_per_bucket"].values()) == 10


def test_custom_reader_plugin(spark, tmp_path):
    """Parser-registry parity with the reference's file_reader.class
    reflection plugins (util/ReflectionUtils.java:18-38)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_connect_fs_spark.sources.readers import register_reader, read_lines

    def pipe_reader(spark_, items, options):
        # toy format: "conv|turn|text" lines — built from the vectorized
        # line scanner + JVM-side split, like any real plugin would be
        lines = read_lines(spark_, items)
        p = F.split(F.col("value"), r"\|")
        return lines.select(
            "_src_file", "_src_offset",
            p.getItem(0).alias("conv_id"),
            p.getItem(1).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            p.getItem(2).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit(dt.datetime(2024, 1, 1)).alias("ts"),
            F.lit("upsert").alias("op"),
        )

    register_reader("pipeformat", pipe_reader)
    engine = make_engine(
        spark, tmp_path, fmt="agnostic",
        reader_options={"format_overrides": {"pipe": "pipeformat"}},
    )
    with open(tmp_path / "src" / "d.pipe", "w") as f:
        f.write("c1|0|hello\nc1|1|world\n")
    res = engine.run_once()
    assert res.rows_written == 2
    assert {(r.conv_id, r.turn_idx, r.text) for r in engine.lake.read().collect()} == {
        ("c1", 0, "hello"), ("c1", 1, "world"),
    }


def test_bytes_per_trigger_caps_batch(spark, tmp_path):
    """file_reader.batch_size / maxBytesPerTrigger analog: admit at most N
    tail bytes per trigger; the remainder arrives next trigger."""
    engine = make_engine(spark, tmp_path, bytes_per_trigger=1)  # 1 byte → 1 file/batch
    rows = transcript_change_events(6, 2)
    per = len(rows) // 3
    for i in range(3):
        write_jsonl(rows[i * per : (i + 1) * per], str(tmp_path / "src" / f"f{i}.jsonl"))
    results = [engine.run_once() for _ in range(3)]
    assert [r.n_files for r in results] == [1, 1, 1]
    assert_matches_oracle(engine, rows)


def test_crash_during_merge_write_leaves_no_partial_state(spark, tmp_path):
    """A crash mid-write (data files on disk, no commit log entry) must be
    invisible: the next run re-plans the same batch, the orphan files are
    never referenced, and vacuum removes them."""
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(5, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))

    # simulate: partial write of a failed attempt with no commit record
    # (a same-version retry is cleaned by the write's own overwrite mode;
    # this one has a version that is never retried)
    orphan_dir = tmp_path / "table" / "data" / f"c{99:020d}" / "_pb=0"
    os.makedirs(orphan_dir)
    spark.createDataFrame([(1,)], "x int").coalesce(1).write.mode("overwrite").parquet(
        str(orphan_dir / "junk")
    )

    engine.run_once()
    assert_matches_oracle(engine, rows)
    removed = engine.lake.vacuum(min_age_seconds=0)
    assert removed >= 1  # orphans gone
    assert_matches_oracle(engine, rows)  # and the table is intact


def test_unreadable_file_does_not_advance_offset(spark, tmp_path, monkeypatch):
    """Code-review regression: a file whose read fails (here: vanished
    between listing and read — a real race) must keep its committed offset,
    marked not-eof, and be retried; readable neighbors still ingest. The
    range-outcome markers generalize this to multi-split files: ANY failed
    range pins the offset at the hole."""
    import kafka_connect_fs_spark.streaming.engine as E
    from kafka_connect_fs_spark.sources.discovery import FileMeta

    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(5, 2)
    write_jsonl(rows, str(tmp_path / "src" / "good.jsonl"))
    phantom = str(tmp_path / "src" / "vanished.jsonl")

    real_list = E.list_files

    def list_with_phantom(*a, **kw):
        return sorted(
            real_list(*a, **kw) + [FileMeta(phantom, 1000, 0.0)],
            key=lambda f: f.path,
        )

    monkeypatch.setattr(E, "list_files", list_with_phantom)
    r1 = engine.run_once()
    assert r1.rows_written == 10  # good file ingested despite the failure
    wm = {r.path: r for r in engine.watermarks.load().collect()}
    assert wm[phantom].committed_offset == 0 and wm[phantom].eof is False
    # retried on the next trigger (still failing → still pinned at 0)
    r2 = engine.run_once()
    assert r2.n_files == 1
    monkeypatch.setattr(E, "list_files", real_list)
    assert_matches_oracle(engine, rows)


def test_rename_with_mixed_generation_files_reads_coalesced(spark, tmp_path):
    """Code-review regression: after a metadata-only rename, buckets written
    before the rename still physically contain the old column; reads must
    coalesce old into new instead of producing duplicate columns."""
    engine = make_engine(spark, tmp_path, rename_hints={"tool": "tool_name"})
    rows = transcript_change_events(8, 2)  # spread across several buckets
    # make tool non-null so the coalesce is observable
    for r in rows:
        r["tool"] = f"t_{r['turn_idx']}"
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()

    # batch 2: new name, touching only SOME buckets
    import datetime as dt
    import json as _json

    base = max(r["ts"] for r in rows)
    with open(tmp_path / "src" / "b.jsonl", "w") as f:
        f.write(
            _json.dumps(
                {
                    "op": "upsert", "conv_id": rows[0]["conv_id"], "turn_idx": 0,
                    "role": "user", "text": "evolved", "tool_name": "newtool",
                    "ts": (base + dt.timedelta(seconds=1)).strftime("%Y-%m-%dT%H:%M:%S.%f"),
                }
            )
            + "\n"
        )
    from pyspark.sql import types as T

    from kafka_connect_fs_spark.testing.generator import CHANGE_EVENT_SCHEMA

    schema_v2 = T.StructType(
        [f for f in CHANGE_EVENT_SCHEMA.fields if f.name != "tool"]
    ).add("tool_name", T.StringType())
    engine.config.schema = schema_v2
    engine.run_once()

    df = engine.lake.read()
    assert df.columns.count("tool_name") == 1 and "tool" not in df.columns
    vals = {(r.conv_id, r.turn_idx): r.tool_name for r in df.collect()}
    # old-generation rows keep their pre-rename values via coalesce
    assert vals[(rows[0]["conv_id"], 0)] == "newtool"
    assert all(v is not None for v in vals.values())


def test_auto_compaction_runs_on_schedule(spark, tmp_path):
    engine = make_engine(spark, tmp_path, compact_every=2, compact_min_files_per_bucket=1)
    rows = transcript_change_events(6, 2)
    per = len(rows) // 3
    for i in range(3):
        write_jsonl(rows[i * per : (i + 1) * per], str(tmp_path / "src" / f"f{i}.jsonl"))
        engine.run_once()
    assert any(c.metrics.get("compaction") for c in engine.lake.commits())
    assert_matches_oracle(engine, rows)


def test_run_loop_tolerates_batch_failures(spark, tmp_path, monkeypatch):
    """Policy loop parity (FsSourceTask.java:127-133): a failing batch is
    logged and retried on the next trigger; the final state is exact."""
    from kafka_connect_fs_spark.streaming.triggers import SleepyPolicy

    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(4, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))

    real = engine.watermarks.commit
    state = {"failed_once": False}

    def flaky_commit(*a, **kw):
        if not state["failed_once"]:
            state["failed_once"] = True
            raise RuntimeError("transient failure")
        return real(*a, **kw)

    monkeypatch.setattr(engine.watermarks, "commit", flaky_commit)
    results = engine.run(SleepyPolicy(sleep_s=0.01, max_execs=3))
    assert len(results) == 2  # first trigger failed, two succeeded
    assert results[0].recovered is True  # the replayed batch
    assert_matches_oracle(engine, rows)


def test_agnostic_mixed_format_directory(spark, tmp_path):
    """One source dir with .jsonl AND .csv change-event files — extension
    dispatch (AgnosticFileReader parity) unions both parses into one MERGE."""
    from kafka_connect_fs_spark.testing.generator import write_csv

    engine = make_engine(spark, tmp_path, fmt="agnostic")
    rows = transcript_change_events(8, 2, n_versions=2)
    half = len(rows) // 2
    write_jsonl(rows[:half], str(tmp_path / "src" / "a.jsonl"))
    write_csv(rows[half:], str(tmp_path / "src" / "b.csv"))
    res = engine.run_once()
    assert res.n_files == 2
    assert_matches_oracle(engine, rows)
    # both watermarks committed to eof
    wm = {os.path.basename(r.path): r.eof for r in engine.watermarks.load().collect()}
    assert wm == {"a.jsonl": True, "b.csv": True}


# ------------------------------------------------- scheme-agnostic cleanup


def test_cleanup_through_file_uri_uses_pyarrow_path(spark, tmp_path):
    """file:// URIs exercise the exact code path remote schemes take
    (pyarrow.fs), end-to-end: discovery -> ingest -> MOVE on re-encounter."""
    dest = tmp_path / "archive"
    engine = make_engine(
        spark, tmp_path,
        uris=[f"file://{tmp_path / 'src'}"],
        cleanup="move", cleanup_move_dir=str(dest),
    )
    rows = transcript_change_events(3, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()
    res = engine.run_once()  # re-encounter triggers the cleanup
    assert res.cleaned
    assert not (tmp_path / "src" / "a.jsonl").exists()
    assert (dest / "a.jsonl").exists()
    assert_matches_oracle(engine, rows)

    # a URI-form path takes the pyarrow.fs branch explicitly: real move on
    # the local filesystem driven through the FileSystem API
    write_jsonl(rows, str(tmp_path / "src" / "b.jsonl"))
    done = engine._cleanup([f"file://{tmp_path / 'src' / 'b.jsonl'}"])
    assert done == [f"file://{tmp_path / 'src' / 'b.jsonl'}"]
    assert not (tmp_path / "src" / "b.jsonl").exists()
    assert (dest / "b.jsonl").exists()
    # replay of the URI (now NotFound) is idempotent success
    assert engine._cleanup([f"file://{tmp_path / 'src' / 'b.jsonl'}"]) == [
        f"file://{tmp_path / 'src' / 'b.jsonl'}"
    ]


class _FakeRemoteFS:
    """Minimal pyarrow.fs.FileSystem stand-in recording side-effects."""

    def __init__(self, existing: set, calls: list):
        self.existing, self.calls = existing, calls

    def get_file_info(self, sub):
        import types

        import pyarrow.fs as pafs

        t = pafs.FileType.File if sub in self.existing else pafs.FileType.NotFound
        return types.SimpleNamespace(type=t)

    def delete_file(self, sub):
        self.calls.append(("delete", sub))
        self.existing.discard(sub)


def test_cleanup_remote_delete_and_replay_idempotence(spark, tmp_path, monkeypatch):
    """Remote URIs: DELETE goes through the FS client; only NotFound counts
    as already-cleaned replay; an FS error keeps the path OUT of `done`
    (so its watermark row survives and the cleanup is retried) instead of
    silently claiming success."""
    import kafka_connect_fs_spark.streaming.engine as eng_mod

    calls: list = []
    fake = _FakeRemoteFS({"bucket/seen.jsonl"}, calls)
    monkeypatch.setattr(
        eng_mod, "_fs_for_uri", lambda uri: (fake, uri.split("://", 1)[1])
    )
    engine = make_engine(spark, tmp_path, cleanup="delete")

    done = engine._cleanup(["s3://bucket/seen.jsonl"])
    assert done == ["s3://bucket/seen.jsonl"]
    assert calls == [("delete", "bucket/seen.jsonl")]

    # replay: object already gone -> idempotent success, no second delete
    done2 = engine._cleanup(["s3://bucket/seen.jsonl"])
    assert done2 == ["s3://bucket/seen.jsonl"] and len(calls) == 1

    # transient FS failure -> path NOT reported clean, no exception
    def boom(sub):
        raise OSError("503 slow down")

    fake.existing.add("bucket/flaky.jsonl")
    fake.delete_file = boom
    assert engine._cleanup(["s3://bucket/flaky.jsonl"]) == []


# ------------------------------------------------------- shrank / torn files


def test_shrunk_file_reingested_from_zero(spark, tmp_path):
    """Truncate-and-replace in place: committed offset points past the new
    content -> treated as a brand-new file, not stalled or deleted unread."""
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(6, 3)
    p = str(tmp_path / "src" / "rot.jsonl")
    write_jsonl(rows, p)
    engine.run_once()
    import datetime as _dt

    replacement = transcript_change_events(2, 2, seed=99)
    # bump ts so the replacement wins LWW over the first generation
    for i, r in enumerate(replacement):
        r["ts"] = _dt.datetime(2031, 1, 1) + _dt.timedelta(seconds=i)
    write_jsonl(replacement, p)  # overwrite: much smaller file
    assert os.path.getsize(p) < engine.watermarks.load_dict()[p]["committed_offset"]
    res = engine.run_once()
    assert res.n_events == len(replacement)
    got = table_state(engine)
    for r in replacement:
        assert got[(r["conv_id"], r["turn_idx"])] == r["text"]


def test_torn_line_at_snapshot_boundary_held_back(spark, tmp_path):
    """A line straddling the listing-time snapshot end (file still growing)
    must be held back whole — never emitted as a torn half-record with the
    offset committed mid-line (which would corrupt BOTH halves)."""
    # byte-range scanner path (the native whole-file reader has no snapshot
    # clamp to tear lines against)
    engine = make_engine(spark, tmp_path, reader_options={"jvm_fast_path": False})
    rows = transcript_change_events(4, 2)
    p = str(tmp_path / "src" / "grow.jsonl")
    write_jsonl(rows, p)
    import json as _json

    with open(p, "rb") as f:
        lines = f.read().splitlines(keepends=True)
    last = lines[-1]
    cut = len(last) // 2
    with open(p, "wb") as f:
        f.write(b"".join(lines[:-1]) + last[:cut])
    snap_len = os.path.getsize(p)

    # simulate "file grew between listing and read": plan against the torn
    # snapshot, then complete the line on disk before the read happens
    from kafka_connect_fs_spark.sources.discovery import FileMeta

    listing = [FileMeta(p, snap_len, 0.0)]
    work, _ = engine._plan(listing, engine.watermarks.load_dict())
    with open(p, "ab") as f:
        f.write(last[cut:])

    lines_df, events, native, parts = engine._read(work)
    try:
        texts = [r.value for r in lines_df.filter("_line_no >= 0").collect()]
        assert len(texts) == len(rows) - 1  # torn record held back entirely
        assert all(_json.loads(t) for t in texts)  # every emitted line parses
        from kafka_connect_fs_spark.sources.readers import LINE_NO_RANGE_PARTIAL

        markers = lines_df.filter(f"_line_no = {LINE_NO_RANGE_PARTIAL}").collect()
        assert len(markers) == 1  # tail pending -> not eof, re-read next trigger
        assert markers[0]._src_end == snap_len - cut
    finally:
        for part in parts:
            part.unpersist()

    # and end-to-end: the next engine pass picks the completed line up
    engine.run_once()
    engine.run_once()
    assert_matches_oracle(engine, rows)


def test_mor_steady_state_file_count_bounded_by_compaction(spark, tmp_path):
    """MoR read amplification control: under compact_every, live file
    count stays bounded however many batches stream in (each batch appends
    a delta set; compaction folds them to one resolved file per bucket)."""
    engine = make_engine(
        spark, tmp_path, n_buckets=4, compact_every=3,
        compact_min_files_per_bucket=2,
    )
    assert engine.lake.merge_mode == "mor"
    rows = transcript_change_events(8, 2, n_versions=3)
    per = max(1, len(rows) // 9)
    counts = []
    for i in range(9):
        # last chunk takes the remainder so the oracle sees every row
        chunk = rows[i * per :] if i == 8 else rows[i * per : (i + 1) * per]
        if not chunk:
            break
        write_jsonl(chunk, str(tmp_path / "src" / f"f{i}.jsonl"))
        engine.run_once()
        live, _, _ = engine.lake._state()
        counts.append(len(live))
    # bounded: never exceeds buckets × (compact_every + 1) despite 9 batches
    assert max(counts) <= 4 * 4, counts
    # post-compaction floors back to ≤ one file per bucket
    assert min(counts[3:]) <= 4, counts
    assert_matches_oracle(engine, rows)


def test_hot_key_skew_ingest_is_exact(spark, tmp_path):
    """North-rule skew clause: 40% of all events concentrated on one
    conv_id must still produce the exact LWW state (map-side partial
    aggregation absorbs the hot key; no reducer sees its raw volume)."""
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(10, 3, n_versions=2, zipf_hot_fraction=0.4)
    write_jsonl(rows, str(tmp_path / "src" / "hot.jsonl"))
    res = engine.run_once()
    assert res.n_events == len(rows)
    assert_matches_oracle(engine, rows)


def test_auto_salt_controller_rise_cap_decay(spark, tmp_path):
    """write_salt='auto' feedback law: salt = ceil(hottest bucket rows /
    target), rise immediate, capped at max_write_salt, decay one step per
    calm batch, floor 1. Pure-controller test over stub commits."""
    engine = make_engine(
        spark,
        tmp_path,
        write_salt="auto",
        target_rows_per_write_task=100,
        max_write_salt=4,
    )

    class _C:
        def __init__(self, added):
            self.added = added

    assert engine._auto_salt == 1
    # hot bucket: ceil(350/100) = 4 — immediate rise
    engine._update_auto_salt(_C([{"bucket": 0, "rows": 350}, {"bucket": 1, "rows": 10}]))
    assert engine._auto_salt == 4
    # hotter still: capped at max_write_salt
    engine._update_auto_salt(_C([{"bucket": 2, "rows": 10_000}]))
    assert engine._auto_salt == 4
    # calm batches decay one step each, never below 1
    for expected in (3, 2, 1, 1):
        engine._update_auto_salt(_C([{"bucket": 0, "rows": 10}]))
        assert engine._auto_salt == expected
    # empty commit (no files added) also counts as calm, floors at 1
    engine._update_auto_salt(_C([]))
    assert engine._auto_salt == 1


def test_auto_write_salt_applies_next_batch_and_stays_exact(spark, tmp_path):
    """Integration: a hot batch raises the salt the NEXT merge uses (the
    commit's recorded write_salt metric proves it); final state still
    hash-matches the LWW oracle — salting never changes results."""
    engine = make_engine(
        spark,
        tmp_path,
        write_salt="auto",
        target_rows_per_write_task=10,
        max_write_salt=8,
    )
    # batch 1 runs at salt 1 (no history yet) but its commit measures a
    # hot bucket: 40% of 60 events on one conv_id → ≥24 rows in one bucket
    rows1 = transcript_change_events(10, 3, n_versions=2, zipf_hot_fraction=0.4)
    write_jsonl(rows1, str(tmp_path / "src" / "hot1.jsonl"))
    engine.run_once()
    c1 = engine.lake.commits()[-1]
    assert c1.metrics["write_salt"] == 1
    raised = engine._auto_salt
    assert raised > 1
    # batch 2 (still hot) is written with the raised salt
    rows2 = transcript_change_events(
        10, 3, n_versions=2, zipf_hot_fraction=0.4, seed=7
    )
    write_jsonl(rows2, str(tmp_path / "src" / "hot2.jsonl"))
    engine.run_once()
    c2 = engine.lake.commits()[-1]
    assert c2.metrics["write_salt"] == raised
    assert_matches_oracle(engine, rows1 + rows2)


def test_write_salt_config_validation(spark, tmp_path):
    for bad in (0, -1, "bogus", 1.5):
        with pytest.raises(ValueError, match="write_salt"):
            make_engine(spark, tmp_path, write_salt=bad)


def test_engine_type_widening_across_schema_versions(spark, tmp_path):
    """A redeployed pipeline whose declared schema widened a column
    (int -> long) keeps ingesting into the same table: old files upcast at
    read, the batch diff records the type change."""
    import json as _json

    from pyspark.sql import types as T

    def schema(score_type):
        return T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("role", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("score", score_type),
                T.StructField("ts", T.TimestampType()),
            ]
        )

    def write(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    e1 = make_engine(spark, tmp_path, schema=schema(T.IntegerType()))
    write(
        tmp_path / "src" / "v1.jsonl",
        [{"conv_id": "c1", "turn_idx": 0, "role": "u", "text": "a", "score": 7,
          "ts": "2024-01-01 00:00:01"}],
    )
    e1.run_once()

    e2 = make_engine(spark, tmp_path, schema=schema(T.LongType()))  # same table
    big = 2**40
    write(
        tmp_path / "src" / "v2.jsonl",
        [{"conv_id": "c2", "turn_idx": 0, "role": "u", "text": "b", "score": big,
          "ts": "2024-01-01 00:00:02"}],
    )
    res = e2.run_once()
    assert res.schema_diff and ["score", "int", "bigint"] in res.schema_diff["type_changed"]
    got = {r.conv_id: r.score for r in e2.lake.read().collect()}
    assert got == {"c1": 7, "c2": big}
    assert dict(e2.lake.read().dtypes)["score"] == "bigint"


def test_watermark_snapshot_retention_and_cache(spark, tmp_path):
    """A daemon's watermark store stays O(1) on disk (old snapshot versions
    pruned) and O(0) reads per batch (in-process cache per version)."""
    import os as _os

    engine = make_engine(spark, tmp_path)
    for i in range(5):
        write_jsonl(transcript_change_events(2, 2, seed=i),
                    str(tmp_path / "src" / f"f{i}.jsonl"))
        engine.run_once()
    vs = engine.watermarks._versions()
    assert len(vs) <= 2, vs  # retention
    # cache: same version → identical object, no re-read
    d1 = engine.watermarks.load_dict()
    d2 = engine.watermarks.load_dict()
    assert d1 is d2
    # cold store still loads the latest snapshot correctly
    from kafka_connect_fs_spark.sources.watermarks import WatermarkStore

    fresh = WatermarkStore(spark, str(tmp_path / "ckpt" / "watermarks"))
    assert fresh.load_dict() == d1 and fresh.last_seq() == engine.watermarks.last_seq()


def test_no_driver_stats_on_happy_path(spark, tmp_path, monkeypatch):
    """The listing already stat'ed every file: a batch where nothing
    vanished must not re-stat files on the driver (at 10^5 files/trigger a
    per-file pre-check is a second listing). _still_exists is reserved for
    the native reader's planning-failure path."""
    import kafka_connect_fs_spark.streaming.engine as E

    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(5, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    calls = []
    real = E._still_exists
    monkeypatch.setattr(E, "_still_exists", lambda p: calls.append(p) or real(p))
    r = engine.run_once()
    assert r.rows_written == 10
    assert calls == []


def test_records_per_file_per_trigger_drains_without_loss(spark, tmp_path):
    """file_reader.batch_size parity (AbstractFileReader.java:76-86): a
    1,000-line file with a 100-record cap drains in exactly 10 triggers,
    offsets advance monotonically each trigger, and the final table equals
    the full-replay oracle (no loss, no duplication)."""
    engine = make_engine(
        spark, tmp_path, records_per_file_per_trigger=100, n_buckets=2
    )
    rows = transcript_change_events(100, 10)  # 1000 events, one per line
    assert len(rows) == 1000
    path = str(tmp_path / "src" / "big.jsonl")
    write_jsonl(rows, path)
    offsets, total = [], 0
    for trigger in range(10):
        r = engine.run_once()
        assert r.n_events == 100, (trigger, r.n_events)
        total += r.n_events
        wm = {w.path: w for w in engine.watermarks.load().collect()}[path]
        offsets.append(wm.committed_offset)
        assert wm.eof is (trigger == 9)
    assert offsets == sorted(offsets) and len(set(offsets)) == 10
    assert engine.run_once().n_events == 0  # drained
    assert_matches_oracle(engine, rows)


def test_records_cap_on_compressed_file_not_marked_eof_early(spark, tmp_path):
    """A gzip file under records_per_file_per_trigger must NOT be marked
    eof (and must not be cleaned up) while records are still held back:
    decompressed committed offsets routinely exceed the compressed
    listing size, so `end >= size` is meaningless for compressed files."""
    import gzip as _gzip
    import json as _json

    engine = make_engine(
        spark, tmp_path, records_per_file_per_trigger=100, n_buckets=2,
        cleanup="delete",
    )
    rows = transcript_change_events(30, 10)  # 300 events
    path = str(tmp_path / "src" / "big.jsonl.gz")
    with _gzip.open(path, "wt") as f:
        for r in rows:
            rr = dict(r)
            rr["ts"] = rr["ts"].strftime("%Y-%m-%d %H:%M:%S")
            f.write(_json.dumps(rr) + "\n")
    seen = 0
    for trigger in range(3):
        r = engine.run_once()
        assert r.n_events == 100, (trigger, r.n_events)
        seen += r.n_events
        wm = {w.path: w for w in engine.watermarks.load().collect()}[path]
        assert wm.eof is (trigger == 2), trigger
        if trigger < 2:
            assert os.path.exists(path), "cleaned up before fully drained!"
    assert seen == 300
    assert engine.run_once().n_events == 0
    assert not os.path.exists(path)  # eof reached -> delete applied
    assert_matches_oracle(engine, rows)


def test_csv_comment_plus_header_plus_preamble(spark, tmp_path):
    """comment + header=True + rows_to_skip together: the header is the
    first non-comment line AFTER the preamble (Univocity order), and it
    is dropped even though no emitted line sits at byte offset 0."""
    from pyspark.sql import types as T

    os.makedirs(tmp_path / "src")
    with open(tmp_path / "src" / "a.csv", "w") as f:
        f.write("exported by legacy tool\n")        # preamble 1
        f.write("do not edit\n")                    # preamble 2
        f.write("# a comment before the header\n")  # comment
        f.write("conv_id,turn_idx,role,text,ts\n")  # header (must drop)
        f.write("c1,0,user,hi,2024-01-01 00:00:01\n")
        f.write("# trailing comment\n")
        f.write("c1,1,asst,yo,2024-01-01 00:00:02\n")
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    eng = IngestEngine(
        spark,
        IngestConfig(
            uris=[str(tmp_path / "src")], table_root=str(tmp_path / "t"),
            checkpoint_root=str(tmp_path / "c"), fmt="csv", schema=schema,
            n_buckets=2,
            reader_options={"rows_to_skip": 2, "header": True,
                            "csv_options": {"comment": "#"}},
        ),
    )
    res = eng.run_once()
    assert res.n_events == 2, res.n_events
    got = {(r.conv_id, r.turn_idx): r.text for r in eng.lake.read().collect()}
    assert got == {("c1", 0): "hi", ("c1", 1): "yo"}


# ----------------------------------------------- review-fix regressions (r3)


def test_strict_final_line_mode_bypasses_native_reader(spark, tmp_path):
    """emit_unterminated_final_line=False must hold back a torn final line
    even for offset-0 files — the native reader would emit it as a record
    and commit the offset past it, corrupting the record once completed."""
    engine = make_engine(spark, tmp_path, emit_unterminated_final_line=False)
    rows = transcript_change_events(4, 2)
    p = str(tmp_path / "src" / "a.jsonl")
    write_jsonl(rows[:-1], p)
    import json as _json

    last = dict(rows[-1])
    last["ts"] = last["ts"].strftime("%Y-%m-%d %H:%M:%S")
    line = _json.dumps(last)
    with open(p, "a") as f:
        f.write(line[: len(line) // 2])  # torn, no newline
    engine.run_once()
    assert len(table_state(engine)) == len(rows) - 1  # torn line held back
    with open(p, "a") as f:
        f.write(line[len(line) // 2 :] + "\n")  # complete it
    engine.run_once()
    assert_matches_oracle(engine, rows)  # exactly once, not as two fragments


def test_schemaless_jsonl_pins_inferred_schema_for_tails(spark, tmp_path):
    """schema=None: the first (native) batch pins the inferred schema so a
    later APPEND — which needs the offset-aware scanner — still works
    instead of stalling on 'requires an explicit schema'."""
    engine = make_engine(spark, tmp_path, schema=None)
    rows = transcript_change_events(6, 2)
    half = len(rows) // 2
    p = str(tmp_path / "src" / "grow.jsonl")
    write_jsonl(rows[:half], p)
    engine.run_once()
    append_jsonl(rows[half:], p)
    r2 = engine.run_once()  # scanner path now — must not raise
    assert r2.n_events == len(rows) - half
    assert_matches_oracle(engine, rows)


def test_bad_cleanup_config_fails_at_init(spark, tmp_path):
    with pytest.raises(ValueError):
        make_engine(spark, tmp_path, cleanup="mvoe")
    with pytest.raises(ValueError):
        make_engine(spark, tmp_path, src_dir="src2", cleanup="move")  # no dir


def test_config_drift_vs_existing_table_rejected(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(2, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()
    with pytest.raises(ValueError, match="disagrees with the existing table"):
        make_engine(spark, tmp_path, keys=("session_id", "turn_idx"))
    with pytest.raises(ValueError, match="disagrees with the existing table"):
        make_engine(spark, tmp_path, n_buckets=99)


def test_truncation_onto_committed_offset_finishes_file(spark, tmp_path):
    """A file truncated EXACTLY to the committed offset (its held-back torn
    tail removed) owes nothing — it must become a cleanup candidate, not
    sit untracked in the listing forever."""
    engine = make_engine(
        spark, tmp_path, cleanup="delete", emit_unterminated_final_line=False
    )
    rows = transcript_change_events(3, 2)
    p = str(tmp_path / "src" / "a.jsonl")
    write_jsonl(rows, p)
    committed_size = os.path.getsize(p)
    with open(p, "a") as f:
        f.write('{"torn')  # held-back tail: eof stays False
    engine.run_once()
    wm = {w.path: w for w in engine.watermarks.load().collect()}[p]
    assert wm.eof is False and wm.committed_offset == committed_size
    os.truncate(p, committed_size)  # writer aborts the torn record
    engine.run_once()  # plans it as finished
    engine.run_once()  # cleanup applies on re-encounter semantics
    assert not os.path.exists(p)
    assert_matches_oracle(engine, rows)


def test_scanner_bookkeeping_columns_not_merged(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    rows = transcript_change_events(3, 2)
    write_jsonl(rows, str(tmp_path / "src" / "a.jsonl"))
    engine.run_once()
    cols = set(engine.lake.read().columns)
    assert "_src_end" not in cols and "_line_no" not in cols
    # and the stored schema doesn't carry them either
    sch = engine.lake.current_schema().fieldNames()
    assert "_src_end" not in sch and "_line_no" not in sch


def test_merge_precommit_check_aborts_before_commit(spark, tmp_path):
    """A failing precommit_check leaves NO new commit — only vacuum-able
    orphan files — and a later clean merge proceeds normally."""
    from kafka_connect_fs_spark.plans.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "pc"), keys=["conv_id", "turn_idx"],
        ts_col="ts", n_buckets=2, merge_mode="mor",
    )
    from tests.test_lake import edf, ev

    t.merge(edf(spark, [ev("c1", 0, "ok", 1)]), "b1")
    v = t.latest_version()

    def boom():
        raise RuntimeError("consistency check failed")

    with pytest.raises(RuntimeError, match="consistency check"):
        t.merge(edf(spark, [ev("c2", 0, "never", 2)]), "b2", precommit_check=boom)
    assert t.latest_version() == v  # nothing committed
    assert {r.conv_id for r in t.read().collect()} == {"c1"}
    t.merge(edf(spark, [ev("c2", 0, "now", 3)]), "b3")
    assert {r.conv_id for r in t.read().collect()} == {"c1", "c2"}


def _wm_row(path, off=10, seq=0):
    return {"path": path, "committed_offset": off, "file_size": off, "eof": True}


def test_watermark_delta_log_commit_is_o_touched(spark, tmp_path):
    """Steady-state watermark commit cost must be O(files touched this
    batch), independent of the total tracked-file count: after seeding a
    large base, a 500-file commit writes ONE small delta parquet and no new
    base snapshot (round-4 verdict item #2: the previous design rewrote all
    tracked rows every commit — 0.22 s/batch at 200k files)."""
    from kafka_connect_fs_spark.sources.watermarks import WatermarkStore

    root = str(tmp_path / "wm")
    store = WatermarkStore(spark, root)
    n_tracked = 20_000
    store.commit([_wm_row(f"/data/f{i:06d}") for i in range(n_tracked)], 0)
    # the seed commit compacts (delta rows >= live rows) → base snapshot
    assert os.path.exists(store._base_file(0))
    base_sizes = {0: os.path.getsize(store._base_file(0))}
    for b in range(1, 6):
        store.commit(
            [_wm_row(f"/data/f{i:06d}", off=20 + b) for i in range(0, 500 * b, b)][:500],
            b,
        )
        # steady state: a delta file exists, NO new base was written
        assert os.path.exists(store._delta_file(b)), b
        assert not os.path.exists(store._base_file(b)), b
        import pyarrow.parquet as pq

        assert pq.read_table(store._delta_file(b)).num_rows == 500
        # and the delta is tiny relative to the base
        assert os.path.getsize(store._delta_file(b)) < base_sizes[0] / 5
    assert len(store.load_dict()) == n_tracked
    # cold replay (base + delta chain) reproduces the live state exactly
    fresh = WatermarkStore(spark, root)
    assert fresh.load_dict() == store.load_dict()
    assert fresh.last_seq() == 5


def test_watermark_delta_log_compaction_bounds_chain(spark, tmp_path):
    """The delta chain is bounded: after _max_deltas commits the store
    compacts into a fresh base and GC drops unreferenced deltas."""
    from kafka_connect_fs_spark.sources.watermarks import WatermarkStore

    store = WatermarkStore(spark, str(tmp_path / "wm"))
    store._max_deltas = 4
    store.commit([_wm_row(f"/d/f{i}") for i in range(2000)], 0)  # base
    for b in range(1, 8):
        store.commit([_wm_row(f"/d/f{b}", off=100 + b)], b)
    vs = store._versions()
    meta = store._marker(vs[-1])
    assert len(meta["delta_seqs"]) <= store._max_deltas
    assert meta["base_seq"] > 0  # compaction produced a newer base
    # GC: no orphan delta/base files beyond what kept markers reference
    referenced = set()
    for v in vs:
        m = store._marker(v)
        referenced.add(("b", m["base_seq"]))
        referenced.update(("d", d) for d in m["delta_seqs"])
    import re as _re

    on_disk = set()
    for name in os.listdir(str(tmp_path / "wm")):
        if m := _re.fullmatch(r"d(\d{12})\.parquet", name):
            on_disk.add(("d", int(m.group(1))))
        elif m := _re.fullmatch(r"v(\d{12})", name):
            on_disk.add(("b", int(m.group(1))))
    assert on_disk <= referenced, on_disk - referenced
    # state is still exact after compaction + GC
    fresh = WatermarkStore(spark, str(tmp_path / "wm"))
    d = fresh.load_dict()
    assert len(d) == 2000
    for b in range(1, 8):
        assert d[f"/d/f{b}"]["committed_offset"] == 100 + b


def test_watermark_delta_log_removals_replay(spark, tmp_path):
    """Tombstoned removals survive a cold replay of the delta chain, and a
    removal+re-add in later batches resolves to the re-add."""
    from kafka_connect_fs_spark.sources.watermarks import WatermarkStore

    root = str(tmp_path / "wm")
    store = WatermarkStore(spark, root)
    store.commit([_wm_row("/x/a"), _wm_row("/x/b"), _wm_row("/x/c")], 0)
    store.commit([], 1, removed_paths=["/x/b"])
    store.commit([_wm_row("/x/b", off=99)], 2)
    store.commit([], 3, removed_paths=["/x/c"])
    expect = {"/x/a": 10, "/x/b": 99}
    live = {p: r["committed_offset"] for p, r in store.load_dict().items()}
    assert live == expect
    fresh = WatermarkStore(spark, root)
    assert {p: r["committed_offset"] for p, r in fresh.load_dict().items()} == expect
    # Spark lineage view agrees
    assert {r.path: r.committed_offset for r in fresh.load().collect()} == expect


def test_watermark_old_layout_migration(spark, tmp_path):
    """A store written by the pre-delta-log layout (marker without
    base_seq + v{seq}/snapshot.parquet) loads and upgrades in place."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_fs_spark.sources.watermarks import (
        _ARROW_SCHEMA,
        WatermarkStore,
    )

    root = tmp_path / "wm"
    (root / "v000000000003").mkdir(parents=True)
    rows = [
        {"path": "/old/a", "committed_offset": 5, "file_size": 5, "eof": True,
         "batch_seq": 3, "updated_at": None},
        {"path": "/old/b", "committed_offset": 7, "file_size": 9, "eof": False,
         "batch_seq": 3, "updated_at": None},
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_ARROW_SCHEMA),
        str(root / "v000000000003" / "snapshot.parquet"),
    )
    (root / "v000000000003.json").write_text(
        _json.dumps({"batch_seq": 3, "n_updates": 2})
    )
    store = WatermarkStore(spark, str(root))
    assert store.last_seq() == 3
    assert {p: r["committed_offset"] for p, r in store.load_dict().items()} == {
        "/old/a": 5, "/old/b": 7,
    }
    # a new commit appends a delta against the migrated base
    store.commit([_wm_row("/old/c", off=1)], 4)
    fresh = WatermarkStore(spark, str(root))
    assert set(fresh.load_dict()) == {"/old/a", "/old/b", "/old/c"}
