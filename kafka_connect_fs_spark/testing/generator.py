"""Deterministic synthetic transcript change events (FIXTURES.md F1/F2).

Seed-fixed, wall-clock-free: text is ``{conv_id}:{turn_idx}:v{version}:{payload}``
so LWW tests can assert exactly which version won. Supports Zipf-skewed
conv_ids to exercise hot-key handling at merge time.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import random

from pyspark.sql import types as T

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

ROLES = ("user", "assistant", "tool")
BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _payload(conv: str, turn: int, version: int) -> str:
    return hashlib.sha1(f"{conv}/{turn}/{version}".encode()).hexdigest()[:12]


def transcript_change_events(
    n_convs: int,
    turns_per_conv: int,
    n_versions: int = 1,
    seed: int = 42,
    shuffle: bool = True,
    zipf_hot_fraction: float = 0.0,
) -> list[dict]:
    """Every (conv, turn) appears ``n_versions`` times with increasing ts;
    the highest version must win LWW. With ``zipf_hot_fraction`` > 0, that
    fraction of all events is concentrated on conv_id 0 (hot key)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for v in range(n_versions):
        for c in range(n_convs):
            conv = f"conv_{c:06d}"
            for t in range(turns_per_conv):
                role = ROLES[t % len(ROLES)]
                rows.append(
                    {
                        "op": "upsert",
                        "conv_id": conv,
                        "turn_idx": t,
                        "role": role,
                        "text": f"{conv}:{t}:v{v}:{_payload(conv, t, v)}",
                        "tool": f"tool_{t % 5}" if role == "tool" else None,
                        "ts": BASE_TS
                        + dt.timedelta(seconds=v * 1_000_000 + c * turns_per_conv + t),
                    }
                )
    if zipf_hot_fraction > 0:
        extra = int(len(rows) * zipf_hot_fraction)
        for i in range(extra):
            v = n_versions + 1 + (i % 3)
            rows.append(
                {
                    "op": "upsert",
                    "conv_id": "conv_000000",
                    "turn_idx": i % turns_per_conv,
                    "role": ROLES[i % 3],
                    "text": f"conv_000000:{i % turns_per_conv}:v{v}:{_payload('conv_000000', i % turns_per_conv, v)}",
                    "tool": None,
                    "ts": BASE_TS + dt.timedelta(seconds=2_000_000 + i),
                }
            )
    if shuffle:
        rng.shuffle(rows)
    return rows


def expected_final_state(rows: list[dict]) -> dict[tuple[str, int], dict]:
    """Python oracle: LWW per (conv_id, turn_idx); deletes remove the key."""
    best: dict[tuple[str, int], dict] = {}
    for i, r in enumerate(rows):
        k = (r["conv_id"], r["turn_idx"])
        cur = best.get(k)
        if cur is None or (r["ts"], i) >= (cur["ts"], cur["_i"]):
            best[k] = {**r, "_i": i}
    return {
        k: {kk: vv for kk, vv in v.items() if kk != "_i"}
        for k, v in best.items()
        if v["op"] != "delete"
    }


def _jsonable(r: dict) -> dict:
    out = dict(r)
    out["ts"] = r["ts"].strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    return out


def write_jsonl(rows: list[dict], path: str) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(_jsonable(r)) + "\n")


def append_jsonl(rows: list[dict], path: str) -> None:
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps(_jsonable(r)) + "\n")


def write_csv(rows: list[dict], path: str, sep: str = ",", header: bool = True) -> None:
    cols = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    with open(path, "w") as f:
        if header:
            f.write(sep.join(cols) + "\n")
        for r in rows:
            j = _jsonable(r)
            f.write(sep.join("" if j[c] is None else str(j[c]) for c in cols) + "\n")
