"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested; the actual codec work is
stubbed behind ``DECODERS`` because no image/audio libraries ship in this
container — a deployment swaps in e.g. PIL/soundfile without touching the
plan. Decode runs in ``mapInPandas`` so bytes never round-trip through the
driver and batches stay Arrow-backed.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(kind: str, content: bytes) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo-metadata and
    an 8-dim feature from the content md5 (md5 so the DuckDB oracle can
    reproduce every derived value). Replace via ``DECODERS``."""
    h = hashlib.md5(content).digest()
    feat = [((b / 255.0) * 2 - 1) for b in h[:8]]
    meta = {"width": None, "height": None, "duration_ms": None}
    if kind == "image":
        meta["width"], meta["height"] = 64 + h[0] % 192, 64 + h[1] % 192
    elif kind in ("audio", "video"):
        meta["duration_ms"] = 500 + int.from_bytes(h[2:4], "big") % 60_000
        if kind == "video":
            meta["width"], meta["height"] = 320, 240
    return {**meta, "feature": feat}


DECODERS: dict[str, Callable[[str, bytes], dict]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def real_decoder_stub(kind: str, content: bytes) -> dict:
    raise NotImplementedError(
        "real image/audio decoding requires PIL/soundfile/av, not present in "
        "this container; register a decoder in multimodal.DECODERS"
    )


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode + featurize media rows — Arrow-batched, executor-side only.

    Memory bound: the INPUT Arrow chunk size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch (session.py sets 10k);
    ``batch_rows`` additionally caps how many decoded OUTPUT rows
    accumulate before a yield, so one task never materializes more than
    ~batch_rows decoded payloads at once however the input is chunked.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        out: list = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                decoded = DECODERS[r.kind](r.kind, content)
                out.append(
                    (
                        int(r.media_id),
                        r.kind,
                        len(content),
                        hashlib.md5(content).hexdigest(),
                        decoded["width"],
                        decoded["height"],
                        decoded["duration_ms"],
                        decoded["feature"],
                    )
                )
                if len(out) >= batch_rows:
                    yield pd.DataFrame(out, columns=cols)
                    out = []
        if out:
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),  # re-encoded bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _fake_resize(content: bytes, max_px: int) -> tuple[bytes, int, int]:
    """Deterministic resize stand-in: source dims from the content md5
    (same derivation as _fake_decode), aspect-preserving integer downscale,
    re-encoded bytes derived from (md5, dims) so every output value is
    oracle-reproducible. A deployment swaps a PIL thumbnail in here."""
    h = hashlib.md5(content)
    d = h.digest()
    w, hh = 64 + d[0] % 192, 64 + d[1] % 192
    if w > max_px:
        hh = hh * max_px // w
        w = max_px
    if hh > max_px:
        w = w * max_px // hh
        hh = max_px
    return f"{h.hexdigest()}:{w}x{hh}".encode(), w, hh


def resize_media(media: DataFrame, max_px: int = 128) -> DataFrame:
    """Image resize plumbing: binary in → binary out, executor-side only
    (mapInPandas — payloads never visit the driver), dims in the row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                resized, w, hh = _fake_resize(content, max_px)
                out.append((int(r.media_id), r.kind, resized, w, hh))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 5000, max_frames: int = 16
) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to
    ``min(duration/every_ms, max_frames)`` frame rows — the batch shape a
    real av-based sampler produces. Duration comes from the (stubbed)
    decode; frame bytes are md5-derived so the fan-out is oracle-checkable.
    Frames of one video stay in one task's Arrow batches (no shuffle until
    a downstream op asks for one)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                content = bytes(r.content) if r.content is not None else b""
                decoded = DECODERS[r.kind](r.kind, content)
                dur = decoded["duration_ms"] or 0
                n = min(dur // every_ms, max_frames)
                md5 = hashlib.md5(content).hexdigest()
                for i in range(n):
                    out.append(
                        (
                            int(r.media_id),
                            i,
                            i * every_ms,
                            f"{md5}:frame:{i}".encode(),
                        )
                    )
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test/bench helper: wrap document text bytes as fake media blobs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )
