"""File discovery — the reference's "policy" listing layer, as a DataFrame.

Reference behavior being matched (policy/AbstractPolicy.java):
- recursive listing of one or more URIs (:157-196);
- regex filter applied to the file *name*, not the full path (:54,:171 —
  ``Pattern.matcher(file.getName()).find()``);
- dynamic URI templating ``${yyyy}/${MM}/${dd}`` expanded at trigger time
  (:94-110, Java DateTimeFormatter patterns);
- empty files filtered out by the task, not the listing
  (FsSourceTask.java:126) — the engine applies ``length > 0``.

Listing is driver-side (exactly as in the reference and in Spark's own
FileStreamSource); the result becomes a small DataFrame that is anti-joined
against the watermark table. At 100 TB the per-trigger listing is bounded by
the source directory churn, not table size — and the downstream read is
fully distributed.
"""

from __future__ import annotations

import datetime as dt
import os
import re
import stat as statmod
from dataclasses import dataclass

# Java DateTimeFormatter pattern → strftime (the subset the reference's docs
# exercise: docs/source/policies.rst dynamic-URI examples).
_JAVA_TO_STRFTIME = [
    ("yyyy", "%Y"),
    ("yy", "%y"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("mm", "%M"),
    ("ss", "%S"),
    ("DDD", "%j"),
    ("EEE", "%a"),
]

_TEMPLATE_RE = re.compile(r"\$\{([^}]+)\}")


def expand_dynamic_uri(uri: str, now: dt.datetime | None = None) -> str:
    """Expand ``${yyyy}``-style date templates (AbstractPolicy.java:94-110).

    Default clock is LOCAL wall time, matching the reference's
    ``LocalDateTime.now()`` (:96) — producers writing date-partitioned
    directories almost always do so in server-local time, and a UTC
    default would point at yesterday's partition for part of every day
    east of Greenwich. Pass an explicit (zone-aware) ``now`` to pin it."""
    if now is None:
        now = dt.datetime.now()

    def repl(m: re.Match) -> str:
        pat = m.group(1)
        out = pat
        for java, strf in _JAVA_TO_STRFTIME:
            out = out.replace(java, strf)
        if out == pat and not re.search(r"%", out):
            raise ValueError(f"cannot convert dynamic URI pattern: {pat!r}")
        return now.strftime(out)

    return _TEMPLATE_RE.sub(repl, uri)


@dataclass(frozen=True)
class FileMeta:
    """Reference: file/FileMetadata.java:6-15 (path, length) + mtime."""

    path: str
    length: int
    mtime: float


def _local_path(uri: str) -> str:
    return uri[len("file://"):] if uri.startswith("file://") else uri


def _hidden(name: str) -> bool:
    # Hadoop/Spark convention: '_'-/'.'-prefixed files are metadata
    # (_SUCCESS, .crc, ._COPYING_ — the reference also excludes in-flight
    # ._COPYING_ files, HdfsFileWatcherPolicy.java:150)
    return name.startswith(".") or name.startswith("_")


def list_files(
    uris: list[str] | str,
    regexp: str = ".*",
    recursive: bool = True,
    now: dt.datetime | None = None,
    include_hidden: bool = False,
) -> list[FileMeta]:
    """List files under each URI, filtering by regex on the file *name*.

    Local paths use os.scandir; other schemes (hdfs://, s3://) go through
    pyarrow.fs — the same Hadoop-FS-style abstraction the reference uses
    (AbstractPolicy.java:78-92 builds one FileSystem per URI).
    """
    if isinstance(uris, str):
        uris = [uris]
    pat = re.compile(regexp)
    out: list[FileMeta] = []
    for uri in uris:
        uri = expand_dynamic_uri(uri, now)
        if "://" in uri and not uri.startswith("file://"):
            out.extend(_list_pyarrow(uri, pat, recursive, include_hidden))
        else:
            out.extend(_list_local(_local_path(uri), pat, recursive, include_hidden))
    # stable order: the reference iterates listing order; we pin path order
    # so batching (take-first-N files per trigger) is deterministic.
    return sorted(out, key=lambda f: f.path)


def _list_local(root: str, pat: re.Pattern, recursive: bool, include_hidden: bool = False) -> list[FileMeta]:
    out: list[FileMeta] = []
    if not os.path.exists(root):
        return out
    if os.path.isfile(root):
        st = os.stat(root)
        if pat.search(os.path.basename(root)):
            out.append(FileMeta(root, st.st_size, st.st_mtime))
        return out
    stack = [root]
    while stack:
        d = stack.pop()
        try:
            entries = list(os.scandir(d))
        except FileNotFoundError:
            continue
        for e in entries:
            if e.is_dir(follow_symlinks=False):
                # do not descend into hidden/staging dirs either
                # (_temporary/... attempt files have non-hidden basenames)
                if recursive and (include_hidden or not _hidden(e.name)):
                    stack.append(e.path)
            else:
                if not include_hidden and _hidden(e.name):
                    continue
                try:
                    st = e.stat()
                except (FileNotFoundError, OSError):
                    # vanished between scandir and stat (our own cleanup,
                    # rotation, a dangling symlink): skip the entry, never
                    # abort the whole discovery sweep
                    continue
                if statmod.S_ISREG(st.st_mode) and pat.search(e.name):
                    out.append(FileMeta(e.path, st.st_size, st.st_mtime))
    return out


def _list_pyarrow(uri: str, pat: re.Pattern, recursive: bool, include_hidden: bool = False) -> list[FileMeta]:
    import pyarrow.fs as pafs

    fs, path = pafs.FileSystem.from_uri(uri)
    sel = pafs.FileSelector(path, recursive=recursive, allow_not_found=True)
    base = path.rstrip("/")
    # Rebuild URIs with the CALLER's original prefix, not fs.type_name:
    # the type name rewrites gs://→gcs:// (a scheme Spark/Hadoop has no
    # handler for) and drops the hdfs://namenode:port authority entirely
    # (later opens would bind to fs.defaultFS — potentially a different
    # cluster). FS-agnostic: from_uri turned `uri` into `path`, so the
    # prefix is exactly what it stripped (for s3:// that is just
    # "s3://" — the bucket lives inside info.path; for hdfs:// it is
    # "hdfs://nn:port").
    norm = uri.rstrip("/")
    if norm.endswith(path.rstrip("/")):
        prefix = norm[: len(norm) - len(path.rstrip("/"))]
    else:  # defensive: fall back to the old reconstruction
        prefix = f"{fs.type_name}://"
    out = []
    for info in fs.get_file_info(sel):
        if info.type != pafs.FileType.File or not pat.search(info.base_name):
            continue
        if not include_hidden:
            # any hidden component below the listed root excludes the file
            # (e.g. Hadoop _temporary staging dirs)
            rel = info.path[len(base):].lstrip("/") if info.path.startswith(base) else info.path
            if any(_hidden(c) for c in rel.split("/")):
                continue
        mtime = info.mtime.timestamp() if info.mtime else 0.0
        p = info.path
        if not prefix.endswith("/") and not p.startswith("/"):
            p = "/" + p  # keep scheme://path well-formed either way
        out.append(FileMeta(prefix + p, info.size, mtime))
    return out
