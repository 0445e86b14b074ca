"""Trigger policies — the reference's Policy hierarchy as micro-batch pacing.

Reference: policy/SimplePolicy.java (one-shot), policy/SleepyPolicy.java
(sleep between executions, optional max_execs), policy/CronPolicy.java
(Quartz cron + optional end_date). In Spark terms these are
``Trigger.AvailableNow`` / ``Trigger.ProcessingTime`` / an external cron
gate; here each policy is an iterator of execution slots the engine drains.

The cron parser is a minimal 5-field implementation (croniter is not in
this sandbox): minute hour day-of-month month day-of-week, supporting
``*``, ``*/n``, ``a-b``, ``a,b,c`` and plain numbers.
"""

from __future__ import annotations

import datetime as dt
import time
from typing import Iterator


class Policy:
    def triggers(self) -> Iterator[int]:
        raise NotImplementedError

    # parity with policy/Policy.java:13-26 lifecycle
    def interrupt(self) -> None:
        self._interrupted = True


class SimplePolicy(Policy):
    """One execution, then ended (SimplePolicy.java:8-24)."""

    def triggers(self) -> Iterator[int]:
        yield 0


class SleepyPolicy(Policy):
    """Sleep ``sleep_s`` between executions; stop after ``max_execs``
    (SleepyPolicy.java:11-78; sleep is chunked into ``fraction`` slices so
    interrupt() is honored promptly, mirroring :60-72)."""

    def __init__(self, sleep_s: float, max_execs: int = -1, fraction: int = 10):
        self.sleep_s = sleep_s
        self.max_execs = max_execs
        self.fraction = max(1, fraction)
        self._interrupted = False

    def triggers(self) -> Iterator[int]:
        n = 0
        while not self._interrupted and (self.max_execs < 0 or n < self.max_execs):
            yield n
            n += 1
            if self.max_execs >= 0 and n >= self.max_execs:
                return
            slice_s = self.sleep_s / self.fraction
            for _ in range(self.fraction):
                if self._interrupted:
                    return
                time.sleep(slice_s)


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        rng_spec, step = part, 1
        if "/" in part:
            rng_spec, step_s = part.split("/", 1)
            step = int(step_s)
        if rng_spec == "*":
            start, end = lo, hi
        elif "-" in rng_spec:
            a, b = rng_spec.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = int(rng_spec)
            end = hi if step > 1 else start  # "5/15" = start 5, step 15
        vals.update(range(start, end + 1, step))
    return {v for v in vals if lo <= v <= hi}


class Cron:
    """minute hour dom month dow (0=Sunday, 7 also Sunday)."""

    def __init__(self, expr: str):
        f = expr.split()
        if len(f) != 5:
            raise ValueError(f"cron needs 5 fields: {expr!r}")
        self.minutes = _parse_field(f[0], 0, 59)
        self.hours = _parse_field(f[1], 0, 23)
        self.dom = _parse_field(f[2], 1, 31)
        self.months = _parse_field(f[3], 1, 12)
        dow = _parse_field(f[4], 0, 7)
        self.dow = {d % 7 for d in dow}
        # Vixie-cron day rule: when BOTH day fields are restricted
        # (neither is '*'), the day matches when EITHER does — '0 0 13 * 5'
        # means the 13th OR any Friday, not only Friday-the-13th
        self._dom_restricted = f[2] != "*"
        self._dow_restricted = f[4] != "*"

    def _day_matches(self, t: dt.datetime) -> bool:
        dom_ok = t.day in self.dom
        dow_ok = (t.weekday() + 1) % 7 in self.dow  # python Mon=0 → cron Sun=0
        if self._dom_restricted and self._dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def matches(self, t: dt.datetime) -> bool:
        return (
            t.minute in self.minutes
            and t.hour in self.hours
            and t.month in self.months
            and self._day_matches(t)
        )

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        for _ in range(366 * 24 * 60):  # search up to a year
            if self.matches(t):
                return t
            t += dt.timedelta(minutes=1)
        raise ValueError("no cron fire within a year")


class FileWatcherPolicy(SleepyPolicy):
    """Push-style discovery modeled as a fast listing-diff poll — the
    FALLBACK cadence when the true inotify stream is unavailable.

    The reference's HdfsFileWatcherPolicy (policy/HdfsFileWatcherPolicy.java)
    consumes HDFS inotify events into a queue, deduped by path keeping the
    latest metadata (:88-97). The true O(events) push path lives in
    sources/hdfs_inotify.py (``HdfsInotifyPolicy.try_create`` reaches
    ``HdfsAdmin#getInotifyEventStream`` through the py4j gateway; wire its
    instance as ``IngestConfig.discovery_fn`` and list_files never runs).
    Where that probe fails (non-HDFS FS, missing inotify rights), THIS
    policy's per-trigger listing diff against the watermark table gives
    the same observable semantics (CREATE → new file at offset 0, APPEND
    → size > committed offset ⇒ tail the delta, RENAME/CLOSE → new path)
    at O(objects listed) cost — the dedup-keep-latest is inherent in
    listing the live filesystem state.
    """

    def __init__(self, poll_s: float = 0.2, max_execs: int = -1):
        super().__init__(sleep_s=poll_s, max_execs=max_execs)


class CronPolicy(Policy):
    """Fire on a cron schedule until optional end_date
    (CronPolicy.java:22-73)."""

    def __init__(
        self,
        expr: str,
        end_date: dt.datetime | None = None,
        max_execs: int = -1,
        clock=None,
        sleeper=None,
    ):
        self.cron = Cron(expr)
        self.end_date = end_date
        self.max_execs = max_execs
        self._clock = clock or (lambda: dt.datetime.now())
        self._sleeper = sleeper or time.sleep
        self._interrupted = False

    def triggers(self) -> Iterator[int]:
        n = 0
        while not self._interrupted and (self.max_execs < 0 or n < self.max_execs):
            now = self._clock()
            nxt = self.cron.next_fire(now)
            if self.end_date and nxt > self.end_date:
                return
            remaining = max(0.0, (nxt - now).total_seconds())
            # chunked sleep so interrupt() takes effect within ~1s, not
            # after the full (possibly hours-long) wait to the next fire
            while remaining > 0 and not self._interrupted:
                step = min(remaining, 1.0)
                self._sleeper(step)
                remaining -= step
            if self._interrupted:
                return
            yield n
            n += 1
