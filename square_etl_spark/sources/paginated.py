"""Paginated-JSON data source (Spark 4 Python Data Source API).

The reference's sources are cursor-paginated REST scans: a sequential
loop pulls one JSON page at a time, with the time window and type
filter pushed server-side as URL params (reference src/square.ts:43-91
at :53-55 — the S1 operator).  This source is the Spark-native
re-expression of that contract against a directory of JSON page files
(the durable form of "one API page = one response body"):

- **pages are partitions**: every ``page-*.json`` file becomes an
  ``InputPartition``, so the cursor loop the reference executes
  sequentially becomes N parallel scan tasks — the single biggest
  structural win over the reference's design;
- **the window is pushed**: Catalyst filters on the timestamp column
  reach ``pushFilters`` and are applied inside ``read`` before rows
  ever enter the engine — exactly the ``begin_time``/``end_time`` URL
  params of the reference, but negotiated by the optimizer instead of
  hand-wired;
- rows keep the reference's wire shape (ISO-8601 timestamp STRINGS,
  nullable everything) — downstream projection/validation is the P1–P9
  operator family's job, same as for the real API.

Usage::

    spark.dataSource.register(PaginatedJsonDataSource)
    df = (spark.read.format("paginated_json")
          .option("path", page_dir)
          .load())

At 100 TB the same class shape serves real REST ingestion: partitions
become (cursor-range, shard) tuples and ``read`` the cursor loop
:func:`fetch_all_pages` under :class:`RateLimitRetry` — the S7 429
backoff of the reference (src/square.ts:69-73), implemented below
with Retry-After honoring and capped exponential backoff; nothing
else changes.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import re
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    WriterCommitMessage,
)

SCHEMA = (
    "event_id bigint, ts string, user_id bigint, event_type string, value double"
)

class _PagePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _list_pages(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("page-") and f.endswith(".json")
    )


def _read_page(
    path: str,
    begin: str | None,
    end: str | None,
    types: set[str] | None,
) -> Iterator[tuple]:
    """Scan one page file, applying the negotiated window/type filters.
    Shared by the batch and streaming readers — one filtering contract."""
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = json.loads(line)
            ts = rec.get("ts")
            if begin is not None and (ts is None or ts < begin):
                continue
            if end is not None and (ts is None or ts >= end):
                continue
            if types is not None and rec.get("event_type") not in types:
                continue
            yield (
                rec.get("event_id"),
                ts,
                rec.get("user_id"),
                rec.get("event_type"),
                rec.get("value"),
            )


class RateLimitedError(Exception):
    """A fetch hit the server's rate limit (HTTP 429).  ``retry_after``
    carries the server's Retry-After hint in seconds, if any."""

    def __init__(self, retry_after: float | None = None) -> None:
        super().__init__(f"rate limited (retry_after={retry_after})")
        self.retry_after = retry_after


class RateLimitRetry:
    """S7: the reference's 429 retry policy (src/square.ts:69-73 —
    sleep 10 s and retry the same request) as an injectable policy
    object, upgraded with Retry-After honoring and capped exponential
    backoff.

    This is the swap point the 100 TB REST deployment uses inside a
    partition's fetch loop: Spark's task retry re-runs a WHOLE
    partition on failure (the right tool for crashes), while a 429 is
    a per-request, wait-and-continue condition — retrying the request
    in place keeps the partition's cursor position instead of
    re-fetching every earlier page.  ``sleep`` is injectable so tests
    (and deterministic replays) never wall-clock wait.

    Policy: on :class:`RateLimitedError`, wait ``retry_after`` if the
    server sent one (clamped to ``max_delay_s`` — a single hostile
    hint must not park a task forever), else ``base_delay_s *
    2**attempt`` capped at
    ``max_delay_s`` (attempt 0 waits base_delay_s = the reference's
    fixed 10 s); after ``max_attempts`` rate-limited attempts the
    error propagates — loud failure, the engine's E2 posture, so a
    misconfigured quota surfaces instead of stalling a task forever.

    Any other exception propagates immediately: backoff is for
    throttling, not for masking real failures.
    """

    def __init__(
        self,
        max_attempts: int = 5,
        base_delay_s: float = 10.0,
        max_delay_s: float = 60.0,
        sleep=None,
    ) -> None:
        if max_attempts < 1:
            raise ValueError("max_attempts must be >= 1")
        self.max_attempts = max_attempts
        self.base_delay_s = base_delay_s
        self.max_delay_s = max_delay_s
        if sleep is None:
            import time as _time

            sleep = _time.sleep
        self.sleep = sleep

    def call(self, fetch, *args, **kwargs):
        """Run ``fetch(*args, **kwargs)`` under the retry policy."""
        attempt = 0
        while True:
            try:
                return fetch(*args, **kwargs)
            except RateLimitedError as exc:
                attempt += 1
                if attempt >= self.max_attempts:
                    raise
                if exc.retry_after is not None:
                    # clamp the server hint BOTH ways: retry_after=1e9
                    # must not park the task past the bound the
                    # exponential path respects, and a negative/NaN
                    # hint must not crash time.sleep (ValueError would
                    # kill the whole partition instead of throttling)
                    hint = float(exc.retry_after)
                    if hint != hint:  # NaN
                        hint = self.base_delay_s
                    delay = min(max(0.0, hint), self.max_delay_s)
                else:
                    delay = min(
                        self.base_delay_s * (2 ** (attempt - 1)),
                        self.max_delay_s,
                    )
                self.sleep(delay)


def fetch_all_pages(fetch_page, retry: RateLimitRetry | None = None):
    """The reference's cursor loop (src/square.ts:43-91) with S7 retry:
    ``fetch_page(cursor) -> (rows, next_cursor)`` is called under the
    retry policy until the cursor comes back None; yields rows.

    This is the per-partition REST loop of the 100 TB deployment
    (partition = cursor range/shard); the parquet-backed fixtures use
    :func:`_read_page` instead, with Spark task retry covering the
    file path (SURVEY §2.1: S7 is a connector concern)."""
    retry = retry or RateLimitRetry()
    cursor = None
    while True:
        rows, cursor = retry.call(fetch_page, cursor)
        yield from rows
        if cursor is None:
            return


class PaginatedJsonReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        # window options mirror the reference's begin_time/end_time URL
        # params; Catalyst-pushed filters (below) tighten them further.
        self.begin: str | None = options.get("begin")
        self.end: str | None = options.get("end")
        self.types: set[str] | None = (
            set(options["types"].split(",")) if "types" in options else None
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept ts-window and event_type equality predicates; return
        the rest for Spark to evaluate post-scan (the standard pushdown
        contract: accepted filters MUST be fully enforced in read)."""
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col == "ts" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual)
            ) and isinstance(f.value, str):
                # conservative: widen >= (strict > kept post-scan too)
                self.begin = max(self.begin, f.value) if self.begin else f.value
                if isinstance(f, GreaterThan):
                    yield f  # strict bound still re-checked by Spark
            elif col == "ts" and isinstance(f, LessThan) and isinstance(
                f.value, str
            ):
                # read() treats end as EXCLUSIVE, exactly LessThan; a
                # LessThanOrEqual must NOT tighten end (it would drop
                # the boundary row) and falls through to Spark instead.
                self.end = min(self.end, f.value) if self.end else f.value
            elif col == "event_type" and isinstance(f, EqualTo) and isinstance(
                f.value, str
            ):
                self.types = {f.value} if self.types is None else (
                    self.types & {f.value}
                )
            else:
                yield f  # unsupported → Spark evaluates it

    def partitions(self) -> list[_PagePartition]:
        return [_PagePartition(p) for p in _list_pages(self.path)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        return _read_page(partition.path, self.begin, self.end, self.types)


class PaginatedJsonStreamReader(DataSourceStreamReader):
    """Incremental micro-batch reader: the durable-cursor upgrade over
    the reference's stateless 24 h lookback (SURVEY.md §2.8 T3).

    The reference re-scans a sliding window every hour and relies on
    idempotent upserts to absorb the ~24× re-read; here the offset IS
    the cursor — ``{"page_count": N}`` = pages consumed so far —
    checkpointed by Spark, so each page is read exactly once and a
    restart resumes where the last run committed.  Page files must be
    append-only with lexicographically increasing names (exactly how a
    cursor-paginated API emits them).  Each micro-batch fans the new
    pages out as parallel partitions, same as the batch reader.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.begin: str | None = options.get("begin")
        self.end: str | None = options.get("end")
        self.types: set[str] | None = (
            set(options["types"].split(",")) if "types" in options else None
        )

    def initialOffset(self) -> dict:
        return {"page_count": 0}

    def latestOffset(self) -> dict:
        return {"page_count": len(_list_pages(self.path))}

    def partitions(self, start: dict, end: dict) -> list[_PagePartition]:
        pages = _list_pages(self.path)
        return [
            _PagePartition(p) for p in pages[start["page_count"] : end["page_count"]]
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        return _read_page(partition.path, self.begin, self.end, self.types)

    def commit(self, end: dict) -> None:
        # nothing to release source-side: pages are immutable files and
        # Spark's checkpoint owns the committed offset.
        pass


_FIELDS = ("event_id", "ts", "user_id", "event_type", "value")


@dataclass
class _PageCommit(WriterCommitMessage):
    staged: str
    rows: int


class PaginatedJsonWriter(DataSourceWriter):
    """Transactional page publisher — the sink-side twin of the reader
    and the Spark-native form of the reference's all-or-nothing upsert
    batch (SURVEY.md §2.2 K1 / §2.9 E3, reference BEGIN/COMMIT/ROLLBACK
    at src/etl-square-payments.ts:57,120).

    Tasks stage files under dot-prefixed names the readers never match;
    only the driver-side ``commit`` renames them into the visible,
    lexicographically ordered ``page-NNNNN.json`` namespace (rename is
    atomic per file, and nothing is visible until commit).  ``abort``
    deletes the staging files — a failed job publishes NOTHING.  Empty
    partitions publish no page (K3's empty-batch short-circuit).
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:12]  # driver-side; shipped to tasks

    def _staging_glob(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return [
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.startswith(f".staging-{self.job_id}-")
        ]

    def write(self, iterator) -> _PageCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f".staging-{self.job_id}-{pid:05d}.json")
        rows = 0
        with open(staged, "w") as fh:
            for row in iterator:
                rec = row.asDict()
                fh.write(json.dumps({k: rec.get(k) for k in _FIELDS}) + "\n")
                rows += 1
        return _PageCommit(staged=staged, rows=rows)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        existing = _list_pages(self.path)
        if self.overwrite:
            for p in existing:
                os.remove(p)
            nxt = 0
        else:
            idx = [
                int(m.group(1))
                for p in existing
                if (m := re.match(r"page-(\d+)\.json$", os.path.basename(p)))
            ]
            nxt = max(idx) + 1 if idx else 0
        for msg in sorted(messages, key=lambda m: m.staged):
            if msg.rows == 0:
                os.remove(msg.staged)  # K3: empty batches publish nothing
                continue
            os.rename(msg.staged, os.path.join(self.path, f"page-{nxt:05d}.json"))
            nxt += 1

    def abort(self, messages) -> None:
        for p in self._staging_glob():
            os.remove(p)


class PaginatedJsonStreamWriter(DataSourceStreamWriter):
    """Micro-batch page publisher: each epoch's rows become new pages
    appended after the current cursor, atomically (stage → driver
    commit), so a downstream PaginatedJsonStreamReader can tail the
    same directory — pages in, pages out, end to end.

    Re-delivered epochs are absorbed by a ``.committed-<epoch>`` marker
    (commit is idempotent per batchId): together with the atomic
    rename, that is the sink-side half of the exactly-once contract.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _PageCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path,
            f".staging-{self.job_id}-{pid:05d}-{uuid.uuid4().hex[:8]}.json",
        )
        rows = 0
        with open(staged, "w") as fh:
            for row in iterator:
                rec = row.asDict()
                fh.write(json.dumps({k: rec.get(k) for k in _FIELDS}) + "\n")
                rows += 1
        return _PageCommit(staged=staged, rows=rows)

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        marker = os.path.join(self.path, f".committed-{batchId}")
        if os.path.exists(marker):  # re-delivered epoch: drop, don't duplicate
            for msg in messages:
                if msg is not None and os.path.exists(msg.staged):
                    os.remove(msg.staged)
            return
        idx = [
            int(m.group(1))
            for p in _list_pages(self.path)
            if (m := re.match(r"page-(\d+)\.json$", os.path.basename(p)))
        ]
        nxt = max(idx) + 1 if idx else 0
        for msg in sorted(messages, key=lambda m: m.staged):
            if msg.rows == 0:
                os.remove(msg.staged)
                continue
            os.rename(msg.staged, os.path.join(self.path, f"page-{nxt:05d}.json"))
            nxt += 1
        with open(marker, "w") as fh:
            fh.write("")

    def abort(self, messages, batchId: int) -> None:
        if not os.path.isdir(self.path):
            return
        for f in os.listdir(self.path):
            if f.startswith(f".staging-{self.job_id}-"):
                os.remove(os.path.join(self.path, f))


class PaginatedJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_json"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PaginatedJsonReader:
        return PaginatedJsonReader(self.options)

    def streamReader(self, schema) -> PaginatedJsonStreamReader:
        return PaginatedJsonStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> PaginatedJsonWriter:
        return PaginatedJsonWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> PaginatedJsonStreamWriter:
        return PaginatedJsonStreamWriter(self.options)
