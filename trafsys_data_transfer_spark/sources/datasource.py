"""TrafSys REST API as a first-class Spark DataSource (S1/S2).

The adapter tier (``trafsys_api.py``) lands payloads driver-side or fans
out a backfill with ``mapInPandas``; this module is the third form —
SURVEY.md §2.1's "model as a custom Python DataSource (PySpark ≥3.5
API)": the API becomes a real ``spark.read.format("trafsys")`` source, so
the fetch participates in Spark's planning like any other table:

    spark.dataSource.register(TrafsysDataSource)
    df = (spark.read.format("trafsys")
          .option("url", base_url).option("user", u).option("password", p)
          .option("date_from", "2024-01-01").option("date_to", "2024-03-31")
          .load())

Scale shape: ``partitions()`` splits the date window into
``days_per_chunk`` sub-windows (the same :func:`sub_windows` the
mapInPandas backfill uses) — one API GET per task, distributed across
executors, each with the executor-side 401-retry (§3.3,
script.js:243-254).  The nightly one-day window degenerates to a single
partition, matching the reference's one driver-side GET.

Transport injection: instances are pickled to the Python worker, so the
HTTP layer is a CLASS attribute factory — production uses the stdlib
urllib transport below (no extra deps); tests subclass and swap in a
deterministic stub (same injection contract as the adapter tier).
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import TRAFFIC_RAW_SCHEMA
from .trafsys_api import (
    RETRY_SLEEP_SECONDS,
    TokenProvider,
    TrafsysApiError,
    Transport,
    sub_windows,
)


def urllib_transport() -> Transport:
    """Production transport on the stdlib only (the container has no
    ``requests``): transport(method, url, params=, data=, headers=) →
    (status, body)."""
    import urllib.error
    import urllib.parse
    import urllib.request

    def transport(method, url, params=None, data=None, headers=None):
        if params:
            url = url + "?" + urllib.parse.urlencode(params)
        body = urllib.parse.urlencode(data).encode() if data else None
        req = urllib.request.Request(
            url, data=body, headers=headers or {}, method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:  # non-2xx still carries a body
            return e.code, e.read().decode()

    return transport


class _WindowPartition(InputPartition):
    def __init__(self, date_from: str, date_to: str):
        self.date_from = date_from
        self.date_to = date_to


class TrafsysReader(DataSourceReader):
    def __init__(self, options: dict, transport_factory):
        self.options = options
        self.transport_factory = transport_factory

    def partitions(self) -> list[InputPartition]:
        days = int(self.options.get("days_per_chunk", "7"))
        return [
            _WindowPartition(a, b)
            for a, b in sub_windows(
                self.options["date_from"], self.options["date_to"], days
            )
        ]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        transport = self.transport_factory()
        tokens = TokenProvider(
            self.options["url"],
            self.options["user"],
            self.options["password"],
            transport,
        )

        def attempt(token: str):
            return transport(
                "GET",
                self.options["url"].rstrip("/") + "/api/traffic",
                params={
                    # the reference's exact query params (script.js:143-149)
                    "SiteCode": self.options.get("site_code", ""),
                    "IncludeInternalLocations": self.options.get(
                        "include_internal", "true"
                    ),
                    "DataSummedByDay": "false",
                    "DateFrom": partition.date_from,
                    "DateTo": partition.date_to,
                },
                headers={"Authorization": f"Bearer {token}"},
            )

        status, body = attempt(tokens.token())
        if status == 401:  # §3.3: one retry after a 1 s sleep, fresh token
            time.sleep(RETRY_SLEEP_SECONDS)
            status, body = attempt(tokens.token(force_refresh=True))
        if status != 200:
            raise TrafsysApiError(status, body)
        records = json.loads(body)
        if not isinstance(records, list):  # T4 response-shape guard
            raise TrafsysApiError(200, f"non-iterable payload: {body[:100]}")
        for r in records:
            yield tuple(r.get(f.name) for f in TRAFFIC_RAW_SCHEMA.fields)


class TrafsysStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the source: the reference's nightly cron as a
    genuine Structured Streaming source.

    The offset IS the watermark — ``{"next_date": <ISO day>}``, the exact
    state the reference persists in NeDB (`ToDate` of the last run,
    script.js:54) — but stored in the query's CHECKPOINT, so restart
    resumes from the first unfetched day with no hand-rolled run log.
    Each ``read(start)`` fetches the days that have become COMPLETE since
    the last micro-batch (up to yesterday, the reference's default upper
    bound, script.js:12) and returns the advanced offset; an up-to-date
    stream yields an empty batch and an unchanged offset.
    """

    def __init__(self, options: dict, transport_factory):
        self.options = options
        self.transport_factory = transport_factory
        self._reader = TrafsysReader(options, transport_factory)

    def initialOffset(self) -> dict:
        return {"next_date": self.options["date_from"]}

    def _upper_bound(self):
        import datetime as dt

        if "date_to" in self.options:
            return dt.date.fromisoformat(self.options["date_to"])
        return dt.date.today() - dt.timedelta(days=1)  # yesterday

    def read(self, start: dict):
        import datetime as dt

        next_date = dt.date.fromisoformat(start["next_date"])
        last = self._upper_bound()
        if next_date > last:
            return iter([]), start  # caught up: empty batch, offset holds
        # The Simple stream contract: return all data available past the
        # offset.  days_per_chunk bounds each API GET (the reference's
        # paginationless fetch made windowed); max_days_per_batch
        # additionally caps ONE micro-batch — without it, the first run of
        # a multi-year backfill lands as a single giant batch.  A capped
        # read returns a mid-window offset.  Trigger semantics: a
        # processingTime trigger drains cap-sized batches back-to-back;
        # Trigger.AvailableNow snapshots the Simple-reader prefetch, so
        # each INVOCATION commits exactly one capped batch — a scheduled
        # nightly/cron run catches up one bounded step per run, which is
        # precisely the reference's own cadence (script.js:54).
        days = int(self.options.get("days_per_chunk", "7"))
        cap = self.options.get("max_days_per_batch")
        batch_last = (
            min(next_date + dt.timedelta(days=int(cap) - 1), last) if cap else last
        )
        rows: list[tuple] = []
        cur = next_date
        while cur <= batch_last:
            window_end = min(cur + dt.timedelta(days=days - 1), batch_last)
            part = _WindowPartition(cur.isoformat(), window_end.isoformat())
            rows.extend(self._reader.read(part))
            cur = window_end + dt.timedelta(days=1)
        return iter(rows), {"next_date": cur.isoformat()}

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing engine-side to ack


class TrafsysDataSource(DataSource):
    """``spark.read.format("trafsys")`` / ``spark.readStream.format("trafsys")``
    — see module docstring."""

    #: Overridable HTTP layer (class attribute so it survives pickling to
    #: the Python worker; tests subclass with a stub).
    transport_factory = staticmethod(urllib_transport)

    @classmethod
    def name(cls) -> str:
        return "trafsys"

    def schema(self):
        return TRAFFIC_RAW_SCHEMA

    def _validated(self, *required: str) -> dict:
        missing = [k for k in required if k not in self.options]
        if missing:
            raise ValueError(f"trafsys source: missing options {missing}")
        return dict(self.options)

    def reader(self, schema) -> TrafsysReader:
        opts = self._validated("url", "user", "password", "date_from", "date_to")
        return TrafsysReader(opts, type(self).transport_factory)

    def simpleStreamReader(self, schema) -> TrafsysStreamReader:
        # date_to optional for the stream: absent → "through yesterday",
        # re-evaluated every micro-batch, exactly the reference's default.
        opts = self._validated("url", "user", "password", "date_from")
        return TrafsysStreamReader(opts, type(self).transport_factory)
