"""Offline TrafSys source: the ``trafsys`` DataSource wired to a
deterministic in-process transport — no network, no credentials.

The connector equivalent of an embedded mock broker: development, CI and
the streaming tests drive the REAL reader/offset machinery
(``datasource.py`` — partition planning, OAuth token flow, 401 handling,
watermark offsets) against synthetic payloads generated from the request
itself.  Each fetched window yields one record per window start-day, so
assertions can predict exactly which days a micro-batch fetched.

    spark.dataSource.register(OfflineTrafsysSource)
    spark.readStream.format("trafsys_offline").option(...).load()

This module must be importable by Spark's Python worker processes (the
streaming source runner imports the class by module path, it does NOT
receive cloudpickled closures), which is why it lives in the package
rather than in tests/.
"""

from __future__ import annotations

import json

from .datasource import TrafsysDataSource


def offline_transport():
    """Deterministic transport: token POSTs always succeed; traffic GETs
    return one synthetic record for the window's DateFrom day."""

    def transport(method, url, params=None, data=None, headers=None):
        if method == "POST" and url.endswith("token"):
            return 200, json.dumps(
                {
                    "access_token": "offline-token",
                    ".expires": "Mon, 06 Jan 2125 12:00:00 GMT",
                }
            )
        if headers is None or not headers.get("Authorization", "").startswith(
            "Bearer "
        ):
            return 401, "missing bearer token"
        day = params["DateFrom"]
        return 200, json.dumps(
            [
                {
                    "SiteCode": "S1",
                    "Location": "door",
                    "IsInternal": False,
                    "PeriodEnding": f"{day}T10:00:00",
                    "Ins": 5,
                    "Outs": 2,
                }
            ]
        )

    return transport


class OfflineTrafsysSource(TrafsysDataSource):
    transport_factory = staticmethod(offline_transport)

    @classmethod
    def name(cls) -> str:
        return "trafsys_offline"
