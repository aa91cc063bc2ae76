"""Explicit schemas — the engine's entire declared type surface.

The reference's schema lives in its Oracle DDL (/root/reference/
script.js:111-122) and the ``DataRecord`` typedef (script.js:126-134); the
API payload is trusted with a single iterability check (script.js:156-159).
We declare the same shapes as ``StructType`` and enforce them at read time
(FAILFAST ≈ the reference's throw-on-bad-response; PERMISSIVE +
``_corrupt_record`` is the at-scale upgrade).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-shaped schemas
# ---------------------------------------------------------------------------

#: One hourly people-counter record as returned by the TrafSys REST API
#: (GET rest/api/traffic, script.js:141-154).  ``IsInternal`` arrives
#: boolean-ish and is normalised to int 0/1 because Oracle has no boolean
#: (script.js:160-163); ``PeriodEnding`` is an ISO-8601 local string parsed
#: with pattern yyyy-MM-dd'T'HH:mm:ss (script.js:191).
TRAFFIC_RAW_SCHEMA = T.StructType(
    [
        T.StructField("SiteCode", T.StringType(), True),
        T.StructField("Location", T.StringType(), True),
        T.StructField("IsInternal", T.BooleanType(), True),
        T.StructField("PeriodEnding", T.StringType(), True),
        T.StructField("Ins", T.LongType(), True),
        T.StructField("Outs", T.LongType(), True),
    ]
)

#: The normalised in-engine traffic record (post T1/T2 transforms):
#: IsInternal as int 0/1, PeriodEnding as a real timestamp.
TRAFFIC_SCHEMA = T.StructType(
    [
        T.StructField("SiteCode", T.StringType(), False),
        T.StructField("Location", T.StringType(), False),
        T.StructField("IsInternal", T.IntegerType(), True),
        T.StructField("PeriodEnding", T.TimestampType(), False),
        T.StructField("Ins", T.LongType(), True),
        T.StructField("Outs", T.LongType(), True),
    ]
)

#: Upsert key of the target table ULS_TRAFSYS_DATA (composite PK,
#: script.js:119).  Every MERGE in the engine keys on this.
TRAFFIC_PK = ["SiteCode", "Location", "PeriodEnding"]

#: Run-log / watermark record (RunInfo typedef, script.js:17-23).  One row
#: per successful run; the most recent row's ToDate seeds the next window
#: (script.js:54).
RUN_LOG_SCHEMA = T.StructType(
    [
        T.StructField("AccessToken", T.StringType(), True),
        T.StructField("AccessTokenExpiresAt", T.TimestampType(), True),
        T.StructField("FromDate", T.StringType(), True),
        T.StructField("ToDate", T.StringType(), True),
        T.StructField("Records", T.LongType(), True),
        T.StructField("createdAt", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Fixture tables (driver-generated, /root/testdata/sf*/; FIXTURES.md §B)
# ---------------------------------------------------------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
