"""Loader for the driver-generated parquet fixture tables.

Thin on purpose: ``spark.read.parquet`` already gives us a columnar,
predicate-pushdown-capable, column-pruned scan — the properties the
reference's REST fetch lacks (it materialises the whole window in one JS
array, /root/reference/script.js:154).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Analyzed-DataFrame memo: re-reading the same immutable fixture re-lists
#: the directory and re-reads parquet footers on every query build; caching
#: the lazy DataFrame (NOT its data) removes that per-query constant.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; scans stay lazy so Catalyst prunes/pushes."""
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {FIXTURE_TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    from ..session import ensure_engine_confs

    # The driver may hand us a session built without the engine's settings
    # (notably nanosAsLong, without which the events scan throws).
    ensure_engine_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # The driver fixture's ts is parquet TIMESTAMP(NANOS), surfaced as a
        # nanos long (see session.py); truncate to micros — same as DuckDB's
        # ns→us cast.  Re-materialised copies already carry a real
        # timestamp, so the conversion is type-gated.
        from pyspark.sql import functions as F

        # `div` = exact integer division; `/` would round-trip through
        # double and lose sub-microsecond bits on epoch-nanos magnitudes.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Belt-and-braces vs the NTZ inference conf: if a session read the
    # footer before ensure_engine_confs ran (cached relation), untagged
    # TIMESTAMP(MICROS) surfaces as TIMESTAMP_NTZ, which watermarks and
    # epoch casts reject.  Under the UTC session timezone the cast is a
    # pure retag — same wall-clock values the DuckDB oracle sees.
    ntz_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
