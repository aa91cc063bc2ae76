"""Central query registry backing the driver contract (__spark_entry__.py).

Every operator the engine claims lands here as a named ``QuerySpec``:
a builder ``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
ANSI-SQL-expressible, the equivalent DuckDB oracle SQL over the same parquet
fixture tables.  The driver hash-compares the two at sf0.01 — this registry
IS the correctness surface (SURVEY.md §5).

Column-name discipline: the driver sorts columns by name before hashing, so
every computed column is aliased identically in the Spark builder and the
oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → non-SQL-expressible, rows-only check


_REGISTRY: dict[str, QuerySpec] = {}

#: Modules whose import registers queries (side-effect registration keeps
#: each operator's query definition next to its implementation).
_QUERY_MODULES = (
    "trafsys_data_transfer_spark.plans.relational",
    "trafsys_data_transfer_spark.plans.analytics",
    "trafsys_data_transfer_spark.plans.traffic_queries",
    "trafsys_data_transfer_spark.operators.dedup",
    "trafsys_data_transfer_spark.operators.graph",
    "trafsys_data_transfer_spark.operators.text",
    "trafsys_data_transfer_spark.operators.similarity",
    "trafsys_data_transfer_spark.operators.multimodal",
    "trafsys_data_transfer_spark.operators.sessions",
    "trafsys_data_transfer_spark.operators.asof",
    "trafsys_data_transfer_spark.operators.rangejoin",
    "trafsys_data_transfer_spark.operators.sampling",
    "trafsys_data_transfer_spark.streaming.queries",
)


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
