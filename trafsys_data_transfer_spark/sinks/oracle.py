"""Oracle JDBC sink parity (S3/S4/S5).

The reference loads into Oracle with three pieces: a connection
(/root/reference/script.js:232-236), an idempotent DDL-if-absent
(script.js:103-123), and an ``executeMany`` PL/SQL insert-else-update
(script.js:182-215).  The Spark-idiomatic equivalent stages the batch into a
temp table with the JDBC writer (partitioned, batched — Spark's writer
already does what ``executeMany`` hand-rolls) and then issues ONE
server-side ``MERGE`` — set-based, atomic, and identical in outcome to the
reference's row-wise PL/SQL block.

No Oracle is reachable in this environment, so the *statement generation*
is the tested surface (exact DDL/MERGE text), and :func:`write_merge_jdbc`
wires it together behind an injected ``run_sql`` executor; production use
passes a JDBC/`oracledb` callable.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

#: Target DDL — the reference's exact table shape (script.js:111-122):
#: composite PK, number(1) boolean, DATE PeriodEnding.
TRAFFIC_TABLE = "ULS_TRAFSYS_DATA"

CREATE_TABLE_SQL = f"""CREATE TABLE {TRAFFIC_TABLE} (
  SiteCode varchar2(100),
  Location varchar2(100),
  IsInternal number(1),
  PeriodEnding date,
  Ins number,
  Outs number,
  CONSTRAINT pk_uls_trafsys_data PRIMARY KEY (SiteCode, Location, PeriodEnding)
)"""

#: The reference checks user_tables before creating (script.js:104-110).
TABLE_EXISTS_SQL = (
    f"SELECT table_name FROM user_tables WHERE table_name = '{TRAFFIC_TABLE}'"
)


def merge_sql(
    target: str = TRAFFIC_TABLE,
    staging: str = "ULS_TRAFSYS_STAGE",
    keys: Sequence[str] = ("SiteCode", "Location", "PeriodEnding"),
    update_cols: Sequence[str] = ("Ins", "Outs"),
    insert_cols: Sequence[str] = (
        "SiteCode", "Location", "IsInternal", "PeriodEnding", "Ins", "Outs"
    ),
) -> str:
    """The server-side MERGE equivalent to the reference's PL/SQL
    insert-else-update (script.js:185-203): update ``Ins``/``Outs`` on PK
    match (script.js:195-200), insert otherwise (script.js:186-194)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    ins_cols = ", ".join(insert_cols)
    ins_vals = ", ".join(f"s.{c}" for c in insert_cols)
    return (
        f"MERGE INTO {target} t USING {staging} s ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def write_merge_jdbc(
    updates: DataFrame,
    jdbc_url: str,
    run_sql: Callable[[str], object],
    staging_table: str = "ULS_TRAFSYS_STAGE",
    target_table: str = TRAFFIC_TABLE,
    properties: dict | None = None,
) -> None:
    """Stage-then-MERGE upsert against Oracle.

    1. ``updates.write.jdbc`` overwrites the staging table — executors write
       in parallel with batched inserts (the scalable form of
       ``executeMany``, script.js:184-214).
    2. ``run_sql`` executes the single MERGE (atomic server-side commit —
       the reference's ``autoCommit: true`` on one batch, script.js:204).

    ``run_sql`` is injected: tests pass a recorder, production passes a
    thin `oracledb`/JDBC cursor wrapper.
    """
    updates.write.mode("overwrite").jdbc(
        jdbc_url, staging_table, properties=properties or {}
    )
    run_sql(merge_sql(target=target_table, staging=staging_table))


def ensure_table_sql() -> tuple[str, str]:
    """(exists-check, create) statement pair — S4's idempotent DDL
    (script.js:103-123); caller runs the create only when the check returns
    no rows, exactly as the reference does."""
    return TABLE_EXISTS_SQL, CREATE_TABLE_SQL
