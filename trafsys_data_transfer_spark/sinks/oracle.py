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


# ---------------------------------------------------------------------------
# dialect translation + generic DB-API upsert driver
# ---------------------------------------------------------------------------
#
# No Oracle is reachable in this sandbox, so end-to-end proof of the upsert
# semantics runs against an in-process ANSI engine (DuckDB in tests): the
# same column set, the same PK, the same statements modulo type/dialect
# spelling.  Two executable forms, both asserted equal to
# ``operators.merge.merge_dataframes`` on real rows:
#
# * :func:`execute_upsert_batches` — the reference's EXACT protocol
#   (script.js:184-214): per-row INSERT, duplicate-key exception → UPDATE,
#   batch array order defining last-write-wins.  This is also the
#   production fallback for engines with no MERGE support.
# * :func:`merge_sql_on_conflict` — the set-based translation of
#   :func:`merge_sql` for engines that spell MERGE as
#   ``INSERT ... ON CONFLICT DO UPDATE`` (DuckDB < 1.4, Postgres, SQLite).

#: Oracle type → ANSI type, enough to materialize the reference DDL on any
#: standard engine (varchar2 length preserved; number(1) is the 0/1
#: boolean encoding of script.js:161-162; Oracle DATE carries time-of-day).
_ANSI_TYPES = {
    "varchar2(100)": "VARCHAR(100)",
    "number(1)": "SMALLINT",
    "date": "TIMESTAMP",
    "number": "BIGINT",
}


def create_table_ansi(table: str = TRAFFIC_TABLE) -> str:
    """The reference DDL (script.js:111-122) in ANSI types, PK included."""
    ddl = CREATE_TABLE_SQL.replace(TRAFFIC_TABLE, table)
    for ora, ansi in _ANSI_TYPES.items():
        # longest-match first is guaranteed by dict order above
        ddl = ddl.replace(f" {ora},", f" {ansi},").replace(
            f" {ora}\n", f" {ansi}\n"
        )
    return ddl


#: Statement pair mirroring the PL/SQL block's two arms (script.js:186-200),
#: qmark-parameterized in the reference's bind order (script.js:205-212).
UPSERT_INSERT_SQL = (
    f"INSERT INTO {TRAFFIC_TABLE} "
    "(SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs) "
    "VALUES (?, ?, ?, ?, ?, ?)"
)
UPSERT_UPDATE_SQL = (
    f"UPDATE {TRAFFIC_TABLE} SET Ins = ?, Outs = ? "
    "WHERE SiteCode = ? AND Location = ? AND PeriodEnding = ?"
)


def execute_upsert_batches(
    execute: Callable[[str, Sequence], object],
    rows: Sequence[Sequence],
    duplicate_exc: type[BaseException] = Exception,
) -> tuple[int, int]:
    """Run the reference's row-wise insert-else-update protocol through any
    DB-API ``execute(sql, params)`` callable: INSERT each bind row in array
    order; a duplicate-key error triggers the UPDATE arm (script.js:
    ``EXCEPTION WHEN dup_val_on_index``).  Returns (inserted, updated).

    Rows are ``(SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs)``
    — the reference's bindDefs order.  Array order IS the last-write-wins
    order, exactly as ``executeMany`` applies it.
    """
    n_ins = n_upd = 0
    for r in rows:
        site, loc, is_int, pe, ins, outs = r
        try:
            execute(UPSERT_INSERT_SQL, (site, loc, is_int, pe, ins, outs))
            n_ins += 1
        except duplicate_exc:
            execute(UPSERT_UPDATE_SQL, (ins, outs, site, loc, pe))
            n_upd += 1
    return n_ins, n_upd


def merge_sql_on_conflict(
    target: str = TRAFFIC_TABLE,
    staging: str = "ULS_TRAFSYS_STAGE",
    keys: Sequence[str] = ("SiteCode", "Location", "PeriodEnding"),
    update_cols: Sequence[str] = ("Ins", "Outs"),
    insert_cols: Sequence[str] = (
        "SiteCode", "Location", "IsInternal", "PeriodEnding", "Ins", "Outs"
    ),
) -> str:
    """:func:`merge_sql` translated for ON-CONFLICT engines — same staging
    table, same key/update/insert column sets, same outcome."""
    cols = ", ".join(insert_cols)
    on = ", ".join(keys)
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in update_cols)
    return (
        f"INSERT INTO {target} ({cols}) SELECT {cols} FROM {staging} "
        f"ON CONFLICT ({on}) DO UPDATE SET {sets}"
    )
