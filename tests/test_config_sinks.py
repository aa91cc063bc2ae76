"""Config validation (T7) and Oracle sink statement generation (S3-S5)."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.config import (
    JobConfig,
    MissingConfigError,
    REFERENCE_ENV_KEYS,
    check_env,
)
from trafsys_data_transfer_spark.sinks.oracle import (
    CREATE_TABLE_SQL,
    TABLE_EXISTS_SQL,
    ensure_table_sql,
    merge_sql,
)

GOOD_ENV = {
    "TRAFSYS_URL": "https://example.test/rest/",
    "TRAFSYS_USER": "u",
    "TRAFSYS_PASSWORD": "p",
    "TRAFSYS_TARGET_PATH": "/data/target",
    "TRAFSYS_RUN_LOG_PATH": "/data/runlog",
}


def test_check_env_lists_all_missing_keys():
    with pytest.raises(MissingConfigError) as e:
        check_env(env={"TRAFSYS_URL": "x"})
    assert e.value.missing == [
        "TRAFSYS_USER",
        "TRAFSYS_PASSWORD",
        "TRAFSYS_TARGET_PATH",
        "TRAFSYS_RUN_LOG_PATH",
    ]


def test_check_env_rejects_empty_values():
    env = dict(GOOD_ENV, TRAFSYS_PASSWORD="")
    with pytest.raises(MissingConfigError):
        check_env(env=env)


def test_reference_key_names_preserved():
    # example.env:1-5 / script.js:86-92 — exact names, exact order, so a
    # reference deployment's .env passes validation unchanged.
    assert REFERENCE_ENV_KEYS == (
        "ORACLE_USER",
        "ORACLE_PASSWORD",
        "ORACLE_CONNECTION_STRING",
        "TRAFSYS_USER",
        "TRAFSYS_PASSWORD",
    )


def test_reference_dotenv_passes_validation():
    """A .env with only the reference's five keys (example.env:1-5) must
    validate against REFERENCE_ENV_KEYS — the drop-in migration contract."""
    ref_env = {k: "x" for k in REFERENCE_ENV_KEYS}
    assert check_env(REFERENCE_ENV_KEYS, ref_env) == ref_env


def test_engine_alias_keys_accepted():
    """Earlier engine configs used TRAFSYS_API_USER/_PASSWORD; both spell-
    ings satisfy the canonical requirement."""
    env = dict(GOOD_ENV)
    del env["TRAFSYS_USER"], env["TRAFSYS_PASSWORD"]
    env["TRAFSYS_API_USER"], env["TRAFSYS_API_PASSWORD"] = "au", "ap"
    cfg = JobConfig.from_env(env)
    assert (cfg.api_user, cfg.api_password) == ("au", "ap")


def test_job_config_from_env():
    cfg = JobConfig.from_env(GOOD_ENV)
    assert cfg.trafsys_url == GOOD_ENV["TRAFSYS_URL"]
    assert cfg.target_path == "/data/target"


def test_create_table_matches_reference_ddl():
    # script.js:111-122: column types and composite PK.
    for frag in (
        "SiteCode varchar2(100)",
        "IsInternal number(1)",
        "PeriodEnding date",
        "PRIMARY KEY (SiteCode, Location, PeriodEnding)",
    ):
        assert frag in CREATE_TABLE_SQL
    assert "user_tables" in TABLE_EXISTS_SQL
    assert ensure_table_sql() == (TABLE_EXISTS_SQL, CREATE_TABLE_SQL)


def test_merge_sql_upserts_on_composite_pk():
    sql = merge_sql()
    assert (
        "ON (t.SiteCode = s.SiteCode AND t.Location = s.Location "
        "AND t.PeriodEnding = s.PeriodEnding)" in sql
    )
    # script.js:195-200: only the counts update on match.
    assert "UPDATE SET t.Ins = s.Ins, t.Outs = s.Outs" in sql
    assert "WHEN NOT MATCHED THEN INSERT (SiteCode, Location, IsInternal," in sql


def test_cli_missing_env_exits_2(monkeypatch, capsys):
    from trafsys_data_transfer_spark.__main__ import main

    for k in GOOD_ENV:
        monkeypatch.delenv(k, raising=False)
    assert main([]) == 2
    assert "Missing required environment variables" in capsys.readouterr().err
