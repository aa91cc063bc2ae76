"""Job configuration + validation (T7).

The reference reads five env vars and exits with a message listing any that
are missing (``checkEnv``, /root/reference/script.js:85-97; keys documented
in /root/reference/example.env).  Same contract here, same key names, plus
the engine-side settings the Spark rebuild adds (paths instead of an Oracle
connection when running with the parquet sink).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

#: The reference's required keys (script.js:86-92 / example.env:1-5).
REFERENCE_ENV_KEYS = (
    "TRAFSYS_URL",
    "TRAFSYS_API_USER",
    "TRAFSYS_API_PASSWORD",
    "ORACLE_CONNECTION_STRING",
    "ORACLE_USER",
    "ORACLE_PASSWORD",
)

#: Keys required when running the Spark pipeline with the parquet MERGE
#: sink (no Oracle): the API triple plus the two table locations.
PARQUET_SINK_ENV_KEYS = (
    "TRAFSYS_URL",
    "TRAFSYS_API_USER",
    "TRAFSYS_API_PASSWORD",
    "TRAFSYS_TARGET_PATH",
    "TRAFSYS_RUN_LOG_PATH",
)


class MissingConfigError(RuntimeError):
    def __init__(self, missing: list[str]):
        super().__init__(
            "Missing required environment variables: " + ", ".join(missing)
        )
        self.missing = missing


def check_env(
    required: tuple[str, ...] = PARQUET_SINK_ENV_KEYS,
    env: dict[str, str] | None = None,
) -> dict[str, str]:
    """T7: filter required keys absent from the environment and fail with
    the full list (script.js:85-97 exits with the same shape of message)."""
    env = os.environ if env is None else env
    missing = [k for k in required if not env.get(k)]
    if missing:
        raise MissingConfigError(missing)
    return {k: env[k] for k in required}


@dataclass(frozen=True)
class JobConfig:
    trafsys_url: str
    api_user: str
    api_password: str
    target_path: str
    run_log_path: str

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "JobConfig":
        vals = check_env(PARQUET_SINK_ENV_KEYS, env)
        return cls(
            trafsys_url=vals["TRAFSYS_URL"],
            api_user=vals["TRAFSYS_API_USER"],
            api_password=vals["TRAFSYS_API_PASSWORD"],
            target_path=vals["TRAFSYS_TARGET_PATH"],
            run_log_path=vals["TRAFSYS_RUN_LOG_PATH"],
        )
