"""Job configuration + validation (T7).

The reference reads five env vars and exits with a message listing any that
are missing (``checkEnv``, /root/reference/script.js:85-97; keys documented
in /root/reference/example.env): ``TRAFSYS_USER``, ``TRAFSYS_PASSWORD``,
and the three ``ORACLE_*`` connection keys — the API base URL is hard-coded
upstream (script.js:13), not configured.  This engine accepts a reference
deployment's ``.env`` unchanged (same key names) and adds the keys the
Spark rebuild genuinely needs: ``TRAFSYS_URL`` (we refuse to hard-code a
vendor endpoint) and, for the parquet sink, the two table locations.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

#: The reference's required keys, verbatim (script.js:86-92 /
#: example.env:1-5).  A deployment migrating from the reference passes
#: validation against this tuple with its existing .env.
REFERENCE_ENV_KEYS = (
    "ORACLE_USER",
    "ORACLE_PASSWORD",
    "ORACLE_CONNECTION_STRING",
    "TRAFSYS_USER",
    "TRAFSYS_PASSWORD",
)

#: Keys required when running the Spark pipeline with the parquet MERGE
#: sink (no Oracle): the reference's API credential pair, the engine-added
#: base URL, and the two table locations.
PARQUET_SINK_ENV_KEYS = (
    "TRAFSYS_URL",
    "TRAFSYS_USER",
    "TRAFSYS_PASSWORD",
    "TRAFSYS_TARGET_PATH",
    "TRAFSYS_RUN_LOG_PATH",
)

#: Engine-era aliases kept for backward compatibility with earlier configs
#: of THIS repo (not the reference): either name satisfies the requirement.
_KEY_ALIASES = {
    "TRAFSYS_USER": ("TRAFSYS_API_USER",),
    "TRAFSYS_PASSWORD": ("TRAFSYS_API_PASSWORD",),
}


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
    the full list (script.js:85-97 exits with the same shape of message).
    Each key may be satisfied by itself or by a documented alias; the
    returned dict is keyed by the canonical (reference) name."""
    env = os.environ if env is None else env

    def lookup(key: str) -> str | None:
        for candidate in (key, *_KEY_ALIASES.get(key, ())):
            if env.get(candidate):
                return env[candidate]
        return None

    resolved = {k: lookup(k) for k in required}
    missing = [k for k, v in resolved.items() if v is None]
    if missing:
        raise MissingConfigError(missing)
    return resolved


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
            api_user=vals["TRAFSYS_USER"],
            api_password=vals["TRAFSYS_PASSWORD"],
            target_path=vals["TRAFSYS_TARGET_PATH"],
            run_log_path=vals["TRAFSYS_RUN_LOG_PATH"],
        )
