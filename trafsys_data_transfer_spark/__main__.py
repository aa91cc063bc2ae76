"""CLI entry point — ``python -m trafsys_data_transfer_spark [--from F] [--to T]``.

Mirrors the reference's invocation (``node script.js --from 2020-01-01 --to
2020-12-31``, /root/reference/README.md:9): unspecified bounds default to
yesterday / the previous run's ToDate (the watermark), and any failure exits
non-zero *without* advancing the watermark so the window is retried next run
(script.js:258-265).
"""

from __future__ import annotations

import argparse
import sys


def build_transport():
    """Production transport over ``requests``/urllib — constructed lazily so
    the module imports (and tests run) without network libraries."""
    import json as _json
    import urllib.parse
    import urllib.request

    def transport(method, url, params=None, data=None, headers=None):
        if params:
            url = url + "?" + urllib.parse.urlencode(params)
        body = urllib.parse.urlencode(data).encode() if data else None
        req = urllib.request.Request(url, data=body, headers=headers or {}, method=method)
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:  # non-2xx still carries a body
            return e.code, e.read().decode()

    return transport


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="trafsys_data_transfer_spark",
        description="Incremental TrafSys → table load (Spark-native).",
    )
    # `--from` matches the reference flag names (README.md:9).
    parser.add_argument("--from", dest="date_from", default=None, metavar="YYYY-MM-DD")
    parser.add_argument("--to", dest="date_to", default=None, metavar="YYYY-MM-DD")
    args = parser.parse_args(argv)

    from .config import JobConfig, MissingConfigError
    from .plans.pipeline import run_pipeline
    from .session import get_spark
    from .sources.trafsys_api import TokenProvider, make_fetch_window

    try:
        cfg = JobConfig.from_env()
    except MissingConfigError as e:  # script.js:94-96: list-and-exit
        print(str(e), file=sys.stderr)
        return 2

    spark = get_spark("trafsys-nightly")
    transport = build_transport()
    tokens = TokenProvider(cfg.trafsys_url, cfg.api_user, cfg.api_password, transport)
    fetch = make_fetch_window(spark, cfg.trafsys_url, tokens, transport)
    try:
        info = run_pipeline(
            spark,
            fetch,
            target_path=cfg.target_path,
            run_log_path=cfg.run_log_path,
            cli_from=args.date_from,
            cli_to=args.date_to,
            tokens=tokens,
        )
    except Exception as e:  # script.js:258-260: log, exit, no watermark write
        print(f"run failed: {e}", file=sys.stderr)
        return 1
    print(f"loaded {info['Records']} records for {info['FromDate']}..{info['ToDate']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
