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
    """Production transport (stdlib urllib) — shared with the registered
    DataSource; constructed lazily so the module imports without it."""
    from .sources.datasource import urllib_transport

    return urllib_transport()


def _run_stream_mode(spark, cfg, args) -> int:
    """``--mode stream``: the nightly loop as ONE Structured Streaming
    query — the registered ``trafsys`` source (checkpoint offset = the
    incremental watermark) drained through the MERGE sink.  The NeDB-style
    run-log table is not needed in this mode; the checkpoint directory
    under the run-log path carries all resume state.
    ``TRAFSYS_OFFLINE=1`` swaps in the packaged offline transport
    (dev/CI; no network)."""
    import datetime as dt
    import os

    from .sources.datasource import TrafsysDataSource
    from .sources.offline import OfflineTrafsysSource
    from .streaming.incremental import run_stream_merge

    src = (
        OfflineTrafsysSource
        if os.environ.get("TRAFSYS_OFFLINE") == "1"
        else TrafsysDataSource
    )
    spark.dataSource.register(src)
    reader = (
        spark.readStream.format(src.name())
        .option("url", cfg.trafsys_url)
        .option("user", cfg.api_user)
        .option("password", cfg.api_password)
        .option(
            "date_from",
            args.date_from
            or (dt.date.today() - dt.timedelta(days=1)).isoformat(),
        )
    )
    if args.date_to:
        reader = reader.option("date_to", args.date_to)
    ckpt = os.path.join(cfg.run_log_path, "stream_checkpoint")
    run_stream_merge(reader.load(), cfg.target_path, ckpt)
    print(f"stream drained into {cfg.target_path} (watermark: {ckpt})")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="trafsys_data_transfer_spark",
        description="Incremental TrafSys → table load (Spark-native).",
    )
    # `--from` matches the reference flag names (README.md:9).
    parser.add_argument("--from", dest="date_from", default=None, metavar="YYYY-MM-DD")
    parser.add_argument("--to", dest="date_to", default=None, metavar="YYYY-MM-DD")
    parser.add_argument(
        "--mode",
        choices=["batch", "stream"],
        default="batch",
        help="batch = the reference's driver-side fetch + MERGE; stream = "
        "the same load as one Structured Streaming query over the "
        "registered trafsys source",
    )
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
    if args.mode == "stream":
        try:
            return _run_stream_mode(spark, cfg, args)
        except Exception as e:  # same containment contract as batch mode
            print(f"run failed: {e}", file=sys.stderr)
            return 1
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
