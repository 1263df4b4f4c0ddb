"""CLI entry point mirroring the reference binary (reference
main.go:20-41): ``python -m sslr_spark -cfg sslr.json [-c]``.

Exit codes follow the reference protocol (main.go:64-81): 0 success,
1 job error, 2 interrupted, 3 config error.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="sslr_spark", description="PySpark-native incremental table sync"
    )
    parser.add_argument("-cfg", default="sslr.json", help="config file path")
    parser.add_argument(
        "-c", action="store_true", help="continuous mode (poll loop)"
    )
    parser.add_argument(
        "--max-iterations",
        type=int,
        default=None,
        help="stop continuous mode after N passes (testing)",
    )
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="analyze what the next pass would do (zero writes), "
        "print a JSON plan, and exit",
    )
    parser.add_argument(
        "--metrics-file",
        default=None,
        help="write the pass result as JSON to this path",
    )
    parser.add_argument(
        "-curate",
        default=None,
        metavar="CFG",
        help="run a curation pipeline config (see sslr_spark.curation) "
        "instead of a sync job; prints the funnel report as JSON",
    )
    args = parser.parse_args(argv)

    from sslr_spark.config import ConfigError, load_config

    if args.curate:
        import json as _json

        from sslr_spark.curation import load_curation_config, run_curation
        from sslr_spark.session import get_spark as _get_spark

        try:
            ccfg = load_curation_config(args.curate)
        except (ConfigError, OSError, ValueError) as e:
            print(f"config error: {e}", file=sys.stderr)
            return 3
        try:
            report = run_curation(_get_spark(), ccfg)
        except Exception as e:
            print(f"job error: {e}", file=sys.stderr)
            return 1
        print(_json.dumps(report))
        return 0

    try:
        config = load_config(args.cfg)
    except (ConfigError, OSError, ValueError) as e:
        print(f"config error: {e}", file=sys.stderr)
        return 3

    from sslr_spark.job import Job
    from sslr_spark.session import get_spark

    spark = get_spark(shuffle_partitions=config.shuffle_partitions)
    job = Job(spark, config)
    import json
    import signal

    # The reference traps SIGINT AND SIGTERM and drains gracefully
    # with exit code 2 (main.go:66-73); any process supervisor
    # (systemd, k8s) stops with SIGTERM, so without this the loop
    # dies mid-pass instead of finishing the in-flight pass and
    # committing its watermark. SIGINT keeps its KeyboardInterrupt
    # path below; SIGTERM requests a graceful stop via job.stop().
    terminated = False
    prev_term = None

    def _graceful_term(signum, frame):
        nonlocal terminated
        terminated = True
        job.stop()

    try:
        prev_term = signal.signal(signal.SIGTERM, _graceful_term)
    except ValueError:
        prev_term = None  # not the main thread (library embedding)

    try:
        if args.dry_run:
            print(json.dumps(job.plan(), indent=2, sort_keys=True))
            return 0
        if args.c:
            results = job.run_continuous(max_iterations=args.max_iterations)
            total = sum(r.updated_rows for r in results)
            print(f"{len(results)} passes, {total} rows updated")
        else:
            result = job.run()
            print(
                f"{result.updated_rows} rows updated, "
                f"{result.repaired_buckets} buckets repaired, "
                f"full copies: {result.full_copies or 'none'}"
            )
            if args.metrics_file:
                with open(args.metrics_file, "w") as fh:
                    json.dump(
                        {
                            "updated_rows": result.updated_rows,
                            "repaired_buckets": result.repaired_buckets,
                            "compacted_partitions": result.compacted_partitions,
                            "deleted_rows": result.deleted_rows,
                            "repaired_rows": result.repaired_rows,
                            "full_copies": result.full_copies,
                            "validated": result.validated,
                            "mor_log": result.mor_log,
                        },
                        fh,
                    )
    except KeyboardInterrupt:
        job.stop()
        return 2
    except Exception as e:
        print(f"job error: {e}", file=sys.stderr)
        return 1
    finally:
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)
    return 2 if terminated else 0


if __name__ == "__main__":
    sys.exit(main())
