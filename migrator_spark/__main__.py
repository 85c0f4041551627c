"""CLI entrypoint — the Spark form of the reference's cmd/migrator.

Mirrors cmd/migrator/main.go: ``-config-file`` YAML load, registry
resolution by name, SIGTERM/SIGINT -> graceful quit, optional
wall-clock ``timeout`` auto-stop (main.go:20-143). Two run modes:

* ``--drain``  — Trigger.AvailableNow semantics: every iteration runs
  to quiescence (``more == false``), then exit. The mode the batch
  correctness harness uses.
* default      — continuous polling (the reference's goroutine loops,
  migrator.go:284-428): one worker per iteration, idle sleep
  ``sleep-between-runs`` between drains, until a signal arrives.

Usage::

    python -m migrator_spark -config-file pipeline.yml [--drain]
        [--tracking-root PATH] [--debug]
"""

from __future__ import annotations

import argparse
import logging
import signal
import sys
import threading

from migrator_spark.pipeline.config import load_config
from migrator_spark.pipeline.runner import Migrator
from migrator_spark.session import get_spark

log = logging.getLogger("migrator_spark")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="migrator_spark")
    # single-dash long flag kept for parity with the Go CLI's -config-file
    ap.add_argument("-config-file", "--config-file", dest="config_file", required=True)
    ap.add_argument("--tracking-root", default="/tmp/migrator_spark/tracking")
    ap.add_argument("--drain", action="store_true", help="run to quiescence and exit")
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args(argv)

    cfg = load_config(args.config_file)
    logging.basicConfig(
        level=logging.DEBUG if (args.debug or cfg.debug) else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
    )
    spark = get_spark("migrator_spark-cli")
    spark.sparkContext.setLogLevel("WARN")

    def on_error(stage: str, exc: Exception, ctx: dict) -> None:
        log.error("stage=%s ctx=%s err=%s", stage, ctx, exc)

    mig = Migrator(spark, cfg, args.tracking_root, error_callback=on_error)

    if args.drain:
        n = mig.run_until_drained()
        log.info("drained: %d batches, %d errors", n, len(mig.errors))
        return 1 if mig.errors else 0

    done = threading.Event()

    def handle(signum, frame):  # noqa: ARG001 - signal contract
        log.info("signal %s: stopping", signum)
        done.set()

    signal.signal(signal.SIGINT, handle)
    signal.signal(signal.SIGTERM, handle)
    mig.start()
    done.wait()
    mig.quit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
