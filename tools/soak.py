#!/usr/bin/env python
"""Full-registry soak: execute every registered query at a chosen SF
(default sf0.1 — 10x the driver's correctness scale) and report wall
time per query, slowest first. Catches scale cliffs the 18-query
headline bench can't see. Usage:

    python tools/soak.py [sf_dir] [--repeat]

--repeat runs each query 3x after warm-up and reports the median
(steady state); default is one pass including first-execution JIT.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from migrator_spark.plans.registry import REGISTRY  # noqa: E402
from migrator_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = "--repeat" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("migrator_spark-soak")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    wall = time.time()
    for name, spec in REGISTRY.items():
        try:
            if repeat:
                run(spec.fn)
                samples = []
                for _ in range(3):
                    t0 = time.time()
                    run(spec.fn)
                    samples.append(time.time() - t0)
                times[name] = sorted(samples)[1]
            else:
                t0 = time.time()
                run(spec.fn)
                times[name] = time.time() - t0
        except Exception as e:  # noqa: BLE001 — soak must not stop at one failure
            times[name] = float("nan")
            print(f"ERR {name}: {e}", file=sys.stderr)
    total = time.time() - wall
    # failed queries (NaN) sort first — NaN comparisons would otherwise
    # scatter them arbitrarily through the "slowest first" report
    for name, t in sorted(
        times.items(), key=lambda kv: -kv[1] if kv[1] == kv[1] else float("-inf")
    ):
        print(f"{t:8.2f}  {name}")
    print(f"# {len(times)} queries, total wall {total:.1f}s, sf_dir={sf_dir}")


if __name__ == "__main__":
    main()
