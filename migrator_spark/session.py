"""SparkSession factory.

Local testing runs ``local[N]`` single-JVM, but every conf here is chosen
for the real target: a multi-executor cluster scanning ~100 TB. AQE is on
so shuffle partitioning, skew joins and broadcast decisions re-plan at
runtime; Arrow is on so any unavoidable Python stage is batch-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "migrator_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # SPARK_GRAFT_MASTER overrides the single-JVM default — the
    # cluster smoke lane (tools/cluster_smoke.py) sets
    # local-cluster[2,2,1024] to run the same plans through real
    # executor processes, serialized closures, and network exchanges.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: coalesce small shuffles, split skewed
        # partitions, convert sort-merge to broadcast when a side turns
        # out small. At 100 TB these are the difference between a plan
        # that finishes and one that doesn't.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Static shuffle parallelism for the local harness; AQE coalesces
        # below this. On a cluster this would be ~2-3x total cores.
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        # Arrow for every pandas_udf / mapInPandas / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep scans splittable: one task per ~128MB of parquet (default,
        # stated explicitly because bench relies on it).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Timestamps in test parquet are TIMESTAMP_MICROS without tz;
        # pin session tz so literals compare identically to DuckDB.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off for bench/test sessions (constant overhead); the
        # optimization probe (tools/opt_probe.py) flips it on to read
        # job/stage/task counts from the REST API.
        .config(
            "spark.ui.enabled",
            os.environ.get("SPARK_GRAFT_UI", "false"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Executor Python workers must import this package: under
        # local[N] they inherit the driver's sys.path, but real executor
        # processes (local-cluster / a cluster) spawn fresh workers —
        # ship the repo root so mapInPandas closures referencing module
        # functions (e.g. multimodal.png_decode) resolve there too. On a
        # production cluster this is the --py-files/wheel equivalent.
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p
                for p in (
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                )
                if p
            ),
        )
    )
    return builder.getOrCreate()
