"""The Migrator runner: per-table incremental E->T->L loops with
restartable offsets and lifecycle control.

Reimplements the reference's outer engine (migrator.go:27-467) on
Spark semantics:

* one worker thread per Iteration (the reference's goroutines,
  migrator.go:307) sharing one SparkSession — Spark's scheduler
  multiplexes the actual cluster work;
* each cycle: read tracking -> extract -> transform -> load ->
  **then** commit tracking (fixes the reference's offset-before-load
  data-loss flaw, SURVEY.md §2.11 / TODO.md:4-10) -> queue cleanup;
* drain mode (``run_until_drained`` ≈ Trigger.AvailableNow): loop while
  ``more``; continuous mode (``start``/``stop`` ≈ processingTime
  trigger): sleep ``sleep_between_runs`` between drains;
* lifecycle states mirror state.go:5-27 (NEW/RUNNING/PAUSED/STOPPING/
  STOPPED) with Pause/Unpause/Quit; error callback carries stage
  context like Migrator.SetErrorCallback (migrator.go:176-178).
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import SparkSession

from migrator_spark.pipeline.config import (
    IterationSpec,
    MigratorConfig,
    Parameters,
    db_name_from_dsn,
)
from migrator_spark.pipeline.registries import resolve
from migrator_spark.pipeline.tracking import TrackingStore
from migrator_spark.pipeline.transformers import TransformContext
from migrator_spark.sources.base import Source, open_source


class State(Enum):
    NEW = "new"
    RUNNING = "running"
    PAUSED = "paused"
    STOPPING = "stopping"
    STOPPED = "stopped"


@dataclass
class BoundIteration:
    source: Source
    target: Source
    source_db: str  # logical db name: tracking + queue filter key
    spec: IterationSpec


@dataclass
class BatchMetric:
    """One E->T->L cycle's observability record (the reference wires
    Elastic APM spans around each stage, migrator.go:20-23,482-497;
    here a structured record + stdlib logging line per batch)."""

    source_table: str
    target_table: str
    rows: int
    seconds: float
    more: bool


@dataclass
class Metrics:
    batches: list[BatchMetric] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def record(self, m: BatchMetric) -> None:
        with self._lock:
            self.batches.append(m)

    def summary(self) -> dict[str, dict[str, float]]:
        """Per source table: batches, rows, seconds, rows/sec."""
        out: dict[str, dict[str, float]] = {}
        with self._lock:
            for m in self.batches:
                s = out.setdefault(
                    m.source_table, {"batches": 0, "rows": 0, "seconds": 0.0}
                )
                s["batches"] += 1
                s["rows"] += m.rows
                s["seconds"] += m.seconds
        for s in out.values():
            s["rows_per_sec"] = round(s["rows"] / s["seconds"], 1) if s["seconds"] else 0.0
        return out


class Migrator:
    def __init__(
        self,
        spark: SparkSession,
        config: MigratorConfig,
        tracking_root: str,
        error_callback: Callable[[str, Exception, dict], None] | None = None,
    ) -> None:
        self.spark = spark
        self.config = config
        self.store = TrackingStore(tracking_root)
        self.error_callback = error_callback
        self.errors: list[tuple[str, Exception, dict]] = []
        self.metrics = Metrics()
        self.log = logging.getLogger("migrator_spark.runner")
        self.state = State.NEW
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._pause = threading.Event()
        self.iterations: list[BoundIteration] = []
        for mig in config.migrations:
            src = open_source(mig.source_dsn, config.parameters)
            tgt = open_source(mig.target_dsn, config.parameters)
            db = db_name_from_dsn(mig.source_dsn)
            for it in mig.iterations:
                self.iterations.append(BoundIteration(src, tgt, db, it))
                if it.bootstrap:
                    self._bootstrap(src=tgt, db=db, it=it)

    def _bootstrap(self, src: Source, db: str, it: IterationSpec) -> None:
        """Seed tracking from the pre-populated destination (config
        ``bootstrap: true``). Sequential scans bootstrap the MAX of the
        position key; timestamp scans the MAX of the timestamp column.
        Coalesced-fallback scans have no single orderable column and
        are skipped with a warning (hand-seed tracking instead)."""
        from migrator_spark.pipeline.tracking import bootstrap_from_target

        if it.extractor == "sequential":
            seeded = bootstrap_from_target(
                self.store, self.spark, src, db, it.source_table,
                it.source_key.split(",")[0].strip(),
                target_table=it.target_table,
            )
        elif it.extractor == "timestamp":
            seeded = bootstrap_from_target(
                self.store, self.spark, src, db, it.source_table,
                it.merge_key_cols[0], timestamp_col=it.source_key,
                target_table=it.target_table,
            )
        else:
            self.log.warning(
                "bootstrap unsupported for extractor %r (table %s); starting at 0",
                it.extractor, it.source_table,
            )
            return
        self.log.info(
            "bootstrapped %s.%s at seq=%s ts=%s", db, it.source_table,
            seeded.sequential_position, seeded.timestamp_position,
        )

    # ---------------------------------------------------------- cycle

    def _run_batch(
        self, b: BoundIteration, params: Parameters, strict: bool = True
    ) -> tuple[bool, bool]:
        """One E->T->L cycle; returns ``(more, failed)`` — the
        extractor's ``more`` flag and whether the cycle failed (offset
        not committed, batch will replay).

        ``strict=False`` (continuous mode): failures are recorded and the
        cycle retries next poll — a transient extract/load error must not
        kill the worker (the reference logs and continues,
        migrator.go:350-380); offsets stay put so the batch replays.
        """
        spec = b.spec
        t_start = time.perf_counter()
        ts = self.store.get(b.source_db, spec.source_table, spec.source_key)
        extractor = resolve("extractor", spec.extractor)
        try:
            res = extractor(self.spark, b.source, b.source_db, spec, ts, params)
        except Exception as e:  # noqa: BLE001
            self._error("extract", e, spec, strict)
            return False, True
        if res.row_count == 0 or res.batch is None:
            if res.batch is not None:
                res.batch.unpersist()
            return False, False
        try:
            transformer = resolve("transformer", spec.transformer)
            ctx = TransformContext(
                spec.source_table, spec.target_table, spec.transformer_parameters
            )
            routed = transformer(res.batch, ctx)
            loader = resolve("loader", spec.loader)
            for r in routed:
                loader(self.spark, b.target, r.target_table, r.df, spec, params)
        except Exception as e:  # noqa: BLE001
            self._error("load", e, spec, strict)
            # offset NOT committed -> this batch replays next cycle
            res.batch.unpersist()
            return False, True
        # load committed: now (and only now) advance the offset
        self.store.put(res.new_tracking)
        if res.cleanup is not None:
            res.cleanup()
        res.batch.unpersist()
        m = BatchMetric(
            spec.source_table,
            spec.target_table,
            res.row_count,
            round(time.perf_counter() - t_start, 4),
            res.more,
        )
        self.metrics.record(m)
        self.log.debug(
            "batch %s->%s rows=%d %.3fs more=%s",
            m.source_table, m.target_table, m.rows, m.seconds, m.more,
        )
        return res.more, False

    def _error(self, stage: str, e: Exception, spec: IterationSpec, strict: bool = True) -> None:
        ctx = {"source_table": spec.source_table, "target_table": spec.target_table}
        self.errors.append((stage, e, ctx))
        if self.error_callback is not None:
            self.error_callback(stage, e, ctx)
        elif strict:
            raise e

    # ---------------------------------------------------------- drain

    def run_until_drained(self, max_batches: int = 10_000) -> int:
        """AvailableNow semantics: every iteration drains to quiescence.
        Returns total batches executed."""
        self.state = State.RUNNING
        total = 0
        for b in self.iterations:
            for _ in range(max_batches):
                more, _failed = self._run_batch(b, self.config.parameters)
                total += 1
                if not more:
                    break
            if self.config.parameters.compact_every:
                self._maybe_compact(b)
        self.state = State.STOPPED
        return total

    def _maybe_compact(self, b: BoundIteration) -> None:
        """Post-drain housekeeping: merge the small part-files the
        per-batch appends left behind (maintenance.compact_table is a
        no-op when the table is already compact). Runs between drains,
        never concurrently with this iteration's own loads; the atomic
        swap keeps it safe for concurrent readers."""
        from migrator_spark.operators.maintenance import compact_table
        from migrator_spark.sources.parquet import ParquetSource

        if isinstance(b.target, ParquetSource) and b.target.exists(
            self.spark, b.spec.target_table
        ):
            compact_table(self.spark, b.target, b.spec.target_table)

    # ------------------------------------------------------ continuous

    def _loop(self, b: BoundIteration) -> None:
        params = self.config.parameters
        drains = 0
        consecutive_failures = 0
        while not self._stop.is_set():
            if self._pause.is_set():
                time.sleep(0.1)
                continue
            more, failed = self._run_batch(b, params, strict=False)
            if failed:
                # failed cycle: the offset stayed put, so the SAME batch
                # replays. Back off exponentially (a deterministically-
                # failing batch — e.g. a transform that always times out
                # — must not hot-loop, leaking one abandoned worker
                # thread per replay). max_replays is an OPT-IN permanent
                # give-up for such deterministic failures (ADVICE r3);
                # the default 0 retries forever like the reference
                # (migrator.go:350-380) so a transient outage can't
                # permanently kill the worker.
                consecutive_failures += 1
                if params.max_replays and consecutive_failures >= params.max_replays:
                    self._error(
                        "replay-limit",
                        RuntimeError(
                            f"iteration gave up after {consecutive_failures} "
                            "consecutive failed cycles (parameters.max-replays)"
                        ),
                        b.spec,
                        strict=False,
                    )
                    return
                backoff = min(
                    params.sleep_between_runs, 0.1 * (2 ** (consecutive_failures - 1))
                )
                if self._stop.wait(backoff):
                    break
                continue
            consecutive_failures = 0
            if not more:
                drains += 1
                if params.compact_every and drains % params.compact_every == 0:
                    try:
                        self._maybe_compact(b)
                    except Exception as e:  # noqa: BLE001 - housekeeping must not kill the worker
                        self._error("compact", e, b.spec, strict=False)
                if self._stop.wait(params.sleep_between_runs):
                    break

    def start(self) -> None:
        """Continuous polling mode (processingTime trigger analogue):
        one thread per iteration, immediate next batch while more."""
        self.state = State.RUNNING
        self._stop.clear()
        for b in self.iterations:
            t = threading.Thread(target=self._loop, args=(b,), daemon=True)
            t.start()
            self._threads.append(t)
        if self.config.timeout:
            threading.Timer(self.config.timeout, self.quit).start()

    def pause(self) -> None:
        self._pause.set()
        self.state = State.PAUSED

    def unpause(self) -> None:
        self._pause.clear()
        self.state = State.RUNNING

    def quit(self) -> None:
        self.state = State.STOPPING
        self._stop.set()
        for t in self._threads:
            t.join(timeout=60)
        self._threads.clear()
        self.state = State.STOPPED
