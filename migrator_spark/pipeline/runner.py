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
            staged_rollups = []
            if spec.rollups:
                for r in routed:
                    if r.target_table == spec.target_table:
                        # write-ahead deltas: MUST stage before the
                        # loader merges the batch (the pre-batch target
                        # state the delta needs is gone afterwards)
                        staged_rollups = self._stage_rollups(b, spec, r.df)
                        break
            loader = resolve("loader", spec.loader)
            for r in routed:
                loader(self.spark, b.target, r.target_table, r.df, spec, params)
            if staged_rollups:
                self._apply_rollups(b, spec, staged_rollups)
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

    # ---------------------------------------- maintained rollups (r10)
    #
    # Config `rollups` keeps `<target>__rollup_<name>` fresh per batch
    # at O(batch) cost (operators/maintenance.py) with EXACTLY-ONCE
    # effect under the runner's at-least-once replay, via a staged
    # write-ahead delta sequenced against the rollup table:
    #
    #   stage(seq = applied+1, delta from PRE-load target + batch)
    #     -> load (idempotent merge)  -> apply(patch, publish seq)
    #     -> commit offset
    #
    # Crash anywhere and the replay is safe: before the load, the
    # staged delta is recomputed identically; between load and apply,
    # the staged delta's seq still matches and is REUSED (the pre-load
    # state it encodes is otherwise gone); after apply but before the
    # offset commit, the published seq makes the re-stage compute a
    # zero delta (the target already contains the batch), so nothing
    # double-counts. A missing-or-empty rollup table falls back to a
    # post-load full recompute — correct unconditionally because it
    # depends only on the current target, not on history. Sums run in
    # DECIMAL(18,2): fixed-point addition is associative, which is
    # what makes patch == recompute independent of batch cuts.

    def _rollup_tables(self, spec: IterationSpec, name: str) -> tuple[str, str]:
        base = f"{spec.target_table}__rollup_{name}"
        return base, f"{base}__staged"

    def _rollup_seq(self, target: Source, table: str) -> int:
        """Highest applied sequence, 0 if the table is missing or empty
        (either way the next batch takes the recompute path)."""
        from pyspark.sql import functions as F

        if not target.exists(self.spark, table):
            return 0
        row = target.table(self.spark, table).agg(F.max("_seq")).first()
        return int(row[0]) if row[0] is not None else 0

    def _stage_rollups(self, b: BoundIteration, spec: IterationSpec, batch_df) -> list[dict]:
        from pyspark.sql import functions as F

        from migrator_spark.operators import extract as ex
        from migrator_spark.operators import load as ld
        from migrator_spark.operators import maintenance as mnt

        key_cols = [c for c in spec.merge_key_cols if c in batch_df.columns]
        final = ld.latest_by_key(batch_df, key_cols, "_order", "_tie")
        staged = []
        for rl in spec.rollups:
            data_t, stage_t = self._rollup_tables(spec, rl["name"])
            seq = self._rollup_seq(b.target, data_t)
            if seq == 0 or not b.target.exists(self.spark, spec.target_table):
                staged.append({"rollup": rl, "seq": 1, "recompute": True})
                continue
            expected = seq + 1
            reuse = False
            if b.target.exists(self.spark, stage_t):
                srow = (
                    b.target.table(self.spark, stage_t).agg(F.max("_seq")).first()
                )
                reuse = srow[0] is not None and int(srow[0]) == expected
            if not reuse:
                cast = F.col(rl["sum"]).cast("decimal(18,2)").alias("_rsum")
                before = b.target.table(self.spark, spec.target_table).select(
                    *key_cols, *rl["group_by"], cast
                )
                bfinal = final.select(
                    *key_cols, *rl["group_by"], cast, ex.METHOD_COL
                )
                delta = mnt.rollup_delta(
                    before, bfinal, key_cols, rl["group_by"], "_rsum"
                )
                b.target.write(
                    delta.withColumn("_seq", F.lit(expected)),
                    stage_t,
                    mode="overwrite",
                )
            staged.append({"rollup": rl, "seq": expected, "recompute": False})
        return staged

    def _apply_rollups(self, b: BoundIteration, spec: IterationSpec, staged: list[dict]) -> None:
        from pyspark.sql import functions as F

        from migrator_spark.operators import maintenance as mnt

        for srec in staged:
            rl, seq = srec["rollup"], srec["seq"]
            data_t, stage_t = self._rollup_tables(spec, rl["name"])
            if not srec["recompute"] and self._rollup_seq(b.target, data_t) >= seq:
                continue  # already applied; replay must not double-count
            if srec["recompute"]:
                cast = F.col(rl["sum"]).cast("decimal(18,2)").alias("_rsum")
                new = mnt.compute_rollup(
                    b.target.table(self.spark, spec.target_table).select(
                        *rl["group_by"], cast
                    ),
                    rl["group_by"],
                    "_rsum",
                )
            else:
                delta = (
                    b.target.table(self.spark, stage_t)
                    .filter(F.col("_seq") == seq)
                    .drop("_seq")
                )
                cur = b.target.table(self.spark, data_t).drop("_seq")
                new = mnt.apply_rollup_delta(cur, delta, rl["group_by"])
            b.target.write(
                new.select(
                    *rl["group_by"],
                    F.col("sum_val").cast("decimal(28,2)").alias("sum_val"),
                    F.col("n_rows").cast("long").alias("n_rows"),
                ).withColumn("_seq", F.lit(seq)),
                data_t,
                mode="overwrite",
            )

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
