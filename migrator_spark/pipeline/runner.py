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


# Recompute-path rollup writes range-cluster the table at this many
# groups per part-file so later delta applies can file-prune (footer
# min/max on the leading group column). Tests shrink it to pin the
# pruned-apply behavior on small fixtures.
ROLLUP_GROUPS_PER_FILE = 4096

# The delta apply file-prunes only when the batch touches at most this
# fraction of the rollup's groups. Pruning pays when touched keys are a
# localized sliver of a large table (the 100 TB CDC shape: recent keys
# cluster in few file ranges); when a batch's keys spread across most
# file ranges, merge_pruned rewrites everything anyway and its footer
# reads + key collect + range-recluster are pure overhead — MEASURED at
# sf0.1 (14.7k c_custkey groups, 1250 uniformly-spread keys/batch):
# pruned 13.1 s vs full-rewrite 10.1 s median drain. Above the fraction
# the apply takes the plain O(|groups|) overwrite, which is the cheaper
# bound there (SCALE.md §5f).
ROLLUP_PRUNE_MAX_TOUCHED = 0.05


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
                # write-ahead deltas: MUST stage before the loader
                # merges the batch (the pre-batch target state the
                # delta needs is gone afterwards). Keyed on the ROUTED
                # target (VERDICT r10 #4 / ADVICE r10 #2): a renaming
                # transformer maintains the RENAMED table's rollup
                # instead of silently no-opping, and multiple frames
                # routed to one target stage ONE loader-faithful
                # combined delta, mirroring what the loader loop below
                # actually merges.
                staged_rollups = self._stage_rollups(b, spec, routed)
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

    # ------------------------------------ maintained rollups (r10/r11)
    #
    # Config `rollups` keeps `<routed target>__rollup_<name>` fresh per
    # batch at O(batch) cost (operators/maintenance.py) with
    # EXACTLY-ONCE effect under the runner's at-least-once replay, via
    # a staged write-ahead delta sequenced against the rollup table:
    #
    #   stage(seq = applied+1, delta from PRE-load target + batch,
    #         + the batch's FINGERPRINT: row count + order-independent
    #           xor-hash of the resolved (key, _order, _tie, method)
    #           set — ADVICE r10 #1)
    #     -> load (idempotent merge)  -> apply(patch, publish seq)
    #     -> commit offset
    #
    # Crash anywhere and the replay is safe: before the load, an
    # IDENTICAL replayed batch re-uses the staged delta (or recomputes
    # it identically); between load and apply, the staged delta's
    # (seq, fingerprint) still match and it is REUSED (the pre-load
    # state it encodes is otherwise gone); after apply but before the
    # offset commit, the published seq makes the re-stage compute a
    # zero delta (the target already contains the batch), so nothing
    # double-counts.
    #
    # If the replayed batch DIFFERS from the staged one (seq matches,
    # fingerprint does not — a queue extractor's partial tail slice
    # that GREW with new arrivals before the replay, ADVICE r10 #1),
    # the staged delta is stale and the batch falls back to a FULL
    # post-load recompute. A recomputed *delta* would NOT be a correct
    # fallback here: if the crash was in the load->apply window, the
    # target already contains the old batch's effect while the rollup
    # does not, so a delta computed against the post-load target misses
    # the old batch's transition (e.g. key k: target 10, old batch set
    # it to 20 and loaded, rollup still says 10; a fresh delta for the
    # grown batch retracts 20/adds 20 for k — net zero — and the rollup
    # lands 10 short). The replay cannot tell whether the crashed
    # attempt got past its load, so the only unconditionally-correct
    # fallback is the recompute, which depends on the current target
    # alone. It is O(table), but only on the crash-AND-queue-growth
    # replay path — never in steady state.
    #
    # A missing-or-empty rollup table also takes the post-load full
    # recompute. Sums run in DECIMAL(18,2): fixed-point addition is
    # associative, which is what makes patch == recompute independent
    # of batch cuts.
    #
    # APPLY cost (VERDICT r10 #3): for parquet targets the delta patch
    # goes through ParquetSource.merge_pruned — only part-files whose
    # footer range intersects the touched group keys rewrite, the rest
    # carry forward as hardlinks — so per-batch apply I/O is
    # O(files containing touched groups), not O(|groups|). The full
    # rewrite remains only for non-parquet sinks, non-prunable group
    # key types, and the (rare) recompute path, which seeds the table
    # range-clustered so subsequent merges prune.

    def _rollup_tables(self, target_table: str, name: str) -> tuple[str, str]:
        base = f"{target_table}__rollup_{name}"
        return base, f"{base}__staged"

    def _rollup_seq(self, target: Source, table: str) -> int:
        """Highest applied sequence, 0 if the table is missing or empty
        (either way the next batch takes the recompute path)."""
        from pyspark.sql import functions as F

        if not target.exists(self.spark, table):
            return 0
        row = target.table(self.spark, table).agg(F.max("_seq")).first()
        return int(row[0]) if row[0] is not None else 0

    def _routed_finals(self, spec: IterationSpec, routed) -> dict:
        """Per ROUTED target table, the batch's final per-key state AS
        THE LOADER LEAVES IT: within each frame, last-write-wins by
        (_order, _tie); across multiple frames routed to the same
        target, the LATER frame wins a shared key regardless of event
        order — the loader loop merges frames sequentially, so frame
        position (not _order) decides cross-frame conflicts, and the
        staged delta must mirror that or it diverges from the loaded
        table (ADVICE r10 #2). Returns {target_table: (key_cols,
        final_df)}."""
        from pyspark.sql import functions as F

        from migrator_spark.operators import load as ld

        by_target: dict[str, list] = {}
        for r in routed:
            by_target.setdefault(r.target_table, []).append(r.df)
        out = {}
        for tgt, dfs in by_target.items():
            key_cols = [c for c in spec.merge_key_cols if c in dfs[0].columns]
            finals = [
                ld.latest_by_key(df, key_cols, "_order", "_tie").withColumn(
                    "_fidx", F.lit(i)
                )
                for i, df in enumerate(dfs)
            ]
            u = finals[0]
            for f in finals[1:]:
                u = u.unionByName(f)
            if len(finals) > 1:
                # per key, one row per frame survives the step above;
                # _fidx is therefore unique per key and needs no tie
                u = ld.latest_by_key(u, key_cols, "_fidx")
            out[tgt] = (key_cols, u.drop("_fidx"))
        return out

    def _batch_fingerprint(self, final, key_cols: list[str]) -> tuple[int, int]:
        """(row count, order-independent xor of xxhash64 over the
        resolved (key, _order, _tie, method) tuples). The staged delta
        is a pure function of (pre-load target, resolved batch), so two
        batches with equal fingerprints stage the same delta; xor is
        commutative and collision-safe here because resolution leaves
        at most one row per key."""
        from pyspark.sql import functions as F

        from migrator_spark.operators import extract as ex

        row = final.agg(
            F.count(F.lit(1)),
            F.bit_xor(
                F.xxhash64(*key_cols, "_order", "_tie", ex.METHOD_COL)
            ),
        ).first()
        return int(row[0]), int(row[1]) if row[1] is not None else 0

    def _stage_rollups(self, b: BoundIteration, spec: IterationSpec, routed) -> list[dict]:
        from pyspark.sql import functions as F

        from migrator_spark.operators import extract as ex
        from migrator_spark.operators import maintenance as mnt

        staged = []
        for tgt_table, (key_cols, final) in self._routed_finals(
            spec, routed
        ).items():
            fp = None  # one fingerprint job per routed target, lazily
            for rl in spec.rollups:
                data_t, stage_t = self._rollup_tables(tgt_table, rl["name"])
                rec = {"rollup": rl, "table": tgt_table}
                seq = self._rollup_seq(b.target, data_t)
                if seq == 0 or not b.target.exists(self.spark, tgt_table):
                    staged.append({**rec, "seq": 1, "recompute": True})
                    continue
                expected = seq + 1
                if fp is None:
                    fp = self._batch_fingerprint(final, key_cols)
                srow = None
                if b.target.exists(self.spark, stage_t):
                    st = b.target.table(self.spark, stage_t)
                    if {"_seq", "_fp_n", "_fp_hash"} <= set(st.columns):
                        srow = st.select("_seq", "_fp_n", "_fp_hash").first()
                    else:  # pre-fingerprint staged table (legacy): can't
                        # verify it matches this batch -> recompute
                        srow = st.select("_seq").first()
                        if srow is not None and int(srow[0]) == expected:
                            staged.append(
                                {**rec, "seq": expected, "recompute": True}
                            )
                            continue
                        srow = None
                if srow is not None and int(srow[0]) == expected:
                    if (int(srow[1]), int(srow[2])) == fp:
                        # same seq, same batch: reuse the write-ahead
                        # delta (mandatory in the load->apply window)
                        staged.append(
                            {**rec, "seq": expected, "recompute": False}
                        )
                        continue
                    # same seq, DIFFERENT batch: a crashed attempt whose
                    # slice has since changed (queue growth). Whether its
                    # load committed is unknowable here, so neither the
                    # stale delta nor a fresh one is safe — full
                    # post-load recompute (see protocol comment above).
                    staged.append({**rec, "seq": expected, "recompute": True})
                    continue
                cast = F.col(rl["sum"]).cast("decimal(18,2)").alias("_rsum")
                before = b.target.table(self.spark, tgt_table).select(
                    *key_cols, *rl["group_by"], cast
                )
                bfinal = final.select(
                    *key_cols, *rl["group_by"], cast, ex.METHOD_COL
                )
                delta = mnt.rollup_delta(
                    before, bfinal, key_cols, rl["group_by"], "_rsum"
                )
                b.target.write(
                    delta.withColumn("_seq", F.lit(expected))
                    .withColumn("_fp_n", F.lit(fp[0]))
                    .withColumn("_fp_hash", F.lit(fp[1])),
                    stage_t,
                    mode="overwrite",
                )
                staged.append({**rec, "seq": expected, "recompute": False})
        return staged

    def _apply_rollups(self, b: BoundIteration, spec: IterationSpec, staged: list[dict]) -> None:
        from pyspark.sql import functions as F

        from migrator_spark.operators import maintenance as mnt
        from migrator_spark.pipeline.loaders import _PRUNABLE_KEY_TYPES
        from migrator_spark.sources.parquet import ParquetSource

        for srec in staged:
            rl, seq, tgt_table = srec["rollup"], srec["seq"], srec["table"]
            group_cols = rl["group_by"]
            data_t, stage_t = self._rollup_tables(tgt_table, rl["name"])
            if not srec["recompute"] and self._rollup_seq(b.target, data_t) >= seq:
                continue  # already applied; replay must not double-count
            out_cols = [
                *group_cols,
                F.col("sum_val").cast("decimal(28,2)").alias("sum_val"),
                F.col("n_rows").cast("long").alias("n_rows"),
            ]
            if srec["recompute"]:
                cast = F.col(rl["sum"]).cast("decimal(18,2)").alias("_rsum")
                new = mnt.compute_rollup(
                    b.target.table(self.spark, tgt_table).select(
                        *group_cols, cast
                    ),
                    group_cols,
                    "_rsum",
                ).select(*out_cols).withColumn("_seq", F.lit(seq))
                self._write_rollup_clustered(b, data_t, new, group_cols)
                continue
            delta = (
                b.target.table(self.spark, stage_t)
                .filter(F.col("_seq") == seq)
                .drop("_seq", "_fp_n", "_fp_hash")
            )
            lead = group_cols[0]
            prunable = isinstance(b.target, ParquetSource) and isinstance(
                b.target.table(self.spark, data_t).schema[lead].dataType,
                _PRUNABLE_KEY_TYPES,
            )
            if prunable:
                dkeys = delta.select(lead).cache()
                n_touched = dkeys.count()
                n_groups = b.target.table(self.spark, data_t).count()
                if (
                    # footer stats can't represent NULL keys, so a NULL
                    # group in the delta would miss its existing rollup
                    # row and double-insert — such batches full-rewrite
                    dkeys.filter(F.col(lead).isNull()).limit(1).count() > 0
                    # pruning pays only for key-LOCALIZED batches; see
                    # ROLLUP_PRUNE_MAX_TOUCHED
                    or n_touched > ROLLUP_PRUNE_MAX_TOUCHED * max(n_groups, 1)
                ):
                    prunable = False
                    dkeys.unpersist()
            if prunable:
                b.target.merge_pruned(
                    self.spark,
                    data_t,
                    dkeys,
                    lead,
                    lambda touched, d=delta, oc=out_cols, s=seq: (
                        mnt.apply_rollup_delta(
                            touched.drop("_seq"), d, group_cols
                        )
                        .select(*oc)
                        .withColumn("_seq", F.lit(s))
                    ),
                    cluster_cols=group_cols,
                )
                dkeys.unpersist()
                continue
            cur = b.target.table(self.spark, data_t).drop("_seq")
            new = (
                mnt.apply_rollup_delta(cur, delta, group_cols)
                .select(*out_cols)
                .withColumn("_seq", F.lit(seq))
            )
            b.target.write(new, data_t, mode="overwrite")

    def _write_rollup_clustered(
        self, b: BoundIteration, data_t: str, new, group_cols: list[str]
    ) -> None:
        """Recompute-path full write; for parquet sinks the table is
        RANGE-CLUSTERED on the group key so every later delta apply can
        file-prune (footer min/max of the leading group column)."""
        from pyspark.sql import functions as F

        from migrator_spark.sources.parquet import ParquetSource

        if not isinstance(b.target, ParquetSource):
            b.target.write(new, data_t, mode="overwrite")
            return
        new = new.cache()
        n_groups = new.count()
        files = max(1, min(32, -(-n_groups // ROLLUP_GROUPS_PER_FILE)))
        b.target.write(
            new.repartitionByRange(
                files, *[F.col(c) for c in group_cols]
            ).sortWithinPartitions(*group_cols),
            data_t,
            mode="overwrite",
        )
        new.unpersist()

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
