"""Named transformers (reference registry keys preserved).

Contract — the Spark form of types.go:86-88 (Transformer returns
[]TableData, i.e. one input batch may FAN OUT to several destination
tables)::

    transform(batch, ctx) -> list[Routed(df, target_table)]

* "default"      — identity routing (transformer_default.go:8-21)
* "tablerenamer" — destination table overridden by the TableName
                   parameter (transformer_tablerenamer.go:9-33)
* "python"       — arbitrary user code over the batch: the reference's
                   JS transformer (transformer_js.go) is an
                   unimplemented stub; here it is first-class — any
                   callable (dotted path or direct) mapping
                   DataFrame -> DataFrame | list[Routed]. Heavy
                   per-row logic should use pandas_udf/mapInPandas
                   inside the callable (Arrow-batched, not row-at-a-time).
"""

from __future__ import annotations

import importlib
import threading
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from migrator_spark.pipeline.registries import register_transformer

# Wall-clock bound on user transform code, matching the reference's JS
# VM interrupt timeout (transformer_js.go:26, default 5s). Override per
# iteration with transformer-parameters: {timeout: <seconds>}; 0 or
# negative disables.
DEFAULT_TRANSFORM_TIMEOUT = 5.0


class TransformTimeout(Exception):
    """User transform exceeded its wall-clock budget; the batch aborts,
    the runner surfaces the error callback, and offsets stay put so the
    batch replays (runner commit-after-load ordering)."""


# CPython can't kill a thread, so a timed-out transform leaves its
# worker thread running until the user code returns. The runner's
# replay backoff + max_replays bounds how often that happens; this cap
# is the defense-in-depth backstop — once this many abandoned threads
# are still alive, new timed calls fail fast instead of stacking more.
# Scope notes: the cap is process-GLOBAL (abandoned threads are a
# process resource), so one iteration's runaway makes other iterations'
# timed transforms fail fast too — with the default retry-forever
# replay policy they stall and recover once the runaways return, they
# are not killed. The entry check races the timeout increment, so the
# live count can overshoot by at most the number of concurrently-timed
# calls (one per iteration thread) — a bounded overshoot, accepted to
# keep the common path to one short critical section.
ABANDONED_THREAD_CAP = 8
_abandoned_count = 0
_abandoned_guard = threading.Lock()


def _call_with_timeout(fn: Callable, args: tuple, timeout: float):
    """Run ``fn(*args)`` bounded by ``timeout`` seconds.

    The reference interrupts its JS VM (transformer_js.go:26); CPython
    cannot safely kill a thread, so on timeout the worker thread is
    abandoned (daemon, counted against ABANDONED_THREAD_CAP) and the
    batch fails — same pipeline-visible semantics (batch aborted, offset
    not committed), with the residual difference that runaway user code
    keeps a thread until it returns.
    """
    global _abandoned_count
    if not timeout or timeout <= 0:
        return fn(*args)
    with _abandoned_guard:
        if _abandoned_count >= ABANDONED_THREAD_CAP:
            raise TransformTimeout(
                f"{_abandoned_count} earlier timed-out transformer threads are "
                "still running; failing fast instead of spawning more "
                "(raise the transform timeout or fix the transform)"
            )
    result: list = []
    err: list[BaseException] = []
    state = {"abandoned": False, "finished": False}

    def run() -> None:
        global _abandoned_count
        try:
            result.append(fn(*args))
        except BaseException as e:  # noqa: BLE001 - re-raised in caller
            err.append(e)
        finally:
            with _abandoned_guard:
                state["finished"] = True
                if state["abandoned"]:
                    _abandoned_count -= 1

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    with _abandoned_guard:
        if not state["finished"]:
            # worker still inside user code: abandon it (it decrements
            # the counter whenever it eventually returns)
            state["abandoned"] = True
            _abandoned_count += 1
            raise TransformTimeout(
                f"python transformer exceeded {timeout}s wall-clock budget"
            )
    if err:
        raise err[0]
    return result[0]


@dataclass
class TransformContext:
    source_table: str
    target_table: str
    params: dict[str, Any]


@dataclass
class Routed:
    df: DataFrame
    target_table: str


@register_transformer("default")
def transform_default(batch: DataFrame, ctx: TransformContext) -> list[Routed]:
    return [Routed(batch, ctx.target_table)]


@register_transformer("tablerenamer")
def transform_tablerenamer(batch: DataFrame, ctx: TransformContext) -> list[Routed]:
    name = ctx.params.get("TableName") or ctx.target_table
    return [Routed(batch, name)]


def _resolve_callable(spec: Any) -> Callable:
    if callable(spec):
        return spec
    mod, _, attr = str(spec).rpartition(".")
    if not mod:
        raise ValueError(f"python transformer needs a dotted path or callable, got {spec!r}")
    return getattr(importlib.import_module(mod), attr)


@register_transformer("python")
def transform_python(batch: DataFrame, ctx: TransformContext) -> list[Routed]:
    """User-code transformer with the reference's wall-clock budget
    (transformer_js.go:26, default 5 s). The budget covers the user
    callable itself — normally lazy plan construction, well under 5 s.
    A transform that runs Spark ACTIONS (collect/count) can legitimately
    exceed it and would replay forever; set ``timeout`` in
    transformer-parameters for such transforms (0 disables)."""
    fn = _resolve_callable(ctx.params.get("callable"))
    timeout = float(ctx.params.get("timeout", DEFAULT_TRANSFORM_TIMEOUT))
    if timeout <= 0:
        out = fn(batch, ctx)
    else:
        out = _call_with_timeout(fn, (batch, ctx), timeout)
    if isinstance(out, DataFrame):
        return [Routed(out, ctx.target_table)]
    return [o if isinstance(o, Routed) else Routed(o[0], o[1]) for o in out]
