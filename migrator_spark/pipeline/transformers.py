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
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from migrator_spark.pipeline.registries import register_transformer


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
    fn = _resolve_callable(ctx.params.get("callable"))
    out = fn(batch, ctx)
    if isinstance(out, DataFrame):
        return [Routed(out, ctx.target_table)]
    return [o if isinstance(o, Routed) else Routed(o[0], o[1]) for o in out]
