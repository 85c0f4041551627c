"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``) —
JVM-side, codegen-friendly, no Python in the hot path. Elements are
cast to double before accumulating and folds run in index order, so the
result is deterministic and reproducible in the DuckDB oracle
(``list_dot_product`` on DOUBLE[] lists).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """``dot`` with the fold unrolled to an explicit left-associated
    sum of element products — the SAME accumulation order as the HOF
    fold (and DuckDB's list_dot_product), so values are bit-identical,
    but the expression stays inside whole-stage codegen. Use in hot
    PAIR loops (candidate verification over millions of pairs) where
    the interpreted lambda dominates; requires the dimension, which
    vector datasets fix by schema."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    acc = a.getItem(0).cast("double") * b.getItem(0).cast("double")
    for i in range(1, dim):
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc
