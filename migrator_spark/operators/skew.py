"""Skew mitigation: salted two-phase aggregation and salted replicate
joins.

At 100 TB a handful of hot keys (one celebrity user, one default
enum value) can put 100 GB behind a single reducer while 999 others
idle. AQE's skew-join splitting (enabled in session.py) handles the
sort-merge-join case at runtime; these operators cover the two shapes
AQE does not re-plan:

* ``salted_agg`` — a grouped aggregation whose reduce side is dominated
  by hot keys. Phase 1 aggregates on (key, salt) — hot keys fan out to
  ``n`` reducers; phase 2 combines the ≤ n partials per key. Only
  algebraic aggregates (sum/count/min/max) decompose this way; avg is
  derived as sum/count at the end.
* ``salted_join`` — a shuffle equi-join where the BIG side is skewed on
  the join key and the small side is too large to broadcast outright:
  replicate each small-side row across all ``n`` salt values (×n
  blowup — bounded, choose n ~ executors) and give each big-side row
  one pseudo-random salt, so one hot key's rows spread over n reducers.

Both are semantically transparent (same result as the unsalted plan),
which is what makes them oracle-checkable: the DuckDB twin is the plain
GROUP BY / JOIN.

The reference runs single-process and never shuffles
(/root/reference/migrator.go — per-table goroutines, SURVEY.md §4
"Partitioning / shuffle: none"); this surface exists purely for the
100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"

# (partial_fn, final_fn) per algebraic aggregate: phase-1 per (key,salt),
# phase-2 combine across salts.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, n: int, from_cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic pseudo-random salt column in [0, n).

    Deterministic (hash of the named — default all — columns) rather
    than rand(): replays of the same batch salt identically, keeping
    retried stages idempotent under speculative execution.
    """
    src = [F.col(c) for c in (from_cols or df.columns)]
    return df.withColumn(SALT, F.pmod(F.abs(F.hash(*src)), F.lit(n)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation: ``aggs`` is [(col, fn, alias)] with
    fn ∈ {sum, count, min, max, avg}. Result equals
    ``df.groupBy(keys).agg(...)`` exactly (decimal/long math; for
    doubles, up to float reassociation).
    """
    partials: list[Column] = []
    finals: list[Column] = []
    derived: list[Column] = []
    for i, (col, fn, alias) in enumerate(aggs):
        if fn == "avg":
            # decompose: avg = sum/count, combined after phase 2
            partials += [F.sum(col).alias(f"_p{i}s"), F.count(col).alias(f"_p{i}c")]
            finals += [F.sum(f"_p{i}s").alias(f"_f{i}s"), F.sum(f"_p{i}c").alias(f"_f{i}c")]
            derived.append((F.col(f"_f{i}s") / F.col(f"_f{i}c")).alias(alias))
            continue
        part, fin = _ALGEBRAIC[fn]
        partials.append(part(col).alias(f"_p{i}"))
        finals.append(fin(f"_p{i}").alias(alias))
        derived.append(F.col(alias))
    return (
        with_salt(df, n)
        .groupBy(*keys, SALT)
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
        .select(*keys, *derived)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, explode the small
    side over all n salts, join on keys + salt. Supports inner/left
    (semantics preserved: each big row matches exactly the rows it
    would have matched unsalted, under exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = with_salt(big, n, from_cols=big.columns)
    small_s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    return big_s.join(small_s, [*on, SALT], how).drop(SALT)
