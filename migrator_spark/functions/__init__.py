"""Scalar-function helpers, all JVM-side Column expressions.

Everything here compiles to built-in Catalyst expressions (whole-stage
codegen, no Python in the hot path) AND has a documented DuckDB-SQL
twin so differential oracles stay exact.
"""

from migrator_spark.functions.hashing import stable_hash64, word_shingles, words
from migrator_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "stable_hash64",
    "word_shingles",
    "words",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
