"""Cross-engine-stable hashing and shingling.

Spark's native ``hash``/``xxhash64`` are not reproducible in other
engines, so differential testing (and any cross-system dedup contract)
needs a hash both Spark and DuckDB compute bit-identically. We use the
top 60 bits of MD5 interpreted as a non-negative int64:

    Spark :  conv(substring(md5(s), 1, 15), 16, 10)  cast long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex digits = 60 bits < 2^63, so the cast never overflows and the
value is always >= 0. MD5 here is a content fingerprint, not security.

All functions return Column expressions evaluated JVM-side (codegen);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matching DuckDB SQL fragment templates (format with the column expr):
DUCKDB_STABLE_HASH64 = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
DUCKDB_WORDS = "string_split_regex(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')), ' ')"


def stable_hash64(col: Column | str) -> Column:
    """60-bit non-negative int64 content hash, identical in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def words(col: Column | str) -> Column:
    """Lowercased whitespace-tokenized word array.

    Normalizes runs of whitespace and trims so Spark's ``split`` and
    DuckDB's ``string_split_regex`` produce identical arrays (no empty
    leading/trailing tokens).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined), order-preserving.

    Built from the words array with ``transform`` + ``slice`` — pure
    Catalyst, no Python. Documents shorter than k words yield a single
    shingle of all their words (never an empty array for non-empty text),
    matching the DuckDB oracle construction in plans/oracles.
    """
    w = words(col)
    # k-1 chained zip_withs over shifted slices instead of
    # transform(sequence, i -> array_join(slice(w, i, k))): the latter's
    # per-element slice+join runs interpreted (HOF lambdas skip
    # whole-stage codegen) — measured ~11x slower at sf0.1. zip_with's
    # per-element work is a single concat.
    m = F.size(w) - F.lit(k - 1)
    cur = F.slice(w, 1, m)
    for j in range(1, k):
        cur = F.zip_with(
            cur, F.slice(w, 1 + j, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    # short docs (< k words): one shingle of all words, never empty
    return F.when(F.size(w) < F.lit(k), F.array(F.array_join(w, " "))).otherwise(cur)


# Mersenne prime 2^31 - 1: the affine-permutation modulus. With the
# base hash reduced mod P, a*h + b stays < 2^62 — inside int64 in both
# Spark (wrapping longs never wrap here) and DuckDB (which would RAISE
# on BIGINT overflow). Same family as Spark MLlib's MinHashLSH.
MINHASH_P = 2_147_483_647


def minhash_perm_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the affine minhash
    permutations h_i(x) = (a_i * x + b_i) mod P, a_i != 0.

    Derived from md5 so any engine (or a reviewer) can reproduce them;
    they are baked into the DuckDB oracles as integer literals.
    """
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        (h60(f"a{i}") % (MINHASH_P - 1) + 1, h60(f"b{i}") % MINHASH_P)
        for i in range(num_hashes)
    ]


# (The minhash signature itself is built in operators/dedup._lsh_state
# over the exploded token relation — a per-row array-building variant
# here would be a second copy of the permutation logic to keep in sync,
# and the flat explode shape is the one that survives codegen.)
