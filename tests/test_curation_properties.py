"""Property tests for the round-3 curation operators: semantic
invariants the per-query oracles can't express (they check one corpus;
these check the contracts on constructed adversarial inputs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from migrator_spark.operators.dedup import decontaminate
from migrator_spark.operators.mixture import mixture_plan
from migrator_spark.operators.similarity import (
    cosine_topk,
    hyperplane_lsh_topk,
)
from migrator_spark.operators.textops import bigram_logprob_score

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

DOC_SCHEMA = "doc_id long, text string"


def test_decontaminate_flags_planted_ngram_and_only_that(spark):
    # doc 10 contains benchmark doc 0's exact 3-gram; doc 11 shares no
    # 3-gram (different word order); doc 0 itself must never be output
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),                 # benchmark
            (10, "noise alpha beta gamma more noise"),     # contaminated
            (11, "gamma beta alpha delta epsilon"),        # same words, no 3-gram
        ],
        DOC_SCHEMA,
    )
    bench = docs.filter(F.col("doc_id") == 0).select("doc_id")
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, shingle_k=3).collect()}
    assert set(got) == {10}
    # doc 10's shingles: [noise alpha beta, alpha beta gamma, beta gamma
    # more, gamma more noise] -> exactly one of benchmark's
    # {alpha beta gamma, beta gamma delta}
    assert got[10]["n_hits"] == 1


def test_decontaminate_exact_hit_count(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),              # benchmark: shingles abc bcd cde
            (10, "x a b c d y"),           # hits: abc bcd
        ],
        DOC_SCHEMA,
    )
    bench = docs.filter(F.col("doc_id") == 0).select("doc_id")
    (row,) = decontaminate(docs, bench, shingle_k=3).collect()
    assert row["doc_id"] == 10
    assert row["n_shingles"] == 4  # xab abc bcd cdy
    assert row["n_hits"] == 2
    assert abs(row["contaminated_frac"] - 0.5) < 1e-12


@SETTINGS
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=2, max_size=5),
)
def test_mixture_plan_invariants(spark, sizes):
    # docs of `n` repeated words per source s{i}
    rows = [
        (i * 1000 + j, f"s{i}", "w " * n)
        for i, n in enumerate(sizes)
        for j in range(1)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {r["source"]: r for r in mixture_plan(docs, alpha=0.5).collect()}
    assert len(plan) == len(sizes)
    # weights form a distribution; shares form a distribution
    assert abs(sum(r["mix_weight"] for r in plan.values()) - 1.0) < 1e-9
    assert abs(sum(r["token_share"] for r in plan.values()) - 1.0) < 1e-9
    # temperature flattening: rate is anti-monotone in source size
    # (smaller sources get upsampled relative to bigger ones)
    by_tokens = sorted(plan.values(), key=lambda r: (r["tokens"], r["source"]))
    for a, b in zip(by_tokens, by_tokens[1:]):
        if a["tokens"] < b["tokens"]:
            assert a["sample_rate"] > b["sample_rate"]
    # expected output tokens = total input tokens (rate * share sums to 1
    # over the weight distribution): sum(rate_s * tokens_s) == total
    total = sum(r["tokens"] for r in plan.values())
    realized = sum(r["sample_rate"] * r["tokens"] for r in plan.values())
    assert abs(realized - total) / total < 1e-9


def test_mixture_alpha_one_is_natural_distribution(spark):
    docs = spark.createDataFrame(
        [(1, "a", "w w w"), (2, "b", "w")], "doc_id long, source string, text string"
    )
    for r in mixture_plan(docs, alpha=1.0).collect():
        assert abs(r["sample_rate"] - 1.0) < 1e-9
        assert abs(r["mix_weight"] - r["token_share"]) < 1e-9


def test_bigram_score_prefers_corpus_like_text(spark):
    # 20 copies of the same sentence + 1 doc of that sentence + 1 doc of
    # never-seen bigrams: the in-distribution doc must score strictly
    # lower (more LM-like) than the gibberish doc
    common = "the quick brown fox jumps"
    rows = [(i, common) for i in range(20)]
    rows.append((100, common))
    rows.append((200, "zeta omicron upsilon sigma rho"))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r["avg_neg_logprob"] for r in bigram_logprob_score(docs).collect()}
    assert got[100] < got[200]
    # n_bigrams = words - 1 for multi-word docs
    nb = {r["doc_id"]: r["n_bigrams"] for r in bigram_logprob_score(docs).collect()}
    assert nb[100] == 4 and nb[200] == 4


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-3, max_value=3).map(float), min_size=4, max_size=4
        ).filter(lambda v: any(x != 0.0 for x in v)),
        min_size=2,
        max_size=15,
    )
)
def test_hyperplane_lsh_scores_are_exact_and_subset(spark, vecs):
    # every returned neighbor's score must equal the brute-force cosine
    # (LSH prunes candidates, never perturbs scores), and the result set
    # is a subset of the corpus
    rows = [(i + 1, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = spark.createDataFrame([(vecs[0],)], "qe array<double>")
    got = hyperplane_lsh_topk(emb, query, bits=8, bands=4, k=5, dim=4).collect()
    exact = {
        r["vec_id"]: r["cos_sim"] for r in cosine_topk(emb, query, k=len(vecs)).collect()
    }
    for r in got:
        assert r["vec_id"] in exact
        assert r["cos_sim"] == exact[r["vec_id"]]
    # vec 1 IS the query vector: identical sign bits -> always a candidate
    assert any(r["vec_id"] == 1 for r in got)
