"""Property tests for the post-soak round-4 operators (fts2 / ch1 /
cur5): invariants the fixed oracle corpus can't express — BM25's
rank-ordering behavior vs term rarity and document length, chunk
coverage/overlap tiling, and budget-selection maximality."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrator_spark.operators.mixture import select_token_budget
from migrator_spark.operators.textops import bm25_search, chunk_overlap


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_prefers_rare_terms_and_shorter_docs(spark):
    # 'rare' appears in one doc, 'common' in all; BM25 must rank the
    # rare-term doc first for the query [rare, common]. And between two
    # docs with identical tf, the shorter one scores higher (the b·dl
    # length normalization that plain TF-IDF lacks).
    docs = _docs(
        spark,
        [
            "common rare alpha beta",
            "common alpha beta gamma delta",
            "common alpha beta",
            "common " + " ".join(f"pad{i}" for i in range(30)),
        ],
    )
    rows = bm25_search(docs, ["rare", "common"], k=4).collect()
    assert rows[0]["doc_id"] == 0  # the only rare-term doc wins
    # doc 2 (3 words, tf(common)=1) must outscore doc 3 (31 words,
    # tf(common)=1): same tf, shorter document
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[2] > scores[3]


def test_bm25_tf_saturates_sublinearly(spark):
    # k1 bounds the tf contribution: tf 1 -> 2 gains more than 9 -> 10.
    # Equal-length docs isolate the tf leg (pads are per-doc unique).
    def doc(n_q, i):
        return " ".join(["q"] * n_q + [f"p{i}_{j}" for j in range(12 - n_q)])

    docs = _docs(spark, [doc(1, 0), doc(2, 1), doc(9, 2), doc(10, 3)])
    s = {r["doc_id"]: r["score"] for r in bm25_search(docs, ["q"], k=4).collect()}
    assert s[1] > s[0] and s[3] > s[2]  # monotone in tf
    assert (s[1] - s[0]) > (s[3] - s[2])  # diminishing returns


def test_chunk_overlap_tiles_and_reaches_last_word(spark):
    # Every chunk starts exactly stride words after the previous; the
    # final chunk contains the document's last word; consecutive chunks
    # share exactly window-stride words; short docs yield one chunk.
    texts = {
        1: " ".join(f"w{i}" for i in range(1)),
        5: " ".join(f"w{i}" for i in range(5)),
        6: " ".join(f"w{i}" for i in range(6)),
        17: " ".join(f"w{i}" for i in range(17)),
        40: " ".join(f"w{i}" for i in range(40)),
    }
    docs = spark.createDataFrame(
        [(n, t) for n, t in texts.items()], "doc_id long, text string"
    )
    out = chunk_overlap(docs, window=6, stride=4).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rs] == list(range(len(rs)))
        # chunk c covers words [c*stride, c*stride + n_words)
        last = rs[-1]
        assert last["chunk_id"] * 4 + last["n_words"] == n  # reaches the end
        for r in rs[:-1]:
            assert r["n_words"] == 6  # all non-final chunks are full
        if n <= 6:
            assert len(rs) == 1
        for a, b in zip(rs, rs[1:]):
            # overlap of window-stride words, verified on the text
            assert a["chunk"].split()[4:] == b["chunk"].split()[:2]


def test_select_token_budget_is_maximal_prefix(spark):
    # The kept set is exactly the docs whose running (score DESC, id)
    # token cumsum fits; it is maximal: adding the first excluded doc
    # in rank order would exceed the budget.
    rows = [(i, (7 * i + 3) % 5, 10 + (i * 13) % 25) for i in range(40)]
    scored = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
    budget = 300
    kept = select_token_budget(scored, budget).collect()
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, expect = 0, []
    for i, s, t in ranked:
        cum += t
        if cum <= budget:
            expect.append((i, s, t))
    assert sorted((r["doc_id"], r["score"], r["n_tokens"]) for r in kept) == sorted(
        expect
    )
    total = sum(t for _, _, t in expect)
    assert total <= budget
    # maximality: the next-ranked doc would not fit
    if len(expect) < len(ranked):
        nxt = ranked[len(expect)]
        assert total + nxt[2] > budget


def test_select_token_budget_double_scores_survive(spark):
    # ADVICE r4 #1: the reported score must come back in the input
    # column's dtype — double-valued quality scores (the typical input
    # for quality-ranked selection) must not be truncated to long.
    rows = [(1, 0.9, 50), (2, 0.75, 60), (3, 0.7, 40), (4, 0.1, 30)]
    scored = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    out = select_token_budget(scored, 150)
    assert dict(out.dtypes)["score"] == "double"
    got = sorted((r["doc_id"], r["score"], r["n_tokens"]) for r in out.collect())
    # rank order 0.9, 0.75, 0.7, 0.1 -> cumsum 50, 110, 150, (180)
    assert got == [(1, 0.9, 50), (2, 0.75, 60), (3, 0.7, 40)]


def test_select_token_budget_edge_budgets(spark):
    scored = spark.createDataFrame(
        [(1, 2, 50), (2, 1, 60)], "doc_id long, score long, n_tokens long"
    )
    assert select_token_budget(scored, 0).count() == 0
    assert select_token_budget(scored, 49).count() == 0  # best doc too big
    assert select_token_budget(scored, 1_000_000).count() == 2  # all fit


def test_fts3_ranks_term_dense_passage_first(spark):
    # one doc hides a query-term-dense span deep inside filler; passage
    # retrieval must surface THAT chunk, not chunk 0 of any doc
    filler = " ".join(f"f{i}" for i in range(60))
    hot = " ".join(["needle haystack"] * 5)
    docs = spark.createDataFrame(
        [(0, f"{filler} {hot} {filler}"), (1, filler), (2, filler)],
        "doc_id long, text string",
    )
    from migrator_spark.operators.textops import bm25_search, chunk_overlap

    chunks = chunk_overlap(docs, window=10, stride=10)
    top = bm25_search(
        chunks, ["needle"], k=1, id_col="doc_id", text_col="chunk",
        extra_id_cols=("chunk_id",),
    ).collect()[0]
    assert top["doc_id"] == 0 and top["chunk_id"] == 6  # the hot span


def test_source_dup_report_counts(spark):
    # src a: 3 docs, one within-source dup pair; its 'shared' content
    # also lives in src b (cross-source for BOTH sides); src b adds a
    # unique doc. Hand-checked expectations per source.
    from migrator_spark.operators.dedup import source_dup_report

    docs = spark.createDataFrame(
        [
            (0, "a", "shared text"),
            (1, "a", "shared text"),   # within-a duplicate of 0
            (2, "a", "only in a"),
            (3, "b", "shared text"),   # cross-source copy
            (4, "b", "only in b"),
        ],
        "doc_id long, source string, text string",
    )
    rep = {r["source"]: r for r in source_dup_report(docs).collect()}
    a, b = rep["a"], rep["b"]
    assert (a["n_docs"], a["n_unique_texts"], a["n_dup_copies"]) == (3, 2, 1)
    assert a["n_cross_source_docs"] == 2  # doc 0 and 1 both leak to b
    assert (b["n_docs"], b["n_unique_texts"], b["n_dup_copies"]) == (2, 2, 0)
    assert b["n_cross_source_docs"] == 1


def test_line_filter_c4_rules(spark):
    # C4-style line cleaning: prose lines survive (>=3 words, terminal
    # punctuation), nav/code fragments go; docs with zero surviving
    # lines drop entirely. One map stage — verified on constructed
    # multi-line docs (the driver corpus is single-line by design).
    from migrator_spark.operators.textops import line_filter

    docs = spark.createDataFrame(
        [
            (
                1,
                "This is a good sentence.\n"
                "Home | About | Contact\n"
                "Another fine line stands here!\n"
                "if (x) { return; }\n"
                'He said "stop".',
            ),
            (2, "ok.\nmenu\nfooter"),  # nothing survives -> doc dropped
            (3, "Short tail?\nA perfectly normal third line."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_filter(docs).collect()}
    assert set(out) == {1, 3}
    assert out[1]["clean_text"] == (
        "This is a good sentence.\n"
        "Another fine line stands here!\n"
        'He said "stop".'
    )
    assert (out[1]["n_lines_kept"], out[1]["n_lines_total"]) == (3, 5)
    # doc 3: "Short tail?" has only 2 words -> dropped; second line kept
    assert out[3]["clean_text"] == "A perfectly normal third line."
    assert (out[3]["n_lines_kept"], out[3]["n_lines_total"]) == (1, 2)


def test_line_filter_is_shuffle_free(spark):
    from migrator_spark.operators.textops import line_filter

    docs = spark.createDataFrame([(1, "A b c.\nx")], "doc_id long, text string")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = line_filter(docs)._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan, plan
