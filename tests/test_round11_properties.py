"""Round-11 property pins: the BPE serving tokenizer against the
classic sequential Sennrich reference (application order extended from
round 10's trainer pin), incl. held-out/OOV words and run cases."""

from __future__ import annotations


import re

from migrator_spark.operators.textops import bpe_apply_merges, bpe_train_merges


def _ref_apply_one(syms: tuple, left: str, right: str) -> tuple:
    """One greedy left-to-right non-overlapping pass of (left, right)."""
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_tokenize(word: str, merges: list[tuple]) -> tuple:
    """Classic serving order: apply every learned merge in RANK order
    (lowest first), one full greedy pass each."""
    syms = tuple(word)
    for left, right in merges:
        syms = _ref_apply_one(syms, left, right)
    return syms


def test_bpe_apply_matches_classic_reference_on_holdout(spark):
    """bpe_apply_merges == the sequential reference, word for word and
    boundary for boundary, on HELD-OUT text the trainer never saw —
    including OOV symbols, run cases ('aaaa', 'aaab') where greedy
    non-overlap bites, and words no merge touches."""
    train_texts = [
        "aaa aaa abab low lower lowest low low",
        "newer newest new abab aaaa",
        "aaaa aaaa baa aab",
    ]
    held_texts = [
        "aaaa aaab lowly newly abba zzz qq",
        "lower aaaaaa ab a unseen",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    held = spark.createDataFrame(
        [(i, t) for i, t in enumerate(held_texts)], "doc_id long, text string"
    )
    merges_df = bpe_train_merges(train, num_merges=8)
    got = {
        r["w"]: (r["n_toks"], r["toks"])
        for r in bpe_apply_merges(held, merges_df).collect()
    }

    ref_merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(merges_df.collect(), key=lambda r: r["merge_rank"])
    ]
    held_words = set()
    for t in held_texts:
        held_words.update(re.sub(r"\s+", " ", t.lower().strip()).split(" "))
    want = {}
    for w in held_words:
        syms = _ref_tokenize(w, ref_merges)
        want[w] = (len(syms), "|".join(syms))
    assert got == want


def test_bpe_apply_rank_order_matters(spark):
    """The application ORDER contract is load-bearing: applying the
    learned merges in reverse rank order yields a different
    segmentation on a crafted word, so the pin above really does grade
    lowest-rank-first."""
    # train corpus: 'ab' dominates, then 'abc' (ab+c)
    train = spark.createDataFrame(
        [(0, "abc abc abc ab ab ab ab abd")], "doc_id long, text string"
    )
    merges_df = bpe_train_merges(train, num_merges=2)
    ranked = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(merges_df.collect(), key=lambda r: r["merge_rank"])
    ]
    assert ranked[0] == ("a", "b"), ranked  # sanity: ab learned first
    word = "abc"
    in_order = _ref_tokenize(word, ranked)
    reversed_order = _ref_tokenize(word, list(reversed(ranked)))
    assert in_order != reversed_order, (in_order, reversed_order)
    held = spark.createDataFrame([(0, word)], "doc_id long, text string")
    got = bpe_apply_merges(held, merges_df).collect()[0]
    assert got["toks"] == "|".join(in_order)
