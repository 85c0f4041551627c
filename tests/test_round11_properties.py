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


def test_bpe_encode_matches_classic_reference_with_unk(spark):
    """bpe_encode == the sequential reference id-for-id: vocab = train
    base chars + merge outputs densely numbered in binary order;
    held-out text containing characters the trainer never saw ('z',
    'q') encodes them as -1 unk; ids concatenate in (word, symbol)
    order across each document."""
    train_texts = ["aaa abab low lower ab ab", "newer new aaaa"]
    held_texts = [("d0", "ab lowz aaa"), ("d1", "qq unseen lower")]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    held = spark.createDataFrame(
        held_texts, "doc_id string, text string"
    )
    from migrator_spark.operators.textops import bpe_encode, bpe_vocab

    merges_df = bpe_train_merges(train, num_merges=6)
    vocab_df = bpe_vocab(train, merges_df)
    got = {
        r["doc_id"]: (r["n_tokens"], r["ids"])
        for r in bpe_encode(held, merges_df, vocab_df).collect()
    }

    ref_merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(merges_df.collect(), key=lambda r: r["merge_rank"])
    ]
    chars = set()
    for t in train_texts:
        for w in re.sub(r"\s+", " ", t.lower().strip()).split(" "):
            chars.update(w)
    vocab = {
        s: i + 1
        for i, s in enumerate(sorted(chars | {l + r for l, r in ref_merges}))
    }
    want = {}
    for doc_id, t in held_texts:
        ids = []
        for w in re.sub(r"\s+", " ", t.lower().strip()).split(" "):
            for s in _ref_tokenize(w, ref_merges):
                ids.append(vocab.get(s, -1))
        want[doc_id] = (len(ids), "|".join(map(str, ids)))
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
