#!/usr/bin/env python
"""Batch DSIR curation: fit the hashed-n-gram importance model on a
corpus, score every document against a target domain, select the best
token budget's worth, and pack the selection into fixed-length
training sequences — the classic offline "make my pool look like the
target" recipe as four public-API calls.

    python examples/dsir_curation.py CORPUS_DIR OUT_DIR \
        [--target-lang en] [--budget 6000] [--seq-len 128]

CORPUS_DIR is a driver-layout directory holding documents.parquet
(doc_id long, text string, lang string, source string, n_chars long).
OUT_DIR receives two parquet tables: selected/ (doc_id,
logratio_micro, n_tokens) and packed/ (the sequence manifest). The
model table itself is the checkpointed artifact dsir_bucket_model
returns — persist it and the same scores apply to any later frame,
including streaming micro-batches (see
tests/test_streaming.py::test_dsir_stream_scoring_matches_batch).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from migrator_spark.functions.hashing import words  # noqa: E402
from migrator_spark.operators.mixture import (  # noqa: E402
    dsir_bucket_model,
    dsir_score,
    select_token_budget,
)
from migrator_spark.operators.packing import pack_sequences  # noqa: E402
from migrator_spark.session import get_spark  # noqa: E402
from migrator_spark.tables import load_table  # noqa: E402


def run(
    spark,
    corpus_dir: str,
    out_dir: str,
    target_lang: str = "en",
    budget: int = 6000,
    seq_len: int = 128,
    n_buckets: int = 1024,
):
    docs = load_table(spark, corpus_dir, "documents")
    model = dsir_bucket_model(
        docs, target=F.col("lang") == target_lang, n_buckets=n_buckets
    )
    scored = docs.select("doc_id", F.size(words("text")).alias("n_tokens")).join(
        dsir_score(docs, model, n_buckets=n_buckets).select(
            "doc_id", "logratio_micro"
        ),
        "doc_id",
    )
    selected = select_token_budget(
        scored, budget, score_col="logratio_micro", tokens_col="n_tokens"
    )
    selected.write.mode("overwrite").parquet(f"{out_dir}/selected")
    kept_docs = docs.join(
        spark.read.parquet(f"{out_dir}/selected").select("doc_id"), "doc_id"
    )
    packed = pack_sequences(kept_docs.select("doc_id", "text"), seq_len)
    packed.write.mode("overwrite").parquet(f"{out_dir}/packed")
    return selected, packed


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    corpus_dir, out_dir = sys.argv[1:3]
    kw = {}
    argv = sys.argv[3:]
    for flag, key, cast in (
        ("--target-lang", "target_lang", str),
        ("--budget", "budget", int),
        ("--seq-len", "seq_len", int),
    ):
        if flag in argv:
            kw[key] = cast(argv[argv.index(flag) + 1])
    spark = get_spark("dsir-curation")
    selected, packed = run(spark, corpus_dir, out_dir, **kw)
    n_sel = spark.read.parquet(f"{out_dir}/selected").count()
    n_seq = spark.read.parquet(f"{out_dir}/packed").count()
    print(f"selected {n_sel} docs into {n_seq} packed rows under {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
