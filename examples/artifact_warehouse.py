#!/usr/bin/env python
"""Offline artifact warehouse: build the shared derived artifacts for
a corpus snapshot ONCE, then serve later sessions from the store — the
deployment pattern a recurring 100 TB crawl refresh uses, where the
shingle postings index, the verified near-dup pair graph, and the
vector quantizer are snapshot products, not per-job recomputations.

    # snapshot build job (once per crawl):
    python examples/artifact_warehouse.py build CORPUS_DIR STORE_DIR

    # any later analysis session (fresh process, fresh catalog):
    python examples/artifact_warehouse.py serve CORPUS_DIR STORE_DIR

CORPUS_DIR is a driver-layout directory holding documents.parquet.
`build` publishes three artifacts under STORE_DIR:

  * shingle_index.v<N>/ — the (doc_id, lang, source, sz, s) 2-gram
    postings, BUCKETED BY s so every downstream (block, s) self-join
    is exchange-free; the JSON sidecar names the committed version and
    is swapped atomically, so a re-build is safe under live readers
    (a reader sees the old or the new snapshot, never a torn table).
  * tables/minhash_pair_graph — the exact-verified MinHash-LSH
    near-dup pair relation, published through the OCC commit log
    (multi-writer safe, versioned).

`serve` then opens the store from a FRESH session — the bucketed
index re-registers from the sidecar alone, the pair graph resolves
from the commit log alone — and runs two consumers against the
warm-read artifacts: dd12-style containment pairs and dd6-style
duplicate clusters. The same seam is wired into the query registry:
set SPARK_GRAFT_ARTIFACT_ROOT and plans/llmdata's shared caches read
the store instead of rebuilding (bit-identical outputs; pinned in
tests/test_round9_artifacts.py and graded by the art1/art2 registry
rows).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from migrator_spark.operators import dedup as dd  # noqa: E402
from migrator_spark.session import get_spark  # noqa: E402
from migrator_spark.sources.artifacts import ArtifactStore  # noqa: E402
from migrator_spark.tables import load_table  # noqa: E402

MINHASH_NUM, MINHASH_BANDS, MINHASH_THRESH = 12, 4, 0.3
CONTAIN_THRESH = 0.4


def build(corpus_dir: str, store_dir: str) -> None:
    spark = get_spark("artifact-build")
    docs = load_table(spark, corpus_dir, "documents")
    store = ArtifactStore(store_dir)
    store.write_shingle_index(dd.shingle_index(docs, attrs=["lang", "source"]))
    store.write_pair_graph(
        dd.minhash_lsh_pairs(
            docs,
            num_hashes=MINHASH_NUM,
            bands=MINHASH_BANDS,
            threshold=MINHASH_THRESH,
        )
    )
    print(
        "built:",
        f"shingle index v{store.shingle_index_version()},",
        "pair graph committed",
    )


def serve(corpus_dir: str, store_dir: str) -> None:
    spark = get_spark("artifact-serve")
    docs = load_table(spark, corpus_dir, "documents")
    store = ArtifactStore(store_dir)  # fresh handle: disk is the truth
    idx = store.read_shingle_index(spark)  # sidecar re-registration
    pairs = store.read_pair_graph(spark)  # commit-log resolve
    contain = dd.containment_pairs(
        docs, block_cols=["lang"], threshold=CONTAIN_THRESH, index=idx
    )
    clusters = dd.duplicate_clusters(pairs)
    print("containment pairs:", contain.count())
    print("duplicate clusters:", clusters.select("cluster_id").distinct().count())


def main() -> None:
    if len(sys.argv) != 4 or sys.argv[1] not in ("build", "serve"):
        print(__doc__)
        raise SystemExit(2)
    {"build": build, "serve": serve}[sys.argv[1]](sys.argv[2], sys.argv[3])


if __name__ == "__main__":
    main()
