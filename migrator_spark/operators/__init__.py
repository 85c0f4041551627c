"""Operator library: pure ``DataFrame -> DataFrame`` functions.

extract    incremental scans E1-E4 (sequential / timestamp / coalesce /
           queue-drain + point-lookup join) — SURVEY.md §2.1
load       merge semantics L1-L3 (append / last-write-wins upsert /
           delete anti-join) — SURVEY.md §2.9
dedup      exact + MinHash-LSH + SimHash + n-gram Jaccard + embedding
           near-dup (training-data pipeline surface)
similarity brute-force & LSH-bucketed cosine top-k ANN
textops    language-id, quality scoring, token counting, fingerprinting,
           repetition signals
multimodal binary-column plumbing with stubbed decoders
skew       salted two-phase aggregation + salted replicate joins
bucketing  co-located (bucketed) tables: shuffle-free fact-fact joins
layout     Hive-partitioned writes (directory pruning), range-clustered
           and Z-order-clustered writes (parquet min/max file skipping,
           multi-dimensional for Z-order)
quality    declarative constraint audit (unique/fk/accepted/range/null)
           + bucketed replica checksums / source-vs-dest diff
mixture    temperature-flattened dataset mixture + epoch planning
packing    deterministic GPT-style sequence packing (hash-bucketed
           streams, per-bucket cumulative-token windows)
maintenance small-file compaction + incremental rollup upkeep
"""
