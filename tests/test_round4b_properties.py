"""Property tests for the late-round-4 operators: invariants the fixed
oracle corpus can't express — packing covers every token exactly once,
the replica checksum is order/partitioning-invariant yet detects a
single changed row in the right bucket, the as-of snapshot agrees with
the SCD2 history it shortcuts, and transition probabilities are a
proper distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrator_spark.operators.packing import pack_sequences
from migrator_spark.operators.quality import replica_checksum


def test_pack_sequences_partitions_the_stream(spark):
    """Every doc appears once; within each bucket the offsets tile the
    concatenated stream with no gaps or overlaps; chunk assignment is
    consistent with the offsets."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(3 + i % 7))) for i in range(60)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, token_budget=10, n_buckets=4).collect()
    assert len(rows) == 60 and len({r["doc_id"] for r in rows}) == 60
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) <= set(range(4))
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r["start_offset"])
        pos = 0
        for r in rs:
            assert r["start_offset"] == pos  # contiguous, no gaps
            assert r["chunk_id"] == pos // 10
            end = pos + r["n_tokens"] - 1
            assert r["crosses_chunk"] == (end // 10 > pos // 10)
            pos += r["n_tokens"]


def test_pack_sequences_deterministic_under_repartition(spark):
    """The assignment is a pure function of doc ids — shuffling the
    input partitioning must not move a single document."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, 16, n_buckets=4).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(13), 16, n_buckets=4).collect())
    )
    assert a == b


def test_replica_checksum_order_invariant_and_localizes_change(spark):
    """Checksums of the same rows under different partitionings are
    identical; mutating ONE row flips exactly that row's bucket."""
    rows = [(i, f"name_{i}", i * 10) for i in range(100)]
    schema = "id long, name string, amount long"
    src = spark.createDataFrame(rows, schema)
    cols = [F.col("id").cast("string"), "name", F.col("amount").cast("string")]
    base = {
        r["bucket"]: (r["n_rows"], r["xor_hash"])
        for r in replica_checksum(src, "id", cols, n_buckets=8).collect()
    }
    shuffled = {
        r["bucket"]: (r["n_rows"], r["xor_hash"])
        for r in replica_checksum(
            spark.createDataFrame(rows[::-1], schema).repartition(7),
            "id",
            cols,
            n_buckets=8,
        ).collect()
    }
    assert base == shuffled
    mutated = [(i, f"name_{i}", i * 10 if i != 42 else 999) for i in range(100)]
    diff = {
        r["bucket"]: (r["n_rows"], r["xor_hash"])
        for r in replica_checksum(
            spark.createDataFrame(mutated, schema), "id", cols, n_buckets=8
        ).collect()
    }
    changed = {b for b in base if base[b] != diff[b]}
    assert changed == {_key_bucket(42, 8)}
    assert all(base[b][0] == diff[b][0] for b in base)  # counts unchanged


def _key_bucket(key, n_buckets: int) -> int:
    """Mirror of replica_checksum's hash bucketing (60-bit md5 mod n)."""
    import hashlib

    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % n_buckets


def test_replica_checksum_null_and_string_keys(spark):
    """NULL keys land in bucket -1 and string keys bucket like their
    text — identical replicas diff empty even with NULLable/non-numeric
    key columns (the CLI's arbitrary-KEY_COL contract)."""
    from migrator_spark.operators.quality import checksum_diff

    rows = [("u1", "a"), ("u2", "b"), (None, "c"), (None, "d")]
    schema = "uid string, val string"
    src = spark.createDataFrame(rows, schema)
    dst = spark.createDataFrame(rows[::-1], schema).repartition(3)
    cols = ["uid", "val"]
    assert checksum_diff(src, dst, "uid", cols, n_buckets=4).count() == 0
    by_bucket = {
        r["bucket"]: r["n_rows"]
        for r in replica_checksum(src, "uid", cols, n_buckets=4).collect()
    }
    assert by_bucket[-1] == 2  # both NULL-keyed rows, one bucket


def test_asof_snapshot_agrees_with_scd2_history(spark, sf_dir):
    """fo3 (direct as-of read) must equal fo2's SCD2 history evaluated
    at the same instant: the interval containing T per user, with
    version_no = that interval's version."""
    from migrator_spark.plans.analytics import (
        FO3_ASOF_US,
        fo2_scd2_history,
        fo3_asof_snapshot,
    )

    snap = {
        r["user_id"]: (r["state"], r["as_of_us"], r["version_no"])
        for r in fo3_asof_snapshot(spark, sf_dir).collect()
    }
    hist = (
        fo2_scd2_history(spark, sf_dir)
        .filter(
            (F.col("valid_from_us") <= FO3_ASOF_US)
            & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > FO3_ASOF_US))
        )
        .collect()
    )
    via_hist = {
        r["user_id"]: (r["state"], r["valid_from_us"], r["version_no"]) for r in hist
    }
    assert snap == via_hist


def test_transition_matrix_is_distribution(spark, sf_dir):
    """Outgoing probabilities sum to 1 per from-state and transition
    count equals n_events - n_users (each user stream of length n
    yields n-1 edges)."""
    from migrator_spark.plans.analytics import ev8_transition_matrix
    from migrator_spark.tables import load_table

    rows = ev8_transition_matrix(spark, sf_dir).collect()
    per_from: dict[str, float] = {}
    total = 0
    for r in rows:
        per_from[r["from_type"]] = per_from.get(r["from_type"], 0.0) + r["p_transition"]
        total += r["n_transitions"]
    assert all(abs(s - 1.0) < 1e-9 for s in per_from.values())
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_checksum_diff_empty_on_equal_flags_divergence(spark, tmp_path):
    """Equal replicas produce an EMPTY diff; a dropped row and a
    mutated row each surface as exactly their bucket, with NULL-side
    semantics for count mismatches handled by the null-safe compare."""
    from migrator_spark.operators.quality import checksum_diff

    rows = [(i, f"v{i}") for i in range(64)]
    schema = "id long, val string"
    src = spark.createDataFrame(rows, schema)
    same = spark.createDataFrame(list(rows), schema).repartition(5)
    cols = [F.col("id").cast("string"), "val"]
    assert checksum_diff(src, same, "id", cols, n_buckets=8).count() == 0

    # destination lost row 9 and corrupted row 20 — each flips exactly
    # its key's hash bucket
    b9, b20 = _key_bucket(9, 8), _key_bucket(20, 8)
    assert b9 != b20  # fixture sanity: distinct buckets
    broken = spark.createDataFrame(
        [(i, "XX" if i == 20 else f"v{i}") for i in range(64) if i != 9], schema
    )
    bad = {
        r["bucket"]: r for r in checksum_diff(src, broken, "id", cols, 8).collect()
    }
    assert set(bad) == {b9, b20}
    assert bad[b9]["src_rows"] == bad[b9]["dst_rows"] + 1
    assert bad[b20]["src_rows"] == bad[b20]["dst_rows"]


def test_checksum_audit_cli_roundtrip(spark, tmp_path):
    """The CLI exits 0 on identical tables and 1 with a bucket report
    when the destination diverges."""
    import subprocess
    import sys

    rows = [(i, f"v{i}") for i in range(32)]
    schema = "id long, val string"
    a, b, c = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c")
    spark.createDataFrame(rows, schema).write.parquet(a)
    spark.createDataFrame(rows, schema).write.parquet(b)
    spark.createDataFrame(rows[:-1], schema).write.parquet(c)
    import os

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cli = os.path.join(repo, "tools", "checksum_audit.py")
    ok = subprocess.run(
        [sys.executable, cli, a, b, "id", "8"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=300,
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr
    bad = subprocess.run(
        [sys.executable, cli, a, c, "id", "8"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=300,
    )
    assert bad.returncode == 1 and "MISMATCH" in bad.stdout, bad.stdout + bad.stderr


def test_incremental_packing_continues_the_stream(spark):
    """Appending a batch continues each bucket exactly where the packed
    corpus ended: first new doc per bucket starts at tokens_packed, the
    batch tiles contiguously, and updated totals equal old + batch."""
    from migrator_spark.operators.packing import (
        bucket_totals,
        pack_sequences,
        pack_sequences_incremental,
    )

    schema = "doc_id long, text string"
    old = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(4 + i % 5))) for i in range(30)], schema
    )
    new = spark.createDataFrame(
        [(i, " ".join(f"n{i}_{j}" for j in range(3 + i % 4))) for i in range(30, 50)],
        schema,
    )
    totals = {r["bucket"]: r["tokens_packed"] for r in bucket_totals(old, 4).collect()}
    inc = pack_sequences_incremental(new, bucket_totals(old, 4), 16, n_buckets=4).collect()
    assert len(inc) == 20
    by_bucket: dict[int, list] = {}
    for r in inc:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bkt, rs in by_bucket.items():
        rs.sort(key=lambda r: r["start_offset"])
        pos = totals.get(bkt, 0)
        for r in rs:
            assert r["start_offset"] == pos
            assert r["chunk_id"] == pos // 16
            pos += r["n_tokens"]
    # old assignments are untouched by construction (never recomputed);
    # the persisted state for the next batch is old + batch totals
    both = spark.createDataFrame(
        old.collect() + new.collect(), schema
    )
    merged = {r["bucket"]: r["tokens_packed"] for r in bucket_totals(both, 4).collect()}
    ends = dict(totals)
    for r in inc:
        ends[r["bucket"]] = max(ends.get(r["bucket"], 0), r["start_offset"] + r["n_tokens"])
    assert merged == ends
    # full-batch path agrees with itself when there is no history
    empty_totals = bucket_totals(old.filter("doc_id < 0"), 4)
    fresh = sorted(map(tuple, pack_sequences_incremental(new, empty_totals, 16, n_buckets=4).collect()))
    scratch = sorted(map(tuple, pack_sequences(new, 16, n_buckets=4).collect()))
    assert fresh == scratch
