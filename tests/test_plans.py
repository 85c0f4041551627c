"""Physical-plan regression tests.

SCALE.md's claims (pushdown reaches the scan, bounded sides broadcast,
window top-1 prunes map-side) are enforced here so a refactor that
silently reintroduces a shuffle or drops a pushed filter fails CI —
at sf0.001 the timing wouldn't notice, but at 100 TB it's the whole
game.
"""

from __future__ import annotations

import re

import pytest

from migrator_spark.plans.analytics import pr3_approx_profile as _pr3_approx_profile
from migrator_spark.plans.llmdata import pr6_approx_percentiles as _pr6_approx_percentiles
from migrator_spark.plans.registry import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _pushed_filters(plan: str) -> list[str]:
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]


def test_e1_pushdown_and_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "e1_seq_scan")
    assert any("GreaterThan" in p for p in _pushed_filters(plan)), plan
    assert "TakeOrderedAndProject" in plan  # deterministic LIMIT, no global sort


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    pushed = " ".join(_pushed_filters(plan))
    assert "l_shipdate" in pushed and "l_quantity" in pushed, plan


def test_e4_lookup_is_broadcast_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "e4_point_lookup_join")
    assert "BroadcastHashJoin" in plan, plan


def test_w1_window_group_limit(spark, sf_dir):
    # top-1-per-key must prune before the exchange (WindowGroupLimit),
    # not materialize the full window
    plan = _plan(spark, sf_dir, "w1_latest_by_key")
    assert "WindowGroupLimit" in plan, plan


def test_l0_merge_broadcasts_batch_not_target(spark, sf_dir):
    plan = _plan(spark, sf_dir, "l0_apply_cdc_batch")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_q5_dims_broadcast_fact_not_shuffled_prejoin(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the only hash-partitioned exchange should be the final small groupBy
    # (orders⋈lineitem may add one on orderkey at real scale; with dims
    # broadcast at this SF the fact side stays map-only until the agg)
    assert "SortMergeJoin" not in plan, plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    # P1: the reference always SELECT *; we must prune. e1 projects all
    # source columns by contract, so check a projecting query instead.
    plan = _plan(spark, sf_dir, "sm1_hash_sample")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "text" not in cols, f"unpruned text column read: {cols}"


@pytest.mark.parametrize("name", ["q1_pricing_summary", "sk1_salted_event_stats"])
def test_aggs_have_mapside_partials(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    # partial_ aggregate functions before the exchange = map-side combine
    assert "partial_" in plan, plan


def test_q13_outer_join_aggregates_after_prefilter(spark, sf_dir):
    # the priority predicate must be applied to orders before the outer
    # join (pushed beneath it), and the join must preserve customers
    plan = _plan(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in plan or "RightOuter" in plan, plan
    pushed = " ".join(_pushed_filters(plan))
    assert "o_orderpriority" in pushed, plan


def test_q15_max_and_dim_broadcast(spark, sf_dir):
    # both the 1-row max and the supplier dim must broadcast — the only
    # shuffle is the suppkey rollup
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q17_brand_filter_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in plan, plan
    pushed = " ".join(_pushed_filters(plan))
    assert "p_brand" in pushed and "p_size" in pushed, plan


def test_q22_antijoin_prunes_orders_to_custkey(spark, sf_dir):
    # anti-join side must read only (o_custkey, o_orderdate) — column
    # pruning is what keeps the orders scan cheap at 100 TB
    plan = _plan(spark, sf_dir, "q22_global_sales_opportunity")
    assert "LeftAnti" in plan, plan
    m = re.search(r"ReadSchema: struct<(o_[^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "o_custkey",
        "o_orderdate",
    }, plan


def test_q9_all_dims_broadcast(spark, sf_dir):
    # part (LIKE-filtered), supplier, nation broadcast; lineitem⋈orders
    # is the only fact-fact shuffle join
    plan = _plan(spark, sf_dir, "q9_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    pushed = " ".join(_pushed_filters(plan))
    assert "StringContains" in pushed, plan


def test_q16_part_filter_pushed_and_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_part_counts")
    assert "BroadcastHashJoin" in plan, plan
    pushed = " ".join(_pushed_filters(plan))
    assert "p_brand" in pushed, plan
    # _pushed_filters truncates at the nested ] of In-lists; check the
    # raw plan for the pushed size/type set filters instead
    assert "In(p_size" in plan and "In(p_type" in plan, plan


def test_q20_semi_join_broadcasts_rollup(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_excess_suppliers")
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan


def test_q11_single_fact_scan_via_exchange_reuse(spark, sf_dir):
    # the totals side must reuse the per-part rollup exchange, not
    # rescan lineitem; the threshold join is a 1-row broadcast
    df = REGISTRY["q11_important_parts"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes ReusedExchange at runtime
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final
    assert final.count("Scan parquet") == 1, final


def test_q12_single_equi_join_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q12_priority_lateness")
    # lateness (l_shipdate > o_orderdate + interval) must ride the
    # orderkey equi-join as a post-join condition, not force a
    # nested-loop join
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_q21_self_joins_are_hash_joins_on_orderkey(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    # EXISTS/NOT-EXISTS legs: equi on orderkey with the suppkey<>suppkey
    # conjunct as join condition — never a nested loop
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # top-10, no global sort


def test_ev2_asof_is_window_not_join(spark, sf_dir):
    # scalable as-of: union + running last() — one user_id exchange,
    # NO join operator of any kind in the plan
    plan = _plan(spark, sf_dir, "ev2_asof_join")
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_ev3_range_join_is_bucketed_hash_join(spark, sf_dir):
    # bucketized range join: equi-join on (user_id, time bin), the
    # interval predicate only filters — never a nested loop
    plan = _plan(spark, sf_dir, "ev3_range_join")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_pr3_approx_distinct_error_bound(spark, sf_dir):
    # HLL at rsd=0.02 must land within 5% of the exact distinct count
    # (no oracle possible: sketch estimates are engine-specific)
    import pyspark.sql.functions as F

    got = {
        r["event_type"]: r["approx_users"]
        for r in _pr3_approx_profile(spark, sf_dir).collect()
    }
    from migrator_spark.tables import load_table

    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, v in exact.items():
        assert abs(got[k] - v) <= max(1, 0.05 * v), (k, got[k], v)


def test_q2_dims_broadcast_and_topk(spark, sf_dir):
    # exact-Q2 shape: part/supplier/nation/region all broadcast (the
    # fact is never shuffled pre-agg) and top-20 is TakeOrderedAndProject
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "TakeOrderedAndProject" in plan, plan
    pushed = " ".join(_pushed_filters(plan))
    assert "EqualTo(p_type,PROMO)" in pushed and "EqualTo(r_name,EUROPE)" in pushed, plan


def test_w3_single_exchange_serves_all_frames(spark, sf_dir):
    # ROWS, RANGE and cumulative frames all partition by user_id: one
    # shuffle must feed every Window operator (re-sorting is fine,
    # re-exchanging is a regression)
    plan = _plan(spark, sf_dir, "w3_rolling_frames")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan


def test_q23_pivot_scan_pruned(spark, sf_dir):
    # pinned pivot values: no extra distinct pass, orders scan pruned to
    # the two referenced columns
    plan = _plan(spark, sf_dir, "q23_priority_pivot")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderdate", "o_orderpriority"}, plan


def test_pr4_histogram_single_column_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pr4_price_histogram")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m.group(1).split(":")[0] == "o_totalprice", plan
    assert plan.count("HashAggregate") >= 2, plan  # map-side partials


def test_q24_unpivot_expands_post_agg(spark, sf_dir):
    # unpivot's Expand runs over the aggregated wide relation; the fact
    # scan stays pruned to the two pivot columns
    plan = _plan(spark, sf_dir, "q24_priority_unpivot")
    assert "Expand" in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderdate", "o_orderpriority"}, plan


def test_q25_grouping_sets_single_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q25_grouping_sets")
    assert "Expand" in plan, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderdate", "o_orderpriority", "o_totalprice"}, plan


def test_fo1_full_outer_reuses_custkey_shuffle(spark, sf_dir):
    # both snapshot aggs hash-partition on custkey and the full-outer
    # join keys on it — no extra exchange between agg and join
    plan = _plan(spark, sf_dir, "fo1_snapshot_diff")
    assert "FullOuter" in plan, plan
    pushed = " ".join(_pushed_filters(plan))
    assert "o_orderdate" in pushed, plan
    # exactly 3 exchanges: one per snapshot agg + the final sort —
    # an extra one between agg and join would mean the join key lost
    # the agg's partitioning
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 3, plan


def test_ev4_spine_broadcast_and_pruned_scans(spark, sf_dir):
    # the day spine broadcasts into the user list; every events scan is
    # pruned to the three referenced columns or fewer
    plan = _plan(spark, sf_dir, "ev4_gap_fill")
    assert "BroadcastNestedLoopJoin" in plan, plan
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"user_id", "ts", "value"}, (cols, plan)


def test_f6_regex_projection_only(spark, sf_dir):
    # per-row regex projection: no aggregate, no join, scan pruned to
    # (doc_id, text)
    plan = _plan(spark, sf_dir, "f6_regex_suite")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, plan
    assert "HashAggregate" not in plan and "Join" not in plan.replace("Join strategy", ""), plan


def test_pr5_two_column_scan_with_partials(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pr5_stat_moments")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderpriority", "o_totalprice"}, plan
    assert plan.count("HashAggregate") >= 2, plan  # map-side partials


def test_ta6_pii_scrub_is_narrow_map_stage(spark, sf_dir):
    # regex count+redact must stay a shuffle-free projection over a
    # two-column scan — at 100 TB this is the difference between one
    # pass and a pointless exchange of full documents
    plan = _plan(spark, sf_dir, "ta6_pii_scrub")
    assert "Exchange" not in plan, plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan


def test_sm3_weighted_sample_is_topk_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sm3_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_st5_interval_join_no_cartesian(spark, sf_dir):
    # the user_id equi-key must anchor a hash join; only the time bound
    # is a range predicate
    plan = _plan(spark, sf_dir, "st5_interval_join")
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_ev5_funnel_stages_are_hash_joins_on_pruned_scans(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ev5_funnel")
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    # the event fact is never read wider than (ts, user_id, event_type)
    for rs in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert "props" not in rs and "value" not in rs, rs


def test_ev6_retention_two_column_scan_with_partials(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ev6_retention")
    # events.ts is parquet TIMESTAMP(micros); with NTZ inference disabled
    # the scan emits TimestampType natively (no post-scan cast projection)
    assert re.search(r"ReadSchema: struct<ts:timestamp,user_id:bigint>", plan), plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_dq1_every_check_scan_is_narrow(spark, sf_dir):
    # each constraint reads only the column(s) it audits — five checks,
    # five single-or-double-column scans, never SELECT *
    plan = _plan(spark, sf_dir, "dq1_constraint_audit")
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert reads and all(len(r.split(",")) <= 2 for r in reads), reads


def test_dd9_no_forced_broadcast_of_corpus_dependent_set(spark, sf_dir):
    # the boilerplate hash set is corpus-dependent and unbounded — it
    # must NOT carry a static broadcast hint (driver OOM at 100 TB on a
    # boilerplate-heavy crawl). The join strategy is left to stats/AQE:
    # at test SF the size estimate legitimately picks broadcast, but the
    # optimized logical plan must be hint-free so a large corpus falls
    # back to shuffle join.
    df = REGISTRY["dd9_chunk_boilerplate"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # the chash join must exist AND carry no broadcast strategy hint
    # (a global "hint"-substring scan would trip on unrelated node names)
    assert re.search(r"Join\b.*chash", opt), opt
    assert "strategy=broadcast" not in opt, opt
    # the corpus explode+hash is checkpointed (runs ONCE, round 4) so the
    # parquet scan no longer appears in the final plan; pin that the
    # final plan reads the materialised RDD (single evaluation), then pin
    # the pruned scan on the pre-checkpoint subtree instead
    assert "LogicalRDD" in opt, opt
    from migrator_spark.operators.dedup import chunk_hashes
    from migrator_spark.tables import load_table

    sub = chunk_hashes(load_table(spark, sf_dir, "documents"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    sub_plan = sub._jdf.queryExecution().explainString(mode)
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", sub_plan), sub_plan


def test_sim5_assignment_passes_are_map_only(spark, sf_dir):
    # every Lloyd assignment pass must be a broadcast of the packed
    # centroid row against the point scan — the point set is NEVER
    # shuffle-joined (that property is what makes the quantizer build
    # viable at 100 TB). Seeds come from TakeOrderedAndProject, not a
    # global sort.
    plan = _plan(spark, sf_dir, "sim5_ivf_build")
    from migrator_spark.plans.llmdata import KMEANS_ITERS

    # tree section only (formatted mode also lists nodes in a detail
    # section, which would double-count); prefix-agnostic so plan-shape
    # changes between '+-' and ':-' branches don't break the pin
    assert len(re.findall(r"[+:]- BroadcastNestedLoopJoin", plan)) == KMEANS_ITERS + 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pr6_approx_percentile_error_bound(spark, ddb, sf_dir):
    # percentile_approx at accuracy=1000 must land within 1/1000 rank
    # error of the exact per-language percentile (no oracle possible:
    # sketch internals are engine-specific — same pattern as pr3)
    got = {
        r["lang"]: (r["p50"], r["p90"], r["p99"], r["n_docs"])
        for r in _pr6_approx_percentiles(spark, sf_dir).collect()
    }
    exact = {
        r[0]: r[1:]
        for r in ddb.sql(
            """
            SELECT lang,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars),
                   percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars),
                   percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars),
                   list_sort(list(n_chars))
            FROM documents GROUP BY lang
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for lang, (p50, p90, p99, n_docs) in got.items():
        e50, e90, e99, sorted_vals = exact[lang]
        n = len(sorted_vals)
        assert n == n_docs
        for approx, q in [(p50, 0.5), (p90, 0.9), (p99, 0.99)]:
            # rank of the sketch's answer must be within n/1000 + 1 of
            # the target rank (the KLL accuracy contract)
            import bisect

            lo = bisect.bisect_left(sorted_vals, approx)
            hi = bisect.bisect_right(sorted_vals, approx) - 1
            target = q * (n - 1)
            err_budget = n / 1000 + 1
            assert lo - err_budget <= target <= hi + err_budget, (
                lang, q, approx, lo, hi, target,
            )


def test_fts1_stats_broadcast_and_topk(spark, sf_dir):
    # corpus stats (one row) broadcast over the scoring scan; top-15
    # via TakeOrderedAndProject, never a global sort of all scores
    plan = _plan(spark, sf_dir, "fts1_keyword_search")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Broadcast" in plan, plan


def test_dc1_no_forced_broadcast_and_narrow_scan(spark, sf_dir):
    # the benchmark shingle set is corpus-derived — like dd9's
    # boilerplate set it must carry no static broadcast hint (AQE picks
    # broadcast at test SF from stats; a huge eval set must be able to
    # fall back to shuffle join), and the text scan reads only (id, text)
    df = REGISTRY["dc1_decontaminate"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, opt
    plan = _plan(spark, sf_dir, "dc1_decontaminate")
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan


def test_ta7_counts_have_mapside_partials_no_python(spark, sf_dir):
    # the bigram/unigram count aggregates must combine map-side (Zipf
    # heads would otherwise ship every occurrence through the shuffle),
    # and the whole score pipeline stays JVM-side
    plan = _plan(spark, sf_dir, "ta7_lm_quality")
    assert "partial_count" in plan or "Partial" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_sim6_probe_broadcasts_query_bands_not_corpus(spark, sf_dir):
    # the probe side is bands rows (the query's band codes) — IT is the
    # broadcast side; the corpus band index must never sort-merge
    plan = _plan(spark, sf_dir, "sim6_hyperplane_topk")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_mx1_single_corpus_scan_with_partials(spark, sf_dir):
    # EXACTLY one pass over (source, text): the normalizers are window
    # functions over the groups-sized aggregate, not a second aggregate
    # branch (which would duplicate the corpus scan — column pruning
    # makes the branches differ, defeating exchange reuse)
    plan = _plan(spark, sf_dir, "mx1_mixture_plan")
    tree = plan[: plan.index("(1) Scan")]
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert reads and all("text" in r and "source" in r for r in reads), reads
    assert "partial_count" in plan or "Partial" in plan, plan


def test_cur2_stays_jvm_side_no_cartesian(spark, sf_dir):
    # five composed stages (decontaminate -> LM gate -> dedup ->
    # mixture -> sample) must stay one Catalyst plan: no Python
    # evaluation anywhere, no cartesian blowup (the only cross joins
    # carry single-row aggregates), and the rates join must not
    # sort-merge (rates is groups-sized)
    plan = _plan(spark, sf_dir, "cur2_training_mix")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # round 4: the manifest is emitted UNSORTED — a trailing global
    # orderBy("doc_id") was a full range-partition exchange bought for
    # cosmetic ordering (the single most expensive node at 100 TB)
    assert "rangepartitioning" not in plan.lower(), plan


def test_ta9_query_side_broadcasts_with_topk(spark, sf_dir):
    # the query document's shingle set is bounded (one doc): it must
    # BROADCAST against the exploded corpus relation, and top-k must be
    # TakeOrderedAndProject (no global sort of the scored docs)
    plan = _plan(spark, sf_dir, "ta9_similar_docs")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_cur3_stays_jvm_side_no_cartesian(spark, sf_dir):
    # LSH pairs -> star-contraction components -> two id-keyed joins:
    # one Catalyst plan, no Python evaluation, no cartesian blowup, and
    # the cluster joins carry no forced broadcast hint (corpus-dependent
    # sets — the dd9 rule; AQE decides at runtime)
    df = REGISTRY["cur3_neardup_mix"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, opt
    plan = _plan(spark, sf_dir, "cur3_neardup_mix")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ev7_two_windows_share_one_sort_no_join(spark, sf_dir):
    # boundary flag (lag) and session index (running sum) share one
    # (user_id) partitioning and one (us, event_id) sort — a single
    # exchange+sort serves both windows; the only other exchange is the
    # per-session aggregate. No join anywhere.
    plan = _plan(spark, sf_dir, "ev7_sessionize")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) <= 2, plan
    assert plan.count("Window") >= 1, plan


def test_dd10_no_join_single_window_pass(spark, sf_dir):
    # the cross-doc dup flag is min!=max over the hash-keyed window —
    # ONE pass over the rolling-window relation, never an aggregate
    # joined back (which would evaluate the explode twice)
    plan = _plan(spark, sf_dir, "dd10_dup_spans")
    assert "Join" not in plan, plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan


def test_mx2_single_corpus_scan(spark, sf_dir):
    # epoch planning rides mx1's single scan + groups-sized window —
    # adding the budget/cap math must not add a second corpus pass
    plan = _plan(spark, sf_dir, "mx2_epoch_plan")
    tree = plan[: plan.index("(1) Scan")]
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree


def test_dq2_single_aggregate_pass_broadcast_stats(spark, sf_dir):
    # the per-customer aggregate is checkpointed and feeds BOTH the
    # 1-row population stats and the filter probe — the final plan must
    # contain no parquet rescan, and the stats side joins as a 1-row
    # broadcast (nested-loop on a single row, never a shuffle)
    plan = _plan(spark, sf_dir, "dq2_spend_outliers")
    assert "Scan parquet" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_fo2_one_window_family_no_join(spark, sf_dir):
    # row_number and lead share one (user_id) partitioning and one
    # (ts, event_id) sort — a single exchange serves the whole history
    # build; no join anywhere
    plan = _plan(spark, sf_dir, "fo2_scd2_history")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan


def test_sim8_adc_scan_is_broadcast_only_with_topk(spark, sf_dir):
    # the ADC scan is MAP-ONLY over the candidates: per-subspace packed
    # (cell, centroid, qdist) rows broadcast in, argmin+lookup happen in
    # the scan projection, and top-k is TakeOrderedAndProject. The
    # candidate set is never shuffled — no sort-merge join, no shuffled
    # hash join, no exchange except the codebook builds' k·(dim/m)
    # means and the final k-row merge
    plan = _plan(spark, sf_dir, "sim8_pq_adc_topk")
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_dd11_stays_jvm_side_no_cartesian(spark, sf_dir):
    # span detection (window passes, no join) + span-list join back +
    # HOF keep-filter: no Python evaluation, no cartesian, and the
    # span join carries no forced broadcast hint (corpus-dependent —
    # the dd9 rule)
    df = REGISTRY["dd11_despan"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, opt
    plan = _plan(spark, sf_dir, "dd11_despan")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_registry_source_has_no_duplicate_keys():
    # a dict literal silently keeps the LAST duplicate key — a rotation
    # edit that leaves a query in two places would shrink the registry
    # without any error. Parse the source, not the dict.
    import re as _re
    from pathlib import Path

    src = Path("migrator_spark/plans/registry.py").read_text()
    body = src[src.index("REGISTRY: dict") :]
    keys = _re.findall(r'^    "(\w+)": QuerySpec', body, _re.M)
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate registry keys: {dupes}"
    assert len(keys) == len(REGISTRY)


def test_pk1_one_partitioned_window_no_global_sort(spark, sf_dir):
    # packing is ONE window partitioned by bucket: a single exchange
    # (hashpartitioning on bucket), no global-range Sort (which would
    # mean the serial-stream formulation), no join, narrow scan
    plan = _plan(spark, sf_dir, "pk1_sequence_packing")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan
    assert "rangepartitioning" not in plan, plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan


def test_pk3_broadcast_tokens_single_bucket_window(spark, sf_dir):
    # packing by served BPE token counts (round 11): the per-word
    # token table joins BROADCAST (vocabulary-sized — the corpus side
    # is never shuffled for the join), and the packing itself stays
    # the single bucket-partitioned window with no global-range Sort.
    # (The bpe4 training chain contributes its own bounded driver
    # rounds upstream; the pin targets the serving composition.)
    plan = _plan(spark, sf_dir, "pk3_bpe_packing")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    # exactly one bucket-hash exchange feeds the packing window
    assert len(re.findall(r"hashpartitioning\(bucket", plan)) >= 1, plan


def test_dq3_single_scan_partial_agg(spark, sf_dir):
    # the checksum is scan -> partial agg -> one exchange -> final agg:
    # no join, no window, map-side partials carry 16 rows per task
    plan = _plan(spark, sf_dir, "dq3_replica_checksum")
    assert "Join" not in plan and "Window" not in plan, plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan
    assert len(re.findall(r"\n\(\d+\) HashAggregate", plan)) == 2, plan


def test_fo3_cutoff_pushed_single_aggregate_no_window(spark, sf_dir):
    # the AS OF cutoff is a plain ts predicate — pushed to the scan
    # (time-partitioned logs prune whole partitions); latest-state +
    # version-depth are ONE max_by/count aggregate with map-side
    # partials — no window, no sort, one exchange
    plan = _plan(spark, sf_dir, "fo3_asof_snapshot")
    pushed = " ".join(_pushed_filters(plan))
    assert "LessThanOrEqual(ts" in pushed, plan
    assert "Window" not in plan and "Join" not in plan, plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan


def test_sim9_both_topk_sides_bounded(spark, sf_dir):
    # both the exact and ANN sides end in TakeOrderedAndProject (10-row
    # relations) before the intersection join — the join input is never
    # the corpus
    plan = _plan(spark, sf_dir, "sim9_recall_eval")
    assert len(re.findall(r"\n\(\d+\) TakeOrderedAndProject", plan)) == 2, plan


def test_cur4_gate_fuses_into_scan_one_exchange(spark, sf_dir):
    # the quality gate is a stateless filter evaluated before any
    # shuffle; packing adds the single bucket-partitioned window —
    # one exchange in the whole curate-and-pack plan, no join
    plan = _plan(spark, sf_dir, "cur4_pack_curated")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1, plan


def test_fts2_stats_broadcast_and_topk(spark, sf_dir):
    # BM25 inherits fts1's shape: the one-row corpus stats (N, Σdl,
    # per-term df) broadcast over the scoring scan; top-15 via
    # TakeOrderedAndProject, never a global sort of all scores
    plan = _plan(spark, sf_dir, "fts2_bm25_search")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Broadcast" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ch1_chunking_is_mapside_only(spark, sf_dir):
    # overlapping chunking is a pure scan transform (generate + slice);
    # ANY exchange here would mean the explode shuffles the corpus
    plan = _plan(spark, sf_dir, "ch1_overlap_chunks")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan
    # reads only (id, text)
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan


def test_cur5_candidate_groups_broadcast_before_window(spark, sf_dir):
    # the per-doc window must see only candidate score-groups: the
    # groups-side (subtotal + running-start, filtered to start<budget)
    # broadcasts back onto the corpus scan, so the only corpus-sized
    # exchange is the window's hash partitioning of the CANDIDATE rows
    # — never a sort-merge join, never a global (empty-key) window over
    # the corpus (the only unpartitioned window is on the groups side)
    plan = _plan(spark, sf_dir, "cur5_token_budget")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the per-doc running sum is partitioned (hashpartitioning on the
    # score key feeds it); the single unpartitioned window lives on the
    # groups-sized subtotal side only
    assert "Window" in plan and "hashpartitioning" in plan, plan


def test_fts3_passage_search_no_corpus_shuffle(spark, sf_dir):
    # chunking is map-side (Generate), chunk-corpus stats broadcast
    # back, top-10 via TakeOrderedAndProject — the ONLY exchanges in
    # the whole two-operator composition are the one-row stats
    # aggregate's; no exchange ever carries chunk rows
    plan = _plan(spark, sf_dir, "fts3_passage_search")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Generate" in plan, plan
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan


def test_cur6_window_group_limit_both_sides(spark, sf_dir):
    # the per-domain cap must push the rank predicate INTO the window:
    # a Partial WindowGroupLimit BEFORE the exchange (map-side cap-sized
    # heaps) and a Final one after — skewed domains never full-sort
    plan = _plan(spark, sf_dir, "cur6_domain_cap")
    assert len(re.findall(r"\n\(\d+\) WindowGroupLimit", plan)) == 2, plan
    assert "Partial" in plan and "Final" in plan, plan
    # pruned scan: only the three needed columns
    assert "struct<doc_id:bigint,source:string,n_chars:bigint>" in plan, plan


def test_sh1_single_exchange_no_global_sort(spark, sf_dir):
    # shard assignment is ONE hash partition + per-shard local sort;
    # a global permutation must never become a rangepartitioning sort
    plan = _plan(spark, sf_dir, "sh1_train_shards")
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan
    assert "rangepartitioning" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan  # 1-col scan


def test_bpe1_partial_agg_and_topk(spark, sf_dir):
    # pair counting partial-aggregates map-side (the shuffle carries
    # distinct-pair partials, not corpus tokens) and the top-k is
    # TakeOrderedAndProject, never a global sort
    plan = _plan(spark, sf_dir, "bpe1_pair_stats")
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_ta11_single_scan_no_join(spark, sf_dir):
    # the confusion matrix computes the guess in the scan projection:
    # one corpus scan, no join back, one partial-combined aggregate
    plan = _plan(spark, sf_dir, "ta11_lang_confusion")
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan, plan
    assert "partial_count" in plan, plan


def test_vb1_single_corpus_pass_topk_broadcast(spark, sf_dir):
    # token counts materialize once (checkpoint); top-k is
    # TakeOrderedAndProject and the 1-row total broadcasts
    plan = _plan(spark, sf_dir, "vb1_vocab_coverage")
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 0, plan  # checkpointed RDD scan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Broadcast" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["ev9_daily_top_events", "ev10_top_user_paths", "ta12_doc_keywords"],
)
def test_round5_topk_plans_push_rank_into_window(spark, sf_dir, name):
    # every round-5 top-k shape must carry the partial+final
    # WindowGroupLimit pair (rank predicate evaluated map-side) and
    # keep aggregates partial-combined; no sort-merge joins anywhere
    plan = _plan(spark, sf_dir, name)
    assert len(re.findall(r"\n\(\d+\) WindowGroupLimit", plan)) == 2, plan
    assert "partial_" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_seg1_single_corpus_shuffle_broadcast_frontier(spark, sf_dir):
    # one per-customer aggregate is the only corpus-sized exchange; the
    # ntile windows run over the customers-sized relation and the
    # dataset frontier joins as a broadcast 1-row cross
    plan = _plan(spark, sf_dir, "seg1_rfm_segments")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "partial_" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cur8_single_aggregate_no_join(spark, sf_dir):
    # best-copy exact dedup is ONE partial-combined max_by aggregate on
    # the uniform hash key — one corpus scan, no join, no top-k
    plan = _plan(spark, sf_dir, "cur8_best_copy_dedup")
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1, plan
    assert "partial_max_by" in plan, plan
    assert "Join" not in plan, plan


def test_sm6_cutoff_is_distributed_selection(spark, sf_dir):
    # the 80th-percentile cutoff must come from the two-level cumulative
    # count (parallel per-day windows + broadcast day offsets), never
    # from a 0.8*n-row global top-k; corpus-sized relations only ever
    # join as broadcasts
    plan = _plan(spark, sf_dir, "sm6_temporal_split")
    assert "TakeOrderedAndProject" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_count" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_vb2_vocab_joins_broadcast(spark, sf_dir):
    # the top-k vocab is a TakeOrderedAndProject bounded by the
    # parameter and reaches the token stream as a broadcast flag join;
    # the per-source rates aggregate with partials
    plan = _plan(spark, sf_dir, "vb2_oov_rate")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_" in plan, plan


def test_ds1_bucket_model_broadcast_two_corpus_passes(spark, sf_dir):
    # the fitted bucket model is checkpointed (scan-free in the final
    # plan) and reaches the scoring stream as a broadcast; the corpus
    # explode feeds partial-combined aggregates, never a sort-merge join
    plan = _plan(spark, sf_dir, "ds1_dsir_weights")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_" in plan, plan
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1, plan


def test_sd1_pair_stage_is_cell_keyed(spark, sf_dir):
    # the clustered-embedding relation is checkpointed (no parquet
    # re-scan), centroids join as a broadcast, and the quadratic stage
    # is keyed on cell — never a cartesian product
    plan = _plan(spark, sf_dir, "sd1_semdedup")
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 0, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_" in plan, plan


def test_ev11_stage_predicates_pushed_broadcast_frontiers(spark, sf_dir):
    # each funnel stage reads ONLY its own event type (predicate at the
    # parquet scan) and the previous stage's users-sized frontier joins
    # as a broadcast — never a sort-merge join of two event scans
    plan = _plan(spark, sf_dir, "ev11_funnel")
    pushed = " ".join(_pushed_filters(plan))
    for ev_type in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{ev_type})" in pushed, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_fo4_user_weeks_not_events_shuffle(spark, sf_dir):
    # both corpus scans are column-pruned to (user_id, ts); the cohort
    # relation joins as a broadcast and every aggregate partial-combines
    plan = _plan(spark, sf_dir, "fo4_retention_cohorts")
    assert "SortMergeJoin" not in plan, plan
    assert "partial_" in plan, plan
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert set(c.split(":")[0] for c in m.split(",")) <= {"user_id", "ts"}, m


def test_pr7_single_corpus_scan(spark, sf_dir):
    # the (group, bucket) count relation is checkpointed — the corpus
    # is scanned exactly once; everything downstream is grid-sized
    plan = _plan(spark, sf_dir, "pr7_psi_drift")
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 0, plan
    assert "SortMergeJoin" not in plan, plan


def test_dc2_no_corpus_hash_shuffle(spark, sf_dir):
    # the benchmark's distinct shingle hashes flag the corpus position
    # stream via joins AQE broadcasts — the corpus token relation is
    # never shuffled by hash (no window over it, no sort-merge join);
    # the extra scans are column-pruned id/membership reads
    plan = _plan(spark, sf_dir, "dc2_contamination_spans")
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "partial_" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_ev13_stage_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ev13_conversion_latency")
    pushed = " ".join(_pushed_filters(plan))
    assert "EqualTo(event_type,view)" in pushed, plan
    assert "EqualTo(event_type,purchase)" in pushed, plan
    assert "SortMergeJoin" not in plan, plan


def test_sd2_frozen_build_checkpointed(spark, sf_dir):
    # the scored relation is checkpointed (no parquet re-scan of the
    # corpus in the final plan beyond the new-ids probes) and the pair
    # stages are cell-keyed — never a cartesian product
    plan = _plan(spark, sf_dir, "sd2_incremental_semdedup")
    assert "CartesianProduct" not in plan, plan
    assert "partial_" in plan, plan


# ------------------------------------------------------- round 6 plans


def test_pr9_sample_prunes_map_side(spark, sf_dir):
    # the bottom-k hash sample must compile to WindowGroupLimit
    # (per-partition k-heaps BEFORE the group exchange — post-shuffle
    # state is O(k) per group), and the group totals must arrive as a
    # broadcast, never a re-shuffle of the sample
    plan = _plan(spark, sf_dir, "pr9_sampled_quantiles")
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sm7_selection_prunes_map_side(spark, sf_dir):
    # per-stratum bottom-quota selection: WindowGroupLimit heaps shed
    # rows before the single stratum exchange; the quota table (a
    # |strata|-row relation) joins broadcast
    plan = _plan(spark, sf_dir, "sm7_stratified_sample")
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pr10_probe_side_never_self_joins(spark, sf_dir):
    # the probe relation is scanned once: bits explode, semi-join the
    # filter state, reduce — no SortMergeJoin (state is bounded by m
    # rows per group and stays broadcast), no cartesian product
    plan = _plan(spark, sf_dir, "pr10_bloom_membership")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_mm8_decode_is_arrow_batched(spark, sf_dir):
    # the JPEG codec runs as Arrow mapInPandas (payloads never leave
    # executors, batch-bounded memory), not row-at-a-time Python
    plan = _plan(spark, sf_dir, "mm8_jpeg_roundtrip")
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_mm9_features_are_arrow_batched(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm9_image_features")
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_sim11_assignments_are_map_only(spark, sf_dir):
    # both levels' assignment passes are broadcast folds: the only
    # exchanges in the final pass feed the (small) packed-codebook
    # aggregate, never a shuffle of the point set keyed by id
    plan = _plan(spark, sf_dir, "sim11_two_level_quantizer")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sd3_pair_stages_are_cell_keyed(spark, sf_dir):
    # the fold's judgment joins key on (cell, salt) — the corpus is
    # never id-self-joined and nothing goes cartesian
    plan = _plan(spark, sf_dir, "sd3_stream_semdedup_batch")
    assert "CartesianProduct" not in plan, plan


def test_sd4_pair_stage_is_cell_keyed(spark, sf_dir):
    # the two-level form inherits sd1's discipline: pairs only within
    # (fine cell, salt) keys, never a cartesian or id self-join
    plan = _plan(spark, sf_dir, "sd4_semdedup_two_level")
    assert "CartesianProduct" not in plan, plan


def test_pr11_state_stays_broadcast(spark, sf_dir):
    # the d x m cell state is bounded regardless of corpus size and
    # must reach the probe join as a broadcast; the probe relation is
    # scanned once (no self-join, nothing cartesian)
    plan = _plan(spark, sf_dir, "pr11_count_min")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dd13_verify_runs_on_pruned_candidates(spark, sf_dir):
    # the Levenshtein verify must sit above the inverted-index
    # candidate aggregate, never a cartesian of the corpus
    plan = _plan(spark, sf_dir, "dd13_edit_distance_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan, plan


def test_pr12_state_and_totals_stay_broadcast(spark, sf_dir):
    # CM cells and the per-group totals are sketch-sized and must both
    # reach their joins as broadcasts; the candidate relation is the
    # distinct key set — nothing cartesian, no sort-merge of the stream
    plan = _plan(spark, sf_dir, "pr12_heavy_hitters")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pr13_bottom_k_is_group_limit_pruned(spark, sf_dir):
    # the per-group bottom-k state must shed MAP-SIDE via a
    # Partial+Final WindowGroupLimit pair (rank <= k is a constant
    # bound), so only k rows per group per partition reach the
    # exchange; the pairwise stage runs on states — the only cross
    # join is the broadcast G x G group-pair frame (G = #sources),
    # and nothing is ever an un-broadcast cartesian
    plan = _plan(spark, sf_dir, "pr13_kmv_setops")
    assert "WindowGroupLimit" in plan, plan
    assert ", 64, Partial" in plan and ", 64, Final" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_mm10_and_mm11_are_arrow_batched(spark, sf_dir):
    for name in ("mm10_mjpeg_frames", "mm11_audio_features"):
        plan = _plan(spark, sf_dir, name)
        assert "MapInPandas" in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)


def test_dd12_counts_shared_shingles_no_verify_join(spark, sf_dir):
    # round-7 rewrite: |A∩B| comes out of the index self-join as a
    # map-side-combinable count — no array_intersect verify stage, no
    # arrays carried through joins, nothing cartesian
    plan = _plan(spark, sf_dir, "dd12_containment_pairs")
    assert "array_intersect" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # partial + final aggregate pair over the pair stream
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_sim12_gemm_prunes_then_rescans_broadcast(spark, sf_dir):
    # the numpy stage is Arrow mapInPandas (never row-at-a-time
    # Python); the query set reaches the rescore as a broadcast; the
    # final per-query rank is WindowGroupLimit-pruned (rank <= k is a
    # constant bound) and nothing goes cartesian
    plan = _plan(spark, sf_dir, "sim12_gemm_topk")
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ev15_is_one_sort_two_windows_no_self_join(spark, sf_dir):
    # the chain search must be answered by window passes over ONE
    # per-user sort: no events-by-events join of any kind, exactly one
    # exchange of the fact keyed on user_id, and the event_type IN
    # filter pushed to the parquet scan
    plan = _plan(spark, sf_dir, "ev15_window_funnel")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct"):
        assert j not in plan, (j, plan)
    # exactly two exchanges: the user_id window sort (which the
    # per-user max-depth aggregate REUSES) and the final 8-row level
    # aggregate; the window partitioning must be on user_id
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert "hashpartitioning(user_id" in plan, plan
    assert any("In(event_type" in p for p in _pushed_filters(plan)), plan


def test_sm8_split_is_one_join_over_the_components(spark, sf_dir):
    # the split itself adds no exchange beyond the components build it
    # consumes: the corpus-vs-clusters join is the only place doc_id
    # is a join key, and the assignment is a projection (no window,
    # no extra aggregate after the join)
    plan = _plan(spark, sf_dir, "sm8_leakage_safe_split")
    assert "CartesianProduct" not in plan, plan


def test_dq4_parents_broadcast_children_pruned(spark, sf_dir):
    # every parent side is dim-sized and must broadcast; each child
    # scan must read ONLY its key column (column pruning reaches the
    # scan: no child schema wider than one field)
    plan = _plan(spark, sf_dir, "dq4_referential_audit")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    import re as _re

    child_schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert child_schemas and all(s.count(":") <= 1 for s in child_schemas), (
        child_schemas
    )


def test_ev16_has_no_range_join(spark, sf_dir):
    # the sliding window must be answered by the contribution-expansion
    # rewrite: every join equi-keyed, no nested-loop range join, and
    # the corpus-sized shuffle is the (user, day) distinct — nothing
    # after it exceeds |users x days|
    plan = _plan(spark, sf_dir, "ev16_rolling_active_users")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sim13_ann_probe_is_cell_joined(spark, sf_dir):
    # the ANN side must reach the corpus through the cell equi-join
    # (broadcast query cells), never a cartesian; the final per-query
    # rank is WindowGroupLimit-pruned
    plan = _plan(spark, sf_dir, "sim13_two_level_recall")
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_fo5_valid_time_slice_pushed_to_both_version_scans(spark, sf_dir):
    # the valid-time predicate must reach BOTH union arms' parquet
    # scans, the per-key latest-version pick must be a WindowGroupLimit
    # (rank == 1 is a constant bound), and nothing joins
    plan = _plan(spark, sf_dir, "fo5_bitemporal_asof")
    assert "Join" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    pushed = _pushed_filters(plan)
    assert sum("o_orderdate" in p for p in pushed) >= 2, pushed


def test_sim15_probe_sets_broadcast_corpus_single_scan(spark, sf_dir):
    """sim15's serving plan: the probe sets and the query batch arrive
    as BROADCAST joins onto the cell-pruned corpus scan (the corpus is
    never the build side), and the only exchange below the rank window
    is the |Q|-partition window shuffle — the shape that holds at a
    100 TB corpus."""
    plan = _plan(spark, sf_dir, "sim15_ivf_multiprobe_topk")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # rank window prunes per-query top-k before full materialization
    assert "WindowGroupLimit" in plan or "RunningWindowFunction" in plan, plan
    # embeddings.parquet is scanned, never broadcast: no BroadcastExchange
    # should carry the embedding column of the corpus-side scan
    assert "SortMergeJoin" not in plan, plan


def test_shared_shingle_index_consumers_scan_checkpoint_not_docs(spark, sf_dir):
    """dd12 on the shared index: both self-join sides read the
    materialized postings (ExistingRDD / scan of the checkpoint), not
    two fresh parses of documents.parquet — the regex shingling must
    appear ZERO times in the consuming plan."""
    plan = _plan(spark, sf_dir, "dd12_containment_pairs")
    assert "regexp_replace" not in plan, plan
    assert "documents.parquet" not in plan, plan


def test_ev17_one_exchange_n_window_passes(spark, sf_dir):
    """The N-step funnel's load-bearing claim: all N-1 suffix-min
    passes share ONE (user, ts) sort — a single Exchange under the
    Window stack, no join, no extra shuffle per depth."""
    plan = _plan(spark, sf_dir, "ev17_window_funnel4")
    assert "Join" not in plan, plan
    body = plan.split("AdaptiveSparkPlan")[0]
    assert len(re.findall(r"\n\(\d+\) Exchange", body)) <= 2, plan  # windows + final agg
    assert "CartesianProduct" not in plan, plan


def test_mnt1_retract_is_broadcast_semi_join(spark, sf_dir):
    """The incremental rollup's load-bearing scale claim: the fact
    table is touched ONLY by a map-side broadcast left-semi join
    against the batch's keys (the retract side never shuffles the
    fact table), and the patch join — full outer, which Spark cannot
    broadcast — runs over |groups|-sized inputs only."""
    plan = _plan(spark, sf_dir, "mnt1_incremental_rollup")
    assert re.search(r"BroadcastHashJoin LeftSemi", plan), plan
    assert "CartesianProduct" not in plan, plan
    # the only non-broadcast join is the |groups|-row full-outer patch
    # (tree lines carry the join type: "SortMergeJoin FullOuter (56)")
    non_broadcast = re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin) (\w+) \(\d+\)", plan
    )
    assert non_broadcast and all(t == "FullOuter" for t in non_broadcast), plan


def test_scoped_minmax_recompute_plan(spark, sf_dir):
    """The min/max rollup arm's load-bearing scale claim (round 12,
    VERDICT r11 #5): the scoped recompute touches the fact table
    through (a) a PUSHED-DOWN In/IsNull filter on the leading group
    value — row-group skipping on a group-clustered target — and (b) a
    broadcast null-safe LEFT-SEMI join for composite exactness; the
    target is never shuffled and never fully scanned."""
    from pyspark.sql import functions as F

    from migrator_spark.operators.maintenance import scoped_minmax_recompute
    from migrator_spark.tables import load_table

    target = load_table(spark, sf_dir, "customer")
    groups = (
        target.select("c_mktsegment").distinct().limit(2)
    )
    leads = [r[0] for r in groups.collect()]
    df = scoped_minmax_recompute(
        target, spark.createDataFrame([(v,) for v in leads], "c_mktsegment string"),
        ["c_mktsegment"], "c_acctbal", "max", leads,
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    pushed = " ".join(
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    )
    assert "In(c_mktsegment" in pushed, plan
    assert re.search(r"BroadcastHashJoin LeftSemi", plan), plan
    assert "CartesianProduct" not in plan, plan
    # the fact side reaches the aggregate without an exchange below it
    body = plan.split("AdaptiveSparkPlan")[0]
    assert "SortMergeJoin" not in body, plan
