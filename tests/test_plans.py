"""Physical-plan contracts for the headline queries (SURVEY.md §4:
the rebuild's optimizer work is physical design, so de-optimizations
must fail CI even when results stay correct).

All assertions are on the static (pre-AQE) plan at sf0.01 — the same
plan shape Catalyst would emit at any SF; only runtime sizes change.
"""

from __future__ import annotations

import pytest

from fenix_spark.plans import (
    assert_plan,
    broadcast_join_count,
    partition_filters,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)
from fenix_spark.suite import SPARK_QUERIES

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def q(spark):
    def build(name):
        return SPARK_QUERIES[name](spark, SF01)

    return build


def test_knn_is_single_pass_no_shuffle(spark, q):
    """C1 brute-force KNN must compile to scan → project → local top-k
    (TakeOrderedAndProject): zero exchanges, and the scan reads only
    the vector + selected columns."""
    df = q("knn_metrics")  # union of 3 metric arms, each its own local top-k
    assert shuffle_count(df) == 0
    assert_plan(df, scan_columns_subset_of={"vec_id", "label", "embedding"})


def test_scan_filter_project_pushes_everything(spark, q):
    assert_plan(
        q("scan_filter_project"),
        max_shuffles=0,
        pushed_contains=(
            "GreaterThanOrEqual(l_shipdate",
            "LessThan(l_shipdate",
            "LessThan(l_quantity",
        ),
        scan_columns_subset_of={
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        },
    )


def test_tpch_q1_single_shuffle_with_pushdown(spark, q):
    """Partial aggregation: one exchange moving |groups|·|partitions|
    rows; the date cutoff reaches the parquet reader."""
    assert_plan(
        q("tpch_q1"),
        max_shuffles=1,
        pushed_contains=("LessThanOrEqual(l_shipdate",),
    )


def test_tpch_q3_broadcasts_dims_single_shuffle(spark, q):
    df = q("tpch_q3")
    assert shuffle_count(df) == 1  # lineitem⋈orders on l_orderkey
    assert broadcast_join_count(df) >= 1  # customer broadcast


def test_tpch_q5_broadcasts_all_dims_single_shuffle(spark, q):
    """6-way join: every dimension broadcast; the single shuffle is
    lineitem⋈orders — the only two fact-scale tables."""
    df = q("tpch_q5")
    assert shuffle_count(df) == 1
    assert broadcast_join_count(df) == 5


def test_window_queries_single_shuffle(spark, q):
    """group_topn (retired from the oracle in rotation #10 but its
    plan contract stays pinned) and sessionize each partition once and
    reuse that partitioning for every window pass + the final groupBy."""
    from fenix_spark.suite import _group_topn

    assert shuffle_count(_group_topn(spark, SF01)) == 1
    assert shuffle_count(q("sessionize")) == 1


def test_ivf_probe_prunes_partitions_physically(spark, q):
    """C2's cell pruning must be PartitionFilters (directories never
    read), not a post-scan filter — the 100 TB win of writing the
    index partitioned by __CODED_ID__."""
    df = q("ivf_probe_search")
    parts = " ".join(partition_filters(df))
    assert "__CODED_ID__" in parts and "INSET" in parts
    assert shuffle_count(df) == 0


def test_knn_filtered_pushes_label_filter(spark, q):
    pushed = " ".join(pushed_filters(q("knn_filtered")))
    assert "EqualTo(label,3)" in pushed.replace(" ", "") or "label" in pushed


def test_column_pruning_never_reads_text_for_stats(spark, q):
    """text_stats aggregates lang/n_chars only — the scan must not
    read the (wide) text column. (The query rotated out of the oracle
    suite in r6 but the pruning contract stays pinned.)"""
    from fenix_spark.suite import _text_stats

    for cols in read_schema_columns(_text_stats(spark, SF01)):
        assert "text" not in cols


def test_exact_dedup_one_shuffle_per_arm(spark, q):
    # merged query: one groupBy(text) arm + one groupBy(hash) arm
    assert shuffle_count(q("exact_dedup")) == 2


def test_ivfpq_search_prunes_partitions_and_stays_shuffle_free(spark, q):
    """The r4 oracle row's plan contract: every arm prunes coarse
    cells as PartitionFilters (the two-level layout's point), and the
    3-arm union introduces no exchange — ADC is a pure projection
    over (id, fine code), rerank joins via broadcast."""
    df = q("ivfpq_search")
    parts = " ".join(partition_filters(df))
    assert "__CODED_ID__" in parts and "INSET" in parts
    assert shuffle_count(df) == 0
    assert broadcast_join_count(df) >= 1  # the rerank shortlist join


def test_decontamination_broadcasts_bench_single_corpus_shuffle(spark, q):
    """Corpus text must never shuffle: the benchmark gram set joins as
    a broadcast; the only corpus-sized exchange is the per-doc hit
    aggregation (plus the tiny bench-side distinct)."""
    df = q("decontamination")
    assert broadcast_join_count(df) >= 1
    # 3 = per-doc hit aggregation + bench-side distinct + the corpus
    # spread (r13: the gram pass was serializing on one-file inputs;
    # the round-robin exchange is a no-op at real scale). Corpus TEXT
    # still never shuffles — the exchange carries (doc_id, text) rows
    # once, pre-hash, instead of a single task doing all hashing.
    assert shuffle_count(df) <= 3
    for scan_cols in read_schema_columns(df):
        assert scan_cols <= {"doc_id", "text"}  # pruned scans


def test_multimodal_features_expression_only_after_decode(spark, q):
    """One Arrow-batched decode pass, then native stats — no extra
    shuffle, no row-wise Python eval."""
    df = q("multimodal_features")
    assert shuffle_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_bm25_search_pruned_broadcasts_bounded_shuffles(spark, q):
    """BM25 query plan: the postings build pays its aggregation
    shuffles; the QUERY side must stay broadcast (query terms +
    per-term stats are tiny) — a sort-merge join on term would mean
    the pruned-broadcast contract regressed."""
    df = q("bm25_search")
    assert broadcast_join_count(df) >= 2  # q_terms semi-join + stats join
    assert shuffle_count(df) <= 4  # tf agg, dl window, df agg, top-k


def test_ivf_batch_search_both_arms_equi_join_no_cartesian(spark, q):
    """The two-arm batch search (64-cell expr path + 65,536-cell beam
    path) must stay pure equi-joins: no cartesian/BNL anywhere, and
    the small arm's probe derivation adds no aggregation beyond the
    beam arm's two shortlist folds + the two per-query top-k windows."""
    df = q("ivf_batch_search")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 8


def test_hybrid_search_arms_stay_local_topk(spark, q):
    """RRF fusion joins two ≤50-row ranked frames: the vector arm must
    stay a no-shuffle TakeOrderedAndProject feeding the fusion, and
    nothing in the plan may degrade to a cartesian/BNL join."""
    df = q("hybrid_search")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # at least the knn arm
    # postings build (tf/dl/df aggs) + 2 rank windows + fusion join +
    # final top-k: bounded, and every join keyed
    assert shuffle_count(df) <= 10


def test_dedup_keep_list_all_joins_keyed(spark, q):
    """Components + survivor anti-join must stay keyed equi-joins over
    (id, label) longs — no cartesian/BNL, and the document payload
    column is never read by the pair/label side (column pruning: the
    anti-join side reads ids only)."""
    df = q("dedup_keep_list")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_substring_dedup_keyed_joins_no_cartesian(spark, q):
    """ExactSubstr under the oracle: window hashing must stay inside
    the scan (no Python in the plan), every join keyed — a cartesian
    or BNL anywhere is quadratic in corpus size."""
    df = q("substring_dedup")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan


def test_dsir_scores_broadcasts_ratio_table(spark, q):
    """DSIR scoring: the B-row log-ratio table must broadcast (never
    shuffle the corpus-sized gram stream against it), the per-doc sum
    must partial-aggregate map-side, and no Python in the plan."""
    df = q("dsir_scores")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert broadcast_join_count(df) >= 1
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan


def test_paragraph_dedup_keyed_joins_no_cartesian(spark, q):
    """CCNet paragraph dedup: canonical-owner decision joins on phash,
    rebuild joins on id — all keyed; paragraph text must never cross a
    cartesian, and the scan reads only (doc_id, text)."""
    df = q("paragraph_dedup")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_plan(df, scan_columns_subset_of={"doc_id", "text"})


def test_hist_quantiles_summary_sized_native(spark, q):
    """Histogram-sketch quantiles: ONE data-sized shuffle (the
    partial-agg rollup groupBy — everything after it operates on ≤
    bins rows per group), no Python anywhere, and the scan reads only
    (event_type, value, …ts for the table's encoding detection)."""
    df = q("hist_quantiles")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # rollup partial+final agg pair present; every join/window after
    # it is summary-sized (bins rows/group), never a cartesian
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    assert_plan(df, scan_columns_subset_of={"event_type", "value", "ts"})


def test_gapfill_keyed_join_grid_sized_windows(spark, q):
    """Gap fill: sparse agg partial-aggregates; the dense join is
    keyed (key, bucket_ms) — never nested-loop; the locf window runs
    over grid-sized rows. Scan reads only (event_type, ts, value)."""
    df = q("gapfill_timeseries")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    assert_plan(df, scan_columns_subset_of={"event_type", "ts", "value"})


def test_priority_sample_bounded_phases_no_cartesian(spark):
    """Priority sample (oracle row r8–r11; rotated out for epoch_sample
    in r12 — the OPERATOR keeps its plan contract): the scan reads only
    (doc_id, source, n_chars); the heavy lifting is the two bounded
    sketch phases (Arrow partials + per-group re-selection — the only
    stages that see data-sized input emit ≤ k+1 rows per group per
    batch); the take is native windows over the summary. Never a
    cartesian or nested-loop join."""
    from pyspark.sql import functions as F

    from fenix_spark.operators.sampling import priority_sample, priority_take

    docs = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .select("doc_id", "source", "n_chars")
    )
    state = priority_sample(docs, ["source"], "doc_id", "n_chars", 20)
    df = priority_take(state, ["source"], "doc_id", "n_chars", 20).select(
        "source", "doc_id", F.round(F.col("sample_est"), 6).alias("sample_est")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the two Arrow phases of the sketch-family contract
    assert "MapInPandas" in plan or "mapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert_plan(df, scan_columns_subset_of={"doc_id", "source", "n_chars"})


def test_cohort_retention_single_event_shuffle(spark, q):
    """Cohort retention (r8 s3 oracle rotation, percentile_stats out):
    the event stream is keyed exactly once (the user/day distinct);
    the first-day window reuses that partitioning; the denominator
    join is broadcast over summary rows. Scan reads only (user_id,
    ts); fully native — and the plan LINTER agrees end-to-end."""
    from fenix_spark.plans.lint import assert_clean_plan

    df = q("cohort_retention")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    assert_plan(
        df,
        min_broadcast_joins=1,
        scan_columns_subset_of={"user_id", "ts"},
    )
    assert_clean_plan(df)


def test_heavy_hitters_bounded_shuffles_broadcast_candidates(spark, q):
    """Heavy hitters (r9 oracle rotation, ngram_jaccard_topk out):
    pass 1 folds per-partition Misra-Gries summaries inside one Arrow
    pass (the term universe never shuffles raw — only ≤ m rows per
    partition reach the candidate groupBy); pass 2's exact count joins
    the candidate set via BROADCAST, and the scan reads only the text
    column. No cartesian, no row-UDF."""
    df = q("heavy_hitters")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is the deliberate 1-row count_floor
    # broadcast (r13: the floor moved into the plan so the MG pass no
    # longer runs eagerly at build time); anything more is a regression
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BatchEvalPython" not in plan
    assert_plan(
        df,
        min_broadcast_joins=1,
        scan_columns_subset_of={"text"},
    )


def test_drift_psi_summary_sized_native(spark, q):
    """Distribution drift (r9 oracle rotation, time_rollup out): each
    side folds to per-(source, lang) counts with a partial-agg groupBy
    — the full-outer compare join and every log-term computation run
    over summary rows (≤ sources × langs). Fully native (no Python in
    the plan), scan reads only (doc_id, source, lang), and the plan
    linter is clean modulo the documented %2-split allowance."""
    from fenix_spark.plans.lint import assert_clean_plan

    df = q("drift_psi")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    assert_clean_plan(df, allow=("filter-not-pushed",))
    assert_plan(df, scan_columns_subset_of={"doc_id", "source", "lang"})


def test_epoch_sample_zero_shuffles(spark, q):
    """epoch_sample (r12 oracle rotation): full epochs are a row-local
    explode, the fractional epoch an md5-bucket filter — ZERO
    exchanges at any scale, scan reads only doc_id."""
    df = q("epoch_sample")
    assert shuffle_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "InPandas" not in plan and "mapInPandas" not in plan
    assert_plan(df, scan_columns_subset_of={"doc_id"})


def test_triangle_counts_id_keyed_equijoins_only(spark, q):
    """triangle_counts (r13 oracle rotation #9, fingerprints out): the
    degree-ordered wedge enumeration must stay a cascade of id-keyed
    EQUI-joins — no cartesian, no broadcast-nested-loop, no Python in
    the plan — and the lineitem scan reads only the three columns the
    edge derivation needs, with the l_quantity cut pushed to the scan.
    Shuffle rows are ids + one degree long, never payloads; the count
    is bounded so a wider rewrite fails CI even if results stay
    correct."""
    df = q("triangle_counts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "InPandas" not in plan
    assert shuffle_count(df) <= 7
    assert_plan(
        df,
        scan_columns_subset_of={"l_orderkey", "l_partkey", "l_quantity"},
    )
    # the thinning predicate reaches the parquet scan — asserted on
    # the edge-derivation subtree, because the operator's
    # localCheckpoint truncates lineage and hides the scan from the
    # final plan string
    from pyspark.sql import functions as F

    from fenix_spark import suite

    li = (
        suite.table(spark, SF01, "lineitem")
        .where(F.col("l_quantity") <= 15)
        .select("l_orderkey", "l_partkey")
    )
    assert any("l_quantity" in f for f in pushed_filters(li))


def test_markov_transitions_single_window_summary_sized(spark):
    """markov_transitions (rotation #10, promoted r13): one lead window
    per user (the only row-volume shuffle) into a partial-aggregable
    (from, to) count — the output is ≤ |states|² rows; no cartesian,
    no Python, scan reads only (user_id, ts, event_type)."""
    from fenix_spark.suite import _markov_transitions

    df = _markov_transitions(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "InPandas" not in plan
    assert shuffle_count(df) <= 4
    assert_plan(df, scan_columns_subset_of={"user_id", "ts", "event_type"})


def test_doc_chunks_scan_local_no_python(spark):
    """doc_chunks (STAGED for rotation #11): sequence → transform →
    substring explode where the text lives — scan-speed map work. The
    only exchange allowed is the oracle-stability orderBy; no Python,
    no cartesian, scan reads only (doc_id, text)."""
    from fenix_spark.suite import _doc_chunks

    df = _doc_chunks(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "InPandas" not in plan
    assert shuffle_count(df) <= 1
    assert_plan(df, scan_columns_subset_of={"doc_id", "text"})


def test_oov_coverage_broadcast_vocab_no_python(spark):
    """oov_coverage (STAGED for rotation #12): the derived top-1000
    vocab is summary-sized (TakeOrderedAndProject) and ships back as a
    BROADCAST join — document text never shuffles; per-doc counting is
    partial-aggregable. No Python, no cartesian, bounded exchanges,
    scan reads only (doc_id, text)."""
    from fenix_spark.suite import _oov_coverage

    df = _oov_coverage(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "InPandas" not in plan
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in plan or shuffle_count(df) <= 8
    assert shuffle_count(df) <= 8
    assert_plan(df, scan_columns_subset_of={"doc_id", "text"})
