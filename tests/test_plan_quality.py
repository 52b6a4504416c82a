"""Physical-plan assertions: the optimizations we claim must be visible in
`.explain` — predicate pushdown, column pruning, broadcast joins, partition
pruning. A plan that silently regresses to full scans or shuffle joins fails
here even if results stay correct."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-plan-tests")
        .getOrCreate()
    )
    yield s


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF = "/root/testdata/sf0.01"


def test_bm25_broadcasts_term_df(spark):
    import __spark_entry__ as entry

    df = entry.queries()["bm25_topk"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:500]
    assert "SortMergeJoin" not in plan


def test_top_customers_broadcast_join(spark):
    import __spark_entry__ as entry

    df = entry.queries()["top_customers"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_relational_pushdown_and_pruning(spark):
    # a filtered projection over orders must push the predicate to parquet
    # and read only the projected columns
    o = spark.read.parquet(f"{SF}/orders.parquet")
    q = o.filter("o_totalprice > 1000").select("o_orderkey", "o_totalprice")
    plan = plan_of(q)
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice,1000" in plan
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "o_custkey" not in rs and "o_orderdate" not in rs


def test_whole_stage_codegen_covers_scoring(spark):
    import __spark_entry__ as entry

    df = entry.queries()["bm25_topk"](spark, SF)
    df.collect()  # materialize so AQE finalizes the plan
    plan = plan_of(df)
    # whole-stage codegen spans render as "*(n)" in the tree string; the
    # scoring expression (LOG1P(...)) must sit inside one
    assert "*(" in plan
    assert "LOG1P" in plan
    # partial aggregation before the shuffle (map-side combine)
    assert "partial_sum" in plan


def test_segment_store_partition_pruning(spark, tmp_path):
    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index, _token_bucket

    out = str(tmp_path / "idx")
    df = spark.createDataFrame(generate_corpus(200, 42))
    build_index(spark, df, out, num_shards=1, num_buckets=8, verify_sha=False)

    from pyspark.sql import functions as F

    seg = spark.read.parquet(f"{out}/segments")
    b = _token_bucket("import", 8)
    q = seg.filter(F.col("bucket") == b).filter(F.col("token") == "import")
    plan = plan_of(q)
    # hive partition pruning on bucket= and row-group pushdown on token
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    assert "bucket" in pf
    assert "EqualTo(token,import)" in plan


def test_tokenize_stage_reads_only_needed_columns(spark):
    import __spark_entry__ as entry

    # _postings projects (doc_id, text) before the UDF: lang/source/n_chars
    # must not be read from parquet
    p = entry._postings(spark, SF)
    plan = plan_of(p)
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" in rs and "doc_id" in rs
    assert "n_chars" not in rs and "source" not in rs


def test_jaccard_lsh_candidate_gated(spark):
    """The near-dup verify plan must never contain an all-pairs shingle
    self-join: every join touching `shingle` must also key on a doc pair
    column (the LSH candidate gate). Since r6 the candidate pairs are
    materialized (localCheckpoint) before the verify, so the final plan
    reads them as an ExistingRDD scan; the banding stage is asserted on
    the candidate-generation plan itself."""
    import __spark_entry__ as entry
    from sparkft import dedup as D

    # candidate generation: banding present, self-join keyed on bucket
    # with the d1 < d2 inequality gate
    cand = D.lsh_candidate_pairs(
        D.minhash_signatures(entry._shingles(spark, SF, distinct=False)))
    cplan = plan_of(cand)
    assert "bucket" in cplan
    assert "<" in cplan  # a.doc_id < b.doc_id pair gate

    # verify stage: every join touching `shingle` keys on a doc pair
    # column, and the materialized candidate set gates the plan
    df = entry.queries()["ngram_jaccard_pairs"](spark, SF)
    plan = plan_of(df)
    assert "ExistingRDD" in plan  # checkpointed candidates / shingles
    for line in plan.splitlines():
        if "Join" in line and "shingle" in line:
            assert ("d1" in line) or ("d2" in line) or ("doc_id" in line), line


def test_bm25_demo_caches_only_pruned_postings(spark):
    """The bm25 demo may persist ONLY the query-term-pruned postings
    (O(query postings) — the scale-safe reuse between the term-df branch
    and the scoring probe). The cached relation must sit ABOVE the token
    filter: an unfiltered cached corpus would be the round-1 anti-pattern."""
    import __spark_entry__ as entry

    df = entry.queries()["bm25_topk"](spark, SF)
    plan = plan_of(df)
    assert "InMemoryRelation" in plan  # the pruned-postings persist
    # the cached relation's lineage includes the token IN (...) filter,
    # so what is materialized is the pruned set, not the corpus
    mem = plan[plan.index("InMemoryRelation"):]
    assert "token#" in mem and " IN " in mem, mem[:500]


def test_winnow_single_hash_pass(spark):
    """The winnowing plan must hash each gram once (posexplode + window),
    not re-inline the gram array per window position."""
    import __spark_entry__ as entry

    df = entry.queries()["winnow_fingerprints"](spark, SF)
    plan = plan_of(df)
    assert "Window" in plan
    assert plan.count("md5") <= 4, plan.count("md5")


def test_embedding_near_dup_candidate_gated(spark):
    import __spark_entry__ as entry

    df = entry.queries()["embedding_near_dup"](spark, SF)
    plan = plan_of(df)
    assert "bucket" in plan  # banding stage present
    for line in plan.splitlines():
        # any join on embeddings columns must involve the candidate ids
        if "Join" in line and "bucket" not in line and " e" in line:
            assert "d1" in line or "d2" in line or "vid" in line, line


def test_filtered_search_broadcast_semi_join(spark):
    """The attribute filter must be a broadcast semi-join on the pruned
    postings, never a shuffle join or a corpus-wide pass."""
    import __spark_entry__ as entry

    df = entry.queries()["filtered_search_topk"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:800]
    assert "SortMergeJoin" not in plan


def test_facet_counts_pushdown_and_broadcast(spark):
    """Facet candidates broadcast; the documents scan reads only the facet
    columns it needs (column pruning visible in ReadSchema)."""
    import __spark_entry__ as entry

    df = entry.queries()["facet_counts"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    # the documents-side scan must not read the text column
    for line in plan.splitlines():
        if "ReadSchema" in line and "lang" in line:
            assert "text" not in line, line


def test_sorted_search_take_ordered(spark):
    """The sort rule must TakeOrdered over candidates, not global-sort the
    corpus."""
    import __spark_entry__ as entry

    df = entry.queries()["sorted_search_topk"](spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_proximity_positional_join_pruned(spark):
    """The proximity DataFrame mirror must filter tokens BEFORE the
    positional self-join (a token-pruned join, not all-pairs positions)."""
    import __spark_entry__ as entry

    df = entry.queries()["proximity_search_topk"](spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    # both join inputs are filtered on a token literal
    assert plan.count("merge") >= 1 and plan.count("sort") >= 1


def test_distinct_rule_single_window(spark):
    """distinctAttribute = ONE window over scored candidates (no second
    shuffle beyond the score agg + window partition)."""
    import __spark_entry__ as entry

    df = entry.queries()["distinct_search_topk"](spark, SF)
    plan = plan_of(df)
    assert plan.count("+- Window ") == 1, plan
    # the rn=1 filter must push into a group-limit (map-side top-1 per
    # attribute value), so the window never materializes whole groups
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_hybrid_broadcasts_keyword_side(spark):
    """hybrid_search_topk: the per-doc keyword scores and the 1-row max
    must BROADCAST into the embedding scan (they are query-footprint
    sized), and the embedding parquet scan must prune to the two columns
    the query needs — no sort-merge join, no full-width scan."""
    import __spark_entry__ as entry

    df = entry.queries()["hybrid_search_topk"](spark, SF)
    df.collect()  # materialize so AQE finalizes the plan
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # embeddings scan reads only vec_id + embedding
    emb_read = [ln for ln in plan.splitlines()
                if "ReadSchema" in ln and "embedding" in ln]
    assert emb_read and all("label" not in ln for ln in emb_read)


def test_repetition_metrics_single_projection(spark):
    """repetition_metrics must stay one per-row projection: no Generate
    (explode), no aggregation, no KEY shuffle. (The only Exchange allowed
    is ensure_parallelism's RoundRobin spread of the single-row-group demo
    parquet — a no-op on a real multi-split scan.)"""
    import __spark_entry__ as entry

    df = entry.queries()["repetition_metrics"](spark, SF)
    plan = plan_of(df)
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
    assert "Generate" not in plan
    assert "HashAggregate" not in plan


def test_minhash_single_key_shuffle_with_partial_agg(spark):
    """minhash_signatures must be exactly ONE doc_id key shuffle with
    map-side partial aggregation: the shingle hash is projected once per
    row (no per-permutation recompute visible as repeated md5 calls), and
    the 16 min-aggregates ride a single partial/final HashAggregate pair.
    A plan that re-shuffles per permutation or loses the partial agg
    fails here before it costs anything at scale."""
    import __spark_entry__ as entry

    df = entry.queries()["minhash_signatures"](spark, SF)
    plan = plan_of(df)
    assert plan.lower().count("hashpartitioning") == 1, plan[:800]
    # partial + final pair (partial_min shows in the partial aggregate)
    assert plan.count("HashAggregate") >= 2
    assert "partial_min" in plan
    # one md5 per row, not one per permutation
    assert plan.count("md5") <= 2, plan.count("md5")


def test_simhash_single_key_shuffle(spark):
    """simhash: token hashed ONCE PER HALF in a projection (2 md5 calls),
    then one doc_id aggregation — never 64 md5s per row."""
    import __spark_entry__ as entry

    df = entry.queries()["simhash"](spark, SF)
    plan = plan_of(df)
    assert plan.lower().count("hashpartitioning") == 1, plan[:800]
    assert plan.count("md5") <= 4, plan.count("md5")


def test_exact_dedup_partial_aggregated(spark):
    """exact dedup (hash-groupBy) keeps map-side combine: partial count
    before the key exchange."""
    import __spark_entry__ as entry

    df = entry.queries()["dedup_exact"](spark, SF)
    plan = plan_of(df)
    assert "partial_count" in plan or "partial_" in plan, plan[:800]


# --- r6 optimization shapes -------------------------------------------------


def test_pii_scan_spreads_before_regex(spark):
    """The regex projection must sit ABOVE a round-robin spread of the
    few-split demo scan (r6: it ran on 2 of N cores otherwise)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["pii_scan"](spark, SF))
    assert "RoundRobinPartitioning" in plan, plan[:800]


def test_positional_selfjoin_paths_spread(spark):
    """phrase_match / proximity_search_topk posexplode above the spread."""
    import __spark_entry__ as entry

    for q in ("phrase_match", "proximity_search_topk"):
        plan = plan_of(entry.queries()[q](spark, SF))
        assert "RoundRobinPartitioning" in plan, (q, plan[:500])


def test_embedding_near_dup_single_band_pass(spark):
    """The sign-LSH banding must be materialized once: the final plan reads
    the checkpointed bands (ExistingRDD) and contains NO MapInArrow node
    (r5's plan ran the band matmul twice, once per self-join side)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["embedding_near_dup"](spark, SF))
    assert "ExistingRDD" in plan
    assert "MapInArrow" not in plan, plan[:800]


def test_winnow_plan_unchanged_codegen_form(spark):
    """winnow keeps the explode+window md5 projection (the A/B-measured
    faster form) — no interpreted higher-order transform chain, no Python
    evaluation nodes."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["winnow_fingerprints"](spark, SF))
    assert "Window" in plan and "md5" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_merges_has_no_python_eval(spark):
    """learn_bpe_merges' per-round pair-count plan is pure JVM: the chained
    merge folds must not introduce Python evaluation nodes."""
    from pyspark.sql import functions as F

    from sparkft.corpus_ops import _merge_pair_col

    df = spark.createDataFrame(
        [(["a", "b", "a", "b"], 3)], "syms array<string>, freq long")
    out = df.select(_merge_pair_col(F.col("syms"), "a", "b").alias("syms"),
                    "freq")
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan
