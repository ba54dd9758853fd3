"""Physical-plan regression guards: the properties that make the
engine scale must be visible in `.explain` and stay there.

- fused extraction: exactly ONE Python (MapInPandas) stage, ZERO
  shuffles when the input is already wide;
- predicate pushdown + column pruning reach the parquet scan;
- the broadcast join stays broadcast.
"""
import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _nodes(plan: str) -> list[str]:
    """Node names from the formatted plan's detail section."""
    return [
        m.group(1)
        for ln in plan.splitlines()
        if (m := re.match(r"\(\d+\) ([A-Za-z]+)", ln))
    ]


def test_fused_extraction_plan_shape(spark, pages_df, cfg):
    from document_extractor_spark.pipeline import run_extraction

    wide = pages_df.repartition(16)  # already-wide input: no rebucket
    res = run_extraction(spark, wide, cfg, persist=False)
    nodes = _nodes(_plan(res.extracted))
    assert nodes.count("MapInPandas") == 1  # ONE Python stage
    # everything downstream of the Python stage is shuffle-free
    # (nodes are listed leaf -> root in the detail section)
    idx = nodes.index("MapInPandas")
    assert "Exchange" not in nodes[idx + 1:]


def test_filter_pushdown_and_pruning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("n_chars") > 300).select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,300)]" \
        in plan
    # column pruning: text (the big column) must not be read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0]


def test_broadcast_join_stays_broadcast(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    q = (orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
         .groupBy("n_name").count())
    plan = _plan(q)
    assert _nodes(plan).count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_no_query_plans_unexpected_nested_loop(spark):
    """Every registered driver query must avoid nested-loop joins,
    except the exact all-pairs baselines listed in plan_inventory."""
    import __spark_entry__ as E
    from scripts.plan_inventory import EXPECTED_NESTED_LOOP

    offenders = []
    for name, fn in E.queries().items():
        plan = fn(spark, "/root/testdata/sf0.001")._jdf \
            .queryExecution().executedPlan().toString()
        nl = ("BroadcastNestedLoopJoin" in plan
              or "CartesianProduct" in plan)
        if nl and name not in EXPECTED_NESTED_LOOP:
            offenders.append(name)
    assert not offenders, offenders


def test_partition_pruning_on_partitioned_output(spark, tmp_path):
    """The at-scale output layout: extracted table partitioned by a
    low-cardinality column; a filtered read must prune partitions at
    plan time (PartitionFilters), scanning only matching directories."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    q = spark.read.parquet(out).filter(F.col("lang") == "en") \
        .select("doc_id")
    plan = _plan(q)
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and "lang" in part[0], plan
    # pruned read: only the lang=en directory is listed in the scan
    import os
    dirs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(dirs) > 1  # the data has multiple langs to prune away
    n_en = q.count()
    assert 0 < n_en < docs.count()


def test_round3_operator_plan_budgets(spark):
    """Shuffle/Python-stage budgets for the round-3 operators, pinned
    so a refactor can't silently regress the plan shape (SCALE.md is
    generated per-round; this fails at pytest time instead)."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    budgets = {
        # query: (max exchanges, max python stages)
        "pii_redact": (0, 0),
        "gopher_quality": (0, 0),
        "script_profile": (0, 0),
        "stratified_sample": (1, 0),
        "line_boilerplate_strip": (4, 0),
        "tfidf_topk": (4, 0),
        "gopher_repetition": (5, 0),
        "blocklist_filter": (1, 0),
        "domain_reputation_filter": (1, 0),
        "dup_window_spans": (3, 0),
        "strip_dup_spans": (3, 0),
        "decontaminate": (3, 0),
        "token_budget_sample": (3, 0),
        # continuation additions: WARC explode pays 1 shuffle + 2
        # Arrow stages only because the fixture PACKS the files
        # in-job; production input arrives pre-packed (scan + 1 stage)
        "warc_ingest": (1, 2),
        "jsonl_shard_plan": (0, 0),
        # checkpointed fused mode: the registered query's plan is a
        # checkpoint scan; the LIVE plan is budgeted in
        # test_checkpointed_operators_live_plan_budgets below
        "charlm_cross_entropy": (0, 0),
        "temperature_mix_sample": (0, 0),
        # 5 = training lineage (printed through the cached weight
        # scan) + the one scoring groupBy; only 2 touch the corpus
        "nb_quality_classifier": (5, 0),
        # returned plan = checkpoint scan (components) + docs join;
        # the LIVE candidate/verify plan is budgeted in SCALE.md
        "minhash_dedup_pipeline": (2, 0),
        # one mapInPandas decode kernel, zero shuffles
        "media_features": (0, 1),
        # one mapInPandas frame-explode kernel, zero shuffles
        "media_frames": (0, 1),
        # one window shuffle on the stratum key
        "eval_holdout": (1, 0),
        # one Arrow NFC kernel, zero shuffles
        "unicode_nfc": (0, 1),
        # r5 de-skew: charlm + histogram are checkpoint scans, the
        # corpus joins the broadcast histogram, and the ONLY counted
        # exchange is the boundary tie-group row_number window
        # (partitioned by (lang, score) — never a lang-wide sort)
        "ccnet_buckets": (1, 0),
        "c4_filters": (0, 0),
        # 2 sig groupBys + seen-bucket cap + bucket join + 2 tokset
        # joins + dup groupBy + final left join (AQE coalesces)
        "incremental_minhash": (10, 0),
        # pipeline runs over the seeded corpus; salvage rides inside
        # the ONE office Arrow stage (no extra exchange or kernel)
        "office_salvage": (2, 3),
        "domain_link_graph": (1, 0),
        # 2: count(DISTINCT anchor) pays the standard two-phase
        # distinct-aggregate exchange on the domain-bounded rows
        "anchor_text_index": (2, 0),
        # 3 Arrow stages = WARC pack (fixture-only) + WARC parse +
        # the ONE extraction kernel; 2 exchanges = pack grouping +
        # the pipeline's url-hash bucketing
        "crawl_to_corpus": (2, 3),
        # 1 = the dim-side rules groupBy; the corpus side is
        # shuffle-free (broadcast rule arrays + per-row aggregate)
        "robots_filter": (1, 1),
        "cdc_chunks": (0, 1),
        "corpus_overview": (1, 0),
        "dom_blocks": (0, 1),
        # 0 exchanges: the dim<=60 fast path is a pure projection
        # (packed md5-prefix array + per-dim integer folds) — pinned
        # at zero so the token-explode shuffle can't silently return
        "hashed_embeddings": (0, 0),
        # 2: skew-safe two-phase top-k — phase-1 exchange keys on
        # (source, doc_id-hash bucket); phase-2 re-ranks only the
        # <= B*k survivors per source, so neither sorts a
        # source-wide partition
        "top_docs_per_source": (2, 0),
        # weights materialize behind a localCheckpoint at build time
        # (1 corpus explode + B-bounded model groupBy); the returned
        # plan is the checkpoint scan + skew-safe top-k selection
        "dsir_select": (1, 0),
        # decision materializes at build (checkpointed); returned
        # plan is the checkpoint scan
        "semdedup": (0, 0),
        # same checkpoint-at-build shape: the two-phase per-cluster
        # top-cap + keep-flag join run eagerly, the returned plan is
        # the checkpoint scan
        "cluster_balanced_sample": (0, 0),
        # 3 exchanges: (term,doc) tf groupBy, term df groupBy +
        # capped-join re-shuffle, posting groupBy (collect bounded at
        # max_df structs); AQE coalesces
        "inverted_index": (4, 0),
        # corpus groupBy(lang) runs eagerly at build (dim-bounded
        # collect); the returned plan is a local scan of the
        # languages-sized allocation table
        "unimax_mix": (0, 0),
        # word table materializes at build (checkpoint); the probe is
        # k broadcast joins — the corpus NEVER shuffles
        "bloom_seen_filter": (0, 0),
        # + the one groupBy(doc) rollup of per-line flags
        "bloom_paragraph_dups": (1, 0),
        # fused render+decode kernel: one Arrow stage, zero shuffles
        "ocr_roundtrip": (0, 1),
        "ocr_best_of_rotations": (0, 1),
        # weights materialize at build (B-bounded model collect +
        # one doc rollup); returned plan is the checkpoint scan
        "softdedup_weights": (0, 0),
        # pure JVM string expressions; the writer adds the one shard
        # shuffle, the plan itself is shuffle-free
        "wet_export": (0, 0),
        # stats pass collects 1 row at build; returned plan is a
        # projection + TakeOrdered (per-partition heap, no shuffle)
        "bm25_topk": (0, 0),
        # closure is a checkpoint scan; 6 = docs⋈comp (2) +
        # groupBy(component) argmax (1) + labeled⋈best (2) + AQE
        # re-split — every key uniform (node / component)
        "quality_keeper_dedup": (6, 0),
        # r5: pipeline bucketing exchange + the ONE fused extraction
        # kernel; the CSV render itself is pure JVM string work
        "csv_index_export": (1, 1),
        # r5: one groupBy on the run key (map-side combined counters)
        "single_file_naming": (1, 0),
        # checkpoint scan (live plan budgeted separately, see below)
        "heavy_hitters": (0, 0),
        # iterations run at build time over dim tables; the returned
        # plan is a checkpoint scan
        "link_pagerank": (0, 0),
    }
    qs = em.queries()
    for name, (max_ex, max_py) in budgets.items():
        plan = qs[name](spark, sf)._jdf.queryExecution() \
            .executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning") + \
            plan.count("Exchange rangepartitioning")
        n_py = sum(plan.count(m) for m in
                   ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas"))
        assert n_ex <= max_ex, f"{name}: {n_ex} exchanges > {max_ex}"
        assert n_py <= max_py, f"{name}: {n_py} python stages > {max_py}"
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in plan, f"{name}: {bad} in plan"
        if name in ("blocklist_filter", "domain_reputation_filter"):
            # the dim side must broadcast — a SortMergeJoin here
            # means the corpus is being shuffled for a tiny table
            assert "BroadcastHashJoin" in plan, f"{name}: no broadcast"
            assert "SortMergeJoin" not in plan, f"{name}: SMJ crept in"


def test_checkpointed_operators_live_plan_budgets(spark):
    """The registered queries for charlm / heavy_hitters return
    checkpoint scans (0 exchanges by construction), which would make
    their budget rows vacuous — so the LIVE pre-checkpoint plans are
    budgeted here via checkpoint_result=False."""
    from document_extractor_spark.functions.charlm import (
        bigram_cross_entropy)
    from document_extractor_spark.operators.heavyhitters import (
        heavy_hitters)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def _counts(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning") + \
            plan.count("Exchange rangepartitioning")
        n_py = sum(plan.count(m) for m in
                   ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas"))
        return n_ex, n_py

    # fused charlm: pairs agg + doc agg over the corpus; no Python
    n_ex, n_py = _counts(bigram_cross_entropy(
        docs, checkpoint_result=False))
    assert n_ex <= 3 and n_py == 0, (n_ex, n_py)

    # heavy hitters: ONE Arrow stage (the sketch), exchanges only on
    # the dim-sized summaries (merge + top-k window)
    n_ex, n_py = _counts(heavy_hitters(
        docs, capacity=4096, k=5, checkpoint_result=False))
    assert n_ex <= 3 and n_py == 1, (n_ex, n_py)

    # cluster-balanced sampling LIVE plan: zero-shuffle embeddings +
    # literal-centroid assignment, 2 two-phase top-cap windows, and
    # the keep-flag join — all JVM, and never a nested-loop join
    from document_extractor_spark.operators.semdedup import (
        cluster_balanced_sample)

    live = cluster_balanced_sample(
        docs, cap=5, dim=8, k=4, checkpoint_result=False)
    n_ex, n_py = _counts(live)
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert n_ex <= 5 and n_py == 0, (n_ex, n_py)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
