"""Whole-registry fact-scan budget: one scan per fact table per query.

Round-4 audit found Spark RE-EXPANDS a CTE (or self-referenced frame) at
every reference — no automatic materialization like DuckDB — so several
queries silently scanned a fact table twice (b51/b53/b70/b75/b28/b36/
b67/b82/b85, all since rewritten to window forms or explicit
materialization). This sweep keeps the class extinct: any registered
query that scans a fact table more than once must either be on the
justified allowlist below or get the b86 treatment.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark import registry

FACT_TABLES = ("events.parquet", "lineitem.parquet", "documents.parquet",
               "embeddings.parquet")

# Queries where >1 scan of one fact table is the SEMANTICS, not a plan
# accident. Each entry needs a reason.
ALLOWED_MULTI_SCAN = {
    "b12_set_ops_all": "INTERSECT/EXCEPT ALL compare differently-filtered slices of the same table",
    "b12_set_ops": "set ops over differently-filtered slices",
    "b15_hll_union": "comparative by design: sketch-of-partials vs direct sketch over the same rows",
    "b20_pivot": "pivot value discovery (Spark runs a values scan) + the pivot aggregate",
    "b28_gap_fill": "ONE physical scan at runtime: the hourly aggregate is a lazy persist() shared by spine and join, and the plan TEXT prints the cached relation's parquet provenance under each InMemoryTableScan (an eager localCheckpoint would hide it but runs a job at plan-build time)",
    "b30_range_join": "clicks and purchases are two logical relations stored in one table (filter-pruned scans)",
    "b71_q17_small_quantity": "per-part AVG threshold: 2 pruned scans beat a full fact shuffle (the window form would sort the raw facts)",
    "b73_q21_waiting_supplier": "EXISTS + NOT EXISTS genuinely probe lineitem as separate relations (every engine's Q21 does)",
    "c02_minhash_lsh": "candidate self-join: both sides of the band-bucket join are the corpus (persisted-index path avoids it in production)",
    "c02_ngram_jaccard": "inverted-index self-join (ground-truth variant)",
    "c02_ngram_jaccard_pruned": "pruned inverted-index self-join + df-statistics pass",
    "c02_simhash": "signature self-join across chunk blocks",
    "c02_substring_dedup": "span-hash inverted-index self-join",
    "c02_dedup_clusters": "pair generation + iterative closure read the corpus per round (localCheckpoint bounds lineage, not scans)",
    "c02_near_dedup_corpus": "cluster build + keeper anti-join",
    "c03_ann_ivf": "index build + probe in one query (persisted-index path save_ivf_index avoids it)",
    "c03_ann_lsh": "corpus and query signatures derive from the same table",
    "c03_cosine_topk": "queries are a subset of the corpus (self-join by design)",
    "c03_embedding_near_dup": "upper-triangle self-join (exact ground truth)",
    "c03_filtered_topk": "queries subset vs corpus self-join",
    "c03_pq_topk": "inline train+encode+rerank (persisted path save_pq_index avoids it)",
    "c03_semdedup": "cell assignment + within-cell pair self-join (persisted index in production)",
    "c03_semdedup_exact": "all-pairs ground truth self-join",
    "c04_decontaminate": "train corpus vs eval-set shingle index are different logical relations in documents",
    "c04_tfidf_terms": "1-row corpus-count scan (zero-column) besides the term scan",
    "c04_unigram_logprob": "corpus-as-LM: vocabulary pass + scoring pass share the collapsed index, plus a 1-row total",
    "c08_distribution_drift": "two dataset versions are two filtered slices of documents",
    "c08_quantile_bucketize": "exact-percentile bounds pass + assignment pass (bounds broadcast back; 2 scans beat a fact shuffle)",
    "c04_boilerplate_removal": "line-DF boilerplate-set pass + rebuild pass (offending set joined back; 2 scans beat materializing the line table)",
    "c08_split_leakage": "train vs val/test are two filtered slices",
}


def test_every_query_within_fact_scan_budget(spark, sf_dir):
    offenders = {}
    for name, fn in registry.full_queries().items():
        fn = getattr(fn, "__wrapped__", fn)
        df = fn(spark, sf_dir)
        if not hasattr(df, "_jdf"):
            # visible skip, not `return`: a silent early return would
            # report success having audited zero plans
            pytest.skip("Connect session: executed-plan asserts unavailable")
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {t: plan.count(t) for t in FACT_TABLES}
        if any(c > 1 for c in counts.values()) and name not in ALLOWED_MULTI_SCAN:
            offenders[name] = {t: c for t, c in counts.items() if c > 1}
    assert not offenders, (
        f"fact table scanned more than once (CTE re-expansion? see b86 "
        f"docstring for the fix patterns): {offenders}"
    )


def test_allowlist_has_no_stale_entries(spark, sf_dir):
    """Every allowlisted query must still exist and still multi-scan —
    otherwise the justification is stale and the entry hides regressions."""
    full = registry.full_queries()
    stale = [n for n in ALLOWED_MULTI_SCAN if n not in full]
    assert not stale, f"allowlisted queries no longer registered: {stale}"
