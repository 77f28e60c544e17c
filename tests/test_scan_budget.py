"""Whole-registry fact-scan budget: one scan per fact table per query.

Round-4 audit found Spark RE-EXPANDS a CTE (or self-referenced frame) at
every reference — no automatic materialization like DuckDB — so several
queries silently scanned a fact table twice (b51/b53/b70/b75/b28/b36/
b67/b82/b85, all since rewritten to window forms or explicit
materialization). This sweep keeps the class extinct: any registered
query that scans a fact table more than once must either be on the
justified allowlist below or get the b86 treatment.

The counter walks the executed-plan TREE and counts physical scan leaf
nodes (round-6 hardening): substring-counting the printed plan text
misread a cached relation's parquet provenance as extra scans (the old
b28 allowlist entry) and is brittle across Spark versions' plan-text
formats. Cached relations (InMemoryTableScan) are charged ONCE per
distinct InMemoryRelation — the cache materializes its child scan a
single time at runtime no matter how many operators read the cache.
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
    "b15_hll_union": "comparative by design: sketch-of-partials vs direct sketch over the same rows",
    "b30_range_join": "clicks and purchases are two logical relations stored in one table (filter-pruned scans)",
    "b71_q17_small_quantity": "per-part AVG threshold: 2 pruned scans beat a full fact shuffle (the window form would sort the raw facts)",
    "b73_q21_waiting_supplier": "EXISTS + NOT EXISTS genuinely probe lineitem as separate relations (every engine's Q21 does)",
    "c02_minhash_lsh": "candidate self-join: both sides of the band-bucket join are the corpus (persisted-index path avoids it in production)",
    "c02_minhash_portable": "band-bucket self-join + Jaccard verify re-reads (md5 oracle twin of c02_minhash_lsh, same shape)",
    "c02_ngram_jaccard": "inverted-index self-join (ground-truth variant)",
    "c02_ngram_jaccard_pruned": "pruned inverted-index self-join + df-statistics pass",
    "c02_simhash": "signature self-join across chunk blocks",
    "c02_simhash_portable": "signature self-join across chunk blocks (md5-bit oracle twin, same shape)",
    "c02_substring_dedup": "span-hash inverted-index self-join",
    "c03_ann_ivf": "index build + probe in one query (persisted-index path save_ivf_index avoids it)",
    "c03_ivf_fixed_centroids": "assignment + probe + rerank in one query (oracle twin of c03_ann_ivf, same inline-index shape)",
    "c03_ann_lsh": "corpus and query signatures derive from the same table",
    "c03_cosine_topk": "queries are a subset of the corpus (self-join by design)",
    "c03_embedding_near_dup": "upper-triangle self-join (exact ground truth)",
    "c03_filtered_topk": "queries subset vs corpus self-join",
    "c03_pq_topk": "inline train+encode+rerank (persisted path save_pq_index avoids it)",
    "c03_pq_fixed_books": "inline encode+ADC+rerank (oracle twin of c03_pq_topk, same inline-index shape)",
    "c03_semdedup": "cell assignment + within-cell pair self-join (persisted index in production)",
    "c03_semdedup_exact": "all-pairs ground truth self-join",
    "c04_decontaminate": "train corpus vs eval-set shingle index are different logical relations in documents",
    "c04_decontaminate_verdicts": "fixture-sized inputs take the recompute branch of the size-gated materialize-once (cheaper than checkpoint IO below decon.materializeMinBytes; the gate test below pins both branches)",
    "c04_tfidf_terms": "1-row corpus-count scan (zero-column) besides the term scan",
    "c08_distribution_drift": "two dataset versions are two filtered slices of documents",
    "c08_quantile_bucketize": "exact-percentile bounds pass + assignment pass (bounds broadcast back; 2 scans beat a fact shuffle)",
    "c04_boilerplate_removal": "line-DF boilerplate-set pass + rebuild pass (offending set joined back; 2 scans beat materializing the line table)",
    "c08_split_leakage": "train vs val/test are two filtered slices",
}


def _scan_leaves(jnode, out, seen_caches):
    """Collect physical scan leaf nodes, descending through AQE wrappers
    and charging each distinct cached relation's child plan exactly once."""
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _scan_leaves(jnode.inputPlan(), out, seen_caches)
        return
    if cls == "InMemoryTableScanExec":
        rel = jnode.relation()
        # Two operators reading one cache hold distinct InMemoryRelation
        # COPIES sharing a single CachedRDDBuilder (observed on b28), so
        # the builder — not the relation — is the materialize-once unit.
        key = rel.cacheBuilder().hashCode()
        if key not in seen_caches:
            seen_caches.add(key)
            _scan_leaves(rel.cachedPlan(), out, seen_caches)
        return
    children = jnode.children()
    n = children.length()
    if n == 0:
        out.append(jnode)
        return
    for i in range(n):
        _scan_leaves(children.apply(i), out, seen_caches)


def _fact_scan_counts(df) -> dict[str, int]:
    """Count physical file scans per fact table in df's executed plan."""
    jplan = df._jdf.queryExecution().executedPlan()
    leaves: list = []
    _scan_leaves(jplan, leaves, set())
    counts = dict.fromkeys(FACT_TABLES, 0)
    for leaf in leaves:
        cls = leaf.getClass().getSimpleName()
        if cls == "FileSourceScanExec":
            paths = leaf.relation().location().rootPaths()
            texts = [paths.apply(i).toString() for i in range(paths.length())]
        elif "Scan" in cls and cls not in ("LocalTableScanExec",):
            # DSv2 / other scans: fall back to the node's own string,
            # which names its location without any cached-plan noise
            texts = [leaf.toString()]
        else:
            continue
        for t in FACT_TABLES:
            if any(t in s for s in texts):
                counts[t] += 1
    return counts


@pytest.fixture(scope="module")
def registry_scan_counts(spark, sf_dir):
    # Cache-hit plan substitution makes the raw-scan count depend on
    # whatever CacheManager entries earlier TESTS left behind (r13 find:
    # running the registry-contract atomic sweep first flipped four c10
    # counts from 1 to 2-3 — the builds hit/missed ambient persisted
    # edge frames differently). Start from a clean cache so the audited
    # counts are intrinsic to each build sequence, not to test order.
    # Cleared entries re-materialize on demand; only later tests' warm-up
    # cost is affected, never correctness.
    spark.catalog.clearCache()
    counts = {}
    for name, fn in registry.full_queries().items():
        fn = getattr(fn, "__wrapped__", fn)
        df = fn(spark, sf_dir)
        if not hasattr(df, "_jdf"):
            # visible skip, not `return`: a silent early return would
            # report success having audited zero plans
            pytest.skip("Connect session: executed-plan asserts unavailable")
        counts[name] = _fact_scan_counts(df)
    return counts


def test_every_query_within_fact_scan_budget(registry_scan_counts):
    offenders = {}
    for name, counts in registry_scan_counts.items():
        if any(c > 1 for c in counts.values()) and name not in ALLOWED_MULTI_SCAN:
            offenders[name] = {t: c for t, c in counts.items() if c > 1}
    assert not offenders, (
        f"fact table scanned more than once (CTE re-expansion? see b86 "
        f"docstring for the fix patterns): {offenders}"
    )


def test_counter_sees_scans_at_all(registry_scan_counts):
    """Tree-walk sanity: a counter that silently collected zero leaves
    (e.g. an unhandled AQE wrapper class) would pass the budget sweep
    vacuously. Most registered queries scan at least one fact table."""
    scanning = [
        n for n, counts in registry_scan_counts.items()
        if any(c >= 1 for c in counts.values())
    ]
    assert len(scanning) >= 100, (
        f"only {len(scanning)} queries show any fact scan — the leaf "
        "walker is likely missing a plan-node class"
    )


def test_allowlist_has_no_stale_entries(registry_scan_counts):
    """Every allowlisted query must still exist and still multi-scan —
    otherwise the justification is stale and the entry hides regressions."""
    full = registry.full_queries()
    stale = [n for n in ALLOWED_MULTI_SCAN if n not in full]
    assert not stale, f"allowlisted queries no longer registered: {stale}"
    no_longer_multi = [
        n for n in ALLOWED_MULTI_SCAN
        if n in registry_scan_counts
        and not any(c > 1 for c in registry_scan_counts[n].values())
    ]
    assert not no_longer_multi, (
        f"allowlisted queries no longer multi-scan (drop the entries): "
        f"{no_longer_multi}"
    )


def test_near_dedup_corpus_materializes_survivors_once(registry_scan_counts):
    """r13 materialize-once pin: `near_dedup_corpus` checkpoints its
    exact-dedup survivors (slim projection + localCheckpoint), so the
    RETURNED frame's plan reads the checkpointed RDD for both the pair
    stage and the final anti-join probe — the corpus parquet is scanned
    only inside the eager cluster build, never in the final plan. A
    regression back to recompute-per-consumer (dropping the checkpoint)
    would surface here as documents.parquet scans > 0."""
    counts = registry_scan_counts["c02_near_dedup_corpus"]
    assert counts["documents.parquet"] == 0, (
        f"final near-dedup plan re-scans the corpus: {counts} — the "
        "survivors checkpoint was dropped or bypassed"
    )


def test_decontaminate_verdicts_materialize_gate(spark, sf_dir):
    """r13 optimization-round pin, BOTH branches of the size-gated
    materialize-once in `decontaminate_verdicts`:

    - materialize branch (input scan >= decon.materializeMinBytes, or
      un-stat-able — i.e. production): each side's (id, canonical_text,
      fp) base frame is slim-projected and localCheckpoint-ed, so the
      returned plan reads checkpoint RDDs everywhere and the corpus
      parquet appears ZERO times — the scan + canonicalization regex
      (measured 3.9 s of the 11.0 s sf10 reading per pass) runs exactly
      once per side (interleaved sf10 A/B: 12.09 -> 7.29 s).
    - recompute branch (fixture-sized local scans): the checkpoint pair
      is measured pure overhead (sf0.1 3-arm A/B: 1.19 s recompute vs
      2.12 s checkpointed on a 0.6 MB corpus), so the plan scans the
      parquet directly, >1 times by CTE re-expansion — allowlisted
      above.

    Forcing the threshold conf to each side of the fixture's size pins
    that the gate actually switches plans."""
    from stock_data_pipeline_spark.operators.text import (
        c04_decontaminate_verdicts,
    )

    fn = getattr(
        c04_decontaminate_verdicts, "__wrapped__", c04_decontaminate_verdicts
    )
    conf = "spark.spark_graft.decon.materializeMinBytes"
    try:
        spark.conf.set(conf, "0")  # everything is >= 0 bytes: materialize
        counts = _fact_scan_counts(fn(spark, sf_dir))
        assert counts["documents.parquet"] == 0, (
            f"materialize branch re-scans the corpus: {counts} — a base "
            "checkpoint was dropped or bypassed"
        )
        spark.conf.set(conf, str(1 << 60))  # nothing local is that big
        counts = _fact_scan_counts(fn(spark, sf_dir))
        assert counts["documents.parquet"] > 1, (
            f"recompute branch shows {counts} — either the gate is stuck "
            "on materialize or the plan no longer re-expands (update the "
            "allowlist entry if the latter is real)"
        )
    finally:
        spark.conf.unset(conf)
