"""Similarity-search tests: ANN recall vs brute force, vector math edge
cases (SURVEY.md §7: approximate ops are tested via recall thresholds)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine,
    ivf_index,
    lsh_signatures,
)
from stock_data_pipeline_spark.registry import get


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], [1.0, 0.0], 1.0),
            (1, [1.0, 0.0], [0.0, 1.0], 0.0),
            (2, [1.0, 0.0], [-1.0, 0.0], -1.0),
            (3, [3.0, 4.0], [3.0, 4.0], 1.0),
        ],
        "id long, a array<float>, b array<float>, expected double",
    )
    rows = df.select("id", "expected", F.round(cosine(F.col("a"), F.col("b")), 9).alias("got")).collect()
    for r in rows:
        assert abs(r.got - r.expected) < 1e-9, r


def test_ann_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    brute = get("c03_cosine_topk").fn(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    queries = emb.filter(F.col("vec_id") < 10)
    # Random 64-d vectors are LSH's worst case (neighbors barely closer
    # than average) — short signatures + many tables buys recall by
    # widening candidate sets. Measured 0.96 at (3, 12) on this corpus.
    approx = ann_lsh_topk(emb, queries, k=5, n_planes=3, n_tables=12).collect()
    got: dict[int, set[int]] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)

    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.8, f"ANN recall {recall:.2f} below bound"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    brute = get("c03_cosine_topk").fn(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    queries = emb.filter(F.col("vec_id") < 10)
    # Random uniform vectors are also IVF's worst case (clusters are
    # arbitrary); probing half the cells keeps recall high while still
    # exercising the pruning path.
    approx = ann_ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4).collect()
    got: dict[int, set[int]] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)

    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.7, f"IVF recall {recall:.2f} below bound"


def test_ivf_candidates_are_pruned(spark, sf_dir):
    """IVF must actually prune: every query's scored candidate set is a
    strict subset of the corpus (cells outside the probe set skipped)."""
    emb = load(spark, sf_dir, "embeddings")
    assigned, centers = ivf_index(emb, n_cells=8)
    n_corpus = emb.count()
    cell_sizes = assigned.groupBy("cell").count().collect()
    assert len(cell_sizes) > 1  # k-means actually split the corpus
    assert ann_ivf_topk(
        emb, emb.filter("vec_id = 0"), k=5, n_cells=8, n_probe=2
    ).count() == 5
    # probe 2 of 8 cells → candidates bounded well under the corpus
    biggest_two = sum(sorted((r["count"] for r in cell_sizes))[-2:])
    assert biggest_two < n_corpus


def test_lsh_signatures_deterministic_and_bounded(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(50)
    a = {tuple(r) for r in lsh_signatures(emb, n_planes=8, n_tables=2).collect()}
    b = {tuple(r) for r in lsh_signatures(emb, n_planes=8, n_tables=2).collect()}
    assert a == b
    assert all(0 <= sig < 256 for (_, _, sig) in a)


def test_identical_vector_is_nearest_neighbor(spark):
    base = [float(i) for i in range(8)]
    rows = [(0, base), (1, base), (2, [float(8 - i) for i in range(8)]),
            (3, [1.0] * 8), (4, [-x for x in base])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann_lsh_topk(emb, emb.filter("vec_id = 0"), k=1, n_planes=4, n_tables=6).collect()
    assert out and out[0].vec_id == 1 and out[0].cos_sim == 1.0


def test_quantized_embeddings_reconstruct_cosine(spark, sf_check_dir):
    """int8 codes must stay in range and reconstruct the unit vector to
    within the quantization step (dequantized self-cosine > 0.99)."""
    import numpy as np

    from stock_data_pipeline_spark.catalog import load
    from stock_data_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = load(spark, sf_check_dir, "embeddings")
    joined = (
        quantize_embeddings(emb)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("q8", "embedding", "norm6")
        .limit(50)
        .collect()
    )
    assert joined
    for r in joined:
        q = np.array([int(v) for v in r.q8.split(",")], dtype=np.float64)
        assert q.min() >= -128 and q.max() <= 127
        x = np.array(r.embedding, dtype=np.float64)
        x /= np.linalg.norm(x)
        deq = q / 127.0
        cos = float(deq @ x / (np.linalg.norm(deq) * np.linalg.norm(x)))
        assert cos > 0.99, cos


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """Persisted IVF index: a fresh session loading from parquet must
    answer queries identically to the in-memory index, and the
    assignments layout must be cell-partitioned for probe pruning."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.catalog import load
    from stock_data_pipeline_spark.operators.similarity import (
        ann_ivf_topk,
        ivf_index,
        load_ivf_index,
        save_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)

    built = ivf_index(emb, n_cells=8)
    save_ivf_index(built, str(tmp_path / "ivf"))

    # layout: one partition dir per cell
    dirs = {p.name for p in (tmp_path / "ivf" / "assignments").iterdir()
            if p.name.startswith("cell=")}
    assert len(dirs) >= 2

    sib = spark.newSession()  # "another job": no shared cache or lineage
    loaded = load_ivf_index(sib, str(tmp_path / "ivf"))
    assert loaded[1] == built[1]  # centroids exact (float64 both ways)

    def run(session, index):
        e = load(session, sf, "embeddings")
        q = e.filter(F.col("vec_id") % 100 == 0)
        return sorted(
            (r.query_id, r.vec_id, r.sim_rank)
            for r in ann_ivf_topk(e, q, k=5, index=index).collect()
        )

    assert run(sib, loaded) == run(spark, built)


def test_incremental_ivf_assignment_equals_rebuild(spark, tmp_path):
    """Appending a batch against frozen persisted centroids must produce
    exactly the assignments a full pass with the same centroids would,
    and loaded queries must see the new vectors."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.catalog import load
    from stock_data_pipeline_spark.operators.similarity import (
        ann_ivf_topk,
        append_ivf_batch,
        assign_to_cells,
        ivf_index,
        load_ivf_index,
        save_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)

    save_ivf_index(ivf_index(old, n_cells=8), str(tmp_path / "ivf"))
    append_ivf_batch(spark, new, str(tmp_path / "ivf"))

    assigned, centers = load_ivf_index(spark, str(tmp_path / "ivf"))
    got = {r.vec_id: r.cell for r in assigned.collect()}
    want = {r.vec_id: r.cell for r in assign_to_cells(emb, centers).collect()}
    assert got == want  # incremental == full pass under frozen centroids

    # queries against the grown index can now return NEW vectors
    q = emb.filter(F.col("vec_id") == 1)
    hits = {
        r.vec_id
        for r in ann_ivf_topk(
            emb, q, k=10, index=(assigned, centers)
        ).collect()
    }
    assert hits & {r.vec_id for r in new.select("vec_id").collect()}


def test_cosine_pandas_matches_jvm_path(spark, sf_dir):
    """The Arrow-vectorized cosine must agree with the JVM
    higher-order-function cosine to double precision on real pairs."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.catalog import load
    from stock_data_pipeline_spark.operators.similarity import (
        cosine,
        cosine_pandas_scores,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = q.crossJoin(
        F.broadcast(
            emb.filter(F.col("vec_id") % 25 == 0).select("vec_id", "embedding")
        )
    )
    jvm = {
        (r.query_id, r.vec_id): r.c
        for r in pairs.select(
            "query_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("c")
        ).collect()
    }
    arrow = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in cosine_pandas_scores(pairs).collect()
    }
    assert set(jvm) == set(arrow)
    for k, v in jvm.items():
        assert abs(arrow[k] - v) < 1e-12, k


def test_ivf_cell_stats_flags_imbalance(spark):
    """Occupancy shares sum to 1 and a planted hot cell surfaces with
    skew >> 1 (the retrain trigger signal)."""
    from stock_data_pipeline_spark.operators.similarity import ivf_cell_stats

    rows = [(i, 0) for i in range(90)] + [(100 + i, c) for c in (1, 2) for i in range(5)]
    assigned = spark.createDataFrame(
        [(v, c) for v, c in rows], "vec_id long, cell int"
    )
    stats = {r.cell: r for r in ivf_cell_stats(assigned).collect()}
    assert abs(sum(r.share for r in stats.values()) - 1.0) < 1e-12
    assert stats[0].n_vectors == 90
    assert stats[0].skew > 2.5  # 90 of 100 in one of 3 cells
    assert stats[1].skew < 1.0


# --------------------------------------------------------------------------
# SemDeDup (cell-bounded semantic dedup) vs the exact twin
# --------------------------------------------------------------------------
def test_semdedup_celled_drops_are_a_subset_of_exact_drops(spark, sf_dir):
    """Precision 1.0 by construction: every within-cell drop has a genuine
    above-threshold neighbor, so the celled survivor set must be a
    superset of the exact survivor set (cells can only MISS pairs)."""
    from stock_data_pipeline_spark.registry import get as rget

    emb = load(spark, sf_dir, "embeddings")
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    celled = {r.vec_id for r in rget("c03_semdedup").fn(spark, sf_dir).collect()}
    exact = {r.vec_id for r in rget("c03_semdedup_exact").fn(spark, sf_dir).collect()}
    celled_drops = all_ids - celled
    exact_drops = all_ids - exact
    assert celled_drops <= exact_drops
    # and the mechanism is not vacuous at this SF
    assert exact_drops


def test_semdedup_planted_exact_duplicates_always_dropped(spark, sf_dir):
    """Identical vectors always land in the same quantizer cell (identical
    argmin), so exact duplicates can never escape through the cell
    boundary — the planted-pair guarantee the celled path does keep."""
    from stock_data_pipeline_spark.operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings").limit(50)
    copies = emb.limit(10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        "label",
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(copies)
    survivors = semantic_dedup(corpus, n_cells=4)
    ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    planted = {r.vec_id for r in copies.select("vec_id").collect()}
    # every planted copy has an identical lower-id original -> all dropped
    assert not (ids & planted)
    # rerun is deterministic
    ids2 = {r.vec_id for r in semantic_dedup(corpus, n_cells=4).select("vec_id").collect()}
    assert ids == ids2


# --------------------------------------------------------------------------
# Product quantization
# --------------------------------------------------------------------------
def test_pq_codes_bounded_and_python_free(spark, sf_dir):
    from stock_data_pipeline_spark.operators.similarity import pq_encode, pq_train

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train(emb)
    assert len(books) == 8 and all(len(b) <= 16 for b in books)
    enc = pq_encode(emb, books)
    rows = enc.collect()
    assert len(rows) == emb.count()
    assert all(0 <= c < 16 for r in rows for c in r.pq_codes)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # encode is pure codegen


def test_pq_reconstruction_preserves_direction(spark, sf_dir):
    """On the synthetic corpus (random vectors — the PQ worst case, no
    cluster structure to exploit) reconstruction must still point the
    right way on average."""
    from stock_data_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_reconstruct,
        pq_train,
    )

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train(emb)
    rec = pq_reconstruct(pq_encode(emb, books), books)
    mean_cos = (
        emb.join(rec, "vec_id")
        .select(F.avg(cosine(F.col("embedding"), F.col("recon"))).alias("m"))
        .collect()[0]
        .m
    )
    assert mean_cos > 0.5, mean_cos


def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    """ADC shortlist (10% of the corpus) + exact rerank: recall >= 0.6 on
    structureless random data (measured 0.74); real embedding corpora
    cluster and do far better. Scores are exact (rerank on originals)."""
    emb = load(spark, sf_dir, "embeddings")
    brute = get("c03_cosine_topk").fn(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    approx = get("c03_pq_topk").fn(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recall = sum(len(got.get(q, set()) & t) for q, t in truth.items()) / sum(
        len(t) for t in truth.values()
    )
    assert recall >= 0.6, recall


def test_ivfpq_roundtrip_recall_and_pruning(spark, sf_dir, tmp_path):
    """Persisted IVF-PQ: build once, search from the on-disk index.
    Checks (1) the cell layout prunes the codes scan to the probed
    partitions, (2) recall vs brute force is reasonable for a composed
    approximate index on structureless data, (3) two loads answer
    identically (the index is the state, not the session)."""
    from stock_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        save_pq_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    save_pq_index(emb, path)

    queries = emb.filter(F.col("vec_id") < 10)
    got_rows = ivfpq_topk(emb, queries, path).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r.query_id, set()).add(r.vec_id)

    brute = get("c03_cosine_topk").fn(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    recall = sum(len(got.get(q, set()) & t) for q, t in truth.items()) / sum(
        len(t) for t in truth.values()
    )
    # two approximations stack (cell miss + code distortion): modest bound
    # on random data; clustered corpora do far better.
    assert recall >= 0.4, recall

    # determinism across loads
    again = ivfpq_topk(emb, queries, path).collect()
    assert {(r.query_id, r.vec_id) for r in again} == {
        (r.query_id, r.vec_id) for r in got_rows
    }

    # partition-pruned codes scan: the cells/ dir is partitioned by cell
    import os

    parts = [d for d in os.listdir(f"{path}/cells") if d.startswith("cell=")]
    assert len(parts) > 1  # layout exists for pruning to exploit


def test_ivf_cell_stats_detects_total_collapse(spark):
    """The drift case the monitor exists for: every vector in ONE of the
    configured cells. With the configured n_cells the skew reads as
    n_cells (maximal); the occupied-cells fallback would read 1.0
    (looks balanced) and never trigger retraining."""
    from stock_data_pipeline_spark.operators.similarity import ivf_cell_stats

    assigned = spark.createDataFrame(
        [(i, 7) for i in range(50)], "vec_id long, cell int"
    )
    collapsed = ivf_cell_stats(assigned, n_cells=16).collect()
    assert len(collapsed) == 1 and abs(collapsed[0].skew - 16.0) < 1e-12
    # fallback (unknown config) documents the underestimate
    fallback = ivf_cell_stats(assigned).collect()
    assert abs(fallback[0].skew - 1.0) < 1e-12


def test_empty_persisted_index_roundtrips_and_searches_empty(spark, tmp_path):
    """An empty corpus is routine at scale (fresh table, filtered-out
    batch): save_ivf_index / save_pq_index must land a READABLE empty
    index (partitionBy of zero rows would write no files at all), load
    must not crash on the zero-row codebooks, and searches against the
    empty index must return empty results with the contract schema."""
    from stock_data_pipeline_spark.operators.similarity import (
        ivf_index,
        ivfpq_topk,
        load_ivf_index,
        load_pq_index,
        save_ivf_index,
        save_pq_index,
    )

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id bigint, embedding array<float>"
    )

    ivf_path = str(tmp_path / "ivf_empty")
    save_ivf_index(ivf_index(empty), ivf_path)
    assigned, centers = load_ivf_index(spark, ivf_path)
    assert assigned.count() == 0 and centers == []

    pq_path = str(tmp_path / "pq_empty")
    save_pq_index(empty, pq_path, n_sub=4)
    cells, centers2, books = load_pq_index(spark, pq_path)
    assert cells.count() == 0 and centers2 == [] and books == []
    out = ivfpq_topk(empty, queries, pq_path, k=3)
    assert out.count() == 0
    assert {"query_id", "vec_id"} <= set(out.columns)


def test_cosine_pandas_scores_null_embedding_yields_null(spark):
    """Parity with the JVM cosine(): a NULL vector on either side scores
    NULL — it must not crash the Arrow worker (np.stack over None)."""
    from stock_data_pipeline_spark.operators.similarity import (
        cosine_pandas_scores,
    )

    pairs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, None, [1.0, 0.0]),
            (3, [0.0, 1.0], None),
        ],
        "pair_id long, q_emb array<double>, embedding array<double>",
    )
    got = {r.pair_id: r.cos_sim for r in cosine_pandas_scores(pairs).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] is None and got[3] is None


def test_fixed_quantizer_twins_are_real_searchers(spark, sf_dir):
    """The r7 oracle twins (fixed centroids / fixed codebooks) exist to
    verify the search machinery, but they must still BE functional ANN
    searchers — a degenerate quantizer that probed nothing would verify
    nothing. Pin a modest recall floor vs exact brute force for both."""
    from stock_data_pipeline_spark.registry import get

    brute = get("c03_cosine_topk").fn(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    total = sum(len(v) for v in truth.values())

    for name, floor in [
        # probes half the cells → recall well above the probe fraction
        ("c03_ivf_fixed_centroids", 0.5),
        # untrained random codebooks quantize 8-dim subspaces near-
        # uselessly, so ADC recall sits just above the 50/500 chance
        # baseline (measured 0.12, deterministic) — the twin verifies
        # MACHINERY, the trained c03_pq_topk owns the recall story
        ("c03_pq_fixed_books", 0.1),
    ]:
        got: dict[int, set[int]] = {}
        for r in get(name).fn(spark, sf_dir).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        recall = sum(len(truth[q] & got.get(q, set())) for q in truth) / total
        assert recall >= floor, f"{name} recall {recall:.2f} < {floor}"


def test_ivf_retrain_on_drift_rebalances_and_swaps_atomically(spark, tmp_path):
    """The append/monitor/retrain lifecycle end-to-end: a drifted ingest
    concentrates in one cell, ivf_cell_stats flags the skew, and
    retrain_ivf_index rebuilds + atomically swaps the persisted index —
    after which the skew drops, every vector is assigned exactly once,
    queries still answer (returning the planted nearest neighbor), and
    no staging directory survives."""
    import os

    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.operators.similarity import (
        ann_ivf_topk,
        append_ivf_batch,
        ivf_cell_stats,
        ivf_index,
        load_ivf_index,
        retrain_ivf_index,
        save_ivf_index,
    )

    def cluster(center, n, id0):
        # deterministic jitter: no RNG, reproducible across runs/engines
        return [
            (
                id0 + i,
                [c + ((i * 37 + d * 11) % 100) / 200.0 for d, c in enumerate(center)],
            )
            for i in range(n)
        ]

    schema = "vec_id long, embedding array<double>"
    corners = [
        [10.0, 10.0, 0.0, 0.0],
        [10.0, -10.0, 0.0, 0.0],
        [-10.0, 10.0, 0.0, 0.0],
        [-10.0, -10.0, 0.0, 0.0],
    ]
    initial = spark.createDataFrame(
        sum((cluster(c, 100, i * 1000) for i, c in enumerate(corners)), []),
        schema,
    )
    n_cells = 4
    path = str(tmp_path / "ivf")
    save_ivf_index(ivf_index(initial, n_cells=n_cells), path)

    # planted drift: 2x the original corpus, all beside ONE corner -> one
    # hot cell under the frozen quantizer
    drifted = spark.createDataFrame(
        cluster([10.5, 10.5, 0.0, 0.0], 800, 5000), schema
    )
    append_ivf_batch(spark, drifted, path)
    corpus = initial.unionByName(drifted)

    assigned, _ = load_ivf_index(spark, path)
    skew_before = max(
        r.skew for r in ivf_cell_stats(assigned, n_cells=n_cells).collect()
    )
    assert skew_before > 2.0  # the monitor flags the drift

    retrain_ivf_index(spark, corpus, path)  # n_cells defaults to live index

    assigned2, centers2 = load_ivf_index(spark, path)
    assert len(centers2) == n_cells
    stats_after = ivf_cell_stats(assigned2, n_cells=n_cells).collect()
    skew_after = max(r.skew for r in stats_after)
    assert skew_after < skew_before / 1.5  # skew drops
    assert sum(r.n_vectors for r in stats_after) == corpus.count()
    assert assigned2.select("vec_id").distinct().count() == corpus.count()
    assert all(0 <= r.cell < n_cells for r in stats_after)

    # queries still answer through the swapped index: vec 5000 points in
    # the (10,10) direction, so every top hit must come from that angular
    # family — the drifted region (>=5000) or corner A (<1000) — at
    # near-perfect cosine
    q = corpus.filter(F.col("vec_id") == 5000)
    top = ann_ivf_topk(
        corpus, q, k=3, index=(assigned2, centers2)
    ).collect()
    assert len(top) == 3
    assert all(r.vec_id >= 5000 or r.vec_id < 1000 for r in top)
    assert all(r.cos_sim > 0.99 for r in top)

    # atomic swap left no staging/old debris beside the index
    debris = [
        p for p in os.listdir(tmp_path)
        if p.startswith("ivf._staging_") or p.startswith("ivf._old_")
    ]
    assert debris == []


def test_ivf_retrain_samples_whole_corpus_not_partition_prefix(spark, tmp_path):
    """Regression for the r9-advice sampling bug: retrain_ivf_index with
    train_fraction=None must train on a uniform draw over the WHOLE
    current corpus, not ivf_index's bare ``limit(256·n_cells)`` prefix.
    The corpus here is BIGGER than the training cap (3,000 rows vs
    cap 1,024) and the drift sits entirely in the TAIL partitions — the
    common append-at-end ingest shape — so prefix training cannot see a
    single drifted row. The negative control proves that: a plain
    ``ivf_index`` call (prefix semantics) leaves every centroid ~24
    units away from the drift mass. The retrain job, drawing its
    fraction-based sample across the corpus, must place a centroid ON
    the drift cluster."""
    import math

    from stock_data_pipeline_spark.operators.similarity import (
        ivf_index,
        load_ivf_index,
        retrain_ivf_index,
        save_ivf_index,
    )

    def cluster(center, n, id0):
        # deterministic jitter, no RNG (same convention as the lifecycle test)
        return [
            (
                id0 + i,
                [c + ((i * 37 + d * 11) % 100) / 200.0 for d, c in enumerate(center)],
            )
            for i in range(n)
        ]

    corners = [
        [10.0, 10.0, 0.0, 0.0],
        [10.0, -10.0, 0.0, 0.0],
        [-10.0, 10.0, 0.0, 0.0],
        [-10.0, -10.0, 0.0, 0.0],
    ]
    drift_center = [0.0, 0.0, 20.0, 0.0]
    initial_rows = sum((cluster(c, 500, i * 1000) for i, c in enumerate(corners)), [])
    drift_rows = cluster(drift_center, 1000, 10_000)
    # ONE DataFrame, rows in ingest order: createDataFrame splits the
    # list across partitions in order, so all 1,000 drifted rows land in
    # the trailing partitions — exactly the append-at-end layout.
    corpus = spark.createDataFrame(
        initial_rows + drift_rows, "vec_id long, embedding array<double>"
    )
    n_cells = 4
    assert len(initial_rows) > 256 * n_cells  # prefix can't reach the tail

    def min_dist_to_drift(centers):
        return min(
            math.dist(c, drift_center) for c in centers
        )

    # Negative control — prefix semantics (train_fraction=None straight on
    # ivf_index): the cap-sized limit() sees only corner rows, so no
    # centroid is anywhere near the drift mass. This is the exact failure
    # the advice described; it keeps the positive assertion non-vacuous.
    _, prefix_centers = ivf_index(corpus, n_cells=n_cells, seed=43)
    assert min_dist_to_drift(prefix_centers) > 15.0

    # Live index trained before the drift arrived (authentic lifecycle).
    path = str(tmp_path / "ivf")
    initial = spark.createDataFrame(
        initial_rows, "vec_id long, embedding array<double>"
    )
    save_ivf_index(ivf_index(initial, n_cells=n_cells), path)

    # The retrain job derives fraction ≈ cap/N over the WHOLE corpus: the
    # drift (1/3 of the mass, ~24 units from everything else) must win a
    # centroid, and the swapped assignments must give it its own cell.
    retrain_ivf_index(spark, corpus, path, n_cells=n_cells)
    assigned, new_centers = load_ivf_index(spark, path)
    assert min_dist_to_drift(new_centers) < 3.0

    drift_cells = (
        assigned.filter(F.col("vec_id") >= 10_000).select("cell").distinct().collect()
    )
    corner_cells = (
        assigned.filter(F.col("vec_id") < 10_000).select("cell").distinct().collect()
    )
    drift_cell_ids = {r.cell for r in drift_cells}
    assert len(drift_cell_ids) == 1  # the drift mass owns one cell...
    assert drift_cell_ids.isdisjoint({r.cell for r in corner_cells})  # ...alone
