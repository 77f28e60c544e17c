"""End-to-end integration: the LLM-corpus user's full preparation day.

The Tier-C operators compose into the pipeline a pretraining-data team
actually runs: clean (boilerplate) → exact dedup → near-dup dedup →
eval-set decontamination → train/val/test split → sequence packing.
This test drives the WHOLE chain over the fixture corpus with planted
adversarial content — an exact duplicate, a near duplicate, and an
eval-contaminated document — and asserts the global invariants a
corpus owner cares about: every plant is removed by the right stage,
no clean document is lost, the splits are disjoint and deterministic,
and packing accounts for every surviving train document exactly once
within the token budget. The chain is then re-run from scratch and must
reproduce the identical corpus (the whole pipeline is hash-driven, no
RNG streams).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
)
from stock_data_pipeline_spark.operators.sampling import (
    pack_sequences,
    with_split,
)
from stock_data_pipeline_spark.operators.text import (
    decontaminate,
    remove_boilerplate_lines,
)

EXACT_DUP_ID = 900_001
NEAR_DUP_ID = 900_002
CONTAM_ID = 900_003


def _build_corpus(spark, sf_dir):
    """Fixture docs + three planted adversarial documents."""
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    rows = {r.doc_id: r.text for r in base.orderBy("doc_id").limit(3).collect()}
    ids = sorted(rows)
    texts = [rows[i] for i in ids]
    near = texts[1].split()
    near[3], near[7] = "PERTURBED", "TOKENS"
    eval_text = (
        "the held out benchmark question about spark shuffle partitions "
        "and adaptive query execution behavior under skew"
    )
    # the contaminated doc must NOT be a near-dup of anything (or the
    # near-dup stage would remove it first, masking the decon check):
    # unique filler + the verbatim eval content
    contam_text = (
        "zebra quill fjord waltz nymph oblique vexing gizmo jackdaw "
        "sphinx quartz blitz " + eval_text
    )
    planted = spark.createDataFrame(
        [
            (EXACT_DUP_ID, texts[0]),                      # exact dup of ids[0]
            (NEAR_DUP_ID, " ".join(near)),                 # near dup of ids[1]
            (CONTAM_ID, contam_text),                      # contaminated
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(1, eval_text), (2, "another unrelated eval prompt about nothing")],
        "doc_id long, text string",
    )
    return base.unionByName(planted), eval_set, ids


def _run_chain(spark, corpus, eval_set):
    # 1. clean: chunk-mode boilerplate removal with a cap high enough to
    #    keep this corpus intact except truly pervasive chunks; docs
    #    reduced to nothing would be explicitly gated here
    cleaned = remove_boilerplate_lines(
        corpus, max_line_df=400, chunk_tokens=2
    ).select("doc_id", F.col("cleaned").alias("text")).filter(
        F.length("text") > 0
    )
    # 2. exact dedup: canonical fingerprint, min doc_id survives
    fp = F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    exact = (
        cleaned.withColumn("fingerprint", fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    # 3. near-dup dedup: LSH candidates -> verified pairs -> clusters,
    #    keeper = min doc_id per cluster
    pairs = minhash_lsh_pairs(exact, threshold=0.6)
    clusters = dedup_clusters(pairs.select("doc_a", "doc_b"))
    near = exact.join(
        clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    # 4. decontamination against the eval set
    flagged = decontaminate(near, eval_set, min_shared=3).select(
        F.col("train_id").alias("doc_id")
    ).distinct()
    decon = near.join(flagged, "doc_id", "left_anti")
    # 5. deterministic split
    split = with_split(decon)
    # 6. pack the train split
    packed = pack_sequences(split.filter(F.col("split") == "train"))
    return cleaned, exact, near, decon, split, packed


def test_llm_corpus_day_end_to_end(spark, sf_check_dir):
    corpus, eval_set, ids = _build_corpus(spark, sf_check_dir)
    n_corpus = corpus.count()
    cleaned, exact, near, decon, split, packed = _run_chain(
        spark, corpus, eval_set
    )

    # cleaning kept every document (cap chosen to be inert on this corpus)
    assert cleaned.count() == n_corpus

    # exact dedup removed the planted exact duplicate — and ONLY it
    exact_ids = {r.doc_id for r in exact.select("doc_id").collect()}
    assert EXACT_DUP_ID not in exact_ids and ids[0] in exact_ids
    assert len(exact_ids) == n_corpus - 1

    # near-dup dedup removed the planted near duplicate (keeper = the
    # original, lower doc_id), and no additional fixture doc
    near_ids = {r.doc_id for r in near.select("doc_id").collect()}
    assert NEAR_DUP_ID not in near_ids and ids[1] in near_ids

    # decontamination removed the contaminated plant; the eval doc's
    # shingles appear nowhere else, so exactly one doc dropped here
    decon_ids = {r.doc_id for r in decon.select("doc_id").collect()}
    assert CONTAM_ID not in decon_ids
    assert near_ids - decon_ids == {CONTAM_ID}

    # split: total preserved, assignments disjoint by construction,
    # every split non-empty at this corpus size
    by_split = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(by_split.values()) == len(decon_ids)
    assert set(by_split) == {"train", "val", "test"}

    # packing: every train doc in exactly one bin, bins within budget
    from stock_data_pipeline_spark.operators.sampling import PACK_BUDGET

    packed_rows = packed.collect()
    packed_ids = [r.doc_id for r in packed_rows]
    train_ids = {
        r.doc_id for r in split.filter("split = 'train'").collect()
    }
    assert sorted(packed_ids) == sorted(train_ids)
    bins = {}
    for r in packed_rows:
        bins.setdefault((r.pack_group, r.bin_id), 0)
        bins[(r.pack_group, r.bin_id)] += r.n_tokens
    assert bins and all(v <= PACK_BUDGET for v in bins.values())

    # determinism: the whole chain reproduces bit-identically
    _, _, _, decon2, split2, packed2 = _run_chain(spark, corpus, eval_set)
    assert {r.doc_id for r in decon2.select("doc_id").collect()} == decon_ids
    assert {
        (r.doc_id, r.split) for r in split2.collect()
    } == {(r.doc_id, r.split) for r in split.collect()}
    assert {
        (r.doc_id, r.pack_group, r.bin_id) for r in packed2.collect()
    } == {(r.doc_id, r.pack_group, r.bin_id) for r in packed_rows}
