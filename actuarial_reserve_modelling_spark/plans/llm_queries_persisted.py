"""L10/D8 — the persisted index-tier lifecycle queries: hierarchical
ANN, IVF-PQ, dedup-banded and vector-signature tiers (build → add →
delete → pruned query), plus hard-negative mining (SURVEY §2.10).
Split out of llm_queries.py (r12, registry hygiene); registration
ORDER is preserved by the ordered imports in plans/llm_queries.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.llm_queries_dedup import (
    _COS,
    _PLANTED_TOP1_ORACLE,
    _WORDS_CTE,
    plant_twins,
)
from actuarial_reserve_modelling_spark.plans.registry import register

@register(
    "l34_ann_index_persisted",
    "L3,S6,L10 (build-once/query-many: persisted hierarchical ANN index, partition-pruned reads)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l34_ann_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN lifecycle that every one-shot l3* query
    elides: build the two-level IVF index ONCE, persist it as a
    hive-partitioned parquet layout (``persist_ann_index`` — members
    and child centroids partitioned by ``super``, the key every query
    batch filters on), then answer a query batch by PRUNED reads
    (``ann_ivf_hier_topk_persisted``: soft-assign the bounded query
    batch, collect its distinct probed supers, and scan only those
    partition directories — the per-batch index I/O is nprobe_super/k1
    of the index, not all of it, which at 10⁹ vectors is the entire
    point of persisting). Since r10 the layout is VECTOR-BEARING
    (``persist_ann_index(embeddings=...)``) and the query passes
    ``embeddings=None``: the exact rerank reads candidate vectors out
    of the same pruned partitions, so the whole per-batch query
    touches the probed fraction of the index and ZERO corpus files
    (r9 verdict finding #1 closed; scan-path pytest pins it).
    Correctness is the l3g construction run through the
    persisted+pruned path: parquet round-trips doubles and floats
    bitwise, so the reloaded centroids route the twin query
    identically and the stored vectors rerank to the identical rounded
    sim — rank 1 is the planted source at exactly 1.0. The
    full-load/pruned-load equivalence and the on-disk layout are
    pinned by the roundtrip pytest."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk_persisted,
        ivf_hier_build,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    root, fresh = staging_dir("l34", sf_dir)
    out = root + "/ann_index"
    if fresh:
        index, super_cent = ivf_hier_build(corpus)
        persist_ann_index(index, super_cent, out, embeddings=corpus)
        staging_commit(root)
    return ann_ivf_hier_topk_persisted(spark, out, None, planted, k=1)


@register(
    "l35_ann_index_add_persisted",
    "L3,D8,S6,L10 (incremental ingest into the persisted ANN index, hash-grade)",
    oracle="""
    SELECT vec_id + 200000 AS query_id, vec_id AS neighbor_id,
           CAST(1 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    UNION ALL
    SELECT vec_id + 200000 AS query_id, vec_id + 100000 AS neighbor_id,
           CAST(2 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def l35_ann_index_add_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest through the persisted index, hash-grade
    (l25 covers the flat in-memory form rows-only): build+persist on
    the base corpus, ``add_to_ann_index`` a batch of exact twins
    (ids +100000) of every 50th vector — routed by the same two-level
    arithmetic the build used, appended only to their supers'
    partition directories — then query a SECOND twin of each source
    (ids +200000) at k=2. Rank 1 is structurally the original source
    (the l3g guarantee, index rows untouched by the add) and rank 2 is
    the ADDED twin: it hard-routes to the source's super and to a
    child that is its own slot's rank-1 for the identical query vector
    (a global argmin is its slot's argmin, and an in-slot distance tie
    resolves to the same lowest child id in both kernels), so it is
    always scanned and ties at sim 1.0 behind the lower source id.
    The add being REQUIRED for the rank-2 rows is what pins the ingest
    path: dropping, mis-routing, or double-appending the batch all
    hash-mismatch."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_ann_index,
        ann_ivf_hier_topk_persisted,
        ivf_hier_build,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    added = plant_twins(emb, 50)
    queries = plant_twins(emb, 50, offset=200_000)
    root, fresh = staging_dir("l35", sf_dir)
    out = root + "/ann_index"
    if fresh:
        index, super_cent = ivf_hier_build(emb)
        # overwrite clears any partial append from a failed prior
        # build, so build+add is idempotent as a unit
        persist_ann_index(index, super_cent, out, embeddings=emb)
        add_to_ann_index(spark, out, added)
        staging_commit(root)
    # vector-bearing layout: the rerank pool IS the index — the added
    # twins' vectors rode through the ingest kernel into members/
    return ann_ivf_hier_topk_persisted(spark, out, None, queries, k=2)


@register(
    "l37_ivfpq_index_persisted",
    "L3,D8,S6,L10 (persisted IVF-PQ tier: codebooks+codes partitioned by list, incremental encode-and-append, pruned ADC query)",
    oracle="""
    SELECT vec_id + 200000 AS query_id, vec_id AS neighbor_id,
           CAST(1 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    UNION ALL
    SELECT vec_id + 200000 AS query_id, vec_id + 100000 AS neighbor_id,
           CAST(2 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def l37_ivfpq_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted lifecycle for the PQ tier (r9 verdict gap #2 —
    l34/l35/l36 covered only the hierarchical index; the IVF-PQ
    composite trained its codebooks per call): ``persist_ivfpq_index``
    writes the coarse centroids, residual codebooks, and the
    cluster-PARTITIONED codes table once; ``add_to_ivfpq_index``
    encodes a batch of exact twins (+100000) with the PERSISTED
    codebooks — no retraining — and appends only to their clusters'
    partition directories; ``ann_ivfpq_topk_persisted`` then answers a
    second-twin (+200000) batch at k=2 by a probed-cluster-pruned ADC
    scan over the code bytes and a rerank from the stored vectors —
    zero corpus files. Rank 1 is the original source and rank 2 the
    ADDED twin (identical residual → identical code word → maximal ADC
    for both; the 32-row exact window rescues any code-sharing
    crowding, same empirical caveat as l3h/l3i, verified at sf0.01 and
    sf0.1): the add being REQUIRED for the rank-2 rows pins the
    incremental-encode path, and a lost/duplicated append or a
    mistrained codebook all hash-mismatch."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_ivfpq_index,
        ann_ivfpq_topk_persisted,
        persist_ivfpq_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    added = plant_twins(emb, 50)
    queries = plant_twins(emb, 50, offset=200_000)
    root, fresh = staging_dir("l37", sf_dir)
    out = root + "/ivfpq_index"
    if fresh:
        persist_ivfpq_index(
            emb, out, n_centroids=16, m_subspaces=8, n_codes=16
        )
        add_to_ivfpq_index(spark, out, added)
        staging_commit(root)
    return ann_ivfpq_topk_persisted(spark, out, None, queries, k=2, nprobe=4, rerank=32)


@register(
    "l36_ann_index_delete_persisted",
    "L3,S7,L10 (deletion from the persisted ANN index via dynamic partition overwrite)",
    oracle="""
    SELECT vec_id + 200000 AS query_id, vec_id + 100000 AS neighbor_id,
           CAST(1 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def l36_ann_index_delete_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remove side of the index lifecycle (dedup-driven removal /
    retention), hash-grade: build+persist on the base corpus, add
    exact twins (+100000) of every 50th vector, then DELETE the
    original sources (``delete_from_ann_index`` — anti-join + dynamic
    partition overwrite of only the touched supers; untouched supers
    keep their files). Querying a third twin (+200000) at k=1 now
    pins BOTH mutations at once: the added twin is the only remaining
    sim-1.0 vector, so rank 1 must be id+100000 — if the delete left
    the source behind, the lower source id wins the 1.0 tie and the
    hash mismatches; if the add was lost, no 1.0 neighbor exists at
    rank 1 and it mismatches too."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_ann_index,
        ann_ivf_hier_topk_persisted,
        delete_from_ann_index,
        ivf_hier_build,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    added = plant_twins(emb, 50)
    queries = plant_twins(emb, 50, offset=200_000)
    sources = emb.filter(F.col("vec_id") % 50 == 0).select("vec_id")
    root, fresh = staging_dir("l36", sf_dir)
    out = root + "/ann_index"
    if fresh:
        index, super_cent = ivf_hier_build(emb)
        persist_ann_index(index, super_cent, out, embeddings=emb)
        add_to_ann_index(spark, out, added)
        delete_from_ann_index(spark, out, sources)
        staging_commit(root)
    return ann_ivf_hier_topk_persisted(spark, out, None, queries, k=1)


@register(
    "l40_dedup_banded_persisted",
    "L2,D8,S7 (banded lookup projection: partition-pruned against-index dedup)",
    oracle=f"""
    WITH {_WORDS_CTE},
    c AS (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    i AS (
        SELECT a.doc_id new_id, b.doc_id index_id, count(*) k
        FROM words a JOIN words b USING (w)
        WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0 AND b.doc_id % 5 <> 2
        GROUP BY 1, 2
    )
    SELECT new_id, index_id,
           round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) AS jac
    FROM i JOIN c c1 ON new_id = c1.doc_id JOIN c c2 ON index_id = c2.doc_id
    WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95
    """,
)
def l40_dedup_banded_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l38's lifecycle through the r11 BANDED lookup path (the l34 move
    applied to MinHash — r10 verdict task #1): ``persist_dedup_index``
    writes the (band, bpart)-partitioned banded projection alongside
    the id-hash fingerprints; ``add_to_dedup_index`` (corpus docs
    %4=1) and ``delete_from_dedup_index`` (docs %5=2) maintain BOTH
    datasets; the ingest check then runs
    ``minhash_dedup_against_index_persisted`` — the batch reads ONLY
    its own (band, bpart) partition directories and the candidates'
    id-hash buckets, per-batch index bytes O(batch footprint) instead
    of the full-index re-band l38's operator pays. Answer = the exact
    all-pairs jac ≥ 0.95 set over the SURVIVING index (b=16 r=16
    banding recall argument as l19): a lost add drops pairs, a
    left-behind delete re-emits a deleted index_id, an unmaintained
    banded projection drops every pair of the added docs — all
    hash-mismatch against the oracle."""
    from actuarial_reserve_modelling_spark.operators.dedup import (
        add_to_dedup_index,
        build_dedup_index,
        delete_from_dedup_index,
        minhash_dedup_against_index_persisted,
        persist_dedup_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    root, fresh = staging_dir("l40", sf_dir)
    out = root + "/dedup_index"
    if fresh:
        base = build_dedup_index(
            corpus.filter(F.col("doc_id") % 4 != 1), bands=16, rows_per_band=16
        )
        persist_dedup_index(base, out, bands=16, rows_per_band=16)
        add_to_dedup_index(spark, out, corpus.filter(F.col("doc_id") % 4 == 1))
        delete_from_dedup_index(
            spark, out, corpus.filter(F.col("doc_id") % 5 == 2).select("doc_id")
        )
        staging_commit(root)
    return minhash_dedup_against_index_persisted(
        spark, out, docs.filter(F.col("doc_id") % 3 == 0), threshold=0.95
    )


@register(
    "l41_hard_negative_mining",
    "L3,D9 (contrastive hard-negative mining with margin denoise)",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
        WHERE vec_id % 25 = 0
    ),
    anchors AS (
        SELECT vec_id AS anchor_id, vec_id + 100000 AS positive_id, embedding
        FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2500
    ),
    pos AS (
        SELECT a.anchor_id, {_COS} AS pos_sim
        FROM anchors a JOIN corpus b ON b.vec_id = a.positive_id
    ),
    negs AS (
        SELECT a.anchor_id, a.positive_id, b.vec_id AS negative_id,
               {_COS} AS neg_sim
        FROM anchors a JOIN corpus b
          ON b.vec_id <> a.anchor_id AND b.vec_id <> a.positive_id
    )
    SELECT anchor_id, positive_id, negative_id, CAST(rank AS BIGINT) AS rank,
           pos_sim, neg_sim
    FROM (
        SELECT n.anchor_id, n.positive_id, n.negative_id,
               row_number() OVER (PARTITION BY n.anchor_id
                                  ORDER BY n.neg_sim DESC, n.negative_id) AS rank,
               p.pos_sim, n.neg_sim
        FROM negs n JOIN pos p USING (anchor_id)
        WHERE n.neg_sim <= p.pos_sim - 0.55
    ) WHERE rank <= 3
    """,
)
def l41_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/similarity.py::
    mine_hard_negatives; ANCE arXiv:2007.00808): planted twins are the
    labeled positives (sim 1.0 by construction), and each anchor's 3
    hardest SAFE negatives — most-similar corpus vectors excluding the
    anchor, its twin, and anything within 0.55 of the positive — are
    surfaced with their sims. The margin BITES on this corpus (top
    non-identical cosines reach ~0.5 > 1.0 − 0.55 = 0.45), so the
    false-negative denoise filter is exercised, not vacuous; ranks are
    assigned after it. Anchor batch bounded (vec_id < 2500, every
    25th ⇒ ≤ 100 queries) per the broadcast bounded-query contract;
    the corpus side streams, never shuffles. Exact brute-force path ⇒
    the oracle replays the identical arithmetic; the ANN-candidate
    scale path shares the scoring/denoise code."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        mine_hard_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 25)
    corpus = emb.unionByName(planted)
    anchors = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2500)).select(
        "vec_id", "embedding", (F.col("vec_id") + 100000).alias("positive_id")
    )
    out = mine_hard_negatives(corpus, anchors, k=3, margin=0.55)
    return out.select(
        "anchor_id",
        "positive_id",
        "negative_id",
        F.col("rank").cast("bigint").alias("rank"),
        "pos_sim",
        "neg_sim",
    )


@register(
    "l41b_hard_negative_ann_planted",
    "L3,D9 (hash-grade evidence for the ANN-candidate mining scale path)",
    oracle="""
    SELECT vec_id AS anchor_id, vec_id + 100000 AS positive_id,
           vec_id + 200000 AS negative_id, CAST(1 AS BIGINT) AS rank,
           CAST(1.0 AS DOUBLE) AS pos_sim, CAST(1.0 AS DOUBLE) AS neg_sim
    FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2500
    """,
)
def l41b_hard_negative_ann_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic slice of mine_hard_negatives' ANN-candidate SCALE
    path (l41 covers the exact brute-force path): every 25th vector is
    planted TWICE (twin1 at +100000 = the labeled positive, twin2 at
    +200000 = a known sim-1.0 decoy). The hierarchical-IVF candidate
    stage surfaces all three identical copies with probability 1
    (identical vectors share every probed list — the l3g argument),
    the exact rerank scores them 1.0, and mining excludes the anchor
    and its positive, leaving twin2 as the rank-1 hard negative with
    neg_sim exactly 1.0 (margin 0: 1.0 ≤ pos_sim − 0). A broken
    candidate plumbing (lost anchor column, positive not excluded,
    margin misapplied) changes ids or sims and hash-mismatches."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk,
        mine_hard_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twin1 = plant_twins(emb, 25)
    twin2 = plant_twins(emb, 25, offset=200000)
    corpus = emb.unionByName(twin1).unionByName(twin2)
    src = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2500))
    anchors = src.select(
        "vec_id", "embedding", (F.col("vec_id") + 100000).alias("positive_id")
    )
    cand = ann_ivf_hier_topk(corpus, src, k=4).select(
        F.col("query_id").alias("anchor_id"), F.col("neighbor_id").alias("cand_id")
    )
    out = mine_hard_negatives(corpus, anchors, k=1, margin=0.0, candidates=cand)
    return out.select(
        "anchor_id",
        "positive_id",
        "negative_id",
        F.col("rank").cast("bigint").alias("rank"),
        "pos_sim",
        "neg_sim",
    )


@register(
    "l43_vecsig_index_persisted",
    "L2,L4,D8,S7 (persisted vector near-dup tier: build, add, delete, pruned ingest)",
    oracle="""
    SELECT vec_id + 100000 AS new_id, vec_id AS index_id,
           CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 5 = 0 AND vec_id % 4 <> 2
    """,
)
def l43_vecsig_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full lifecycle of the persisted VECTOR near-dup tier — the
    embedding analogue of l40's MinHash lifecycle, closing the last
    O(index)-per-batch ingest pattern (t12's gate previously re-read
    the whole signature index per batch inside
    lsh_cosine_dedup_against_index): ``persist_vecsig_index`` writes
    the corpus half (vec_id%4≠1) spart/id-hash partitioned;
    ``add_to_vecsig_index`` signs the rest (%4=1) with the PERSISTED
    parameters and appends partition-locally;
    ``delete_from_vecsig_index`` removes every %4=2 vector from both
    datasets by touched-partition rewrite. The ingest check
    (``lsh_cosine_dedup_against_index_persisted`` on exact twins of
    every 5th vector) reads ONLY the batch's spart directories and the
    candidates' id-hash buckets; identical vectors collide in every
    table with probability 1 and no non-identical pair reaches τ=0.9
    on this corpus (the l4b argument), so the answer is exactly the
    twins whose source SURVIVES the delete: a lost add drops pairs, a
    left-behind delete re-emits a deleted index_id, an unmaintained
    signature dataset drops every added vector's pair — all
    hash-mismatch against the oracle."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_vecsig_index,
        delete_from_vecsig_index,
        lsh_cosine_dedup_against_index_persisted,
        persist_vecsig_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root, fresh = staging_dir("l43", sf_dir)
    out = root + "/vecsig_index"
    if fresh:
        persist_vecsig_index(emb.filter(F.col("vec_id") % 4 != 1), out)
        add_to_vecsig_index(spark, out, emb.filter(F.col("vec_id") % 4 == 1))
        delete_from_vecsig_index(
            spark, out, emb.filter(F.col("vec_id") % 4 == 2).select("vec_id")
        )
        staging_commit(root)
    batch = plant_twins(emb, 5)
    return lsh_cosine_dedup_against_index_persisted(spark, out, batch, threshold=0.9)


@register(
    "l46_recall_audit_planted",
    "L3,L10 (query-time recall self-audit of the persisted ANN tier, hash-grade via planted twins)",
    oracle="""
    SELECT vec_id + 100000 AS query_id, CAST(1 AS BIGINT) AS n_hits,
           CAST(1 AS BIGINT) AS exact_n, CAST(1.0 AS DOUBLE) AS recall_at_k
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def l46_recall_audit_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time recall observability for the persisted ANN tier
    (VERDICT r12 task 4): ``ann_index_recall_audit`` samples stored
    vectors, answers them through the pruned index path AND a bounded
    exact scan, and reports per-query recall@k — the per-corpus
    recall/nprobe trade the offline stress curves (BASELINE.md:
    isotropic 0.25–0.39, clustered 0.89–0.90) could only show per
    benchmark. Hash-grade here via the l34 construction: auditing the
    PLANTED TWINS at k=1 must find each twin's source at recall exactly
    1.0 (identical vector → identical super/child routing → always
    probed → exact rerank pins sim 1.0 rank 1; self-matches excluded on
    both sides), so a broken audit join, a sample that reads vectors
    it didn't query, or an index side that silently returns fewer rows
    all hash-mismatch. The general (non-planted) sampled path is
    exercised by the pytest and the tools/recall_audit.py tables; the
    tier is the l34 staging build (same construction, shared cache)."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_index_recall_audit,
        ivf_hier_build,
        persist_ann_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    # deliberately the l34 tag: identical corpus + build params, so a
    # prior l34 build in this process is reused and a fresh build here
    # serves a later l34 identically
    root, fresh = staging_dir("l34", sf_dir)
    out = root + "/ann_index"
    if fresh:
        index, super_cent = ivf_hier_build(corpus)
        persist_ann_index(index, super_cent, out, embeddings=corpus)
        staging_commit(root)
    # n_probed_supers is dropped from the oracle row: it equals
    # min(nprobe_super, k1) and k1 grows with corpus size, so it is not
    # scale-stable; the recall columns are the contract under test
    return ann_index_recall_audit(spark, out, k=1, queries=planted).select(
        "query_id", "n_hits", "exact_n", "recall_at_k"
    )


@register(
    "l47_ivfpq_recall_audit_planted",
    "L3,L10 (recall self-audit of the persisted IVF-PQ tier, hash-grade via planted twins)",
    oracle="""
    SELECT vec_id + 100000 AS query_id, CAST(1 AS BIGINT) AS n_hits,
           CAST(1 AS BIGINT) AS exact_n, CAST(1.0 AS DOUBLE) AS recall_at_k
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def l47_ivfpq_recall_audit_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l46's analogue for the persisted IVF-PQ tier
    (``ivfpq_index_recall_audit``): both persisted ANN tiers expose the
    same per-corpus recall observability, and this row pins the PQ
    side's planted floor as hash-grade driver evidence. The l3h/l3i
    argument carries through the audit plumbing: a planted twin encodes
    to exactly its source's code word and hard-routes to its cluster,
    the ADC scan shortlists it (rerank=32 absorbs the code-sharing
    tie-break caveat at both checked scales on this corpus), and the
    exact rerank pins sim 1.0 — so recall@1 over the planted set is
    exactly 1.0 row for row. The quantization-loss trade on GENERAL
    queries (lower recall at equal probes than the hierarchical tier)
    is covered by the sampled pytest, which is rows-only territory by
    nature."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ivfpq_index_recall_audit,
        persist_ivfpq_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    root, fresh = staging_dir("l47", sf_dir)
    out = root + "/ivfpq_index"
    if fresh:
        persist_ivfpq_index(corpus, out)
        staging_commit(root)
    return ivfpq_index_recall_audit(
        spark, out, k=1, queries=planted, rerank=32
    ).select("query_id", "n_hits", "exact_n", "recall_at_k")


@register(
    "l48_auto_probe_planted",
    "L3,L10 (recall-curve-driven nprobe defaulting on the persisted ANN tier, hash-grade via planted twins)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l48_auto_probe_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-grade evidence for ``nprobe="auto"`` (r14): the tier is
    built WITHOUT the twins, ``persist_recall_audit`` persists its
    measured probe curve into ``recall_stats/``, and the planted twins
    are answered through ``ann_ivf_hier_topk_persisted(nprobe_super=
    "auto")`` — the probe setting comes entirely from the persisted
    curve (deterministic: fixed sample rule, fixed tier → same curve →
    same choice every run). Correctness does not depend on WHICH
    setting auto picks: a twin hard-routes to its source's super at
    ANY probe count (the l3g argument), so top-1 is the source at sim
    1.0 row for row — but a broken curve write, a reader that can't
    parse it, or a defaulting path that crashes instead of warning on
    this corpus's curve all fail the row loudly. The curve-choice
    LOGIC (clustered picks 1-2, isotropic warns, staleness warns) is
    pinned by the 12 recall pytests; this row pins the end-to-end
    plumbing as a hash oracle."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk_persisted,
        ivf_hier_build,
        persist_ann_index,
        persist_recall_audit,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root, fresh = staging_dir("l48", sf_dir)
    out = root + "/ann_index"
    if fresh:
        index, super_cent = ivf_hier_build(emb)
        persist_ann_index(index, super_cent, out, embeddings=emb)
        persist_recall_audit(spark, out, probe_settings=(1, 2, 4), n_sample=32, k=5)
        staging_commit(root)
    queries = plant_twins(emb, 50)
    return ann_ivf_hier_topk_persisted(
        spark, out, None, queries, k=1, nprobe_super="auto"
    )
