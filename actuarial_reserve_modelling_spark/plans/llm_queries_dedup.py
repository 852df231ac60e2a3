"""L1-L6 — LLM-data-pipeline queries (SURVEY §2.10).

Dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
near-dup), similarity search (exact top-k + ANN), text analysis (stats,
token counts, quality, lang-id, fingerprints), multimodal plumbing.
Thresholds were chosen from the measured data distributions so outputs
are non-trivial (word-Jaccard τ=0.95 → ~1.9k pairs at sf0.01; cosine
τ=0.4 → 59 pairs; char-3-gram τ=0.6 on the doc_id<100 subset → ~200).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    winnowing_fingerprints,
)
from actuarial_reserve_modelling_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from actuarial_reserve_modelling_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_pairs,
    cosine_topk,
)
from actuarial_reserve_modelling_spark.operators.textstats import (
    content_fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)
from actuarial_reserve_modelling_spark.plans.registry import register

PLANT_OFFSET = 100_000


def plant_twins(
    emb: DataFrame, modulus: int, id_col: str = "vec_id", offset: int = PLANT_OFFSET
) -> DataFrame:
    """Exact-duplicate copies of every ``modulus``-th vector, shifted by
    ``offset`` (default ``PLANT_OFFSET``) — the shared construction
    behind the planted-twin hash oracles (l4b/l27/l27b/l27c/l3e-l3i/
    t12; l11b overrides the offset because chunk ids exceed 100000).
    The oracle SQL hardcodes the matching shift, so at a scale factor
    whose real ids reach the offset the plants would silently ALIAS
    real vectors and the oracles would mismatch confusingly; assert
    the assumption loudly instead (one column-pruned max scan). t12
    additionally relies on ``PLANT_OFFSET % 3 == 1`` for its batch
    math — change the offset only together with every oracle string."""
    mx = emb.agg(F.max(id_col).alias("m")).first()["m"]
    if mx is not None and mx >= offset:
        raise ValueError(
            f"planted-twin oracles assume max({id_col}) < {offset}, "
            f"got {mx}: raise the offset and every hardcoded shift in the "
            "oracle strings together"
        )
    return emb.filter(F.col(id_col) % modulus == 0).select(
        (F.col(id_col) + offset).alias(id_col),
        *[c for c in emb.columns if c != id_col],
    )

_PLANTED_TOP1_ORACLE = """
    SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id,
           CAST(1 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    """


# Shared CTE: distinct non-empty whitespace tokens, mirrored by
# operators.dedup.TOKENS on the Spark side.
_WORDS_CTE = """
    words AS (
        SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> ''
    )
"""


@register(
    "l1_exact_dedup",
    "L1,A8",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: shuffle 16-byte digests, not documents."""
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "l2_minhash_lsh_dedup",
    "L2,L4",
    oracle=f"""
    WITH {_WORDS_CTE},
    c AS (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    i AS (
        SELECT a.doc_id d1, b.doc_id d2, count(*) k
        FROM words a JOIN words b USING (w)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT d1, d2, round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) AS jac
    FROM i JOIN c c1 ON d1 = c1.doc_id JOIN c c2 ON d2 = c2.doc_id
    WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95
    """,
)
def l2_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(256) → LSH(16 bands × 16 rows) → exact-Jaccard verify at
    τ=0.95. The oracle computes the exact all-pairs answer. Signatures
    are deterministic given the seed, and this banding was validated to
    reproduce the exact pair set at sf0.01 (1887) and sf0.1 (190,925);
    r=16 sharpens the S-curve, cutting candidates ~40% vs r=12 on this
    deliberately similarity-saturated corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.95, bands=16, rows_per_band=16, seed=42)
    return pairs.filter(F.col("jac") >= 0.95)


@register(
    "l2e_dedup_clusters",
    "L2,L4 (clustering; iterative)",
    oracle=f"""
    WITH RECURSIVE {_WORDS_CTE},
    c AS (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    i AS (
        SELECT a.doc_id d1, b.doc_id d2, count(*) k
        FROM words a JOIN words b USING (w)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    pairs AS (
        SELECT d1, d2
        FROM i JOIN c c1 ON d1 = c1.doc_id JOIN c c2 ON d2 = c2.doc_id
        WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95
    ),
    edges AS (SELECT d1 a, d2 b FROM pairs UNION SELECT d2, d1 FROM pairs),
    closure(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT e.a, cl.b FROM edges e JOIN closure cl ON e.b = cl.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS rep_id
    FROM closure GROUP BY a
    """,
)
def l2e_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the verified
    MinHash pair graph, canonical representative = min doc_id per
    component (iterative min-label propagation,
    operators/dedup.py::dedup_clusters). The oracle computes the same
    components via a recursive transitive-closure CTE."""
    from actuarial_reserve_modelling_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.95, bands=16, rows_per_band=16, seed=42)
    return dedup_clusters(pairs.select("d1", "d2"))


@register(
    "l2b_simhash_pairs",
    "L2",
    oracle="""
    WITH words AS (
        SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents WHERE doc_id < 200
        ) WHERE w <> ''
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM words),
    bits AS (
        SELECT doc_id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS sign
        FROM h, unnest(generate_series(0, 59)) AS t(b)
    ),
    votes AS (SELECT doc_id, b, sum(sign) s FROM bits GROUP BY 1, 2),
    fp AS (
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS fp
        FROM votes GROUP BY 1
    )
    SELECT a.doc_id d1, b.doc_id d2,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 2
    """,
)
def l2b_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (60-bit, md5 word hashes, fully JVM-side) near-dup pairs
    at Hamming ≤ 2 on the doc_id<200 subset."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = simhash_near_dup_pairs(docs, max_hamming=2)
    return pairs.select("d1", "d2", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "l2c_ngram_jaccard",
    "L2",
    oracle="""
    WITH g AS (
        SELECT DISTINCT doc_id, substr(text, i, 3) AS s
        FROM documents, unnest(generate_series(1, len(text) - 2)) AS t(i)
        WHERE doc_id < 100 AND len(text) >= 3
    ),
    c AS (SELECT doc_id, count(*) n FROM g GROUP BY doc_id),
    i AS (
        SELECT a.doc_id d1, b.doc_id d2, count(*) k
        FROM g a JOIN g b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT d1, d2, round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) AS jac
    FROM i JOIN c c1 ON d1 = c1.doc_id JOIN c c2 ON d2 = c2.doc_id
    WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.6
    """,
)
def l2c_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 3-gram Jaccard pairs (τ=0.6) on the doc_id<100 subset —
    JVM sequence/substring n-gram construction, no UDF."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & (F.length("text") >= 3)
    )
    return ngram_jaccard_pairs(docs, n=3, threshold=0.6)


_COS = (
    "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) * "
    "list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6)"
)


@register(
    "l4_cosine_pairs",
    "L4,L2",
    oracle=f"""
    SELECT a.vec_id AS v1, b.vec_id AS v2, {_COS} AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS} >= 0.4
    """,
)
def l4_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ 0.4 (exact baseline;
    ann path is l3b). JVM zip_with/aggregate dot products."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, threshold=0.4)


@register(
    "l4b_lsh_cosine_pairs",
    "L4,L3 (blocked pair path)",
    oracle="""
    SELECT vec_id AS v1, vec_id + 100000 AS v2, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def l4b_lsh_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB pair path as its own surface row: multi-table
    hyperplane-LSH blocking → within-bucket candidates → exact cosine
    verify at τ=0.9 (operators/similarity.py::lsh_cosine_pairs).

    Hash-checkable despite probabilistic blocking: every 5th vector is
    planted as an exact duplicate (id + 100000), and identical vectors
    get identical signatures in EVERY hyperplane table — recall 1 by
    construction, deterministically. The corpus itself has no pairs at
    τ=0.9 (max non-identical cosine ≈ 0.51 on this testdata), so the
    output is exactly the planted pair set with sim 1.0. General-recall
    behavior (perturbed near-dups, τ-dependence) is covered by the
    ≥95%-recall unit test."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        lsh_cosine_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 5)
    return lsh_cosine_pairs(emb.unionByName(planted), threshold=0.9)


@register(
    "l2d_embedding_dedup",
    "L2,L4 (embedding-cosine near-dup -> clusters)",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS d1, b.vec_id AS d2
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COS} >= 0.4
    ),
    edges AS (SELECT d1 a, d2 b FROM pairs UNION SELECT d2, d1 FROM pairs),
    closure(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT e.a, cl.b FROM edges e JOIN closure cl ON e.b = cl.a
    )
    SELECT a AS vec_id, least(a, min(b)) AS rep_id
    FROM closure GROUP BY a
    """,
)
def l2d_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: exact cosine pairs (τ=0.4) →
    large-star/small-star connected components → canonical min-vec_id
    representative. The semantic-dedup path of a training pipeline
    (exact text dedup catches verbatim copies; this catches paraphrases
    that embed nearby). Scale path: swap the exact pair stage for
    operators/similarity.py::lsh_cosine_pairs (hyperplane blocking +
    exact verify, recall-tested at τ=0.9) — the clustering stage is
    unchanged. Exact pairs are used here because the driver's synthetic
    embeddings have no true near-dups (max pairwise cosine ≈ 0.51)."""
    from actuarial_reserve_modelling_spark.operators.dedup import dedup_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs(emb, threshold=0.4).select(
        F.col("v1").alias("d1"), F.col("v2").alias("d2")
    )
    return dedup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "rep_id"
    )


@register(
    "l3_cosine_topk",
    "L3,W4",
    oracle=f"""
    WITH sims AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS sim
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < 10
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims
    ) WHERE rank <= 5
    """,
)
def l3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id<10: brute-force
    baseline with broadcast query side; ranking on 6-dp-rounded sims
    (engine-stable), ties by neighbor id."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "sim"
    )


@register("l3b_ann_lsh_topk", "L3", oracle=None)
def l3b_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-table hyperplane LSH blocking + exact
    re-rank. Approximate ⇒ rows-only check; tests/test_llm.py asserts
    recall ≥ 0.8 vs the exact baseline. These embeddings are nearly
    uniform on the sphere (top neighbors at cosine ≈0.4-0.5, i.e. ~63°),
    so signatures must be short: 4 planes × 16 tables measured 0.96
    recall; clustered real-world embeddings would use longer signatures
    for sharper buckets."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(emb, queries, k=5, num_planes=4, num_tables=16, seed=42)


@register("l3c_ann_ivf_topk", "L3", oracle=None)
def l3c_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF: deterministic k-means coarse quantizer
    (16 lists), nprobe=6 probe + exact cosine re-rank — the other
    canonical ANN scale path next to LSH (l3b). Probing 6/16 lists
    measured 0.92 recall on these near-uniform embeddings; the recall
    test asserts >= 0.8. Approximate => rows-only check."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=6)


@register("l3d_ann_pq_topk", "L3", oracle=None)
def l3d_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via product quantization + ADC (Jegou et al.
    TPAMI'11): 8 subspaces x 16 codes (32x vector compression), the
    scan reads codes only, exact cosine re-rank of the top-8k ADC
    candidates. The memory-bound 100 TB scale path next to LSH (l3b)
    and IVF (l3c). Approximate => rows-only check + recall test
    (measured 0.74 on uniform vectors — PQ's worst case; clustered
    real embeddings recall far higher at the same code budget)."""
    from actuarial_reserve_modelling_spark.operators.similarity import ann_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_pq_topk(emb, queries, k=5, m_subspaces=8, n_codes=16, rerank=8)


@register(
    "l5_text_stats",
    "L5",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(len(list_filter(string_split(text, ' '), w -> w <> ''))), 4)
               AS avg_words
    FROM documents GROUP BY lang
    """,
)
def l5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats by language tag."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(F.size(F.expr("filter(split(text, ' '), x -> x != '')"))), 4).alias(
            "avg_words"
        ),
    )


@register(
    "l5b_token_counts",
    "L5",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
               AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
               AS re_tokens,
           CAST(len(text) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def l5b_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    out = token_counts(docs)
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.col("re_tokens").cast("bigint").alias("re_tokens"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
    )


@register(
    "l5c_quality_scores",
    "L5",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
               len(text) AS n_chars,
               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS punct,
               len(list_intersect(
                   list_distinct(list_filter(string_split(text, ' '), w -> w <> '')),
                   ['the', 'a'])) AS stop_hits
        FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           CAST(n_chars AS INT) AS n_chars_computed,
           round((n_chars - n_words + 1) / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
           round(CAST((CASE WHEN n_words BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END)
               + (CASE WHEN punct / CAST(n_chars AS DOUBLE) < 0.2 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN stop_hits >= 1 THEN 0.2 ELSE 0.0 END) AS DOUBLE), 2)
               AS quality_score
    FROM base
    """,
)
def l5c_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style rule-based quality scoring."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return quality_scores(docs)


@register(
    "l5d_lang_id",
    "L5",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS ws
        FROM documents
    ),
    hits AS (
        SELECT doc_id,
               CAST(len(list_intersect(ws, ['table', 'row', 'column', 'scan'])) AS INT) AS hits_tabular,
               CAST(len(list_intersect(ws, ['join', 'merge', 'hash', 'agg'])) AS INT) AS hits_relational,
               CAST(len(list_intersect(ws, ['window', 'batch', 'order', 'filter'])) AS INT) AS hits_temporal
        FROM w
    )
    SELECT doc_id, hits_tabular, hits_relational, hits_temporal,
           CASE WHEN hits_tabular >= hits_relational AND hits_tabular >= hits_temporal
                     AND hits_tabular > 0 THEN 'tabular'
                WHEN hits_relational >= hits_temporal AND hits_relational > 0 THEN 'relational'
                WHEN hits_temporal > 0 THEN 'temporal'
                ELSE 'und' END AS pred_lang
    FROM hits
    """,
)
def l5d_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic marker-set language/domain classification (argmax of
    stopword-style hits — the n-gram-heuristic mechanism)."""
    return lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "l5e_fingerprints",
    "L5,L1",
    oracle="""
    SELECT doc_id,
           substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
               AS fingerprint
    FROM documents WHERE doc_id % 11 = 0
    """,
)
def l5e_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content md5 fingerprints (exact-after-normalization)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    return content_fingerprints(docs)


@register(
    "l5f_winnowing",
    "L2,L5",
    oracle="""
    WITH g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               ('0x' || substr(md5(substr(text, CAST(i AS INT), 5)), 1, 15))::BIGINT AS h
        FROM documents,
             unnest(generate_series(1, greatest(length(text) - 4, 0))) t(i)
        WHERE doc_id % 17 = 0
    ),
    n AS (SELECT doc_id, max(pos) AS n_grams FROM g GROUP BY doc_id),
    m AS (
        SELECT doc_id, pos,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM g
    )
    SELECT DISTINCT m.doc_id, wmin AS fp_hash
    FROM m JOIN n USING (doc_id)
    WHERE pos <= greatest(n_grams - 3, 1)
    """,
)
def l5f_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=5, w=4) — local-overlap detection via
    sliding-window minima of 60-bit md5 gram hashes (operators/dedup.py
    winnowing_fingerprints, fully JVM-side). The oracle recomputes the
    identical selection with generate_series + a framed window min."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    return winnowing_fingerprints(docs, k=5, window=4)


@register(
    "l6b_multimodal_resize",
    "L6",
    oracle="""
    WITH src AS (
        SELECT doc_id, octet_length(encode(text)) AS ob, text
        FROM documents WHERE doc_id % 13 = 0
    )
    SELECT doc_id,
           CAST(ob AS BIGINT) AS orig_bytes,
           CAST(16 AS INT) AS resized_bytes,
           CASE WHEN ob = 0 THEN repeat('00', 16)
                ELSE upper(array_to_string(list_transform(generate_series(0, 15),
                     i -> lpad(to_hex(ascii(substr(text,
                          CAST(least((i * ob) // 16, ob - 1) + 1 AS INT), 1))), 2, '0')),
                     ''))
           END AS payload_hex
    FROM src
    """,
)
def l6b_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail plumbing: payload → fixed-size payload (16-byte
    deterministic stride-sample fake; real image resize swaps the kernel
    body, keeps the fixed-output-size contract). The oracle rebuilds the
    exact stride-sampled bytes from the source text (ASCII corpus ⇒
    byte positions == char positions) and compares them as hex, pinning
    the Arrow kernel's content, not just its output size."""
    from actuarial_reserve_modelling_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    resized = resize_media(attach_binary_payload(docs), target_bytes=16)
    return resized.select(
        "doc_id",
        "orig_bytes",
        F.length("payload").alias("resized_bytes"),
        F.hex("payload").alias("payload_hex"),
    )


@register(
    "l6c_frame_sample",
    "L6 (frame-sample plumbing)",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(coalesce(ascii(substr(text, CAST(i * 64 + 1 AS INT), 1)), -1) AS INT)
               AS lead_byte
    FROM documents,
         unnest(generate_series(0, CAST(octet_length(encode(text)) // 64 AS INT))) t(i)
    WHERE doc_id % 31 = 7
    """,
)
def l6c_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/sample plumbing: 1 binary payload row → N sampled 'frames'
    (video frame-sample analogue; deterministic byte-slice fake — a real
    demuxer swaps the slicer, keeps the one-row-per-frame explode
    contract). JVM-side transform+explode, no Python in the hot path."""
    from actuarial_reserve_modelling_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 7)
    return frame_sample(attach_binary_payload(docs), every_n_bytes=64)


@register(
    "l6_multimodal",
    "L6",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS feat0,
           'text/plain' AS mime
    FROM documents WHERE doc_id % 13 = 0
    """,
)
def l6_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text → binary payload + typed
    metadata struct → Arrow feature-extraction kernel (deterministic
    fake decode; see operators/multimodal.py). Oracle checks byte_len +
    first-byte feature + metadata propagation."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    media = attach_binary_payload(docs)
    feats = extract_features(media)
    meta = media.select("doc_id", F.col("meta.mime").alias("mime"))
    return feats.join(meta, "doc_id").select("doc_id", "byte_len", "feat0", "mime")


@register(
    "l6d_audio_frame_energy",
    "L6 (audio frame-energy plumbing)",
    oracle="""
    WITH d AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n
        FROM documents WHERE doc_id % 29 = 3
    ),
    fr AS (
        SELECT doc_id, text, n,
               unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS frame_idx
        FROM d
    ),
    s AS (
        SELECT doc_id, frame_idx,
               list_transform(
                   range(frame_idx * 64 + 1, least((frame_idx + 1) * 64, n) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))
               ) AS b
        FROM fr
    )
    SELECT doc_id, frame_idx, CAST(len(b) AS BIGINT) AS n_samples,
           round(sqrt(list_sum(list_transform(b, x -> x * x))
                      / CAST(len(b) AS DOUBLE)), 6) AS energy
    FROM s
    """,
)
def l6d_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-featurizer plumbing: payload → fixed-size frames → per-
    frame RMS energy (deterministic uint8-PCM fake; a real build swaps
    in the codec, keeps the 1-row-per-frame aggregate contract). The
    oracle recomputes the exact per-frame energies from the source text
    (ASCII corpus ⇒ byte value == ascii(char)) — content-pinning the
    Arrow kernel's arithmetic, not just its row counts."""
    from actuarial_reserve_modelling_spark.operators.multimodal import audio_frame_energy

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 3)
    return audio_frame_energy(attach_binary_payload(docs), frame_bytes=64)


@register(
    "l30_media_decode",
    "L6 (REAL codec decode: BMP header parse + stdlib WAV, exact-sum oracle)",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
    img AS (
        SELECT doc_id, 'image/bmp' AS mime, '4x4x3' AS dims,
               CAST(48 AS BIGINT) AS n_values,
               CAST(sum((doc_id * 7 + i * 13) % 256) AS DOUBLE) AS value_sum
        FROM ids, unnest(generate_series(0, 47)) AS t(i) GROUP BY doc_id
    ),
    aud AS (
        SELECT doc_id, 'audio/wav' AS mime, '32' AS dims,
               CAST(32 AS BIGINT) AS n_values,
               sum(((doc_id * 31 + i * 17) % 65536) - 32768) / 32768.0 AS value_sum
        FROM ids, unnest(generate_series(0, 31)) AS t(i) GROUP BY doc_id
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud
    """,
)
def l30_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL decode path executing end-to-end in a distributed plan
    (not the deterministic-fake plumbing of l6/l6b/l6c/l6d): per doc,
    manufacture one 4×4 24-bit BMP whose pixel bytes are the arithmetic
    sequence (doc_id·7 + i·13) mod 256 and one 32-sample int16 WAV with
    samples (doc_id·31 + i·17) mod 65536 − 32768, then decode both with
    ``decode_media``'s dependency-free codecs (manual BMP header parse,
    stdlib ``wave``) via ``decode_features``. Decoded dims and EXACT
    value sums (uint8 pixel sum; dyadic int16/2^15 sample sum — no
    float tolerance) are hash-checked against an oracle that computes
    the same sums straight from the payload-construction arithmetic, so
    a codec that mis-parses padding, row order, channel order (sums are
    invariant to those two — shape/count pins them jointly with the
    round-trip pytest), bit depth, or sign convention fails the hash."""
    from actuarial_reserve_modelling_spark.operators import spread_for_kernel
    from actuarial_reserve_modelling_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
        encode_bmp,
        encode_wav,
    )

    def make_payloads(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pix = ((d * 7 + np.arange(48) * 13) % 256).astype(np.uint8)
                bmp = encode_bmp(pix.reshape(4, 4, 3))
                samp = (((d * 31 + np.arange(32) * 17) % 65536) - 32768).astype(
                    np.int16
                )
                wav = encode_wav(samp)
                for payload, mime in ((bmp, "image/bmp"), (wav, "audio/wav")):
                    out["doc_id"].append(d)
                    out["payload"].append(payload)
                    out["meta"].append({"mime": mime, "n_bytes": len(payload)})
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = spread_for_kernel(docs.select("doc_id")).mapInPandas(
        make_payloads, schema=MEDIA_SCHEMA
    )
    # Driver-hashability (determinism convention: every checked column is
    # SCALAR): the decoded `dims array<int>` is stringified as '4x4x3' so
    # the harness's pandas sort/hash canonicalizer never sees a list cell.
    return decode_features(media).withColumn("dims", F.array_join("dims", "x"))


