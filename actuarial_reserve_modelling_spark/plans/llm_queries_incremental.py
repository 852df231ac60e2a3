"""L1-L9/D8 — incremental dedup, persisted-tier deletes, PII scrub,
ANN index adds, semantic/segment dedup, and the planted-top1 ANN
family (SURVEY §2.10). Split out of llm_queries.py (r12, registry
hygiene); registration ORDER is preserved by the ordered imports in
plans/llm_queries.py — the three tier modules register in the exact
sequence the single file did."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
)
from actuarial_reserve_modelling_spark.operators.textstats import content_fingerprints
from actuarial_reserve_modelling_spark.plans.llm_queries_dedup import (
    _COS,
    _PLANTED_TOP1_ORACLE,
    _WORDS_CTE,
    plant_twins,
)
from actuarial_reserve_modelling_spark.plans.registry import register

@register(
    "l18_incremental_exact_dedup",
    "L1,D8 (incremental ingest, exact tier)",
    oracle="""
    SELECT n.doc_id,
           substr(md5(regexp_replace(trim(lower(n.text)), '\\s+', ' ', 'g')), 1, 16)
               AS fingerprint
    FROM documents n
    WHERE n.doc_id % 3 = 0
      AND md5(regexp_replace(trim(lower(n.text)), '\\s+', ' ', 'g')) NOT IN (
        SELECT md5(regexp_replace(trim(lower(e.text)), '\\s+', ' ', 'g'))
        FROM documents e WHERE e.doc_id % 3 <> 0
      )
    """,
)
def l18_incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest exact tier: new-batch documents (doc_id%3=0)
    whose normalized-content fingerprint does NOT already exist in the
    ingested corpus (doc_id%3≠0) — a fingerprint anti-join, the shape
    that admits only NEW content without re-scanning the corpus text
    (in production the corpus side is the persisted fingerprint column,
    16 bytes/doc). Left-anti hash join on the digest; the corpus side
    carries fingerprints only, never documents."""
    docs = load_table(spark, sf_dir, "documents")
    new_fp = content_fingerprints(docs.filter(F.col("doc_id") % 3 == 0))
    seen_fp = content_fingerprints(docs.filter(F.col("doc_id") % 3 != 0)).select(
        "fingerprint"
    )
    return new_fp.join(seen_fp, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


@register(
    "l19_incremental_minhash_dedup",
    "L2,D8 (incremental ingest, near-dup tier)",
    oracle=f"""
    WITH {_WORDS_CTE},
    c AS (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    i AS (
        SELECT a.doc_id new_id, b.doc_id index_id, count(*) k
        FROM words a JOIN words b USING (w)
        WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0 GROUP BY 1, 2
    )
    SELECT new_id, index_id,
           round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) AS jac
    FROM i JOIN c c1 ON new_id = c1.doc_id JOIN c c2 ON index_id = c2.doc_id
    WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95
    """,
)
def l19_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest near-dup tier: the new batch (doc_id%3=0)
    checked AGAINST the persisted corpus index (doc_id%3≠0) via the
    asymmetric LSH equi-join (operators/dedup.py::
    minhash_dedup_against_index) — no new×new or index×index candidates
    are ever generated, and the corpus is never re-signed. The oracle
    is the exact new×corpus all-pairs answer; b=16 r=16 banding gives
    miss probability (1-0.95^16)^16 ~ 1e-18 at tau=0.95, so the
    verified LSH output equals it (validated at sf0.001/0.01)."""
    from actuarial_reserve_modelling_spark.operators.dedup import (
        build_dedup_index,
        minhash_dedup_against_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    # checkpoint the inline-built index: the operator consumes it twice
    # (banding + verify join) and would otherwise re-sign the corpus;
    # the production caller reads a persisted index instead
    index = build_dedup_index(
        docs.filter(F.col("doc_id") % 3 != 0), bands=16, rows_per_band=16
    ).localCheckpoint(eager=False)
    return minhash_dedup_against_index(
        docs.filter(F.col("doc_id") % 3 == 0),
        index,
        threshold=0.95,
        bands=16,
        rows_per_band=16,
    )


@register(
    "l38_dedup_index_delete_persisted",
    "L2,D8,S7 (persisted fingerprint tier: build, incremental add, right-to-be-forgotten delete)",
    oracle=f"""
    WITH {_WORDS_CTE},
    c AS (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    i AS (
        SELECT a.doc_id new_id, b.doc_id index_id, count(*) k
        FROM words a JOIN words b USING (w)
        WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0 AND b.doc_id % 5 <> 1
        GROUP BY 1, 2
    )
    SELECT new_id, index_id,
           round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) AS jac
    FROM i JOIN c c1 ON new_id = c1.doc_id JOIN c c2 ON index_id = c2.doc_id
    WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95
    """,
)
def l38_dedup_index_delete_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full persisted lifecycle of the dedup fingerprint tier (r9
    verdict gap #3 — the ANN index had delete since r9, the dedup tier
    did not): ``persist_dedup_index`` writes the corpus HALF of the
    index (doc_id%3≠0 and %4≠1) id-hash-bucketed; ``add_to_dedup_index``
    signs the remaining corpus docs (%4=1) with the PERSISTED banding
    parameters and appends them bucket-locally;
    ``delete_from_dedup_index`` then removes every index doc with
    doc_id%5=1 by touched-bucket-only partition overwrite. The l19
    ingest check (new batch doc_id%3=0 against the reloaded tier) must
    find exactly the exact-Jaccard pairs whose index side SURVIVES:
    a lost add drops pairs, a left-behind delete re-emits a deleted
    index_id, a double-append duplicates a pair — all hash-mismatch
    against the oracle (the exact all-pairs answer filtered to
    surviving index ids; b=16 r=16 banding recall argument as l19)."""
    from actuarial_reserve_modelling_spark.operators.dedup import (
        add_to_dedup_index,
        build_dedup_index,
        delete_from_dedup_index,
        load_dedup_index,
        minhash_dedup_against_index,
        persist_dedup_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    root, fresh = staging_dir("l38", sf_dir)
    out = root + "/dedup_index"
    if fresh:
        base = build_dedup_index(
            corpus.filter(F.col("doc_id") % 4 != 1), bands=16, rows_per_band=16
        )
        persist_dedup_index(base, out, bands=16, rows_per_band=16)
        add_to_dedup_index(spark, out, corpus.filter(F.col("doc_id") % 4 == 1))
        delete_from_dedup_index(
            spark, out, corpus.filter(F.col("doc_id") % 5 == 1).select("doc_id")
        )
        staging_commit(root)
    index = load_dedup_index(spark, out)
    return minhash_dedup_against_index(
        docs.filter(F.col("doc_id") % 3 == 0),
        index,
        threshold=0.95,
        bands=16,
        rows_per_band=16,
    )


@register(
    "l39_ivfpq_index_delete_persisted",
    "L3,S7,L10 (deletion from the persisted IVF-PQ index via partition overwrite)",
    oracle="""
    SELECT vec_id + 200000 AS query_id, vec_id + 100000 AS neighbor_id,
           CAST(1 AS INT) AS rank, CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def l39_ivfpq_index_delete_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remove side of the PQ-tier lifecycle (l36's analogue over
    the cluster-partitioned codes table): build+persist on the base
    corpus, ``add_to_ivfpq_index`` exact twins (+100000), then DELETE
    the original sources through the shared partitioned-delete engine —
    untouched clusters keep their files, emptied ones lose their
    directory. A third twin (+200000) at k=1 pins both mutations: the
    added twin is now the only sim-1.0 vector, so rank 1 must be
    id+100000 — a left-behind delete re-surfaces the lower source id
    and hash-mismatches; a lost add leaves no 1.0 neighbor at rank 1
    and mismatches too."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        add_to_ivfpq_index,
        ann_ivfpq_topk_persisted,
        delete_from_ivfpq_index,
        persist_ivfpq_index,
    )
    from actuarial_reserve_modelling_spark.sources.sinks import (
        staging_commit,
        staging_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    added = plant_twins(emb, 50)
    queries = plant_twins(emb, 50, offset=200_000)
    sources = emb.filter(F.col("vec_id") % 50 == 0).select("vec_id")
    root, fresh = staging_dir("l39", sf_dir)
    out = root + "/ivfpq_index"
    if fresh:
        persist_ivfpq_index(emb, out, n_centroids=16, m_subspaces=8, n_codes=16)
        add_to_ivfpq_index(spark, out, added)
        delete_from_ivfpq_index(spark, out, sources)
        staging_commit(root)
    return ann_ivfpq_topk_persisted(spark, out, None, queries, k=1, nprobe=4, rerank=32)


@register(
    "l20_pii_scrub",
    "L5,D8 (compliance scrub; map-side)",
    oracle="""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or 10.0.'
                    || (doc_id % 200) || '.1' AS t
        FROM documents WHERE doc_id % 7 = 2
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
               '\\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS scrub_md5,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INT) AS n_ips
    FROM injected
    """,
)
def l20_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/textstats.py::scrub_pii): emails, IPv4s,
    and phone-like digit runs replaced by typed placeholders — three
    chained regexp_replace in whole-stage codegen, zero shuffle, scan
    throughput at any corpus size. The synthetic corpus carries no PII,
    so both sides inject a deterministic email+IP per sampled doc and
    the scrub result is md5-checked; patterns are written to the
    Java-regex / RE2 common dialect so Spark and DuckDB agree."""
    from actuarial_reserve_modelling_spark.operators.textstats import scrub_pii

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 2)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    return scrub_pii(injected).select(
        "doc_id", F.md5("scrubbed").alias("scrub_md5"), "n_emails", "n_ips"
    )


@register(
    "l25_ann_ivf_index_add",
    "L3,D8 (incremental IVF index add + query, planted hash oracle)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l25_ann_ivf_index_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental similarity-search ingest, now HASH-GRADE (r10
    verdict task #4 — this row rode ``no_oracle`` while its code path
    had planted-twin twins): centroids trained ONCE on the existing
    corpus, the new batch — exact twins (id+100000) of every 50th
    vector — assigned map-side against those frozen centroids
    (``ivf_assign``, no retraining, no rebuild) and appended to the
    lists; queries probe the UNION index
    (operators/similarity.py::ann_ivf_topk_indexed). A twin assigns to
    exactly its source's list (identical assignment arithmetic), the
    twin-query's nearest probed list is that same list, and the exact
    re-rank pins the sim-1.0 source at rank 1 (self excluded) — so the
    add path's correctness is the hash: a lost or misrouted add batch
    drops its twins from the lists and rank 1 stops being the source.
    General recall of the indexed path stays in the pytest
    (add-batch ≡ whole-corpus assignment under the same centroids)."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_topk_indexed,
        ivf_assign,
        ivf_train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    centroids = ivf_train_centroids(emb, n_centroids=16)
    lists = ivf_assign(emb, centroids).unionByName(ivf_assign(planted, centroids))
    return ann_ivf_topk_indexed(
        lists, centroids, emb.unionByName(planted), planted, k=1, nprobe=4
    )


@register(
    "l26_ann_ivfpq_topk",
    "L3 (IVF-PQ composite, the production ANN shape, planted hash oracle)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l26_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite (operators/similarity.py::ann_ivfpq_topk):
    coarse 16-list quantizer + 8×16 product quantization of the
    residuals, queries scan only their probed lists' codes via
    per-query LUT ADC (inner-product decomposition:
    IP(q, c+r) = q·c + q·r), exact cosine re-rank of the shortlist —
    the composite every production vector store ships. Now HASH-GRADE
    via the planted-twin construction (r10 verdict task #4; this row's
    ``no_oracle`` predated l3i): every 50th vector's exact twin
    queries at k=1 with a 32-row exact rerank window, the twin's code
    word equals its source's, and rank 1 is the sim-1.0 source
    deterministically. Differs from l3i in probe width (nprobe=6, the
    row's original production setting). General recall stays in the
    rows-only pytest (recall vs exact + determinism)."""
    from actuarial_reserve_modelling_spark.operators.similarity import ann_ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    return ann_ivfpq_topk(
        corpus,
        planted,
        k=1,
        n_centroids=16,
        nprobe=6,
        m_subspaces=8,
        n_codes=16,
        rerank=32,
    )


@register(
    "l27_semantic_dedup",
    "L3,L4,L2 (SemDeDup: embedding-level semantic dedup)",
    oracle=f"""
    WITH RECURSIVE p AS (
        SELECT a.vec_id v1, b.vec_id v2
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COS} >= 0.4
    ),
    edges AS (SELECT v1 a, v2 b FROM p UNION SELECT v2, v1 FROM p),
    closure(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT e.a, c.b FROM edges e JOIN closure c ON e.b = c.a
    ),
    reps AS (
        SELECT a AS vec_id, least(a, min(b)) AS rep_id
        FROM closure GROUP BY a
    )
    SELECT e.vec_id, coalesce(r.rep_id, e.vec_id) AS rep_id,
           CAST(coalesce(r.rep_id, e.vec_id) = e.vec_id AS INT) AS keep
    FROM embeddings e LEFT JOIN reps r USING (vec_id)
    """,
)
def l27_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.py::semantic_dedup): connected
    components over the cosine ≥ 0.4 pair graph, keep = min-id rep per
    component, singletons keep themselves — the embedding-level dedup
    tier that catches paraphrases sharing no n-grams. Exact pair stage
    here via the explicit ``exact=True`` opt-in (the correctness
    baseline, same cosine SQL as l4); the 100 TB blocked-pair path is
    its own registry row (l27b). Oracle:
    recursive transitive-closure CTE + left join to the full corpus."""
    from actuarial_reserve_modelling_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.4, exact=True)


@register(
    "l27b_semantic_dedup_lsh",
    "L7,L3,L4 (SemDeDup over the blocked LSH pair stage — the 100 TB path)",
    oracle="""
    SELECT vec_id, vec_id AS rep_id, CAST(1 AS INT) AS keep FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, vec_id AS rep_id, CAST(0 AS INT) AS keep
    FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def l27b_semantic_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup fed by the blocked pair stage — ``semantic_dedup(pairs=
    lsh_cosine_pairs(...))`` — so the corpus-scale path (hyperplane-LSH
    blocking, no all-pairs stage) carries its own hash-grade evidence
    instead of riding on l4b's plus prose.

    Hash-checkable despite probabilistic blocking, by the l4b
    construction: every 5th vector is planted as an exact duplicate
    (id + 100000); identical vectors get identical signatures in EVERY
    hyperplane table, so recall on the planted pairs is 1
    deterministically, and the corpus itself has no pairs at τ=0.9
    (max non-identical cosine ≈ 0.51 on this testdata). The component
    set is therefore exactly the planted {v, v+100000} pairs: originals
    keep themselves, plants point at their source with keep=0."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        lsh_cosine_pairs,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 5)
    corpus = emb.unionByName(planted)
    return semantic_dedup(corpus, pairs=lsh_cosine_pairs(corpus, threshold=0.9))


@register(
    "l29_segment_dedup",
    "L8,L1,L5,D5 (CCNet-style line/segment-level boilerplate removal)",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    seg AS (
        SELECT doc_id, i AS seg_idx,
               array_to_string(list_slice(ws, i, i + 9), ' ') AS seg_text
        FROM tok, unnest(generate_series(1, greatest(len(ws), 1), 10)) AS t(i)
        WHERE array_to_string(list_slice(ws, i, i + 9), ' ') <> ''
    ),
    freq AS (
        SELECT seg_text FROM seg GROUP BY seg_text
        HAVING count(DISTINCT doc_id) > 2
    ),
    kept AS (
        SELECT s.doc_id,
               CAST(count(*) AS INT) AS n_kept,
               string_agg(s.seg_text, ' ' ORDER BY s.seg_idx) AS cleaned
        FROM seg s ANTI JOIN freq f ON s.seg_text = f.seg_text
        GROUP BY s.doc_id
    ),
    totals AS (
        SELECT d.doc_id, CAST(count(s.doc_id) AS INT) AS n_segments
        FROM documents d LEFT JOIN seg s USING (doc_id) GROUP BY d.doc_id
    )
    SELECT t.doc_id, t.n_segments,
           CAST(t.n_segments - coalesce(k.n_kept, 0) AS INT) AS n_dropped,
           md5(coalesce(k.cleaned, '')) AS cleaned_md5
    FROM totals t LEFT JOIN kept k USING (doc_id)
    """,
)
def l29_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line/segment-level dedup (operators/dedup.py::segment_dedup):
    10-word segments whose corpus document-frequency exceeds 2 are
    dropped as boilerplate and each doc is reassembled from its kept
    segments — the CCNet line-dedup mechanism over deterministic
    segmentation (this corpus has no newlines). Digest-only frequency
    shuffle, AQE-decided anti-join on the (unbounded) drop-set, per-doc
    bounded reassembly sort; token-less docs return (doc_id, 0, 0, '').
    Oracle mirrors the same segmentation and DF rule; the cleaned text
    is md5-pinned."""
    from actuarial_reserve_modelling_spark.operators.dedup import segment_dedup

    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup(docs, seg_words=10, max_df=2).select(
        "doc_id", "n_segments", "n_dropped", F.md5("cleaned").alias("cleaned_md5")
    )


@register(
    "l32_repeated_spans",
    "L9,L2,D5 (ExactSubstr-style repeated-substring span removal)",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    pos AS (
        SELECT doc_id, CAST(i AS INT) AS s,
               array_to_string(list_slice(ws, i, i + 7), ' ') AS w
        FROM tok, unnest(generate_series(1, len(ws) - 7)) AS t(i)
    ),
    rep AS (SELECT w FROM pos GROUP BY w HAVING count(*) >= 2),
    marked AS (
        SELECT doc_id, s, s + 8 AS e FROM pos SEMI JOIN rep USING (w)
    ),
    isl AS (
        SELECT doc_id, s, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pm
        FROM marked
    ),
    grp AS (
        SELECT doc_id, s, e,
               sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY s
                         ROWS UNBOUNDED PRECEDING) AS g
        FROM isl
    ),
    spans AS (
        SELECT doc_id, g, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, g
    ),
    agg AS (
        SELECT doc_id, CAST(count(*) AS INT) AS n_spans,
               CAST(sum(e - s) AS INT) AS n_masked
        FROM spans GROUP BY doc_id
    ),
    keptagg AS (
        SELECT t.doc_id, string_agg(t.ws[i], ' ' ORDER BY i) AS cleaned
        FROM tok t, unnest(generate_series(1, len(t.ws))) AS u(i)
        WHERE NOT EXISTS (
            SELECT 1 FROM spans sp
            WHERE sp.doc_id = t.doc_id AND i >= sp.s AND i < sp.e)
        GROUP BY t.doc_id
    )
    SELECT t.doc_id, CAST(len(t.ws) AS INT) AS n_tokens,
           coalesce(a.n_spans, 0) AS n_spans,
           coalesce(a.n_masked, 0) AS n_masked,
           md5(coalesce(k.cleaned, '')) AS cleaned_md5
    FROM tok t LEFT JOIN agg a USING (doc_id) LEFT JOIN keptagg k USING (doc_id)
    """,
)
def l32_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style repeated-substring removal (operators/dedup.py
    ::repeated_span_removal; Lee et al. arXiv:2107.06499): every
    overlapping 8-word window occurring ≥2 times corpus-wide (including
    within-doc repeats) marks its token range; overlapping marks merge
    into maximal spans (gaps-and-islands windows) and each doc is
    rebuilt from the tokens outside its spans. Digest-only window
    shuffle, AQE-decided repeated-set semi-join, two bounded per-doc
    windows for the merge; the cleaned text is md5-pinned and the whole
    span algebra is mirrored in the oracle's window formulation."""
    from actuarial_reserve_modelling_spark.operators.dedup import repeated_span_removal

    docs = load_table(spark, sf_dir, "documents")
    return repeated_span_removal(docs, span_words=8, min_count=2).select(
        "doc_id", "n_tokens", "n_spans", "n_masked", F.md5("cleaned").alias("cleaned_md5")
    )


@register(
    "l27c_semantic_dedup_ivf",
    "L7,L3,L4 (SemDeDup over the IVF-blocked pair stage — moderate-τ scale path)",
    oracle="""
    SELECT vec_id, vec_id AS rep_id, CAST(1 AS INT) AS keep FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, vec_id AS rep_id, CAST(0 AS INT) AS keep
    FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def l27c_semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup fed by the IVF-partitioned pair stage
    (operators/similarity.py::ivf_cosine_pairs) — the blocking geometry
    for SemDeDup's MODERATE working thresholds (τ ≈ 0.3-0.6), where
    hyperplane LSH's collision curve stops separating pairs (l27b
    covers the near-dup-τ LSH path). Hash-checkable by the same
    planted-duplicate construction as l27b: identical vectors get
    identical stable-argsort list assignments, so every planted pair
    shares all its probed inverted lists deterministically — recall 1
    by construction — and the corpus has no non-identical pairs at
    τ=0.9. The general moderate-τ recall behavior (0.985 at τ=0.4,
    nprobe=4 on uniform vectors) is pinned by the recall pytest."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ivf_cosine_pairs,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 5)
    corpus = emb.unionByName(planted)
    return semantic_dedup(
        corpus,
        # bounded-list auto centroids + nprobe=2: planted recall is 1 at
        # ANY nprobe (identical vectors share every probed list), and
        # the lower probe keeps the verify stage at its linear budget;
        # the moderate-τ nprobe=4 recall behavior is pytest-pinned
        pairs=ivf_cosine_pairs(corpus, threshold=0.9, nprobe=2, n_iters=1),
    )



@register(
    "l3e_ann_lsh_top1_planted",
    "L3 (hash-grade evidence for the LSH ANN path via planted twins)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l3e_ann_lsh_top1_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, hash-checkable slice of the LSH ANN top-k path
    (the general-recall behavior stays rows-only in l3b): every 50th
    vector is planted as an exact duplicate (id + 100000) and used as
    a top-1 query. Identical vectors sign identically in every table,
    so the twin is ALWAYS a candidate; its exact re-ranked sim is 1.0
    while the corpus's max non-identical cosine is ~0.51 — rank 1 is
    therefore the twin, deterministically, and the driver can
    hash-compare the full output instead of counting rows."""
    from actuarial_reserve_modelling_spark.operators.similarity import ann_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    return ann_lsh_topk(corpus, planted, k=1)


@register(
    "l3f_ann_ivf_top1_planted",
    "L3 (hash-grade evidence for the IVF ANN path via planted twins)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l3f_ann_ivf_top1_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF analogue of l3e: a planted twin lands in exactly its
    source's cluster (stable-argsort assignment is deterministic on
    identical vectors), every query probes its own nearest clusters
    first, and the exact re-rank puts the sim-1.0 twin at rank 1 —
    hash-grade driver evidence for the IVF scan-pruning path, with
    general recall still covered by l3c's rows-only + pytest."""
    from actuarial_reserve_modelling_spark.operators.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    return ann_ivf_topk(corpus, planted, k=1, n_centroids=16, nprobe=4)


@register(
    "l3g_ann_ivf_hier_top1_planted",
    "L3 (hash-grade evidence for the two-level hierarchical IVF index via planted twins)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l3g_ann_ivf_hier_top1_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l3f's construction over the r8 HIERARCHICAL index
    (operators/similarity.py::ivf_hier_build +
    ann_ivf_hier_topk_indexed): a planted twin hard-assigns to exactly
    its source's (super, child) list at build, the twin-query's top-1
    probed super is that same super (identical distance rows through
    the identical ``ivf_assign`` kernel) and its rank-1 child WITHIN it
    is the member's child (per-super ranking with the build kernel's
    own arithmetic — immune to crowding-out by other supers' children),
    so the sim-1.0 twin reaches the exact re-rank and rank 1 with
    probability 1. Hash-grade driver evidence for the quartic-root
    quantizer path; general recall is pinned by the pytest (0.99 @5 on
    clustered vectors). Added r8 → queued for the round-9 driver
    window; local evidence: tools/check_oracle sf0.01 + sf0.1."""
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_hier_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    return ann_ivf_hier_topk(corpus, planted, k=1)


@register(
    "l3h_ann_pq_top1_planted",
    "L3 (hash-grade evidence for the PQ/ADC ANN path via planted twins)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l3h_ann_pq_top1_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ analogue of l3e/l3f — the last ANN family member without
    a hash-grade driver row. A planted twin encodes to EXACTLY its
    source's m-byte code word (pq_encode is deterministic on identical
    vectors), so the source's ADC score for the twin-query is the
    maximal q·quant(q) while every non-code-sharing vector scores
    q·quant(y) ≈ cos(q,y) ≤ ~0.51; the exact re-rank then pins sim 1.0
    at rank 1. Unlike l3e/l3f the shortlist guarantee is EMPIRICAL,
    not structural: coarse 16-code-per-subspace codebooks can assign
    other clustered vectors the same code word, and ADC ties break by
    ascending id — so the source could in principle be crowded out of
    a small shortlist by lower-id code-sharers. rerank=32 (a 32-row
    exact window per query, still O(1)) makes that impossible at both
    checked scales; everything is deterministic end to end, so the
    local sf0.01/sf0.1 verification transfers exactly to the driver.
    General PQ recall stays rows-only in l3d."""
    from actuarial_reserve_modelling_spark.operators.similarity import ann_pq_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    return ann_pq_topk(corpus, planted, k=1, m_subspaces=8, n_codes=16, rerank=32)


@register(
    "l3i_ann_ivfpq_top1_planted",
    "L3 (hash-grade evidence for the IVF-PQ composite via planted twins)",
    oracle=_PLANTED_TOP1_ORACLE,
)
def l3i_ann_ivfpq_top1_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l3h's construction over the IVF-PQ composite (the production
    ANN shape, rows-only in l26): the twin hard-assigns to its
    source's coarse list (identical ``ivf_assign`` arithmetic), its
    RESIDUAL against that list's centroid is identical to the
    source's and therefore encodes to the same code word, and the
    twin-query's nearest probed list is its own — so the source is
    always scanned and scores the maximal q·c + q·quant(r). The same
    empirical shortlist caveat as l3h applies (code-word sharing
    within a dense list), handled the same way: rerank=32 exact
    window, deterministic end to end, verified at sf0.01 AND sf0.1
    before entering the driver queue."""
    from actuarial_reserve_modelling_spark.operators.similarity import ann_ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 50)
    corpus = emb.unionByName(planted)
    return ann_ivfpq_topk(
        corpus,
        planted,
        k=1,
        n_centroids=16,
        nprobe=4,
        m_subspaces=8,
        n_codes=16,
        rerank=32,
    )


