"""T1-T4 — streaming queries, oracle-checked via batch equivalence
(SURVEY §2.9): each runs a real Structured Streaming query (file-arrival
source, AvailableNow trigger, memory sink) whose drained result must
equal the DuckDB batch answer over the same rows. T5/T6 (watermark
semantics) are behavioral and live in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register
from actuarial_reserve_modelling_spark.streaming.pipeline import (
    events_stream_source,
    run_to_table,
    session_counts,
    sliding_counts,
    stream_stream_join,
    tumbling_counts,
)


@register(
    "t1_stream_batch_equivalence",
    "T1",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def t1_stream_batch_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-arrival incremental source drained with AvailableNow — the
    EventBridge→Lambda pattern (stack.py:382-393) as a data-plane
    stream. Result must equal the plain batch aggregate."""
    stream, _ = events_stream_source(spark, sf_dir)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_table(counts, output_mode="complete")


@register(
    "t2_tumbling_window",
    "T2",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def t2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event_type."""
    stream, _ = events_stream_source(spark, sf_dir)
    return run_to_table(tumbling_counts(stream), output_mode="complete")


@register(
    "t3_sliding_window",
    "T3",
    oracle="""
    WITH starts AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type
        FROM events
    )
    SELECT w_start, event_type, count(*) AS n FROM starts GROUP BY 1, 2
    """,
)
def t3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes: each event belongs to
    exactly two windows — the oracle expands that membership manually."""
    stream, _ = events_stream_source(spark, sf_dir)
    return run_to_table(sliding_counts(stream), output_mode="complete")


@register(
    "t7_stream_stream_join",
    "T1,J1 (stream-stream time-bound join)",
    oracle="""
    SELECT l.event_id AS left_id, r.event_id AS right_id,
           l.user_id AS user_id, l.ts AS left_ts, r.ts AS right_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL '30 minutes'
    """,
)
def t7_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (purchases ↔ same-user clicks within the
    preceding 30 min), drained with AvailableNow. The watermark is set
    beyond the data's time span so the batch-equivalence oracle holds —
    the arrival files carry randomly-ordered event times, and a tight
    watermark would GC join state between micro-batches (production
    tightens it to bound state; see streaming/pipeline.py)."""
    stream, _ = events_stream_source(spark, sf_dir)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    return run_to_table(
        stream_stream_join(purchases, clicks, within="30 minutes", watermark="90 days"),
        output_mode="append",
    )


@register(
    "t4_session_window",
    "T4",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    )
    SELECT min(ts) AS w_start, max(ts) + INTERVAL '5 minutes' AS w_end,
           user_id, count(*) AS n
    FROM sessions GROUP BY user_id, sid
    """,
)
def t4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 5-minute gap. Spark merges events with
    inter-arrival < gap; session end = last event + gap — the oracle is
    the classic gaps-and-islands SQL with the same >= boundary rule."""
    stream, _ = events_stream_source(spark, sf_dir)
    return run_to_table(session_counts(stream), output_mode="complete")


@register(
    "t5_watermark_equivalence",
    "T5",
    oracle="""
    WITH a AS (SELECT ts FROM events WHERE event_id % 10 < 8),
         c AS (SELECT ts FROM events WHERE event_id % 10 = 9),
         late_wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM a),
         final_wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
         kept AS (
           SELECT ts FROM events WHERE event_id % 10 < 9
           UNION ALL
           SELECT c.ts FROM c, late_wm
           WHERE time_bucket(INTERVAL '10 minutes', c.ts) + INTERVAL 10 MINUTE
                 > late_wm.w
         )
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
           CAST(count(*) AS BIGINT) AS n
    FROM kept
    WHERE time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE
          <= (SELECT w FROM final_wm)
    GROUP BY 1
    """,
)
def t5_watermark_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — watermark + late-data drop, DETERMINISTIC and oracle-checked.

    Three staged files play in a fixed micro-batch order (file mtimes +
    maxFilesPerTrigger=1): batch 0 = 80% of events (advances the
    watermark to max(A) − 10 min), batch 1 = 10%, batch 2 = the last 10%
    — whose old rows are now provably late. Spark's late-event filter
    for batch N uses the watermark of batch N−1's start (eviction uses
    the current one — the SPARK-24634 two-value split, verified
    empirically), so batch 2's filter is exactly max(A) − 10 min and the
    drop set is a pure function of the data. The oracle replays that
    model in SQL: A∪B always kept, C kept only where the window end
    beats the late watermark, and append mode emits only windows
    finalized by the terminal watermark max(all) − 10 min."""
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        staged_ordered_source,
        watermarked_tumbling,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    frames = [
        ev.filter(F.col("event_id") % 10 < 8),
        ev.filter(F.col("event_id") % 10 == 8),
        ev.filter(F.col("event_id") % 10 == 9),
    ]
    stream = staged_ordered_source(spark, frames, f"t5_{sf_dir}")
    return run_to_table(
        watermarked_tumbling(stream, "10 minutes", "10 minutes"),
        output_mode="append",
    )


@register(
    "t6_stream_dedup_equivalence",
    "T6",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY event_type
    """,
)
def t6_stream_dedup_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 — stateful stream dedup under the oracle: duplicate copies of
    every 7th event are injected into the stream, split into two
    micro-batches on the time midpoint (each duplicate shares its
    original's ts, so both copies always land in the same batch — no
    late-arrival ambiguity, and batch 1 exercises state carried across
    micro-batches plus watermark GC of batch-0 keys).
    ``dropDuplicatesWithinWatermark`` must suppress every injected copy,
    so the drained stream aggregates exactly like the pristine events
    table."""
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        staged_ordered_source,
        stream_dedup,
    )

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cutoff = lo + (hi - lo) / 2
    with_dups = ev.unionByName(ev.filter(F.col("event_id") % 7 == 0))
    frames = [
        with_dups.filter(F.col("ts") <= F.lit(cutoff)),
        with_dups.filter(F.col("ts") > F.lit(cutoff)),
    ]
    stream = staged_ordered_source(spark, frames, f"t6_{sf_dir}")
    deduped = run_to_table(stream_dedup(stream, late="10 minutes"), output_mode="append")
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@register(
    "t8_stream_static_join",
    "T1,J1 (stream ⋈ static dimension)",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def t8_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    (batch) dimension table, then aggregated. Structured Streaming
    re-plans the static side per micro-batch and — the dimension being
    broadcast-sized — every micro-batch executes a broadcast hash join:
    no state store involvement for the join itself, which is why
    stream-static is the scalable way to do dimension enrichment (vs a
    stateful stream-stream join). Result must equal the batch join."""
    stream, _ = events_stream_source(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    return run_to_table(agg, output_mode="complete")


@register(
    "t9_stateful_counters",
    "T4 extension, U3 (applyInPandasWithState custom stateful operator)",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM events GROUP BY user_id
    """,
)
def t9_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator under the oracle: per-user
    running (count, sum) maintained in the state store via
    applyInPandasWithState — the escape hatch for stateful logic the
    built-in windows can't express. Update mode emits one row per user
    per touched micro-batch; the final update per user (max n_events —
    counts strictly increase) must equal the batch aggregate."""
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        stateful_user_counters,
    )

    stream, _ = events_stream_source(spark, sf_dir)
    updates = run_to_table(stateful_user_counters(stream), output_mode="update")
    final = F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s")
    return updates.groupBy("user_id").agg(final).select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.total_value").alias("total_value"),
    )


@register(
    "t10_incremental_ingest_dedup",
    "T1,S7,L1,D8 (continuous-ingest dedup; cross-batch fingerprint index)",
    oracle="""
    WITH fp AS (
        SELECT doc_id, CAST(doc_id % 3 AS INT) AS batch,
               substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
                   AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint, batch FROM (
        SELECT *, row_number() OVER (
            PARTITION BY fingerprint ORDER BY batch, doc_id
        ) AS rn FROM fp
    ) WHERE rn = 1
    """,
)
def t10_incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming form of the D8 incremental-ingest exact tier
    (streaming/pipeline.py::incremental_ingest_dedup): documents arrive
    as three ordered batches (doc_id % 3), each micro-batch anti-joins
    its fingerprints against the persisted index of everything admitted
    so far and appends its survivors' fingerprints back — first batch
    wins, then lowest doc_id. The oracle is the batch-equivalent
    argmin: one row per fingerprint ordered by (batch, doc_id)."""
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        incremental_ingest_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    return incremental_ingest_dedup(spark, batches, cache_key=f"ingest3_{sf_dir}")


# t11 oracle: the three-batch gate unrolled as a batch replay — the
# same technique that hash-graded t10, extended per tier. Per batch b:
# tier 1 = first-wins-by-fingerprint minus fingerprints admitted by
# earlier batches; tier 2 = drop connected-component non-representatives
# of the exact-Jaccard ≥ τ pair graph (recursive transitive-closure CTE,
# one per batch — components never span batches because edges are
# within-batch); tier 3 = drop survivors with an exact-Jaccard ≥ τ match
# against ANY earlier-batch admitted doc. Exact Jaccard stands in for
# the MinHash-LSH stages because 16 bands × 16 rows at τ=0.95 was
# validated to reproduce the exact pair set on this corpus — at the
# driver's sf0.01 scale (where this oracle runs; do not point it at
# other corpora/scales without revalidating: a borderline true pair
# has ~1e-4 per-pair banding miss probability, so the equivalence is
# corpus-validated, not universal) and independently re-validated at
# sf0.1 by tools/t11_sf01_check.py's pure-Python replay (BASELINE.md
# round-7 note: exact 3,002-row set match).
def _t11_batch_ctes(b: int) -> str:
    prev_adm = " UNION ALL ".join(f"SELECT doc_id FROM adm{i}" for i in range(b))
    fp_gate = (
        f"""AND NOT EXISTS (SELECT 1 FROM fp pf JOIN ({prev_adm}) pa
                ON pf.doc_id = pa.doc_id WHERE pf.f = fp.f)"""
        if b
        else ""
    )
    cross = (
        f"""adm{b} AS (
        SELECT doc_id FROM surv{b} s
        WHERE NOT EXISTS (
            SELECT 1 FROM ndb n JOIN ({prev_adm}) pa ON n.b = pa.doc_id
            WHERE n.a = s.doc_id))"""
        if b
        else f"adm{b} AS (SELECT doc_id FROM surv{b})"
    )
    return f"""
    ex{b} AS (
        SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY f ORDER BY doc_id) rn
            FROM fp WHERE batch = {b} {fp_gate}
        ) WHERE rn = 1),
    edges{b} AS (
        SELECT n.a, n.b FROM ndb n
        JOIN ex{b} x ON n.a = x.doc_id JOIN ex{b} y ON n.b = y.doc_id),
    cc{b}(a, b) AS (
        SELECT a, b FROM edges{b}
        UNION
        SELECT e.a, c.b FROM edges{b} e JOIN cc{b} c ON e.b = c.a),
    surv{b} AS (
        SELECT doc_id FROM ex{b} e
        WHERE NOT EXISTS (
            SELECT 1 FROM (
                SELECT a AS doc_id, least(a, min(b)) AS rep
                FROM cc{b} GROUP BY a
            ) r WHERE r.doc_id = e.doc_id AND r.doc_id <> r.rep)),
    {cross}"""


_T11_ORACLE = f"""
    WITH RECURSIVE
    words AS (
        SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> ''),
    cnt AS (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    fp AS (
        SELECT doc_id, CAST(doc_id % 3 AS INT) AS batch,
               substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16) AS f
        FROM documents),
    inter AS (
        SELECT a.doc_id d1, b.doc_id d2, count(*) k
        FROM words a JOIN words b USING (w)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    nd AS (
        SELECT d1, d2 FROM inter
        JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95),
    ndb AS (SELECT d1 a, d2 b FROM nd UNION SELECT d2, d1 FROM nd),
    {",".join(_t11_batch_ctes(b) for b in range(3))}
    {" UNION ALL ".join(
        f"SELECT doc_id, CAST({b} AS INT) AS batch FROM adm{b}" for b in range(3)
    )}
"""


@register(
    "t11_neardup_ingest_gate",
    "T1,S7,L1,L2,L4,D8 (full continuous-ingest near-dup gate)",
    oracle=_T11_ORACLE,
)
def t11_neardup_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production ingest gate (streaming/pipeline.py::
    incremental_neardup_ingest): per arriving batch — exact-fingerprint
    tier, within-batch MinHash-LSH clustering keeping cluster
    representatives, asymmetric LSH check against the persisted
    signature index, then index append of admitted content only.
    Oracle: the deterministic batch replay unrolled in SQL (see
    _T11_ORACLE above) — exact Jaccard standing in for the validated
    LSH banding, recursive-closure CCs per batch, first-wins/min-rep
    tie-breaks identical to the implementation. The pytest additionally
    verifies the gate against an independent pure-Python reference."""
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        incremental_neardup_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    return incremental_neardup_ingest(
        spark, batches, cache_key=f"neardup3_{sf_dir}", threshold=0.95
    )


@register(
    "t12_semantic_ingest_gate",
    "T1,S7,L7,L3,D8 (continuous-ingest SEMANTIC dedup gate over embeddings)",
    oracle="""
    SELECT vec_id, CAST(vec_id % 3 AS INT) AS batch
    FROM embeddings WHERE vec_id % 5 <> 0
    UNION ALL
    SELECT vec_id, CAST(vec_id % 3 AS INT) AS batch
    FROM embeddings WHERE vec_id % 5 = 0 AND vec_id % 3 <> 2
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, CAST(0 AS INT) AS batch
    FROM embeddings WHERE vec_id % 5 = 0 AND vec_id % 3 = 2
    """,
)
def t12_semantic_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-tier continuous-ingest gate (streaming/pipeline.py
    ::incremental_semantic_ingest): per micro-batch, within-batch
    hyperplane-LSH clustering keeps cluster representatives, survivors
    are verified against the PERSISTED signature+vector indexes
    (asymmetric (table, sig) equi-join — no index self-join, no
    re-signing of earlier batches), and only admitted vectors grow the
    indexes. Hash-checkable by the planted-duplicate construction:
    every 5th vector is planted as an exact duplicate (id + 100000),
    identical vectors sign identically in every table (rejection with
    probability 1 on re-encounter), and the corpus has no other pairs
    at τ=0.9. Plants of vec_id%3=2 sources land in an EARLIER batch
    (plant batch = (v%3+1)%3 = 0) than their source — so the oracle's
    closed form has the plant admitted and the original rejected,
    pinning the first-wins ordering semantics, not just the dedup."""
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        incremental_semantic_ingest,
    )

    from actuarial_reserve_modelling_spark.plans.llm_queries import plant_twins

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = plant_twins(emb, 5)  # asserts max(vec_id) < the 100000 offset
    corpus = emb.unionByName(planted)
    batches = [corpus.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    return incremental_semantic_ingest(
        spark, batches, cache_key=f"sem_ingest3_{sf_dir}", threshold=0.9
    )


@register(
    "t13_ann_index_ingest_gate",
    "T1,S7,L3,L10,D8 (continuous ingest with the persisted ANN index as gate state)",
    oracle="""
    SELECT vec_id, CAST(vec_id % 3 AS INT) AS batch FROM embeddings
    """,
)
def t13_ann_index_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The L10 persisted index driving a streaming gate
    (streaming/pipeline.py::incremental_ann_ingest): batch 0 bootstraps
    the vector-bearing hierarchical index, each later micro-batch
    collapses within-batch exact duplicates, queries the PERSISTED
    index with partition-pruned corpus-free reads, rejects sim-1.0
    re-encounters, and grows the index by add_to_ann_index —
    per-batch I/O is the probed fraction, state is the index itself
    (t12's gate re-based from recursive whole-index reads onto the
    hive-partitioned tier). Hash-grade by planting exact twins that
    must ALL be rejected: +100000 twins of every 50th batch-0 vector
    arrive in batch 1 (cross-batch vs the BOOTSTRAPPED index), +200000
    twins of every 50th batch-1 vector arrive in batch 2 (cross-batch
    vs rows the ADD ingested — pinning the add path), and +300000
    in-batch twin pairs inside batch 2 (within-batch collapse). The
    oracle is every original admitted in its arrival batch and nothing
    else: a lost add, a missed rejection, or a false sim-1.0 hit
    between distinct random vectors (impossible at 6-dp rounding) all
    hash-mismatch."""
    from actuarial_reserve_modelling_spark.plans.llm_queries import plant_twins
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        incremental_ann_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # plant_twins(modulus=150) also asserts max(vec_id) < the id offsets
    plant_twins(emb, 150)
    b0 = emb.filter(F.col("vec_id") % 3 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 1)
    b2 = emb.filter(F.col("vec_id") % 3 == 2)

    def _twins(batch: DataFrame, residue: int, offset: int) -> DataFrame:
        # exact copies of the batch's ids ≡ residue (mod 150) — the
        # residues are chosen ≡ batch (mod 3) so each planted set is
        # NON-EMPTY (a %150==0 filter can only hit %3==0 ids)
        return batch.filter(F.col("vec_id") % 150 == residue).select(
            (F.col("vec_id") + offset).alias("vec_id"), "embedding"
        )

    # twins of b0 sources (≡0 mod 150) arriving in batch 1: rejected
    # against the BOOTSTRAPPED index
    t_b1 = _twins(b0, 0, 100_000)
    # twins of b1 sources (≡100 mod 150) arriving in batch 2: rejected
    # against rows the ADD ingested — pins the add path
    t_b2 = _twins(b1, 100, 200_000)
    # in-batch twins of b2 sources (≡50 mod 150), same batch as their
    # sources — the within-batch collapse must reject them (source has
    # the minimum id)
    t_in = _twins(b2, 50, 300_000)
    batches = [
        b0,
        b1.unionByName(t_b1),
        b2.unionByName(t_b2).unionByName(t_in),
    ]
    return incremental_ann_ingest(
        spark, batches, cache_key=f"ann_ingest3_{sf_dir}"
    )
