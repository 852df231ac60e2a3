"""Training-data pipeline queries: deterministic splits, stratified
sampling, sequence packing, vocabulary statistics.

The corpus-to-trainer stages downstream of cleaning/dedup — every one
deterministic (content-hash driven) so the oracle can hash-check exact
assignments, and every one shaped for 100 TB (map-side or
stratum-bounded windows; see operators/traindata.py scale notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.operators.traindata import (
    hash_split,
    pack_sequences,
    stratified_sample,
)
from actuarial_reserve_modelling_spark.plans.registry import register

# whitespace token count, identical in Spark and DuckDB (l5b convention)
_TOK_SPARK = "size(filter(split(text, ' '), w -> w != ''))"
_TOK_DUCK = "len(list_filter(string_split(text, ' '), w -> w <> ''))"


@register(
    "l12_train_test_split",
    "D1 (dataset split; map-side hash assignment)",
    oracle="""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS INT) AS bucket
        FROM documents
    )
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def l12_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5 of the
    document id. Stateless and shuffle-free — the assignment is a pure
    column expression, so it composes under any partitioning and is
    identical on every rerun (the idempotence a resumable 100 TB
    pipeline needs). The oracle recomputes the same md5 bucket in
    DuckDB and hash-compares the full per-document assignment."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_split(docs).select("doc_id", "lang", "bucket", "split")


@register(
    "l13_stratified_sample",
    "D2,W1 (exact per-stratum quota sampling)",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang, source FROM r WHERE rn <= ceil(0.2 * n)
    """,
)
def l13_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20% stratified sample per language: every stratum
    contributes ceil(0.2·|stratum|) documents chosen by md5-hash order.
    Exact quotas (unlike Bernoulli sampleBy, which varies per run and
    can miss small strata); one shuffle on the stratum key, sorts
    bounded per stratum. Hash-checked against the identical DuckDB
    window formulation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(docs, strata_col="lang", fraction=0.2)


@register(
    "l14_sequence_packing",
    "D3,W3 (concatenate-and-chunk context packing)",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST({_TOK_DUCK} AS BIGINT) AS tok_cnt
        FROM documents
    ),
    s AS (
        SELECT doc_id, source, tok_cnt,
               sum(tok_cnt) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - tok_cnt
                   AS start_tok
        FROM t
    )
    SELECT doc_id, source, tok_cnt,
           CAST(floor(start_tok / 512) AS BIGINT) AS seq_id,
           CAST(start_tok % 512 AS BIGINT) AS seq_off,
           floor((start_tok + greatest(tok_cnt, 1) - 1) / 512)
               <> floor(start_tok / 512) AS straddles
    FROM s
    """,
)
def l14_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing into 512-token context windows,
    sharded by source: documents laid end to end in id order, the
    stream cut every 512 tokens; emits each document's window id,
    offset, and whether it straddles a window boundary. A running-sum
    window per shard — no bin-packing search, no global sort; shards
    parallelize freely and sequence ids are per-shard so they never
    collide. Hash-checked against the same window algebra in DuckDB."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_TOK_SPARK).cast("bigint").alias("tok_cnt")
    )
    return pack_sequences(docs, tok_col="tok_cnt", capacity=512)


@register(
    "l15_vocab_topk",
    "D4,A4,O3 (corpus vocabulary statistics)",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS word
        FROM documents
    ),
    v AS (
        SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM w GROUP BY word
    )
    SELECT word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM v ORDER BY tf DESC, word LIMIT 50
    """,
)
def l15_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term frequency + document frequency per word,
    top 50 by frequency (ties broken lexically — determinism for the
    hash check). The tokenizer-training precursor: explode → two-level
    hash aggregate (partial map-side combine collapses each partition's
    token stream to its local vocabulary before the shuffle, so the
    exchange carries vocabulary-sized data, not corpus-sized) →
    TakeOrderedAndProject for the top-k (no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .orderBy(F.desc("tf"), "word")
        .limit(50)
    )


@register(
    "l16_decontamination",
    "D5,J3 (benchmark n-gram decontamination)",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(ws) - 1),
                   i -> array_to_string(list_slice(ws, i, i + 2), ' ')
               )) AS shingle
        FROM tok WHERE len(ws) >= 3
    ),
    bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 101 = 5
    )
    SELECT s.doc_id, count(DISTINCT s.shingle) AS n_contaminated
    FROM sh s JOIN bench USING (shingle)
    WHERE s.doc_id % 101 <> 5
    GROUP BY s.doc_id
    """,
)
def l16_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    3-gram with the held-out benchmark slice (doc_id % 101 = 5), with
    the distinct contaminated-shingle count. The benchmark shingle set
    is bounded → broadcast; the corpus side never shuffles documents,
    only (doc_id, shingle-hash) rows that survive the broadcast join.
    Shingles are xxhash64'd JVM-side in Spark; the oracle joins the raw
    gram strings — identical sets because the hash is injective on this
    corpus (and the count compares distinct elements, not hashes)."""
    from actuarial_reserve_modelling_spark.operators.textstats import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 5)
    train = docs.filter(F.col("doc_id") % 101 != 5)
    return decontaminate(train, bench, n=3)


@register(
    "l5j_repetition",
    "D6,L5 (within-doc n-gram repetition quality rule)",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents WHERE doc_id % 17 = 2
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(ws) - 1),
                              i -> array_to_string(list_slice(ws, i, i + 2), ' '))
                   AS grams
        FROM tok WHERE len(ws) >= 3
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           round(1 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6)
               AS repetition
    FROM g
    """,
)
def l5j_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rule: fraction of word 3-gram
    occurrences that repeat an earlier gram in the same document. Pure
    per-row array expression — zero shuffles, corpus-size-independent."""
    from actuarial_reserve_modelling_spark.operators.textstats import repetition_scores

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 2)
    return repetition_scores(docs, n=3)


@register("l17_bpe_merges", "D7 (BPE tokenizer training; iterative)", oracle=None)
def l17_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merge rules learned over the document corpus
    (operators/traindata.py::bpe_train_merges) — iterative
    argmax-and-rewrite over the word-frequency table, the k-means-loop
    pattern (one driver row per round). Deterministic (lexicographic
    tie-breaks) but not SQL-expressible → rows-only here; the pytest
    checks the merge sequence against a sequential pure-Python BPE
    reference."""
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, k=8)
    rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(rows, "step int, left string, right string, n bigint")


def _bpe_merges_oracle_sql(k: int) -> str:
    """Generate the DuckDB oracle for the first ``k`` BPE merges as a
    chain of UNROLLED CTE stages — one (pair-count → argmax → rewrite)
    stage per merge. BPE training is iterative, but for a FIXED small k
    the iteration unrolls into plain SQL, which is what upgrades the
    l17 rows-only row to hash-grade evidence (r9 verdict task 6).

    Per stage j: ``p{j}`` recounts adjacent pairs of the stage's vocab
    (positional self-join via list indexing — DuckDB lists are
    1-based), ``m{j}`` takes the argmax under the trainer's exact
    (n DESC, a, b) tie rule, and the rewrite applies the merge with the
    trainer's left-to-right greedy semantics: for a ≠ b matches can
    never overlap (a match at i+1 would need sym[i+1] = a AND = b), so
    every match merges; for self-pairs (a = b) a maximal run of a's
    merges at even offsets only — expressed with a gaps-and-islands
    window (``grp``) and offset parity, exactly the fold's 'aaa' →
    ['aa','a'] behavior. ``consumed`` drops the right half of each
    merged pair; ``v{j}`` regroups to the next vocab. Full recounts per
    stage (not the Spark side's delta maintenance) — slower, which is
    fine for an oracle, and algebraically the same table."""
    parts = [
        """v0 AS (
    SELECT ROW_NUMBER() OVER (ORDER BY w) AS w_id,
           string_split(w, '') AS sym, n AS freq
    FROM (
        SELECT w, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    )
)"""
    ]
    for j in range(1, k + 1):
        i = j - 1
        parts.append(f"""p{j} AS (
    SELECT sym[i] AS a, sym[i+1] AS b, sum(freq)::BIGINT AS n
    FROM v{i}, UNNEST(range(1, len(sym))) AS t(i)
    GROUP BY 1, 2
)""")
        parts.append(
            f"m{j} AS (SELECT a, b, n FROM p{j} ORDER BY n DESC, a, b LIMIT 1)"
        )
        parts.append(f"""e{j} AS (
    SELECT w_id, freq, i, sym[i] AS s
    FROM v{i}, UNNEST(range(1, len(sym) + 1)) AS t(i)
)""")
        parts.append(f"""d{j} AS (
    SELECT e.w_id, e.freq, e.i, e.s, m.a, m.b,
           (e.s = m.a AND lead(e.s) OVER w = m.b) AS ips,
           CASE WHEN e.s = m.a THEN
               e.i - ROW_NUMBER() OVER (PARTITION BY e.w_id, e.s = m.a ORDER BY e.i)
           END AS grp
    FROM e{j} e CROSS JOIN m{j} m
    WINDOW w AS (PARTITION BY e.w_id ORDER BY e.i)
)""")
        parts.append(f"""d2{j} AS (
    SELECT *,
           CASE WHEN a <> b THEN ips
                ELSE ips AND (i - MIN(i) OVER (PARTITION BY w_id, grp)) % 2 = 0
           END AS ms
    FROM d{j}
)""")
        parts.append(f"""d3{j} AS (
    SELECT *, coalesce(lag(ms) OVER (PARTITION BY w_id ORDER BY i), FALSE)
              AS consumed
    FROM d2{j}
)""")
        parts.append(f"""v{j} AS (
    SELECT w_id, any_value(freq) AS freq,
           list(CASE WHEN ms THEN a || b ELSE s END ORDER BY i) AS sym
    FROM d3{j} WHERE NOT consumed GROUP BY w_id
)""")
    finals = "\nUNION ALL ".join(
        f"SELECT {j - 1} AS step, a AS left, b AS right, n FROM m{j}"
        for j in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + finals + "\nORDER BY step"


@register(
    "l17b_bpe_merges_oracle",
    "D7 (BPE tokenizer training, hash-grade via unrolled-CTE oracle)",
    oracle=_bpe_merges_oracle_sql(8),
)
def l17b_bpe_merges_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l17's merge table with DRIVER-HASH-GRADE evidence (r9 verdict
    task 6, retiring the last non-ANN rows-only row): the merge list IS
    deterministic — the blocker was only that the oracle must be SQL,
    solved by unrolling the k=8 training iterations into chained CTE
    stages (``_bpe_merges_oracle_sql``). Spark side = the batched
    delta-maintained trainer; oracle side = full recount per stage;
    identical (left, right, n) sequence or the hash mismatches. l17
    stays registered as the rows-only form exercising the default
    path."""
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, k=8)
    rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(rows, "step int, left string, right string, n bigint")


# l21: the apply side runs with a PINNED merge table — the production
# shape (a tokenizer is a shipped artifact applied unchanged to every
# corpus, not retrained per batch), and what makes the encode fold
# exactly SQL-expressible. The oracle mirrors the left-to-right
# non-overlapping merge scan with delimiter-guarded chained replaces:
# each token is wrapped chr(1)token chr(2), so the pattern
# "␁a␂ ␁b␂" can only match whole adjacent tokens (never a suffix of a
# longer token), and str-replace's leftmost-non-overlapping order is
# the same order bpe_encode's scan applies merges in.
_L21_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("a", "t"),
]


def _l21_word_expr() -> str:
    expr = (
        "chr(1) || array_to_string(regexp_split_to_array(w, ''),"
        " chr(2) || ' ' || chr(1)) || chr(2)"
    )
    for a, b in _L21_MERGES:
        expr = (
            f"replace({expr}, chr(1) || '{a}' || chr(2) || ' ' ||"
            f" chr(1) || '{b}' || chr(2), chr(1) || '{a}{b}' || chr(2))"
        )
    return expr


_L21_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    enc AS (
        SELECT doc_id,
               list_transform(ws, w -> {_l21_word_expr()}) AS encws
        FROM t
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(encws,
                e -> len(e) - len(replace(e, chr(1), '')))), 0) AS INT)
               AS n_tokens,
           md5(array_to_string(list_transform(encws,
               e -> replace(replace(replace(e, chr(2) || ' ' || chr(1), '|'),
                            chr(1), ''), chr(2), '')), '|')) AS tokens_md5
    FROM enc
"""


@register(
    "l21_bpe_encode",
    "D7,D8 (tokenizer application; map-side)",
    oracle=_L21_ORACLE,
)
def l21_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZE the corpus with a pinned BPE merge table
    (operators/traindata.py::bpe_encode) — the apply side of the
    tokenizer story: a pure map-side Arrow kernel carrying the merge
    table as a closure (no shuffle, no join; linear in corpus bytes —
    the 100 TB tokenization shape). The merge table is a fixed shipped
    artifact (_L21_MERGES), exactly how production tokenization runs —
    which also makes the deterministic encode fold SQL-expressible, so
    this row is hash-graded (oracle above). The train→encode roundtrip
    with LEARNED merges stays covered by the pytest against a
    sequential BPE reference (l17 covers the trainer). Content is
    pinned per doc by token count + md5 of the '|'-joined token stream
    (the separator keeps token BOUNDARIES in the digest — a
    boundary-free concat would hash identically for any merge table)."""
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs, _L21_MERGES)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.md5(F.concat_ws("|", "tokens")).alias("tokens_md5"),
    )


@register(
    "l22_shuffle_shards",
    "D9,O2 (deterministic shard shuffle; per-shard window)",
    oracle="""
    WITH k AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15))
                    AS BIGINT) AS keynum
        FROM documents
    )
    SELECT doc_id, CAST(keynum % 64 AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY keynum % 64 ORDER BY keynum, doc_id
           ) - 1 AS BIGINT) AS pos
    FROM k
    """,
)
def l22_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 64 training shards
    (operators/traindata.py::shuffle_shards): shard and in-shard
    position are pure functions of (doc_id, salt) via the md5
    convention, so the permutation replays identically on rerun and in
    any engine. One hash-partition shuffle + per-shard sort; no global
    sort anywhere — shards write independently at 100 TB."""
    from actuarial_reserve_modelling_spark.operators.traindata import shuffle_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, n_shards=64, salt=42).select("doc_id", "shard", "pos")


@register(
    "l23_weighted_sample",
    "D9,O3 (Efraimidis-Spirakis weighted sampling without replacement)",
    oracle="""
    SELECT doc_id, n_chars,
           round(ln(
               (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15))
                     AS BIGINT) AS DOUBLE) + 1) / 1152921504606846976.0
           ), 9) / n_chars AS es_key
    FROM documents WHERE n_chars > 0
    ORDER BY es_key DESC, doc_id
    LIMIT 100
    """,
)
def l23_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sample (operators/traindata.py::
    weighted_sample, Efraimidis & Spirakis IPL'06): each doc draws
    key = ln(u)/weight from a content-addressed u (the numerically
    stable exponential-race form) and the top-k keys win — inclusion
    odds proportional to weight (n_chars here), no replacement, one
    pass. Top-k is TakeOrderedAndProject at scale (no global sort); the
    md5-derived u makes the draw reproducible across engines, which is
    what the oracle checks."""
    from actuarial_reserve_modelling_spark.operators.traindata import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, weight_col="n_chars", k=100, salt=42)


@register(
    "l24_token_budget_select",
    "D9,W3 (greedy corpus selection under a token budget)",
    oracle="""
    WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_toks
        FROM documents
    )
    SELECT doc_id, n_chars, n_toks, cum_tokens FROM (
        SELECT *, CAST(sum(n_toks) OVER (
            ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS cum_tokens FROM t
    ) WHERE cum_tokens <= 15000
    """,
)
def l24_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy selection under a 15k-token budget (operators/traindata.py
    ::token_budget_select): take documents best-quality-first (n_chars
    as the proxy, ties by id) while the running token total fits — the
    curation step when the training run affords N tokens. Integer
    arithmetic end to end, so the selected set is exactly reproducible.
    No global-ordering window: the prefix sum decomposes into per-value
    totals + a tiny value-level offset window + bounded per-value
    windows, so no single task ever sorts the corpus."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        token_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
        .cast("bigint")
        .alias("n_toks"),
    )
    return token_budget_select(
        t, quality_col="n_chars", tokens_col="n_toks", budget=15_000
    )


@register(
    "l28_domain_mix",
    "D9,A4 (domain reweighting toward a target mixture)",
    oracle="""
    WITH per AS (
        SELECT lang AS domain, count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    tgt(domain, share) AS (
        VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.2), ('es', 0.1)
    )
    SELECT p.domain, p.n_docs, p.n_tokens,
           round(p.n_tokens / CAST(t.t AS DOUBLE), 6) AS actual_share,
           round(CAST(coalesce(g.share, 0.0) AS DOUBLE), 6) AS target_share,
           round(CASE WHEN p.n_tokens > 0
                      THEN CAST(coalesce(g.share, 0.0) AS DOUBLE)
                           / (p.n_tokens / CAST(t.t AS DOUBLE))
                      ELSE 0.0 END, 6) AS weight
    FROM per p CROSS JOIN tot t LEFT JOIN tgt g USING (domain)
    """,
)
def l28_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting (operators/traindata.py::
    domain_mix_weights): measure each language's actual token share and
    emit the weight that steers sampling toward an explicit target mix
    (en .5 / de .2 / fr .2 / es .1; zh excluded → weight 0). One
    |domains|-row hash aggregate regardless of corpus size — token
    counting stays per-row inside codegen."""
    from actuarial_reserve_modelling_spark.operators.traindata import domain_mix_weights

    docs = load_table(spark, sf_dir, "documents")
    return domain_mix_weights(
        docs, {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.1}, domain_col="lang"
    )


@register(
    "l31_dsir_weights",
    "D10,D9,A4 (DSIR hashed n-gram importance weights toward a target domain)",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(list_concat(ws,
                   list_transform(range(1, greatest(len(ws), 1)),
                                  i -> ws[i] || ' ' || ws[i + 1]))) AS g
        FROM tok
    ),
    hb AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 4096 AS b
        FROM grams
    ),
    tc AS (SELECT b, count(*) c FROM hb WHERE source = 'src0' GROUP BY b),
    cc AS (SELECT b, count(*) c FROM hb GROUP BY b),
    tt AS (SELECT count(*) t FROM hb WHERE source = 'src0'),
    ct AS (SELECT count(*) t FROM hb),
    dist AS (
        SELECT cc.b,
               CAST(round(round(ln((coalesce(tc.c, 0) + 1.0) / (tt.t + 4096.0))
                   - ln((cc.c + 1.0) / (ct.t + 4096.0)), 9) * 1e9) AS BIGINT) AS lr
        FROM cc LEFT JOIN tc USING (b) CROSS JOIN tt CROSS JOIN ct
    ),
    per AS (
        SELECT h.doc_id, count(*) AS n_grams, sum(d.lr) AS s
        FROM hb h JOIN dist d USING (b) GROUP BY h.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
           round(coalesce(p.s, 0) / 1e9, 6) AS logw
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
)
def l31_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection weights (operators/traindata.py::
    dsir_importance_weights; Xie et al. 2023, arXiv:2302.03169): score
    every document by the log importance ratio of its hashed
    unigram+bigram features under the target domain's distribution
    (here: docs with source='src0') vs the raw corpus — the principled
    replacement for heuristic quality filters when steering a 100 TB
    corpus toward a target domain. md5-prefix buckets make the hashing
    engine-portable; per-bucket log-ratios are quantized to integer
    nano-units and the per-doc reduce sums int64 (exact in any order),
    so the oracle comparison is exact — see the operator docstring's
    determinism analysis."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        dsir_importance_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance_weights(
        docs, target_pred=F.col("source") == "src0", buckets=4096
    )


@register(
    "l33_document_chunking",
    "D11,D3 (RAG-style overlapping chunking; narrow map)",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start / 48 AS BIGINT) AS chunk_id,
           CAST(least(64, len(toks) - start) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(toks[start + 1 : start + 64], ' ')) AS chunk_md5
    FROM s
    """,
)
def l33_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token windows every 48 tokens over the
    order-preserving whitespace token stream (operators/traindata.py::
    chunk_documents) — the retrieval-corpus prep step between cleaning
    and embedding. Pure codegen expressions, zero shuffles; the oracle
    reproduces the identical windows with DuckDB's 1-based inclusive
    list slicing (toks[s+1 : s+64] ≡ Spark slice(toks, s+1, 64))."""
    from actuarial_reserve_modelling_spark.operators.traindata import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, stride=48)


@register(
    "l42_temperature_mix",
    "D9,A4 (temperature-scaled domain mixture, derived targets)",
    oracle="""
    WITH per AS (
        SELECT lang AS domain, count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    sc AS (
        SELECT p.domain, p.n_docs, p.n_tokens,
               p.n_tokens / CAST(t.t AS DOUBLE) AS actual,
               CASE WHEN p.n_tokens > 0
                    THEN pow(p.n_tokens / CAST(t.t AS DOUBLE), 0.3)
                    ELSE 0.0 END AS scaled
        FROM per p CROSS JOIN tot t
    ),
    nrm AS (SELECT sum(scaled) AS s FROM sc)
    SELECT domain, n_docs, n_tokens,
           round(actual, 6) AS actual_share,
           round(CASE WHEN n_tokens > 0 THEN scaled / n.s ELSE 0.0 END, 6)
               AS target_share,
           round(CASE WHEN n_tokens > 0 THEN (scaled / n.s) / actual
                      ELSE 0.0 END, 6) AS weight
    FROM sc CROSS JOIN nrm n
    """,
)
def l42_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (operators/traindata.py::
    temperature_mix_weights; XLM-R arXiv:1911.02116 §3.1): target share
    of each language is its token share raised to alpha=0.3 and
    renormalized — upsamples tail languages without hand-set targets
    (l28 covers the explicit-target form). The whole computation after
    the one |domains|-row hash aggregate runs on the domain-level
    table via two broadcast one-row totals; the oracle reproduces the
    identical pow/normalize arithmetic."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        temperature_mix_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix_weights(docs, alpha=0.3, domain_col="lang")


@register(
    "l44_epoch_repetition",
    "D9,F5 (mixture weights materialized into the epoch repetition plan)",
    oracle="""
    WITH per AS (
        SELECT lang AS domain, CAST(sum(len(list_filter(string_split(text, ' '),
               x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    sc AS (
        SELECT p.domain, p.n_tokens, p.n_tokens / CAST(t.t AS DOUBLE) AS actual,
               CASE WHEN p.n_tokens > 0
                    THEN pow(p.n_tokens / CAST(t.t AS DOUBLE), 0.3)
                    ELSE 0.0 END AS scaled
        FROM per p CROSS JOIN tot t
    ),
    nrm AS (SELECT sum(scaled) AS s FROM sc),
    w AS (
        SELECT domain,
               round(CASE WHEN n_tokens > 0 THEN (scaled / n.s) / actual
                          ELSE 0.0 END, 6) AS weight
        FROM sc CROSS JOIN nrm n
    ),
    plan AS (
        SELECT d.doc_id, d.lang AS domain,
               CAST(floor(w.weight) +
                    CASE WHEN (CAST(('0x' || substr(md5(d.doc_id || ':42'), 1, 15))
                               AS BIGINT) + 1.0) / 1152921504606846976.0
                         < w.weight - floor(w.weight) THEN 1 ELSE 0 END AS INT)
                   AS n_repeats
        FROM documents d JOIN w ON w.domain = d.lang
    )
    SELECT doc_id, domain, n_repeats, CAST(unnest(range(1, n_repeats + 1)) AS INT)
           AS rep_idx
    FROM plan WHERE n_repeats >= 1
    """,
)
def l44_epoch_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture weights (l42, alpha=0.3) materialized into
    the per-document epoch repetition plan (operators/traindata.py::
    epoch_repetition_plan): floor(w) repeats plus one stochastic-
    rounding repeat keyed on the content hash — E[repeats] = w per
    domain, deterministic per document, engine-portable (the oracle
    replays the identical md5-derived u and the identical rounded
    weights). Zero shuffles: the weights broadcast and the repeat
    expansion is a codegen explode."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        epoch_repetition_plan,
        temperature_mix_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights = temperature_mix_weights(docs, alpha=0.3, domain_col="lang")
    out = epoch_repetition_plan(docs, weights, domain_col="lang")
    return out.select(
        "doc_id", "domain", "n_repeats", F.col("rep_idx").cast("int").alias("rep_idx")
    )


# The cleaned-text expression, verbatim from the hash-green l5g oracle
# (plans/llm_queries2.py) — stage 1 of the l45 chain.
_L45_CLEAN = """trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(lower(text), '[\\x00-\\x1f]', ' ', 'g'),
                       'https?://[^ ]+', '<url>', 'g'),
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<email>', 'g'),
               '\\s+', ' ', 'g'))"""


# Min-label propagation rounds for the l45 oracle's connected
# components, UNROLLED (DuckDB 1.0 has no keyed/fixpoint recursion and
# the UNION-recursive transitive closure accumulates |clique|² rows —
# it ran past 10 minutes at sf0.1 where these one-label-per-node joins
# finish in seconds). Each round takes the min over (own label,
# neighbors' labels, LABEL'S label) — the third term is pointer
# doubling (Shiloach-Vishkin), so the distance-to-minimum covered
# DOUBLES per round and 14 rounds reach the component min across >8k
# hops (plain hop-propagation needs diameter rounds, and sf0.1's
# perturbation-chain families exceeded 8 — the poison fired, which is
# exactly its job). Exactness: labels only decrease and every label is
# itself a node, so the fixpoint is the component minimum; `conv`
# checks a 15th round changes nothing and the admission CTE poisons
# the ENTIRE output empty on non-convergence, so a too-deep graph can
# only surface as a loud row-count mismatch, never a silently wrong
# dedup.
_L45_CC_ROUNDS = "\n".join(
    f"""    l{i + 1} AS MATERIALIZED (
        SELECT a, min(lbl) AS lbl FROM (
            SELECT a, lbl FROM l{i}
            UNION ALL
            SELECT e.a, l.lbl FROM edges e JOIN l{i} l ON l.a = e.b
            UNION ALL
            SELECT t.a, j.lbl FROM l{i} t JOIN l{i} j ON j.a = t.lbl
        ) GROUP BY a
    ),"""
    for i in range(15)
)


@register(
    "l45_curation_pipeline",
    "L5,L1,L2,D5,D9,F5,O2 (end-to-end curation pipeline, one oracle-checked flow)",
    oracle=f"""
    WITH
    cln AS (
        SELECT doc_id, lang, {_L45_CLEAN} AS text FROM documents
    ),
    fpr AS (
        SELECT doc_id, lang, text,
               substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')),
                      1, 16) AS f
        FROM cln
    ),
    ex AS MATERIALIZED (
        SELECT doc_id, lang, text FROM (
            SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) rn
            FROM fpr
        ) WHERE rn = 1
    ),
    words AS MATERIALIZED (
        SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM ex
        ) WHERE w <> ''
    ),
    cnt AS MATERIALIZED (SELECT doc_id, count(*) n FROM words GROUP BY doc_id),
    -- exact prefix-filtered set-similarity join (PPJoin Lemma 1, the
    -- banded-oracle form VERDICT r12 task 3 asked for): under a global
    -- token order, J(x,y) >= t forces the (|x| - ceil(t|x|) + 1)-token
    -- prefixes to share a token, so joining PREFIXES (rarest-first
    -- order for selectivity) then exact-verifying candidates is
    -- answer-identical to the all-pairs shared-word join that spilled
    -- DuckDB at sf0.1 — recall 1.0 by theorem, not by tuning
    df AS (SELECT w, count(*) dfreq FROM words GROUP BY w),
    ranked AS (
        SELECT ws.doc_id, ws.w,
               row_number() OVER (
                   PARTITION BY ws.doc_id ORDER BY d.dfreq, ws.w
               ) AS rk,
               c.n
        FROM words ws JOIN df d USING (w) JOIN cnt c ON c.doc_id = ws.doc_id
    ),
    pref AS MATERIALIZED (
        SELECT doc_id, w FROM ranked
        WHERE rk <= n - CAST(ceil(0.95 * n) AS BIGINT) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id d1, b.doc_id d2
        FROM pref a JOIN pref b USING (w) WHERE a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.d1, c.d2, count(*) k
        FROM cand c
        JOIN words wa ON wa.doc_id = c.d1
        JOIN words wb ON wb.doc_id = c.d2 AND wb.w = wa.w
        GROUP BY 1, 2
    ),
    nd AS (
        SELECT d1, d2 FROM inter
        JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        WHERE round(k / CAST(c1.n + c2.n - k AS DOUBLE), 6) >= 0.95
    ),
    edges AS MATERIALIZED (SELECT d1 a, d2 b FROM nd UNION ALL SELECT d2, d1 FROM nd),
    l0 AS MATERIALIZED (SELECT a, least(a, min(b)) AS lbl FROM edges GROUP BY a),
{_L45_CC_ROUNDS}
    conv AS (
        SELECT count(*) AS bad
        FROM l14 JOIN l15 ON l14.a = l15.a AND l14.lbl <> l15.lbl
    ),
    nonrep AS MATERIALIZED (SELECT a AS doc_id FROM l14 WHERE lbl <> a),
    adm AS (
        SELECT * FROM ex e
        WHERE NOT EXISTS (SELECT 1 FROM nonrep n WHERE n.doc_id = e.doc_id)
          AND (SELECT bad FROM conv) = 0
    ),
    tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM adm
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(ws) - 1),
                   i -> array_to_string(list_slice(ws, i, i + 2), ' ')
               )) AS shingle
        FROM tok WHERE len(ws) >= 3
    ),
    benchsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 101 = 5),
    contaminated AS (
        SELECT DISTINCT s.doc_id FROM sh s JOIN benchsh USING (shingle)
        WHERE s.doc_id % 101 <> 5
    ),
    final AS (
        SELECT * FROM adm a
        WHERE doc_id % 101 <> 5
          AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = a.doc_id)
    ),
    per AS (
        SELECT lang AS domain,
               CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
                    AS BIGINT) AS n_tokens
        FROM final GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    sc AS (
        SELECT p.domain, p.n_tokens,
               p.n_tokens / CAST(t.t AS DOUBLE) AS actual,
               CASE WHEN p.n_tokens > 0
                    THEN pow(p.n_tokens / CAST(t.t AS DOUBLE), 0.3)
                    ELSE 0.0 END AS scaled
        FROM per p CROSS JOIN tot t
    ),
    nrm AS (SELECT sum(scaled) AS s FROM sc),
    w AS (
        SELECT domain,
               round(CASE WHEN n_tokens > 0 THEN (scaled / n.s) / actual
                          ELSE 0.0 END, 6) AS weight
        FROM sc CROSS JOIN nrm n
    ),
    plan AS (
        SELECT f.doc_id, f.lang AS domain,
               CAST(floor(w.weight) +
                    CASE WHEN (CAST(('0x' || substr(md5(f.doc_id || ':42'), 1, 15))
                               AS BIGINT) + 1.0) / 1152921504606846976.0
                         < w.weight - floor(w.weight) THEN 1 ELSE 0 END AS INT)
                   AS n_repeats
        FROM final f JOIN w ON w.domain = f.lang
    ),
    reps AS (
        SELECT doc_id, domain, n_repeats,
               CAST(unnest(range(1, n_repeats + 1)) AS INT) AS rep_idx
        FROM plan WHERE n_repeats >= 1
    ),
    keyed AS (
        SELECT doc_id, domain, n_repeats, rep_idx,
               (doc_id || '#' || rep_idx) AS rep_key,
               CAST(('0x' || substr(md5(doc_id || '#' || rep_idx || ':42'), 1, 15))
                    AS BIGINT) AS keynum
        FROM reps
    )
    SELECT doc_id, domain, n_repeats, rep_idx,
           CAST(keynum % 16 AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY keynum % 16 ORDER BY keynum, rep_key
           ) - 1 AS BIGINT) AS pos
    FROM keyed
    """,
)
def l45_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline as ONE flow (r11 verdict task
    4): clean → dedup gate (exact first-wins + near-dup cluster
    representatives, the t11 admission tiers one-shot) → benchmark
    decontamination → temperature mixture weights → epoch repetition
    plan → deterministic shard shuffle. Every stage is individually
    hash-green elsewhere (l5g, l1/l2/l2e, l16, l42, l44, l22); this row
    checks the INTER-STAGE contracts — column handoffs, the cleaned
    text feeding the fingerprints and shingles, the admitted set
    feeding the mixture statistics, the per-(doc, rep) composite key
    feeding the shard shuffle — which at 100 TB are where pipelines
    break even when each operator is right.

    Scale shape: each stage keeps its own documented plan (map-side
    cleaning, banded LSH + CC dedup, broadcast benchmark shingles,
    |domains|-row mixture broadcast, codegen explode, hash-partition
    shard sort); chaining adds NO new shuffles beyond the stages' own.
    Oracle (re-formulated r13, VERDICT r12 task 3): the full chain with
    the dedup stage as an exact PREFIX-FILTERED set-similarity join
    (PPJoin Lemma 1 — answer-identical to all-pairs exact Jaccard by
    theorem, but candidate fan-out bounded by rare-token prefixes, so
    DuckDB no longer spills at sf0.1) and connected components as
    unrolled min-label propagation with a loud convergence poison —
    same-tool hash evidence now holds at sf0.001/sf0.01/sf0.1 instead
    of stopping at sf0.01."""
    from pyspark.sql import Window

    from actuarial_reserve_modelling_spark.operators.dedup import (
        dedup_clusters,
        minhash_near_dup_pairs,
    )
    from actuarial_reserve_modelling_spark.operators.textstats import (
        clean_text,
        content_fingerprints,
        decontaminate_flag,
    )
    from actuarial_reserve_modelling_spark.operators.traindata import (
        epoch_repetition_plan,
        shuffle_shards,
        temperature_mix_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    # 1) clean (l5g) — lang rides the projection (r13: clean_text/
    #    content_fingerprints are pure column expressions, so carrying
    #    passengers through keep= replaces the two doc_id self-joins
    #    the pre-r13 chain paid to re-attach columns)
    corpus = clean_text(docs, keep=["lang"]).select(
        "doc_id", F.col("clean").alias("text"), "lang"
    )
    # 2) dedup gate: exact first-wins on the normalized fingerprint,
    #    then near-dup cluster representatives (t11's admission tiers,
    #    one-shot; 16x16 banding validated at tau=0.95)
    fpw = Window.partitionBy("fingerprint").orderBy("doc_id")
    ex = (
        content_fingerprints(corpus, keep=["text", "lang"])
        .withColumn("_rn", F.row_number().over(fpw))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "text", "lang")
        .localCheckpoint(eager=False)
    )
    pairs = minhash_near_dup_pairs(
        ex, threshold=0.95, bands=16, rows_per_band=16
    ).select("d1", "d2")
    non_reps = (
        dedup_clusters(pairs)
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select("doc_id")
    )
    admitted = ex.join(non_reps, "doc_id", "left_anti")
    # 3) decontaminate vs the held-out benchmark slice (l16, n=3) —
    # the flag-only form: the pipeline FILTERS, so the per-doc
    # contaminated-shingle counts decontaminate() aggregates would be
    # discarded work (decontaminate_flag's documented use case)
    bench = admitted.filter(F.col("doc_id") % 101 == 5)
    train = admitted.filter(F.col("doc_id") % 101 != 5)
    flagged = decontaminate_flag(train, bench, n=3).select("doc_id")
    final = train.join(flagged, "doc_id", "left_anti").localCheckpoint(eager=False)
    # 4) temperature mixture weights over the SURVIVING corpus (l42)
    weights = temperature_mix_weights(final, alpha=0.3, domain_col="lang")
    # 5) epoch repetition plan (l44)
    plan = epoch_repetition_plan(final.select("doc_id", "lang"), weights,
                                 domain_col="lang")
    # 6) shard the epoch stream on the (doc, repetition) composite key
    sharded = shuffle_shards(
        plan.withColumn("rep_key", F.concat_ws("#", "doc_id", "rep_idx")),
        n_shards=16,
        salt=42,
        id_col="rep_key",
    )
    return sharded.select(
        "doc_id",
        "domain",
        "n_repeats",
        F.col("rep_idx").cast("int").alias("rep_idx"),
        "shard",
        "pos",
    )
