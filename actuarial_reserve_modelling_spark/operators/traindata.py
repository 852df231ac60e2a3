"""Training-data pipeline operators: deterministic dataset splits,
exact stratified sampling, and sequence packing for LLM pretraining.

These are the corpus-preparation steps that sit between the cleaning /
dedup stages (operators/dedup.py, operators/textstats.py) and the
trainer: assign every document to a train/val/test split, draw
reproducible per-stratum samples, and pack variable-length documents
into fixed-capacity context windows. All three are deterministic
functions of the input (content-hash driven, never RNG-driven), so
reruns, retries, and resumed jobs produce byte-identical assignments —
the property that makes a 100 TB pipeline idempotent.

Scale notes:
- ``hash_split`` is stateless map-side arithmetic — zero shuffles, no
  skew sensitivity, embarrassingly parallel at any scale.
- ``stratified_sample`` windows within each stratum — one shuffle on
  the stratum key. Strata are language/source-grade cardinalities
  (tens to thousands), each stratum fits a task's sort buffer; a
  degenerate single-stratum corpus degrades to a global sort, which is
  the unavoidable cost of an EXACT (not Bernoulli) sample.
- ``pack_sequences`` windows within each shard (``part_col``) — the
  GPT-style concatenate-and-chunk packing is a running sum, not a bin
  packing search, and sharding bounds every sort. Cross-shard sequence
  ids never collide because the shard is part of the output key.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of a column's
    string form — 60-bit hex prefix via conv(), reproducible in any
    engine with md5 (DuckDB: ``('0x' || substr(md5(x), 1, 15))::bigint``).
    Content-addressed, so the assignment survives repartitioning,
    re-ingestion, and engine swaps; never use Spark's ``rand()`` or
    ``hash()`` (seed/JVM-dependent) for split assignment."""
    hex15 = F.substring(F.md5(col.cast("string")), 1, 15)
    return (F.conv(hex15, 16, 10).cast("bigint") % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row to 'train' / 'val' / 'test' by hashing its id.

    Adds ``bucket`` (int, 0-99) and ``split`` (string) columns. The
    split is a pure function of the id — no shuffle, no state, stable
    under any execution order.
    """
    b = _hash_bucket(F.col(id_col))
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT stratified sample: ceil(fraction × |stratum|) rows from
    every stratum, chosen by md5-hash order (deterministic, unbiased
    for content-independent ids, reproducible across engines).

    Unlike ``df.sampleBy`` (Bernoulli — per-stratum counts vary run to
    run and can miss small strata entirely), the count contract here is
    exact: every stratum contributes its quota, which is what
    balanced-corpus construction needs.
    """
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(order, id_col)
    cnt_w = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_quota", F.ceil(F.lit(fraction) * F.count(F.lit(1)).over(cnt_w)))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def pack_sequences(
    df: DataFrame,
    tok_col: str,
    capacity: int,
    part_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style concatenate-and-chunk sequence packing: within each
    shard (``part_col``), lay documents end to end in ``id_col`` order
    and cut the token stream every ``capacity`` tokens.

    Emits per-document placement: ``seq_id`` (which context window the
    document STARTS in, numbered per shard), ``seq_off`` (token offset
    inside that window), and ``straddles`` (whether the document spills
    into the next window — the tokens a no-split packer would pad or
    drop). A running sum over a shard-partitioned window; the shard key
    keeps every sort bounded and makes the operation embarrassingly
    parallel across shards.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tok_col).over(w) - F.col(tok_col)).alias("start_tok")
    out = df.withColumn("start_tok", start)
    return (
        out.withColumn("seq_id", F.floor(F.col("start_tok") / capacity))
        .withColumn("seq_off", (F.col("start_tok") % capacity).cast("bigint"))
        .withColumn(
            "straddles",
            # greatest(tok, 1): a zero-token document occupies no space
            # and can never straddle (without the clamp, start−1 at a
            # window boundary would point into the previous window)
            F.floor((F.col("start_tok") + F.greatest(F.col(tok_col), F.lit(1)) - 1) / capacity)
            != F.col("seq_id"),
        )
        .drop("start_tok")
    )


# Adjacent symbol pairs of a word as an array of (a, b) structs; empty
# for sub-2-symbol words (the guard matters: sequence(1, 0) DESCENDS in
# Spark SQL and element_at(sym, 0) throws under ANSI mode).
_PAIRS_EXPR = (
    "case when size(sym) >= 2 then transform(sequence(1, size(sym) - 1),"
    " i -> struct(element_at(sym, i) as a, element_at(sym, i + 1) as b))"
    " else cast(array() as array<struct<a:string,b:string>>) end"
)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts (a, b, n) for a
    (sym, freq) word table."""
    return (
        words.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "freq")
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_train_merges(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint_every: int = 8,
    batch_m: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn the first ``k`` byte-pair-encoding merge rules over the
    corpus (Sennrich et al., ACL'16) — the tokenizer-training step
    proper, downstream of the vocabulary stats.

    Distributed formulation: the corpus collapses once to the
    word-frequency table (vocabulary-sized, not corpus-sized — the only
    pass over the documents), each word carried as an array of symbols
    (initially characters). Pair counts are maintained INCREMENTALLY
    (the production-scale requirement): one full explode+groupBy builds
    the initial (a, b, n) table, and each DRIVER ROUND then

    1. collects the top candidate pairs from the maintained counts
       (ordered by (n desc, a, b) — the same total order the one-pair
       argmax used),
    2. accepts a PREFIX of them as this round's merge batch under an
       exactness guard (below), falling back to a single merge when
       the guard stops at one,
    3. filters the word table to only the words containing ANY accepted
       pair, applies the accepted merges to them JVM-side (chained
       left-to-right aggregate() folds), and updates the pair table by
       ONE delta: minus the affected words' old pairs, plus their
       post-merge pairs.

    BATCHED ROUNDS, EXACTLY (r9 verdict task 5): the returned merge
    list is IDENTICAL to the one-merge-per-round sequence — batching
    changes only the number of Spark jobs, never the answer. The guard
    accepts candidate P(i+1) = (a, b, n) only when

    * its symbols are disjoint from every earlier accepted pair's (a
      merge of symbol-disjoint pairs cannot change the other's count —
      merging (a1, b1) only lowers counts of pairs touching a1/b1 and
      creates pairs touching the merged token), AND
    * n strictly exceeds the maximum count any pair CREATED by the
      earlier accepted merges could reach. Every created pair has an
      old-table adjacency witness — (x, a1·b1) occurrences each come
      from an old (x, a1) adjacency, (a1·b1, y) from an old (b1, y) —
      so max(maxin[a1], maxout[b1]) over accepted pairs bounds every
      creation, where maxin[s]/maxout[s] are the old table's max counts
      into/out of symbol s (two vocabulary-scale aggregates per round,
      collected only for the ≤ 2·|candidates| symbols involved). A
      created pair can therefore never outrank — or tie, the strict
      inequality covers the tie-break — an accepted pair, which is
      what the sequential argmax would have enforced.

    At the first conflicting candidate the batch STOPS (not skips:
    the conflict means its count may have changed, so acceptance order
    past it is unknowable without applying). Self-pairs (a == a) make
    maxin[a] ≥ n and stop the batch after themselves — conservative
    and correct. Per-round work is proportional to the words containing
    accepted pairs; driver round-trips shrink up to ``batch_m``× at
    production vocab sizes (the r9 verdict's 30k-job ceiling). Pass
    ``batch_m=1`` to force the r9 sequential behavior.

    The affected/merged slices are eagerly checkpointed (they are the
    small per-round state); the FULL word table is checkpointed only
    every ``checkpoint_every`` rounds to truncate the union lineage,
    not every round.

    Returns the merge rules as ``[(left, right, merged_freq), ...]`` in
    training order, frequencies as the sequential trainer would have
    seen them (disjointness keeps accepted counts untouched within a
    round). Iterative + argmax ⇒ not SQL-expressible: checked by a
    pytest against a sequential pure-Python BPE reference, plus a
    batched-equals-sequential pytest across batch_m settings.
    """
    words = (
        docs.select(F.explode(F.expr(f"filter(split({text_col}, ' '), x -> x != '')")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.expr("split(w, '')").alias("sym"), "freq")
        .localCheckpoint(eager=True)
    )
    pc = _pair_counts(words).localCheckpoint(eager=True)
    # partition-count discipline: each round's union would otherwise
    # ADD the merged slice's partitions to the word table's — and since
    # the slice inherits the table's partitioning, the count doubles
    # per round (32 → 524k tasks by round 14). Coalescing the slice
    # makes growth additive, and the periodic checkpoint repartitions
    # back to the baseline, so task counts stay bounded at any k.
    n_part = words.rdd.getNumPartitions()
    slice_parts = max(1, n_part // 4)
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < k:
        m_cap = max(1, min(batch_m, k - len(merges)))
        cand = (
            pc.filter(F.col("n") >= min_freq)
            .orderBy(F.desc("n"), "a", "b")
            .limit(max(2 * m_cap, 2) if m_cap > 1 else 1)
            .collect()
        )
        if not cand:
            break
        if m_cap == 1 or len(cand) == 1:
            batch = [(cand[0]["a"], cand[0]["b"], int(cand[0]["n"]))]
        else:
            syms = sorted({r["a"] for r in cand} | {r["b"] for r in cand})
            maxin = {
                r["b"]: int(r["mx"])
                for r in pc.filter(F.col("b").isin(syms))
                .groupBy("b")
                .agg(F.max("n").alias("mx"))
                .collect()
            }
            maxout = {
                r["a"]: int(r["mx"])
                for r in pc.filter(F.col("a").isin(syms))
                .groupBy("a")
                .agg(F.max("n").alias("mx"))
                .collect()
            }
            batch = []
            used: set[str] = set()
            created_bound = -1
            for r_ in cand:
                a, b, n = r_["a"], r_["b"], int(r_["n"])
                if len(batch) >= m_cap:
                    break
                if batch and (a in used or b in used or n <= created_bound):
                    break
                batch.append((a, b, n))
                used.update((a, b))
                created_bound = max(
                    created_bound, maxin.get(a, 0), maxout.get(b, 0)
                )
        merges.extend(batch)
        pair_lits = [
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b, _ in batch
        ]
        has_pair = F.arrays_overlap(F.expr(_PAIRS_EXPR), F.array(*pair_lits))
        # the per-round state is ONLY the affected slice — eager
        # checkpoints here are small and prevent recompute blowup of
        # the multi-use subtrees (old counts + rewrite both read it)
        affected = words.filter(has_pair).localCheckpoint(eager=True)
        # left-to-right merge per accepted pair, CHAINED in acceptance
        # order (disjointness makes the order immaterial, but it
        # mirrors the sequential trainer): fold the symbol array,
        # joining a trailing `a` with a current `b` (standard BPE
        # application order — 'aaa' under (a,a) becomes ['aa','a']).
        # Column-API lambda, NOT an interpolated SQL string: symbols
        # are corpus data and may contain quotes/backslashes.
        def _fold(a: str, b: str):
            def step(acc, s):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (s == F.lit(b)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(a + b)),
                    ),
                ).otherwise(F.concat(acc, F.array(s)))

            return step

        merged_col = F.col("sym")
        for a, b, _ in batch:
            merged_col = F.aggregate(
                merged_col,
                F.expr("cast(array() as array<string>)"),
                _fold(a, b),
            )
        merged_words = (
            affected.select(merged_col.alias("sym"), "freq")
            .coalesce(slice_parts)
            .localCheckpoint(eager=True)
        )
        # delta maintenance: -old pairs of affected words, +new pairs
        # of their merged forms; everything else in pc is untouched
        delta_old = _pair_counts(affected).select("a", "b", (-F.col("n")).alias("n"))
        delta_new = _pair_counts(merged_words)
        pc = (
            pc.unionByName(delta_old)
            .unionByName(delta_new)
            .groupBy("a", "b")
            .agg(F.sum("n").alias("n"))
            .filter(F.col("n") > 0)
            .localCheckpoint(eager=True)
        )
        words = words.filter(~has_pair).unionByName(merged_words)
        rounds += 1
        if rounds % checkpoint_every == 0:
            words = words.repartition(n_part).localCheckpoint(eager=True)
    return merges[:k]


def bpe_encode(
    docs: DataFrame,
    merges: Sequence[tuple],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with learned BPE merge rules (the APPLY side
    of ``bpe_train_merges``): each word starts as characters and every
    merge rule is applied in training order, left-to-right — the exact
    semantics the trainer used, so train→encode round-trips.

    Map-side Arrow kernel (``mapInPandas``): the merge list is a
    driver-captured closure (vocabulary-sized — the same thing a real
    tokenizer ships as tokenizer.json), there is NO shuffle and NO
    join, so encoding scales linearly with corpus bytes — the correct
    100 TB shape for tokenizer application. Per-batch memoization of
    word → tokens makes the per-word cost amortize to near zero on
    natural corpora (Zipfian word reuse).

    Returns (doc_id, tokens array<string>, n_tokens).
    """
    rules = [(a, b) for a, b, *_ in merges]

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def _encode_word(word: str, memo: dict) -> list:
        got = memo.get(word)
        if got is not None:
            return got
        sym = list(word)
        for a, b in rules:
            if len(sym) < 2:
                break
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        memo[word] = sym
        return sym

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            # NULL text arrives as None; the trainer's SQL split() treats
            # it as token-less, so the encoder must too (not crash)
            toks = [
                [t for w in text.split(" ") if w for t in _encode_word(w, memo)]
                if text is not None
                else []
                for text in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    # per-word Python merge loop: ~ms per row — far denser CPU per
    # input byte than the vectorized kernels' default budget
    return spread_for_kernel(
        docs.select("doc_id", F.col(text_col).alias("text")), bytes_per_task=65536
    ).mapInPandas(kernel, schema=out_schema)


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 64,
    salt: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets
    a ``shard`` in [0, n_shards) and a ``pos`` within its shard, both
    pure functions of (id, salt) — the data-ordering step before
    writing training shards, where a biased order (e.g. all of one
    source first) measurably hurts optimization.

    Content-addressed md5 ordering (same convention as ``hash_split``):
    no ``rand()``, so the permutation is identical on every rerun and
    engine-portable. Cost at 100 TB: one hash-partition shuffle on
    ``shard`` plus a per-shard sort (the window) — there is no global
    sort, and shards are written independently. Change ``salt`` per
    epoch for a fresh permutation.
    """
    keynum = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (
        df.withColumn("_k", keynum)
        .withColumn("shard", (F.col("_k") % n_shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_k")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    salt: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of ``k`` rows
    (Efraimidis & Spirakis, IPL'06 A-ES): each row draws
    ``key = ln(u)/w`` with u ∈ (0,1) — the numerically stable
    exponential-race form of ``u^(1/w)``, same ordering — and the k
    LARGEST keys win: inclusion probability proportional to weight,
    exactly one pass, no coordination. The curation use: sample a
    corpus proportional to a quality score instead of uniformly.

    The log form matters at extreme weights: ``u^(1/w)`` saturates to
    1.0 for w ≳ 1e10 (every key rounds equal → selection degrades to
    smallest-id) and underflows to 0.0 for tiny w; ``ln(u)/w`` keeps
    full relative precision at any weight scale. u derives from the md5
    of (id, salt) — the same content-addressed convention as
    ``hash_split`` — so the draw reproduces across reruns,
    partitionings, and engines. Cross-engine stability: ``ln(u)`` is
    bounded in (−41.6, 0), so rounding IT to 9 dp absorbs any last-ulp
    libm difference, and the subsequent division by w is IEEE-exact —
    the key therefore keeps full RELATIVE precision at any weight
    scale (rounding the quotient instead would re-saturate for huge
    w, where every quotient lands inside one rounding tick). Ties
    break by id. Top-k by key is a ``TakeOrderedAndProject`` at scale —
    no global sort. Rows with weight ≤ 0 are excluded structurally —
    they can never be selected, even when k exceeds the
    positive-weight population.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    key = F.round(F.log(u), 9) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.desc("es_key"), id_col)
        .limit(k)
    )


def token_budget_select(
    df: DataFrame,
    quality_col: str,
    tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy corpus selection under a token budget: take rows in
    descending ``quality_col`` order (ties by id) while the running
    token total stays within ``budget`` — the standard curation step
    when the training run affords N tokens and the corpus holds more.

    A row is kept iff the cumulative token count UP TO AND INCLUDING it
    is ≤ budget (first-fit prefix, not knapsack — the deterministic,
    one-pass contract). Adds ``cum_tokens``.

    Scalable prefix sum — NO global-ordering window (which would funnel
    the corpus through one task): (1) aggregate token totals per
    DISTINCT quality value, (2) prefix-sum those totals on the tiny
    value-level table (its window sorts score values, not documents),
    (3) join each row its value's offset back and add a per-value
    window cumsum ordered by id — every document-level sort is bounded
    by one quality value's population. Exact for any data; the
    value-level table is small whenever quality is a score/level/length
    (continuous unique-per-row quality degrades it to corpus size —
    quantize the score first in that case).
    """
    per_q = df.groupBy(quality_col).agg(F.sum(tokens_col).alias("_qtot"))
    # strictly-better values only: this row's own value contributes via
    # the per-value window below
    wq = Window.orderBy(F.desc(quality_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_q.select(
        quality_col, F.coalesce(F.sum("_qtot").over(wq), F.lit(0)).alias("_qoff")
    )
    wv = Window.partitionBy(quality_col).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.join(offsets, quality_col)
        .withColumn(
            "cum_tokens",
            (F.col("_qoff") + F.sum(tokens_col).over(wv)).cast("bigint"),
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("_qoff")
        .select(*df.columns, "cum_tokens")
    )


def domain_mix_weights(
    docs: DataFrame,
    targets: dict[str, float],
    domain_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain sampling weights to steer a corpus toward a target
    mixture (the Pile/Dolma-style domain reweighting step): for each
    domain, measure its ACTUAL share of corpus tokens, then weight =
    target_share / actual_share — the multiplier a downstream weighted
    sampler (``weighted_sample``) or epoch-repetition schedule applies
    per document of that domain to hit the target mix. weight > 1 ⇒
    the domain must be upsampled/repeated, < 1 ⇒ downsampled.

    Domains absent from ``targets`` get weight 0 (excluded — the
    explicit-mixture contract); targets naming absent domains are a
    caller error surfaced by the published shares not summing to the
    target total. A domain whose documents are all token-less
    (actual_share = 0) gets weight 0 rather than NULL/inf — there is
    nothing to upsample, and the pinned value keeps Spark and the
    DuckDB oracle (whose default IEEE float ops would yield inf)
    agreeing on the edge.

    One hash aggregate over (domain) — token counts are per-row
    ``size(split())`` inside codegen, so the shuffle is |domains| rows
    regardless of corpus size; the share normalization is a broadcast
    of one total row. Output (domain, n_docs, n_tokens, actual_share,
    target_share, weight), shares and weight rounded to 6 dp.
    """
    n_tok = F.size(F.expr(f"filter(split({text_col}, ' '), x -> x != '')"))
    per_domain = docs.select(
        F.col(domain_col).alias("domain"), n_tok.alias("_t")
    ).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_t").cast("bigint").alias("n_tokens"),
    )
    total = per_domain.agg(F.sum("n_tokens").alias("_total"))
    target_map = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    actual = F.col("n_tokens") / F.col("_total")
    target = F.coalesce(target_map[F.col("domain")], F.lit(0.0))
    return (
        per_domain.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.round(actual, 6).alias("actual_share"),
            F.round(target, 6).alias("target_share"),
            F.round(
                F.when(F.col("n_tokens") > 0, target / actual).otherwise(F.lit(0.0)), 6
            ).alias("weight"),
        )
    )


def _hashed_grams(
    docs: DataFrame,
    buckets: int,
    text_col: str,
    id_col: str,
    flag: Column | None = None,
) -> DataFrame:
    """(id, bucket[, _tgt]) per word unigram AND bigram occurrence (a
    bag, not a set — DSIR's features count occurrences), bucketed by the
    md5-prefix convention of ``_hash_bucket`` so the assignment
    reproduces in any engine (DuckDB: ``('0x' || substr(md5(g), 1,
    15))::bigint % B``). Bigrams via zip_with over two slices — no
    sequence() call that would go descending on short docs. ``flag``
    (optional boolean column) is carried through per gram so an
    in-corpus target distribution can be derived from THIS table
    instead of hashing the target docs a second time."""
    toks = F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
    grams = F.expr(
        "concat(_t, zip_with(slice(_t, 1, greatest(size(_t) - 1, 0)),"
        " slice(_t, 2, greatest(size(_t) - 1, 0)), (a, b) -> concat(a, ' ', b)))"
    )
    cols = [F.col(id_col).alias("_id"), toks.alias("_t")]
    carry = []
    if flag is not None:
        cols.append(flag.alias("_tgt"))
        carry = ["_tgt"]
    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    # unigram+bigram explode + per-gram md5: ~100x CPU amplification
    # over the scanned bytes, and the corpus subtree executes twice
    # (counts pass + per-doc reduce) — spread adaptively so neither
    # pass is single-task on a one-split corpus
    return (
        spread_for_kernel(docs.select(*cols), bytes_per_task=65536)
        .select("_id", F.explode(grams).alias("_g"), *carry)
        .select(
            "_id",
            (F.conv(F.substring(F.md5("_g"), 1, 15), 16, 10).cast("bigint") % buckets)
            .alias("b"),
            *carry,
        )
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    buckets: int = 4096,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_pred: Column | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every corpus document by how target-like
    its hashed n-gram distribution is. Features are word unigram +
    bigram occurrences hashed into ``buckets``; two categorical
    distributions are estimated with add-``smoothing`` Laplace
    smoothing — p̂_target over the ``target`` exemplar set, p̂_raw over
    ``docs`` — and each document's log importance weight is

        logw(d) = Σ_{g ∈ grams(d)} [ ln p̂_target(h(g)) − ln p̂_raw(h(g)) ]

    the log of the DSIR importance ratio. Feed ``exp``-free logw
    straight into ``weighted_sample``'s exponential-race keys (key =
    ln(u)/w needs w > 0, so shift/exp as appropriate) or rank by logw
    for top-k selection toward the target domain.

    Returns one row per corpus document: (id, n_grams, logw), logw
    rounded to 6 dp, gram-less documents as (id, 0, 0.0).

    Cross-engine determinism: buckets come from the md5-prefix hash
    (engine-portable, content-addressed); per-bucket log-ratios are
    quantized to integer NANO-UNITS — round(round(lr, 9) · 1e9) as
    bigint — and the per-doc reduce sums int64, which is EXACT in any
    addition order, so both engines hold the identical integer before
    the single final division/rounding. (Summing rounded doubles
    instead leaves ~1e-15 addition-order wobble that flips the 6-dp
    rounding when a doc's sum sits on a boundary — observed once in
    5,000 docs at sf0.1.) The two-step quantization bounds the libm
    hazard: a 1-ulp ln() difference only changes the integer when lr
    sits within ~4e-15 of a 0.5e-9 grid boundary, and even then the
    final 6-dp value only moves if the doc sum also sits within 1e-9
    of its own boundary — a ~1e-9 coincidence instead of a per-doc
    ~1e-4 one.

    The 100 TB shape: the corpus crosses the wire once as (id, bucket)
    int pairs; both distribution estimates are |buckets|-row hash
    aggregates (bounded by the caller's ``buckets``, default 4096 —
    ~100 KB), so the ratio table legitimately broadcasts; the per-doc
    reduce is one groupBy over the already-shuffled gram pairs. No
    text moves after tokenization, no all-pairs stage, and target-set
    size only affects one bounded aggregate.
    """
    if (target is None) == (target_pred is None):
        raise ValueError(
            "pass exactly one of target= (an exemplar DataFrame, e.g. a "
            "separate high-quality corpus) or target_pred= (a boolean "
            "Column over docs, for an in-corpus target domain)"
        )
    # Subtree-reuse discipline: Spark re-executes a DataFrame's lineage
    # at every point of use, so the corpus gram table (the expensive
    # explode+md5 map over the whole corpus) must be referenced as few
    # times as possible. Both distribution counts come from ONE
    # aggregate over it (a conditional count for the in-corpus target),
    # that |buckets|-row result is localCheckpointed (bucket-bounded —
    # ≤ ``buckets`` rows at any corpus size, so the materialization is
    # always safe) so totals and the ratio table read the checkpoint,
    # and the corpus subtree therefore executes exactly twice: the
    # counts pass and the per-doc reduce. The naive five-reference
    # formulation re-ran the corpus explode+md5 five times.
    if target_pred is not None:
        # in-corpus target: one gram/hash pass carrying a per-gram flag
        # instead of hashing the target documents a second time; the
        # target total can be summed from the counts table because the
        # target's buckets are a subset of the corpus's by construction
        corpus_grams = _hashed_grams(docs, buckets, text_col, id_col, flag=target_pred)
        counts = corpus_grams.groupBy("b").agg(
            F.count(F.lit(1)).alias("_cc"),
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_tc"),
        ).localCheckpoint(eager=False)
        totals = counts.agg(
            F.sum("_cc").alias("_ct"),
            F.sum(F.coalesce("_tc", F.lit(0))).alias("_tt"),
        )
    else:
        # external target set: its own (bounded) counts table; the
        # target TOTAL must come from that table, not from the joined
        # counts — a bucket holding only target grams is absent from
        # the corpus counts and would silently undercount p̂_target's
        # denominator after the left join
        corpus_grams = _hashed_grams(docs, buckets, text_col, id_col)
        tgt_counts = (
            _hashed_grams(target, buckets, text_col, id_col)
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("_tc"))
            .localCheckpoint(eager=False)
        )
        counts = (
            corpus_grams.groupBy("b")
            .agg(F.count(F.lit(1)).alias("_cc"))
            .join(tgt_counts, "b", "left")
            .localCheckpoint(eager=False)
        )
        totals = counts.agg(F.sum("_cc").alias("_ct")).crossJoin(
            tgt_counts.agg(F.sum("_tc").alias("_tt"))
        )
    s, b_count = float(smoothing), float(buckets)
    dist = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.round(
                    F.log(
                        (F.coalesce("_tc", F.lit(0)) + s) / (F.col("_tt") + s * b_count)
                    )
                    - F.log((F.col("_cc") + s) / (F.col("_ct") + s * b_count)),
                    9,
                )
                * 1e9
            )
            .cast("bigint")
            .alias("_lr"),
        )
    )
    per_doc = (
        corpus_grams.join(F.broadcast(dist), "b")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("_lr").alias("_s"))
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.round(F.coalesce("_s", F.lit(0)) / 1e9, 6).alias("logw"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style overlapping document chunking: the order-preserving
    whitespace token stream cut into windows of ``chunk_tokens``
    starting every ``stride`` tokens (``stride < chunk_tokens`` ⇒
    overlapping windows; the last window of a document may be short).
    Emits (id, chunk_id, n_chunk_tokens, chunk_md5) — the digest, not
    the chunk text, so downstream chunk-level dedup/indexing shuffles
    16-byte hashes (join back by (id, chunk_id) when the text is
    needed).

    Entirely JVM expressions inside whole-stage codegen — split →
    sequence → posexplode → slice → md5 — so it is a narrow map over
    the corpus scan: no shuffle, no Python, embarrassingly parallel at
    any corpus size. Token-less documents produce no chunks (the
    sequence guard matters: ``sequence(0, -1, s)`` DESCENDS in Spark
    SQL — the l17 _PAIRS_EXPR lesson).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = docs.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias("_toks"),
    )
    starts = F.expr(
        f"case when size(_toks) > 0 then sequence(0, size(_toks) - 1, {stride}) "
        "else cast(array() as array<int>) end"
    )
    return (
        toks.select(F.col(id_col), "_toks", F.posexplode(starts).alias("chunk_id", "_s"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.least(F.lit(chunk_tokens), F.size("_toks") - F.col("_s"))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.md5(
                F.array_join(F.slice("_toks", F.col("_s") + 1, chunk_tokens), " ")
            ).alias("chunk_md5"),
        )
    )


def temperature_mix_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    domain_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual rebalancing
    rule of XLM-R, Conneau et al. arXiv:1911.02116 §3.1, also used for
    source mixing in large pretraining corpora): the target share of
    domain d is ``p_d^alpha / sum_e p_e^alpha`` where ``p_d`` is the
    domain's ACTUAL share of corpus tokens. ``alpha = 1`` keeps natural
    proportions, ``alpha = 0`` forces uniform, and the working range
    (0.2-0.7) upsamples the tail without letting any head domain
    dominate. Complements ``domain_mix_weights`` (explicit hand-set
    targets) — here the target mixture is DERIVED from the corpus
    itself, no per-domain configuration.

    Output (domain, n_docs, n_tokens, actual_share, target_share,
    weight) with ``weight = target_share / actual_share`` — the
    multiplier ``weighted_sample`` / an epoch-repetition schedule
    applies per document of that domain, same contract as
    ``domain_mix_weights``. Token-less domains get target and weight 0
    (nothing to upsample; pinned so the IEEE inf/NaN edge can't leak).
    Shares and weight rounded to 6 dp.

    One hash aggregate over (domain) with per-row token counts inside
    codegen — the shuffle is |domains| rows at any corpus size; the
    pow() normalization runs on the domain-level table (tens of rows)
    via a broadcast of its one-row total.
    """
    n_tok = F.size(F.expr(f"filter(split({text_col}, ' '), x -> x != '')"))
    per_domain = docs.select(
        F.col(domain_col).alias("domain"), n_tok.alias("_t")
    ).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_t").cast("bigint").alias("n_tokens"),
    )
    total = per_domain.agg(F.sum("n_tokens").alias("_total"))
    actual = F.col("n_tokens") / F.col("_total")
    scaled = F.when(
        F.col("n_tokens") > 0, F.pow(actual, F.lit(float(alpha)))
    ).otherwise(F.lit(0.0))
    with_actual = per_domain.crossJoin(F.broadcast(total)).withColumn(
        "_scaled", scaled
    )
    norm = with_actual.agg(F.sum("_scaled").alias("_norm"))
    target = F.col("_scaled") / F.col("_norm")
    return (
        with_actual.crossJoin(F.broadcast(norm))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            # same pin as target/weight: a 0-token domain (or an
            # all-empty corpus where _total = 0) must report 0.0, not
            # the NULL a 0/0 division would produce
            F.round(
                F.when(
                    (F.col("n_tokens") > 0) & (F.col("_total") > 0), actual
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("actual_share"),
            F.round(
                F.when(F.col("n_tokens") > 0, target).otherwise(F.lit(0.0)), 6
            ).alias("target_share"),
            F.round(
                F.when(F.col("n_tokens") > 0, target / actual).otherwise(F.lit(0.0)),
                6,
            ).alias("weight"),
        )
    )


def epoch_repetition_plan(
    docs: DataFrame,
    weights: DataFrame,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Materialize per-domain mixture weights into the per-document
    EPOCH REPETITION PLAN the trainer actually consumes — the step
    between ``domain_mix_weights`` / ``temperature_mix_weights`` and
    the data loader: a document with weight w is emitted
    ``floor(w) + [u < frac(w)]`` times, where u ∈ (0,1) derives from
    the md5 of (id, salt) — the same content-addressed convention as
    ``weighted_sample``, so the plan reproduces across reruns,
    partitionings, and engines, and E[repeats] = w exactly per domain
    (stochastic rounding, not biased truncation). Weight < 1 domains
    are downsampled by the same rule (w = 0.66 keeps 66% of docs once);
    weight 0 / unknown domains emit nothing.

    Output one row per (doc, repetition): (doc_id, domain, n_repeats,
    rep_idx) with rep_idx in [1, n_repeats] — ready to union into an
    epoch manifest or feed ``shuffle_shards`` (salt the shard shuffle
    per epoch for fresh permutations of the repeated stream).

    Scale shape: the weights table is |domains| rows (broadcast); the
    repeat expansion is a per-row ``explode`` of a ≤ ceil(max w)-long
    sequence inside codegen — no shuffle at all, output bytes scale
    with the repeated corpus (which is the contract: this IS the
    epoch stream).
    """
    w = weights.select(
        F.col("domain").alias(domain_col), F.col("weight").cast("double").alias("_w")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    n = (
        F.floor("_w")
        + (u < (F.col("_w") - F.floor("_w"))).cast("bigint")
    ).cast("int")
    return (
        docs.select(id_col, domain_col)
        .join(F.broadcast(w), domain_col)
        .withColumn("n_repeats", n)
        .filter(F.col("n_repeats") >= 1)
        .select(
            id_col,
            F.col(domain_col).alias("domain"),
            "n_repeats",
            F.explode(F.sequence(F.lit(1), F.col("n_repeats"))).alias("rep_idx"),
        )
    )
