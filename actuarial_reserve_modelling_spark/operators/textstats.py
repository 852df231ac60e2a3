"""Text analysis operators (SURVEY §2.10 L5): token counting, quality
scoring, heuristic language ID, and content fingerprints.

Everything here is built-in JVM expressions (split/regexp/array ops) —
the textbook case for *not* writing UDFs: per-document string math at
100 TB must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORDS = "filter(split(text, ' '), x -> x != '')"
# BPE-ish pre-tokenization: letter runs, digit runs, single other glyphs.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Tiny stopword-style marker sets for the heuristic language scorer.
# (Declarative toy lists — the mechanism, argmax-of-marker-hits, is the
# real product; swap lists for fasttext-style models via pandas_udf.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "tabular": ("table", "row", "column", "scan"),
    "relational": ("join", "merge", "hash", "agg"),
    "temporal": ("window", "batch", "order", "filter"),
}


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + regex (BPE-ish pre-tokenizer) token counts."""
    return docs.select(
        "doc_id",
        F.size(F.expr(WORDS)).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")).alias("re_tokens"),
        F.length("text").alias("n_bytes"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristics with a
    composite keep/drop score (C4/Gopher-style rule scoring)."""
    n_words = F.size(F.expr(WORDS))
    n_chars = F.length("text")
    punct = F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.expr(WORDS)), F.array(F.lit("the"), F.lit("a"))
        )
    )
    mean_word_len = (n_chars - n_words + 1).cast("double") / n_words.cast("double")
    score = (
        F.when((n_words >= 10) & (n_words <= 1000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(punct.cast("double") / n_chars.cast("double") < 0.2, F.lit(0.3)).otherwise(
            F.lit(0.0)
        )
        + F.when(stop_hits >= 1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars_computed"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 2).alias("quality_score"),
    )


def _marker_hits(words: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language/domain ID: argmax of marker-set hits over the
    distinct word set, first-listed set wins ties, 'und' when all zero."""
    words = F.array_distinct(F.expr(WORDS))
    hits = {name: _marker_hits(words, ms) for name, ms in LANG_MARKERS.items()}
    h1, h2, h3 = hits["tabular"], hits["relational"], hits["temporal"]
    pred = (
        F.when((h1 >= h2) & (h1 >= h3) & (h1 > 0), "tabular")
        .when((h2 >= h3) & (h2 > 0), "relational")
        .when(h3 > 0, "temporal")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        h1.alias("hits_tabular"),
        h2.alias("hits_relational"),
        h3.alias("hits_temporal"),
        pred.alias("pred_lang"),
    )


def clean_text(
    docs: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Training-corpus text normalization, all JVM-side: lowercase, strip
    control chars, redact URL/email-shaped spans, collapse whitespace.
    Returns (doc_id, clean, n_redactions, *keep). ``keep`` carries extra
    input columns through the projection — this is a pure column
    expression, so passengers are free, where the alternative (joining
    the output back to the input on doc_id, the pre-r13 l45 shape) is a
    real shuffle-or-broadcast join per passenger re-attach."""
    col = F.lower(F.col(text_col))
    col = F.regexp_replace(col, "[\\x00-\\x1f]", " ")
    url = "https?://[^ ]+"
    email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    n_red = (
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{url}', 0)"))
        + F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{email}', 0)"))
    )
    col = F.regexp_replace(col, url, "<url>")
    col = F.regexp_replace(col, email, "<email>")
    col = F.trim(F.regexp_replace(col, "\\s+", " "))
    return docs.select(
        "doc_id",
        col.alias("clean"),
        n_red.cast("int").alias("n_redactions"),
        *(keep or []),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """RAG-style document chunking: fixed-size token windows with
    overlap, JVM-side (split → sequence of chunk starts → slice →
    re-join). One output row per chunk with (doc_id, chunk_idx,
    chunk_text, n_tokens); short documents yield one chunk.

    At 100 TB this is a narrow map (explode multiplies rows by
    ~len/stride) — no shuffle; downstream embedding/indexing sees
    bounded-size texts.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
    starts = F.expr(
        f"sequence(1, greatest(size(filter(split({text_col}, ' '), x -> x != '')) "
        f"- {overlap}, 1), {stride})"
    )
    exploded = docs.select(
        "doc_id", toks.alias("toks"), F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.slice("toks", F.col("start"), F.lit(chunk_tokens))
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_tokens"),
    )


def content_fingerprints(docs: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text (the cheap exact-after-normalization tier;
    winnowing in operators/dedup.py is the locality-sensitive tier).
    ``keep`` carries extra input columns through (see clean_text — a
    free projection passenger vs a join to re-attach)."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), "\\s+", " ")
    return docs.select(
        "doc_id",
        F.substring(F.md5(normalized), 1, 16).alias("fingerprint"),
        *(keep or []),
    )


def word_shingles(
    docs: DataFrame, n: int = 5, text_col: str = "text", distinct: bool = False
) -> DataFrame:
    """Word n-gram shingles per document, hashed to 64-bit (xxhash64 of
    the space-joined gram) — the unit of benchmark decontamination and
    repetition scoring. JVM-side: tokenize → sliding slice → hash, all
    inside codegen; only (doc_id, shingle bigint) rows leave the stage.
    Docs with fewer than ``n`` words emit nothing.

    ``distinct=True`` dedupes each doc's shingles INSIDE the per-row
    array (array_distinct) before the explode — set it when the
    consumer only cares about set membership (decontamination): on
    template-repetitive corpora it cuts the exploded row count, and
    therefore every downstream probe/aggregate, before any shuffle
    happens, for the price of a per-row hash set."""
    toks = F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
    grams = F.expr(
        f"transform(sequence(1, size(_toks) - {n - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice(_toks, i, {n}))))"
    )
    if distinct:
        grams = F.array_distinct(grams)
    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    # the shingle expansion amplifies per-row CPU ~n_words-fold over
    # the scanned bytes, and a small corpus arrives in one split — the
    # r14 profile showed this map stage single-task; spread it like the
    # Arrow kernels (adaptive: no-op once the scan has enough splits)
    return (
        spread_for_kernel(docs.select("doc_id", toks.alias("_toks")),
                          bytes_per_task=65536)
        .filter(F.size("_toks") >= n)
        .select("doc_id", F.explode(grams).alias("shingle"))
    )


def decontaminate(
    train: DataFrame, benchmark: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at
    least one word n-gram with any benchmark document, with the count
    of distinct contaminated shingles per doc.

    The scale shape: the benchmark shingle set is bounded (eval suites
    are tiny next to a 100 TB corpus), so it broadcasts and the training
    side streams through a broadcast semi-ish join — no shuffle of the
    corpus. Returns (doc_id, n_contaminated) for flagged docs only.
    """
    bench_shingles = (
        word_shingles(benchmark, n=n, text_col=text_col, distinct=True)
        .select("shingle")
        .distinct()
    )
    # distinct=True: per-doc shingles are deduped in the per-row array
    # before the explode, so the broadcast probe and the count-distinct
    # see one row per (doc, shingle) instead of per occurrence — on the
    # adversarially repetitive stress corpus this is what bounds the
    # aggregate input, and the count_distinct result is identical.
    return (
        word_shingles(train, n=n, text_col=text_col, distinct=True)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_contaminated"))
    )


def decontaminate_flag(
    train: DataFrame, benchmark: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """The scan-bound form of ``decontaminate``: just the flagged
    doc_ids, no per-doc contamination counts. A LEFT SEMI join against
    the broadcast benchmark shingle set short-circuits on the first
    matching shingle per (doc, partition) and the only aggregation is
    the final doc_id distinct. Measured honestly: on the adversarially
    dense 64× stress corpus the saving is modest (22.5 s vs 24.2 s —
    the corpus-side shingle explode + broadcast probe dominates both
    forms there), and on a natural matched-sparse corpus both are
    scan-bound; the semi-join's structural advantage is that its
    shuffle input is one row per flagged DOC rather than one per
    matched shingle occurrence. Use this when the pipeline only
    FILTERS contaminated docs; use ``decontaminate`` when it reports.
    """
    bench_shingles = (
        word_shingles(benchmark, n=n, text_col=text_col, distinct=True)
        .select("shingle")
        .distinct()
    )
    return (
        word_shingles(train, n=n, text_col=text_col, distinct=True)
        .join(F.broadcast(bench_shingles), "shingle", "semi")
        .select("doc_id")
        .distinct()
    )


def repetition_scores(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Within-document repetition: fraction of word n-gram occurrences
    that are repeats of an earlier n-gram (Gopher-style quality rule —
    high repetition flags boilerplate/spam). Pure per-row expression:
    rep = 1 − distinct/total over the doc's own shingles; no shuffle at
    all, and so corpus-size-independent."""
    toks = F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
    grams = F.expr(
        f"transform(sequence(1, size(_toks) - {n - 1}),"
        f" i -> concat_ws(' ', slice(_toks, i, {n})))"
    )
    return (
        docs.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select("doc_id", grams.alias("_grams"))
        .select(
            "doc_id",
            F.size("_grams").cast("bigint").alias("n_grams"),
            F.size(F.array_distinct("_grams")).cast("bigint").alias("n_distinct"),
            F.round(
                1 - F.size(F.array_distinct("_grams")) / F.size("_grams").cast("double"),
                6,
            ).alias("repetition"),
        )
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b — no
# lookarounds, no backreferences.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PHONE_RE = "\\+?[0-9][0-9 -]{7,}[0-9]"


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII-shaped spans — emails, IPv4 addresses, phone-like
    digit runs — replacing each with a typed placeholder token
    (``<EMAIL>``/``<IP>``/``<PHONE>``), the standard pre-training
    compliance scrub.

    Purely map-side (three chained ``regexp_replace`` in whole-stage
    codegen — no shuffle, no Python), so it runs at scan throughput on
    any corpus size. Order matters and is part of the contract: emails
    first (their local part may contain digits), then IPv4 (dotted
    quads would otherwise partially match the phone pattern), then
    phone runs. Adds ``scrubbed`` plus per-category match counts; each
    count is taken on the text ALREADY scrubbed by the earlier passes
    (n_ips after email removal, n_phones after email+IP removal), so
    every count equals the number of placeholders of that type emitted
    — a dotted quad inside an email local part is replaced as <EMAIL>
    and never also counted as an IP. The caller drops or keeps the
    original column per retention policy."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).alias("n_phones"),
    )
