"""Invariant tests for the training-data operators (traindata.py):
split determinism/partition, exact stratified quotas, packing algebra."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.operators.traindata import (
    hash_split,
    pack_sequences,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"


def test_hash_split_partitions_and_is_deterministic(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    out = hash_split(docs)
    n = docs.count()
    # every row assigned exactly one split; union of splits == input
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n
    assert set(by) <= {"train", "val", "test"}
    # proportions near 80/10/10 (hash uniformity; 500 docs → loose bounds)
    assert 0.7 * n < by["train"] < 0.9 * n
    # determinism: repartitioned rerun gives the identical assignment
    again = hash_split(docs.repartition(13)).select("doc_id", "split")
    assert out.select("doc_id", "split").exceptAll(again).count() == 0


def test_stratified_sample_exact_quota_per_stratum(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    frac = 0.2
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, "lang", frac)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(sizes)  # no stratum missed
    for lang, n in sizes.items():
        assert got[lang] == math.ceil(frac * n)


def test_pack_sequences_window_algebra(spark):
    cap = 512
    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        "source",
        F.expr("size(filter(split(text, ' '), w -> w != ''))").cast("bigint").alias("tok_cnt"),
    )
    packed = pack_sequences(docs, tok_col="tok_cnt", capacity=cap).cache()
    try:
        assert packed.count() == docs.count()
        # offsets live inside the window
        assert packed.filter((F.col("seq_off") < 0) | (F.col("seq_off") >= cap)).count() == 0
        # seq_id never decreases along each shard's id order
        lagged = packed.withColumn(
            "prev",
            F.lag("seq_id").over(Window.partitionBy("source").orderBy("doc_id")),
        )
        assert lagged.filter(F.col("prev") > F.col("seq_id")).count() == 0
        # straddles ⇔ the document crosses a capacity boundary
        bad = packed.filter(
            F.col("straddles")
            != (F.floor((F.col("seq_off") + F.greatest(F.col("tok_cnt"), F.lit(1)) - 1) / cap) > 0)
        )
        assert bad.count() == 0
    finally:
        packed.unpersist()


def test_pack_sequences_zero_token_doc_never_straddles(spark):
    rows = [(1, "a", 512), (2, "a", 0), (3, "a", 10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "tok_cnt"])
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_off"], r["straddles"])
        for r in pack_sequences(df, tok_col="tok_cnt", capacity=512).collect()
    }
    assert got[1] == (0, 0, False)  # fills window 0 exactly
    assert got[2] == (1, 0, False)  # zero-width doc at a boundary: no straddle
    assert got[3] == (1, 0, False)


def test_bpe_merges_match_sequential_reference(spark):
    from collections import Counter

    from actuarial_reserve_modelling_spark.operators.traindata import bpe_train_merges

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 80)
    got = bpe_train_merges(docs, k=6)
    # checkpoint cadence is an execution detail — crossing the periodic
    # full-table checkpoint boundary must not change the learned rules
    assert bpe_train_merges(docs, k=6, checkpoint_every=2) == got

    # sequential reference BPE over the same word-frequency table
    freqs = Counter()
    for r in docs.collect():
        for w in r["text"].split(" "):
            if w:
                freqs[w] += 1
    vocab = {tuple(w): n for w, n in freqs.items()}
    expected = []
    for _ in range(6):
        pairs = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        # max count, ties lexicographic — the operator's contract
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((a, b, n))
        new_vocab = {}
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    assert got == expected, (got, expected)


def test_bpe_merges_survive_quote_and_backslash_symbols(spark):
    """Symbols are corpus data — quotes, backslashes, and escape-like
    sequences must not break the merge rewrite (regression: the rewrite
    was once an interpolated SQL string)."""
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_train_merges

    rows = [(0, r"c:\tmp c:\tmp it's it's \\n \\n"), (1, r"c:\tmp it's")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train_merges(docs, k=3)
    assert len(merges) == 3
    # top merge must come from the backslash-heavy word and apply cleanly
    assert all(isinstance(a, str) and isinstance(b, str) for a, b, _ in merges)


def test_bpe_encode_matches_sequential_application(spark):
    """bpe_encode must reproduce a sequential left-to-right application
    of the trained merges, word by word."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        bpe_encode,
        bpe_train_merges,
    )

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 60)
    merges = bpe_train_merges(docs, k=5)
    got = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(docs, merges).collect()}

    def encode_word(word):
        sym = list(word)
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    for r in docs.collect():
        expected = [t for w in r["text"].split(" ") if w for t in encode_word(w)]
        assert got[r["doc_id"]] == expected, r["doc_id"]


def test_bpe_encode_empty_and_single_char_docs(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_encode

    docs = spark.createDataFrame([(0, ""), (1, "a"), (2, "  ")], ["doc_id", "text"])
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"]) for r in
           bpe_encode(docs, [("a", "b", 1)]).collect()}
    assert got[0] == ([], 0)
    assert got[1] == (["a"], 1)
    assert got[2] == ([], 0)


def test_shuffle_shards_is_permutation_and_deterministic(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import shuffle_shards

    docs = load_table(spark, SF, "documents").select("doc_id")
    a = shuffle_shards(docs, n_shards=16, salt=7)
    b = shuffle_shards(docs.repartition(13), n_shards=16, salt=7)
    rows_a = {(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()}
    rows_b = {(r["doc_id"], r["shard"], r["pos"]) for r in b.collect()}
    assert rows_a == rows_b  # partitioning-invariant
    n = docs.count()
    assert len(rows_a) == n
    # positions within each shard are exactly 0..len-1
    from collections import defaultdict
    by_shard = defaultdict(list)
    for _, s, p in rows_a:
        by_shard[s].append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    # a different salt produces a different permutation
    c = {(r["doc_id"], r["shard"]) for r in
         shuffle_shards(docs, n_shards=16, salt=8).collect()}
    assert c != {(d, s) for d, s, _ in rows_a}


def test_weighted_sample_prefers_heavy_rows(spark):
    """With weights spanning orders of magnitude, the heavy rows must
    dominate the selection (E-S inclusion odds ~ weight)."""
    from actuarial_reserve_modelling_spark.operators.traindata import weighted_sample

    rows = [(i, 1000 if i < 50 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_sample(df, weight_col="w", k=50, salt=3).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r["w"] == 1000)
    assert heavy >= 40  # 50 heavy rows at 1000x weight vs 950 light ones
    # deterministic under repartitioning
    again = weighted_sample(df.repartition(7), weight_col="w", k=50, salt=3).collect()
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in again}


def test_token_budget_select_prefix_property(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import (
        token_budget_select,
    )

    rows = [(i, 100 - i, 10 + (i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "q", "toks"])
    got = token_budget_select(df, "q", "toks", budget=200).collect()
    # kept rows are exactly the best-quality prefix whose cumsum fits
    kept = sorted(got, key=lambda r: -r["q"])
    assert kept[-1]["cum_tokens"] <= 200
    total = 0
    expect_ids = []
    for i, (d, q, t) in enumerate(sorted(rows, key=lambda r: -r[1])):
        if total + t > 200:
            break
        total += t
        expect_ids.append(d)
    assert {r["doc_id"] for r in got} == set(expect_ids)


def test_bpe_encode_null_text(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_encode

    docs = spark.createDataFrame([(0, None), (1, "ab ab")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, [("a", "b", 1)]).collect()}
    assert got == {0: 0, 1: 2}


def test_weighted_sample_extreme_weights_and_exclusion(spark):
    """The ln(u)/w key must stay discriminative at huge weights, and
    weight<=0 rows must never be selected even when k exceeds the
    positive-weight population."""
    from actuarial_reserve_modelling_spark.operators.traindata import weighted_sample

    rows = [(i, 10**12 if i < 30 else 1) for i in range(200)] + [
        (200 + i, 0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_sample(df, weight_col="w", k=30, salt=5).collect()
    heavy = sum(1 for r in got if r["w"] == 10**12)
    assert heavy >= 25  # 1e12x weight dominates; would fail if keys saturated
    # k larger than the positive population: zero-weight rows still excluded
    all_pos = weighted_sample(df, weight_col="w", k=1000, salt=5).collect()
    assert len(all_pos) == 200
    assert all(r["w"] > 0 for r in all_pos)


def test_weighted_sample_duckdb_parity_extreme_weights(spark):
    """The selected set must match DuckDB running the identical key
    formula, including at weight scales spanning 12 orders of
    magnitude — the regime where naive key math diverges."""
    import duckdb

    rows = [(i, [1, 10**6, 10**12][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    from actuarial_reserve_modelling_spark.operators.traindata import weighted_sample

    got = {r["doc_id"] for r in weighted_sample(df, "w", k=40, salt=42).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]
        for r in con.execute("""
            SELECT doc_id FROM t WHERE w > 0
            ORDER BY round(ln(
                (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15))
                      AS BIGINT) AS DOUBLE) + 1) / 1152921504606846976.0
            ), 9) / w DESC, doc_id
            LIMIT 40
        """).fetchall()
    }
    assert got == want


def test_dsir_importance_weights_exact(spark):
    """DSIR log importance weights match an exact Python replica of the
    same hashed-bigram arithmetic; target-like docs score higher than
    off-target docs; gram-less docs return (0, 0.0)."""
    import hashlib
    import math

    from actuarial_reserve_modelling_spark.operators.traindata import (
        dsir_importance_weights,
    )

    rows = [
        (1, "spark table scan", "tgt"),
        (2, "spark table merge", "tgt"),
        (3, "spark table scan fast", "web"),
        (4, "zebra yak quux", "web"),
        (5, "", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    target = docs.filter("source = 'tgt'")
    B, s = 4096, 1.0

    def grams(t):
        w = [x for x in t.split(" ") if x]
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    tgt_grams = [bucket(g) for _, t, src in rows if src == "tgt" for g in grams(t)]
    cor_grams = [bucket(g) for _, t, _ in rows for g in grams(t)]
    tt, ct = len(tgt_grams), len(cor_grams)
    expect = {}
    for d, t, _ in rows:
        gs = [bucket(g) for g in grams(t)]
        # mirror the operator's integer nano-unit quantization: the
        # per-doc sum is exact int64, only one division/round at the end
        nano = sum(
            round(
                round(
                    math.log((tgt_grams.count(b) + s) / (tt + s * B))
                    - math.log((cor_grams.count(b) + s) / (ct + s * B)),
                    9,
                )
                * 1e9
            )
            for b in gs
        )
        expect[d] = (len(gs), round(nano / 1e9, 6))
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_importance_weights(docs, target, buckets=B).collect()
    }
    assert got == expect
    assert got[5] == (0, 0.0)
    # target members score above the clearly-off-target doc
    assert got[1][1] > got[4][1] and got[2][1] > got[4][1]
    # the near-target doc shares most grams with the target
    assert got[3][1] > got[4][1]


def test_dsir_target_pred_matches_target_frame(spark):
    """The single-scan in-corpus path (target_pred=) must produce the
    identical output to passing the same docs as a target DataFrame;
    passing both or neither is refused."""
    import pytest
    from pyspark.sql import functions as F

    from actuarial_reserve_modelling_spark.operators.traindata import (
        dsir_importance_weights,
    )

    rows = [
        (1, "spark table scan", "tgt"),
        (2, "spark table merge", "tgt"),
        (3, "spark table scan fast", "web"),
        (4, "zebra yak quux", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    via_frame = {
        (r["doc_id"], r["n_grams"], r["logw"])
        for r in dsir_importance_weights(
            docs, docs.filter("source = 'tgt'"), buckets=512
        ).collect()
    }
    via_pred = {
        (r["doc_id"], r["n_grams"], r["logw"])
        for r in dsir_importance_weights(
            docs, target_pred=F.col("source") == "tgt", buckets=512
        ).collect()
    }
    assert via_frame == via_pred
    with pytest.raises(ValueError, match="exactly one"):
        dsir_importance_weights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_importance_weights(
            docs, docs.limit(1), target_pred=F.col("source") == "tgt"
        )


def test_chunk_documents_edges(spark):
    """Overlap math, short-tail chunks, token-less docs, and the
    order-preserving (non-distinct) token stream."""
    from actuarial_reserve_modelling_spark.operators.traindata import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # 5 tokens, chunk=3 stride=2 -> starts 0,2,4
            (2, ""),            # no chunks
            (3, "  "),          # no chunks (empty tokens filtered)
            (4, "x x x"),       # repeated tokens preserved
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=3, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["chunk_id"] for r in by_doc[1]) == [0, 1, 2]
    assert {r["chunk_id"]: r["n_chunk_tokens"] for r in by_doc[1]} == {0: 3, 1: 3, 2: 1}
    assert 2 not in by_doc and 3 not in by_doc
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    got = {r["chunk_id"]: r["chunk_md5"] for r in by_doc[1]}
    assert got == {0: md5("a b c"), 1: md5("c d e"), 2: md5("e")}
    assert {r["chunk_md5"] for r in by_doc[4]} == {md5("x x x"), md5("x")}


def test_bpe_batched_rounds_equal_sequential(spark):
    """r10 exactness guard: the merge list is invariant across batch_m
    settings — batching changes Spark job counts, never the learned
    rules. Runs on real documents (where the guard engages and
    disengages naturally) and on an adversarial corpus built so the
    top-2 pairs are symbol-disjoint but merging #1 CREATES a pair that
    outcounts #2 — the case a naive disjoint-prefix batcher gets wrong
    and the created-pair bound must catch."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        bpe_train_merges,
    )

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 60)
    seq = bpe_train_merges(docs, k=8, batch_m=1)
    assert bpe_train_merges(docs, k=8, batch_m=4) == seq
    assert bpe_train_merges(docs, k=8, batch_m=8) == seq

    # adversarial: 'xaby'×30 gives (a,b)=(x,a)=(b,y)=30; (c,d)=20 from
    # 'cd'×20 is disjoint from (a,b) and is the top-4 pair, but merging
    # (a,b) creates (x,ab)=30 and (ab,y)=30 which MUST outrank it —
    # sequential order: (a,b), then (ab,y)/(x,ab) by tie-break, (c,d)
    # only after. A batcher accepting [(a,b),(c,d)] in round 1 would
    # return a different list.
    rows = [(i, "xaby") for i in range(30)] + [(1000 + i, "cd") for i in range(20)]
    adv = spark.createDataFrame(rows, ["doc_id", "text"])
    seq_adv = bpe_train_merges(adv, k=4, batch_m=1)
    assert bpe_train_merges(adv, k=4, batch_m=8) == seq_adv
    # sanity on the construction itself: (c,d) is NOT merge #2
    assert seq_adv[0][:2] == ("a", "b") and seq_adv[1][:2] != ("c", "d")


def test_bpe_duckdb_oracle_matches_trainer_on_self_pairs(spark, tmp_path):
    """The l17b unrolled-CTE oracle's one nontrivial branch is the
    self-pair (a == b) rewrite: a run of a's must merge at even offsets
    only ('aaaa' → ['aa','aa'], 'aaa' → ['aa','a']). The sf corpus
    rarely exercises it, so pin it on a crafted corpus where self-pair
    merges dominate, comparing the Spark trainer against the DuckDB SQL
    end to end."""
    import duckdb

    from actuarial_reserve_modelling_spark.operators.traindata import (
        bpe_train_merges,
    )
    from actuarial_reserve_modelling_spark.plans.training_data import (
        _bpe_merges_oracle_sql,
    )

    rows = [
        (0, "aaaa aaa zz"),
        (1, "aaaa bab zz"),
        (2, "aaa aaaa zz aaaa"),
        (3, "bab zz bab"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bpe_train_merges(docs, k=4)
    # self-pair ('a','a') must be merge #1: count = 2+1+2+1+1+2 = 9
    assert got[0][:2] == ("a", "a")
    doc_path = str(tmp_path / "documents.parquet")
    docs.toPandas().to_parquet(doc_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_path}')"
    )
    oracle = [
        (r[1], r[2], int(r[3]))
        for r in con.execute(_bpe_merges_oracle_sql(4)).fetchall()
    ]
    assert oracle == got, (oracle, got)


def test_temperature_mix_alpha_edges(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import (
        temperature_mix_weights,
    )

    docs = load_table(spark, SF, "documents")
    # alpha=1: target == actual, every weight 1 (natural proportions)
    nat = temperature_mix_weights(docs, alpha=1.0).collect()
    for r in nat:
        assert abs(r["target_share"] - r["actual_share"]) <= 2e-6
        assert abs(r["weight"] - 1.0) <= 1e-4
    # alpha=0: uniform targets across the token-bearing domains
    uni = temperature_mix_weights(docs, alpha=0.0).collect()
    live = [r for r in uni if r["n_tokens"] > 0]
    for r in live:
        assert abs(r["target_share"] - 1.0 / len(live)) <= 2e-6
    # working alpha: shares still sum to 1 and the tail is upsampled
    # relative to natural proportions while the head is downsampled
    mid = temperature_mix_weights(docs, alpha=0.3).collect()
    assert abs(sum(r["target_share"] for r in mid) - 1.0) <= 1e-5
    head = max(mid, key=lambda r: r["n_tokens"])
    tail = min((r for r in mid if r["n_tokens"] > 0), key=lambda r: r["n_tokens"])
    assert head["weight"] < 1.0 < tail["weight"]


def test_temperature_mix_tokenless_domain_pinned_zero(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import (
        temperature_mix_weights,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    empty = spark.createDataFrame(
        [(10_000_000, "", "xx"), (10_000_001, " ", "xx")], "doc_id long, text string, lang string"
    )
    out = {
        r["domain"]: r
        for r in temperature_mix_weights(docs.unionByName(empty), alpha=0.3).collect()
    }
    assert out["xx"]["n_tokens"] == 0
    assert out["xx"]["target_share"] == 0.0
    assert out["xx"]["weight"] == 0.0
    # live domains renormalize among themselves
    assert abs(sum(r["target_share"] for r in out.values()) - 1.0) <= 1e-5


def test_epoch_repetition_plan_expectation_and_determinism(spark):
    from actuarial_reserve_modelling_spark.operators.traindata import (
        epoch_repetition_plan,
        temperature_mix_weights,
    )

    docs = load_table(spark, SF, "documents")
    weights = temperature_mix_weights(docs, alpha=0.3)
    plan = epoch_repetition_plan(docs, weights).cache()
    try:
        # per-domain realized repeats track the weight (stochastic
        # rounding: E[repeats] = w; 60-220 docs/domain → loose bound)
        per_dom = {
            r["domain"]: r["reps"] / r["docs"]
            for r in plan.groupBy("domain")
            .agg(
                F.countDistinct("doc_id").alias("docs"),
                F.count(F.lit(1)).alias("reps"),
            )
            .collect()
        }
        w = {r["domain"]: r["weight"] for r in weights.collect()}
        for dom, realized in per_dom.items():
            # realized reps/doc conditioned on >=1; compare unconditional
            n_docs_total = docs.filter(F.col("lang") == dom).count()
            total_reps = plan.filter(F.col("domain") == dom).count()
            assert abs(total_reps / n_docs_total - w[dom]) <= 0.35, (
                dom, total_reps / n_docs_total, w[dom],
            )
        # rep_idx is a dense 1..n_repeats sequence per doc
        bad = plan.groupBy("doc_id", "n_repeats").agg(
            F.count(F.lit(1)).alias("k"), F.max("rep_idx").alias("mx")
        ).filter((F.col("k") != F.col("n_repeats")) | (F.col("mx") != F.col("n_repeats")))
        assert bad.count() == 0
        # determinism under repartition
        again = epoch_repetition_plan(docs.repartition(13), weights)
        assert plan.exceptAll(again).count() == 0
        assert again.exceptAll(plan).count() == 0
    finally:
        plan.unpersist()


def test_temperature_mix_all_empty_corpus_no_nulls(spark):
    """r12 ADVICE fix: when the ENTIRE corpus has zero tokens the
    _total is 0 and n_tokens/_total is a null-producing division —
    actual_share must come back as the pinned 0.0 (like target/weight),
    never NULL."""
    from actuarial_reserve_modelling_spark.operators.traindata import (
        temperature_mix_weights,
    )

    docs = spark.createDataFrame(
        [(1, "", "aa"), (2, "  ", "aa"), (3, "", "bb")],
        "doc_id long, text string, lang string",
    )
    rows = temperature_mix_weights(docs, alpha=0.3).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["actual_share"] == 0.0
        assert r["target_share"] == 0.0
        assert r["weight"] == 0.0
