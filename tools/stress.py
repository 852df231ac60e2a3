"""Scale-stress sanity: run the heavy operators on inputs 10-60× larger
than sf0.1 (derived deterministically from the driver tables — no
external data) and report throughput. This is the "would the plan
survive a scale-up" check: linear-ish wall-time growth and no OOM/spill
collapse.

Usage: python tools/stress.py [multiplier]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from actuarial_reserve_modelling_spark.catalog import load_table, synthetic_portfolio
    from actuarial_reserve_modelling_spark.functions.reserves import simulate_reserves
    from actuarial_reserve_modelling_spark.operators.dedup import minhash_near_dup_pairs
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="arm-stress")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    # 1) reserve kernel on mult× the portfolio (unique ids per replica —
    #    same per-row cost profile as a genuinely bigger book)
    base = synthetic_portfolio(load_table(spark, sf_dir, "customer"))
    replicas = spark.range(mult).select(F.col("id").alias("rep"))
    big = base.crossJoin(replicas).select(
        F.concat_ws("_", "id", "rep").alias("id"), "term"
    )
    n_policies = big.count()
    # warm the python workers before timing
    simulate_reserves(big.limit(64), n_trials=10).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    simulate_reserves(big, n_trials=10_000).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["reserve_kernel"] = {
        "rows": n_policies,
        "sec": round(dt, 2),
        "policies_per_sec": round(n_policies / dt),
    }

    # 2) minhash signatures + LSH + verify on 4× documents (unique ids)
    docs = load_table(spark, sf_dir, "documents")
    reps = spark.range(4).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    )
    n_docs = big_docs.count()
    t0 = time.time()
    n_pairs = minhash_near_dup_pairs(
        big_docs, threshold=0.95, bands=16, rows_per_band=12
    ).count()
    dt = time.time() - t0
    out["minhash_dedup"] = {
        "docs": n_docs,
        "pairs": n_pairs,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt),
    }

    # 3) large-star/small-star connected components over the full
    #    near-dup pair graph of the replicated corpus — convergence
    #    rounds must stay logarithmic as the graph grows
    from actuarial_reserve_modelling_spark.operators.dedup import dedup_clusters

    pairs = (
        minhash_near_dup_pairs(big_docs, threshold=0.95, bands=16, rows_per_band=12)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    labels = dedup_clusters(pairs)
    n_vertices = labels.count()
    n_components = labels.select("rep_id").distinct().count()
    dt = time.time() - t0
    out["dedup_clusters"] = {
        "pairs": n_pairs,
        "vertices": n_vertices,
        "components": n_components,
        "sec": round(dt, 2),
    }

    # 4) the round-4 blocked pair operators. Each stage is sized to how
    #    much blocking signal this corpus offers: the synthetic documents
    #    share a tiny vocabulary, so FREQUENCY-based blocking (rarest
    #    gram prefixes) saturates — candidate counts approach all-pairs
    #    even though the blocking lemma is exact (measured: 8.6M of
    #    12.5M possible at τ=0.9). MinHash signature blocking (stage 2)
    #    is immune because it blocks on whole-set signatures, not
    #    individual common elements — which is why it is the primary
    #    near-dup path. The stages below still prove the operators are
    #    equi-join-shaped (no BNLJ at any size) and that verify cost,
    #    not candidate generation, is the scaling term.
    from actuarial_reserve_modelling_spark.operators.dedup import (
        levenshtein_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )

    reps4 = spark.range(4).select(F.col("id").alias("rep"))
    perturbed = docs.crossJoin(reps4).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat_ws(" ", "text", F.concat(F.lit("zz"), F.col("rep"))).alias("text"),
    ).localCheckpoint(eager=True)
    n4 = perturbed.count()

    # 4a) banded SimHash on 4× near-dup replicas (dense: every replica
    # pair of a source doc is within a few bits)
    t0 = time.time()
    n_sh = simhash_near_dup_pairs(perturbed, max_hamming=3).count()
    out["simhash_banded_pairs"] = {
        "docs": n4,
        "pairs": n_sh,
        "sec": round(time.time() - t0, 2),
    }

    # 4b) prefix-filter n-gram Jaccard at 1× (candidate-saturated corpus:
    # the wall measures 8.6M hashed-array verifies, the honest cost)
    n1 = docs.count()
    t0 = time.time()
    n_ng = ngram_jaccard_pairs(docs, n=3, threshold=0.9).count()
    out["ngram_prefix_pairs"] = {
        "docs": n1,
        "pairs": n_ng,
        "sec": round(time.time() - t0, 2),
    }

    # 4c) ED-Join levenshtein on 2× 80-char heads (q=5, d=3, banded
    # O(d·n) verify)
    reps2 = spark.range(2).select(F.col("id").alias("rep"))
    pert2 = docs.crossJoin(reps2).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    )
    heads = pert2.filter(F.length("text") >= 80).select(
        "doc_id", F.substring("text", 1, 80).alias("head")
    )
    n2 = heads.count()
    t0 = time.time()
    n_lv = levenshtein_pairs(heads, max_dist=3, q=5).count()
    out["levenshtein_qgram_pairs"] = {
        "docs": n2,
        "pairs": n_lv,
        "sec": round(time.time() - t0, 2),
    }

    # 5) training-data prep ops on mult× documents (unique ids per
    #    replica): split assignment is map-side (should scale ~linearly
    #    with input), stratified sampling and packing are one bounded
    #    window shuffle each, decontamination is a broadcast join whose
    #    probe side is the corpus shingle stream.
    from actuarial_reserve_modelling_spark.operators.textstats import decontaminate
    from actuarial_reserve_modelling_spark.operators.traindata import (
        hash_split,
        pack_sequences,
        stratified_sample,
    )

    repsm = spark.range(mult).select(F.col("id").alias("rep"))
    big_corpus = (
        docs.crossJoin(repsm)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
        )
        .localCheckpoint(eager=True)
    )
    nm = big_corpus.count()

    t0 = time.time()
    n_train = hash_split(big_corpus.select("doc_id")).filter(
        F.col("split") == "train"
    ).count()
    out["hash_split"] = {
        "docs": nm,
        "train": n_train,
        "sec": round(time.time() - t0, 2),
        "docs_per_sec": round(nm / (time.time() - t0)),
    }

    t0 = time.time()
    n_sample = stratified_sample(
        big_corpus.select("doc_id", "lang"), "lang", 0.2
    ).count()
    out["stratified_sample"] = {
        "docs": nm,
        "sampled": n_sample,
        "sec": round(time.time() - t0, 2),
    }

    t0 = time.time()
    packed = pack_sequences(
        big_corpus.select(
            "doc_id",
            "source",
            F.expr("size(filter(split(text, ' '), w -> w != ''))")
            .cast("bigint")
            .alias("tok_cnt"),
        ),
        tok_col="tok_cnt",
        capacity=512,
    )
    n_seqs = packed.agg(F.count_distinct("source", "seq_id")).collect()[0][0]
    out["pack_sequences"] = {
        "docs": nm,
        "sequences": n_seqs,
        "sec": round(time.time() - t0, 2),
    }

    bench_slice = docs.filter(F.col("doc_id") % 101 == 5)
    t0 = time.time()
    n_cont = decontaminate(big_corpus, bench_slice, n=3).count()
    out["decontaminate"] = {
        "docs": nm,
        "contaminated": n_cont,
        "sec": round(time.time() - t0, 2),
        "docs_per_sec": round(nm / (time.time() - t0)),
    }

    # 6) BPE merge training at a production-ish merge count on the
    #    mult× corpus. The incremental pair-count maintenance means a
    #    round's cost tracks the words CONTAINING the merged pair, not
    #    the whole vocabulary — so per-merge cost must FALL as training
    #    proceeds (sub-linear total): compare sec/merge at k=8 vs k=64.
    from actuarial_reserve_modelling_spark.operators.traindata import bpe_train_merges

    t0 = time.time()
    m8 = bpe_train_merges(big_corpus, k=8)
    dt8 = time.time() - t0
    t0 = time.time()
    m64 = bpe_train_merges(big_corpus, k=64)
    dt64 = time.time() - t0
    out["bpe_train_merges"] = {
        "docs": nm,
        "merges_8": len(m8),
        "merges_64": len(m64),
        "sec_8": round(dt8, 2),
        "sec_64": round(dt64, 2),
        "sec_per_merge_8": round(dt8 / max(len(m8), 1), 3),
        "sec_per_merge_64": round(dt64 / max(len(m64), 1), 3),
    }

    # 7) the ANN trio on mult× embeddings: recall@k vs the exact
    #    brute-force baseline and wall per path. Replicated vectors get
    #    a deterministic per-replica perturbation so neighbors aren't
    #    degenerate exact copies.
    from actuarial_reserve_modelling_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivfpq_topk,
        ann_lsh_topk,
        ann_pq_topk,
        cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    repse = spark.range(mult).select(F.col("id").alias("rep"))
    big_emb = (
        emb.crossJoin(repse)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + (F.col("rep") % 7).cast("double") * (i % 5).cast("double") / 500.0,
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    ne = big_emb.count()
    k_ann = 5
    # ~40 queries: every 211th source vector, first four replicas — so
    # the query set spans distinct source vectors AND perturbation
    # variants (a bare modulus on the replicated id collapses to one
    # row: source ids < 2000 keep any large modulus the identity)
    queries = big_emb.filter(
        ((F.col("vec_id") % 10_000_000) % 211 == 3)
        & (F.col("vec_id") < 4 * 10_000_000)
    ).localCheckpoint(eager=True)
    nq = queries.count()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(big_emb, queries, k=k_ann).collect()
    }

    for name, fn in (
        ("ann_lsh", lambda: ann_lsh_topk(big_emb, queries, k=k_ann)),
        # auto = the √n scaling contract (resolve_n_centroids): holds
        # recall as the corpus grows instead of decaying at fixed k
        ("ann_ivf", lambda: ann_ivf_topk(big_emb, queries, k=k_ann, n_centroids="auto", nprobe="auto")),
        ("ann_pq", lambda: ann_pq_topk(big_emb, queries, k=k_ann, rerank=8)),
        (
            "ann_ivfpq",
            lambda: ann_ivfpq_topk(
                big_emb, queries, k=k_ann, n_centroids="auto", nprobe="auto", rerank="auto"
            ),
        ),
    ):
        t0 = time.time()
        got = {(r["query_id"], r["neighbor_id"]) for r in fn().collect()}
        dt = time.time() - t0
        out[name] = {
            "vectors": ne,
            "queries": nq,
            "recall_at_k": round(len(exact & got) / max(len(exact), 1), 3),
            "sec": round(dt, 2),
        }

    # 8) incremental near-dup against a persisted index: the 4×-doc
    #    corpus index is built once; a perturbed 1× batch dedups against
    #    it via the asymmetric banded join (the batch-over-batch
    #    production shape — per-batch cost tracks the batch, not the
    #    corpus).
    from actuarial_reserve_modelling_spark.operators.dedup import (
        build_dedup_index,
        minhash_dedup_against_index,
    )

    idx = build_dedup_index(big_docs, bands=16, rows_per_band=12).localCheckpoint(
        eager=True
    )
    idx.count()
    new_batch = docs.select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit("tail")).alias("text"),
    )
    t0 = time.time()
    n_inc = minhash_dedup_against_index(
        new_batch, idx, threshold=0.95, bands=16, rows_per_band=12
    ).count()
    out["minhash_against_index"] = {
        "index_docs": n_docs,
        "batch_docs": n1,
        "pairs": n_inc,
        "sec": round(time.time() - t0, 2),
    }

    # 9) corpus-curation trio on the mult× corpus: shard shuffle
    #    (hash shuffle + per-shard sort), weighted sampling (top-k, no
    #    global sort), token-budget selection (decomposed prefix sum).
    from actuarial_reserve_modelling_spark.operators.traindata import (
        shuffle_shards,
        token_budget_select,
        weighted_sample,
    )

    t0 = time.time()
    n_sh2 = shuffle_shards(big_corpus.select("doc_id"), n_shards=256).count()
    out["shuffle_shards"] = {"docs": n_sh2, "sec": round(time.time() - t0, 2)}

    sized = big_corpus.select("doc_id", F.length("text").alias("n_chars"))
    t0 = time.time()
    n_ws = weighted_sample(sized, weight_col="n_chars", k=10_000).count()
    out["weighted_sample"] = {
        "docs": nm,
        "sampled": n_ws,
        "sec": round(time.time() - t0, 2),
    }

    budget_in = big_corpus.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.expr("size(filter(split(text, ' '), w -> w != ''))")
        .cast("bigint")
        .alias("n_toks"),
    )
    t0 = time.time()
    n_bud = token_budget_select(
        budget_in, quality_col="n_chars", tokens_col="n_toks", budget=1_000_000
    ).count()
    out["token_budget_select"] = {
        "docs": nm,
        "selected": n_bud,
        "sec": round(time.time() - t0, 2),
    }

    print(json.dumps({"multiplier": mult, "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
