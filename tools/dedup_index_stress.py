"""Persisted-dedup-tier stress (r11, pairs with the banded lookup
projection): build + persist the fingerprint tier at a sweep of corpus
sizes, then ingest the SAME fixed-size batch against each and record,
per corpus size,

* the index bytes BEHIND the batch's pruned reads — the batch's
  (band, bpart) banded directories plus the candidates' fingerprint
  id-hash buckets, i.e. the ceiling on index bytes the pruned lookup
  can touch (the pre-r11 operator re-banded the WHOLE index per batch);
* the wall of ``minhash_dedup_against_index_persisted`` vs the
  full-scan ``minhash_dedup_against_index`` twin;
* planted-twin exactness (every twin must pair with its source at
  jac=1.0, and nothing else at τ=0.95) and pruned==full answers.

Acceptance curve: touched-bytes stays ~flat as the corpus grows
(auto-sized directory counts grow with the corpus, so a fixed batch's
touched fraction shrinks), while the full-scan twin's cost grows with
the corpus.

Usage: python tools/dedup_index_stress.py [batch_docs] [n ...]
(defaults: 200 32000 128000 512000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANDS, ROWS_PER_BAND = 16, 16
VOCAB = 50_000
DOC_TOKENS = 30


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.startswith("_"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sizes = [int(a) for a in sys.argv[2:]] or [32_000, 128_000, 512_000]

    from pyspark.sql import functions as F

    from actuarial_reserve_modelling_spark.operators.dedup import (
        _banded_projection,
        build_dedup_index,
        load_dedup_index,
        minhash_dedup_against_index,
        minhash_dedup_against_index_persisted,
        persist_dedup_index,
        read_dedup_index_meta,
    )
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def synth_docs(ids, salt: int):
        # deterministic JVM-side docs: DOC_TOKENS words from a VOCAB-word
        # vocabulary, word choice keyed on (salt, doc_id, position)
        return ids.select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.expr(
                    f"transform(sequence(1, {DOC_TOKENS}), "
                    f"j -> concat('w', pmod(xxhash64({salt}, id, j), {VOCAB})))"
                ),
                " ",
            ).alias("text"),
        )

    rows = []
    for n in sizes:
        corpus = synth_docs(spark.range(n), salt=1).repartition(32)
        # fixed batch: half exact twins of evenly-spread corpus docs
        # (id + 10M, same salt-1 text via id mapping), half fresh docs
        n_twin = batch_docs // 2
        step = max(1, n // n_twin)
        src = list(range(0, n, step))[:n_twin]
        twins = synth_docs(
            spark.range(n).filter(F.col("id").isin(src)), salt=1
        ).select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        fresh = synth_docs(
            spark.range(20_000_000, 20_000_000 + (batch_docs - n_twin)), salt=2
        )
        batch = twins.unionByName(fresh).localCheckpoint()

        d = tempfile.mkdtemp(prefix="arm_dedup_stress_") + "/idx"
        t0 = time.time()
        base = build_dedup_index(corpus, bands=BANDS, rows_per_band=ROWS_PER_BAND)
        persist_dedup_index(base, d, bands=BANDS, rows_per_band=ROWS_PER_BAND)
        t_persist = time.time() - t0
        meta = read_dedup_index_meta(spark, d)

        t0 = time.time()
        found_pruned = {
            (r["new_id"], r["index_id"], r["jac"])
            for r in minhash_dedup_against_index_persisted(
                spark, d, batch, threshold=0.95, route="pruned"
            ).collect()
        }
        t_pruned = time.time() - t0

        # r12 adaptive router: must match whichever twin it picked and
        # land at the better twin's wall
        t0 = time.time()
        found_routed = {
            (r["new_id"], r["index_id"], r["jac"])
            for r in minhash_dedup_against_index_persisted(
                spark, d, batch, threshold=0.95, route="auto"
            ).collect()
        }
        t_routed = time.time() - t0

        t0 = time.time()
        found_full = {
            (r["new_id"], r["index_id"], r["jac"])
            for r in minhash_dedup_against_index(
                batch,
                load_dedup_index(spark, d),
                threshold=0.95,
                bands=BANDS,
                rows_per_band=ROWS_PER_BAND,
            ).collect()
        }
        t_full = time.time() - t0

        want = {(s + 10_000_000, s, 1.0) for s in src}

        # bytes behind the pruned reads: the batch's own (band, bpart)
        # directories + the matched candidates' id-hash buckets — the
        # ceiling on index bytes the pruned lookup can touch
        bidx = build_dedup_index(batch, bands=BANDS, rows_per_band=ROWS_PER_BAND)
        bparts = {
            int(r["bpart"])
            for r in _banded_projection(
                bidx, BANDS, ROWS_PER_BAND, meta["k_band_parts"]
            )
            .select("bpart")
            .distinct()
            .collect()
        }
        banded_touched = sum(
            _dir_bytes(f"{d}/banded/bpart={p}")
            for p in bparts
            if os.path.isdir(f"{d}/banded/bpart={p}")
        )
        cparts = {
            int(r["part"])
            for r in spark.createDataFrame(
                [(i,) for _, i, _ in found_pruned], "doc_id long"
            )
            .select(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(meta["n_buckets"]))
                .cast("int")
                .alias("part")
            )
            .distinct()
            .collect()
        } if found_pruned else set()
        fp_touched = sum(
            _dir_bytes(f"{d}/fingerprints/part={p}")
            for p in cparts
            if os.path.isdir(f"{d}/fingerprints/part={p}")
        )
        banded_total = _dir_bytes(d + "/banded")
        fp_total = _dir_bytes(d + "/fingerprints")

        rows.append(
            {
                "corpus_docs": n,
                "batch_docs": batch_docs,
                "n_buckets": meta["n_buckets"],
                "k_band_parts": meta["k_band_parts"],
                "persist_sec": round(t_persist, 2),
                "lookup_pruned_sec": round(t_pruned, 2),
                "lookup_full_sec": round(t_full, 2),
                "banded_touched_mb": round(banded_touched / 1e6, 2),
                "banded_total_mb": round(banded_total / 1e6, 2),
                "fp_touched_mb": round(fp_touched / 1e6, 2),
                "fp_total_mb": round(fp_total / 1e6, 2),
                "touched_fraction": round(
                    (banded_touched + fp_touched) / max(1, banded_total + fp_total),
                    4,
                ),
                "lookup_routed_sec": round(t_routed, 2),
                "pruned_equals_full": found_pruned == found_full,
                "routed_equals_full": found_routed == found_full,
                "twins_exact": found_pruned == want,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
