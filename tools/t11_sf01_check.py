"""One-off sf0.1 verification of t11_neardup_ingest_gate (VERDICT r6
task 7): the registry's DuckDB replay oracle is sf0.01-only because its
exact all-pairs shared-word CTE spills DuckDB's disk at 5,000 docs, so
the 10×-gate evidence comes from this independent pure-Python replay
instead — same contract as the pytest reference
(tests/test_streaming.py::test_incremental_neardup_ingest_matches_reference)
made tractable at 5,000 docs by an EXACT candidate pre-filter:

    J(A,B) >= τ  ⇒  |A∩B| >= τ·|A∪B|  and  |A| >= |A∩B|, |A∪B| >= |B|
              ⇒  min(|A|,|B|) / max(|A|,|B|) >= τ

so pairs whose distinct-token counts differ by more than the τ ratio
cannot reach the threshold and are skipped without computing the
intersection. The filter uses τ' = 0.9499 (< τ = 0.95) so pairs whose
true Jaccard rounds UP to 0.95 at 6 dp are never excluded. Within a
size-compatible pair the exact Jaccard (half-up 6 dp, matching
F.round) is computed as in the pytest reference.

Usage: python tools/t11_sf01_check.py [sf_dir]   (default sf0.1)
Prints PASS/FAIL with set differences; exit 0 only on PASS.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fingerprint(t: str) -> str:
    norm = re.sub(r"\s+", " ", t.strip().lower())
    return hashlib.md5(norm.encode()).hexdigest()[:16]


def toks(t: str) -> frozenset[str]:
    return frozenset(w for w in t.split(" ") if w)


def jac6(a: frozenset, b: frozenset) -> float | None:
    u = len(a | b)
    if u == 0:
        return None
    j = len(a & b) / u
    return math.floor(j * 1e6 + 0.5) / 1e6  # half-up like F.round


def size_compatible(a: frozenset, b: frozenset, tau_guard: float) -> bool:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return False
    return min(la, lb) / max(la, lb) >= tau_guard


def replay(rows: list[tuple[int, str]], tau: float = 0.95) -> set[tuple[int, int]]:
    tau_guard = 0.9499
    by_batch: list[list[tuple[int, str]]] = [[], [], []]
    for d, t in rows:
        by_batch[d % 3].append((d, t))

    seen_fps: set[str] = set()
    admitted_sets: list[frozenset] = []
    expect: set[tuple[int, int]] = set()
    for bid in range(3):
        batch = sorted(by_batch[bid])
        first, batch_fps = [], set()
        for d, t in batch:
            fp = fingerprint(t)
            if fp in batch_fps or fp in seen_fps:
                continue
            batch_fps.add(fp)
            first.append((d, t))
        parent = {d: d for d, _ in first}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        tsets = {d: toks(t) for d, t in first}
        ids = [d for d, _ in first]
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                a, b = ids[i], ids[k]
                if not size_compatible(tsets[a], tsets[b], tau_guard):
                    continue
                j = jac6(tsets[a], tsets[b])
                if j is not None and j >= tau:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        reps = [(d, t) for d, t in first if find(d) == d]
        admitted_now = []
        for d, t in reps:
            ts = tsets[d]
            hit = any(
                size_compatible(ts, s, tau_guard) and (jac6(ts, s) or 0) >= tau
                for s in admitted_sets
            )
            if not hit:
                admitted_now.append((d, t))
        for d, t in admitted_now:
            seen_fps.add(fingerprint(t))
            s = toks(t)
            if s:
                admitted_sets.append(s)
            expect.add((d, bid))
    return expect


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from actuarial_reserve_modelling_spark.catalog import load_table
    from actuarial_reserve_modelling_spark.session import get_spark
    from actuarial_reserve_modelling_spark.streaming.pipeline import (
        incremental_neardup_ingest,
    )

    spark = get_spark(app_name="t11-sf01-check")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    t0 = time.time()
    got = {
        (r["doc_id"], r["batch"])
        for r in incremental_neardup_ingest(
            spark, batches, cache_key=f"t11check_{os.path.basename(sf_dir)}",
            threshold=0.95,
        ).collect()
    }
    spark_s = time.time() - t0
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    t0 = time.time()
    expect = replay(rows)
    ref_s = time.time() - t0
    if got == expect:
        print(
            f"PASS  t11 @ {sf_dir}: {len(got)} admitted rows match the "
            f"independent replay exactly (spark {spark_s:.1f}s, ref {ref_s:.1f}s)"
        )
        sys.exit(0)
    print(f"FAIL  t11 @ {sf_dir}")
    print("  spark-only:", sorted(got - expect)[:20])
    print("  ref-only:  ", sorted(expect - got)[:20])
    sys.exit(1)


if __name__ == "__main__":
    main()
