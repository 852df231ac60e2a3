"""One-off sf0.1 verification of l45_curation_pipeline (VERDICT r11
task 4 "exact at sf0.1"): the registry's DuckDB oracle replays the
chain exactly but its near-dup stage is the exact all-pairs shared-word
CTE, which spills DuckDB's disk at 5,000 docs (the documented sf0.01
limit of the t11-family oracles — see tools/t11_sf01_check.py). The
10×-scale evidence therefore comes from this independent pure-Python
replay of the WHOLE chain: clean → exact first-wins → near-dup cluster
representatives (exact Jaccard with the size-ratio pre-filter) →
3-gram benchmark decontamination → temperature mixture weights
(alpha = 0.3) → epoch repetition plan → 16-way deterministic shard
shuffle. Every md5/rounding convention matches the Spark operators
bit-for-bit (half-up 6 dp rounding; 15-hex-digit md5 prefixes).

Usage: python tools/l45_sf01_check.py [sf_dir]   (default sf0.1)
Prints PASS/FAIL with row differences; exit 0 only on PASS.
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

TWO60 = float(1 << 60)


def r6(x: float) -> float:
    """F.round half-up at 6 dp (positive inputs only here)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def clean(t: str) -> str:
    """operators/textstats.py::clean_text, replayed in Python re."""
    t = t.lower()
    t = re.sub(r"[\x00-\x1f]", " ", t)
    t = re.sub(r"https?://[^ ]+", "<url>", t)
    t = re.sub(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<email>", t)
    t = re.sub(r"\s+", " ", t)
    return t.strip()


def fingerprint(t: str) -> str:
    norm = re.sub(r"\s+", " ", t.strip().lower())
    return hashlib.md5(norm.encode()).hexdigest()[:16]


def toks(t: str) -> list[str]:
    return [w for w in t.split(" ") if w]


def jac6(a: frozenset, b: frozenset) -> float | None:
    u = len(a | b)
    if u == 0:
        return None
    return math.floor(len(a & b) / u * 1e6 + 0.5) / 1e6


def md5num(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def replay(rows: list[tuple[int, str, str]]) -> set[tuple]:
    tau, tau_guard = 0.95, 0.9499
    # 1) clean
    cleaned = sorted((d, clean(t), lang) for d, t, lang in rows)
    # 2a) exact first-wins on the normalized fingerprint
    seen_fp: set[str] = set()
    ex: list[tuple[int, str, str]] = []
    for d, t, lang in cleaned:
        fp = fingerprint(t)
        if fp in seen_fp:
            continue
        seen_fp.add(fp)
        ex.append((d, t, lang))
    # 2b) near-dup cluster representatives (exact Jaccard >= tau with
    #     the size-ratio pre-filter; union-find, min-id representative)
    tsets = {d: frozenset(toks(t)) for d, t, _ in ex}
    ids = [d for d, _, _ in ex]
    parent = {d: d for d in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # O(n²) sweep with the exact size-ratio pre-filter (t11 tool):
    # J >= tau ⇒ min(|A|,|B|)/max(|A|,|B|) >= tau; guard at 0.9499 so
    # pairs rounding UP to 0.95 at 6 dp are never excluded
    lens = {d: len(tsets[d]) for d in ids}
    for i, a in enumerate(ids):
        la = lens[a]
        if la == 0:
            continue
        for b in ids[i + 1 :]:
            lb = lens[b]
            if lb == 0 or min(la, lb) / max(la, lb) < tau_guard:
                continue
            j = jac6(tsets[a], tsets[b])
            if j is not None and j >= tau:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    admitted = [(d, t, lang) for d, t, lang in ex if find(d) == d]
    # 3) decontamination: 3-gram shingles vs the bench slice
    def shingles(t: str) -> set[str]:
        ws = toks(t)
        return {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        } if len(ws) >= 3 else set()

    bench_sh: set[str] = set()
    for d, t, _ in admitted:
        if d % 101 == 5:
            bench_sh |= shingles(t)
    final = [
        (d, t, lang)
        for d, t, lang in admitted
        if d % 101 != 5 and not (shingles(t) & bench_sh)
    ]
    # 4) temperature mixture weights (alpha 0.3, rounded 6 dp)
    ntok: dict[str, int] = {}
    for _, t, lang in final:
        ntok[lang] = ntok.get(lang, 0) + len(toks(t))
    total = sum(ntok.values())
    scaled = {
        g: (math.pow(n / total, 0.3) if n > 0 else 0.0) for g, n in ntok.items()
    }
    norm = sum(scaled[g] for g in sorted(scaled))
    weight = {
        g: (r6((scaled[g] / norm) / (ntok[g] / total)) if ntok[g] > 0 else 0.0)
        for g in ntok
    }
    # 5) epoch repetition plan (md5 stochastic rounding, salt 42)
    out: set[tuple] = set()
    keyed: list[tuple[int, str]] = []
    plan: dict[str, tuple] = {}
    for d, _t, lang in final:
        w = weight[lang]
        u = (md5num(f"{d}:42") + 1.0) / TWO60
        n = int(math.floor(w)) + (1 if u < w - math.floor(w) else 0)
        if n < 1:
            continue
        for rep in range(1, n + 1):
            rk = f"{d}#{rep}"
            plan[rk] = (d, lang, n, rep)
            keyed.append((md5num(rk + ":42"), rk))
    # 6) shard shuffle: shard = keynum % 16, pos by (keynum, rep_key)
    by_shard: dict[int, list[tuple[int, str]]] = {}
    for kn, rk in keyed:
        by_shard.setdefault(kn % 16, []).append((kn, rk))
    for shard, members in by_shard.items():
        for pos, (_kn, rk) in enumerate(sorted(members)):
            d, lang, n, rep = plan[rk]
            out.add((d, lang, n, rep, shard, pos))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from actuarial_reserve_modelling_spark.catalog import load_table
    from actuarial_reserve_modelling_spark.plans.registry import load_all
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="l45-sf01-check")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    got = {
        (r["doc_id"], r["domain"], r["n_repeats"], r["rep_idx"], r["shard"], r["pos"])
        for r in load_all()["l45_curation_pipeline"].spark_fn(spark, sf_dir).collect()
    }
    spark_s = time.time() - t0
    docs = load_table(spark, sf_dir, "documents")
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()]
    t0 = time.time()
    expect = replay(rows)
    ref_s = time.time() - t0
    if got == expect:
        print(
            f"PASS  l45 @ {sf_dir}: {len(got)} epoch-manifest rows match the "
            f"independent replay exactly (spark {spark_s:.1f}s, ref {ref_s:.1f}s)"
        )
        sys.exit(0)
    print(f"FAIL  l45 @ {sf_dir}: spark {len(got)} rows, replay {len(expect)}")
    print("  spark-only:", sorted(got - expect)[:10])
    print("  ref-only:  ", sorted(expect - got)[:10])
    sys.exit(1)


if __name__ == "__main__":
    main()
