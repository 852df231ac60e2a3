"""Run any registry query by name: show its result and, on request,
the executed physical plan — the quickest way to poke at the engine.

Usage:
  python tools/run_query.py <name> [sf_dir] [--explain] [--limit N]
  python tools/run_query.py --list [substring]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    from actuarial_reserve_modelling_spark.plans.registry import load_all

    registry = load_all()

    if "--list" in flags:
        pat = args[0].lower() if args else ""
        for name, q in sorted(registry.items()):
            if pat in name.lower():
                kind = "oracle" if q.oracle else "rows-only"
                print(f"{name:34s} [{q.survey_rows}] ({kind})")
        return

    if not args:
        print(__doc__)
        sys.exit(2)
    name = args[0]
    if name not in registry:
        close = [n for n in registry if name.lower() in n.lower()]
        print(f"unknown query {name!r}; close matches: {close[:8]}")
        sys.exit(2)
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    limit = 20
    for f in flags:
        if f.startswith("--limit"):
            limit = int(f.split("=", 1)[1]) if "=" in f else 20

    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name=f"arm-run-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry[name].spark_fn(spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(limit, truncate=60)
    print(f"({df.count()} rows total)")


if __name__ == "__main__":
    main()
