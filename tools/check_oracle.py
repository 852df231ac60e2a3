"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names/count,
and the exact multiset of rows (stricter than the driver's value hash —
if this passes, the driver's hash passes).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    ms = Counter(tuple(_norm(r[i]) for i in order) for r in rows)
    return names, ms


_SPARK_TYPE_CAT = {
    "int": "i32",
    "bigint": "i64",
    "smallint": "i16",
    "tinyint": "i8",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "binary": "bin",
}


def _duck_cat(t: str) -> str:
    t = t.upper()
    if t.endswith("[]"):
        return f"array<{_duck_cat(t[:-2])}>"
    return {
        "INTEGER": "i32",
        "BIGINT": "i64",
        "SMALLINT": "i16",
        "TINYINT": "i8",
        "HUGEINT": "i128",
        "UBIGINT": "u64",
        "DOUBLE": "f64",
        "FLOAT": "f32",
        "VARCHAR": "str",
        "BOOLEAN": "bool",
        "DATE": "date",
        "TIMESTAMP": "ts",
        "BLOB": "bin",
    }.get(t.split("(")[0], t.lower())


def _spark_types(sdf) -> dict[str, str]:
    out = {}
    for f in sdf.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("array<") and s.endswith(">"):
            inner = s[6:-1]
            s = f"array<{_SPARK_TYPE_CAT.get(inner, inner)}>"
        else:
            s = _SPARK_TYPE_CAT.get(s, s)
        out[f.name] = s
    return out


def _duck_types(con, sql: str) -> dict[str, str]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: _duck_cat(r[1]) for r in rows}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from actuarial_reserve_modelling_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sn, sm = _canon(scols, srows)
        dn, dm = _canon(dcols, drows)
        if sn != dn:
            failed.append(name)
            print(f"FAIL  {name}: columns differ spark={sn} duckdb={dn}")
            continue
        st, dt = _spark_types(sdf), _duck_types(con, oracles[name])
        tdiff = {c: (st.get(c), dt.get(c)) for c in st if st.get(c) != dt.get(c)}
        if tdiff:
            failed.append(name)
            print(f"FAIL  {name}: column types differ (spark, duckdb): {tdiff}")
            continue
        if len(srows) != len(drows):
            failed.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            continue
        if sm != dm:
            failed.append(name)
            only_s = list((sm - dm).items())[:3]
            only_d = list((dm - sm).items())[:3]
            print(f"FAIL  {name}: values differ; spark-only={only_s} duckdb-only={only_d}")
            continue
        passed.append(name)
        print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n{len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} FAILED"
        + (f": {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
