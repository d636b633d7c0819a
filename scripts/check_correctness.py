"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() in DuckDB at the given sf dir; compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entry_mod
from colbert_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    """Sort columns by name, round floats, sort rows — order-insensitive form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if (not math.isfinite(v)) else round(v, 6)
                v = 0.0 if v == 0 else v  # -0.0 == 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out)), [cols[i] for i in order]


_SPARK_CANON = {
    # pyarrow str(type) names on the right
    "bigint": "int64", "int": "int32", "smallint": "int16", "tinyint": "int8",
    "double": "double", "float": "float", "string": "string",
    "boolean": "bool", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date32[day]", "binary": "binary",
}


def spark_types(sdf):
    return {c: _SPARK_CANON.get(t, t) for c, t in sdf.dtypes}


def duck_types(arrow_tbl):
    """Canonical per-column types from a DuckDB Arrow result. HUGEINT comes
    back as decimal128(38,0) — exactly the mismatch the driver's typed hash
    catches and a value-level compare can't."""
    import pyarrow as pa

    out = {}
    for f in arrow_tbl.schema:
        t = f.type
        if pa.types.is_timestamp(t):
            out[f.name] = "timestamp"
        elif pa.types.is_large_string(t) or pa.types.is_string(t):
            out[f.name] = "string"
        elif pa.types.is_large_binary(t) or pa.types.is_binary(t):
            out[f.name] = "binary"
        else:
            out[f.name] = str(t)
    return out


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # override parallelism to evidence determinism across layouts
    cpus = int(os.environ.get("CHECK_CPUS", "16"))
    spark = get_spark(app_name="correctness", cpus=cpus,
                      shuffle_partitions=cpus)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        finally:
            # operators pin MEMORY_AND_DISK caches via caching.register;
            # release them so 90+ entries don't accumulate resident caches
            from colbert_spark import caching as _caching
            _caching.drain()
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            atbl = res.arrow()
            ocols = atbl.column_names
            orows = [tuple(r.values()) for r in atbl.to_pylist()]
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            continue
        st, ot = spark_types(sdf), duck_types(atbl)
        tdiff = {c: (st.get(c), ot.get(c))
                 for c in set(st) | set(ot) if st.get(c) != ot.get(c)}
        if tdiff:
            failures.append((name, f"types: {tdiff}"))
            print(f"FAIL  {name}: type mismatch (spark, oracle): {tdiff}")
            continue
        sn, sc = normalize([tuple(r) for r in srows], scols)
        on, oc = normalize(orows, ocols)
        if sc != oc:
            failures.append((name, f"schema: spark={sc} oracle={oc}"))
            print(f"FAIL  {name}: schema mismatch spark={sc} oracle={oc}")
        elif len(sn) != len(on):
            failures.append((name, f"rows: spark={len(sn)} oracle={len(on)}"))
            print(f"FAIL  {name}: row count spark={len(sn)} oracle={len(on)}")
        elif sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            failures.append((name, f"values: {diff}"))
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"OK    {name}: {len(sn)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("ALL OK")
    spark.stop()


if __name__ == "__main__":
    main()
