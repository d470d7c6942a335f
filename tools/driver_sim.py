"""Strict simulation of the external correctness driver.

Unlike tools/verify_parity.py (which goes through the package's own
``session.get_spark`` and stringifies datetimes), this loads
``__spark_entry__.py`` via importlib with a PLAIN SparkSession — exactly
what the external gate does — runs ``entry(spark)`` plus every
``queries()`` entry at the given SF dir, and compares each result to its
``oracle_sql()`` SQL run in DuckDB with RAW value equality (no
stringification; rows sorted by all columns, columns sorted by name).

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.getcwd())

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _hashable(v):
    # list/ndarray cells (array columns) are unsortable/uncomparable as-is
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_hashable(x) for x in v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_hashable)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cell_equal(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    a, b = _hashable(a), _hashable(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cell_equal(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    mod = load_entry()
    edf = mod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows, schema={[f.name for f in edf.schema.fields]}")

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            continue
        if len(sdf) != len(odf) or sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(
                f"FAIL {name}: shape spark=({len(sdf)},{sorted(sdf.columns)}) "
                f"duckdb=({len(odf)},{sorted(odf.columns)})"
            )
            continue
        s, o = canon(sdf), canon(odf)
        bad = None
        for c in s.columns:
            sc, oc = s[c], o[c]
            for i in range(len(s)):
                if not cell_equal(sc.iloc[i], oc.iloc[i]):
                    bad = (c, i, sc.iloc[i], oc.iloc[i])
                    break
            if bad:
                break
        if bad:
            failures.append(name)
            print(
                f"FAIL {name}: value col={bad[0]} row={bad[1]} "
                f"spark={bad[2]!r} duckdb={bad[3]!r}"
            )
        else:
            print(f"PASS {name} ({len(s)} rows)")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
