"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
SF, compares row count, column names, dtypes, and exact values (rows sorted
by all columns, columns sorted by name). Exits nonzero on any mismatch.

Usage: python tools/verify_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from funnel_report_etl_pipeline__spark.plans.registry import load_all  # noqa: E402
from funnel_report_etl_pipeline__spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):  # NaN, NaT, None — all null-equal
            return True
    except (TypeError, ValueError):
        pass
    return a == b  # exact otherwise — the driver hash-compares


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark()
    specs = load_all()
    failures = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(sdf)} duckdb={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            continue
        s, o = normalize(sdf), normalize(odf)
        st = {c: str(s[c].dtype) for c in s.columns}
        ot = {c: str(o[c].dtype) for c in o.columns}
        bad = None
        for c in s.columns:
            for i in range(len(s)):
                if not values_equal(s[c].iloc[i], o[c].iloc[i]):
                    bad = (c, i, s[c].iloc[i], o[c].iloc[i])
                    break
            if bad:
                break
        dtype_note = ""
        if st != ot:
            dtype_note = "  [dtypes differ: " + str({k: (st[k], ot[k]) for k in st if st[k] != ot[k]}) + "]"
        if bad:
            failures.append(name)
            print(f"FAIL {name}: value mismatch col={bad[0]} row={bad[1]} spark={bad[2]!r} duckdb={bad[3]!r}{dtype_note}")
        else:
            print(f"PASS {name} ({len(s)} rows){dtype_note}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
