"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf and compare against
oracle_sql() via DuckDB — row count, schema (sorted column names), and an
order-insensitive value comparison (sorted rows, exact after the queries'
own rounding).

Usage: python scripts/check_oracles.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("object").astype("float64") if s.isna().any() else s.astype("bool")
        elif s.dtype == object:
            # bools with NULLs come back as object from duckdb
            try:
                pdf[c] = s.astype("float64")
            except (ValueError, TypeError):
                pass
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"schema: {sorted(got.columns)} vs {sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"rowcount: {len(got)} vs {len(exp)}")
        return errs
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(e[c]):
            gv = np.asarray(gv, dtype="float64")
            ev = np.asarray(ev, dtype="float64")
            bad = ~((gv == ev) | (np.isnan(gv) & np.isnan(ev)))
        else:
            bad = ~((gv == ev) | (pd.isna(gv) & pd.isna(ev)))
        if bad.any():
            i = int(np.argmax(bad))
            errs.append(f"col {c}: {int(bad.sum())} mismatches, first at row {i}: {gv[i]!r} vs {ev[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from more_pattern_extraction_spark.session import get_spark

    spark = get_spark("check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"ROWS {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        errs = compare(name, got, exp)
        if errs:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for e in errs[:4]:
                print(f"     {e}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
