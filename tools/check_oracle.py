#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs like the driver: for each query output parquet under OUTDIR
(produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`), executes the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
tables, then compares: row count, column names (sorted), and values
(rows sorted by all columns, columns sorted by name). Reports exact
mismatches and float-tolerance-only mismatches separately so we can see
whether a failure is semantic or last-ulp.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="first")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        exact = True
        close = True
        for c in g.columns:
            a, b = g[c], w[c]
            # The driver's hash is dtype-sensitive: an int64 Spark column
            # vs a float64 oracle column (e.g. DuckDB SUM(BIGINT) ->
            # HUGEINT -> pandas float64) hash-mismatches even when every
            # value is equal. Flag any int-vs-float dtype-KIND mismatch
            # as a hard FAIL before the float-tolerance branch can mask it.
            kinds = {a.dtype.kind, b.dtype.kind}
            if "f" in kinds and kinds & {"i", "u"}:
                exact = False
                close = False
                print(f"  col {c}: dtype-kind mismatch spark={a.dtype} "
                      f"oracle={b.dtype} (driver hash is dtype-sensitive; "
                      f"CAST the oracle expression)")
                continue
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                same_na = af.isna().equals(bf.isna())
                eq = same_na and ((af == bf) | (af.isna() & bf.isna())).all()
                if not eq:
                    exact = False
                    import numpy as np
                    if not (same_na and np.allclose(af.fillna(0), bf.fillna(0),
                                                    rtol=1e-9, atol=1e-9)):
                        close = False
                        print(f"  col {c}: max abs diff "
                              f"{(af.fillna(0) - bf.fillna(0)).abs().max()}")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    exact = False
                    close = False
                    d = (a.astype(str) != b.astype(str))
                    i = d[d].index[0]
                    print(f"  col {c}: first diff at row {i}: "
                          f"{a[i]!r} != {b[i]!r}")
        if exact:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif close:
            print(f"WARN {name}: float-only mismatch (within 1e-9) "
                  f"— may still fail driver hash")
            n_fail += 1
        else:
            print(f"FAIL {name}: value mismatch")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
