#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs each oracle SQL in DuckDB over the same parquet tables and compares with
the parquet output of `graft.Verify` (run separately via sbt). Comparison:
sort columns by name, sort rows by all columns, compare schema-ish dtypes and
values (exact for ints/strings/bools, bit-exact for floats).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(sf_dir: str, out_dir: str) -> list:
    """Run the oracle compare; return the sorted list of failing query names.

    Split out of main() so tools/adversarial_corpus.py --gate can diff the
    observed divergence set against its documented allowlist (VERDICT r11
    ask #4) instead of parsing stdout.
    """
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            expected = canon(con.sql(sql).df())
            got = canon(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(expected.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expected.columns)}")
            failed.append(name)
            continue
        if len(expected) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expected)}")
            failed.append(name)
            continue
        mismatched = []
        kind_mismatch = []
        for c in expected.columns:
            e, g = expected[c], got[c]
            # The driver hashes canonical *renderings*, so an int64 vs float64
            # kind mismatch (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64 vs
            # Spark long) fails there even when values are numerically equal.
            # Mirror that: a numeric kind mismatch is a hard failure here too
            # (this is exactly how the r7 mixture oracles shipped red).
            numeric = "iuf"
            if (e.dtype.kind in numeric and g.dtype.kind in numeric
                    and (e.dtype.kind == "f") != (g.dtype.kind == "f")):
                kind_mismatch.append(f"{c} (duckdb {e.dtype} vs spark {g.dtype})")
                continue
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                ok = (e.astype(float).fillna(-1e308) == g.astype(float).fillna(-1e308)).all()
            else:
                ok = (e.astype(str) == g.astype(str)).all()
            if not ok:
                mismatched.append(c)
        if kind_mismatch:
            print(f"FAIL {name}: dtype-kind mismatch: {kind_mismatch}")
            failed.append(name)
            continue
        if mismatched:
            print(f"FAIL {name}: value mismatch in columns {mismatched}")
            for c in mismatched[:3]:
                diff = expected[c] != got[c]
                idx = diff[diff].index[:5]
                for i in idx:
                    print(f"   row {i}: duckdb={expected[c][i]!r} spark={got[c][i]!r}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{'ALL GREEN' if not failed else f'{len(failed)} FAILURES'} "
          f"({len(oracle)} oracle queries)")
    return failed


def main(sf_dir: str, out_dir: str) -> int:
    return 1 if compare(sf_dir, out_dir) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
