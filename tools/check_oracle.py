#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--subset]

--subset: only report queries whose spark output exists (for Verify runs
restricted to a query subset) — missing outputs are counted but silent.

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with the sfDir tables
registered as views, sorts columns by name, and compares row-by-row.
Reports exact mismatches and float-tolerance-only matches separately.
"""
import json
import math
import sys
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads


def norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    return (type(v).__name__, str(v))


def close(a, b):
    if a == b:
        return True
    try:
        fa, fb = float(a[1]), float(b[1])
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    except (ValueError, TypeError):
        return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subset = "--subset" in sys.argv[3:]
    n_missing = 0
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_warn = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_tbl = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            if subset:
                n_missing += 1
            else:
                print(f"FAIL {name}: no spark output ({e})")
                n_fail += 1
            continue
        try:
            exp_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got_cols = sorted(got_tbl.column_names)
        exp_cols = sorted(exp_tbl.column_names)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        got = [[norm(v) for v in row]
               for row in zip(*[got_tbl.column(c).to_pylist() for c in got_cols])]
        exp = [[norm(v) for v in row]
               for row in zip(*[exp_tbl.column(c).to_pylist() for c in exp_cols])]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        exact = got == exp
        if exact:
            print(f"PASS {name}: {len(got)} rows exact")
            n_pass += 1
            continue
        # row-order-insensitive + float-tolerant diagnosis
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if g != e and not all(close(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad is None:
            print(f"WARN {name}: {len(got)} rows match only with float tolerance")
            n_warn += 1
        else:
            i, g, e = bad
            if sorted(map(tuple, map(lambda r: tuple(map(tuple, r)), got))) == \
               sorted(map(tuple, map(lambda r: tuple(map(tuple, r)), exp))):
                print(f"FAIL {name}: same multiset, row ORDER differs at {i}")
            else:
                print(f"FAIL {name}: row {i}\n  spark : {g}\n  oracle: {e}")
            n_fail += 1
    skipped = f", {n_missing} not dumped (subset)" if n_missing else ""
    print(f"\n{n_pass} pass, {n_warn} float-tolerance, {n_fail} fail{skipped}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
