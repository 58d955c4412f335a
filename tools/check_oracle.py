#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: run the oracle SQL in DuckDB over the
same parquet tables, load the Spark result parquet, canonicalize (sort columns
by name, sort rows), and compare values. Dev-only helper — not part of the
shipped library (driver-side python is allowed for tooling, not for the
engine itself).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.17g}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want_rel = con.sql(sql)
            want_cols = sorted(want_rel.columns)
            want = want_rel.df()[want_cols].itertuples(index=False, name=None)
            got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = got_rel.df()[got_cols].itertuples(index=False, name=None)
            if want_cols != got_cols:
                print(f"FAIL {name}: columns want={want_cols} got={got_cols}")
                n_bad += 1
                continue
            cw, cg = canon(want), canon(got)
            if cw == cg:
                print(f"ok   {name} ({len(cw)} rows)")
                n_ok += 1
            else:
                n_bad += 1
                print(f"FAIL {name}: rows want={len(cw)} got={len(cg)}")
                for a, b in list(zip(cw, cg))[:200]:
                    if a != b:
                        print(f"  want {a}\n  got  {b}")
                        break
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
