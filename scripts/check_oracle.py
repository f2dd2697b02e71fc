#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB over the sfDir tables, normalizes both sides
(columns sorted by name, rows sorted by all columns), and reports
exact / approx equality per query.  Dev-only tool; the shipped Scala
library never uses Python.
"""
import glob
import json
import math
import sys

import duckdb


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def almost(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_bad += 1
            continue
        got_rel = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        exp_rel = con.execute(sql)
        exp_cols = [d[0] for d in exp_rel.description]
        exp = exp_rel.fetchall()
        gc, gr = normalize(got, got_cols)
        ec, er = normalize(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            n_bad += 1
            continue
        exact = gr == er
        diffs = [(a, b) for ra, rb in zip(gr, er) for a, b in zip(ra, rb)
                 if not almost(a, b)]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} cell diffs, e.g. {diffs[:3]}")
            n_bad += 1
        else:
            tag = "exact" if exact else "APPROX-ONLY (hash would differ!)"
            if not exact:
                ne = [(a, b) for ra, rb in zip(gr, er)
                      for a, b in zip(ra, rb) if a != b and almost(a, b)]
                print(f"ok   {name}  [{tag}] e.g. {ne[:3]}")
            else:
                print(f"ok   {name}  [{tag}] rows={len(gr)}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
