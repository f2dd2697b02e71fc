#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
       python3 scripts/check_oracle.py --selftest

Loads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB over the sfDir tables, normalizes both sides
(columns sorted by name, rows sorted by all columns), and reports
exact / approx equality per query.

Besides values, the RESULT TYPES are compared column-by-column: the driver's
hash covers the value's type width, so DuckDB HUGEINT 361 vs Spark BIGINT 361
is a hash mismatch even though the fetched Python ints compare equal (this is
exactly what made q12_priority_shipping pass here and fail at the gate in
r12).  An explicit ALLOW map lists the (spark, oracle) type pairs that the
driver's hash has been observed to treat as identical; anything else differing
is a FAIL.

Dev-only tool; the shipped Scala library never uses Python.
"""
import glob
import json
import math
import os
import sys
import tempfile

import duckdb

# (spark_type, oracle_type) pairs the driver's hash demonstrably tolerates.
# Keep this list EMPTY unless a query with exactly this divergence has been
# green in a driver CORRECTNESS_r*.json — i.e. the widening is proven benign.
# A set of (spark_type, oracle_type) tuples — set(), not {}: the empty dict
# literal reads as "mapping pair -> reason" and invites a `pair: reason`
# entry that would silently change membership semantics.
ALLOW_TYPE_PAIRS = set()  # r1-r13: no proven-benign widenings; add tuples only



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


def rel_schema(rel):
    """[(col, type_str)] for a DuckDB relation."""
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def type_mismatches(got_schema, exp_schema):
    """Compare types BY COLUMN NAME. Positional zip over name-sorted schemas
    breaks on duplicate column names (types pair against the wrong column);
    a duplicate name is itself a defect — the driver's sort-by-name hash
    cannot disambiguate it — so fail loudly on it instead."""
    gnames = [c for c, _ in got_schema]
    enames = [c for c, _ in exp_schema]
    if len(set(gnames)) != len(gnames) or len(set(enames)) != len(enames):
        return [("<duplicate column names>",
                 ",".join(sorted(gnames)), ",".join(sorted(enames)))]
    gmap = dict(got_schema)
    emap = dict(exp_schema)
    bad = []
    for ec, et in exp_schema:
        gt = gmap.get(ec)
        if gt is None:
            # a column the oracle produced but Spark dropped is itself a
            # schema defect — report it here instead of relying on the row
            # hash to catch it indirectly
            bad.append((ec, "<missing in spark result>", et))
        elif gt != et and (gt, et) not in ALLOW_TYPE_PAIRS:
            bad.append((ec, gt, et))
    for gc, gt in got_schema:
        if gc not in emap:
            bad.append((gc, gt, "<missing in oracle result>"))
    return bad


def compare_one(con, name, sql, files):
    """Returns (ok: bool, message: str)."""
    got_rel = con.sql(
        "SELECT * FROM read_parquet([" +
        ",".join(f"'{f}'" for f in files) + "])")
    exp_rel = con.sql(sql)
    got_schema = sorted(rel_schema(got_rel))
    exp_schema = sorted(rel_schema(exp_rel))
    got = got_rel.fetchall()
    exp = exp_rel.fetchall()
    gc, gr = normalize(got, got_rel.columns)
    ec, er = normalize(exp, exp_rel.columns)
    if gc != ec:
        return False, f"columns differ spark={gc} oracle={ec}"
    tbad = type_mismatches(got_schema, exp_schema)
    if tbad:
        return False, ("TYPE mismatch (driver hash covers type width!) " +
                       ", ".join(f"{c}: spark={g} oracle={e}"
                                 for c, g, e in tbad))
    if len(gr) != len(er):
        return False, f"rows {len(gr)} vs {len(er)}"
    exact = gr == er
    diffs = [(a, b) for ra, rb in zip(gr, er) for a, b in zip(ra, rb)
             if not almost(a, b)]
    if diffs:
        return False, f"{len(diffs)} cell diffs, e.g. {diffs[:3]}"
    if exact:
        return True, f"[exact] rows={len(gr)}"
    ne = [(a, b) for ra, rb in zip(gr, er)
          for a, b in zip(ra, rb) if a != b and almost(a, b)]
    return True, f"[APPROX-ONLY (hash would differ!)] e.g. {ne[:3]}"


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
        ok, msg = compare_one(con, name, sql, files)
        if ok:
            print(f"ok   {name}  {msg}")
            n_ok += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


def selftest():
    """The r12 regression: an uncast sum(CASE ...) (HUGEINT) must be flagged
    against a Spark BIGINT result even though the values are identical."""
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "part-0.parquet")
        # Spark writes sum(long) as int64 -> BIGINT when read back.
        con.execute(
            "COPY (SELECT CAST(3 AS BIGINT) AS high_cnt) TO '" + f +
            "' (FORMAT parquet)")
        uncast = ("SELECT sum(CASE WHEN 1=1 THEN 1 ELSE 0 END) AS high_cnt"
                  " FROM range(3)")
        cast = ("SELECT CAST(sum(CASE WHEN 1=1 THEN 1 ELSE 0 END) AS BIGINT)"
                " AS high_cnt FROM range(3)")
        ok_uncast, msg = compare_one(con, "fixture_uncast", uncast, [f])
        assert not ok_uncast and "TYPE mismatch" in msg, (
            "self-test FAILED: uncast HUGEINT oracle was not flagged: " + msg)
        ok_cast, msg2 = compare_one(con, "fixture_cast", cast, [f])
        assert ok_cast, "self-test FAILED on cast fixture: " + msg2
    print("selftest ok: uncast sum(CASE...) flagged as TYPE mismatch; "
          "cast fixture passes")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
