#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify first,
then this script compares each <outDir>/<name> parquet against the DuckDB
oracle SQL in <outDir>/oracle_sql.json executed over <sfDir>'s tables.

Usage: python3 tools/check.py <outDir> <sfDir>

Dev-only tool (driver-side python libs); NOT part of the Scala library.
"""
import json, sys, math
import duckdb

def canon(rows, cols):
    """sort columns by name, then rows; stringify for comparison"""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [sorted(cols)] + out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            # the driver's compare is dataframe-based: DuckDB HUGEINT
            # (SUM over ints) arrives as decimal128(38,0)/float64 there
            # and hash-mismatches Spark's int64 even on equal values.
            # fetchall() masks this (python ints), so flag it here.
            sch = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
            huge = [f.name for f in sch if str(f.type) == "decimal128(38, 0)"]
            if huge:
                print(f"FAIL {name}: HUGEINT oracle column(s) {huge} — "
                      f"CAST to BIGINT in the oracle SQL")
                n_bad += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, x = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g == x:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            if g[0] != x[0]:
                print(f"FAIL {name}: columns {g[0]} vs {x[0]}")
                continue
            if len(g) != len(x):
                print(f"FAIL {name}: rowcount {len(g)-1} vs {len(x)-1}")
            diffs = [(a, b) for a, b in zip(g[1:], x[1:]) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows "
                  f"(of {len(g)-1}/{len(x)-1})")
            for a, b in diffs[:3]:
                print(f"   spark={a}\n   duck ={b}")
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
