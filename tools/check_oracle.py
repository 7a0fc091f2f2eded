#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle_sql.json entry in DuckDB over the sf_dir parquet tables, then
compares: schema (sorted column names), row count, and values (rows
sorted, columns sorted by name; floats compared exactly AND with 1e-9
rel tolerance so we can see how tight we are).
"""
import json, sys, math, decimal
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, decimal.Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, int):
        return ("num", float(v))
    return (type(v).__name__, str(v))

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        gperm = [gcols.index(c) for c in sorted(gcols)]
        eperm = [ecols.index(c) for c in sorted(ecols)]
        g = sorted(tuple(norm(r[i]) for i in gperm) for r in got)
        e = sorted(tuple(norm(r[i]) for i in eperm) for r in exp)
        exact = g == e
        close = True
        worst = 0.0
        for rg, re_ in zip(g, e):
            for vg, ve in zip(rg, re_):
                if vg[0] == "num" and ve[0] == "num":
                    a, b = vg[1], ve[1]
                    if a != b:
                        if (a is None) != (b is None):
                            close = False
                        else:
                            rel = abs(a-b)/max(1e-12, abs(a), abs(b))
                            worst = max(worst, rel)
                            if rel > 1e-9 or math.isnan(rel):
                                close = False
                elif vg != ve:
                    close = False
        if exact:
            print(f"PASS {name} ({len(got)} rows, exact)")
            n_pass += 1
        elif close:
            print(f"WARN {name}: not bit-exact, worst rel err {worst:.2e}")
            n_fail += 1
        else:
            bad = [(rg, re_) for rg, re_ in zip(g, e) if rg != re_][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
