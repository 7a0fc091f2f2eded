#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

DRIVER-FAITHFUL: the driver string-normalizes fetched values before
hashing, so Decimal('506627.00') on the Spark side vs float 506627.0 on
the DuckDB side is a MISMATCH even though the numbers are equal (round-1
root cause). This checker therefore compares str(v) of the raw fetched
values with NO numeric coercion. Any PASS here should be a driver PASS;
a WARN/FAIL here must be fixed (usually: cast the final projection of
the DECIMAL column to DOUBLE on BOTH sides).

It also mirrors the driver's pandas failure mode: a result column whose
values are lists/arrays/bytes crashes the driver's sort — reported here
as UNSORTABLE so those queries get serialized (to_json/array_join/hex)
before the driver sees them.
"""
import json, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None:
        return "\0NULL"
    return str(v)

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
        # driver dies on unhashable/unsortable cells (arrays, bytearrays);
        # check the first NON-NULL value per column — a NULL in row 0
        # would let an unsortable column slip through
        def first_nonnull(i):
            return next((r[i] for r in got if r[i] is not None), None)
        unsortable = [c for i, c in enumerate(gcols)
                      if isinstance(first_nonnull(i),
                                    (list, tuple, bytes, bytearray, dict))]
        if unsortable:
            print(f"FAIL {name}: UNSORTABLE columns {unsortable} "
                  f"(driver pandas sort would crash — serialize them)")
            n_fail += 1
            continue
        gperm = [gcols.index(c) for c in sorted(gcols)]
        eperm = [ecols.index(c) for c in sorted(ecols)]
        g = sorted(tuple(norm(r[i]) for i in gperm) for r in got)
        e = sorted(tuple(norm(r[i]) for i in eperm) for r in exp)
        if g == e:
            print(f"PASS {name} ({len(got)} rows, exact)")
            n_pass += 1
        else:
            bad = [(rg, re_) for rg, re_ in zip(g, e) if rg != re_][:2]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
