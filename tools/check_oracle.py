#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

DRIVER-FAITHFUL: the driver fetches BOTH result sets via pandas
(`.df()`), string-normalizes the values, and hashes — so every pandas
dtype coercion applies before the compare. Two coercions have shipped
red rows:
  * Decimal('506627.00') (Spark DECIMAL) vs float 506627.0 (round-1
    root cause) — fix: cast the final projection to DOUBLE on BOTH
    sides.
  * DuckDB `sum(INTEGER)` returns HUGEINT, which pandas renders as
    float64 ('149174.0') while Spark's BIGINT stays int64 ('149174')
    (round-5 `q_corpus_profile`) — fix: CAST(sum(x) AS BIGINT) in the
    oracle SQL.
This checker therefore fetches both sides via `.df()` exactly like the
driver — a raw `fetchall()` compare keeps HUGEINT as Python int and
HIDES the second failure mode (it passed q_corpus_profile locally while
the driver failed it). Any PASS here should be a driver PASS; a FAIL
here must be fixed.

It also mirrors the driver's pandas failure mode: a result column whose
values are lists/arrays/bytes crashes the driver's sort — reported here
as UNSORTABLE so those queries get serialized (to_json/array_join/hex)
before the driver sees them.
"""
import json, sys
import duckdb
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    # pandas renders missing values as None (object cols) or NaN/NaT
    # (numeric/datetime cols); both sides go through the same coercion,
    # so a consistent sentinel per representation is all we need.
    if v is None:
        return "\0NULL"
    return str(v)

def fetch_df(con, sql):
    df = con.execute(sql).df()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return rows, cols

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got, gcols = fetch_df(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            exp, ecols = fetch_df(con, sql)
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
                                    (list, tuple, bytes, bytearray, dict,
                                     np.ndarray))]
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
