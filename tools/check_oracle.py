#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run DuckDB on each
oracle_sql.json entry over the testdata parquet and compare against the
Spark result parquet written by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        # driver-style tolerance: round already applied in queries; this
        # just normalizes -0.0 / float repr
        if v == 0:
            return 0.0
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({spark_glob!r})").fetchdf()
        o_cols = sorted(oracle.columns)
        s_cols = sorted(spark.columns)
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        o_rows = sorted(map(repr, (tuple(norm(v) for v in r) for r in
                                   oracle[o_cols].itertuples(index=False))))
        s_rows = sorted(map(repr, (tuple(norm(v) for v in r) for r in
                                   spark[s_cols].itertuples(index=False))))
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
        elif o_rows != s_rows:
            diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
            print(f"FAIL {name}: {len(diff)} differing rows; first: spark={diff[0][0]} oracle={diff[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
