#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
compare the Verify.scala parquet dump against the DuckDB oracle result.
Columns are sorted by name, rows sorted, values compared exactly.

Usage: python3 scripts/verify_local.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ours = con.sql(f"SELECT * FROM read_parquet('{files[0]}')")
            ours_cols = sorted(ours.columns)
            ours_sorted = con.sql(
                f"SELECT {', '.join(ours_cols)} FROM read_parquet('{files[0]}')")
            ours_types = [str(t) for t in ours_sorted.types]
            ours_rows = ours_sorted.fetchall()
            oracle = con.sql(sql)
            o_cols = sorted(oracle.columns)
            o_sorted = con.sql(f"SELECT {', '.join(o_cols)} FROM ({sql})")
            o_types = [str(t) for t in o_sorted.types]
            o_rows = o_sorted.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if ours_cols != o_cols:
            print(f"FAIL {name}: schema {ours_cols} vs {o_cols}")
            n_fail += 1
            continue
        # The driver's value hash is TYPE-sensitive: an uncast DuckDB
        # sum(...) (HUGEINT) hashes differently from Spark's BIGINT even
        # when every value is equal (round-6 q_domain_quota regression).
        # Mirror that strictness here so the local gate can never pass a
        # query the driver's hash would fail.
        if ours_types != o_types:
            bad = [f"{c}: spark={a} oracle={b}"
                   for c, a, b in zip(ours_cols, ours_types, o_types) if a != b]
            print(f"FAIL {name}: column types differ ({'; '.join(bad)})")
            n_fail += 1
            continue
        a = sorted([tuple(norm(v) for v in r) for r in ours_rows])
        b = sorted([tuple(norm(v) for v in r) for r in o_rows])
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0] if diffs else '?'}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
