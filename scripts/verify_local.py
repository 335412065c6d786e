#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
compare the Verify.scala parquet dump against the DuckDB oracle result.
Columns are sorted by name, rows sorted, values compared exactly.

Usage: python3 scripts/verify_local.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a machine-readable report in the driver's
CORRECTNESS_r{N}.json schema (per query: rows/schema/hash match, row
counts, err) — used to commit the sf0.1 sweep as CORRECTNESS_SF01.json
so the scale gate is a re-parseable artifact, not prose.
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

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, False, False, err="no spark output")
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
            record(name, False, False, False, err=f"oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if ours_cols != o_cols:
            print(f"FAIL {name}: schema {ours_cols} vs {o_cols}")
            record(name, len(ours_rows) == len(o_rows), False, False,
                   len(ours_rows), len(o_rows), f"schema {ours_cols} vs {o_cols}")
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
            record(name, len(ours_rows) == len(o_rows), False, False,
                   len(ours_rows), len(o_rows), f"types differ: {'; '.join(bad)}")
            n_fail += 1
            continue
        a = sorted([tuple(norm(v) for v in r) for r in ours_rows])
        b = sorted([tuple(norm(v) for v in r) for r in o_rows])
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            record(name, False, True, False, len(a), len(b), "rowcount mismatch")
            n_fail += 1
            continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0] if diffs else '?'}")
            record(name, True, True, False, len(a), len(b),
                   f"{len(diffs)} differing rows")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        record(name, True, True, True, len(a), len(b), None)
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"report written to {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
