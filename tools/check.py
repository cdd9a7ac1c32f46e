#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Dev-only tooling (duckdb/pandas are driver-side packages, not library deps).

Usage: python3 tools/check.py [sf_dir] [out_dir]
  1. expects `sbt "runMain graft.Verify <sf_dir> <out_dir>"` to have run
  2. for each query: runs oracle SQL in DuckDB over the same parquet tables,
     loads the Spark parquet result, sorts columns by name + rows, compares.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

# --json PATH: additionally write a driver-format correctness record
# (per query: rows/schema/hash match booleans + row counts + err) so
# tools/close_round.sh can commit CORRECTNESS_r{N}.json mechanically.
JSON_OUT = None
argv = list(sys.argv[1:])
if "--json" in argv:
    i = argv.index("--json")
    JSON_OUT = argv[i + 1]
    del argv[i:i + 2]
SF = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
OUT = argv[1] if len(argv) > 1 else "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes = [], []
records = {}
def rec(name, rows_match=False, schema_match=False, hash_match=False,
        spark_rows=0, oracle_rows=0, err=None):
    records[name] = {"rows_match": rows_match, "schema_match": schema_match,
        "hash_match": hash_match, "spark_rows": int(spark_rows),
        "oracle_rows": int(oracle_rows), "err": err}
for name, sql in sorted(oracles.items()):
    res_dir = f"{OUT}/{name}"
    if not glob.glob(f"{res_dir}/*.parquet"):
        fails.append((name, "no spark output")); rec(name, err="no spark output"); continue
    try:
        exp_t = con.execute(sql).fetch_arrow_table()
        exp = exp_t.to_pandas()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); rec(name, err=f"oracle sql error: {e}"[:300]); continue
    try:
        # Symmetric conversion (arrow → pandas on BOTH sides): decimals stay
        # Decimal objects on both, so str-compare is apples-to-apples.
        got_t = pq.read_table(glob.glob(f"{res_dir}/*.parquet"))
        got = got_t.to_pandas()
    except Exception as e:
        fails.append((name, f"spark result read error: {e}")); rec(name, err=f"spark result read error: {e}"[:300]); continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"schema mismatch: oracle={list(exp.columns)} spark={list(got.columns)}"))
        rec(name, rows_match=len(exp) == len(got), spark_rows=len(got), oracle_rows=len(exp),
            err="schema mismatch"); continue
    # The driver hashes values INCLUDING their physical type: a Spark
    # DECIMAL(28,2) vs DuckDB DECIMAL(38,2) result hash-mismatches even when
    # the string values are equal (round-1 lesson). Compare arrow-level types
    # for every column, sorted by name, before comparing values.
    exp_types = {f.name: str(f.type) for f in exp_t.schema}
    got_types = {f.name: str(f.type) for f in got_t.schema}
    type_diffs = {c: (exp_types[c], got_types[c]) for c in exp_types
                  if exp_types[c] != got_types.get(c)}
    if type_diffs:
        fails.append((name, f"TYPE mismatch (oracle, spark): {type_diffs}"))
        rec(name, rows_match=len(exp) == len(got), spark_rows=len(got), oracle_rows=len(exp),
            err=f"TYPE mismatch: {type_diffs}"[:300]); continue
    # Belt-and-suspenders: NO DECIMAL may reach a checked output schema.
    # Three rounds of driver evidence (r1: 12, r2: 14 hash-only failures, all
    # and only decimal-typed outputs — even when pinned to DECIMAL(38,s) on
    # both engines with verified-equal values; r3: the probe_hash_decimal
    # negative control ALONE hash-failed while its bigint/double twins passed)
    # show the driver's hash canonicalizes DECIMAL in a way neither engine
    # reproduces. Finals must be scaled BIGINTs or rounded doubles.
    dec_cols = sorted(c for c, t in list(exp_types.items()) + list(got_types.items())
                      if "decimal" in t)
    if dec_cols:
        fails.append((name, f"DECIMAL in output schema (banned; use scaled BIGINT or rounded double): {sorted(set(dec_cols))}"))
        rec(name, rows_match=len(exp) == len(got), spark_rows=len(got), oracle_rows=len(exp),
            err="DECIMAL in output schema"); continue
    if len(exp) != len(got):
        fails.append((name, f"row count: oracle={len(exp)} spark={len(got)}"))
        rec(name, schema_match=True, spark_rows=len(got), oracle_rows=len(exp),
            err="row count mismatch"); continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.astype(str); got = got.astype(str)
    diff = (exp != got)
    if diff.any().any():
        idx = diff.any(axis=1)
        bad = idx[idx].index[:3]
        msgs = [f"row {i}: oracle={exp.loc[i].to_dict()} spark={got.loc[i].to_dict()}" for i in bad]
        fails.append((name, f"{int(idx.sum())} mismatched rows; " + " | ".join(msgs)))
        rec(name, rows_match=True, schema_match=True, spark_rows=len(got),
            oracle_rows=len(exp), err=f"{int(idx.sum())} mismatched rows")
    else:
        passes.append((name, len(exp)))
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=len(got), oracle_rows=len(exp))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, m in fails:
    print(f"FAIL {n}: {m[:500]}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(records, f, indent=2, sort_keys=True)
    print(f"wrote {JSON_OUT} ({len(records)} queries)")
sys.exit(1 if fails else 0)
