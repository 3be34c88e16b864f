#!/usr/bin/env python3
"""Local stand-in for the round driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name and rows by all columns,
and reports row/schema/value match per query. Dev tool only — the
engine itself never depends on python.
"""
import json, os, sys, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def connect(sf_dir):
    con = duckdb.connect()
    # An in-memory DuckDB connection cannot spill without a temp dir —
    # the heavy sf1 chain oracles (llm_pipeline_distill) OOM at the
    # memory limit instead of going out-of-core. Dev-tool setting only.
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def main(sf_dir, out_dir):
    import gc
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for q, sql in sorted(oracles.items()):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            print(f"FAIL {q}: no engine output dir"); n_bad += 1; continue
        con = None
        try:
            # fresh connection per query: the heavy sf1 chain oracles
            # otherwise accumulate buffer-pool state across the run
            # until a later query's Arrow fetch hits a process-level
            # malloc failure
            con = connect(sf_dir)
            eng = norm(pd.read_parquet(qdir))
            ora = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {q}: {type(e).__name__}: {e}"); n_bad += 1; continue
        finally:
            # close on the failure path too — a failed heavy oracle
            # otherwise leaks its near-limit buffer pool into every
            # following query's process space
            if con is not None:
                con.close()
            gc.collect()
        if list(eng.columns) != list(ora.columns):
            print(f"FAIL {q}: columns {list(eng.columns)} vs {list(ora.columns)}"); n_bad += 1; continue
        if len(eng) != len(ora):
            print(f"FAIL {q}: rows {len(eng)} vs {len(ora)}"); n_bad += 1; continue
        # exact value compare on the string image (mirrors a hash compare)
        es = eng.astype(str); os_ = ora.astype(str)
        if not es.equals(os_):
            neq = (es != os_).any(axis=1)
            bad = es[neq].head(3)
            badp = os_[neq].head(3)
            print(f"FAIL {q}: {int(neq.sum())} mismatched rows; engine:\n{bad}\noracle:\n{badp}")
            n_bad += 1; continue
        print(f"ok   {q}: {len(eng)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
