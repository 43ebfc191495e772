#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (builder tooling only, not
part of the shipped library).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
sorts columns by name + rows by value, and compares.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(con, rel_sql):
    df = con.execute(rel_sql).df()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(got_glob):
            print(f"FAIL {name}: no spark output at {got_glob}")
            n_fail += 1
            continue
        try:
            got = canon(con, f"SELECT * FROM '{got_glob}'")
            exp = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif not got.equals(exp):
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows, e.g.:")
            print("  got:", got[bad].head(3).to_dict("records"))
            print("  exp:", exp[bad].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
