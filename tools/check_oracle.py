#!/usr/bin/env python3
"""Local differential check: Spark results (written by graft.Verify) vs the
DuckDB oracle SQL, mirroring the driver's compare (sort columns by name,
compare shapes/values). Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — we engineer determinism
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failed.append(name)
            continue
        # dtype kinds must agree: the driver hash is dtype-sensitive (duckdb
        # HUGEINT -> pandas float64 while spark emits int64 hashes differently
        # even when values are numerically equal)
        kinds_ok = True
        for c in got.columns:
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            if gk != ek:
                print(f"FAIL {name}: dtype kind {c}: spark={got[c].dtype} oracle={exp[c].dtype}")
                kinds_ok = False
        if not kinds_ok:
            failed.append(name)
            continue
        bad = 0
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cmp_cell(a, b):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={a!r} oracle={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells ({len(got)} rows)")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
