#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the
shipped library): compares graft.Verify parquet dumps against the DuckDB
oracle SQL, as multisets and with exact value equality.

Usage: python3 scripts/check_correctness.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; ScaleGen (SF1 soak) writes
        # Spark-style directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    prefix = sys.argv[3] if len(sys.argv) > 3 else ""
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if not name.startswith(prefix):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got_rows = [d[0] for d in got.description], got.fetchall()
            exp = con.execute(sql)
            exp_cols, exp_rows = [d[0] for d in exp.description], exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        # Output-TYPE parity, not just value parity: the driver's hasher is
        # representation-sensitive (pandas dtypes), so a value-exact result
        # in a different type (HUGEINT vs BIGINT, DECIMAL(38,2) vs (22,2))
        # still hash-fails. DESCRIBE both sides and require identical types.
        # signed int widths all coerce to pandas int64 in the driver, so
        # TINYINT..BIGINT are one family; HUGEINT (-> float64/object) and
        # DECIMAL precision stay strict.
        def tnorm(t):
            return "INTLIKE" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        try:
            got_t = dict((r[0], tnorm(r[1])) for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
            exp_t = dict((r[0], tnorm(r[1])) for r in con.execute(f"DESCRIBE {sql}").fetchall())
            if got_t != exp_t:
                diff = {c: (got_t.get(c), exp_t.get(c))
                        for c in set(got_t) | set(exp_t)
                        if got_t.get(c) != exp_t.get(c)}
                print(f"FAIL {name}: column types differ {diff}")
                ok = False
        except Exception as e:
            print(f"WARN {name}: type check failed: {e}")
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            ok = False
        else:
            # align column order by name, like the driver does
            gi = [got_cols.index(c) for c in sorted(got_cols)]
            ei = [exp_cols.index(c) for c in sorted(exp_cols)]
            g = sorted((tuple(norm(r[i]) for i in gi) for r in got_rows), key=repr)
            e = sorted((tuple(norm(r[i]) for i in ei) for r in exp_rows), key=repr)
            if g != e:
                print(f"FAIL {name}: rows differ (got {len(g)}, exp {len(e)})")
                for a, b in list(zip(g, e))[:200]:
                    if a != b:
                        print(f"  got: {a}\n  exp: {b}")
                        break
                if len(g) != len(e):
                    only_g = [r for r in g if r not in e][:3]
                    only_e = [r for r in e if r not in g][:3]
                    print(f"  only-in-got: {only_g}\n  only-in-exp: {only_e}")
                ok = False
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got_rows)} rows)")
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
