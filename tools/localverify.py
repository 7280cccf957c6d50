#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify output (parquet per query) against DuckDB oracle SQL.
Usage: python3 tools/localverify.py <sfDir> <outDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
NOT part of the shipped library — the Scala code has no Python deps.
"""
import sys, os, json, math
import duckdb

def canon(rows, cols, exact):
    # driver sorts columns by name before hashing values; mimic + sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and not exact:
                v = round(v, 9)
            vals.append(str(v))  # exact mode: repr IS the bit pattern
        out.append(tuple(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq_path = os.path.join(out_dir, name)
        if not os.path.isdir(pq_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{pq_path}/*.parquet'")
            got_cols = list(got.columns)
            got_ltypes = [str(t) for t in got.types]
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = list(exp.columns)
            exp_ltypes = [str(t) for t in exp.types]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1; continue
        # the driver hashes through arrow/pandas, where e.g. DuckDB HUGEINT
        # (SUM over BIGINT) renders differently than Spark BIGINT even when
        # str(value) matches — so compare DuckDB LOGICAL types (HUGEINT vs
        # BIGINT), not DBAPI codes (both are 'NUMBER', which let this bug
        # class ship red gates in rounds 5 and 6)
        got_types = dict(zip(got_cols, got_ltypes))
        exp_types = dict(zip(exp_cols, exp_ltypes))
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_types
                 if got_types[c] != exp_types[c]}
        if tdiff:
            print(f"FAIL {name}: column type mismatch {tdiff} "
                  "(cast the oracle SQL to the spark-side type)")
            n_fail += 1; continue
        g, e = canon(got_rows, got_cols, True), canon(exp_rows, exp_cols, True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if g != e:
            # bit-exact mismatch: the driver's hash would flag this even if
            # the math is right to 1e-9 — distinguish the two cases
            g9 = canon(got_rows, got_cols, False)
            e9 = canon(exp_rows, exp_cols, False)
            kind = "FP-REPR (passes at 9 decimals — still a driver-hash " \
                   "risk)" if g9 == e9 else "value"
            bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: {kind} mismatch at rows {bad}")
            for i in bad:
                print(f"  got {g[i]}\n  exp {e[i]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
