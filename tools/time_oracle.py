#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the single-node baseline graft.Bench is
compared against.

Usage: python3 tools/time_oracle.py [sf_dir] [oracle_sql.json]
  sf_dir          parquet table dir   (default /root/testdata/sf0.1)
  oracle_sql.json from a graft.Verify run (default /tmp/verify_out/oracle_sql.json)

Prints one JSON line: {"total": sec|null, "times": {...}, "failed": [...]}
with times sorted slowest-first. Min-of-2 per query on 32 threads — mirror
of Bench's min-of-N warm timing. "total" is null when ANY query errored
(a partial total would understate the baseline and bias the comparison).
Same caveat as Bench: numbers are only comparable on a settled machine
(load decays ~5 min after any JVM exits).
"""
import duckdb, json, time, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
sqls_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

sqls = json.load(open(sqls_path))
total = 0.0
times = {}
for name, sql in sorted(sqls.items()):
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(name, "ERR", str(e)[:80], file=sys.stderr)
            best = -1
            break
        best = min(best, time.time() - t0)
    times[name] = best
    if best > 0:
        total += best
failed = sorted(k for k, v in times.items() if v < 0)
print(json.dumps({"total": None if failed else round(total, 2),
                  "times": {k: round(v, 3) for k, v in
                            sorted(times.items(), key=lambda kv: -kv[1])},
                  "failed": failed}))
