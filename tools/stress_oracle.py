#!/usr/bin/env python3
"""DuckDB twin of graft.Stress (VERDICT r15 item 2): reads the tier map a
Stress run wrote (dir + query list per tier), times each query's oracle
SQL against that tier's tables, and writes an ORACLE_STRESS.json with the
same tier structure — so every at-scale parity claim is a committed PAIRED
artifact from one window, not Spark times plus prose.

Run back-to-back with graft.Stress on a settled machine (same caveats as
tools/time_oracle.py). Single run per query, like Stress's default: these
queries run seconds-to-minutes and warm-cache min-of-2 would flatter the
engine that benefits most from OS page cache.

A per-query TIMEOUT (default 600 s, override with --timeout N) interrupts
DuckDB via a watchdog thread and records {"timeout": true, "limit_s": N}:
at 10x+ some oracle recursive CTEs do not finish in practical time, and
"the oracle exceeded the budget" is itself the measurement.

Usage: python3 tools/stress_oracle.py [stress_json] [oracle_sql.json]
                                      [--timeout N] [--tier T1,T2]
  stress_json      STRESS_LOCAL.json from a graft.Stress run (default)
  oracle_sql.json  from a FULL graft.Verify run
                   (default /tmp/verify_out/oracle_sql.json)
Writes ORACLE_STRESS.json (override with STRESS_ORACLE_OUT env).
"""
import duckdb, json, os, sys, threading, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

args = [a for a in sys.argv[1:]]
timeout_s = 600.0
tier_filter = None
if "--timeout" in args:
    i = args.index("--timeout")
    timeout_s = float(args[i + 1]); del args[i:i + 2]
if "--tier" in args:
    i = args.index("--tier")
    tier_filter = set(args[i + 1].split(",")); del args[i:i + 2]
stress_path = args[0] if len(args) > 0 else "STRESS_LOCAL.json"
sqls_path = args[1] if len(args) > 1 else "/tmp/verify_out/oracle_sql.json"

stress = json.load(open(stress_path))
sqls = json.load(open(sqls_path))

out_tiers = {}
for label, tier in stress["tiers"].items():
    if tier_filter and label not in tier_filter:
        continue
    d = tier["dir"]
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{d}/{t}.parquet')")
    qtimes = {}
    for name in tier["queries"]:
        sql = sqls.get(name)
        if sql is None:
            qtimes[name] = {"err": "no oracle sql"}
            continue
        done = threading.Event()

        def watchdog():
            if not done.wait(timeout_s):
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            qtimes[name] = round(time.time() - t0, 3)
        except Exception as e:
            dt = time.time() - t0
            if dt >= timeout_s - 1:
                qtimes[name] = {"timeout": True, "limit_s": timeout_s}
            else:
                qtimes[name] = {"err": str(e)[:120]}
        finally:
            done.set()
        print(f"[oracle-stress] {label}/{name}: {qtimes[name]}",
              file=sys.stderr)
    con.close()
    out_tiers[label] = {"dir": d, "queries": qtimes}

out = {"metric": "stress_oracle", "unit": "sec", "runs_per_query": 1,
       "timeout_s": timeout_s, "engine": f"duckdb {duckdb.__version__}",
       "tiers": out_tiers}
path = os.environ.get("STRESS_ORACLE_OUT", "ORACLE_STRESS.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(json.dumps({"written": path,
                  "tiers": {k: v["queries"] for k, v in out_tiers.items()}}))
