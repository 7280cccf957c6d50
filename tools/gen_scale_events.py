#!/usr/bin/env python3
"""Generate a throwaway scaled `events` table for the temporal stress
tier (round 16: q77's watermark planner is the one weak query whose
substrate — a corpus-sized arrival-order pass — had never been measured
past sf0.1). Scaling replicates sf0.1's 100k events K times with the
event-time axis shifted by 30 days per copy and event_ids offset into
disjoint ranges: the per-window arrival/lateness STRUCTURE (what a
watermark fights) is preserved exactly while the volume grows linearly,
and the construction is deterministic with no RNG at all.

Usage: python3 tools/gen_scale_events.py [outbase=/tmp/scaleev]
Writes <outbase>/n10x/events.parquet (1M rows) and n40x (4M rows —
round 16: q77's sf0.1→10x ratio trend pointed at a crossover near 20x;
the 40x tier measures past it).
"""
import sys, os
import duckdb

outbase = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaleev"
SRC = "/root/testdata/sf0.1/events.parquet"

con = duckdb.connect()
for mult in (10, 40):
    d = f"{outbase}/n{mult}x"
    os.makedirs(d, exist_ok=True)
    con.execute(f"""
        COPY (
          SELECT e.event_id + t.k * 100000 AS event_id,
                 e.ts + to_days(CAST(t.k * 30 AS INTEGER)) AS ts,
                 e.user_id, e.event_type, e.value, e.props
          FROM read_parquet('{SRC}') e, range({mult}) t(k)
          ORDER BY t.k, e.event_id
        ) TO '{d}/events.parquet' (FORMAT PARQUET)""")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/events.parquet')").fetchone()[0]
    print(f"wrote {d}/events.parquet ({n} rows)")
