#!/usr/bin/env python3
"""One-command stress-data setup (VERDICT r14 item 6): runs the three
deterministic generators and completes every stress dir with symlinks to
the unscaled sf0.1 tables, so `graft.Stress` (and ad-hoc Bench runs with
SPARK_GRAFT_SF_DIR) can load the full table set from any of them.

Usage: python3 tools/gen_stress_data.py
Creates:
  /tmp/scaleli/n{10,40,160}x        scaled lineitem   (g21/g22 wedge family)
  /tmp/scaledocs/n{50000,200000,800000}  scaled documents  (dedup/graph/text/media)
  /tmp/scaleemb/n{20000,100000}     scaled embeddings (s02/s29)
  /tmp/scaleev/n10x                 scaled events     (q77 watermark planner)
Deterministic; ~3 min, ~3.5 GB under /tmp.
"""
import os, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
SF = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

for script, outbase in [("gen_scale_lineitem.py", "/tmp/scaleli"),
                        ("gen_scale_docs.py", "/tmp/scaledocs"),
                        ("gen_scale_embeddings.py", "/tmp/scaleemb"),
                        ("gen_scale_events.py", "/tmp/scaleev")]:
    subprocess.run([sys.executable, os.path.join(HERE, script), outbase],
                   check=True)

for base in ("/tmp/scaleli", "/tmp/scaledocs", "/tmp/scaleemb", "/tmp/scaleev"):
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        if not (os.path.isdir(p) and d.startswith("n")):
            continue
        for t in TABLES:
            dst = os.path.join(p, f"{t}.parquet")
            if not os.path.exists(dst):
                os.symlink(os.path.join(SF, f"{t}.parquet"), dst)
        print(f"completed {p}")
