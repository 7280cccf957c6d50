#!/usr/bin/env python3
"""Generate throwaway scaled `lineitem` (l_orderkey, l_partkey) tables for
the co-purchase graph stress test (SURVEY §6, round-14: g21/g22 wedge
families). Scaling follows TPC-H proportions (orders and the part domain
both scale linearly with SF) but part POPULARITY is Zipf(1.05) — uniform
part choice keeps the support>=2 co-purchase graph constant-size as n
grows (expected repeated pairs ~ pairs^2/domain^2 = const), which is the
uninteresting regime; real co-purchase data has hot items, and the Zipf
head is exactly what makes the graph densify and the deg<=1000 hub cap
go live.

Basket sizes are drawn from sf0.1's real per-order item-count profile.
Only the two columns the graph queries read are written.

Usage: python3 tools/gen_scale_lineitem.py [outbase=/tmp/scaleli]
Writes <outbase>/n{10,40,160}x/lineitem.parquet (10x/40x/160x sf0.1's
147k orders — 160x is the wedge family's extrapolation tier, round 16).
Deterministic (fixed seeds).
"""
import sys, os
import numpy as np
import pandas as pd
import duckdb

outbase = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaleli"
SRC = "/root/testdata/sf0.1/lineitem.parquet"

con = duckdb.connect()
basket_sizes = np.array([r[0] for r in con.execute(
    f"select count(distinct l_partkey) from read_parquet('{SRC}') "
    "group by l_orderkey").fetchall()])
N_ORDERS_1X, N_PARTS_1X = 147_236, 20_000

for mult in (10, 40, 160):
    rng = np.random.default_rng(42 + mult)
    n_orders = N_ORDERS_1X * mult
    n_parts = N_PARTS_1X * mult
    sizes = rng.choice(basket_sizes, size=n_orders)
    total = int(sizes.sum())
    # Zipf(1.05) popularity over the scaled part domain
    ranks = np.arange(1, n_parts + 1, dtype=np.float64)
    w = ranks ** -1.05
    cum = np.cumsum(w / w.sum())
    parts = np.searchsorted(cum, rng.random(total), side="right").astype(np.int64)
    orders = np.repeat(np.arange(n_orders, dtype=np.int64), sizes)
    df = pd.DataFrame({"l_orderkey": orders, "l_partkey": parts})
    d = f"{outbase}/n{mult}x"
    os.makedirs(d, exist_ok=True)
    con.register("gen", df)
    con.execute(
        f"copy (select * from gen) to '{d}/lineitem.parquet' (format parquet)")
    con.unregister("gen")
    print(f"wrote {d}/lineitem.parquet ({total} rows, {n_orders} orders, "
          f"{n_parts} parts)")
