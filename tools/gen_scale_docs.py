#!/usr/bin/env python3
"""Generate throwaway scaled `documents` tables for the pair-substrate
stress test (SURVEY §6, round-13): same vocabulary and length profile as
the driver's sf0.1 table, a controlled duplicate structure (2% exact
dups, 3% near dups with one token swapped — CLUSTERED, not cross-product:
each dup has ONE parent), sizes 10x/40x/160x sf0.1.

Usage: python3 tools/gen_scale_docs.py [outbase=/tmp/scaledocs]
Writes <outbase>/n{50000,200000,800000}/documents.parquet.
Deterministic (fixed seed) so measurements are reproducible.
"""
import sys, random, collections
import duckdb

outbase = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledocs"
SRC = "/root/testdata/sf0.1/documents.parquet"

con = duckdb.connect()
rows = con.execute(
    f"select text, lang, source from read_parquet('{SRC}')").fetchall()
vocab = collections.Counter()
lens = []
langs = [r[1] for r in rows]
sources = [r[2] for r in rows]
for t, _, _ in rows:
    ws = t.split(" ")
    lens.append(len(ws))
    vocab.update(ws)
words = list(vocab.keys())
weights = [vocab[w] for w in words]

for n in (50_000, 200_000, 800_000):
    rnd = random.Random(42)
    docs = []
    n_base = int(n * 0.95)
    for i in range(n_base):
        L = rnd.choice(lens)
        toks = rnd.choices(words, weights=weights, k=L)
        docs.append(" ".join(toks))
    # 2% exact dups, 3% near dups (one token swapped), each with a single
    # random parent — dup CLUSTERS stay small like real crawl data
    out = []
    for i in range(n):
        if i < n_base:
            out.append(docs[i])
        elif i < n_base + int(n * 0.02):
            out.append(docs[rnd.randrange(n_base)])
        else:
            toks = docs[rnd.randrange(n_base)].split(" ")
            toks[rnd.randrange(len(toks))] = rnd.choice(words)
            out.append(" ".join(toks))
    rnd.shuffle(out)
    con.execute("drop table if exists gen")
    con.execute("create table gen (doc_id bigint, text varchar, lang varchar, "
                "source varchar, n_chars bigint)")
    rnd2 = random.Random(7)
    con.executemany(
        "insert into gen values (?, ?, ?, ?, ?)",
        [(i, t, rnd2.choice(langs), rnd2.choice(sources), len(t))
         for i, t in enumerate(out)])
    import os
    d = f"{outbase}/n{n}"
    os.makedirs(d, exist_ok=True)
    con.execute(f"copy gen to '{d}/documents.parquet' (format parquet)")
    print(f"wrote {d}/documents.parquet ({n} rows)")
