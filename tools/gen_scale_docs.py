#!/usr/bin/env python3
"""Generate throwaway scaled `documents` tables for the pair-substrate
stress test (SURVEY §6, round-13). Two modes:

- `zipf` (default): synthetic Zipf(1.05) vocabulary of 100k words, doc
  lengths drawn from the driver's sf0.1 length profile, 95% unique base
  docs + 2% exact dups + 3% near dups (one token swapped; each dup has
  ONE random parent, so dup clusters stay small like real crawl data).
  This is the realistic dedup regime: two random docs share almost no
  shingles (the Heaps-law tail), while the Zipf head produces genuinely
  hot "boilerplate" shingles that the df-cut must absorb.
- `dense`: the driver's own 31-word vocabulary and token-frequency
  profile. Scaling THIS keeps every doc colliding with every other doc
  in a saturated 31^3 shingle space — candidate pairs are Sigma df^2 by
  the exact-pair-enumeration SEMANTICS (not by plan choice), i.e. it is
  the adversarial all-boilerplate corpus. Kept for the SURVEY paragraph
  quantifying that regime.

Usage: python3 tools/gen_scale_docs.py [outbase=/tmp/scaledocs] [mode]
Writes <outbase>/n{50000,200000,800000}/documents.parquet.
Deterministic (fixed seeds) so measurements are reproducible.
"""
import sys, os
import numpy as np
import pandas as pd
import duckdb

outbase = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledocs"
mode = sys.argv[2] if len(sys.argv) > 2 else "zipf"
SRC = "/root/testdata/sf0.1/documents.parquet"

con = duckdb.connect()
src = con.execute(
    f"select text, lang, source from read_parquet('{SRC}')").fetchall()
lens = np.array([len(t.split(" ")) for t, _, _ in src])
langs = [r[1] for r in src]
sources = [r[2] for r in src]

if mode == "dense":
    import collections
    vocab = collections.Counter()
    for t, _, _ in src:
        vocab.update(t.split(" "))
    words = np.array(list(vocab.keys()))
    w = np.array([vocab[x] for x in words], dtype=np.float64)
else:
    V = 100_000
    words = np.array([f"w{i}" for i in range(V)])
    ranks = np.arange(1, V + 1, dtype=np.float64)
    w = ranks ** -1.05
cum = np.cumsum(w / w.sum())


def sample_tokens(rng, k):
    return words[np.searchsorted(cum, rng.random(k), side="right")]


for n in (50_000, 200_000, 800_000):
    rng = np.random.default_rng(42)
    n_base = int(n * 0.95)
    L = rng.choice(lens, size=n_base)
    flat = sample_tokens(rng, int(L.sum()))
    offs = np.concatenate([[0], np.cumsum(L)])
    docs = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_base)]
    out = list(docs)
    # 2% exact dups, 3% near dups (one token swapped), each with a single
    # random parent — dup CLUSTERS stay small like real crawl data
    for _ in range(int(n * 0.02)):
        out.append(docs[rng.integers(n_base)])
    while len(out) < n:
        toks = docs[rng.integers(n_base)].split(" ")
        toks[rng.integers(len(toks))] = str(sample_tokens(rng, 1)[0])
        out.append(" ".join(toks))
    perm = rng.permutation(n)
    rng2 = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": np.array(out, dtype=object)[perm],
        "lang": rng2.choice(langs, size=n),
        "source": rng2.choice(sources, size=n),
    })
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    d = f"{outbase}/n{n}"
    os.makedirs(d, exist_ok=True)
    con.register("gen", df)
    con.execute(
        f"copy (select * from gen) to '{d}/documents.parquet' (format parquet)")
    con.unregister("gen")
    print(f"wrote {d}/documents.parquet ({n} rows, mode={mode})")
