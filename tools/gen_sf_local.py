#!/usr/bin/env python3
"""One-off local generator for scaling-proof corpora BEYOND the driver's
sf0.1 (TESTDATA.md is read-only; this never touches /root/testdata).

Produces documents.parquet + embeddings.parquet — the two tables the
d03/d08/t07/p02/s03 scaling study reads — with the same schema and the
same statistical shape as the driver corpus (reverse-engineered, seed
42, fully deterministic):
  - word-salad text over a small OLAP vocab, ~10-110 words/doc
  - langs en~50%/de/es/fr/zh, sources src0..src19
  - ~6%% of docs are NEAR-dups of an earlier doc (last word dropped or
    one word substituted), ~0.2%% exact dups  -> d03/d08 find work at
    every sf
  - embeddings: 64-dim float32, 10 label clusters (center + noise),
    ~2%% near-identical pairs -> d05/s12 find work at every sf

Usage: gen_sf_local.py <n_docs> <n_vecs> <outdir>
e.g.   gen_sf_local.py 50000 20000 target/testdata-local/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("key agg row scan slow fast table value part hash merge batch spark "
         "the line sort win a join shuffle stage plan cost disk page block "
         "index tree leaf root node graph edge list map set queue heap stack "
         "byte word bit mask code gen loop fuse pipe sink source stream state "
         "window frame rank lag lead sum min max count mean skew salt probe "
         "build spill fetch push pull read write open close flush sync").split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.5, 0.125, 0.125, 0.125, 0.125]


def gen_documents(n, rng):
    texts, langs, sources = [], [], []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.002:          # exact dup of an earlier doc
            j = int(rng.integers(0, i))
            texts.append(texts[j])
        elif i > 10 and r < 0.06:          # near dup: drop last word / swap one
            j = int(rng.integers(0, i))
            w = texts[j].split()
            if rng.random() < 0.5 and len(w) > 12:
                w = w[:-1]
            else:
                w[int(rng.integers(0, len(w)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(w))
        else:
            k = int(rng.integers(10, 111))
            texts.append(" ".join(VOCAB[int(x)] for x in rng.integers(0, len(VOCAB), k)))
        langs.append(LANGS[int(rng.choice(len(LANGS), p=LANG_P))])
        sources.append(f"src{int(rng.integers(0, 20))}")
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n, rng):
    centers = rng.standard_normal((10, 64))
    labels = rng.integers(0, 10, n)
    vecs = (centers[labels] * 0.6 + rng.standard_normal((n, 64)) * 0.4).astype(np.float32)
    for i in range(n):                     # ~2% near-identical pairs
        if i > 10 and rng.random() < 0.02:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + rng.standard_normal(64).astype(np.float32) * 1e-3
            labels[i] = labels[j]
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()], pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


def main():
    n_docs, n_vecs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(n_docs, rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(n_vecs, rng), f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} docs + {n_vecs} vecs to {out}")


if __name__ == "__main__":
    main()
