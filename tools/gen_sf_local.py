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


def gen_documents_skewed(n, rng):
    """--skew variant: same text/dup process, but 90% of docs land in ONE
    source and one lang dominates — hot group/join keys for t07/p-series
    and a hot stratum for the salted-join probe. Content is NOT skewed
    (no shared boilerplate): key skew stresses partitioning, while
    content skew would legitimately explode band joins (d12's problem,
    not a partitioning one)."""
    t = gen_documents(n, rng)
    hot = rng.random(n) < 0.9
    sources = np.where(hot, "src0", np.array(t.column("source")))
    langs = np.where(rng.random(n) < 0.7, "en", np.array(t.column("lang")))
    return t.set_column(t.schema.get_field_index("source"), "source",
                        pa.array(sources, pa.string())) \
            .set_column(t.schema.get_field_index("lang"), "lang",
                        pa.array(langs, pa.string()))


def gen_embeddings_skewed(n, rng):
    """--skew variant: 90% of vectors drawn around ONE center with one
    label — a single hot IVF cell / hot label key for s03/s06/s14."""
    t = gen_embeddings(n, rng)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label")).copy()
    hot = rng.random(n) < 0.9
    center = rng.standard_normal(64)
    vecs[hot] = (center * 0.6 + rng.standard_normal((int(hot.sum()), 64)) * 0.4
                 ).astype(np.float32)
    labels[hot] = 0
    return pa.table({
        "vec_id": t.column("vec_id"),
        "embedding": pa.array([v for v in vecs.tolist()], pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


# ---------------------------------------------------------------------
# Full star schema (region..lineitem + events) at a multiple of the
# driver's sf0.1 sizes — reverse-fit to the driver tables' schemas,
# dtypes, value domains and structural invariants (day-granular dates
# over 1995-01..2001-08, Poisson(4) lines/order so ~1.8% of orders are
# line-less "abandoned carts", independent status/lines, January-2024
# event stream with JSON props). Separate seed stream from the
# documents/embeddings generators so adding star tables to an existing
# dir leaves those files byte-stable.
# ---------------------------------------------------------------------
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["SMALL", "MEDIUM", "LARGE", "ECONOMY", "STANDARD", "PROMO"]
PADJ = ["large", "hot", "blue", "old", "cold", "small", "new", "red"]
PNOUN = ["ring", "bolt", "plate", "screw", "tube", "cap", "rod", "clip"]


def _days(rng, n, start, end):
    # datetime64[ms] → parquet TIMESTAMP(MILLIS), matching the driver's
    # o_orderdate/l_shipdate physical encoding exactly
    span = (np.datetime64(end) - np.datetime64(start)).astype(int)
    return (np.datetime64(start) +
            rng.integers(0, span + 1, n).astype("timedelta64[D]")
            ).astype("datetime64[ms]")


def gen_star(mult, rng, skew=False):
    n_cust, n_supp, n_part = int(15000 * mult), int(1000 * mult), int(20000 * mult)
    n_ord, n_ev, n_users = int(150000 * mult), int(100000 * mult), int(1500 * mult)
    tables = {}
    tables["region"] = pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS, pa.string())})
    tables["nation"] = pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})
    tables["customer"] = pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2), pa.float64()),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)], pa.string())})
    tables["supplier"] = pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2), pa.float64())})
    tables["part"] = pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{PADJ[int(a)]} {PNOUN[int(b)]}" for a, b in
                            zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
                           pa.string()),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)], pa.string()),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)], pa.string()),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2), pa.float64())})
    # orders: hot customer key under --skew (20% of all orders on one key)
    custkeys = rng.integers(0, n_cust, n_ord)
    if skew:
        custkeys = np.where(rng.random(n_ord) < 0.2, 0, custkeys)
    tables["orders"] = pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(custkeys, pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)], pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()),
        "o_orderdate": pa.array(_days(rng, n_ord, "1995-01-01", "2001-08-01")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)], pa.string())})
    nl = rng.poisson(4.0, n_ord)           # ~1.8% zero → line-less "abandoned" orders
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), nl)
    n_li = int(nl.sum())
    linenos = (np.arange(n_li) - np.repeat(np.cumsum(nl) - nl, nl) + 1).astype(np.int32)
    tables["lineitem"] = pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenos, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2), pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)], pa.string()),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)], pa.string()),
        "l_shipdate": pa.array(_days(rng, n_li, "1995-01-02", "2001-11-04"))})
    # events: one hot user under --skew (20% of the stream on one key)
    users = rng.integers(0, n_users, n_ev)
    if skew:
        users = np.where(rng.random(n_ev) < 0.2, 0, users)
    # TIMESTAMP(NANOS) like the driver's events.ts: Spark surfaces it as
    # nanos-since-epoch Long (nanosAsLong) and Tables.load converts
    ts = (np.datetime64("2024-01-01T00:00:00", "ns") +
          np.sort(rng.integers(0, 30 * 86400 * 10**6, n_ev)).astype("timedelta64[us]")
          ).astype("datetime64[ns]")
    tables["events"] = pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(np.array(["view", "click", "signup", "purchase", "error"])[
            rng.integers(0, 5, n_ev)], pa.string()),
        "value": pa.array(np.round(rng.exponential(50, n_ev), 2), pa.float64()),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
                          pa.string())})
    return tables


def main():
    import os
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    n_docs, n_vecs, out = int(args[0]), int(args[1]), args[2]
    star_mult = float(args[3]) if len(args) > 3 else None
    skew = "--skew" in flags
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    # documents/embeddings draw from the seed-42 stream in a fixed order,
    # so re-running never changes existing files; skip present files to
    # keep mtimes (and therefore artifact fingerprints) stable.
    docs = (gen_documents_skewed if skew else gen_documents)(n_docs, rng)
    vecs = (gen_embeddings_skewed if skew else gen_embeddings)(n_vecs, rng)
    wrote = []
    for name, t in [("documents", docs), ("embeddings", vecs)]:
        f = f"{out}/{name}.parquet"
        if os.path.exists(f):
            print(f"keep {f}")
        else:
            pq.write_table(t, f)
            wrote.append(name)
    if wrote:
        print(f"wrote {'+'.join(wrote)} ({n_docs} docs / {n_vecs} vecs) to {out} (skew={skew})")
    else:
        print(f"kept existing documents+embeddings in {out} (delete files to regenerate)")
    if star_mult is not None:
        srng = np.random.default_rng(4242)
        for name, t in gen_star(star_mult, srng, skew).items():
            f = f"{out}/{name}.parquet"
            if os.path.exists(f):
                print(f"keep {f}")
            else:
                pq.write_table(t, f)
                print(f"wrote {name}: {t.num_rows} rows")


if __name__ == "__main__":
    main()
