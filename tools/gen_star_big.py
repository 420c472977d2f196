#!/usr/bin/env python3
"""Chunked star-schema generator for the THIRD-decade star corpora
(sf100star = mult 1000: 150M orders / ~600M lineitems / 100M events).

gen_sf_local.py builds each table as ONE in-RAM pyarrow table — at
mult 1000 that peaks ~65 GB with Spark JVMs resident, so this variant
streams orders/lineitem/events through pq.ParquetWriter in chunks of
`CHUNK_MULT` (same schemas, same value domains, same seed stream
discipline: one rng per table, drawn sequentially). Chunked output is
also multi-row-group parquet — the r13 13e finding: row groups are the
local stand-in for cluster splits, so scans parallelize instead of
pinning to one task like sf10full's single-group files.

Dimensions (region/nation/customer/supplier/part) are one-shot — the
largest (part, 20M rows) is ~2 GB transient. documents/embeddings are
delegated to gen_sf_local (tiny here: the star corpora exist for the
q/e-family headliners; d/t/s-family decades live in sf100docs).

Usage: gen_star_big.py <outdir> <star_mult> [--skew]
"""
import os
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_sf_local import (REGIONS, SEGMENTS, PRIORITIES, PTYPES, PADJ, PNOUN,
                          _days, gen_documents, gen_embeddings)

CHUNK_MULT = 25  # 3.75M orders / ~15M lineitems / 2.5M events per chunk


def write_once(out, name, table):
    f = f"{out}/{name}.parquet"
    if os.path.exists(f):
        print(f"keep {f}")
        return
    pq.write_table(table, f)
    print(f"wrote {name}: {table.num_rows} rows")


def gen_dims(out, mult, rng):
    n_cust, n_supp, n_part = int(15000 * mult), int(1000 * mult), int(20000 * mult)
    write_once(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS, pa.string())}))
    write_once(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))
    write_once(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2), pa.float64()),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)], pa.string())}))
    write_once(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2), pa.float64())}))
    write_once(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{PADJ[int(a)]} {PNOUN[int(b)]}" for a, b in
                            zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
                           pa.string()),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
                            pa.string()),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)], pa.string()),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2), pa.float64())}))
    return n_cust, n_supp, n_part


def orders_chunk(rng, base, n, n_cust, skew):
    custkeys = rng.integers(0, n_cust, n)
    if skew:
        custkeys = np.where(rng.random(n) < 0.2, 0, custkeys)
    return pa.table({
        "o_orderkey": pa.array(np.arange(base, base + n, dtype=np.int64), pa.int64()),
        "o_custkey": pa.array(custkeys, pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n)], pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n), 2), pa.float64()),
        "o_orderdate": pa.array(_days(rng, n, "1995-01-01", "2001-08-01")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n)], pa.string())})


def lineitem_chunk(rng, okeys_base, n_ord, n_part, n_supp):
    nl = rng.poisson(4.0, n_ord)
    okeys = np.repeat(np.arange(okeys_base, okeys_base + n_ord, dtype=np.int64), nl)
    n_li = int(nl.sum())
    linenos = (np.arange(n_li) - np.repeat(np.cumsum(nl) - nl, nl) + 1).astype(np.int32)
    return pa.table({
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


def events_chunk(rng, base_id, n, n_users, t0_us, t1_us, skew):
    users = rng.integers(0, n_users, n)
    if skew:
        users = np.where(rng.random(n) < 0.2, 0, users)
    # per-chunk sorted timestamps within the chunk's slice of January —
    # the full file stays globally time-ordered like the driver's stream
    ts = (np.datetime64("2024-01-01T00:00:00", "ns") +
          np.sort(rng.integers(t0_us, t1_us, n)).astype("timedelta64[us]")
          ).astype("datetime64[ns]")
    return pa.table({
        "event_id": pa.array(np.arange(base_id, base_id + n, dtype=np.int64), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(np.array(["view", "click", "signup", "purchase", "error"])[
            rng.integers(0, 5, n)], pa.string()),
        "value": pa.array(np.round(rng.exponential(50, n), 2), pa.float64()),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)],
                          pa.string())})


def stream_chunks(out, name, chunks):
    f = f"{out}/{name}.parquet"
    if os.path.exists(f):
        print(f"keep {f}")
        return
    writer, rows = None, 0
    try:
        for t in chunks:
            if writer is None:
                writer = pq.ParquetWriter(f + ".tmp", t.schema)
            writer.write_table(t)
            rows += t.num_rows
    finally:
        if writer is not None:
            writer.close()
    os.rename(f + ".tmp", f)
    print(f"wrote {name}: {rows} rows ({(rows + 1) // 1} total)")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in sys.argv
    out, mult = args[0], float(args[1])
    os.makedirs(out, exist_ok=True)
    # tiny docs/vecs so the full 10-table contract (Verify, oracle views)
    # resolves; the star corpora are for the q/e-family decades
    drng = np.random.default_rng(42)
    for name, t in [("documents", gen_documents(1000, drng)),
                    ("embeddings", gen_embeddings(1000, drng))]:
        write_once(out, name, t)
    rng = np.random.default_rng(4242)
    n_cust, n_supp, n_part = gen_dims(out, mult, rng)
    n_ord, n_ev = int(150000 * mult), int(100000 * mult)
    n_users = int(1500 * mult)
    n_chunks = max(1, int(round(mult / CHUNK_MULT)))
    ord_per = n_ord // n_chunks
    ev_per = n_ev // n_chunks
    # one rng per streamed table: chunk boundaries change WHICH draws land
    # in which row vs the one-shot generator, but the corpus is
    # self-consistent and the oracle recomputes on the same files
    orng = np.random.default_rng(424201)
    stream_chunks(out, "orders",
                  (orders_chunk(orng, c * ord_per,
                                ord_per if c < n_chunks - 1 else n_ord - c * ord_per,
                                n_cust, skew)
                   for c in range(n_chunks)))
    lrng = np.random.default_rng(424202)
    stream_chunks(out, "lineitem",
                  (lineitem_chunk(lrng, c * ord_per,
                                  ord_per if c < n_chunks - 1 else n_ord - c * ord_per,
                                  n_part, n_supp)
                   for c in range(n_chunks)))
    erng = np.random.default_rng(424203)
    span_us = 30 * 86400 * 10**6
    stream_chunks(out, "events",
                  (events_chunk(erng, c * ev_per,
                                ev_per if c < n_chunks - 1 else n_ev - c * ev_per,
                                n_users,
                                c * (span_us // n_chunks),
                                (c + 1) * (span_us // n_chunks),
                                skew)
                   for c in range(n_chunks)))
    print(f"done: {out} mult={mult} skew={skew}")


if __name__ == "__main__":
    main()
