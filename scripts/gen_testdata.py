#!/usr/bin/env python3
"""Builder-local THIRD-DECADE fixture generator (round-14 verdict ask #4).

/root/testdata is driver-owned and read-only, and it stops at sf0.1 —
one measured decade (sf0.01 -> sf0.1) for ScalingAudit. A scaling claim
extrapolated from one decade can hide a ratio that GROWS decade over
decade, so this script synthesizes a LARGER scale factor with the same
schema, key ranges, and distribution shapes as the driver fixtures
(measured from /root/testdata/sf0.1 — see the constants below), letting
ScalingAudit measure a second decade locally:

    python3 scripts/gen_testdata.py 0.3 /tmp/graft_sf0.3
    ... ScalingAudit /root/testdata/sf0.1 /tmp/graft_sf0.3 <queries>

It reuses only PUBLIC shape facts observed in the fixtures: TPC-H-ish
key ranges (custkey = 150k*sf, partkey = 200k*sf, suppkey = 10k*sf,
orders = 1.5M*sf with 1+Poisson(3) lines), a 30-day event stream with
exponential(50) values and five uniform types, a 31-word vocabulary
document corpus (41% en, rest uniform over zh/es/fr/de, 20 sources),
and 64-dim float embeddings clustered around 10 label centroids.

NOT bit-compatible with the driver's generator (seed/stream diff) —
this is a SCALING instrument, not a correctness fixture: oracle
hash-compares still run against the driver's own directories.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "zh", "es", "fr", "de"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def ts_us(arr_dt64us):
    return pa.array(arr_dt64us, type=pa.timestamp("us"))


def main(sf, out):
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_user = max(15, int(15_000 * sf))

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": REGIONS}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64())}))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer_{i}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"])[rng.integers(0, 5, n_cust)]}))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier_{i}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))
    write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"part {i}" for i in range(n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 6)])[
            rng.integers(0, 5, n_part)],
        "p_type": np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE",
                            "ECONOMY", "PROMO"])[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2)}))

    # orders: dates uniform 1995-01-01 .. 2001-08-01 (fixture range)
    day0 = np.datetime64("1995-01-01", "us")
    odate = day0 + (rng.integers(0, 2405, n_ord)
                    * np.int64(86_400_000_000)).astype("timedelta64[us]")
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_us(odate),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"])[rng.integers(0, 5, n_ord)]}))

    # lineitem: 1 + Poisson(3) lines per order (fixture shape, mean 4)
    nlines = 1 + rng.poisson(3.0, n_ord)
    lok = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    n_li = lok.size
    lno = (np.concatenate([np.arange(k) for k in nlines]) % 7 + 1)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "N", "A"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ts_us(np.repeat(odate, nlines)
                            + (rng.integers(1, 121, n_li)
                               * np.int64(86_400_000_000))
                            .astype("timedelta64[us]"))}))

    # events: 30 days of Jan 2024, exp(50) values, 5 uniform types
    ev0 = np.datetime64("2024-01-01", "us")
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ts_us(ev0 + rng.integers(
            0, 30 * 86_400_000_000, n_ev).astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, n_user, n_ev), pa.int64()),
        "event_type": np.array(["view", "click", "purchase", "signup",
                                "error"])[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    # documents: 8..96 words from the 31-word vocab; 41% en
    lang_p = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
    nw = rng.integers(8, 97, n_doc)
    texts = [" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), k)])
             for k in nw]
    write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=lang_p)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: 64-dim floats around 10 label centroids (fixture ±0.4)
    cents = rng.uniform(-0.25, 0.25, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (cents[labels]
            + rng.normal(0, 0.08, (n_emb, 64))).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))
    print(f"done: sf={sf} -> {out}")


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
