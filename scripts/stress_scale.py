"""Scale-stress the heaviest catalog entries beyond sf0.1 (r11 VERDICT
task 3): generate a synthetic sfX slice matching the driver testdata's
statistical shape (documents + embeddings + events + lineitem — the four
tables the heavy entries read), run the heavy set at sf0.1 AND sfX in one
session, and report per-entry wall ratios + the implied scaling exponent
log(t_X/t_0.1)/log(X/0.1).

The generated slice lives under /tmp (testdata is read-only) and is
DETERMINISTIC (seed 42) so re-runs compare. It is NOT oracle-grade data —
it exists to verify the documented scaling claims (wedge-join floors,
Sigma df^2 bounds, bucket caps, no janino recompiles at wider stages, no
driver OOM from an ungated broadcast), not correctness (the oracle gates
cover that at sf0.001/0.01).

Usage:
    python scripts/stress_scale.py [--scale 0.5] [--gen-only | --run-only]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "key", "vector", "small", "scan", "stream", "join", "customer",
    "filter", "order", "fast", "spark", "window", "a", "line", "query",
    "batch", "part", "column", "sort", "value", "hash", "slow", "group",
    "table", "agg", "the", "big", "index", "shard", "cache", "plan",
]
LANGS = ["en", "zh", "fr", "es", "de"]
TYPES = ["view", "click", "purchase", "signup", "error"]

HEAVY = [
    "g_triangle_count",
    "g_kcore_converged",
    "g_kcore_bipartite",
    "d_semdedup_keepers",
    "sim_ann_ivfadc_topk",
    "d_lsh_recall_audit",
    "d_persisted_neardup_md5",
    "j_interval_overlap_join",
    # r12 second-session additions: the new wedge-floor consumers and
    # the corpus-pair-scan audit
    "g_degree_assortativity",
    "g_katz_unrolled",
    "sim_pq_distortion_audit",
]


def gen(out_dir: str, scale: float) -> None:
    """Rows per table scale linearly from the sf0.1 reference counts
    (documents 5k, embeddings 2k, events 100k @ 1.5k users, lineitem 600k
    @ 147k orders x 20k parts)."""
    os.makedirs(out_dir, exist_ok=True)
    r = scale / 0.1
    rng = random.Random(42)
    nrng = np.random.default_rng(42)

    # documents: word salad over the observed 31-word vocab, 10-100 words,
    # ~1% planted near-dups (a prior doc with a few words mutated) so the
    # LSH recall audit has true pairs to find, like the driver corpus
    n_docs = int(5000 * r)
    texts, langs, sources = [], [], []
    for i in range(n_docs):
        if i > 10 and rng.random() < 0.01:
            base = texts[rng.randrange(max(1, i - 1000), i)].split()
            for _ in range(max(1, len(base) // 20)):
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
            texts.append(" ".join(base))
        else:
            n = rng.randint(10, 100)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(n)))
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )

    # embeddings: near-isotropic float32, dim 64, labels 0..9
    n_vec = int(2000 * r)
    emb = nrng.standard_normal((n_vec, 64)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(
                    nrng.integers(0, 10, n_vec), pa.int32()
                ),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    # events: 30 days, users scale with sf (1.5k @ sf0.1)
    n_ev = int(100_000 * r)
    n_users = int(1500 * r)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    ts = np.sort(nrng.integers(0, 30 * 86_400_000_000, n_ev)) + base_us
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(
                    nrng.integers(0, n_users, n_ev), pa.int64()
                ),
                "event_type": pa.array(
                    [TYPES[i] for i in nrng.integers(0, 5, n_ev)]
                ),
                "value": pa.array(
                    np.round(nrng.uniform(1, 200, n_ev), 2), pa.float64()
                ),
                "props": pa.array(
                    [f'{{"k": {int(k)}}}' for k in nrng.integers(0, 100, n_ev)]
                ),
            }
        ),
        f"{out_dir}/events.parquet",
    )

    # lineitem: ~4 lines/order, parts scale with sf (so the co-occurrence
    # graph keeps its mean degree ~120 — the density the triangle/kcore
    # floors are documented against)
    n_li = int(600_000 * r)
    n_orders = int(147_000 * r)
    n_parts = int(20_000 * r)
    n_supp = int(1000 * r)
    shipbase = 820_454_400  # ~1996 epoch secs
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    nrng.integers(0, n_orders, n_li), pa.int64()
                ),
                "l_partkey": pa.array(
                    nrng.integers(0, n_parts, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    nrng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    nrng.integers(1, 8, n_li), pa.int32()
                ),
                "l_quantity": pa.array(
                    np.floor(nrng.uniform(1, 51, n_li)), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    np.round(nrng.uniform(900, 105_000, n_li), 2),
                    pa.float64(),
                ),
                "l_discount": pa.array(
                    np.round(nrng.integers(0, 11, n_li) / 100.0, 2),
                    pa.float64(),
                ),
                "l_tax": pa.array(
                    np.round(nrng.integers(0, 9, n_li) / 100.0, 2),
                    pa.float64(),
                ),
                "l_returnflag": pa.array(
                    ["NAR"[i] for i in nrng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    ["OF"[i] for i in nrng.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(
                    (
                        shipbase
                        + nrng.integers(0, 7 * 365, n_li) * 86_400
                    )
                    * 1_000_000,
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{out_dir}/lineitem.parquet",
    )


def gen_tpch_dims(out_dir: str, scale: float) -> None:
    """The remaining TPC-H-ish tables the full bench headline reads
    (r12 task 2 — the heavy-set generator covered only the four tables
    the heavy entries touch). Shapes mirror the driver testdata: orders
    1.5M/sf, customer 150k/sf, part 200k/sf, supplier 10k/sf, nation 25,
    region 5."""
    r = scale / 0.1
    nrng = np.random.default_rng(43)
    n_orders = int(147_000 * r)
    n_cust = int(15_000 * r)
    n_part = int(20_000 * r)
    n_supp = int(1000 * r)
    datebase = 852_076_800  # 1997-01-01 epoch secs
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_custkey": pa.array(
                    nrng.integers(0, n_cust, n_orders), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    ["FPO"[i] for i in nrng.integers(0, 3, n_orders)]
                ),
                "o_totalprice": pa.array(
                    np.round(nrng.uniform(900, 400_000, n_orders), 2),
                    pa.float64(),
                ),
                "o_orderdate": pa.array(
                    (datebase + nrng.integers(0, 5 * 365, n_orders) * 86_400)
                    * 1_000_000,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [
                        ["1-URGENT", "2-HIGH", "3-MEDIUM",
                         "4-NOT SPECIFIED", "5-LOW"][i]
                        for i in nrng.integers(0, 5, n_orders)
                    ]
                ),
            }
        ),
        f"{out_dir}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    nrng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": pa.array(
                    np.round(nrng.uniform(-999, 9999, n_cust), 2),
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    [
                        ["FURNITURE", "MACHINERY", "AUTOMOBILE",
                         "BUILDING", "HOUSEHOLD"][i]
                        for i in nrng.integers(0, 5, n_cust)
                    ]
                ),
            }
        ),
        f"{out_dir}/customer.parquet",
    )
    adjectives = ["cold", "small", "large", "red", "green", "dim", "hot"]
    nouns = ["widget", "bolt", "gear", "spring", "plate", "cog"]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{adjectives[i % 7]} {nouns[(i // 7) % 6]}"
                        for i in range(n_part)
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{int(i)}" for i in nrng.integers(1, 26, n_part)]
                ),
                "p_type": pa.array(
                    [
                        ["ECONOMY", "PROMO", "STANDARD", "SMALL", "MEDIUM"][i]
                        for i in nrng.integers(0, 5, n_part)
                    ]
                ),
                "p_size": pa.array(
                    nrng.integers(1, 51, n_part), pa.int32()
                ),
                "p_retailprice": pa.array(
                    np.round(900 + np.arange(n_part) * 0.1, 2), pa.float64()
                ),
            }
        ),
        f"{out_dir}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(
                    nrng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": pa.array(
                    np.round(nrng.uniform(-999, 9999, n_supp), 2),
                    pa.float64(),
                ),
            }
        ),
        f"{out_dir}/supplier.parquet",
    )
    names = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
        "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ",
        "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
        "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
        "UNITED KINGDOM", "UNITED STATES",
    ]
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array(names),
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int32()
                ),
            }
        ),
        f"{out_dir}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
        f"{out_dir}/region.parquet",
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.5)
    p.add_argument("--gen-only", action="store_true")
    p.add_argument("--run-only", action="store_true")
    p.add_argument("--names", nargs="*", default=HEAVY)
    p.add_argument(
        "--headline",
        action="store_true",
        help="run bench.py's full HEADLINE list instead of the heavy set",
    )
    p.add_argument(
        "--reps",
        type=int,
        default=2,
        help="warm interleaved reps per (entry, scale); the reported time "
        "is the median — never single-pass (the r12 cold-JIT lesson)",
    )
    args = p.parse_args()
    if args.headline:
        import sys as _sys

        _sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        import bench

        args.names = list(bench.HEADLINE)

    out_dir = f"/tmp/stressdata/sf{args.scale}"
    if not args.run_only:
        t0 = time.perf_counter()
        gen(out_dir, args.scale)
        gen_tpch_dims(out_dir, args.scale)
        print(f"generated {out_dir} in {time.perf_counter() - t0:.1f} s")
    if args.gen_only:
        return

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from surge_spark.queries import all_queries
    from surge_spark.session import get_spark

    spark = get_spark("stress-scale")
    queries = all_queries()
    # warm every shape at sf0.001 (codegen + python pools), like bench.py
    for name in args.names:
        queries[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    import statistics as st

    out = {}
    for name in args.names:
        # WARM INTERLEAVED (r12 lesson: single-pass exponents are polluted
        # by first-entry cold JIT — semdedup printed 0.90 and 1.9 in two
        # single-pass runs; warm interleaved gives ~1.1): alternate
        # t01,tX per rep, report the per-tag MEDIAN.
        samples: dict[str, list[float]] = {"t01": [], "tX": []}
        row: dict = {}
        for _rep in range(max(1, args.reps)):
            for tag, d in (("t01", "/root/testdata/sf0.1"), ("tX", out_dir)):
                t0 = time.perf_counter()
                try:
                    queries[name](spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    samples[tag].append(time.perf_counter() - t0)
                except Exception as exc:  # noqa: BLE001
                    row[f"{tag}_err"] = str(exc).split("\n")[0][:200]
        for tag in ("t01", "tX"):
            row[tag] = round(st.median(samples[tag]), 2) if samples[tag] else None
        if row.get("t01") and row.get("tX"):
            row["ratio"] = round(row["tX"] / row["t01"], 2)
            row["exponent"] = round(
                math.log(row["tX"] / row["t01"]) / math.log(args.scale / 0.1), 2
            )
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({"scale": args.scale, "results": out}))


if __name__ == "__main__":
    main()
