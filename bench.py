"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the noop sink (no driver collect overhead).
One warmup pass of every headline shape amortizes JVM/codegen startup out
of the per-query numbers; each query is then timed N_RUNS times and the
MEDIAN reported — single-shot numbers on a shared machine showed
run-to-run spreads of ±40% on sub-second queries, which made
round-over-round comparison meaningless noise.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from surge_spark.queries import all_queries  # noqa: E402
from surge_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "j_revenue_per_nation",        # multi-join + agg (flagship)
    "a_groupby_pricing_summary",   # wide hash aggregation
    "a2_latest_per_key",           # KTable compaction analog
    "w_topk_per_key",              # window top-k
    "j_asof_join",                 # as-of/range join
    "es_count_fold",               # per-key ordered fold (applyInPandas)
    "es_count_fold_vectorized",    # same fold lowered to all-JVM ops
    "h_session_windows",           # sessionization
    "d_exact_dedup",               # exact dedup
    "d_minhash_lsh_neardup",       # MinHash-LSH near-dedup (unpruned verify)
    "d_minhash_lsh_neardup_pruned",  # same, semi-join-pruned verify (100 TB shape)
    "d_duplicate_spans",           # ExactSubstr duplicated-span detection
    "sim_cosine_topk_bruteforce",  # embedding top-k
    "t_quality_score",             # text quality features
    "t_bpe_ish_token_count",       # regex tokenizer counts
    "t_unigram_logprob",           # unigram-LM quality scoring
]

N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("surge-spark-bench")
    queries = all_queries()

    # Warmup at the smallest SF: whole-stage codegen compiles per plan shape
    # and Arrow/python-worker pools start lazily — run every headline shape
    # once so the timed passes measure steady-state execution, not JIT.
    # Every execution is individually guarded: one broken query must cost
    # only its own datapoint, never the whole bench line (round 3 lost its
    # entire bench to a single warmup failure).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    errors: dict[str, str] = {}
    for name in HEADLINE:
        try:
            queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            # a warmup failure can be specific to the tiny scale (empty-input
            # edge); only exclude the query if it also fails at the benched SF
            try:
                queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc2:  # noqa: BLE001
                errors[name] = str(exc2).split("\n")[0][:300]
            # else: warmed up at sf_dir instead; query stays in the bench

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(N_RUNS):
        for name in HEADLINE:
            if name in errors:
                continue
            start = time.perf_counter()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                errors[name] = str(exc).split("\n")[0][:300]
                continue
            samples[name].append(time.perf_counter() - start)

    times = {
        name: round(statistics.median(s), 3) for name, s in samples.items() if s
    }
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs_per_query": N_RUNS,
                "aggregation": "median",
                **({"errors": errors} if errors else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
