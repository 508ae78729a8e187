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

HOST-SPEED CALIBRATION (r14): every run opens with a fixed-work canary —
a deterministic CPU-bound Spark job over in-memory `range` data (no
parquet, no shuffle, 64 fixed partitions so the split is identical at
local[8] and local[32]), timed cold (first execution, includes codegen
JIT) and warm (median of 3), plus a single-partition JVM spin and a pure
Python spin loop — and re-times the warm parallel canary at the END of
the run to expose mid-run host drift. The canary work never changes, so
`host_factor = spark_cpu_warm_s / REF_CALIBRATION["spark_cpu_warm_s"]`
is this run's host-speed multiplier vs the reference host (r14 build
host, local[32], 2026-08-16): >1 means the host is running slow.
CAVEAT: the parallel canary folds CORE COUNT into the factor — that is
correct for the driver (same local[32] config every round, the
comparison that keeps getting re-litigated) and roughly right for the
parallel headline queries at any core count, but the single-threaded
streaming-ack normalizations are only meaningful against a
same-core-count reference; cross-core-count ack comparisons should
eyeball jvm_spin_warm_s (per-core speed) instead.
Normalization: `queries_normalized[q] = queries[q] / host_factor` (and
`value_normalized` likewise) — compare NORMALIZED numbers across rounds;
raw numbers remain for absolute SLO checks.

SCALING EVIDENCE (r16): the JSON line also carries `parallelism`
(master / defaultParallelism / shuffle partitions as the running session
resolved them) and a per-query `queries_build_s` / `queries_exec_s`
split — build is the driver-side `queries[name](...)` call (py4j
expression construction, analysis, and any driver actions an iterative
builder legitimately runs), exec is the noop write. The `queries`
medians keep the SAME timed region as every prior round (build + exec);
the split exists so a low-core probe can compare the parallel part
(exec) across core counts instead of reading ~1 ratios off build-heavy
entries. Three of five recent rounds
re-litigated whether a bench delta was code or host (r8 ab_drift,
r11-r12 submit_many, r13's uniform +28%); the canary settles that in
one glance.
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
    "d_minhash_lsh_neardup",       # MinHash-LSH near-dedup (one-scan pruned verify, 100 TB shape)
    "d_minhash_lsh_neardup_unpruned",  # A/B twin: full-corpus-join verify
    "d_duplicate_spans",           # ExactSubstr duplicated-span detection
    "d_duplicate_spans_hashed",    # same, xxhash64 gram keys (100 TB shape)
    "sim_cosine_topk_bruteforce",  # embedding top-k
    "t_quality_score",             # text quality features
    "t_bpe_ish_token_count",       # regex tokenizer counts
    "t_unigram_logprob",           # unigram-LM quality scoring
    "t_bm25_search",               # BM25 ranked retrieval (new r5)
    "q3_shipping_priority",        # TPC-H Q3: date-split join + top-k (new r5)
    "q21_waiting_suppliers",       # TPC-H Q21: EXISTS/NOT-EXISTS stack (new r5)
    "m_funnel_conversion",         # windowed ordered funnel (new r5)
    "sim_semantic_clusters",       # fixed-centroid clustering, flat codegen (new r5)
    "q5_local_supplier_volume",    # TPC-H Q5: co-location join chain (new r6)
    "o_zorder_layout",             # Morton clustering + skipping envelopes (new r6)
    "sim_power_iteration_topdir",  # distributed PCA power iteration (new r7)
    "g_kcore_bipartite",           # k-core interaction filtering (new r7)
    "o_skipping_index",            # zone-map / data-skipping stats build (new r7)
    "g_kcore_converged",           # fixpoint k-core, node-set convergence (new r10)
    "m_rfm_segmentation",          # chained distributed prefix-sum quartiles (new r10)
    "t_pretrain_pipeline",         # clean→dedup→quality→pack end to end (new r10)
    "sim_random_projection_topk",  # JL-projection ANN, HOF-fold projection (new r10)
    "m_dau_wau_mau",               # rolling distinct engagement, explode-not-range-join (new r10)
    "w_activity_streaks",          # gaps-and-islands streaks, partitioned window (new r10)
    "m_event_path_trigrams",       # clickstream trigram top-k, one window pass (new r10)
    "t_web_pipeline_real",         # WARC->HTTP->HTML->text, two mapInPandas passes (new r10)
    "m_holt_smoothing",            # level+trend forecast fold, recursive-CTE oracled (new r10)
    # r11: the heavy documented floors, rotated in so the driver tracks
    # them round-over-round (they are the entries most likely to regress
    # silently under operator refactors)
    "g_triangle_count",            # exact wedge join on a dense graph (~9-10 s floor)
    "d_fuzzy_dedup_clusters",      # LSH pairs -> unrolled min-label clustering
    "sim_semantic_neardup_pairs",  # blocked embedding near-dup (pair-count floor)
    "sim_ann_ivfadc_topk",         # IVF probe x PQ ADC (FAISS-default composition)
    "d_persisted_neardup_md5",     # incremental dedup against stored signatures (new r11)
    "sim_ann_lsh_topk",            # multi-table SRP index; plan-build-sensitive path (r11 fix)
    "d_simhash_fingerprints_md5",  # simhash votes/pack as single parsed exprs (r11 fix)
    "j_bloom_prefilter_join",      # broadcast bloom fact-scan pre-filter (new r11)
    "d_semdedup_keepers",          # SemDeDup component keepers on the semantic graph (new r11)
    "d_lsh_recall_audit",          # banding recall vs exact ground truth (new r11; a recall collapse = real regression)
    # r12
    "d_idf_weighted_neardup",      # Bayardo prefix-filtered all-pairs (r12; tracks the filter's stage overhead vs pair cut)
    "sim_ivf_recall_audit",        # IVF recall@10 vs brute force (r12; the ANN-quality canary)
    "g_degree_assortativity",      # wedge-join pair build + checkpoint reuse (r12; a lazy regression re-runs it 4x)
    "sim_kmeans_step_audit",       # Lloyd update under the janino materialize barrier (r12; a recompile tax shows as +2s)
    "a_mann_whitney_u",            # distributed_prefix_sum machinery under load (r13)
    "sim_filtered_ann_topk",       # pre-filtered vector search: pushdown + broadcast queries (r13)
    # r14
    "sim_blocked_pairs_recall_audit",  # max_block recall vs uncapped truth (r14; a recall collapse = real sub-blocking regression)
    # r15
    "g_degree_gini",               # hub concentration on the shared prefix-sum machinery (r15)
    "t_hapax_ratio",               # once-seen vocabulary share, pure-integer ppm (r15)
    "mm_phash_neardup",            # image aHash near-dup: real-decode mapInPandas + 16-bit banding (r15)
    "sim_rrf_fusion_topk",         # dual-scored cross join + two windows on one exchange (r15)
    "a_kruskal_wallis",            # k-arm rank channels on the shared prefix machinery (r15)
    "es_debounce_fold",            # ninth-twin batch fold: sorted-stream kernel throughput (r15)
]

N_RUNS = 3

# Fixed-work canary reference times (r14 build host, local[32],
# 2026-08-16). The canary's work is pinned (row counts + partition count
# below), so any host's warm time divided by these is its speed factor.
REF_CALIBRATION = {
    "spark_cpu_warm_s": 1.92,  # 12.8B xxhash64 max, 64 partitions
    "jvm_spin_warm_s": 0.55,  # 200M xxhash64 max, 1 partition
    "python_spin_s": 0.45,  # 2M-iteration pure-Python mix loop
}


def _py_spin() -> int:
    """Pure-Python fixed-work loop — host single-core + interpreter speed
    (the Arrow/pandas handler paths are Python-bound, so a Python-side
    slowdown shows here even when the JVM canary is flat)."""
    x = 0
    for i in range(2_000_000):
        x = (x ^ i) * 1103515245 % 2147483648
    return x


def _calibration_par(spark) -> None:
    """THE parallel canary workload — one definition shared by the
    start-of-run probe and the end-of-run drift re-probe, so retuning
    the workload can never desynchronize the two factors (review
    finding). Retune row/partition counts ONLY together with
    REF_CALIBRATION."""
    spark.range(0, 12_800_000_000, numPartitions=64).selectExpr(
        "max(xxhash64(id)) AS h"
    ).collect()


def calibration_probe(spark) -> dict:
    """Time the fixed-work canaries (see module docstring). Returns the
    raw probe times plus host_factor (this host's warm parallel canary
    over the reference host's). Cold = first execution of the plan shape
    this session (includes whole-stage-codegen JIT); warm = median of 3.
    """
    import statistics as st

    def t(job) -> float:
        s = time.perf_counter()
        job()
        return time.perf_counter() - s

    def par():
        _calibration_par(spark)

    def one():
        spark.range(0, 200_000_000, numPartitions=1).selectExpr(
            "max(xxhash64(id)) AS h"
        ).collect()

    cold_par = t(par)
    warm_par = st.median(t(par) for _ in range(3))
    cold_one = t(one)
    warm_one = st.median(t(one) for _ in range(3))
    py = st.median(t(_py_spin) for _ in range(3))
    return {
        "spark_cpu_cold_s": round(cold_par, 3),
        "spark_cpu_warm_s": round(warm_par, 3),
        "jvm_spin_cold_s": round(cold_one, 3),
        "jvm_spin_warm_s": round(warm_one, 3),
        "python_spin_s": round(py, 3),
        "reference": REF_CALIBRATION,
        "host_factor": round(warm_par / REF_CALIBRATION["spark_cpu_warm_s"], 3),
    }


def bench_streaming(spark) -> dict:
    """CQRS streaming-engine bench against BASELINE.md §3's SLOs:

    - commands/s through run_stream (file-source commands stream, 8
      micro-batches, replies written per batch — the production shape of
      §3.1 minus the Kafka broker the sandbox lacks)
    - command-ack latency: per-micro-batch (commands visible → replies
      durable; SLO ≤ 1 s) and per send_command facade call (one-command
      micro-batch + commit + reply read — the interactive sendCommand path)
    - getState: same-batch visibility (read-your-writes — must reflect
      every committed command; surge's KTable lag is ≤ 3 s) and the point
      read's latency.
    """
    import shutil
    import statistics as st
    import tempfile

    from surge_spark.engine import SurgeEngine, SurgeModel
    from surge_spark.streaming.command_engine import CommandEngine
    from surge_spark.streaming.snapshot_store import SnapshotStore

    n_commands, n_batches, n_keys = 1024, 8, 128

    def process(state, cmd):
        return ([{"aggregate_id": cmd["aggregate_id"]}], False)

    def handle(state, ev):
        return {
            "aggregate_id": ev["aggregate_id"],
            "n": (state["n"] if state else 0) + 1,
        }

    root = tempfile.mkdtemp(prefix="surge-bench-stream-")
    try:
        # ---- warmup: the engine's hot paths (Arrow fold workers, parquet
        # committer, snapshot read) JIT/pool-start on first use, same as the
        # headline warmup pass amortizes codegen for the analytic queries —
        # a throwaway engine absorbs that so the measured numbers are
        # steady-state.
        warm = SurgeEngine(
            spark,
            SurgeModel(
                process_command=process,
                handle_event=handle,
                state_schema="aggregate_id string, n long",
                event_schema="aggregate_id string",
            ),
            f"{root}/warm-store",
        )
        for _ in range(3):
            warm.aggregate_for("w").send_command(kind="warm")

        # ---- streaming path: N commands in B files -> B micro-batches ----
        cmd_dir, ckpt, replies = (
            f"{root}/cmds", f"{root}/ckpt", f"{root}/replies"
        )
        rows = [
            (str(i % n_keys), f"cmd-{i:012d}") for i in range(n_commands)
        ]
        (
            spark.createDataFrame(rows, "aggregate_id string, command_id string")
            .repartition(n_batches)
            .write.parquet(cmd_dir)
        )
        # num_buckets sized to the key cardinality (128 keys): bucketing is
        # a deployment knob like shuffle partitions — 64 near-empty bucket
        # dirs just multiply file/listing overhead at this scale
        store = SnapshotStore(
            f"{root}/store",
            key_col="aggregate_id",
            num_buckets=16,
            delta_commits=16,
        )
        engine = CommandEngine(
            store,
            process_command=process,
            handle_event=handle,
            state_schema="aggregate_id string, n long",
            event_schema="aggregate_id string",
            key_col="aggregate_id",
            order_cols=["command_id"],
            # 128-cmd batches / 4 = 32-row Arrow batches: fewer python
            # round trips than 8 (A/B r7: median trigger 1.08 vs 1.14 s)
            fold_partitions=4,
        )
        stream = (
            spark.readStream.schema("aggregate_id string, command_id string")
            .option("maxFilesPerTrigger", 1)
            .parquet(cmd_dir)
        )
        t0 = time.perf_counter()
        q = engine.run_stream(stream, ckpt, replies_path=replies)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batch_s = [
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in (q.recentProgress or [])
            if p.get("numInputRows", 0) > 0
        ]
        busy = sum(batch_s) or wall

        # same-batch visibility: every committed command must be readable
        expected = n_commands // n_keys
        visible = all(
            (engine.get_state(spark, str(k)) or {}).get("n") == expected
            for k in (0, n_keys // 2, n_keys - 1)
        )
        reads = []
        for k in range(5):
            s = time.perf_counter()
            engine.get_state(spark, str(k))
            reads.append(time.perf_counter() - s)

        # ---- skewed (hot-key) streaming path: real command traffic is
        # Zipfian, and the per-key serial fold makes one hot aggregate a
        # straggler task (AQE is off inside foreachBatch, so no runtime
        # skew split). 50% of commands hit ONE key; same batch sizes as
        # the uniform block so the two ack medians are comparable.
        # Guarded separately (r4 lesson: one failure must never zero the
        # metrics already measured above) — a skew failure reports None
        # for the skew keys only.
        skew_batch_s, skew_busy, skew_err = [], None, None
        try:
            skew_rows = [
                ("hot" if i % 2 == 0 else str(i % n_keys), f"cmd-{i:012d}")
                for i in range(n_commands)
            ]
            (
                spark.createDataFrame(
                    skew_rows, "aggregate_id string, command_id string"
                )
                .repartition(n_batches)
                .write.parquet(f"{root}/cmds-skew")
            )
            skew_store = SnapshotStore(
                f"{root}/store-skew",
                key_col="aggregate_id",
                num_buckets=16,
                delta_commits=16,
            )
            skew_engine = CommandEngine(
                skew_store,
                process_command=process,
                handle_event=handle,
                state_schema="aggregate_id string, n long",
                event_schema="aggregate_id string",
                key_col="aggregate_id",
                order_cols=["command_id"],
                fold_partitions=4,
            )
            skew_stream = (
                spark.readStream.schema("aggregate_id string, command_id string")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{root}/cmds-skew")
            )
            t0 = time.perf_counter()
            sq = skew_engine.run_stream(skew_stream, f"{root}/ckpt-skew")
            sq.awaitTermination()
            skew_wall = time.perf_counter() - t0
            skew_batch_s = [
                p["durationMs"]["triggerExecution"] / 1000.0
                for p in (sq.recentProgress or [])
                if p.get("numInputRows", 0) > 0
            ]
            skew_busy = sum(skew_batch_s) or skew_wall
            hot_n = (skew_engine.get_state(spark, "hot") or {}).get("n")
            assert hot_n == n_commands // 2, hot_n
        except Exception as exc:  # noqa: BLE001 — skew block is additive
            skew_batch_s, skew_busy = [], None
            skew_err = str(exc).split("\n")[0][:200]

        # ---- facade path: sendCommand = one-command micro-batch ----
        facade = SurgeEngine(
            spark,
            SurgeModel(
                process_command=process,
                handle_event=handle,
                state_schema="aggregate_id string, n long",
                event_schema="aggregate_id string",
            ),
            f"{root}/facade-store",
            fold_partitions=4,
        )
        ref = facade.aggregate_for("acct-1")
        acks = []
        for _ in range(5):
            s = time.perf_counter()
            r = ref.send_command(kind="bump")
            acks.append(time.perf_counter() - s)
            assert r.is_success

        # ---- volume path: submit_many = ONE commit for the whole batch.
        # MEDIAN OF 3 CALLS (r12): the single-shot form declined three
        # consecutive driver rounds (1742->1297->984 cmds/s) while every
        # interleaved tree A/B showed no regression; a driver-conditions
        # profile (scripts/profile_submit_many.py) then showed session age
        # does NOT degrade the path (aged reused-engine medians ~2x the
        # cold number) and the whole decline lives inside the documented
        # 426-1675 single-shot spread — the metric was one draw from a
        # wide distribution. Median-of-3 matches the headline queries'
        # aggregation discipline.
        many_samples = []
        for _ in range(3):
            many = [(str(i % 256), {"kind": "bump"}) for i in range(2048)]
            s = time.perf_counter()
            results = facade.submit_many(many)
            many_samples.append(time.perf_counter() - s)
            assert all(r.is_success for r in results)
        many_s = st.median(many_samples)

        # ---- high-cardinality block (r11 VERDICT task 4): the blocks
        # above measure 128 keys / 16 buckets — a toy KTable. This one
        # seeds a 65 536-key snapshot (num_buckets=64, ~1k keys/bucket)
        # and re-measures the three SLO paths against it: batch ack
        # (driver-fold's batched arrow point read must PRUNE to the
        # touched buckets, not scan the snapshot), get_state (single-
        # bucket pyarrow fetch at cardinality), and submit_many over
        # 2048 DISTINCT keys (the distributed fold's latest-wins
        # aggregate + co-partitioned join at real snapshot width).
        # Guarded like the skew block: a failure here reports its own
        # error key and zeroes nothing above.
        hc: dict = {}
        try:
            hc_keys = 65536
            hc_eng = SurgeEngine(
                spark,
                SurgeModel(
                    process_command=process,
                    handle_event=handle,
                    state_schema="aggregate_id string, n long",
                    event_schema="aggregate_id string",
                ),
                f"{root}/hc-store",
                fold_partitions=4,
                num_buckets=64,
            )
            seed = spark.range(hc_keys).selectExpr(
                "CAST(id AS STRING) AS aggregate_id", "CAST(5 AS LONG) AS n"
            )
            hc_eng._store.commit(None, seed, "hc-seed", updates_unique=True)

            # batch ack at cardinality: 4 micro-batches x 128 commands on
            # spread-out keys (9973 is coprime to 65536 => all distinct)
            hc_cmds = f"{root}/hc-cmds"
            hc_rows = [
                (str((i * 9973) % hc_keys), f"cmd-{i:012d}")
                for i in range(512)
            ]
            (
                spark.createDataFrame(
                    hc_rows, "aggregate_id string, command_id string"
                )
                .repartition(4)
                .write.parquet(hc_cmds)
            )
            hc_stream = (
                spark.readStream.schema(
                    "aggregate_id string, command_id string"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(hc_cmds)
            )
            hq = hc_eng._engine.run_stream(hc_stream, f"{root}/hc-ckpt")
            hq.awaitTermination()
            hc_batch_s = [
                p["durationMs"]["triggerExecution"] / 1000.0
                for p in (hq.recentProgress or [])
                if p.get("numInputRows", 0) > 0
            ]
            # every streamed command folded on top of the seeded n=5
            probe_key = str((3 * 9973) % hc_keys)
            got = hc_eng._store.get_state(spark, probe_key)
            assert got is not None and got["n"] == 6, got

            hc_reads = []
            for i in range(7):
                k = str((i * 31337) % hc_keys)
                s = time.perf_counter()
                hc_eng._store.get_state(spark, k)
                hc_reads.append(time.perf_counter() - s)

            hc_many_samples = []
            for rep in range(3):
                hc_many = [
                    (str((rep * 2048 + i) % hc_keys), {"kind": "bump"})
                    for i in range(2048)
                ]
                s = time.perf_counter()
                hc_res = hc_eng.submit_many(hc_many)
                hc_many_samples.append(time.perf_counter() - s)
                assert all(r.is_success for r in hc_res)
            hc = {
                "hc_n_keys": hc_keys,
                "hc_batch_ack_s_median": (
                    round(st.median(hc_batch_s), 3) if hc_batch_s else None
                ),
                "hc_get_state_s_median": round(st.median(hc_reads), 4),
                "hc_submit_many_cmds_per_s": round(
                    2048 / st.median(hc_many_samples), 1
                ),
            }
        except Exception as exc:  # noqa: BLE001 — hc block is additive
            hc = {"hc_error": str(exc).split("\n")[0][:200]}
        return {
            "n_commands": n_commands,
            "n_batches": len(batch_s),
            "commands_per_s": round(n_commands / busy, 1),
            "stream_wall_s": round(wall, 3),
            "batch_ack_s_median": round(st.median(batch_s), 3) if batch_s else None,
            "skewed_batch_ack_s_median": (
                round(st.median(skew_batch_s), 3) if skew_batch_s else None
            ),
            "skewed_commands_per_s": (
                round(n_commands / skew_busy, 1) if skew_busy else None
            ),
            **({"skewed_error": skew_err} if skew_err else {}),
            "send_command_ack_s_median": round(st.median(acks), 3),
            "submit_many_cmds_per_s": round(len(many) / many_s, 1),
            "get_state_point_read_s_median": round(st.median(reads), 4),
            "state_visible_same_batch": visible,
            **hc,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("surge-spark-bench")
    queries = all_queries()

    # Host-speed canary FIRST (before any catalog query touches the JVM)
    # so the cold numbers mean "fresh session"; guarded like everything
    # else — a canary failure must not cost the bench line.
    try:
        calibration = calibration_probe(spark)
    except Exception as exc:  # noqa: BLE001
        calibration = {"error": str(exc).split("\n")[0][:200]}

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
    # r16 (VERDICT item 1): split each sample into plan-BUILD time (the
    # driver-side `queries[name](spark, sf_dir)` call — py4j Column
    # construction + analysis + any driver actions an iterative builder
    # runs) and EXEC time (the noop write). The timed region and the
    # reported `queries` medians are UNCHANGED (build + exec, same
    # boundaries as every prior round); the split is additive so a
    # low-core probe can read the parallel part: exec_s scales with
    # cores, build_s mostly does not (it is single-threaded driver
    # work), which is why whole-query c8/c32 ratios read ~1 on
    # build-heavy entries (the r15 suspect_cpus_ignored false positive).
    build_samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    exec_samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(N_RUNS):
        for name in HEADLINE:
            if name in errors:
                continue
            start = time.perf_counter()
            try:
                df = queries[name](spark, sf_dir)
                mid = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                errors[name] = str(exc).split("\n")[0][:300]
                continue
            end = time.perf_counter()
            samples[name].append(end - start)
            build_samples[name].append(mid - start)
            exec_samples[name].append(end - mid)

    times = {
        name: round(statistics.median(s), 3) for name, s in samples.items() if s
    }
    total = round(sum(times.values()), 3)
    build_times = {
        name: round(statistics.median(s), 3)
        for name, s in build_samples.items()
        if s
    }
    exec_times = {
        name: round(statistics.median(s), 3)
        for name, s in exec_samples.items()
        if s
    }
    try:
        streaming = bench_streaming(spark)
    except Exception as exc:  # noqa: BLE001 — streaming must not kill the line
        streaming = {"error": str(exc).split("\n")[0][:300]}

    # Re-time the warm parallel canary AFTER the full run: a gap between
    # start and end host_factor means the host drifted mid-bench (quote
    # the larger factor when attributing a slow round). Guarded on the
    # START probe having succeeded (r14 ADVICE): a host_factor_end with
    # no host_factor to compare against is a confusing partial record —
    # when the start probe errored, the whole calibration dict is just
    # {"error": ...} and the normalized block is skipped below too.
    try:
        if "host_factor" not in calibration:
            raise RuntimeError("start probe failed; skipping end probe")
        end_samples = []
        for _ in range(3):
            s = time.perf_counter()
            _calibration_par(spark)
            end_samples.append(time.perf_counter() - s)
        calibration["spark_cpu_warm_end_s"] = round(
            statistics.median(end_samples), 3
        )
        calibration["host_factor_end"] = round(
            calibration["spark_cpu_warm_end_s"]
            / REF_CALIBRATION["spark_cpu_warm_s"],
            3,
        )
    except Exception:  # noqa: BLE001
        pass

    factor = calibration.get("host_factor")
    normalized: dict = {}
    if factor and factor > 0:
        normalized = {
            "value_normalized": round(total / factor, 3),
            "queries_normalized": {
                n: round(v / factor, 3) for n, v in times.items()
            },
        }
        # the streaming SLO metrics, canary-adjusted (approximate — the
        # ack paths mix Python driver work with JVM compute, but a
        # uniform host slowdown moves both; raw values above remain the
        # absolute SLO check)
        for k in (
            "batch_ack_s_median",
            "skewed_batch_ack_s_median",
            "send_command_ack_s_median",
            "hc_batch_ack_s_median",
        ):
            v = streaming.get(k)
            if isinstance(v, (int, float)):
                streaming[k + "_normalized"] = round(v / factor, 3)
        for k in ("submit_many_cmds_per_s", "hc_submit_many_cmds_per_s"):
            v = streaming.get(k)
            if isinstance(v, (int, float)):
                streaming[k + "_normalized"] = round(v * factor, 1)
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
                # scaling-evidence contract (r16): the effective session
                # parallelism, straight from the running context — a
                # low-core probe can verify its core count took effect
                # without inferring it from the calibration canary — and
                # the per-query build/exec split (medians over the same
                # N_RUNS samples as `queries`; queries[q] ==
                # queries_build_s[q] + queries_exec_s[q] up to rounding).
                "parallelism": {
                    "master": spark.sparkContext.master,
                    "default_parallelism": spark.sparkContext.defaultParallelism,
                    "shuffle_partitions": int(
                        spark.conf.get("spark.sql.shuffle.partitions")
                    ),
                },
                "queries_build_s": build_times,
                "queries_exec_s": exec_times,
                "calibration": calibration,
                **normalized,
                "streaming": streaming,
                **({"errors": errors} if errors else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
