"""Similarity-search semantics: brute-force exactness on a constructed case,
LSH-ANN recall vs brute force on real embeddings."""

from __future__ import annotations

import pytest

import pandas as pd
from pyspark.sql import functions as F

from surge_spark.io import load_table
from surge_spark.operators import similarity as sim


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = sim.cosine_topk(df, df.where(F.col("vec_id") == 0), "vec_id", "embedding", k=3)
    got = out.toPandas().sort_values("rank")
    assert list(got.corpus_id) == [1, 2, 3]
    assert got.iloc[0].cosine > 0.99
    assert abs(got.iloc[1].cosine) < 1e-9
    assert got.iloc[2].cosine == -1.0


def test_ann_lsh_recall(spark, sf_dir):
    """ANN recall@10 vs brute force on the real embeddings. Random-ish
    vectors are the adversarial case for sign-LSH (true neighbors barely
    exceed ambient cosine), so recall needs few planes + more tables:
    measured 0.64 @ (4 planes, 8 tables), 0.86 @ (4, 12). Clustered corpora
    (the production case) do far better at (8, 4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    bf = sim.cosine_topk(emb, queries, "vec_id", "embedding", k=10).toPandas()
    ann = sim.ann_topk_lsh(
        emb, queries, "vec_id", "embedding", k=10, n_planes=4, n_tables=8
    ).toPandas()
    bf_set = {(q, c) for q, c in zip(bf.query_id, bf.corpus_id)}
    ann_set = {(q, c) for q, c in zip(ann.query_id, ann.corpus_id)}
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_embedding_neardup_blocks(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.999, 0.01], 1),   # near-dup of 0, same block
        (2, [1.0, 0.0], 2),      # identical direction but different block
        (3, [0.0, 1.0], 1),      # same block, dissimilar
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    out = sim.embedding_neardup_pairs(df, "vec_id", "embedding", "label", 0.99).toPandas()
    pairs = {(a, b) for a, b in zip(out.id_a, out.id_b)}
    assert pairs == {(0, 1)}  # cross-block identical pair not compared


def test_embedding_neardup_max_block_identity_when_unbinding(spark, sf_dir):
    """A max_block larger than every block is a no-op: identical pairs and
    cosines to the uncapped run (the sub-block key only splits blocks that
    exceed the cap)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    base = sim.embedding_neardup_pairs(
        emb, "vec_id", "embedding", "label", 0.5
    ).toPandas()
    capped = sim.embedding_neardup_pairs(
        emb, "vec_id", "embedding", "label", 0.5, max_block=10_000_000
    ).toPandas()
    key = lambda d: sorted(zip(d.id_a, d.id_b, d.cosine))  # noqa: E731
    assert key(base) == key(capped)


def test_embedding_neardup_max_block_bounds_pairs_keeps_block_recall(spark):
    """A binding cap still emits pairs from the oversized block (sub-blocked,
    not dropped), every surviving pair is a true uncapped pair, and the
    within-sub-block fraction survives."""
    import pandas as pd

    rows = [(i, [1.0, float(i) * 1e-4], 1) for i in range(40)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    full = sim.embedding_neardup_pairs(
        df, "vec_id", "embedding", "label", 0.99
    ).toPandas()
    capped = sim.embedding_neardup_pairs(
        df, "vec_id", "embedding", "label", 0.99, max_block=10
    ).toPandas()
    full_pairs = {(a, b) for a, b in zip(full.id_a, full.id_b)}
    capped_pairs = {(a, b) for a, b in zip(capped.id_a, capped.id_b)}
    assert capped_pairs, "cap must sub-block, not drop, the oversized block"
    assert capped_pairs < full_pairs  # strict subset: bounded work
    # expected survival ~1/splits (4 splits of 40): well above 1/10, below 1
    assert len(capped_pairs) >= len(full_pairs) / 10


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_ann_ivf_recall(spark, sf_dir):
    """IVF recall@10 vs brute force. With 8 cells and probe 4, each query
    scans ~half the corpus; on random-ish vectors (the adversarial case —
    near-uniform cosine) recall stays well above the probed fraction
    because true neighbors concentrate in the nearest cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    bf = sim.cosine_topk(emb, queries, "vec_id", "embedding", k=10).toPandas()
    ivf = sim.ann_topk_ivf(
        emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4, iters=2
    ).toPandas()
    bf_set = {(q, c) for q, c in zip(bf.query_id, bf.corpus_id)}
    ivf_set = {(q, c) for q, c in zip(ivf.query_id, ivf.corpus_id)}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # index reuse: training once and passing centroids gives the same answer
    cents = sim.ivf_train(emb, "embedding", n_cells=8, iters=2)
    again = sim.ann_topk_ivf(
        emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4,
        centroids=cents,
    ).toPandas()
    assert {(q, c) for q, c in zip(again.query_id, again.corpus_id)} == ivf_set


def test_ivf_cell_assignment_is_nearest(spark):
    """Map-side cell fold picks the argmax-cosine centroid."""
    import pandas as pd

    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    cents = [[1.0, 0.0], [0.0, 1.0]]
    u = sim.with_unit_vector(df, "embedding")
    got = {
        r.vec_id: r.cell
        for r in sim._assign_cell(u, "unit", cents).collect()
    }
    # [-1,0] has cosine -1 to cell 0 and 0 to cell 1 → cell 1 wins
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def _clustered_fixture(spark, n_clusters=8, per_cluster=25, dim=32, noise=0.05):
    """Deterministic corpus with REAL cosine structure: unit base directions
    plus small noise. (The sf testdata embeddings are near-orthogonal — max
    pairwise cosine ~0.48, and `label` does not track cosine geometry — so
    clustering/recall semantics must be tested on a constructed corpus.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    bases = rng.normal(size=(n_clusters, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    for ci in range(n_clusters):
        for j in range(per_cluster):
            v = bases[ci] + noise * rng.normal(size=dim)
            rows.append((ci * per_cluster + j, ci, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id bigint, truth int, embedding array<double>"
    )
    return df, rows


def test_semantic_clusters_recover_structure(spark):
    """Spherical k-means must recover planted clusters: high mean
    majority-truth share per cell, and cluster_size consistent per cell."""
    df, _ = _clustered_fixture(spark)
    out = sim.semantic_clusters(df, "vec_id", "embedding", n_cells=8, iters=4)
    joined = out.join(
        df.select(F.col("vec_id").alias("id"), "truth"), "id"
    ).toPandas()
    assert len(joined) == 200
    assert (joined.groupby("cluster")["cluster_size"].nunique() == 1).all()
    purity = (
        joined.groupby("cluster")["truth"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .mean()
    )
    assert purity > 0.8, purity


def test_semantic_neardup_recall_vs_bruteforce(spark):
    """Learned k-means blocking must recover most of the brute-force exact
    near-dup pairs (a pair is lost only when k-means splits a planted
    cluster across cells)."""
    import numpy as np

    df, rows = _clustered_fixture(spark)
    vecs = np.array([r[2] for r in rows])
    units = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = units @ units.T
    ids = np.array([r[0] for r in rows])
    ia, ib = np.where(np.triu(cos >= 0.8, k=1))
    t = set(zip(ids[ia].tolist(), ids[ib].tolist()))
    assert len(t) > 100, "fixture must contain near-dup pairs"
    got = sim.semantic_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.8, n_cells=8, iters=4
    ).toPandas()
    g = {(min(a, b), max(a, b)) for a, b in zip(got.id_a, got.id_b)}
    ia2, ib2 = np.where(np.triu(cos >= 0.8 - 1e-5, k=1))  # rounding slack
    t_loose = set(zip(ids[ia2].tolist(), ids[ib2].tolist()))
    assert g <= t_loose  # no false positives vs exact cosine
    assert len(t & g) / len(t) >= 0.6, (len(t & g), len(t))


def test_pq_encode_nearest_codeword_and_ties(spark):
    """pq_encode must pick the L2-nearest codeword per subspace, ties to
    the LOWEST id: vectors constructed to sit exactly on a codeword must
    encode to that codeword's id in every subspace."""
    from surge_spark.queries.similarity import FIXED_CBS

    # a vector whose every subspace equals codeword j of that subspace is
    # (after unit normalization, which rescales all subspaces equally)
    # still nearest to codeword j under dot - ||c||^2/2 among norm-equal
    # codewords
    for j in (0, 3, 7):
        vec = [x for cb in FIXED_CBS for x in cb[j]]
        df = spark.createDataFrame(
            pd.DataFrame([(0, vec)], columns=["vec_id", "embedding"])
        )
        out = sim.pq_encode(
            sim.with_unit_vector(df, "embedding"), "unit", FIXED_CBS
        ).toPandas()
        got = [int(out[f"code_{m}"][0]) for m in range(len(FIXED_CBS))]
        assert got == [j] * len(FIXED_CBS), got


def test_pq_adc_ranks_planted_duplicate_first(spark):
    """ADC faithfulness: an exact duplicate of the query vector shares all
    its PQ codes, so its approximate IP is the maximum any corpus vector
    can score — it must rank 1."""
    import math as _m

    from surge_spark.queries.similarity import FIXED_CBS

    dim = 64
    base = [
        [_m.sin(0.5 + 17 * i + d) for d in range(dim)] for i in range(40)
    ]
    rows = [(i, v) for i, v in enumerate(base)]
    rows.append((100, list(base[7])))  # exact duplicate of vec 7
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    queries = corpus.where(F.col("vec_id") == 7)
    out = (
        sim.ann_topk_pq(corpus, queries, "vec_id", "embedding", FIXED_CBS, k=5)
        .toPandas()
        .sort_values("rank")
    )
    assert int(out.iloc[0].corpus_id) == 100
    # the duplicate's ADC score is the self-score: no other candidate beats it
    assert out.iloc[0].approx_ip >= out.approx_ip.max() - 1e-9


def test_power_iteration_matches_numpy_twin(spark, sf_dir):
    """sim.power_iteration_topdir == the identical algorithm in numpy
    (same v0, same 2 rounds) to ~1e-6, and after 2 rounds the direction
    is already well aligned with the true dominant eigenvector of X'X."""
    import numpy as np

    from surge_spark.io import load_table
    from surge_spark.operators import similarity as sim
    from surge_spark.queries.similarity import FIXED_V0

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r.component: r.loading
        for r in sim.power_iteration_topdir(
            emb, "vec_id", "embedding", FIXED_V0, steps=2
        ).collect()
    }
    X = np.array(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    v = np.array(FIXED_V0)
    for _ in range(2):
        w = X.T @ (X @ v)
        v = w / np.linalg.norm(w)
    spark_v = np.array([got[k] for k in range(X.shape[1])])
    assert np.abs(spark_v - v).max() < 1e-6
    # power iteration's guarantee: the Rayleigh quotient never decreases
    # round over round (the synthetic embeddings are near-isotropic — a
    # flat spectrum — so full top-eigenvector ALIGNMENT after 2 rounds is
    # not a property of this data and is deliberately not asserted)
    def rayleigh(u):
        return float(u @ (X.T @ (X @ u))) / float(u @ u)

    assert rayleigh(spark_v) >= rayleigh(np.array(FIXED_V0)) - 1e-9


def test_random_projection_preserves_planted_neighbors(spark):
    """JL projection neighbor preservation where it is actually testable:
    on PLANTED near-duplicates. The testdata corpus is near-isotropic
    (random directions), so recall against full-space brute force is
    ~chance by construction — instead, plant tiny perturbations of base
    vectors and assert each base's top-1 in the 16-d projected space is
    its planted twin. Also pins the HOF-fold projection against a numpy
    matmul twin to 1e-9 (same literal matrix, same math)."""
    import math as _m

    import numpy as np
    from pyspark.sql import Window as W

    from surge_spark.queries.similarity import FIXED_PROJ, _proj_cols_sql

    dim = 64
    base = [[_m.sin(3.0 + 11 * i + d) for d in range(dim)] for i in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    # planted twins: id 100+i is base i plus a tiny deterministic nudge
    for i, v in enumerate(base):
        rows.append((100 + i, [x + 0.001 * _m.sin(7.0 * d + i) for d, x in enumerate(v)]))
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )

    n = len(FIXED_PROJ)

    def hof_dot(row):
        arr = "array(" + ",".join(repr(x) + "D" for x in row) + ")"
        return (
            f"aggregate(zip_with(embedding, {arr}, "
            "(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x)"
        )

    proj = corpus.select(
        "vec_id", *[F.expr(hof_dot(FIXED_PROJ[j])).alias(f"p{j}") for j in range(n)]
    )
    got = {r.vec_id: [r[f"p{j}"] for j in range(n)] for r in proj.collect()}
    # numpy twin of the projection itself
    m = np.array(FIXED_PROJ)
    for i, v in rows:
        want = m @ np.array(v)
        assert np.allclose(got[i], want, atol=1e-9), i

    # projected-space top-1 of every base vector is its planted twin
    q = proj.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), *[F.col(f"p{j}").alias(f"q{j}") for j in range(n)]
    )
    c = proj.select(
        F.col("vec_id").alias("corpus_id"), *[F.col(f"p{j}").alias(f"c{j}") for j in range(n)]
    )
    dot, nq, nc = _proj_cols_sql()
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cos_raw", F.expr(f"{dot} / ({nq} * {nc})"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("corpus_id"))
    top1 = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") == 1)
        .collect()
    )
    assert len(top1) == 20
    for r in top1:
        assert r.corpus_id == r.query_id + 100, (r.query_id, r.corpus_id)


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_ivf_recall_audit_cross_entry_consistency(spark, sf_dir):
    """The audit's recall must equal what the two PUBLIC entries imply:
    |sim_ann_ivf_topk ∩ sim_cosine_topk_bruteforce| per query (same
    queries, same k, same fixed centroids). Also: n_exact == 10 whenever
    the corpus has >= 11 vectors, n_found <= n_exact, ppm is exact."""
    from surge_spark.queries import all_queries

    q = all_queries()
    audit = {r.query_id: r for r in q["sim_ivf_recall_audit"](spark, sf_dir).collect()}
    ivf = q["sim_ann_ivf_topk"](spark, sf_dir).collect()
    bf = q["sim_cosine_topk_bruteforce"](spark, sf_dir).collect()
    ivf_set = {(r.query_id, r.corpus_id) for r in ivf}
    by_q: dict = {}
    for r in bf:
        by_q.setdefault(r.query_id, set()).add(r.corpus_id)
    assert audit
    for qid, r in audit.items():
        assert r.n_exact == 10
        assert 0 <= r.n_found <= r.n_exact
        assert r.recall_ppm == r.n_found * 1_000_000 // r.n_exact
        expect = sum(1 for c in by_q[qid] if (qid, c) in ivf_set)
        assert r.n_found == expect, (qid, r.n_found, expect)


def test_centroid_drift_near_orthogonal_on_isotropic(spark, sf_dir):
    """The synthetic corpus is near-isotropic, so two independent halves'
    centroids are small near-random vectors — the cosine must be well
    inside (-1, 1) (a |cos| of 1.0 would mean the halves are collinear,
    i.e. the parity split leaked structure)."""
    from surge_spark.queries import all_queries

    rows = all_queries()["sim_centroid_drift"](spark, sf_dir).collect()
    assert rows and all(abs(r.centroid_cosine) < 0.999999 for r in rows)


def test_pq_distortion_bounds(spark, sf_dir):
    """Audit-family contract: every query covers the full corpus minus
    itself, errors are nonnegative with mean <= max, and the max ADC gap
    stays inside the geometric bound (both scores are cosines of unit
    vectors built from half-norm codewords, so |gap| can never exceed 2)."""
    from surge_spark.io import load_table
    from surge_spark.queries import all_queries

    n = load_table(spark, sf_dir, "embeddings").count()
    rows = all_queries()["sim_pq_distortion_audit"](spark, sf_dir).collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3, 4}
    for r in rows:
        assert r.n_pairs == n - 1
        assert 0 <= r.mean_abs_err <= r.max_abs_err <= 2.0


def test_rq_distortion_monotone_improvement(spark, sf_dir):
    """The RQ audit's structural invariants: stage 2 can only improve
    (code 0 is the zero vector, so sq_err_rq <= sq_err_stage1 on EVERY
    row), errors are non-negative, and stage 2 is non-vacuous (some
    vector picks a non-zero second code)."""
    from surge_spark.queries import all_queries

    out = all_queries()["sim_rq_distortion_audit"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.sq_err_rq <= out.sq_err_stage1 + 1e-9).all()
    assert (out.sq_err_rq >= -1e-9).all()
    assert (out.code2 > 0).any(), "stage 2 never chosen — vacuous codebook"
    assert out.code1.between(0, 7).all() and out.code2.between(0, 8).all()


def test_rrf_fusion_contract(spark, sf_dir):
    """RRF: score re-derives from the shipped ranks (1/(60+r) terms);
    every query ships exactly 10 rows; a doc ranked 1 by BOTH systems
    must fuse to rank 1 (it holds the maximum possible RRF)."""
    from surge_spark.queries import all_queries

    rows = all_queries()["sim_rrf_fusion_topk"](spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        expect = round(
            (1 / (60 + r.rank_full) if r.rank_full is not None else 0)
            + (1 / (60 + r.rank_prefix) if r.rank_prefix is not None else 0),
            6,
        )
        assert abs(r.rrf - expect) < 1e-12
        assert r.rank_full is None or 1 <= r.rank_full <= 20
        assert r.rank_prefix is None or 1 <= r.rank_prefix <= 20
        if r.rank_full == 1 and r.rank_prefix == 1:
            assert r.rank == 1
    for q, rs in per_q.items():
        assert len(rs) == 10
        assert sorted(r.rank for r in rs) == list(range(1, 11))


def test_ivf_nprobe_curve_contract(spark, sf_dir):
    """The tuning curve is monotone nondecreasing in nprobe per query;
    nprobe=8 probes every cell so its recall is EXACTLY 1e6 ppm; the
    probe-4 row agrees with sim_ivf_recall_audit."""
    from surge_spark.queries import all_queries

    rows = all_queries()["sim_ivf_nprobe_curve"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.nprobe] = r.recall_ppm
    assert by_q
    for q, curve in by_q.items():
        assert sorted(curve) == [1, 2, 4, 8]
        seq = [curve[p] for p in (1, 2, 4, 8)]
        assert all(a <= b for a, b in zip(seq, seq[1:]))
        assert curve[8] == 1_000_000
    audit = {
        r.query_id: r.recall_ppm
        for r in all_queries()["sim_ivf_recall_audit"](spark, sf_dir).collect()
    }
    for q, curve in by_q.items():
        assert curve[4] == audit[q]
