"""Similarity-search semantics: brute-force exactness on a constructed case,
LSH-ANN recall vs brute force on real embeddings."""

from __future__ import annotations

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
        for r in sim._assign_cell(u, F.col("unit"), cents).collect()
    }
    # [-1,0] has cosine -1 to cell 0 and 0 to cell 1 → cell 1 wins
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}
