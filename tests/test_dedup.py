"""Dedup operator semantics: exact groups, MinHash-LSH recall vs exact
Jaccard ground truth, SimHash hamming locality."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from surge_spark.operators import dedup as dd


import pytest

# r16 fast-tier split (see pytest.ini): dedup pipeline end-to-end scenarios (~1.5 min)
pytestmark = pytest.mark.slow

def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"


def test_exact_dedup_groups(spark):
    df = _docs(spark, ["a b c", "a b c", "x y z", "A  b C!"])
    out = dd.exact_dedup(df, "doc_id", "text").toPandas()
    grp = out.set_index("content")
    assert grp.loc["a b c", "n_copies"] == 2
    assert grp.loc["a b c", "keeper_id"] == 0
    norm = dd.exact_dedup(df, "doc_id", "text", normalized=True).toPandas()
    assert norm.set_index("content").loc["a b c", "n_copies"] == 3


def test_minhash_lsh_finds_near_duplicates(spark):
    """Near-identical docs (1-word edit) must be found; unrelated docs not."""
    texts = [
        BASE,
        BASE.replace("today", "tonight"),  # near-dup of 0
        "completely different words about spark query engines and shuffles here",
        BASE,  # exact dup of 0
    ]
    out = dd.minhash_lsh_dedup(
        _docs(spark, texts), "doc_id", "text", n=3, threshold=0.5
    ).toPandas()
    pairs = {(a, b) for a, b in zip(out.id_a, out.id_b)}
    assert (0, 3) in pairs  # exact dup: jaccard 1.0
    assert (0, 1) in pairs and (1, 3) in pairs  # near dups
    assert all(2 not in p for p in pairs)


def test_pruned_verification_output_identical(spark, sf_dir):
    """prune_verification changes the PLAN (semi-join-pruned shingles), not
    the RESULT: both paths must return exactly the same verified pairs."""
    from surge_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    kw = dict(n=4, num_hashes=64, bands=16, threshold=0.5)
    unpruned = dd.minhash_lsh_dedup(
        docs, "doc_id", "text", prune_verification=False, **kw
    ).toPandas()
    pruned = dd.minhash_lsh_dedup(
        docs, "doc_id", "text", prune_verification=True, **kw
    ).toPandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        unpruned.sort_values(key).reset_index(drop=True),
        pruned.sort_values(key).reset_index(drop=True),
    )


def test_minhash_candidates_superset_of_high_jaccard(spark, sf_dir):
    """LSH recall on real data: every pair with exact jaccard >= 0.8 must be
    an LSH candidate (16 bands x 4 rows -> p(candidate) > 0.999 at j=0.8)."""
    from surge_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300)
    sh = dd.shingles(docs, "doc_id", "text", n=4)
    truth = (
        dd.jaccard_pairs(sh).where(F.col("jaccard") >= 0.8).select("id_a", "id_b").toPandas()
    )
    sig = dd.minhash_signatures(sh, 64)
    cands = dd.lsh_candidates(sig, 16, 4).toPandas()
    cand_set = {(a, b) for a, b in zip(cands.id_a, cands.id_b)}
    missed = [
        (a, b) for a, b in zip(truth.id_a, truth.id_b) if (a, b) not in cand_set
    ]
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """A hot cluster of near-identical boilerplate must not explode the pair
    space: with max_bucket below the cluster size, its band buckets are
    dropped entirely (the docs are exact dups that exact_dedup catches)."""
    texts = [BASE] * 60 + [
        "completely different words about spark query engines and shuffles here"
    ]
    sig = dd.minhash_signatures(
        dd.shingles(_docs(spark, texts), "doc_id", "text", n=3), 64
    )
    assert dd.lsh_candidates(sig, 16, 4, max_bucket=50).count() == 0
    assert dd.lsh_candidates(sig, 16, 4, max_bucket=None).count() == 60 * 59 // 2


def test_prune_verification_same_answer(spark):
    """The scale path (semi-join-pruned verification) must return exactly the
    pairs of the local path."""
    texts = [
        BASE,
        BASE.replace("today", "tonight"),
        "completely different words about spark query engines and shuffles here",
        BASE,
    ]
    docs = _docs(spark, texts)

    def run(prune):
        out = dd.minhash_lsh_dedup(
            docs, "doc_id", "text", n=3, threshold=0.5, prune_verification=prune
        ).toPandas()
        return sorted(zip(out.id_a, out.id_b, out.jaccard))

    assert run(True) == run(False)


def test_prune_verification_degenerate_threshold_no_zero_overlap_pairs(spark):
    """threshold <= 0 is the degenerate case where the one-scan pruned
    verification could emit zero-overlap candidate pairs (a pair survives
    the role join via either member's shingles and aggregates to
    jaccard=0.0) while the unpruned inner shingle-equality join never can.
    Pin equality at threshold 0 and that no emitted pair has jaccard 0."""
    texts = [
        BASE,
        BASE.replace("today", "tonight"),
        "completely different words about spark query engines and shuffles here",
        BASE,
    ]
    docs = _docs(spark, texts)

    def run(prune):
        out = dd.minhash_lsh_dedup(
            docs, "doc_id", "text", n=3, threshold=0.0, prune_verification=prune
        ).toPandas()
        assert (out.jaccard > 0).all()
        return sorted(zip(out.id_a, out.id_b, out.jaccard))

    assert run(True) == run(False)


def test_simhash_locality(spark):
    """Similar docs get close fingerprints (small hamming distance);
    dissimilar docs don't."""
    texts = [
        BASE,
        BASE.replace("today", "tonight"),
        "entirely unrelated content regarding database optimizers and columnar formats",
    ]
    out = dd.simhash(_docs(spark, texts), "doc_id", "text").toPandas().set_index("id")

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = hamming(int(out.loc[0, "simhash"]), int(out.loc[1, "simhash"]))
    far = hamming(int(out.loc[0, "simhash"]), int(out.loc[2, "simhash"]))
    # one-word edit on a 14-token doc: clearly closer than unrelated text
    assert near <= 16
    assert far > near + 4


def test_shingles_short_doc(spark):
    """Docs shorter than n tokens still produce one whole-text shingle."""
    out = dd.shingles(_docs(spark, ["one two"]), "doc_id", "text", n=4).toPandas()
    assert list(out.shingle) == ["one two"]


def test_repetition_score_known_values(spark):
    from surge_spark.operators.text import repetition_score

    rows = [
        (0, "a b c a b c a b c"),  # 9 toks → 7 3-grams, 3 distinct
        (1, "one two three four"),  # 4 toks → 2 3-grams, both distinct
        (2, "hi there"),  # short doc: 1 pseudo-gram
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = repetition_score(df, "doc_id", "text", n=3).toPandas().set_index("doc_id")
    assert (out.loc[0].n_ngrams, out.loc[0].n_distinct_ngrams) == (7, 3)
    assert out.loc[0].dup_ngram_fraction == round(4 / 7, 6)
    assert out.loc[1].dup_ngram_fraction == 0.0
    assert (out.loc[2].n_ngrams, out.loc[2].dup_ngram_fraction) == (1, 0.0)


def test_redact_pii_known_strings(spark):
    from surge_spark.operators.text import redact_pii

    rows = [
        (0, "mail me at jo.doe+x@example.co.uk or call +1 (555) 123-4567 now"),
        (1, "no pii here at all"),
        (2, "two mails: a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = redact_pii(df, "doc_id", "text").toPandas().set_index("doc_id")
    assert out.loc[0].redacted == "mail me at [REDACTED] or call [REDACTED] now"
    assert (out.loc[0].n_emails, out.loc[0].n_phones) == (1, 1)
    assert out.loc[1].redacted == "no pii here at all"
    assert (out.loc[2].n_emails, out.loc[2].redacted) == (2, "two mails: [REDACTED] [REDACTED]")


def test_decontaminate_flags_overlap(spark):
    bench = _docs(spark, [BASE])
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11],
                "text": [
                    BASE.replace("today", "tonight"),  # heavy 5-gram overlap
                    "entirely different content with no shared phrases at all here now",
                ],
            }
        )
    )
    out = (
        dd.decontaminate(train, bench, "doc_id", "text", n=5)
        .toPandas()
        .set_index("id")
    )
    assert bool(out.loc[10, "contaminated"]) and out.loc[10, "n_hit"] > 0
    assert not bool(out.loc[11, "contaminated"]) and out.loc[11, "n_hit"] == 0
    assert 0 < out.loc[10, "contamination"] <= 1


def test_tfidf_top_terms_known_ranking(spark):
    from surge_spark.operators.text import tfidf_top_terms

    # 'rare' appears only in doc 0 (idf=ln(3)); 'shared' in all docs (idf=0)
    df = spark.createDataFrame(
        [
            (0, "rare shared shared"),
            (1, "shared common common"),
            (2, "shared common other"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=2).toPandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    assert list(d0.term) == ["rare", "shared"]
    import math

    assert abs(d0.iloc[0].tfidf - round(math.log(3.0), 6)) < 1e-9
    assert d0.iloc[1].tfidf == 0.0  # shared: idf = ln(1) = 0


def test_stratified_sample_rates_and_determinism(spark):
    from surge_spark.operators.text import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(2000)],
        "doc_id bigint, lang string",
    )
    out = stratified_sample(
        df, "doc_id", "lang", {"en": 0.5, "zh": 0.1}
    ).toPandas()
    again = stratified_sample(
        df, "doc_id", "lang", {"en": 0.5, "zh": 0.1}
    ).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)  # deterministic
    en = (out.lang == "en").sum() / 1000
    zh = (out.lang == "zh").sum() / 1000
    assert 0.4 < en < 0.6, en
    assert 0.05 < zh < 0.16, zh


def test_stratified_sample_keep_all_rate(spark):
    from surge_spark.operators.text import stratified_sample

    df = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id bigint, lang string"
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 1.0})
    assert out.count() == 500  # rate 1.0 keeps everything


def test_duplicate_spans_merges_overlapping_grams(spark):
    """Two docs sharing one long passage: every 3-gram inside the shared
    passage repeats, and the overlapping positions must merge into ONE
    maximal span per doc covering exactly the passage."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts = [
        f"unique one two three {shared} tail9 tail10 tail11",
        f"{shared} other4 other5 other6 other7 other8 other9",
        "completely unrelated words nine ten eleven twelve thirteen fourteen",
    ]
    out = (
        dd.duplicate_spans(_docs(spark, texts), "doc_id", "text", k=3)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # doc 0: shared passage at token offsets 4..11; doc 1: offsets 0..7
    assert list(out.id) == [0, 1]
    assert list(out.span_start) == [4, 0]
    assert list(out.span_end) == [11, 7]
    assert list(out.span_tokens) == [8, 8]


def test_cut_duplicate_spans_edges(spark):
    """Full-duplicate docs empty out entirely; docs with no duplicated
    span pass through untouched (left-join path)."""
    dup = "alpha beta gamma delta epsilon zeta"  # 6 tokens, duplicated whole
    texts = [
        dup,
        dup,
        "totally different tokens here that repeat nothing from the others",
    ]
    out = (
        dd.cut_duplicate_spans(_docs(spark, texts), "doc_id", "text", k=3)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "" and out.loc[0, "n_tokens_removed"] == 6
    assert out.loc[1, "clean_text"] == "" and out.loc[1, "n_tokens_removed"] == 6
    assert out.loc[2, "n_tokens_removed"] == 0
    assert out.loc[2, "clean_text"].startswith("totally different")


def test_signature_paths_identical(spark, sf_dir):
    """minhash_signatures (exploded+agg) and minhash_signatures_from_docs
    (map-side array) must emit byte-identical signatures — the from-docs
    path inlines the double-hash formulas as SQL text, so this pins the
    two definitions against drift."""
    from surge_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    s1 = (
        dd.minhash_signatures(dd.shingles(docs, "doc_id", "text", 4, distinct=False), 16)
        .toPandas().set_index("id").sig.map(tuple).sort_index()
    )
    s2 = (
        dd.minhash_signatures_from_docs(docs, "doc_id", "text", 4, 16)
        .toPandas().set_index("id").sig.map(tuple).sort_index()
    )
    assert (s1 == s2).all()


def test_duplicate_spans_hashed_grams_identical(spark, sf_dir):
    """VERDICT r4 #6: hash_grams=True (xxhash64 keys, the 100 TB
    shuffle-byte shape) must produce byte-identical spans to the raw-string
    form on the real documents table."""
    from surge_spark.io import load_table
    from surge_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    a = (
        duplicate_spans(docs, "doc_id", "text", k=8, min_count=2)
        .toPandas().sort_values(["id", "span_start"]).reset_index(drop=True)
    )
    b = (
        duplicate_spans(docs, "doc_id", "text", k=8, min_count=2, hash_grams=True)
        .toPandas().sort_values(["id", "span_start"]).reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0  # non-vacuous: the corpus does contain duplicated spans


def test_containment_catches_contained_document(spark):
    """Containment vs Jaccard: a short document quoted whole inside a
    longer one has containment ~1.0 but Jaccard well below it — the
    asymmetric-overlap case the containment entry exists for. (Candidate
    recall still rides the Jaccard-tuned LSH bands, so the long doc here
    extends the short one by ~a third — the contained fraction large
    enough to band-collide, the standard operating range.)"""
    long_doc = BASE + " plus an appended closing paragraph with extra words"
    texts = [
        BASE,        # fully contained in 1
        long_doc,
        "completely different words about spark query engines and shuffles",
    ]
    out = dd.minhash_lsh_containment(
        _docs(spark, texts), "doc_id", "text", n=3, threshold=0.7
    ).toPandas()
    got = {(a, b): c for a, b, c in zip(out.id_a, out.id_b, out.containment)}
    assert (0, 1) in got
    assert got[(0, 1)] >= 0.99  # every shingle of 0 appears in 1
    assert all(2 not in p for p in got)
    # and the pair's JACCARD is meaningfully lower — the discriminating case
    jac = dd.minhash_lsh_dedup(
        _docs(spark, texts), "doc_id", "text", n=3, threshold=0.0
    ).toPandas()
    jmap = {(a, b): j for a, b, j in zip(jac.id_a, jac.id_b, jac.jaccard)}
    assert jmap[(0, 1)] < got[(0, 1)] - 0.1


def test_incremental_equals_cross_side_slice_of_full_neardup(spark, sf_dir):
    """Cross-operator consistency: the incremental entry's (new, old)
    pairs must be EXACTLY the production self-join's pairs restricted to
    one-new-one-old membership, reoriented — same banding, same bucket
    cap (applied before the side split in both), same one-scan
    verification, so the equality is exact including jaccard."""
    from surge_spark.queries import all_queries

    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in all_queries()["d_minhash_lsh_neardup_md5"](
            spark, sf_dir
        ).collect()
    }
    inc = {
        (r.new_id, r.old_id): r.jaccard
        for r in all_queries()["d_incremental_neardup_md5"](
            spark, sf_dir
        ).collect()
    }
    expect = {}
    for (a, b), j in full.items():
        a_new, b_new = a % 5 == 0, b % 5 == 0
        if a_new and not b_new:
            expect[(a, b)] = j
        elif b_new and not a_new:
            expect[(b, a)] = j
    assert inc == expect and len(inc) > 0


def test_persisted_signature_incremental_equals_self_contained(spark, sf_dir, tmp_path):
    """r10 VERDICT #1 — the 100 TB daily-dedup gap: corpus signatures live
    in a SignatureStore (SnapshotStore-backed parquet; shard appends are
    flat deltas with latest-wins per id) and each run computes signatures
    for the NEW shard only. The from-stored result must equal the
    self-contained minhash_lsh_incremental on the same corpus split
    EXACTLY, including jaccard — signatures are a pure function of the
    text and the union bucket cap counts the same population."""
    from surge_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)

    store = dd.SignatureStore(str(tmp_path / "sigs"), num_buckets=8, delta_commits=4)
    # two corpus appends (exercises the delta merge path), then load
    corpus_sig = dd.minhash_signatures(
        dd.shingles(corpus, "doc_id", "text", 4, distinct=False), 64, "md5"
    )
    assert store.append(corpus_sig.where(F.col("id") % 2 == 0), "day0-even")
    assert store.append(corpus_sig.where(F.col("id") % 2 != 0), "day0-odd")
    # replayed append is an R4 no-op
    assert not store.append(corpus_sig.where(F.col("id") % 2 == 0), "day0-even")
    stored = store.load(spark, id_type="long")
    # the stored table IS the signature function of the corpus
    assert stored.count() == corpus_sig.count()

    got = {
        (r.new_id, r.old_id): r.jaccard
        for r in dd.minhash_lsh_from_stored(
            shard, corpus, stored, "doc_id", "text",
            n=4, num_hashes=64, bands=16, threshold=0.5, hash_fn="md5",
        ).collect()
    }
    want = {
        (r.new_id, r.old_id): r.jaccard
        for r in dd.minhash_lsh_incremental(
            docs, "doc_id", "text", is_new=lambda c: c % 5 == 0,
            n=4, num_hashes=64, bands=16, threshold=0.5, hash_fn="md5",
        ).collect()
    }
    assert got == want and len(got) > 0


def test_persisted_signature_recrawl_latest_wins(spark, tmp_path):
    """A re-crawled doc: its STALE stored signature is replaced by the
    shard append (latest-wins per id), it never pairs with itself, and
    verification uses its CURRENT text."""
    old = _docs(spark, [BASE + " v1", "completely different content here now"])
    store = dd.SignatureStore(str(tmp_path / "s"), num_buckets=4, delta_commits=4)
    sig_old = dd.minhash_signatures(
        dd.shingles(old, "doc_id", "text", 4, distinct=False), 64, "md5"
    )
    assert store.append(sig_old, "day0")
    # doc 0 re-crawled with near-identical text; doc 2 is new and near-dups doc 0
    shard = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 2], "text": [BASE + " v2", BASE + " v2 extra"]})
    )
    corpus = old  # still contains the stale doc 0 row
    pairs = dd.minhash_lsh_from_stored(
        shard, corpus, store.load(spark), "doc_id", "text",
        threshold=0.3, hash_fn="md5",
    ).collect()
    assert all(r.new_id != r.old_id for r in pairs)
    got = {(r.new_id, r.old_id) for r in pairs}
    # doc 2 matches stored doc 0's signature; verified against doc 0's
    # CURRENT (shard) text, not the stale corpus row
    assert (2, 0) in got
    # appending the shard then reloading shows latest-wins on doc 0
    sig_new = dd.minhash_signatures(
        dd.shingles(shard, "doc_id", "text", 4, distinct=False), 64, "md5"
    )
    assert store.append(sig_new, "day1")
    merged = {r.id: tuple(r.sig) for r in store.load(spark).collect()}
    fresh = {r.id: tuple(r.sig) for r in sig_new.collect()}
    assert merged[0] == fresh[0] and len(merged) == 3


def test_decontaminate_opt_in_byte_gate(spark):
    """broadcast_max_bytes opts decontaminate into the measured broadcast
    gate: results identical to the default hinted plan, and a tiny budget
    demotes the hint (no broadcast hash join on the shingle key)."""
    train = _docs(spark, [BASE, "unrelated text entirely " * 3, BASE + " tail"])
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [BASE]})
    )
    base = {
        (r.id, r.n_hit, r.contaminated)
        for r in dd.decontaminate(train, bench, "doc_id", "text").collect()
    }
    gated_df = dd.decontaminate(
        train, bench, "doc_id", "text", broadcast_max_bytes=1
    )
    gated = {(r.id, r.n_hit, r.contaminated) for r in gated_df.collect()}
    assert gated == base and any(hit for (_, hit, _) in base)
    # the hint is a LOGICAL-plan node; assert its absence there (an
    # executed-plan check is vacuous — hints never appear in physical
    # plans), mirroring tests/test_graph.py's measured_broadcast pin
    logical = gated_df._jdf.queryExecution().logical().toString().lower()
    assert "hint" not in logical
    base_df = dd.decontaminate(train, bench, "doc_id", "text")
    assert "hint" in base_df._jdf.queryExecution().logical().toString().lower()


def test_run_incremental_dedup_stream_three_days(spark, tmp_path):
    """The streaming daily-dedup pipeline end to end (r11): three
    micro-batches of documents flow through run_incremental_dedup_stream —
    each batch's published pairs must equal the OFFLINE
    minhash_lsh_from_stored of that shard against the exact pre-batch
    corpus, the SignatureStore must end with every doc's signature, and
    batch 0 (empty corpus) publishes no pairs."""
    import glob as _glob

    from pyspark.sql import functions as F

    near = BASE + " extra tail words here"
    days = [
        [(0, BASE), (1, "totally unrelated content about other things")],
        [(10, near), (11, "second day fresh text nothing alike")],
        [(20, BASE + " v3 tail"), (21, near + " again")],
    ]
    src = str(tmp_path / "docs_src")
    schema = "doc_id long, text string"
    for i, rows in enumerate(days):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # one file per trigger => three micro-batches in arrival order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # delta_commits=2: the third append triggers a COW compaction
    # mid-stream, so the pipeline is pinned across a store layout change
    store = dd.SignatureStore(str(tmp_path / "sigs"), num_buckets=4, delta_commits=2)
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    q = (
        dd.run_incremental_dedup_stream(
            stream, store, corpus_path, pairs_path,
            str(tmp_path / "ck"), threshold=0.3, hash_fn="md5",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch_dirs = sorted(_glob.glob(f"{pairs_path}/batch=*"))
    assert len(batch_dirs) == 3
    # NOTE: file-source batch order follows file modification order ==
    # write order here; map published batches back to their shards by the
    # shard ids found in the corpus dirs
    corpus_batches = {}
    for d in sorted(_glob.glob(f"{corpus_path}/batch=*")):
        ids = {r.doc_id for r in spark.read.parquet(d).collect()}
        corpus_batches[d.split("batch=")[1]] = ids
    day_ids = [{r[0] for r in rows} for rows in days]

    # offline replay: accumulate corpus day by day, recompute from-stored
    seen = []
    for di, rows in enumerate(days):
        shard = spark.createDataFrame(rows, schema)
        # find which stream batch carried this day's ids
        bid = next(b for b, ids in corpus_batches.items() if ids == day_ids[di])
        got = {
            (r.new_id, r.old_id, r.jaccard)
            for r in spark.read.parquet(f"{pairs_path}/batch={bid}").drop(
                "batch_id"
            ).collect()
        }
        if not seen:
            want = set()
        else:
            corpus = spark.createDataFrame(
                [r for day in seen for r in day], schema
            )
            stored = dd.minhash_signatures(
                dd.shingles(corpus, "doc_id", "text", 4, distinct=False),
                64, "md5",
            )
            want = {
                (r.new_id, r.old_id, r.jaccard)
                for r in dd.minhash_lsh_from_stored(
                    shard, corpus, stored, "doc_id", "text",
                    threshold=0.3, hash_fn="md5",
                ).collect()
            }
        assert got == want, (di, got, want)
        seen.append(rows)
    # the near-dup chain actually fired: day 2's shard matched earlier docs
    all_pairs = spark.read.parquet(pairs_path)
    assert all_pairs.count() > 0
    # store holds every signature exactly once
    assert store.load(spark).count() == 6
    # replayed append of an already-committed stream batch is a no-op
    assert not store.append(
        dd.minhash_signatures(
            dd.shingles(
                spark.createDataFrame(days[0], schema), "doc_id", "text", 4,
                distinct=False,
            ), 64, "md5",
        ),
        "stream-0",
    )


def test_from_stored_pruned_verification_scan_equality(spark, sf_dir):
    """prune_verification_scan restricts corpus shingling to candidate old
    docs — value-identical by construction (the role join filters to
    candidate ids anyway), pinned here including jaccard."""
    from surge_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(~(F.col("doc_id") % 5 == 0))
    stored = dd.minhash_signatures(
        dd.shingles(corpus, "doc_id", "text", 4, distinct=False), 64, "md5"
    )
    kw = dict(n=4, num_hashes=64, bands=16, threshold=0.5, hash_fn="md5")
    base = {
        (r.new_id, r.old_id): r.jaccard
        for r in dd.minhash_lsh_from_stored(
            shard, corpus, stored, "doc_id", "text", **kw
        ).collect()
    }
    pruned = {
        (r.new_id, r.old_id): r.jaccard
        for r in dd.minhash_lsh_from_stored(
            shard, corpus, stored, "doc_id", "text",
            prune_verification_scan=True, **kw
        ).collect()
    }
    assert pruned == base and len(base) > 0


def test_incremental_dedup_batch_replay_is_content_idempotent(spark, tmp_path):
    """Crash-replay contract (review finding, r11): a batch replayed AFTER
    its signature append committed but BEFORE the streaming checkpoint
    commit must publish byte-identical pairs — in particular it must NOT
    see its own signatures as corpus and invent in-batch new-new pairs.
    Day-1's two docs are near-dups of EACH OTHER and of day-0 docs: the
    replay would pair them together without the anti-join guard."""
    store = dd.SignatureStore(str(tmp_path / "s"), num_buckets=4, delta_commits=4)
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    kw = dict(id_col="doc_id", text_col="text", n=4, num_hashes=64,
              bands=16, threshold=0.3, max_bucket=5000, hash_fn="md5")
    schema = "doc_id long, text string"
    day0 = spark.createDataFrame([(0, BASE)], schema)
    day1 = spark.createDataFrame(
        [(10, BASE + " alpha"), (11, BASE + " beta")], schema
    )
    dd._incremental_dedup_batch(day0, 0, store, corpus_path, pairs_path, **kw)
    dd._incremental_dedup_batch(day1, 1, store, corpus_path, pairs_path, **kw)
    first = {
        tuple(r) for r in spark.read.parquet(f"{pairs_path}/batch=1").collect()
    }
    # day-1 docs matched day-0 but never each other
    assert first and all(r[1] == 0 for r in first)
    n_sigs = store.load(spark).count()
    # REPLAY batch 1 (signatures already committed; append is R4-deduped)
    dd._incremental_dedup_batch(day1, 1, store, corpus_path, pairs_path, **kw)
    replay = {
        tuple(r) for r in spark.read.parquet(f"{pairs_path}/batch=1").collect()
    }
    assert replay == first  # no (10, 11) new-new pairs invented
    assert store.load(spark).count() == n_sigs
    # replayed batch 0 (empty pre-batch corpus) still publishes no pairs
    dd._incremental_dedup_batch(day0, 0, store, corpus_path, pairs_path, **kw)
    assert spark.read.parquet(f"{pairs_path}/batch=0").count() == 0


def test_signature_store_vacuum_and_change_feed(spark, tmp_path):
    """SignatureStore inherits the snapshot store's ops surface: vacuum
    reclaims pre-checkpoint versions without changing load(), and the
    change feed replays the signature table version-by-version (the DR
    path for the accumulated corpus signatures)."""
    store = dd.SignatureStore(str(tmp_path / "s"), num_buckets=4, delta_commits=2)
    docs = _docs(spark, [BASE, BASE + " two", "other text entirely", BASE + " four"])
    sig = dd.minhash_signatures(
        dd.shingles(docs, "doc_id", "text", 4, distinct=False), 64, "md5"
    )
    for i in range(4):  # crosses a compaction at delta_commits=2
        assert store.append(sig.where(F.col("id") == i), f"day{i}")
    before = {r.id: tuple(r.sig) for r in store.load(spark).collect()}
    assert len(before) == 4
    # change feed BEFORE vacuum (vacuum reclaims aged change records
    # along with their versions): the full feed carries every signature
    versions = store.store.committed_versions()
    feed = store.store.read_changes(spark, versions[0], versions[-1])
    assert feed is not None and feed.count() >= 4
    store.vacuum(keep_last=1)
    assert {r.id: tuple(r.sig) for r in store.load(spark).collect()} == before
