"""Deduplication catalog entries over the `documents` table.

The exact and n-gram-Jaccard entries have full DuckDB oracles (set algebra —
engine-independent). The PRODUCTION MinHash-LSH and SimHash entries hash
with xxhash64 (one cheap JVM hash — the right choice at 100 TB) and are
rows-only, with recall pinned against the exact-Jaccard ground truth in
tests/test_dedup.py; their md5 TWINS (d_minhash_signatures_md5,
d_minhash_lsh_neardup_md5, d_simhash_fingerprints_md5) swap only the
per-item hash for one both engines compute, giving every downstream stage
— signatures, banding, bucket caps, candidate join, Jaccard verification,
simhash votes/pack — a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import dedup as dd
from . import query

# single source of truth for the SQL-side tokenizer: operators.dedup
_DUCK_TOKENS = dd.DUCK_TOKENS_SQL


def _duck_shingles(n: int = 4) -> str:
    return f"""
    toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             array_to_string(t[i.i : i.i + {n - 1}], ' ') AS shingle
      FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - {n - 1}, 1) + 1)) AS i
      ) AS i
      WHERE array_to_string(t[i.i : i.i + {n - 1}], ' ') <> ''
    )
    """


@query(
    "d_exact_dedup",
    oracle="""
    SELECT content, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM (SELECT doc_id, text AS content FROM documents)
    GROUP BY content
    """,
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on raw content, min-id keeper election.
    One shuffle on the content hash; at scale, group on md5(content) instead
    of the full text to shrink shuffle width (fingerprint entry covers it)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "doc_id", "text")


@query(
    "d_exact_dedup_normalized",
    oracle=f"""
    SELECT content, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM (SELECT doc_id, {dd.DUCK_NORMALIZE_SQL} AS content FROM documents)
    GROUP BY content
    """,
)
def d_exact_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after text normalization (case/punctuation/whitespace)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "doc_id", "text", normalized=True)


@query(
    "d_ngram_jaccard_topk",
    oracle=f"""
    WITH {_duck_shingles(4)},
    pruned AS (
      SELECT * FROM sh WHERE shingle IN (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000
      )
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           CAST(round(n_common / (sa.n + sb.n - n_common), 6) AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    ORDER BY round(n_common / (sa.n + sb.n - n_common), 6) DESC, id_a, id_b
    LIMIT 50
    """,
)
def d_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram Jaccard similarity via shingle inverted-index self-join —
    the candidate/verify primitive behind near-dedup, checked end-to-end.
    Stop-shingles (posting list > 1000) are pruned on both sides (skew guard:
    at 100 TB a single hot shingle would otherwise quadratically explode one
    reducer)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", n=4)
    pairs = dd.jaccard_pairs(sh, max_bucket=1000)
    return (
        pairs.select(
            "id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"),
        )
        .orderBy(F.desc("jaccard_r"), F.asc("id_a"), F.asc("id_b"))
        .limit(50)
        .withColumnRenamed("jaccard_r", "jaccard")
    )


@query(
    "d_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_duck_shingles(4)},
    pruned AS (
      SELECT * FROM sh WHERE shingle IN (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000
      )
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.6
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u
    ),
    labeled AS (
      SELECT d.doc_id AS id, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ),
    csize AS (
      SELECT component, count(*) AS cluster_size FROM labeled GROUP BY component
    )
    SELECT l.id, l.component, s.cluster_size,
           (l.id = l.component) AS is_canonical
    FROM labeled l JOIN csize s ON s.component = l.component
    """,
)
def d_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pass, pairs → clusters: exact 4-gram Jaccard pairs at
    threshold 0.6 fed through distributed connected components
    (operators/graph.py: alternating min-propagate / pointer-jump rounds,
    O(log d) shuffles), singletons unioned back, canonical keeper = min doc
    id per component. The DuckDB oracle recomputes the clustering with a
    recursive-CTE transitive closure — an independent algorithm, so the
    iterative Spark labeling is verified end-to-end, not mirrored.

    This is the operator a training-data pipeline actually runs: near-dup
    PAIRS are diagnostics; keep/drop decisions need components. Reference
    has no analog (its dedup is key-compaction, SURVEY §2.4 A2); this
    extends that family to document near-dedup at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", n=4)
    pairs = dd.jaccard_pairs(sh, max_bucket=1000).where(F.col("jaccard") >= 0.6)
    return dd.dedup_clusters(docs, "doc_id", pairs)


@query(
    "d_decontaminate",
    oracle=f"""
    WITH {_duck_shingles(5)},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 17 = 0),
    tr AS (SELECT * FROM sh WHERE id % 17 <> 0),
    sizes AS (SELECT id, count(*) AS n_shingles FROM tr GROUP BY id),
    hits AS (
      SELECT id, count(*) AS n_hit FROM tr JOIN bench USING (shingle) GROUP BY id
    )
    SELECT d.doc_id AS id,
           coalesce(s.n_shingles, 0) AS n_shingles,
           coalesce(h.n_hit, 0) AS n_hit,
           CAST(round(coalesce(h.n_hit, 0) / greatest(coalesce(s.n_shingles, 0), 1), 6) AS DOUBLE) AS contamination,
           (coalesce(h.n_hit, 0) > 0) AS contaminated
    FROM documents d
    LEFT JOIN sizes s ON s.id = d.doc_id
    LEFT JOIN hits h ON h.id = d.doc_id
    WHERE d.doc_id % 17 <> 0
    """,
)
def d_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 17 == 0 stand in for an
    eval suite; every training doc reports its distinct 5-gram overlap with
    that suite. The benchmark shingle set is broadcast (eval suites are MBs
    against a TB corpus) so the training shingle stream never shuffles —
    the only shuffle is the per-doc hit count. Plan-pinned in
    tests/test_plans.py. No reference analog; core training-data-pipeline
    surface alongside dedup (SURVEY §2 extension family)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    return dd.decontaminate(train, bench, "doc_id", "text", n=5)


@query("d_minhash_lsh_neardup")
def d_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands × 4 rows) near-dup pairs, exact-Jaccard
    verified at threshold 0.5. Carries the PRODUCTION (one-scan pruned)
    verification — O(candidates) end to end: role-exploded pairs joined
    once against a single shingle stream (broadcast map-side when pairs ≪
    corpus, so the corpus never shuffles in verification), union/
    intersection counts from a two-level aggregate with no per-doc sizes
    pass. Wins locally too (1.31 vs 1.47 s at sf0.1, back-to-back
    interleaved; A/B table in the operator docstring). Hash-seed dependent
    → rows-only check here; recall vs exact Jaccard asserted in
    tests/test_dedup.py, the one-scan shape in tests/test_plans.py."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_dedup(
        docs, "doc_id", "text", n=4, num_hashes=64, bands=16, threshold=0.5
    )


@query("d_minhash_lsh_neardup_unpruned")
def d_minhash_lsh_neardup_unpruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B twin of d_minhash_lsh_neardup with the full-corpus-join
    verification (prune_verification=False): the verification joins the
    exploded shingle table twice and aggregates per-doc sizes over the
    whole corpus — three O(corpus) passes. Kept benched beside the
    production one-scan form so a regression in either shape is visible;
    output equality pinned in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_dedup(
        docs, "doc_id", "text", n=4, num_hashes=64, bands=16, threshold=0.5,
        prune_verification=False,
    )


def _duck_minhash_md5(num_hashes: int = 64) -> str:
    """DuckDB mirror of the md5 K-M double-hash MinHash signature: the two
    32-bit md5 halves per shingle ('0x…'-cast == Spark conv(hex,16,10)),
    then k multiply-add mins. Shares _duck_shingles' tokenizer."""
    mins = ", ".join(f"min(a + {i} * b)" for i in range(num_hashes))
    return f"""
    h AS (
      SELECT id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS a,
             CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS b
      FROM sh
    ),
    sig AS (SELECT id, [{mins}] AS s FROM h GROUP BY id)
    """



# THE md5-LSH band-candidate CTE chain (bands 16 x rows 4, bucket cap
# 5000) as ONE oracle constant — the DuckDB half of the
# lsh_candidates contract (band slicing, cap, canonical id_a < id_b);
# factored by r14 review pass 2 after it appeared verbatim in 7 oracles
# (a banding change hand-edited into 6 of 7 is the silent-divergence — the
# 8th occurrence, _INCREMENTAL_ORACLE, keeps its own asymmetric cand split)
# class the shared-SQL templates exist to prevent).
_DUCK_BAND_CAND = """bands AS (
      SELECT id, u.b AS band,
             array_to_string(s[u.b * 4 + 1 : u.b * 4 + 4], ',') AS key
      FROM sig, LATERAL (SELECT unnest(range(0, 16)) AS b) u
    ),
    sized AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
    okb AS (
      SELECT bands.* FROM bands JOIN sized USING (band, key) WHERE c <= 5000
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM okb a JOIN okb b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )"""


@query(
    "d_minhash_signatures_md5",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)}
    SELECT id, CAST(u.i AS INT) AS hash_index, s[u.i + 1] AS sig
    FROM sig, LATERAL (SELECT unnest(range(0, 64)) AS i) u
    """,
)
def d_minhash_signatures_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable MinHash signatures (k=64, K-M double hashing over
    the two 32-bit md5 halves of each shingle — a + i·b < 2^38, overflow-
    safe in any engine): DuckDB recomputes every one of the 64 per-doc
    minima, value-checking the signature pipeline the xxhash64 production
    entries build on. Output exploded to scalars (id, hash_index, sig)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = dd.minhash_signatures(
        dd.shingles(docs, "doc_id", "text", 4, distinct=False), 64, hash_fn="md5"
    )
    return sig.select("id", F.posexplode("sig").alias("hash_index", "sig"))


@query(
    "d_minhash_lsh_neardup_md5",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(round(i.nc / (sa.ns + sb.ns - i.nc), 6) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE i.nc / (sa.ns + sb.ns - i.nc) >= 0.5
    """,
)
def d_minhash_lsh_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END MinHash-LSH near-dup pipeline with full value oracle:
    md5 K-M signatures → 16 bands of 4 → band-bucket self-join (DuckDB
    joins the band's signature SLICE values directly; Spark buckets on a
    64-bit hash of the slice, equal iff the slices are equal up to a
    ~2^-64 collision — astronomically below the testdata pair count) →
    exact-Jaccard verification at 0.5. This is the d_minhash_lsh_neardup
    production entry with ONLY the per-shingle hash swapped, so the
    driver value-checks the banding, bucket-cap, candidate and
    verification machinery those rows-only entries share."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_dedup(
        docs, "doc_id", "text", n=4, num_hashes=64, bands=16, threshold=0.5,
        hash_fn="md5",
    )


def _d_containment_md5_oracle() -> str:
    return f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(round(i.nc / least(sa.ns, sb.ns), 6) AS DOUBLE) AS containment
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE i.nc / least(sa.ns, sb.ns) >= 0.7
    """


@query("d_containment_pairs_md5", oracle=_d_containment_md5_oracle())
def d_containment_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection (Broder's resemblance vs containment
    split): |A∩B| / min(|A|,|B|) over the same md5 MinHash-LSH candidate
    machinery as d_minhash_lsh_neardup_md5 — catches a short document
    quoted whole inside a long one, which Jaccard scores low. The Spark
    side's one-scan verification derives BOTH per-side sizes from the
    two-level aggregate itself (n_a = Σ has_a over the pair's shingle
    union — no sizes pass, corpus never shuffles in verification); the
    oracle computes the classical sizes-join form, so the driver checks
    the algebraic identity along with the values."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_containment(
        docs, "doc_id", "text", n=4, num_hashes=64, bands=16, threshold=0.7,
        hash_fn="md5",
    )



@query("d_simhash_fingerprints")
def d_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (rows-only: engine-specific hash —
    xxhash64 is one cheap JVM hash per token and stays the production
    form). Deterministic across runs; hamming-neighbor behavior tested in
    tests/test_dedup.py; the ALGORITHM's value correctness is proven by
    the md5 twin below, which differs only in the per-token hash."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, "doc_id", "text")


_SIMHASH_VOTES_SQL = ",\n      ".join(
    f"sum(CASE WHEN ({'lo' if i < 32 else 'hi'} >> {i if i < 32 else i - 32})"
    f" & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(64)
)
_SIMHASH_PACK_SQL = " + ".join(
    f"(CASE WHEN b{i} > 0 THEN 1 ELSE 0 END) * "
    f"CAST({(1 << i) if i < 63 else -(1 << 63)} AS BIGINT)"
    for i in range(64)
)


@query(
    "d_simhash_fingerprints_md5",
    oracle=f"""
    WITH base AS (SELECT doc_id, {dd.DUCK_TOKENS_SQL} AS t FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM base),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
             CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS lo
      FROM tok WHERE tok <> ''
    ),
    v AS (SELECT doc_id, {_SIMHASH_VOTES_SQL} FROM h GROUP BY doc_id)
    SELECT doc_id AS id, CAST({_SIMHASH_PACK_SQL} AS BIGINT) AS simhash
    FROM v
    """,
)
def d_simhash_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-portable SimHash twin: per-token bits come from two
    32-bit halves of md5 (Spark conv(hex,16,10) == DuckDB's '0x…' cast —
    the t_shuffle_shards trick), so the full pipeline — distinct-token
    votes, sign threshold, 64-bit pack with the sign bit — is value-checked
    against DuckDB, not just rows-counted. This is the oracle evidence for
    d_simhash_fingerprints, whose only difference is the cheaper
    per-token hash (xxhash64: right at 100 TB, unoracleable by
    construction — the registry docstring documents that trade)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, "doc_id", "text", hash_fn="md5")


_SPANS_ORACLE = """
    WITH base AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, i.i AS pos, array_to_string(t[i.i + 1 : i.i + 8], ' ') AS gram
      FROM base, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) i
      WHERE len(t) >= 8
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS f
      FROM m
    ),
    sp AS (
      SELECT doc_id, pos,
             sum(f) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM flagged
    )
    SELECT doc_id AS id,
           CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + 8 - 1 AS INT) AS span_end,
           CAST(max(pos) + 8 - 1 - min(pos) + 1 AS INT) AS span_tokens
    FROM sp GROUP BY doc_id, span_id
    """


@query("d_duplicate_spans", oracle=_SPANS_ORACLE)
def d_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span extraction (Lee et al. 2022 §4, re-expressed
    relationally): maximal token spans whose every 8-gram repeats in the
    corpus — the spans a substring-level dedup pass cuts before training."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.duplicate_spans(docs, "doc_id", "text", k=8, min_count=2).withColumn(
        "span_tokens", F.col("span_tokens").cast("int")
    )


@query("d_duplicate_spans_hashed", oracle=_SPANS_ORACLE)
def d_duplicate_spans_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shuffle-byte shape of d_duplicate_spans: the gram
    frequency aggregate and semi join key on xxhash64(gram) (8 bytes)
    instead of the raw k-token string. Output is identical to the
    raw-string form (barring an ~n²/2⁶⁵ hash collision, which could only
    merge counts upward), so it shares the SAME value oracle — an
    engine-internal key optimization that the driver gate itself verifies
    changes nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.duplicate_spans(
        docs, "doc_id", "text", k=8, min_count=2, hash_grams=True
    ).withColumn("span_tokens", F.col("span_tokens").cast("int"))


@query(
    "d_cut_duplicate_spans",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, i.i AS pos, array_to_string(t[i.i + 1 : i.i + 8], ' ') AS gram
      FROM base, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) i
      WHERE len(t) >= 8
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS f
      FROM m
    ),
    sp AS (
      SELECT doc_id, pos,
             sum(f) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 8 - 1 AS e
      FROM sp GROUP BY doc_id, span_id
    ),
    tokpos AS (
      SELECT doc_id, i.i AS pos, t[i.i + 1] AS tok, len(t) AS n
      FROM base, LATERAL (SELECT unnest(range(0, len(t))) AS i) i
    ),
    removed AS (
      SELECT DISTINCT tp.doc_id, tp.pos
      FROM tokpos tp JOIN spans USING (doc_id)
      WHERE tp.pos BETWEEN spans.s AND spans.e
    ),
    kept AS (
      SELECT tp.doc_id,
             string_agg(tp.tok, ' ' ORDER BY tp.pos) AS clean_text,
             count(*) AS n_kept
      FROM tokpos tp ANTI JOIN removed r ON tp.doc_id = r.doc_id AND tp.pos = r.pos
      GROUP BY tp.doc_id
    )
    SELECT b.doc_id AS id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(len(b.t) AS INT) AS n_tokens,
           CAST(len(b.t) - coalesce(k.n_kept, 0) AS INT) AS n_tokens_removed
    FROM base b LEFT JOIN kept k USING (doc_id)
    """,
)
def d_cut_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span removal: each document rebuilt without its
    corpus-duplicated 8-gram spans (the transform a substring-dedup pass
    actually applies before training)."""
    docs = load_table(spark, sf_dir, "documents")
    out = dd.cut_duplicate_spans(docs, "doc_id", "text", k=8, min_count=2)
    return out.select(
        "id",
        "clean_text",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_tokens_removed").cast("int").alias("n_tokens_removed"),
    )


def _min_label_rounds(sym, seed, rounds: int = 3):
    """Unrolled min-label propagation (the Spark twin of _DUCK_LP_ROUND):
    seed is an (id, lbl) frame, sym a symmetric (a, b) edge list; each
    round every node takes the min of its own label and its neighbors'.
    Shared by d_fuzzy_dedup_clusters and d_semdedup_keepers so a
    propagation fix can never silently miss one of them.

    NEGATIVE A/B (r15 optimization round) — leave the unroll
    UNMATERIALIZED. Each round references the previous round's frame
    twice (own label + neighbor-min side), so the lineage doubles per
    round and the final plan holds 2^rounds copies of the seed subtree
    (8 narrow scans, no ReusedExchange). Per-round
    localCheckpoint(eager=False) dedupes that but measured ~2x WORSE at
    sf0.1 (interleaved: fuzzy clusters {7.1, 5.8} vs {3.4, 3.5} s;
    semdedup keepers {14.5, 6.7} vs {4.7, 4.3}): every checkpoint erases
    outputPartitioning, so EnsureRequirements re-exchanges the full
    (id, lbl) frame per round (the r10 pre-bucketed-read lesson), plus
    three materialization barriers — while the duplicated subtrees are
    narrow column-pruned scans + small aggregates that execute in
    parallel within one DAG. A seed-only checkpoint measured a tie
    (within noise) and was dropped too. The HEAVY upstream (LSH pair
    table / cell self-join) is already checkpointed by every caller —
    that is the part whose re-evaluation would be multiplicative at
    scale; what re-runs here is bounded by rounds x one narrow pass."""
    lbl = seed
    for _ in range(rounds):
        r = lbl.select(F.col("id").alias("rid"), F.col("lbl").alias("rlbl"))
        nb = (
            sym.join(r, sym.b == r.rid)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("rlbl").alias("nbm"))
        )
        lbl = lbl.join(nb, "id", "left").select(
            "id",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nbm"), F.col("lbl"))
            ).alias("lbl"),
        )
    return lbl


_DUCK_LP_ROUND = """
  SELECT l.id, least(l.lbl, coalesce(min(r.lbl), l.lbl)) AS lbl
  FROM {prev} l
  LEFT JOIN symp e ON e.a = l.id
  LEFT JOIN {prev} r ON r.id = e.b
  GROUP BY l.id, l.lbl
"""


@query(
    "d_fuzzy_dedup_clusters",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE i.nc / (sa.ns + sb.ns - i.nc) >= 0.5
    ),
    symp AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM documents),
    l1 AS ({_DUCK_LP_ROUND.format(prev="l0")}),
    l2 AS ({_DUCK_LP_ROUND.format(prev="l1")}),
    l3 AS ({_DUCK_LP_ROUND.format(prev="l2")})
    SELECT id AS doc_id, CAST(lbl AS BIGINT) AS cluster FROM l3
    """,
)
def d_fuzzy_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY-dedup clusters — connected components over the md5-LSH
    near-dup pair graph (the SlimPajama / RefinedWeb dedup step: cluster
    near-duplicates, keep one representative per cluster). Three unrolled
    min-label propagation rounds (converged for components of diameter
    ≤ 3 — the near-dup graphs LSH produces are clique-ish; a production
    fixpoint loop runs the same round to quiescence with per-round
    materialization, the g_kcore_bipartite discipline). Fixed rounds make
    the labels a pure function of the data, so DuckDB mirrors the ENTIRE
    stack — signatures, banding, bucket cap, Jaccard verification, and
    the propagation itself. Every doc appears (singletons label
    themselves); `cluster` = min doc_id reachable within 3 hops. The
    tiny pair table is localCheckpointed so each round's double
    reference cannot re-evaluate the LSH subtree multiplicatively."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        dd.minhash_lsh_dedup(
            docs, "doc_id", "text", n=4, num_hashes=64, bands=16,
            threshold=0.5, hash_fn="md5",
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sym = pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).unionAll(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
    lbl = _min_label_rounds(
        sym,
        docs.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("lbl")),
    )
    return lbl.select(
        F.col("id").alias("doc_id"), F.col("lbl").cast("long").alias("cluster")
    )


@query(
    "d_ngram_novelty",
    oracle=f"""
    WITH {_duck_shingles(4)},
    first_seen AS (SELECT shingle, min(id) AS first_id FROM sh GROUP BY shingle),
    per_doc AS (
      SELECT s.id, count(*) AS n_grams,
             sum(CASE WHEN f.first_id = s.id THEN 1 ELSE 0 END) AS n_novel
      FROM sh s JOIN first_seen f USING (shingle)
      GROUP BY s.id
    )
    SELECT id AS doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_novel AS BIGINT) AS n_novel,
           CAST(round(n_novel / CAST(n_grams AS DOUBLE), 6) AS DOUBLE)
             AS novelty
    FROM per_doc
    """,
)
def d_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the fraction of a doc's distinct
    4-grams first introduced by that doc (ingestion order = doc_id): the
    marginal-contribution signal data curation uses to drop documents
    that add nothing the corpus hasn't seen (a soft, scoring-based
    complement to hard span cutting — d_cut_duplicate_spans). One gram →
    min(doc_id) aggregate (the same shuffle shape as the duplicate-span
    index), joined back to the gram stream and reduced per doc; at
    100 TB the gram key would be hashed like d_duplicate_spans_hashed,
    trading the oracle for an 8-byte shuffle key."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", 4, distinct=True)
    first = sh.groupBy("shingle").agg(F.min("id").alias("first_id"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_id") == F.col("id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_grams").cast("double"), 6).alias(
            "novelty"
        ),
    )


@query(
    "d_fuzzy_dedup_keepers",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE i.nc / (sa.ns + sb.ns - i.nc) >= 0.5
    ),
    symp AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM documents),
    l1 AS ({_DUCK_LP_ROUND.format(prev="l0")}),
    l2 AS ({_DUCK_LP_ROUND.format(prev="l1")}),
    l3 AS ({_DUCK_LP_ROUND.format(prev="l2")}),
    toks2 AS (SELECT doc_id, len({_DUCK_TOKENS}) AS n_tokens FROM documents),
    ranked AS (
      SELECT l3.lbl, l3.id,
             row_number() OVER (
               PARTITION BY l3.lbl ORDER BY t.n_tokens DESC, l3.id ASC
             ) AS rn,
             count(*) OVER (PARTITION BY l3.lbl) AS cs
      FROM l3 JOIN toks2 t ON t.doc_id = l3.id
    )
    SELECT lbl AS cluster, CAST(cs AS BIGINT) AS cluster_size,
           CAST(id AS BIGINT) AS keeper_id
    FROM ranked WHERE rn = 1
    """,
)
def d_fuzzy_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-dedup OUTPUT step: one keeper per near-dup cluster —
    longest document wins (token count, ties → lowest id), the
    representative-selection policy corpus dedup actually applies after
    clustering. Composes d_fuzzy_dedup_clusters' 3-round propagation with
    a token-count argmax per cluster (max_by over a (n_tokens, -id)
    struct — no window over the corpus); singleton docs keep themselves.
    Both engines evaluate the ENTIRE pipeline — signatures, banding,
    verification, propagation, and the keeper argmax."""
    docs = load_table(spark, sf_dir, "documents")
    from . import QUERIES
    from ..operators.dedup import tokens as _toks

    clusters = QUERIES["d_fuzzy_dedup_clusters"](spark, sf_dir)
    n_toks = docs.select("doc_id", F.size(_toks("text")).alias("n_tokens"))
    return (
        clusters.join(n_toks, "doc_id")
        .groupBy(F.col("cluster"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max_by(
                F.col("doc_id"),
                F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("tb")),
            ).alias("keeper_id"),
        )
    )


# shared by d_incremental_neardup_md5 and its persisted-signature twin:
# the two Spark plans differ ONLY in where the corpus signatures come from
# (recomputed vs a stored table), which the oracle cannot and need not see
_INCREMENTAL_ORACLE = f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    bands AS (
      SELECT id, u.b AS band,
             array_to_string(s[u.b * 4 + 1 : u.b * 4 + 4], ',') AS key
      FROM sig, LATERAL (SELECT unnest(range(0, 16)) AS b) u
    ),
    sized AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
    okb AS (
      SELECT bands.* FROM bands JOIN sized USING (band, key) WHERE c <= 5000
    ),
    cand AS (
      SELECT DISTINCT a.id AS new_id, b.id AS old_id
      FROM okb a JOIN okb b
        ON a.band = b.band AND a.key = b.key
      WHERE a.id % 5 = 0 AND b.id % 5 <> 0
    ),
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.new_id, c.old_id, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.new_id
      JOIN sh y ON y.id = c.old_id AND y.shingle = x.shingle
      GROUP BY c.new_id, c.old_id
    )
    SELECT i.new_id, i.old_id,
           CAST(round(i.nc / (sa.ns + sb.ns - i.nc), 6) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.id = i.new_id
    JOIN sizes sb ON sb.id = i.old_id
    WHERE i.nc / (sa.ns + sb.ns - i.nc) >= 0.5
    """


@query("d_incremental_neardup_md5", oracle=_INCREMENTAL_ORACLE)
def d_incremental_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup under a full value oracle: the new shard (every
    5th doc id — a scale-free 20% split standing in for "today's crawl")
    is checked against the accumulated corpus only, (new, old) pairs at
    Jaccard >= 0.5 — the production shape of daily near-dedup where
    new-new pairs are handled inside the shard and old-old pairs were
    settled in previous runs. Same md5 signatures, banding, bucket cap
    and one-scan verification as d_minhash_lsh_neardup_md5; the side
    predicates apply to the PAIR so both self-join sides stay the
    identical subtree (ReusedExchange — filtering the inputs would
    double the signature build)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_incremental(
        docs, "doc_id", "text",
        is_new=lambda c: c % 5 == 0,
        n=4, num_hashes=64, bands=16, threshold=0.5, hash_fn="md5",
    )


@query("d_persisted_neardup_md5", oracle=_INCREMENTAL_ORACLE)
def d_persisted_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-SIGNATURE twin of d_incremental_neardup_md5 — the
    shape a 100 TB daily dedup actually runs: signatures are computed for
    the new shard ONLY and the accumulated corpus contributes a stored
    (id, sig) table, here built in-query (a catalog entry cannot carry
    cross-run disk state; SignatureStore round-trip equality is pinned in
    tests/test_dedup.py — minhash_lsh_from_stored is agnostic to whether
    the stored frame came from parquet). Identical oracle: the two plans
    differ only in the old side's signature provenance, never the values.
    At sf0.1 the replaced component — the corpus signature aggregate —
    measured 0.70 s recomputed vs 0.16 s scanned from the store (4.4x);
    end-to-end 1.78 vs 1.71 s medians (the shared verification tail
    dominates at this SF). The saved aggregate is the part that grows
    with corpus size while the shard stays fixed."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    # r15 optimization: checkpoint BOTH signature frames. The band join's
    # two sides (new vs stored) filter the banded union differently, so
    # no ReusedExchange fires (at bench scale the planner even broadcasts
    # one side — the build subtree then re-derives everything) and each
    # side re-ran shingle+hash+k-min over BOTH inputs: 14 documents scans
    # in the final plan. Materializing stored is the honest production
    # shape anyway (it IS a table — SignatureStore), and shard signatures
    # are computed once per run; 4 scans remain (verification text).
    stored = dd.minhash_signatures(
        dd.shingles(corpus, "doc_id", "text", 4, distinct=False), 64, "md5"
    ).localCheckpoint(eager=False)
    shard_sig = dd.minhash_signatures(
        dd.shingles(shard, "doc_id", "text", 4, distinct=False), 64, "md5"
    ).localCheckpoint(eager=False)
    return dd.minhash_lsh_from_stored(
        shard, corpus, stored, "doc_id", "text",
        n=4, num_hashes=64, bands=16, threshold=0.5, hash_fn="md5",
        shard_sig=shard_sig,
    )


@query(
    "d_cross_source_leakage",
    oracle="""
    WITH fp AS (
      SELECT DISTINCT md5(substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 60)) AS fp, source
      FROM documents
    ),
    side AS (SELECT source, count(*) AS n_contents FROM fp GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT s.source_a, s.source_b, CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(round(s.n_shared / least(xa.n_contents, xb.n_contents), 6)
                AS DOUBLE) AS containment
    FROM shared s
    JOIN side xa ON xa.source = s.source_a
    JOIN side xb ON xb.source = s.source_b
    """,
)
def d_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-leakage matrix: for every pair of sources,
    how many distinct content FINGERPRINTS appear in both, and the Broder
    containment against the smaller side — the "is my crawl re-ingesting
    the same mirror twice" / "does the eval source leak into the train
    source" diagnostic a corpus audit runs before mixing. The
    fingerprint is md5 of the first 60 NORMALIZED characters — the
    template/mirror-header proxy (shared boilerplate openings), which
    also keeps the entry non-vacuous at oracle scales where the
    synthetic corpus has no full-text duplicates (raw-md5 leakage found
    0 pairs at sf0.001/sf0.01; prefix-60 finds 23).
    Shapes: fingerprint + distinct (32-byte shuffle keys, never raw
    text), a fingerprint self-join whose pair space is bounded by content
    multiplicity (a fingerprint in k sources yields k(k-1)/2 pairs — k
    is bounded by the source count, not the corpus), one pair aggregate,
    and a broadcast-sized per-side totals join."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        F.md5(F.substring(dd.normalize_text("text"), 1, 60)).alias("fp"),
        "source",
    ).distinct()
    side = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n_contents"))
    a = fp.select("fp", F.col("source").alias("source_a"))
    b = fp.select("fp", F.col("source").alias("source_b"))
    shared = (
        a.join(b, "fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = side.withColumnsRenamed({"source": "source_a", "n_contents": "na"})
    sb = side.withColumnsRenamed({"source": "source_b", "n_contents": "nb"})
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "n_shared",
            F.round(
                F.col("n_shared") / F.least(F.col("na"), F.col("nb")), 6
            ).alias("containment"),
        )
    )


@query(
    "t_dedup_rate_by_source",
    oracle="""
    WITH fp AS (
      SELECT source, doc_id,
             md5(substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                 'g')), 1, 60)) AS fp
      FROM documents
    ),
    mult AS (SELECT fp, count(*) AS k FROM fp GROUP BY fp)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT f.fp) AS BIGINT) AS n_contents,
           CAST(sum(CASE WHEN m.k > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated,
           CAST((sum(CASE WHEN m.k > 1 THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS dup_ppm
    FROM fp f JOIN mult m USING (fp)
    GROUP BY f.source
    """,
)
def t_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication rate — the dataset-card column every corpus
    release reports (what fraction of a source's documents share content
    with ANY other document, cross-source included): docs → prefix-60
    normalized fingerprints (the d_cross_source_leakage channel — raw
    md5 is vacuous on the synthetic corpus), global multiplicity per
    fingerprint, joined back on the 32-byte key and reduced per source.
    The rate ships as integer parts-per-million (floor division) so
    there is no float rounding channel at all. Shuffle shapes: two
    aggregates and one join, all keyed on the fingerprint or the
    bounded source id — raw text never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "source",
        "doc_id",
        F.md5(F.substring(dd.normalize_text("text"), 1, 60)).alias("fp"),
    ).localCheckpoint(eager=False)  # two consumers (mult + the join side)
    # would each rescan documents and re-run the normalize/md5 map
    mult = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("k"))
    return (
        fp.join(mult, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_contents"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0)).alias(
                "n_duplicated"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_contents",
            "n_duplicated",
            F.expr(
                "CAST((n_duplicated * 1000000) div n_docs AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


@query(
    "d_idf_weighted_neardup",
    oracle=f"""
    WITH {_duck_shingles(4)},
    n AS (SELECT count(*) AS nd FROM documents),
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    w AS (
      SELECT s.id, s.shingle, ln(CAST(nd AS DOUBLE) / df.df) AS w
      FROM sh s JOIN df USING (shingle) CROSS JOIN n
      WHERE df.df BETWEEN 2 AND 1000 AND df.df < nd
    ),
    norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
    wn AS (
      SELECT w.id, w.shingle, w.w / nm.nrm AS xh
      FROM w JOIN norms nm USING (id)
    ),
    ub AS (SELECT shingle, max(xh) AS ub FROM wn GROUP BY shingle),
    pref AS (
      SELECT id, shingle FROM (
        SELECT wn.id, wn.shingle,
               sum(wn.xh * ub.ub) OVER (
                 PARTITION BY wn.id ORDER BY ub.ub, wn.shingle
                 ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM wn JOIN ub USING (shingle)
      ) WHERE cum >= 0.4999995
    ),
    cand AS (
      SELECT DISTINCT p.id AS id_a, f.id AS id_b
      FROM pref p JOIN w f ON p.shingle = f.shingle AND p.id < f.id
    ),
    dots AS (
      SELECT c.id_a, c.id_b, sum(a.w * b.w) AS dot
      FROM cand c
      JOIN w a ON a.id = c.id_a
      JOIN w b ON b.id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT d.id_a, d.id_b,
           CAST(round(d.dot / (na.nrm * nb.nrm), 6) AS DOUBLE) AS cosine
    FROM dots d
    JOIN norms na ON na.id = d.id_a
    JOIN norms nb ON nb.id = d.id_b
    WHERE round(d.dot / (na.nrm * nb.nrm), 6) >= 0.5
    """,
)
def d_idf_weighted_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT near-dedup by IDF-weighted shingle cosine — the all-pairs
    similarity (Bayardo et al. 2007) shape: rare shared shingles count
    more than common ones, so boilerplate overlap scores low where the
    unweighted Jaccard twins treat every gram equally. The weighted
    postings list (id, shingle, ln(N/df)) IS the inverted index; the
    df band (2..1000, df<N) is the blocking step — a shingle in df docs
    fans out df² pair-partials, so the cap bounds the join exactly like
    LSH's max_bucket, and df-1/df-N shingles can't contribute to any
    pair's dot (nothing shared / zero weight). Postings are
    localCheckpointed: three consumers (norms + both join sides) would
    re-run shingling multiplicatively. Docs with no banded shingle never
    enter pairs, so norms are strictly positive wherever used.

    r12 (VERDICT task 8): Bayardo's PREFIX FILTER now cuts the candidate
    join beyond the df cap. In unit-normalized space (x̂ = w/‖w‖, so
    cos = Σ x̂_a x̂_b over shared shingles), sort each doc's postings by
    ascending per-shingle GLOBAL max normalized weight ub(s) =
    max_d x̂_{d,s}; the running sum cum = Σ x̂·ub along that order bounds
    what any partner can score from the features seen so far, so every
    posting with cum < t is SUFFIX — a pair all of whose shared shingles
    sit in the smaller id's suffix has cos ≤ Σ_suffix x̂·ub < t and
    cannot qualify. Candidates therefore come from PREFIX(smaller id) ⋈
    FULL postings (one-sided prefix — prefix-prefix joins need a 2t
    bound and would lose pairs), and the exact dot is then re-aggregated
    over the candidates' full posting lists, so the OUTPUT is provably
    identical to the unfiltered all-pairs join (exact verification over
    supersets of the qualifying pairs; a last-ulp difference in either
    engine's ln/÷ can flip a boundary posting between prefix and suffix
    without touching the result). The prefix CUT runs at t = 0.4999995,
    not 0.5 (r12 review finding): the final filter admits every pair
    with round(cosine, 6) >= 0.5, i.e. true cosine >= 0.4999995, so the
    soundness bound must cover that whole admission band — a 0.5 cut
    could prune a pair at cosine 0.4999997 that the rounded threshold
    ships. The oracle mirrors the whole rule.
    Measured at sf0.1: candidate pairs 38937 → 21711 (-44%). Honest
    wall-time A/B (interleaved new,old,old,new, median of 3 each): the
    filtered form is SLOWER here — 2.17/2.57 s vs 1.73/1.75 s — because
    the filter's extra stages (norm join + ub aggregate + per-doc window
    + candidate re-join) cost more than 17k cheap pairs save at this SF.
    Kept anyway, the pruned-LSH precedent exactly: at corpus scale the
    candidate fan-out is Σ df_prefix·df instead of Σ df², and pair
    verification (not stage count) is what explodes — the df band alone
    admits up to 10⁶ partials per shingle."""
    t = 0.4999995  # the round-6 admission floor of the 0.5 output filter
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", 4, distinct=True)
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = (
        sh.join(df, "shingle")
        .crossJoin(F.broadcast(n))
        .where(
            (F.col("df") >= 2) & (F.col("df") <= 1000)
            & (F.col("df") < F.col("nd"))
        )
        .select(
            "id",
            "shingle",
            F.log(F.col("nd").cast("double") / F.col("df")).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = (
        w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        .localCheckpoint(eager=False)  # consumers: both pair-side joins
    )
    wn = w.join(norms, "id").select(
        "id", "shingle", (F.col("w") / F.col("nrm")).alias("xh")
    )
    ub = wn.groupBy("shingle").agg(F.max("xh").alias("ub"))
    # per-doc running potential in (ub, shingle) order — ROWS frame, and
    # (ub, shingle) is a total order within a doc (shingles are distinct),
    # so both engines fold the identical sequence left to right
    win = (
        W.partitionBy("id")
        .orderBy("ub", "shingle")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pref = (
        wn.join(ub, "shingle")
        .withColumn("cum", F.sum(F.col("xh") * F.col("ub")).over(win))
        .where(F.col("cum") >= t)
        .select("id", "shingle")
    )
    cand = (
        pref.alias("p")
        .join(
            w.alias("f"),
            (F.col("p.shingle") == F.col("f.shingle"))
            & (F.col("p.id") < F.col("f.id")),
        )
        .select(F.col("p.id").alias("id_a"), F.col("f.id").alias("id_b"))
        .distinct()
    )
    dots = (
        cand.join(w.alias("a"), F.col("id_a") == F.col("a.id"))
        .join(
            w.alias("b"),
            (F.col("id_b") == F.col("b.id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.5)
    )


@query(
    "d_lsh_recall_audit",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    ),
    lshp AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE i.nc / (sa.ns + sb.ns - i.nc) >= 0.5
    ),
    tinter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS nc
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    truth AS (
      SELECT t.id_a, t.id_b
      FROM tinter t
      JOIN sizes sa ON sa.id = t.id_a
      JOIN sizes sb ON sb.id = t.id_b
      WHERE t.nc / (sa.ns + sb.ns - t.nc) >= 0.5
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_found,
           CAST(count(*) - sum(CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missed,
           CAST(CASE WHEN count(*) = 0 THEN 1000000
                ELSE (sum(CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END)
                      * 1000000) // count(*) END AS BIGINT) AS recall_ppm
    FROM truth tr
    LEFT JOIN lshp l ON l.id_a = tr.id_a AND l.id_b = tr.id_b
    """,
)
def d_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality audit — measured RECALL of the md5 MinHash-LSH pipeline
    against exact ground truth, in-engine (the sketch-audit family:
    a_cms_heavy_hitters reports overestimates, j_bloom_prefilter_join
    false positives, this one banding misses). Ground truth = every pair
    sharing ≥1 shingle with exact Jaccard ≥ 0.5 via the inverted-index
    self-join (the pair fan-out is Σ df² — measured 2k/52k partials at
    sf0.001/sf0.1 on this corpus, NOT quadratic; a production corpus
    caps df like d_idf_weighted_neardup's band). LSH detections are a
    subset of truth by construction (identical exact-Jaccard verify), so
    the one left join yields found/missed/recall_ppm in integers.
    16 bands × 4 rows at t=0.5 should sit high on the S-curve — a
    recall_ppm collapse in a driver round is a real banding regression,
    not noise.

    r15 optimization (two first-principles cuts, output identical):
    (a) the LSH side stops at CANDIDATE GENERATION — a truth pair (which
    by definition has exact Jaccard ≥ 0.5 over shared shingles) passes
    the LSH pipeline's verification iff it is a banded candidate at all,
    so found = truth ∩ cand and the one-scan verification tail
    (role-explode + shingle join + two-level aggregate) computed nothing
    this entry's output needed; (b) the signature build reads the
    checkpointed DISTINCT shingle frame the truth side already
    materialized (min() is duplicate-insensitive, so the distinct stream
    yields bit-identical signatures) instead of re-scanning +
    re-tokenizing the corpus for a second non-distinct stream. The
    oracle keeps the full two-pipeline form as the spec."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", 4, distinct=True).localCheckpoint(
        eager=False
    )  # consumers: both truth-join sides + sizes + the signature build
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("ns"))
    a = sh.alias("a")
    b = sh.alias("b")
    tinter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("ns").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("ns").alias("nb"))
    truth = (
        tinter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            F.col("nc") / (F.col("na") + F.col("nb") - F.col("nc")) >= 0.5
        )
        .select("id_a", "id_b")
    )
    sig = dd.minhash_signatures(sh, 64, "md5")
    cand = dd.lsh_candidates(sig, bands=16, rows_per_band=4, max_bucket=5000)
    joined = truth.join(
        cand.select("id_a", "id_b", F.lit(1).alias("hit")),
        ["id_a", "id_b"],
        "left",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_found"),
        (F.count(F.lit(1)) - F.coalesce(F.sum("hit"), F.lit(0)))
        .cast("long")
        .alias("n_missed"),
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN 1000000"
            " ELSE (coalesce(sum(hit), 0) * 1000000) div count(1) END"
            " AS BIGINT)"
        ).alias("recall_ppm"),
    )


@query(
    "d_minhash_estimate_error_audit",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    est AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(range(1, 65), i -> sa.s[i] = sb.s[i]))
               AS n_match
      FROM cand c
      JOIN sig sa ON sa.id = c.id_a
      JOIN sig sb ON sb.id = c.id_b
    ),
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT e.id_a, e.id_b,
           CAST(e.n_match AS BIGINT) AS n_match,
           CAST(round(e.n_match / 64.0, 6) AS DOUBLE) AS est_jaccard,
           CAST(round(i.nc / (sa.ns + sb.ns - i.nc), 6) AS DOUBLE)
             AS true_jaccard,
           CAST(round(abs(round(e.n_match / 64.0, 6)
                          - round(i.nc / (sa.ns + sb.ns - i.nc), 6)), 6)
                AS DOUBLE) AS abs_err
    FROM est e
    JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes sa ON sa.id = e.id_a
    JOIN sizes sb ON sb.id = e.id_b
    """,
)
def d_minhash_estimate_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ESTIMATION-accuracy member of the sketch-audit family
    (d_lsh_recall_audit measures what the bands MISS; this measures how
    far the signature's Jaccard ESTIMATE sits from the exact value on
    the pairs it finds — the number that justifies verifying with the
    real shingle join instead of trusting the sketch): for every md5-LSH
    candidate pair, the fraction of agreeing signature positions
    (the unbiased MinHash estimator, E[matches]/k = J) beside the exact
    shingle Jaccard and their absolute gap. k=64 gives σ ≈ sqrt(J(1-J)/64)
    ≈ 0.06 at J=0.5 — visible in the output, which is the point.
    Signatures are localCheckpointed (three consumers: banding + both
    estimate join sides); the estimate comparison is a 64-element
    zip-filter per pair over the bounded candidate set; the exact side
    reuses the shared one-scan verification at threshold 0 (candidates
    with a shared band share the argmin shingle, so n_common >= 1 —
    zero-overlap candidates are hash-collision-grade events)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", 4, distinct=True)
    sig = dd.minhash_signatures(
        dd.shingles(docs, "doc_id", "text", 4, distinct=False),
        64,
        hash_fn="md5",
    ).localCheckpoint(eager=False)
    cand = dd.lsh_candidates(sig, bands=16, rows_per_band=4, max_bucket=5000)
    est = (
        cand.join(
            sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")),
            "id_a",
        )
        .join(
            sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))"
            ).cast("long").alias("n_match"),
        )
    )
    true_j = dd._verified_jaccard(cand, sh, 0.0)
    est_r = F.round(F.col("n_match") / 64.0, 6)
    return (
        est.join(true_j, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "n_match",
            est_r.alias("est_jaccard"),
            F.col("jaccard").alias("true_jaccard"),
            F.round(F.abs(est_r - F.col("jaccard")), 6).alias("abs_err"),
        )
    )


@query(
    "d_bbit_minhash_estimate_audit",
    oracle=f"""
    WITH {_duck_shingles(4)},
    {_duck_minhash_md5(64)},
    {_DUCK_BAND_CAND},
    est AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(range(1, 65),
                             i -> sa.s[i] % 2 = sb.s[i] % 2)) AS n_bit_match,
             len(list_filter(range(1, 65), i -> sa.s[i] = sb.s[i]))
               AS n_full_match
      FROM cand c
      JOIN sig sa ON sa.id = c.id_a
      JOIN sig sb ON sb.id = c.id_b
    ),
    sizes AS (SELECT id, count(*) AS ns FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.id = c.id_a
      JOIN sh y ON y.id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT e.id_a, e.id_b,
           CAST(e.n_bit_match AS BIGINT) AS n_bit_match,
           CAST(round(2.0 * e.n_bit_match / 64.0 - 1.0, 6) AS DOUBLE)
             AS est_b1,
           CAST(round(e.n_full_match / 64.0, 6) AS DOUBLE) AS est_full,
           CAST(round(i.nc / (sa.ns + sb.ns - i.nc), 6) AS DOUBLE)
             AS true_jaccard,
           CAST(round(abs(round(2.0 * e.n_bit_match / 64.0 - 1.0, 6)
                          - round(i.nc / (sa.ns + sb.ns - i.nc), 6)), 6)
                AS DOUBLE) AS abs_err_b1
    FROM est e
    JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes sa ON sa.id = e.id_a
    JOIN sizes sb ON sb.id = e.id_b
    """,
)
def d_bbit_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minwise hashing (Li & König 2010) graded against the full
    sketch AND the exact Jaccard — the memory-efficiency member of the
    sketch-audit family: keeping only the LOWEST bit of each of the 64
    minhash values shrinks the signature 64× (at 100 TB the b-bit table
    is what fits in memory), and the unbiased estimator corrects for
    chance bit collisions: E[f] = ½ + ½·J for b=1, so Ĵ = 2f − 1 where
    f is the agreeing-bit fraction. The audit ships the b=1 estimate
    beside the full-sketch estimate and the exact value — the variance
    blow-up (σ_b1 ≈ 2σ_full at small J) is VISIBLE, which is the usual
    argument for b=2..4 in production. Same md5 channel, candidates,
    and one-scan exact verification as d_minhash_estimate_error_audit;
    bit extraction is s[i] % 2 on both engines (minhash values are
    non-negative, so % and pmod agree)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", 4, distinct=True)
    sig = dd.minhash_signatures(
        dd.shingles(docs, "doc_id", "text", 4, distinct=False),
        64,
        hash_fn="md5",
    ).localCheckpoint(eager=False)
    cand = dd.lsh_candidates(sig, bands=16, rows_per_band=4, max_bucket=5000)
    est = (
        cand.join(
            sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")),
            "id_a",
        )
        .join(
            sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "size(filter(zip_with(sa, sb, (x, y) -> x % 2 = y % 2),"
                " v -> v))"
            ).cast("long").alias("n_bit_match"),
            F.expr(
                "size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))"
            ).cast("long").alias("n_full_match"),
        )
    )
    true_j = dd._verified_jaccard(cand, sh, 0.0)
    est_b1 = F.expr("round(2.0D * n_bit_match / 64.0D - 1.0D, 6)")
    return (
        est.join(true_j, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "n_bit_match",
            est_b1.cast("double").alias("est_b1"),
            F.expr("CAST(round(n_full_match / 64.0D, 6) AS DOUBLE)").alias(
                "est_full"
            ),
            F.col("jaccard").alias("true_jaccard"),
            F.round(F.abs(est_b1 - F.col("jaccard")), 6).alias("abs_err_b1"),
        )
    )


@query(
    "d_dup_cluster_size_histogram",
    oracle="""
    WITH fp AS (
      SELECT md5(substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                            'g')), 1, 60)) AS h
      FROM documents
    ),
    g AS (SELECT h, count(*) AS sz FROM fp GROUP BY h),
    hist AS (SELECT sz, count(*) AS n_clusters FROM g GROUP BY sz)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(sz * n_clusters AS BIGINT) AS n_docs
    FROM hist
    """,
)
def d_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION — the dataset-card view of
    dedup impact (dedup rates say how many docs go; the size histogram
    says whether they go as a few giant boilerplate clusters or a long
    tail of pairs, which decides whether exact dedup alone is enough):
    docs group by the prefix-60 normalized fingerprint (the
    d_cross_source_leakage channel — raw-text md5 is VACUOUS at oracle
    scales on this corpus), cluster sizes histogram into (size,
    n_clusters, n_docs). Two stacked partial+final aggregates on the
    32-byte key; text never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        F.md5(F.substring(dd.normalize_text("text"), 1, 60)).alias("h")
    )
    g = fp.groupBy("h").agg(F.count(F.lit(1)).alias("sz"))
    return (
        g.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).alias("n_docs"),
        )
    )


# dedup threshold-sweep candidate thresholds (jaccard ppm) — structural
# literals spanning the usual near-dup operating range
_SWEEP_THR_PPM = [300000, 400000, 500000, 600000, 700000, 800000]
_SWEEP_THR_VALUES = ", ".join(f"({t})" for t in _SWEEP_THR_PPM)


@query(
    "d_dedup_threshold_sweep",
    oracle=f"""
    WITH {_duck_shingles(4)},
    pruned AS (
      SELECT * FROM sh WHERE shingle IN (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000
      )
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    pj AS (
      SELECT CAST(n_common * 1000000 // (sa.n + sb.n - n_common)
                  AS BIGINT) AS j_ppm
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    ),
    thr(t) AS (VALUES {_SWEEP_THR_VALUES}),
    cells AS (
      SELECT t.t AS threshold_ppm,
             CAST(sum(CASE WHEN p.j_ppm >= t.t THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN p.j_ppm >= t.t THEN p.j_ppm ELSE 0 END)
                  AS BIGINT) AS sum_jaccard_ppm
      FROM thr t LEFT JOIN pj p ON true GROUP BY t.t
    )
    SELECT CAST(threshold_ppm AS BIGINT) AS threshold_ppm, n_pairs,
           sum_jaccard_ppm,
           CAST(CASE WHEN n_pairs = 0 THEN NULL
                ELSE sum_jaccard_ppm // n_pairs END AS BIGINT)
             AS mean_jaccard_ppm
    FROM cells
    """,
)
def d_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup THRESHOLD tuning curve — pair counts at jaccard
    thresholds 0.3..0.8 from ONE exact candidate/verify pass (the
    sim_ivf_nprobe_curve's dedup sibling: the near-dup threshold is
    the knob a corpus owner actually sets, trading recall of true
    dups against false merges, and the curve's shape — where the pair
    count knees — IS the decision input): exact 4-gram Jaccard pairs
    (the d_ngram_jaccard_topk machinery, stop-shingle pruned) collapse
    to an exact integer j_ppm per pair (n_common·1e6 div union — the
    floor-division channel), then SIX conditional sums in one
    aggregate, fanned out via the literal-threshold inline_outer shape
    (the a_best_split_gini pattern, empty-input parity included:
    oracle LEFT JOIN, Spark sums coalesced). Mean ships as floor-ppm.
    n_pairs is monotone nonincreasing in the threshold — pinned."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, "doc_id", "text", n=4)
    pairs = dd.jaccard_pairs(sh, max_bucket=1000)
    pj = pairs.select(
        F.expr(
            "CAST(n_common * 1000000 div (n_a + n_b - n_common) AS BIGINT)"
        ).alias("j_ppm")
    )
    aggs = []
    for i, t in enumerate(_SWEEP_THR_PPM):
        aggs.append(
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN j_ppm >= {t} THEN 1 ELSE 0 END")),
                F.lit(0),
            ).cast("long").alias(f"np{i}")
        )
        aggs.append(
            F.coalesce(
                F.sum(
                    F.expr(f"CASE WHEN j_ppm >= {t} THEN j_ppm ELSE 0 END")
                ),
                F.lit(0),
            ).cast("long").alias(f"sj{i}")
        )
    g = pj.groupBy().agg(*aggs)
    structs = ", ".join(
        f"struct(CAST({t} AS BIGINT) AS threshold_ppm, np{i} AS n_pairs,"
        f" sj{i} AS sum_jaccard_ppm)"
        for i, t in enumerate(_SWEEP_THR_PPM)
    )
    cells = g.select(F.expr(f"inline_outer(array({structs}))"))
    return cells.select(
        "threshold_ppm", "n_pairs", "sum_jaccard_ppm",
        F.expr(
            "CAST(CASE WHEN n_pairs = 0 THEN NULL"
            " ELSE sum_jaccard_ppm div n_pairs END AS BIGINT)"
        ).alias("mean_jaccard_ppm"),
    )
