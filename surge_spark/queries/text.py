"""Text-analysis and multimodal-plumbing catalog entries over `documents`."""

from __future__ import annotations

import struct as _struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import dedup as dd
from ..operators import multimodal as mm
from ..operators import text as tx
from . import query
from .dedup import _DUCK_LP_ROUND, _min_label_rounds

from ..operators.dedup import DUCK_NORMALIZE_SQL, DUCK_TOKENS_SQL

_DUCK_TOKS = DUCK_TOKENS_SQL  # single source of truth: operators.dedup


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@query(
    "t_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(t) AS INT) AS n_tokens,
           CAST(len(list_distinct(t)) AS INT) AS n_distinct_tokens,
           CAST(length(text) AS INT) AS n_chars,
           CAST(round(length(array_to_string(t, '')) / greatest(len(t), 1), 6) AS DOUBLE) AS avg_token_len
    FROM (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents)
    """,
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — the cheapest text-quality signal."""
    return tx.token_stats(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "t_bpe_ish_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'),
                                x -> x <> '')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def t_bpe_ish_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-style regex pre-tokenizer (words / digit
    runs / punctuation glyphs)."""
    return tx.bpe_ish_token_count(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "t_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               / greatest(length(text), 1) AS alpha_ratio,
             len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x)))
               / greatest(len(t), 1) AS stop_ratio,
             length(array_to_string(t, '')) / greatest(len(t), 1) AS mean_wlen
      FROM (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents)
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(round(alpha_ratio, 6) AS DOUBLE) AS alpha_ratio,
           CAST(round(stop_ratio, 6) AS DOUBLE) AS stopword_ratio,
           CAST(round(mean_wlen, 6) AS DOUBLE) AS mean_word_len,
           CAST(round(least(1.0,
                 (CASE WHEN mean_wlen >= 3 AND mean_wlen <= 10 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN alpha_ratio >= 0.6 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN n_tokens >= 10 THEN 0.3 ELSE 0.0 END)), 2) AS DOUBLE) AS quality_score
    FROM feats
    """,
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality features + composed score."""
    return tx.quality_score(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "t_language_id",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id,
             len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))) AS en,
             len(list_filter(t, x -> list_contains(['el','la','de','que','y'], x))) AS es,
             len(list_filter(t, x -> list_contains(['le','la','de','et','un'], x))) AS fr,
             len(list_filter(t, x -> list_contains(['der','die','und','das','ein'], x))) AS de,
             len(list_filter(t, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS zh
      FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
    )
    SELECT doc_id,
           CASE WHEN zh > 0 AND zh > en AND zh > es AND zh > fr AND zh > de THEN 'zh'
                WHEN de > 0 AND de > en AND de > es AND de > fr THEN 'de'
                WHEN fr > 0 AND fr > en AND fr > es THEN 'fr'
                WHEN es > 0 AND es > en THEN 'es'
                WHEN en > 0 THEN 'en'
                ELSE 'und' END AS pred_lang,
           CAST(greatest(en, es, fr, de, zh) AS INT) AS stopword_hits
    FROM hits
    """,
)
def t_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-vote language ID; strict-majority argmax with
    declaration-order tie-breaking, mirrored exactly in the oracle."""
    return tx.language_id(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "t_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({DUCK_NORMALIZE_SQL}) AS fingerprint
    FROM documents
    """,
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content md5 fingerprint (engine-portable, unlike xxhash)."""
    return tx.fingerprint(_docs(spark, sf_dir), "doc_id", "text")


@query(
    "t_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY 1
    """,
)
def t_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy(F.floor(F.col("n_chars") / 100).alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           'text/plain' AS mime
    FROM documents WHERE doc_id < 200
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: payload as opaque binary + typed metadata —
    byte length and content digest computed on the binary column (the text
    payload is ASCII, so the oracle's string md5/length agree byte-for-byte)."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    with_bin = mm.to_binary_payload(docs, "doc_id", "text", mime="text/plain")
    return with_bin.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.col("mime"),
    )


# fixed 3x2 24-bit BMP header (dims constant => every byte constant):
# 14-byte file header (magic, size 54+24, pixel offset 54) + 40-byte DIB
# (w=3, h=2 positive => bottom-up, 24 bpp, uncompressed)
_BMP_3X2_HEADER = (
    b"BM"
    + _struct.pack("<IHHI", 78, 0, 0, 54)
    + _struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, 24, 0, 0, 0, 0)
)


@query(
    "mm_feature_extract",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 18) AS s
      FROM documents
      WHERE doc_id < 200 AND regexp_matches(text, '^[ -~]{18}')
    ),
    bytes AS (
      SELECT doc_id, t.i, ascii(substring(s, CAST(t.i AS INT), 1)) AS b
      FROM base, LATERAL (SELECT unnest(range(1, 19)) AS i) t
    )
    SELECT doc_id, CAST(3 AS INT) AS width, CAST(2 AS INT) AS height,
           CAST(sum(CASE WHEN (i - 1) % 3 = 2 THEN b END) AS BIGINT) AS r_sum,
           CAST(sum(CASE WHEN (i - 1) % 3 = 1 THEN b END) AS BIGINT) AS g_sum,
           CAST(sum(CASE WHEN (i - 1) % 3 = 0 THEN b END) AS BIGINT) AS b_sum,
           CAST(sum(b) AS BIGINT) AS total_sum,
           CAST(min(b) AS BIGINT) AS min_b,
           CAST(max(b) AS BIGINT) AS max_b
    FROM bytes GROUP BY doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature-extract pipeline over mapInPandas, under
    a FULL value oracle (graduated r11 via the construct-in-query trick
    mm_ppm_real_decode proved): each doc's first 18 printable-ASCII chars
    become the pixel bytes of a valid 3x2 24-bit BMP — constant 54-byte
    literal header, two 12-byte bottom-up rows (9 BGR pixel bytes + 3 pad
    bytes each), all plain column concat, no UDF — and route through the
    REAL _decode_bmp inside extract_features. Channel mapping is the BMP
    file layout: byte (i-1)%3 = 0/1/2 within a pixel triple is B/G/R, and
    channel SUMS are row-order independent so the bottom-up flip never
    shows. The exact integer sums come back out of the float32 feature
    vector the same way as the PPM twin (error ~1e-4 at worst, far inside
    round()); DuckDB recomputes them directly from the ascii codes. The
    fake-fallback path this entry used to smoke is value-tested in
    tests/test_multimodal.py."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 200)
        .where(F.col("text").rlike("^[ -~]{18}"))
    )
    pad = F.lit(b"\x00\x00\x00")
    payload = F.concat(
        F.lit(_BMP_3X2_HEADER),
        F.encode(F.substring("text", 1, 9), "utf-8"),
        pad,
        F.encode(F.substring("text", 10, 9), "utf-8"),
        pad,
    )
    with_bin = docs.select(
        "doc_id", payload.alias("payload"), F.lit("image/bmp").alias("mime")
    )
    out = mm.extract_features(with_bin, id_col="doc_id")
    f = lambda i: F.element_at("feat", i).cast("double")  # noqa: E731
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.round(f(1) * 6 * 255).cast("long").alias("r_sum"),
        F.round(f(2) * 6 * 255).cast("long").alias("g_sum"),
        F.round(f(3) * 6 * 255).cast("long").alias("b_sum"),
        F.round(f(4) * 18 * 255).cast("long").alias("total_sum"),
        F.round(f(5) * 255).cast("long").alias("min_b"),
        F.round(f(6) * 255).cast("long").alias("max_b"),
    )


@query(
    "mm_ppm_real_decode",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 18) AS s
      FROM documents
      WHERE doc_id < 200 AND regexp_matches(text, '^[ -~]{18}')
    ),
    bytes AS (
      SELECT doc_id, t.i, ascii(substring(s, CAST(t.i AS INT), 1)) AS b
      FROM base, LATERAL (SELECT unnest(range(1, 19)) AS i) t
    )
    SELECT doc_id, CAST(3 AS INT) AS width, CAST(2 AS INT) AS height,
           CAST(sum(CASE WHEN (i - 1) % 3 = 0 THEN b END) AS BIGINT) AS r_sum,
           CAST(sum(CASE WHEN (i - 1) % 3 = 1 THEN b END) AS BIGINT) AS g_sum,
           CAST(sum(CASE WHEN (i - 1) % 3 = 2 THEN b END) AS BIGINT) AS b_sum,
           CAST(sum(b) AS BIGINT) AS total_sum,
           CAST(min(b) AS BIGINT) AS min_b,
           CAST(max(b) AS BIGINT) AS max_b
    FROM bytes GROUP BY doc_id
    """,
)
def mm_ppm_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image-decode path under a FULL value oracle: each doc's
    first 18 printable-ASCII characters become the pixel bytes of a valid
    3x2 P6 PPM (header concat + utf-8 encode — plain column functions, no
    UDF), flow through the actual mapInPandas decode
    (operators.multimodal._decode_ppm -> real pixel statistics), and come
    back out as EXACT integer channel sums (feat[i] * 6*255 etc. — the
    float32 feature storage is ~1e-4 off an integer at worst, far inside
    round()'s safety), which DuckDB recomputes directly from the same
    ascii codes. mm_feature_extract stays the fake-fallback rows-only
    twin; THIS entry is the decode pipeline's value check. The printable-
    ASCII filter makes chars == bytes on both engines."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 200)
        .where(F.col("text").rlike("^[ -~]{18}"))
    )
    payload = F.concat(
        F.lit(b"P6\n3 2\n255\n"), F.encode(F.substring("text", 1, 18), "utf-8")
    )
    with_bin = docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
    )
    out = mm.extract_features(with_bin, id_col="doc_id")
    f = lambda i: F.element_at("feat", i).cast("double")  # noqa: E731
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.round(f(1) * 6 * 255).cast("long").alias("r_sum"),
        F.round(f(2) * 6 * 255).cast("long").alias("g_sum"),
        F.round(f(3) * 6 * 255).cast("long").alias("b_sum"),
        F.round(f(4) * 18 * 255).cast("long").alias("total_sum"),
        F.round(f(5) * 255).cast("long").alias("min_b"),
        F.round(f(6) * 255).cast("long").alias("max_b"),
    )


# fixed 8x8 24-bit BMP header (the mm_phash_neardup canvas): 14-byte file
# header (size 54 + 8 rows x 24 bytes = 246, pixel offset 54) + 40-byte
# DIB (w=8, h=8 positive => bottom-up, 24 bpp; rows are 24 bytes = no pad)
_BMP_8X8_HEADER = (
    b"BM"
    + _struct.pack("<IHHI", 246, 0, 0, 54)
    + _struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, 192, 0, 0, 0, 0)
)

# storage-order pixel string: char k (1-based) tripled into the BGR bytes
# of pixel (k-1) in BMP bottom-up row order — built as ONE parsed expr
# (the minhash plan-build lesson: 192 py4j Column calls cost real seconds)
_PHASH_TRIP_SQL = "concat(" + ", ".join(
    f"repeat(substring(s, {k}, 1), 3)" for k in range(1, 65)
) + ")"


# the shared phash pipeline CTEs (fingerprint -> bands -> slotted ->
# verified Hamming<=3 pairs), used by BOTH mm_phash_neardup and
# mm_phash_clusters (review-factoring discipline: the banding/slot rule
# must evolve in lockstep across the pair and cluster entries)
_PHASH_CTES_SQL = """base AS (
      SELECT doc_id, substring(text, 1, 64) AS s
      FROM documents WHERE regexp_matches(text, '^[ -~]{64}')
    ),
    px AS (
      SELECT doc_id, t.i, ascii(substring(s, CAST(t.i AS INT), 1)) AS v
      FROM base, LATERAL (SELECT unnest(range(1, 65)) AS i) t
    ),
    bits AS (
      SELECT doc_id, (7 - (i - 1) // 8) * 8 + (i - 1) % 8 AS bit, v FROM px
    ),
    tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS total FROM px GROUP BY 1),
    fp AS (
      SELECT b.doc_id,
        CAST(sum(CASE WHEN b.bit >= 32 AND b.v * 64 > t.total
             THEN (CAST(1 AS BIGINT) << (b.bit - 32)) ELSE 0 END)
             AS BIGINT) AS fp_hi,
        CAST(sum(CASE WHEN b.bit < 32 AND b.v * 64 > t.total
             THEN (CAST(1 AS BIGINT) << b.bit) ELSE 0 END)
             AS BIGINT) AS fp_lo
      FROM bits b JOIN tot t USING (doc_id) GROUP BY 1
    ),
    bands AS (
      SELECT doc_id, j.j AS band_idx,
             CASE WHEN j.j < 2 THEN (fp_lo >> (16 * j.j)) & 65535
                  ELSE (fp_hi >> (16 * (j.j - 2))) & 65535 END AS band_val
      FROM fp, LATERAL (SELECT unnest(range(0, 4)) AS j) j
    ),
    sized AS (
      SELECT doc_id, band_idx, band_val,
             CAST(count(*) OVER (PARTITION BY band_idx, band_val)
                  AS BIGINT) AS c
      FROM bands
    ),
    slotted AS (
      SELECT doc_id, band_idx, band_val,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % ((c + 255) // 256) AS slot
      FROM sized
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM slotted a JOIN slotted b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.slot = b.slot AND a.doc_id < b.doc_id
    ),
    ham_pairs AS (
      SELECT c.id_a, c.id_b,
             CAST(bit_count(xor(fa.fp_hi, fb.fp_hi))
                  + bit_count(xor(fa.fp_lo, fb.fp_lo)) AS BIGINT) AS hamming
      FROM cand c
      JOIN fp fa ON fa.doc_id = c.id_a
      JOIN fp fb ON fb.doc_id = c.id_b
      WHERE bit_count(xor(fa.fp_hi, fb.fp_hi))
            + bit_count(xor(fa.fp_lo, fb.fp_lo)) <= 3
    )"""


def _phash_pairs(spark: SparkSession, sf_dir: str):
    """Shared Spark half of the phash pipeline: returns (fp, pairs) —
    the checkpointed fingerprint frame and the verified Hamming<=3 pair
    frame (see mm_phash_neardup's docstring for every design decision;
    this helper exists so the cluster entry can never drift from the
    pair entry's banding/slot rule)."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("text").rlike("^[ -~]{64}"))
        .select("doc_id", F.substring("text", 1, 64).alias("s"))
    )
    payload = F.concat(
        F.lit(_BMP_8X8_HEADER), F.encode(F.expr(_PHASH_TRIP_SQL), "utf-8")
    )
    with_bin = docs.select("doc_id", payload.alias("payload"))
    fp = (
        mm.image_ahash(with_bin, id_col="doc_id")
        .select(F.col("id").alias("doc_id"), "fp_hi", "fp_lo")
        .where(F.col("fp_hi").isNotNull())
        .localCheckpoint(eager=False)
    )
    bands = fp.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "array(fp_lo & 65535, shiftright(fp_lo, 16) & 65535,"
                " fp_hi & 65535, shiftright(fp_hi, 16) & 65535)"
            )
        ).alias("band_idx", "band_val"),
    )
    slotted = bands.select(
        "doc_id",
        "band_idx",
        "band_val",
        F.expr(
            "pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT),"
            " (CAST(count(1) OVER (PARTITION BY band_idx, band_val)"
            " AS BIGINT) + 255) div 256)"
        ).alias("slot"),
    )
    ba, bb = slotted.alias("ba"), slotted.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_val") == F.col("bb.band_val"))
            & (F.col("ba.slot") == F.col("bb.slot"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("id_a"), F.col("bb.doc_id").alias("id_b")
        )
        .distinct()
    )
    fa = fp.select(
        F.col("doc_id").alias("id_a"),
        F.col("fp_hi").alias("ha"),
        F.col("fp_lo").alias("la"),
    )
    fb = fp.select(
        F.col("doc_id").alias("id_b"),
        F.col("fp_hi").alias("hb"),
        F.col("fp_lo").alias("lb"),
    )
    pairs = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                "CAST(bit_count(ha ^ hb) AS BIGINT) + bit_count(la ^ lb)"
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
    return fp, pairs


@query(
    "mm_phash_neardup",
    oracle=f"""
    WITH {_PHASH_CTES_SQL}
    SELECT id_a, id_b, hamming FROM ham_pairs
    """,
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash IMAGE near-dup — the multimodal member of the
    dedup family (r14 VERDICT task 2): 64-bit average hash (aHash) over
    the REAL decode path, banded like simhash, exact Hamming verify.
    Full oracle via the construct-in-query trick (mm_feature_extract
    precedent): each doc's first 64 printable-ASCII chars become the
    grey levels of a valid 8×8 24-bit BMP (constant 54-byte header +
    each char tripled into BGR — B=G=R makes integer grey exactly the
    char code, and the 8×8 canvas makes the resample the identity), so
    the mapInPandas ahash64 kernel (decode → resample → integer grey →
    strict ``v*64 > total`` mean threshold → two 32-bit halves) is an
    exact integer channel DuckDB recomputes from the ascii codes; BMP
    bottom-up row order = the bit-index flip mirrored in the oracle.
    Banding: 4 bands × 16 bits — pigeonhole-complete for the Hamming≤3
    output threshold (a pair differing in ≤3 bits leaves ≥1 band
    untouched); 16-bit bands measured 5.5k candidates / max bucket 39
    at sf0.01 vs 61k / 143 for 8-bit bands on this corpus
    (text-derived brightness skews narrow bands). OVERSIZED band
    buckets are sub-blocked at max 256 docs via an md5 slot (the
    max_block rule, mirrored EXACTLY in the oracle through the md5
    channel — n_sub = ceil(c/256), slot = md5(doc_id)[:8] % n_sub):
    non-binding at the oracle scales (max bucket 39 < 256 ⇒ n_sub = 1,
    output identical to uncapped) but essential on low-entropy corpora
    — the r15 stress slice (31-word vocab) concentrated fingerprints
    into 2.5k-doc buckets, 19.1M candidate pairs at sf0.5 and a 1.58
    exponent uncapped; capped re-measured 0.87 (15.0 → 6.3 s — in-
    bucket growth now linear in n_sub, the d_idf_weighted band). The
    completeness claim weakens only inside split buckets: a ≤3-bit
    pair whose every untouched band lands in a split bucket can miss
    (the sim_blocked_pairs_recall_audit class). The fingerprint frame
    is localCheckpointed (band explode ×2 sides + 2 verify sides);
    both slotted sides are the identical subtree renamed after the
    join → ReusedExchange. At scale: band join is the only shuffle,
    in-bucket pair growth capped at 256²; the verify join is
    O(candidates)."""
    _fp, pairs = _phash_pairs(spark, sf_dir)
    return pairs


# fixed 9x8 24-bit BMP header (the dHash canvas: 9 columns so the 8
# horizontal gradients per row are all real): rows are 27 bytes + 1 pad
# byte; file size 54 + 8*28 = 278
_BMP_9X8_HEADER = (
    b"BM"
    + _struct.pack("<IHHI", 278, 0, 0, 54)
    + _struct.pack("<IiiHHIIiiII", 40, 9, 8, 1, 24, 0, 224, 0, 0, 0, 0)
)

# one 27-char string per BMP storage row r_s: chars r_s*9+1 .. r_s*9+9
# tripled into BGR (one parsed expr per row, the plan-build rule)
_DHASH_ROW_SQL = [
    "concat(" + ", ".join(
        f"repeat(substring(s, {r * 9 + k}, 1), 3)" for k in range(1, 10)
    ) + ")"
    for r in range(8)
]


@query(
    "mm_phash_clusters",
    oracle=f"""
    WITH {_PHASH_CTES_SQL},
    symp AS (
      SELECT id_a AS a, id_b AS b FROM ham_pairs
      UNION ALL SELECT id_b, id_a FROM ham_pairs
    ),
    l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM fp),
    l1 AS ({_DUCK_LP_ROUND.format(prev="l0")}),
    l2 AS ({_DUCK_LP_ROUND.format(prev="l1")}),
    l3 AS ({_DUCK_LP_ROUND.format(prev="l2")})
    SELECT id AS doc_id, CAST(lbl AS BIGINT) AS cluster FROM l3
    """,
)
def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image duplicate CLUSTERS — the d_fuzzy_dedup_clusters analog for
    the multimodal family: the Hamming≤3 aHash pair graph (the ENTIRE
    mm_phash_neardup pipeline via the shared _phash_pairs kernel — one
    code path, so the banding/slot rule cannot drift between the pair
    and cluster entries) collapsed to components by 3 unrolled
    min-label rounds (the shared _min_label_rounds helper; fixed
    rounds make the labels a pure function, so even the propagation is
    fully oracled via _DUCK_LP_ROUND). Every fingerprinted doc gets a
    row — singletons keep their own id as the cluster label. The pair
    frame is localCheckpointed (each propagation round joins it
    twice)."""
    fp, pairs = _phash_pairs(spark, sf_dir)
    edges = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
    sym = edges.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).unionAll(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
    seed = fp.select(
        F.col("doc_id").alias("id"), F.col("doc_id").alias("lbl")
    )
    lbl = _min_label_rounds(sym, seed, rounds=3)
    return lbl.select(
        F.col("id").alias("doc_id"), F.col("lbl").cast("bigint").alias("cluster")
    )


@query(
    "mm_dhash_fingerprints",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 72) AS s
      FROM documents WHERE regexp_matches(text, '^[ -~]{72}')
    ),
    bits AS (
      SELECT doc_id, r.r * 8 + c.c AS bit,
             CASE WHEN ascii(substring(s,
                      CAST((7 - r.r) * 9 + c.c + 2 AS INT), 1))
                    > ascii(substring(s,
                      CAST((7 - r.r) * 9 + c.c + 1 AS INT), 1))
                  THEN 1 ELSE 0 END AS b
      FROM base,
           LATERAL (SELECT unnest(range(0, 8)) AS r) r,
           LATERAL (SELECT unnest(range(0, 8)) AS c) c
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN bit >= 32 AND b = 1
                THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END)
                AS BIGINT) AS fp_hi,
           CAST(sum(CASE WHEN bit < 32 AND b = 1
                THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                AS BIGINT) AS fp_lo
    FROM bits GROUP BY doc_id
    """,
)
def mm_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit difference-hash (dHash) fingerprints over the REAL decode
    path — the gradient twin of mm_phash_neardup's aHash (dHash is the
    standard sharper member: bit r*8+c = grey[r][c+1] > grey[r][c] on a
    9×8 resample, robust to uniform brightness shifts that move every
    aHash bit at once). Full oracle via constructed 9×8 24-bit BMPs
    (72 printable-ASCII chars as tripled BGR grey levels; 27-byte rows
    + 1 pad byte each; the 9-wide canvas makes the 9×8 resample the
    identity), so the mapInPandas dhash64 kernel's strict integer
    gradient comparisons are recomputed exactly by DuckDB from the
    ascii codes — the BMP bottom-up row order is the (7-r) flip in the
    oracle's char indexing. One decode pass, no shuffle, no join; the
    fingerprint halves are the simhash-style unsigned-32-bit channel."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("text").rlike("^[ -~]{72}"))
        .select("doc_id", F.substring("text", 1, 72).alias("s"))
    )
    pad = F.lit(b"\x00")
    parts = [F.lit(_BMP_9X8_HEADER)]
    for row_sql in _DHASH_ROW_SQL:
        parts.append(F.encode(F.expr(row_sql), "utf-8"))
        parts.append(pad)
    with_bin = docs.select("doc_id", F.concat(*parts).alias("payload"))
    fp = mm.image_ahash(with_bin, id_col="doc_id", kind="dhash")
    return fp.select(
        F.col("id").alias("doc_id"), "fp_hi", "fp_lo"
    ).where(F.col("fp_hi").isNotNull())


@query(
    "mm_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(16 + length(text) % 64 AS INT) AS orig_width,
             CAST(16 + (length(text) // 64) % 64 AS INT) AS orig_height
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(greatest(1, floor(orig_width *
             least(1.0, 128.0 / greatest(orig_width, orig_height)))) AS INT) AS width,
           CAST(greatest(1, floor(orig_height *
             least(1.0, 128.0 / greatest(orig_width, orig_height)))) AS INT) AS height,
           orig_width, orig_height
    FROM dims
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (longer side → 128, aspect preserved, no upscale) over
    mapInPandas. For stdlib-decodable payloads resize_images does a REAL
    decode → nearest-neighbor resample → lossless P6 re-encode (pinned in
    tests/test_multimodal.py); this entry's ASCII payloads take the
    deterministic dimensions-from-length fallback, so the metadata math
    has a full SQL oracle across the whole corpus."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 100)
    with_bin = mm.to_binary_payload(docs, "doc_id", "text", mime="image/fake")
    out = mm.resize_images(with_bin, max_side=128, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "width", "height", "orig_width", "orig_height"
    )


@query(
    "mm_frame_sample_stub",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 50
    ),
    frames AS (
      SELECT doc_id, CAST(gs.i AS INT) AS frame_index,
             CAST(gs.i * 1000 AS BIGINT) AS ts_ms, n, text
      FROM base, LATERAL (
        SELECT unnest(generate_series(
          0, CAST(ceil(greatest(n, 1) / 1000.0) AS BIGINT) - 1)) AS i
      ) gs
    )
    SELECT doc_id, frame_index, ts_ms,
           md5(substring(text,
             CAST(least(ts_ms, greatest(n - 16, 0)) AS INT) + 1, 16)) AS frame_md5
    FROM frames
    """,
)
def mm_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: each payload fans out to one row per
    sampled frame (1 ms per byte in the fake demuxer, one frame per second)
    inside mapInPandas — the payload never shuffles, frames do. Frame bytes
    are deterministic payload slices, so the fan-out count, timestamps, and
    frame content all have a SQL oracle (md5 over the same ASCII bytes).
    Since r10 the OPERATOR demuxes real MP4 payloads via the stdlib
    ISO-BMFF parser (operators/mp4.py — true sample byte ranges,
    timestamps, keyframe flags; constructed-container tests); THIS entry's
    ASCII payloads deliberately keep the fake path so its oracle stays a
    pure function of the bytes."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 50)
    with_bin = mm.to_binary_payload(docs, "doc_id", "text", mime="video/fake")
    out = mm.sample_frames(with_bin, every_ms=1000, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "frame_index",
        "ts_ms",
        F.md5("frame").alias("frame_md5"),
    )


@query(
    "t_repetition_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
      WHERE {DUCK_NORMALIZE_SQL} <> ''
    ),
    g AS (
      SELECT doc_id, len(t) AS n_toks,
             CASE WHEN len(t) >= 3
                  THEN array_to_string(t[gs.i:gs.i + 2], ' ')
                  ELSE array_to_string(t, ' ') END AS gram
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
      ) gs
    )
    SELECT doc_id,
           CAST(max(CASE WHEN n_toks >= 3 THEN n_toks - 2 ELSE 1 END) AS INT)
             AS n_ngrams,
           CAST(count(DISTINCT gram) AS INT) AS n_distinct_ngrams,
           round((max(CASE WHEN n_toks >= 3 THEN n_toks - 2 ELSE 1 END)
                  - count(DISTINCT gram))
                 / CAST(max(CASE WHEN n_toks >= 3 THEN n_toks - 2 ELSE 1 END)
                        AS DOUBLE), 6) AS dup_ngram_fraction
    FROM g GROUP BY doc_id
    """,
)
def t_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filter: duplicate 3-gram
    fraction per doc. Pure map-side projection (the gram multiset never
    leaves its row) — a quality gate near-dup passes can't provide."""
    from ..operators.dedup import normalize_text
    from ..operators.text import repetition_score

    docs = _docs(spark, sf_dir).where(normalize_text("text") != "")
    return repetition_score(docs, "doc_id", "text", n=3)


@query(
    "t_redact_pii",
    oracle="""
    WITH step1 AS (
      SELECT doc_id, text,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '[REDACTED]', 'g') AS r1
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           regexp_replace(r1, '\\+?[0-9][0-9()\\- ]{7,}[0-9]',
                          '[REDACTED]', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS INT) AS n_phones
    FROM step1
    """,
)
def t_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training data: email and phone-shaped spans replaced,
    hit counts kept for audit sampling. regexp_replace projection, map-side,
    RE2-compatible patterns so the identical regex runs in the oracle."""
    from ..operators.text import redact_pii

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 500)
    return redact_pii(docs, "doc_id", "text")


@query(
    "t_chunk_documents",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST(gs.i AS INT) AS chunk_idx,
             array_to_string(t[(gs.i * 40 + 1):(gs.i * 40 + 50)], ' ') AS chunk_text
      FROM toks, LATERAL (
        SELECT unnest(generate_series(0, greatest(CAST(ceil((len(t) - 50) / 40.0) AS BIGINT), 0))) AS i
      ) gs
    )
    SELECT doc_id, chunk_idx, chunk_text,
           CAST(len(string_split(chunk_text, ' ')) AS INT) AS chunk_tokens
    FROM chunks WHERE chunk_text <> ''
    """,
)
def t_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline chunking: split each document into 50-token chunks
    with stride 40 (10-token overlap). Map-side sequence+slice explode —
    no shuffle; at 100 TB this is the pre-tokenization pass before packing."""
    docs = _docs(spark, sf_dir)
    toks = dd.tokens("text")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - 50) / 40.0).cast("long"), F.lit(0)
    )
    with_toks = docs.select("doc_id", toks.alias("_t"), n_chunks.alias("_n"))
    chunks = with_toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_n")),
                lambda i: F.array_join(F.slice(F.col("_t"), i * 40 + 1, 50), " "),
            )
        ).alias("chunk_idx", "chunk_text"),
    ).where(F.col("chunk_text") != "")
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split("chunk_text", " ")).alias("chunk_tokens"),
    )


@query(
    "t_deterministic_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
    """,
)
def t_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample via an md5 threshold on the key — the
    reproducible, engine-portable sampling a training pipeline needs
    (TABLESAMPLE/rand() are engine-specific). Filter is map-side; the same
    predicate selects the same rows on any engine, any partitioning."""
    docs = _docs(spark, sf_dir)
    return docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "40"
    ).select("doc_id", "lang")


@query(
    "t_tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS DOUBLE) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored) WHERE rank <= 3
    """,
)
def t_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document. Ties on the rounded score break
    by term on BOTH sides, so the ranking is engine-portable."""
    return tx.tfidf_top_terms(_docs(spark, sf_dir), "doc_id", "text", k=3)


@query(
    "t_vocab_top_terms",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, term
      FROM (SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS term FROM documents)
      WHERE term <> ''
    ),
    occurrences AS (
      SELECT term FROM (SELECT unnest({_DUCK_TOKS}) AS term FROM documents)
      WHERE term <> ''
    )
    SELECT d.term, d.df_docs, o.total_tf
    FROM (SELECT term, count(*) AS df_docs FROM per_doc GROUP BY term) d
    JOIN (SELECT term, count(*) AS total_tf FROM occurrences GROUP BY term) o
      USING (term)
    ORDER BY df_docs DESC, term ASC LIMIT 20
    """,
)
def t_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-20 terms by document frequency —
    map-side array_distinct before the explode, TakeOrderedAndProject
    global top-k (never a full sort)."""
    return tx.vocab_top_terms(_docs(spark, sf_dir), "text", k=20)


@query(
    "t_length_percentiles",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(round(quantile_cont(n_chars, 0.25), 6) AS DOUBLE) AS p25,
           CAST(round(quantile_cont(n_chars, 0.5), 6) AS DOUBLE) AS p5,
           CAST(round(quantile_cont(n_chars, 0.75), 6) AS DOUBLE) AS p75,
           CAST(round(quantile_cont(n_chars, 0.9), 6) AS DOUBLE) AS p9,
           CAST(round(quantile_cont(n_chars, 0.99), 6) AS DOUBLE) AS p99
    FROM documents GROUP BY lang
    """,
)
def t_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated document-length percentiles per language — the
    pretraining-mix length diagnostic. Exact (sort-based) because groups
    are few; approx_percentile is the sketch-based 100 TB path (not
    oracle-portable)."""
    return tx.group_percentiles(_docs(spark, sf_dir), "lang", "n_chars")


_STRATA_RATES = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.1, "zh": 0.1}


@query(
    "t_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
          < (CASE lang WHEN 'en' THEN '8000' WHEN 'es' THEN '4000'
                       WHEN 'fr' THEN '4000' WHEN 'de' THEN '1999'
                       WHEN 'zh' THEN '1999' ELSE '0ccc' END)
    """,
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample (md5-threshold on the
    key, per-stratum keep-rates) — the language-rebalancing step of a
    pretraining mix, reproducible on any engine/partitioning."""
    docs = _docs(spark, sf_dir)
    return tx.stratified_sample(
        docs, "doc_id", "lang", _STRATA_RATES
    ).select("doc_id", "lang")


# Single source of truth for the oracle-side quality score, shared by
# t_quality_score-style CTEs and the composed pipeline below.
_DUCK_QUALITY_CTE = f"""
    feats AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               / greatest(length(text), 1) AS alpha_ratio,
             length(array_to_string(t, '')) / greatest(len(t), 1) AS mean_wlen
      FROM (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents)
    ),
    scored AS (
      SELECT doc_id, n_tokens,
             CAST(round(least(1.0,
                   (CASE WHEN mean_wlen >= 3 AND mean_wlen <= 10 THEN 0.4 ELSE 0.0 END)
                 + (CASE WHEN alpha_ratio >= 0.6 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN n_tokens >= 10 THEN 0.3 ELSE 0.0 END)), 2) AS DOUBLE) AS quality_score
      FROM feats
    )"""


@query(
    "t_clean_corpus",
    oracle=f"""
    WITH {_DUCK_QUALITY_CTE},
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents GROUP BY {DUCK_NORMALIZE_SQL}
    )
    SELECT d.doc_id, d.lang, d.source,
           CAST(s.n_tokens AS INT) AS n_tokens, s.quality_score
    FROM documents d
    JOIN scored s USING (doc_id)
    JOIN keepers k USING (doc_id)
    WHERE s.quality_score >= 0.7 AND s.n_tokens >= 40
    """,
)
def t_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning pipeline a pretraining corpus actually runs:
    exact-dedup keepers (normalized content, min-id winner) ∩ quality gate
    (score ≥ 0.7, ≥ 40 tokens — the token floor is the selective gate on
    the synthetic corpus, whose docs are all alpha-clean). Both sides are
    single-shuffle aggregates; the keeper filter is a semi join on doc_id,
    so the documents fact is scanned once per branch and never collected."""
    docs = _docs(spark, sf_dir)
    scored = tx.quality_score(docs, "doc_id", "text").select(
        "doc_id", "n_tokens", "quality_score"
    )
    keepers = dd.exact_dedup(docs, "doc_id", "text", normalized=True).select(
        F.col("keeper_id").alias("doc_id")
    )
    return (
        docs.join(scored, "doc_id")
        .join(keepers, "doc_id", "semi")
        .where((F.col("quality_score") >= 0.7) & (F.col("n_tokens") >= 40))
        .select("doc_id", "lang", "source", "n_tokens", "quality_score")
    )


@query(
    "t_corpus_mix",
    oracle=f"""
    WITH toks AS (
      SELECT lang, source, len({_DUCK_TOKS}) AS n_tokens FROM documents
    ),
    agg AS (
      SELECT lang, source, count(*) AS n_docs, sum(n_tokens) AS total_tokens
      FROM toks GROUP BY lang, source
    )
    SELECT lang, source, n_docs, total_tokens,
           CAST(round(total_tokens / (SELECT CAST(sum(total_tokens) AS DOUBLE) FROM agg), 6)
                AS DOUBLE) AS token_share
    FROM agg
    """,
)
def t_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mix composition report: docs and token totals per
    (lang, source) with each cell's share of all corpus tokens. The share
    denominator is a scalar aggregate of the (tiny) grouped result — a
    broadcast, not a second pass over documents."""
    docs = _docs(spark, sf_dir)
    agg = (
        docs.select("lang", "source", F.size(tx.tokens("text")).alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
    )
    total = agg.select(
        F.sum("total_tokens").cast("double").alias("_total")
    )
    return agg.crossJoin(F.broadcast(total)).select(
        "lang",
        "source",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("_total"), 6).alias("token_share"),
    )


@query(
    "t_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS sequence_id,
           CAST(cum_tokens - n_tokens - 2048 * floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS seq_offset
    FROM cum
    """,
)
def t_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing for pretraining: documents in doc_id
    order are laid head-to-tail and cut into 2048-token sequences; each doc
    gets the sequence id and offset where it starts.

    The running sum is the EXACT two-pass distributed prefix sum
    (operators.text.distributed_prefix_sum): quantile range-sharding on
    doc_id + within-shard windows + broadcast shard offsets — global
    semantics identical to the single ORDER BY window the oracle runs
    (same value oracle), with NO unpartitioned WindowExec in the plan
    (pinned). r7 A/B at sf0.1, back-to-back, median-of-3: global-window
    form 0.46 s / two-pass 1.0 s (value-equal, verified) — the quantile
    pre-pass re-tokenizes the corpus at plan-build, the price of the
    shape that scales past one task (at 100 TB the single-partition
    window is not slower, it is impossible). A shard-local variant
    (per-shard sequence ids, no global coupling) exists as
    t_pack_sequences_sharded."""
    docs = _docs(spark, sf_dir)
    # r15: checkpoint the (doc_id, n_tokens) frame so the quantile
    # pre-pass and the windowed subtree tokenize the corpus ONCE (the
    # docstring's re-tokenize tax — same fix as t_pretrain_pipeline)
    toks = docs.select(
        "doc_id", F.size(tx.tokens("text")).alias("n_tokens")
    ).localCheckpoint(eager=False)
    cum = tx.distributed_prefix_sum(
        toks, "n_tokens", "doc_id", [F.col("doc_id")], n_shards=8,
        out_col="cum_tokens",
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    seq = F.floor(start / 2048)
    return cum.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        seq.cast("long").alias("sequence_id"),
        (start - 2048 * seq).cast("long").alias("seq_offset"),
    )


@query(
    "t_pack_sequences_sharded",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len({_DUCK_TOKS}) AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
           CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS sequence_id,
           CAST(cum_tokens - n_tokens - 2048 * floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS seq_offset
    FROM cum
    """,
)
def t_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of t_pack_sequences: pack independently per shard
    (lang here; any hash of doc_id in production) so the running-sum
    window partitions by the shard key and every shard sorts locally in
    parallel — no global single-partition sort. Sequence ids are
    per-shard; (lang, sequence_id) is the global sequence key."""
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = docs.select(
        "doc_id", "lang", F.size(tx.tokens("text")).alias("n_tokens")
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    seq = F.floor(start / 2048)
    return cum.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        seq.cast("long").alias("sequence_id"),
        (start - 2048 * seq).cast("long").alias("seq_offset"),
    )


@query(
    "t_token_budget_selection",
    oracle=f"""
    WITH {_DUCK_QUALITY_CTE},
    cum AS (
      SELECT doc_id, n_tokens, quality_score,
             sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, quality_score,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum WHERE cum_tokens <= 12000
    """,
)
def t_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: take documents in (quality desc, doc_id)
    order until a 12k-token budget is exhausted — the 'best data under a
    compute budget' mixing step. Runs the same exact two-pass distributed
    prefix sum as t_pack_sequences, sharded on quality_score DESCENDING
    (boundary ties always land in one shard, so the doc_id tiebreaker
    never straddles shards); the budget filter then prunes whole shards
    whose offset already exceeds the budget — at 100 TB only the shards
    around the budget boundary do the window work that matters. Same
    value oracle as the global-window form; no unpartitioned WindowExec
    (pinned)."""
    docs = _docs(spark, sf_dir)
    # r15: checkpoint — the quality-score regex pass otherwise runs once
    # for the quantile action and again in the windowed subtree
    scored = tx.quality_score(docs, "doc_id", "text").select(
        "doc_id", "n_tokens", "quality_score"
    ).localCheckpoint(eager=False)
    cum = tx.distributed_prefix_sum(
        scored,
        "n_tokens",
        "quality_score",
        [F.col("quality_score").desc(), F.col("doc_id")],
        descending=True,
        n_shards=8,
        out_col="cum_tokens",
    )
    return cum.where(F.col("cum_tokens") <= 12000).select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "quality_score",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


from .dedup import _duck_shingles  # noqa: E402 — single source of truth


@query(
    "t_boilerplate_ngrams",
    oracle=f"""
    WITH {_duck_shingles(4)}
    SELECT shingle, CAST(count(*) AS BIGINT) AS df
    FROM sh GROUP BY shingle HAVING count(*) >= 3
    ORDER BY df DESC, shingle LIMIT 50
    """,
)
def t_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus-duplicated 4-grams (document frequency >= 3): the
    boilerplate phrases a pretraining pipeline strips. Partial+final df
    aggregate, TakeOrdered top-k — no full sort (pinned in
    tests/test_plans.py)."""
    return tx.boilerplate_ngrams(
        _docs(spark, sf_dir), "doc_id", "text", n=4, min_df=3, k=50
    )


@query(
    "t_boilerplate_fraction",
    oracle=f"""
    WITH {_duck_shingles(4)},
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    hot AS (SELECT shingle FROM dfreq WHERE df >= 3),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    hits AS (SELECT id, count(*) AS nb FROM sh JOIN hot USING (shingle) GROUP BY id)
    SELECT d.doc_id AS id,
           CAST(coalesce(s.n, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(h.nb, 0) AS BIGINT) AS n_boilerplate,
           CAST(round(coalesce(h.nb, 0) / greatest(coalesce(s.n, 0), 1), 6) AS DOUBLE)
             AS boilerplate_fraction
    FROM documents d
    LEFT JOIN sizes s ON s.id = d.doc_id
    LEFT JOIN hits h ON h.id = d.doc_id
    """,
)
def t_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-n-gram share (Gopher's boilerplate quality signal
    computed corpus-wide): the hot-shingle set broadcasts back against the
    shingle stream (decontaminate's shape — pinned in tests/test_plans.py),
    so the only shuffles are the two partial+final aggregates."""
    return tx.boilerplate_fraction(
        _docs(spark, sf_dir), "doc_id", "text", n=4, min_df=3
    )


@query(
    "t_shuffle_shards",
    oracle="""
    SELECT doc_id AS id,
           CAST(CAST(('0x' || substring(md5(concat('42:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                % 64 AS INT) AS shard,
           md5(concat('42:', CAST(doc_id AS VARCHAR))) AS sort_key
    FROM documents
    """,
)
def t_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-shard assignment for training data loaders:
    (shard, sort_key) is a keyed global permutation with NO global sort and
    no shuffle at all (map-side projection — pinned in tests/test_plans.py).
    md5-derived on both engines, so the oracle audits the exact
    assignment a 100 TB run would produce."""
    return tx.shuffle_shards(_docs(spark, sf_dir), "doc_id", n_shards=64, seed=42)


@query(
    "t_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
      ) WHERE token <> ''
    ),
    vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    n AS (SELECT sum(cnt) AS total FROM vocab),
    scored AS (
      SELECT doc_id, avg(log10(cnt)) AS mlc, count(*) AS n_tokens
      FROM toks JOIN vocab USING (token) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(round(mlc - log10(total), 6) AS DOUBLE) AS mean_logprob
    FROM scored, n
    """,
)
def t_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy: per-doc mean log10 token probability under
    the corpus's own unigram distribution (CCNet-style perplexity
    filtering, without the external LM)."""
    return tx.unigram_logprob(_docs(spark, sf_dir), "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


@query(
    "t_lang_temperature_mix",
    oracle=f"""
    WITH per AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS lang_tokens
      FROM documents GROUP BY lang
    ),
    shared AS (
      SELECT lang, n_docs, lang_tokens,
             lang_tokens / (sum(lang_tokens) OVER ()) AS p,
             power(lang_tokens / (sum(lang_tokens) OVER ()), 0.3) AS pa
      FROM per
    )
    SELECT lang, n_docs, lang_tokens,
           CAST(round(p, 6) AS DOUBLE) AS raw_share,
           CAST(round(pa / sum(pa) OVER (), 6) AS DOUBLE) AS temp_share,
           CAST(round((pa / sum(pa) OVER ()) / p, 6) AS DOUBLE) AS sample_factor
    FROM shared
    """,
)
def t_lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha=0.3) multilingual sampling mix with
    per-language repeat factors — the standard low-resource upsampling rule
    a multilingual pretraining run applies to its corpus shares."""
    return tx.lang_temperature_mix(_docs(spark, sf_dir), "text", "lang", alpha=0.3)


@query(
    "t_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
      ) WHERE token <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE token IN ('window', 'merge', 'customer')
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT t.doc_id,
             ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * 2.2)
               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) AS w
      FROM tf t
      JOIN dfreq d USING (token)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s
    ),
    per_doc AS (
      SELECT doc_id AS id, CAST(round(sum(w), 6) AS DOUBLE) AS score,
             CAST(count(*) AS INT) AS n_hit_terms
      FROM scored GROUP BY doc_id
    ),
    ranked AS (
      SELECT id, score, n_hit_terms,
             CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank
      FROM per_doc
    )
    SELECT id, score, n_hit_terms, rank FROM ranked WHERE rank <= 10
    """,
)
def t_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for the query bag {window, merge, customer}
    (k1=1.2, b=0.75, Lucene idf): top-10 docs with per-doc score and hit
    count. The token stream is filtered to the query terms map-side, so
    only matching (doc, term) rows aggregate; scores round to 6 before
    ranking on both sides so order can't flip on float noise."""
    return tx.bm25_search(
        _docs(spark, sf_dir), "doc_id", "text",
        ["window", "merge", "customer"], k=10,
    )


@query(
    "t_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
      ) WHERE token <> ''
    ),
    vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    n AS (SELECT sum(cnt) AS total FROM vocab),
    scored AS (
      SELECT doc_id, avg(log10(cnt)) AS mlc
      FROM toks JOIN vocab USING (token) GROUP BY doc_id
    ),
    lp AS (
      SELECT doc_id, CAST(round(mlc - log10(total), 6) AS DOUBLE) AS mean_logprob
      FROM scored, n
    )
    SELECT d.doc_id, d.lang, lp.mean_logprob,
           CASE ntile(3) OVER (
             PARTITION BY d.lang ORDER BY lp.mean_logprob DESC, d.doc_id
           ) WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM lp JOIN documents d USING (doc_id)
    """,
)
def t_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per language, docs split into
    head/middle/tail terciles of unigram-LM mean log-probability — the
    standard quality-tier labeling a pretraining mix samples from
    (head-heavy). Reuses the corpus-own unigram scorer; the bucket split
    is one ntile window over the (lang, rounded-logprob, doc_id) ordering,
    deterministic across engines."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    lp = tx.unigram_logprob(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "mean_logprob"
    )
    j = lp.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("mean_logprob"), F.asc("doc_id")
    )
    tier = F.ntile(3).over(w)
    return j.select(
        "doc_id",
        "lang",
        "mean_logprob",
        F.when(tier == 1, "head").when(tier == 2, "middle").otherwise("tail")
        .alias("bucket"),
    )


@query(
    "t_word_pmi_top_pairs",
    oracle=f"""
    WITH toks AS (SELECT {_DUCK_TOKS} AS t FROM documents),
    uni AS (
      SELECT token, count(*) AS c FROM (
        SELECT unnest(t) AS token FROM toks
      ) WHERE token <> '' GROUP BY token
    ),
    nu AS (SELECT sum(c) AS n_uni FROM uni),
    pairs AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
    ),
    bi AS (
      SELECT w1, w2, count(*) AS c_xy FROM pairs
      WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
    ),
    nb AS (SELECT sum(c_xy) AS n_bi FROM bi)
    SELECT b.w1, b.w2, b.c_xy,
           CAST(round(ln((b.c_xy / n_bi)
                         / ((ux.c / n_uni) * (uy.c / n_uni))), 6) AS DOUBLE)
             AS pmi
    FROM bi b JOIN uni ux ON b.w1 = ux.token JOIN uni uy ON b.w2 = uy.token,
         nu, nb
    WHERE b.c_xy >= 5
    ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20
    """,
)
def t_word_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent-word pairs by pointwise mutual
    information over the corpus (Church-Hanks) — the statistic behind
    phrase-merging and tokenizer vocab induction in a training-data
    pipeline. Bigrams are array-zip map-side (no per-doc window shuffle);
    counts are partial+final; count joins broadcast; top-k is TakeOrdered."""
    return tx.word_pmi_top_pairs(_docs(spark, sf_dir), "text", min_count=5, k=20)


@query(
    "t_weighted_sample",
    oracle="""
    SELECT doc_id, lang, n_chars, score FROM (
      SELECT doc_id, lang, n_chars,
             CAST(round(
               ln((CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS DOUBLE) + 1.0) / 1152921504606846976.0)
               / n_chars, 9) AS DOUBLE) AS score
      FROM documents WHERE n_chars > 0
    )
    ORDER BY score DESC, doc_id
    LIMIT 50
    """,
)
def t_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample of 50 documents (Efraimidis-
    Spirakis exponential race keyed on md5(doc_id), weight = n_chars) —
    the quality/length-proportional selection step of a pretraining mix,
    identical on every engine and partitioning. Map-side score + top-k;
    see operators.text.weighted_sample for the scale shape."""
    return tx.weighted_sample(_docs(spark, sf_dir), "doc_id", "n_chars", k=50).select(
        "doc_id", "lang", "n_chars", "score"
    )


@query(
    "t_inverted_index",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
      ) WHERE term <> ''
    )
    SELECT term, count(*) AS df_docs,
           list(doc_id ORDER BY doc_id) AS postings
    FROM pairs GROUP BY term
    HAVING count(*) >= 2
       AND count(*) <= 0.8 * (SELECT count(*) FROM documents)
    """,
)
def t_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: term → document frequency + sorted
    posting list, banded to 2 ≤ df ≤ 0.8·n_docs — the relative ceiling
    drops stopword-grade terms (the lists that would dominate shuffle and
    output) at any corpus scale. The search/contamination-lookup
    structure; see operators.text.inverted_index for the scale shape."""
    return tx.inverted_index(
        _docs(spark, sf_dir), "doc_id", "text", min_df=2, max_df_frac=0.8
    )


@query(
    "t_pretrain_pipeline",
    oracle=f"""
    WITH {_DUCK_QUALITY_CTE},
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents GROUP BY {DUCK_NORMALIZE_SQL}
    ),
    clean AS (
      SELECT s.doc_id, s.n_tokens
      FROM scored s JOIN keepers k USING (doc_id)
      WHERE s.quality_score >= 0.7 AND s.n_tokens >= 40
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM clean
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS sequence_id,
           CAST(cum_tokens - n_tokens
                - 2048 * floor((cum_tokens - n_tokens) / 2048) AS BIGINT)
             AS seq_offset
    FROM cum
    """,
)
def t_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretraining corpus pipeline as one declarative plan:
    exact-dedup keepers (normalized content, min-id winner) ∩ quality
    gate (t_clean_corpus's composition) → survivors packed head-to-tail
    into 2048-token sequences via the exact two-pass distributed prefix
    sum (t_pack_sequences' shape — quantile-sharded running sum, NO
    unpartitioned window). Every stage is an already-oracled catalog
    operator; this entry value-checks their COMPOSITION, which is what a
    user actually runs: one job from raw corpus to training-ready
    sequence assignments. The prefix-sum's quantile pre-pass evaluates
    the dedup+quality subtree once at plan-build (documented trade in
    distributed_prefix_sum); at 100 TB that pre-pass is the range
    partitioner any global ordering pays."""
    docs = _docs(spark, sf_dir)
    scored = tx.quality_score(docs, "doc_id", "text").select(
        "doc_id", "n_tokens", "quality_score"
    )
    keepers = dd.exact_dedup(docs, "doc_id", "text", normalized=True).select(
        F.col("keeper_id").alias("doc_id")
    )
    # r15 optimization: the survivor frame feeds the prefix sum's quantile
    # ACTION and the windowed subtree — unmaterialized, the quality-score
    # regex pass + dedup semi-join re-evaluated per consumer (3.61 ->
    # 2.48 s median interleaved at sf0.1). A (doc_id, n_tokens) checkpoint
    # is tiny at any scale.
    clean = (
        scored.join(keepers, "doc_id", "semi")
        .where((F.col("quality_score") >= 0.7) & (F.col("n_tokens") >= 40))
        .select("doc_id", "n_tokens")
        .localCheckpoint(eager=False)
    )
    cum = tx.distributed_prefix_sum(
        clean, "n_tokens", "doc_id", [F.col("doc_id")], n_shards=8,
        out_col="cum_tokens",
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    seq = F.floor(start / 2048)
    return cum.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        seq.cast("long").alias("sequence_id"),
        (start - 2048 * seq).cast("long").alias("seq_offset"),
    )


@query(
    "t_dataset_card",
    oracle=f"""
    WITH {_DUCK_QUALITY_CTE},
    dup AS (
      SELECT count(*) AS n_docs,
             count(*) - count(DISTINCT {DUCK_NORMALIZE_SQL}) AS n_dups
      FROM documents
    ),
    langs AS (SELECT count(DISTINCT lang) AS n_langs FROM documents),
    srcs AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
    toks AS (
      SELECT sum(n_tokens) AS total_tokens,
             round(avg(n_tokens), 4) AS mean_tokens,
             round(avg(quality_score), 4) AS mean_quality,
             sum(CASE WHEN quality_score >= 0.7 THEN 1 ELSE 0 END) AS n_high_quality
      FROM scored
    )
    SELECT CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(l.n_langs AS BIGINT) AS n_langs,
           CAST(s.n_sources AS BIGINT) AS n_sources,
           CAST(t.total_tokens AS BIGINT) AS total_tokens,
           CAST(t.mean_tokens AS DOUBLE) AS mean_tokens,
           CAST(t.mean_quality AS DOUBLE) AS mean_quality,
           CAST(t.n_high_quality AS BIGINT) AS n_high_quality,
           CAST(d.n_dups AS BIGINT) AS n_exact_dups,
           CAST(round(d.n_dups / CAST(d.n_docs AS DOUBLE), 6) AS DOUBLE)
             AS dup_rate
    FROM dup d, langs l, srcs s, toks t
    """,
)
def t_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card summary a corpus release ships: doc/lang/source
    counts, token totals, mean quality, high-quality share, exact-dup
    rate — ONE row from three aggregate passes (corpus stats, normalized-
    content distinct for the dup rate, quality scores), crossJoined as
    1-row frames. Every number is a partial+final aggregate; nothing in
    the plan scales with output. The composition-of-measures shape data
    governance tooling runs nightly."""
    docs = _docs(spark, sf_dir)
    scored = tx.quality_score(docs, "doc_id", "text")
    from ..operators.dedup import normalize_text

    dup = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.count(F.lit(1))
            - F.count_distinct(normalize_text(F.col("text")))
        ).alias("n_exact_dups"),
    )
    langs = docs.agg(F.count_distinct("lang").alias("n_langs"))
    srcs = docs.agg(F.count_distinct("source").alias("n_sources"))
    toks = scored.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
        F.round(F.avg("quality_score"), 4).alias("mean_quality"),
        F.sum(
            F.when(F.col("quality_score") >= 0.7, 1).otherwise(0)
        ).alias("n_high_quality"),
    )
    return (
        dup.crossJoin(langs)
        .crossJoin(srcs)
        .crossJoin(toks)
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            "total_tokens",
            "mean_tokens",
            "mean_quality",
            "n_high_quality",
            "n_exact_dups",
            F.round(
                F.col("n_exact_dups") / F.col("n_docs").cast("double"), 6
            ).alias("dup_rate"),
        )
    )


@query(
    "t_language_confusion",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))) AS en,
             len(list_filter(t, x -> list_contains(['el','la','de','que','y'], x))) AS es,
             len(list_filter(t, x -> list_contains(['le','la','de','et','un'], x))) AS fr,
             len(list_filter(t, x -> list_contains(['der','die','und','das','ein'], x))) AS de,
             len(list_filter(t, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS zh
      FROM (SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents)
    ),
    pred AS (
      SELECT doc_id, lang AS actual,
             CASE WHEN zh > 0 AND zh > en AND zh > es AND zh > fr AND zh > de THEN 'zh'
                  WHEN de > 0 AND de > en AND de > es AND de > fr THEN 'de'
                  WHEN fr > 0 AND fr > en AND fr > es THEN 'fr'
                  WHEN es > 0 AND es > en THEN 'es'
                  WHEN en > 0 THEN 'en'
                  ELSE 'und' END AS predicted
      FROM hits
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n,
           CAST(round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY actual)
                AS DOUBLE), 6) AS DOUBLE) AS row_frac
    FROM pred GROUP BY actual, predicted
    """,
)
def t_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language identifier against the
    corpus's ground-truth `lang` column (counts + per-actual row
    fractions) — the evaluation report any classifier in the pipeline
    ships with. Reuses t_language_id's exact vote logic; one aggregate
    over (actual, predicted) plus a per-actual window over the ≤
    |langs|² matrix — nothing scales with the corpus after the
    grouping."""
    docs = _docs(spark, sf_dir)
    pred = tx.language_id(docs, "doc_id", "text").select(
        "doc_id", F.col("pred_lang").alias("predicted")
    )
    joined = docs.select("doc_id", F.col("lang").alias("actual")).join(
        pred, "doc_id"
    )
    cm = joined.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("actual")
    return cm.select(
        "actual",
        "predicted",
        "n",
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 6).alias(
            "row_frac"
        ),
    )


@query(
    "t_warc_ingest_real",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 24) AS s
      FROM documents
      WHERE doc_id < 150 AND regexp_matches(text, '^[ -~]{24}')
    )
    SELECT doc_id, CAST(0 AS INT) AS record_index,
           'warcinfo' AS warc_type, '' AS target_uri,
           CAST(NULL AS INT) AS http_status, '' AS content_type,
           CAST(0 AS BIGINT) AS n_body_bytes, '' AS body_text
    FROM base
    UNION ALL
    SELECT doc_id, CAST(1 AS INT) AS record_index,
           'response' AS warc_type,
           'http://ex.com/' || doc_id AS target_uri,
           CAST(200 AS INT) AS http_status,
           'text/html' AS content_type,
           CAST(24 AS BIGINT) AS n_body_bytes, s AS body_text
    FROM base
    """,
)
def t_warc_ingest_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC ingestion under a FULL value oracle (the
    mm_ppm_real_decode construct-in-query trick): each doc becomes a
    two-record WARC file — a warcinfo record and an HTTP response whose
    entity is the doc's first 24 printable-ASCII chars — built with
    plain column concat (Content-Length computed via length(); ASCII
    makes chars == bytes), then parsed by the actual mapInPandas WARC
    reader (operators.ingest.parse_warc: header blocks, Content-Length
    framing, HTTP status/header split). The oracle knows every field it
    wrapped. The 1:N archive->records fan-out, record framing, and HTTP
    embedding are all value-checked; gzip members and malformed-archive
    routing are pinned in tests/test_ingest.py."""
    from ..operators import ingest as ig

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 150)
        .where(F.col("text").rlike("^[ -~]{24}"))
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        F.substring("text", 1, 24),
    )
    warc = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 0\r\n\r\n\r\n\r\n"),
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://ex.com/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "),
        F.length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    with_bin = docs.select(
        "doc_id", F.encode(warc, "utf-8").alias("payload")
    )
    out = ig.extract_warc_records(with_bin, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "record_index",
        "warc_type",
        "target_uri",
        "http_status",
        "content_type",
        "n_body_bytes",
        F.decode("body", "utf-8").alias("body_text"),
    )


@query(
    "t_html_extract_real",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(substring(text, 1, 30), '[<>&]', ' ', 'g') AS san
      FROM documents
      WHERE doc_id < 150 AND regexp_matches(text, '^[ -~]{30}')
    ),
    norm AS (
      SELECT doc_id, trim(regexp_replace(san, ' +', ' ', 'g')) AS t
      FROM base
    )
    SELECT doc_id, t AS text, 'doc-' || doc_id AS title,
           CAST(1 AS INT) AS n_links,
           CAST(length(t) AS INT) AS n_chars
    FROM norm
    """,
)
def t_html_extract_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL HTML visible-text extraction under a FULL value oracle: each
    doc's sanitized first 30 printable-ASCII chars ([<>&] blanked so the
    snippet is markup-free on both engines) are wrapped into a page with
    a <title>, a <script> block (must be DROPPED from visible text) and
    one link, then run through the actual html.parser-backed mapInPandas
    extractor. The oracle recomputes the expected visible text directly
    from the source column: printable-ASCII input means the parser's
    whitespace normalization is exactly collapse-spaces+trim, expressible
    as a regexp in both engines. Script/style skipping, title capture,
    link counting and the text-length channel are all value-checked."""
    from ..operators import ingest as ig

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 150)
        .where(F.col("text").rlike("^[ -~]{30}"))
    )
    san = F.regexp_replace(F.substring("text", 1, 30), "[<>&]", " ")
    html = F.concat(
        F.lit("<html><head><title>doc-"),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var x = 1 < 2;</script></head><body><p>"),
        san,
        F.lit('</p><a href="http://x"></a></body></html>'),
    )
    with_html = docs.select("doc_id", html.alias("html"))
    out = ig.html_to_text(with_html, id_col="doc_id", html_col="html")
    return out.select(
        F.col("id").alias("doc_id"),
        "text",
        "title",
        "n_links",
        F.col("n_chars").cast("int"),
    )


@query(
    "t_web_pipeline_real",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(substring(text, 1, 30), '[<>&]', ' ', 'g') AS san
      FROM documents
      WHERE doc_id < 150 AND regexp_matches(text, '^[ -~]{30}')
    ),
    norm AS (
      SELECT doc_id, trim(regexp_replace(san, ' +', ' ', 'g')) AS t
      FROM base
    )
    SELECT doc_id,
           'http://ex.com/' || doc_id AS target_uri,
           CAST(200 AS INT) AS http_status,
           t AS text,
           'doc-' || doc_id AS title,
           CAST(1 AS INT) AS n_links,
           CAST(length(t) AS INT) AS n_chars
    FROM norm
    """,
)
def t_web_pipeline_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL web-crawl ingestion stack composed end to end under one
    value oracle: document -> HTML page (title/script/link wrapping) ->
    HTTP response -> WARC response record -> parse_warc (framing + HTTP
    split) -> html_to_text (visible text) — two chained shuffle-free
    mapInPandas passes over the real parsers, with the oracle computing
    every field straight from the source column. This is the stage
    sequence a CommonCrawl pipeline actually runs before the cleaning /
    dedup / quality entries pick up the text. Known plan cost: the final
    join re-derives the WARC-parse subtree to carry target_uri/status
    past the extractor (mapInPandas stages share no exchange) — at real
    scale you'd persist the record frame once or add passthrough columns
    to the extractor; at this entry's 150-doc cap the double parse is
    noise and the chained-operator shape is the point."""
    from ..operators import ingest as ig

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 150)
        .where(F.col("text").rlike("^[ -~]{30}"))
    )
    san = F.regexp_replace(F.substring("text", 1, 30), "[<>&]", " ")
    html = F.concat(
        F.lit("<html><head><title>doc-"),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var x = 1 < 2;</script></head><body><p>"),
        san,
        F.lit('</p><a href="http://x"></a></body></html>'),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html
    )
    warc = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://ex.com/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "),
        F.length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    with_bin = docs.select("doc_id", F.encode(warc, "utf-8").alias("payload"))
    recs = ig.extract_warc_records(with_bin, id_col="doc_id").where(
        F.col("warc_type") == "response"
    )
    pages = recs.select(
        F.col("id"),
        "target_uri",
        "http_status",
        F.decode("body", "utf-8").alias("html"),
    )
    out = ig.html_to_text(pages, id_col="id", html_col="html")
    return out.join(
        pages.select("id", "target_uri", "http_status"), "id"
    ).select(
        F.col("id").alias("doc_id"),
        "target_uri",
        "http_status",
        "text",
        "title",
        "n_links",
        F.col("n_chars").cast("int"),
    )


@query(
    "t_sitemap_extract_real",
    oracle="""
    WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 200)
    SELECT doc_id, CAST(0 AS INT) AS url_index,
           'http://ex.com/doc-' || doc_id AS loc,
           '2024-01-02' AS lastmod
    FROM base
    UNION ALL
    SELECT doc_id, CAST(1 AS INT) AS url_index,
           'http://ex.com/alt-' || doc_id AS loc,
           CAST(NULL AS VARCHAR) AS lastmod
    FROM base
    """,
)
def t_sitemap_extract_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL sitemap parsing under a FULL value oracle: each doc becomes a
    namespaced sitemaps.org urlset with two <url> entries (one carrying
    <lastmod>), parsed back by the actual xml.etree-backed mapInPandas
    reader (operators.ingest.parse_sitemap — namespace-agnostic tag
    matching, DTD rejection, gzip support pinned in tests). The crawl-
    frontier feed stage of the ingestion family; the oracle knows every
    field it wrapped."""
    from ..operators import ingest as ig

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    xml = F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>http://ex.com/doc-"
        ),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2024-01-02</lastmod></url><url><loc>http://ex.com/alt-"),
        F.col("doc_id").cast("string"),
        F.lit("</loc></url></urlset>"),
    )
    with_bin = docs.select("doc_id", F.encode(xml, "utf-8").alias("payload"))
    out = ig.extract_sitemap_urls(with_bin, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "url_index", "loc", "lastmod"
    )


@query(
    "t_source_stats",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(round(avg(n_chars), 2) AS DOUBLE) AS avg_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(round(1.0 - count(DISTINCT md5(text)) / count(*), 6) AS DOUBLE)
             AS exact_dup_rate
    FROM documents GROUP BY source
    """,
)
def t_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the grouped twin of t_dataset_card and
    the table a corpus-mixing pipeline actually filters on (per-domain
    volume, length profile, language spread, exact-dup rate a la
    C4/RefinedWeb per-domain quality triage). One hash aggregate on
    source; the two distinct aggregates (lang, content md5) stay in a
    single Expand-free pass only if planned separately — Spark plans
    multi-distinct with one Expand here, acceptable at 2 distincts
    (the o_table_stats 5-distinct rewrite note shows where the cliff
    is). Fingerprint the CONTENT (md5), never the raw text, so the
    shuffle carries 32 bytes per doc."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(
            F.lit(1.0) - F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
    )


@query(
    "t_robots_check_real",
    oracle="""
    SELECT doc_id AS id,
           'http://site/d' || (doc_id % 3) || '/page' AS url,
           'surgebot' AS agent,
           (doc_id % 5 <> doc_id % 3) AS allowed
    FROM documents WHERE doc_id < 400
    """,
)
def t_robots_check_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-politeness gate under a FULL oracle via construct-in-query
    (the t_warc_ingest_real trick): each doc becomes a robots.txt with a
    decoy per-agent group (badbot: Disallow /) and a wildcard group
    disallowing /d<doc_id%5>/, evaluated for surgebot against
    /d<doc_id%3>/page through the REAL stdlib urllib.robotparser in
    mapInPandas — agent-group selection, prefix rules and default-allow
    all exercised. DuckDB computes the ground truth independently:
    single-digit segments make prefix-match equivalent to modulus
    equality, so allowed iff doc_id%5 != doc_id%3. Completes the web
    stack (WARC -> HTTP -> HTML -> sitemap -> robots)."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 400)
    robots = F.concat(
        F.lit("User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /d"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("/\n"),
    )
    url = F.concat(
        F.lit("http://site/d"), (F.col("doc_id") % 3).cast("string"), F.lit("/page")
    )
    from ..operators import ingest as ing

    return ing.check_robots(
        docs.select("doc_id", robots.alias("robots_txt"), url.alias("url")),
        id_col="doc_id",
        agent="surgebot",
    )


@query(
    "t_bigram_lm_score",
    oracle=f"""
    WITH ta AS (
      SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents
    ),
    bg AS (
      SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
      FROM ta, LATERAL (
        SELECT unnest(range(1, greatest(len(ts) - 1, 0) + 1)) AS i
      ) i
      WHERE ts[i.i] <> '' AND ts[i.i + 1] <> ''
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY w1),
    u AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(ts) AS w FROM ta
      ) WHERE w <> '' GROUP BY w
    ),
    n AS (SELECT sum(c) AS total FROM u)
    SELECT bg.doc_id,
           CAST(count(*) AS INT) AS n_bigrams,
           CAST(round(avg(ln(
             0.7 * (c12.c / c1.c) + 0.3 * (u.c / n.total)
           )), 6) AS DOUBLE) AS mean_logprob
    FROM bg
    JOIN c12 ON c12.w1 = bg.w1 AND c12.w2 = bg.w2
    JOIN c1 ON c1.w1 = bg.w1
    JOIN u ON u.w = bg.w2
    CROSS JOIN n
    GROUP BY bg.doc_id
    """,
)
def t_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality score: per-doc mean natural-log
    probability of each bigram under 0.7*P(w2|w1) + 0.3*P(w2), both
    estimated from the corpus itself (the CCNet-style perplexity filter
    one model order above t_unigram_logprob — bigram context separates
    fluent text from bag-of-frequent-words spam that unigram scoring
    ranks high). Docs with fewer than two tokens have no bigrams and are
    absent, exactly as in the oracle. Shapes: bigrams via the arrays_zip
    shift (no HOF, no per-doc window), three partial+final count
    aggregates, joins keyed on bigram/token (the LM tables — at 100 TB
    these are the shuffle, and they are counts, not text), corpus-total
    broadcast. Float note: per-doc avg over unordered rows survives
    round(6) for the same reason t_unigram_logprob's does (term
    magnitudes ~1e0, ulp noise ~1e-16)."""
    docs = _docs(spark, sf_dir)
    toks = dd.tokens("text")
    big = 1 << 30
    base = docs.select(F.col("doc_id"), toks.alias("_ts"))
    z = F.arrays_zip(
        F.col("_ts").alias("w1"), F.slice("_ts", 2, big).alias("w2")
    )
    # materialize the narrow (doc_id, w1, w2) stream ONCE: it feeds c12,
    # c1 AND the join spine as three separate subtrees — without the
    # checkpoint the scan + tokenize + arrays_zip + explode ran 3x (the
    # shared-exchange class CLAUDE.md tracks); the unigram table is a
    # genuinely different shape and keeps its own single pass
    bg = (
        base.select("doc_id", F.explode(z).alias("s"))
        .select("doc_id", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
        .where((F.col("w1") != "") & F.col("w2").isNotNull() & (F.col("w2") != ""))
        .localCheckpoint(eager=False)
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    u = (
        base.select(F.explode("_ts").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n = u.agg(F.sum("cu").alias("total"))
    term = F.log(
        0.7 * (F.col("c12") / F.col("c1")) + 0.3 * (F.col("cu") / F.col("total"))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(u.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg(term), 6).alias("mean_logprob"),
        )
    )


@query(
    "t_source_kl_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    tf AS (
      SELECT source, w, count(*) AS c FROM toks WHERE w <> ''
      GROUP BY source, w
    ),
    stot AS (SELECT source, sum(c) AS st FROM tf GROUP BY source),
    gc AS (SELECT w, sum(c) AS gcnt FROM tf GROUP BY w),
    gt AS (SELECT sum(gcnt) AS g FROM gc)
    SELECT tf.source, CAST(st AS BIGINT) AS n_tokens,
           CAST(round(sum(
             (tf.c / CAST(st AS DOUBLE))
             * ln((tf.c / CAST(st AS DOUBLE))
                  / (gc.gcnt / CAST(g AS DOUBLE)))
           ), 6) AS DOUBLE) AS kl_divergence
    FROM tf JOIN stot USING (source) JOIN gc USING (w) CROSS JOIN gt
    GROUP BY tf.source, st
    """,
)
def t_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the unigram distribution from the whole
    corpus — the dataset-mixing diagnostic (a source whose KL spikes is
    drifting from the corpus it feeds; CCNet/Gopher-style source audits
    rank shards by exactly this). The (source, word) term-frequency
    aggregate is the ONE heavy shuffle and is localCheckpointed because
    three consumers derive from it (source totals, global word counts,
    and the scoring join) — lazily chained, the tokenize+explode subtree
    would re-run per consumer. Everything downstream operates on the
    aggregated vocab (|sources| x |vocab| bounded), and the per-source
    totals broadcast. All words in a source exist globally, so no
    zero-probability guard is needed."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(dd.tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    stot = tf.groupBy("source").agg(F.sum("c").alias("st"))
    gc = tf.groupBy("w").agg(F.sum("c").alias("gcnt"))
    gt = gc.agg(F.sum("gcnt").alias("g"))
    ps = F.col("c").cast("double") / F.col("st").cast("double")
    pg = F.col("gcnt").cast("double") / F.col("g").cast("double")
    return (
        tf.join(F.broadcast(stot), "source")
        .join(gc, "w")
        .crossJoin(F.broadcast(gt))
        .groupBy("source", "st")
        .agg(F.round(F.sum(ps * F.log(ps / pg)), 6).alias("kl_divergence"))
        .select(
            "source",
            F.col("st").cast("long").alias("n_tokens"),
            "kl_divergence",
        )
    )


@query(
    "t_k_anonymity_violations",
    oracle=f"""
    WITH q AS (
      SELECT lang, source,
             CAST(len({_DUCK_TOKS}) // 50 AS BIGINT) AS len_bucket
      FROM documents
    ),
    g AS (
      SELECT lang, source, len_bucket, count(*) AS group_size
      FROM q GROUP BY lang, source, len_bucket
    )
    SELECT lang, source, len_bucket, CAST(group_size AS BIGINT) AS group_size
    FROM g WHERE group_size < 5
    """,
)
def t_k_anonymity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the release quasi-identifiers (language,
    source, 50-token length bucket): every combination shared by fewer
    than k=5 documents is a re-identification channel — the privacy
    check a training-data release runs before publishing per-document
    metadata. One partial+final aggregate on the bounded QI space and a
    HAVING filter; output is only the violating groups, so it shrinks
    as the corpus grows (at 100 TB a violation means a genuinely rare
    combination). Length buckets via integer floor division — no float
    channel."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "lang",
        "source",
        F.floor(F.size(dd.tokens("text")) / 50).cast("long").alias(
            "len_bucket"
        ),
    )
    return (
        q.groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < 5)
    )


@query(
    "a_cms_heavy_hitters",
    oracle=f"""
    WITH occ AS (
      SELECT unnest({_DUCK_TOKS}) AS term FROM documents
    ),
    vocab AS (
      SELECT term, count(*) AS cnt FROM occ WHERE term <> '' GROUP BY term
    ),
    h AS (SELECT term, cnt, md5(concat('cms:', term)) AS hx FROM vocab),
    probes AS (
      SELECT term, cnt, j.j,
             CAST(concat('0x', substr(hx, 1 + j.j * 8, 8)) AS BIGINT) % 256
               AS cell
      FROM h, LATERAL (SELECT unnest(range(0, 4)) AS j) j
    ),
    sketch AS (SELECT j, cell, sum(cnt) AS s FROM probes GROUP BY j, cell),
    top20 AS (
      SELECT term, cnt FROM vocab ORDER BY cnt DESC, term ASC LIMIT 20
    )
    SELECT t.term, CAST(t.cnt AS BIGINT) AS exact_cnt,
           CAST(min(sk.s) AS BIGINT) AS cms_estimate,
           CAST(min(sk.s) - t.cnt AS BIGINT) AS overestimate
    FROM top20 t
    JOIN probes p ON p.term = t.term
    JOIN sketch sk ON sk.j = p.j AND sk.cell = p.cell
    GROUP BY t.term, t.cnt
    """,
)
def a_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy-hitter audit: a 4×256 CMS built over the
    corpus token frequencies (four 32-bit hash rows sliced from ONE md5
    per term, the bloom-prefilter trick), read back for the exact top-20
    terms — estimate = min over the 4 counter rows, reported against the
    exact count so the sketch's one-sided error (overestimate ≥ 0,
    bounded by ε·N with ε = e/256) is VISIBLE in the output. The sketch
    is mergeable (cell-wise sum), which is the 100 TB point: per-shard
    sketches combine without re-reading tokens — the KMV/HLL family's
    frequency-domain sibling. Exact counts ride the same checkpointed
    vocab aggregate the sketch builds from, so the audit costs one token
    shuffle total."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(dd.tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # consumers: the 4 probe projections AND the top-20 rank — without
        # a barrier each re-runs the tokenize+explode aggregate
        .localCheckpoint(eager=False)
    )
    hx = F.md5(F.concat(F.lit("cms:"), F.col("term")))
    probes = None
    for j in range(4):
        p = vocab.select(
            "term",
            "cnt",
            F.lit(j).alias("j"),
            (
                F.conv(F.substring(hx, 1 + j * 8, 8), 16, 10).cast("long")
                % 256
            ).alias("cell"),
        )
        probes = p if probes is None else probes.unionAll(p)
    sketch = probes.groupBy("j", "cell").agg(F.sum("cnt").alias("s"))
    top20 = vocab.orderBy(F.col("cnt").desc(), F.col("term")).limit(20)
    # readback probes re-derived on the 20-row frame (same md5-slice
    # expressions) — joining the vocab-scale probes here would pay a
    # full-vocabulary projection/union pass for 80 output rows
    t20_probes = None
    for j in range(4):
        tp = top20.select(
            "term",
            F.lit(j).alias("j"),
            (
                F.conv(F.substring(hx, 1 + j * 8, 8), 16, 10).cast("long")
                % 256
            ).alias("cell"),
        )
        t20_probes = tp if t20_probes is None else t20_probes.unionAll(tp)
    return (
        top20.join(t20_probes, "term")
        .join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("term", "cnt")
        .agg(F.min("s").alias("cms_estimate"))
        .select(
            "term",
            F.col("cnt").alias("exact_cnt"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("cnt")).alias("overestimate"),
        )
    )


@query(
    "t_zipf_slope",
    oracle=f"""
    WITH toks AS (
      SELECT token FROM (
        SELECT unnest({_DUCK_TOKS}) AS token FROM documents
      ) WHERE token <> ''
    ),
    vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rnk
      FROM vocab
    ),
    top AS (SELECT * FROM ranked WHERE rnk <= 1000)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(round(regr_slope(ln(CAST(cnt AS DOUBLE)),
                                 ln(CAST(rnk AS DOUBLE))), 6) AS DOUBLE)
             AS zipf_slope,
           CAST(round(regr_intercept(ln(CAST(cnt AS DOUBLE)),
                                     ln(CAST(rnk AS DOUBLE))), 6) AS DOUBLE)
             AS zipf_intercept,
           CAST(round(regr_r2(ln(CAST(cnt AS DOUBLE)),
                              ln(CAST(rnk AS DOUBLE))), 6) AS DOUBLE)
             AS zipf_r2
    FROM top
    """,
)
def t_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the unigram frequency table — the corpus-level
    twin of g_degree_powerlaw_slope (same moment-based log-log
    regression, natural-language edition): rank terms by frequency, fit
    ln(freq) ~ ln(rank) over the top 1000, and the slope ≈ -1 for
    natural text (Zipf) — a corpus whose slope is far off is synthetic,
    truncated, or boilerplate-dominated, which makes this a dataset-card
    diagnostic beside t_source_stats. Ties rank deterministically by
    (count DESC, token ASC) on both engines; the rank window runs over
    the VOCAB table (bounded, ≪ corpus — the t_inverted_index scale
    argument) and the 1000-cap makes the windowed frame constant-size
    regardless of vocabulary growth."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(dd.tokens("text")).alias("token")
    ).where(F.col("token") != "")
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = vocab.select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.desc("cnt"), F.asc("token")))
        .alias("rnk"),
    ).where(F.col("rnk") <= 1000)
    ly = F.log(F.col("cnt").cast("double"))
    lx = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(ly, lx), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ly, lx), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ly, lx), 6).alias("zipf_r2"),
    )


@query(
    "t_bm25_prf_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
      ) WHERE token <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf1 AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE token IN ('window', 'merge', 'customer')
      GROUP BY doc_id, token
    ),
    df1 AS (SELECT token, count(*) AS df FROM tf1 GROUP BY token),
    s1 AS (
      SELECT t.doc_id,
             sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))) AS w
      FROM tf1 t JOIN df1 d USING (token) JOIN dl l USING (doc_id)
      CROSS JOIN stats s GROUP BY t.doc_id
    ),
    top5 AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
          ORDER BY round(w, 6) DESC, doc_id
        ) AS r FROM s1
      ) WHERE r <= 5
    ),
    fb AS (
      SELECT token, count(*) AS cnt FROM toks JOIN top5 USING (doc_id)
      WHERE token NOT IN ('window', 'merge', 'customer')
      GROUP BY token
    ),
    exp3 AS (
      SELECT token FROM (
        SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS r
        FROM fb
      ) WHERE r <= 3
    ),
    terms2 AS (
      SELECT token FROM exp3
      UNION ALL SELECT unnest(['window', 'merge', 'customer']) AS token
    ),
    tf2 AS (
      SELECT t.doc_id, t.token, count(*) AS tf
      FROM toks t JOIN terms2 USING (token)
      GROUP BY t.doc_id, t.token
    ),
    df2 AS (SELECT token, count(*) AS df FROM tf2 GROUP BY token),
    s2 AS (
      SELECT t.doc_id AS id,
             CAST(round(sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))), 6)
               AS DOUBLE) AS score,
             CAST(count(*) AS INT) AS n_hit_terms
      FROM tf2 t JOIN df2 d USING (token) JOIN dl l USING (doc_id)
      CROSS JOIN stats s GROUP BY t.doc_id
    )
    SELECT id, score, n_hit_terms, rank FROM (
      SELECT id, score, n_hit_terms,
             CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank
      FROM s2
    ) WHERE rank <= 10
    """,
)
def t_bm25_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with PSEUDO-RELEVANCE FEEDBACK (Rocchio-style blind query
    expansion, the classic second IR stage after t_bm25_search): run the
    base query {window, merge, customer}, take the top-5 docs as a
    relevance sample, promote their 3 most frequent non-query tokens to
    expansion terms, and re-rank the corpus against the 6-term expanded
    query. Everything stays a DataFrame — the expansion terms flow into
    stage 2 as a broadcast semi-join (never a collect-and-isin, which
    would put a driver round-trip inside the query). Both ranking steps
    round scores to 6 BEFORE ranking (ties to doc id) and the feedback
    term pick ties lexicographically, so the whole two-stage trajectory
    is a pure function of the corpus, mirrored CTE-for-CTE in the
    oracle. Shapes: the stage-2 token stream filters via the 6-row term
    frame (map-side after broadcast), df/dl aggregates are the same
    partial+final passes bm25_search documents; the exploded token
    stream is localCheckpointed (FOUR consumers — dl, stage-1 hits,
    feedback counts, stage-2 hits — would each re-run
    normalize+split+explode)."""
    k1, b = 1.2, 0.75
    q_terms = ["window", "merge", "customer"]
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(dd.tokens("text")).alias("token"),
        )
        .where(F.col("token") != "")
        .localCheckpoint(eager=False)
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    def scores(tf):
        dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        tfw = (F.col("tf") * (k1 + 1)) / (
            F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        return (
            tf.join(dfreq, "token")
            .join(dl, "id")
            .crossJoin(F.broadcast(stats))
            .select("id", "token", (idf * tfw).alias("w"))
        )

    tf1 = (
        toks.where(F.col("token").isin(q_terms))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s1 = scores(tf1).groupBy("id").agg(F.round(F.sum("w"), 6).alias("score"))
    top5 = (
        s1.select(
            "id",
            F.row_number().over(W.orderBy(F.desc("score"), F.asc("id"))).alias("r"),
        )
        .where(F.col("r") <= 5)
        .select("id")
    )
    fb = (
        toks.join(top5, "id")
        .where(~F.col("token").isin(q_terms))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exp3 = (
        fb.select(
            "token",
            F.row_number()
            .over(W.orderBy(F.desc("cnt"), F.asc("token")))
            .alias("r"),
        )
        .where(F.col("r") <= 3)
        .select("token")
    )
    terms2 = exp3.unionAll(
        spark.createDataFrame([(t,) for t in q_terms], "token string")
    )
    tf2 = (
        toks.join(F.broadcast(terms2), "token")
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s2 = (
        scores(tf2)
        .groupBy("id")
        .agg(
            F.round(F.sum("w"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
        )
    )
    return (
        s2.select(
            "id",
            "score",
            "n_hit_terms",
            F.row_number()
            .over(W.orderBy(F.desc("score"), F.asc("id")))
            .cast("int")
            .alias("rank"),
        )
        .where(F.col("rank") <= 10)
    )


@query(
    "t_readability_flesch",
    oracle="""
    WITH per AS (
      SELECT source,
             len(regexp_extract_all(text, '[a-z]+')) AS wd,
             len(regexp_extract_all(text, '[aeiouy]+')) AS sy
      FROM documents
    ),
    scored AS (
      SELECT source, wd, sy,
             206835 - 1015 * wd - (84600 * sy) // wd AS score_x1000
      FROM per WHERE wd > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(wd) AS BIGINT) AS total_words,
           CAST(sum(sy) AS BIGINT) AS total_syllables,
           CAST(round(avg(score_x1000), 4) AS DOUBLE) AS mean_flesch_x1000,
           CAST(min(score_x1000) AS BIGINT) AS min_flesch_x1000,
           CAST(max(score_x1000) AS BIGINT) AS max_flesch_x1000
    FROM scored GROUP BY source
    """,
)
def t_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source — the readability axis of a quality
    dashboard (t_quality_score measures junk; this measures density).
    Syllables are the standard vowel-group proxy (runs of [aeiouy]) and
    each doc is ONE sentence (the corpus has no terminal punctuation —
    documented premise, so the words/sentences term is just the word
    count). The per-doc score is the ALL-INTEGER permille rendering
    206835 - 1015*wd - (84600*sy) div wd: both div operands are positive
    so Spark's truncating div and DuckDB's flooring // agree (a NEGATIVE
    numerator would diverge — that is why the formula never divides the
    negative total). The only float op is the per-source mean: one
    division of an exact integer sum, round(4)-stable. Counting is
    regexp_extract_all on both engines (Java regex and RE2 agree on
    pure character-class patterns); map-side + one partial/final
    aggregate, no joins."""
    d = _docs(spark, sf_dir)
    per = d.select(
        "source",
        # cast to BIGINT before the formula: F.size is 32-bit and under
        # ANSI mode 84600 * sy overflows INT for any ~25k-word document
        # (runtime-confirmed); the oracle's len() is already BIGINT
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)"))
        .cast("bigint")
        .alias("wd"),
        F.size(F.expr("regexp_extract_all(text, '[aeiouy]+', 0)"))
        .cast("bigint")
        .alias("sy"),
    ).where(F.col("wd") > 0)
    scored = per.select(
        "source",
        "wd",
        "sy",
        F.expr("206835 - 1015 * wd - (84600 * sy) div wd").alias(
            "score_x1000"
        ),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("wd").alias("total_words"),
        F.sum("sy").alias("total_syllables"),
        F.round(F.avg("score_x1000"), 4).alias("mean_flesch_x1000"),
        F.min("score_x1000").alias("min_flesch_x1000"),
        F.max("score_x1000").alias("max_flesch_x1000"),
    )


_RAKE_STOPWORDS = (
    "the", "a", "and", "of", "in", "to", "is", "on", "for", "with",
)
_RAKE_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS) + ")"


@query(
    "t_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, u.i AS pos, string_split(d.text, ' ')[u.i] AS tok
      FROM documents d,
           LATERAL (SELECT unnest(range(1, len(string_split(d.text, ' ')) + 1))
                    AS i) u
    ),
    flagged AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN {_RAKE_STOP_SQL} THEN 1 ELSE 0 END AS stop
      FROM toks WHERE tok <> ''
    ),
    phrased AS (
      SELECT doc_id, tok, stop,
             sum(stop) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING
             ) AS phrase_id
      FROM flagged
    ),
    pw AS (
      SELECT doc_id, phrase_id, tok FROM phrased WHERE stop = 0
    ),
    pl AS (
      SELECT doc_id, phrase_id, count(*) AS plen
      FROM pw GROUP BY doc_id, phrase_id
    ),
    word_stats AS (
      SELECT pw.tok AS word,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(pl.plen) AS BIGINT) AS degree
      FROM pw JOIN pl USING (doc_id, phrase_id)
      GROUP BY pw.tok
    )
    SELECT word, freq, degree,
           CAST(degree * 1000 // freq AS BIGINT) AS rake_score_x1000
    FROM word_stats
    ORDER BY rake_score_x1000 DESC, word
    LIMIT 20
    """,
)
def t_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — corpus-level keyword
    scoring by degree/frequency: phrases are maximal stopword-free token
    runs (gaps-and-islands: phrase id = running stopword count per doc, a
    PER-DOC window — partitioned, parallel), a word's degree sums the
    lengths of every phrase containing it (co-occurrence within phrases
    — including itself, the textbook deg(w) = Σ|phrase|), and
    score = degree/freq favors words that live in long multi-word
    phrases over merely frequent ones. All-integer channels (score as
    x1000 via bigint div on positives); global top-20 is
    TakeOrderedAndProject with the (score desc, word) total order. The
    stopword set is a 10-word literal rendered into both engines. At
    100 TB the phrase build is map-side after one per-doc window; the
    word aggregate is the only corpus-scale shuffle."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    ).where(F.col("tok") != "")
    flagged = toks.withColumn(
        "stop", F.col("tok").isin(*_RAKE_STOPWORDS).cast("int")
    )
    wdoc = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    phrased = flagged.select(
        "doc_id",
        "tok",
        "stop",
        F.sum("stop").over(wdoc).alias("phrase_id"),
    )
    pw = phrased.where(F.col("stop") == 0).select("doc_id", "phrase_id", "tok")
    pl = pw.groupBy("doc_id", "phrase_id").agg(F.count(F.lit(1)).alias("plen"))
    stats = (
        pw.join(pl, ["doc_id", "phrase_id"])
        .groupBy(F.col("tok").alias("word"))
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
    )
    return (
        stats.select(
            "word",
            "freq",
            "degree",
            F.expr("CAST(degree * 1000 div freq AS BIGINT)").alias(
                "rake_score_x1000"
            ),
        )
        .orderBy(F.col("rake_score_x1000").desc(), "word")
        .limit(20)
    )


@query(
    "t_vocab_growth_heaps",
    oracle="""
    WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    toks AS (
      SELECT d.doc_id, u.tok
      FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g')), ' ') AS t
            FROM documents) d,
           LATERAL (SELECT unnest(d.t) AS tok) u
      WHERE u.tok <> ''
    ),
    firsts AS (
      SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc FROM toks GROUP BY tok
    ),
    doc_tokens AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id
    ),
    vnew AS (
      SELECT least(f.first_doc * 10 // nd.n_docs, 9) AS decile,
             CAST(count(*) AS BIGINT) AS new_vocab
      FROM firsts f CROSS JOIN nd GROUP BY 1
    ),
    tmass AS (
      SELECT least(dt.doc_id * 10 // nd.n_docs, 9) AS decile,
             CAST(sum(dt.n_tok) AS BIGINT) AS tok_mass
      FROM doc_tokens dt CROSS JOIN nd GROUP BY 1
    ),
    cv AS (
      SELECT a.decile, CAST(sum(coalesce(v.new_vocab, 0)) AS BIGINT) AS cum_vocab
      FROM (SELECT DISTINCT decile FROM tmass) a
      LEFT JOIN vnew v ON v.decile <= a.decile GROUP BY a.decile
    ),
    ct AS (
      SELECT a.decile, CAST(sum(coalesce(t.tok_mass, 0)) AS BIGINT) AS cum_tokens
      FROM (SELECT DISTINCT decile FROM tmass) a
      LEFT JOIN tmass t ON t.decile <= a.decile GROUP BY a.decile
    ),
    cum AS (
      SELECT cv.decile, cv.cum_vocab, ct.cum_tokens
      FROM cv JOIN ct USING (decile)
    ),
    pts AS (
      SELECT CAST(decile AS BIGINT) AS decile, cum_vocab, cum_tokens
      FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(max(cum_vocab) AS BIGINT) AS total_vocab,
           CAST(max(cum_tokens) AS BIGINT) AS total_tokens,
           CAST(round(regr_slope(ln(CAST(cum_vocab AS DOUBLE)),
                                 ln(CAST(cum_tokens AS DOUBLE))), 6)
                AS DOUBLE) AS heaps_beta
    FROM pts
    """,
)
def t_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth — how fast does NEW vocabulary
    accumulate as the corpus grows (V ≈ K·nᵝ; β well below 1 means the
    tokenizer's vocab budget saturates, β near 1 means open-ended
    vocabulary — noise, code, IDs): the corpus-curation twin of
    t_zipf_slope (Zipf describes the static frequency profile; Heaps
    the GROWTH curve a streaming ingest actually walks). Each token's
    FIRST document (min doc_id) assigns it to a corpus decile; new-vocab
    and token-mass per decile cumulate over at most 10 rows via a
    broadcast theta join — never an unpartitioned window, the
    distributed_prefix_sum totals trick at fixed fan-out. β is
    regr_slope over the 10 log-log points (round-6; the
    g_degree_powerlaw_slope channel). The corpus-scale work is the
    exploded token stream feeding its two aggregates (first-doc per
    token, token mass per doc), each evaluated once — the bounded
    decile series downstream are checkpointed."""
    from surge_spark.operators.dedup import tokens as _tok

    d = load_table(spark, sf_dir, "documents")
    nd = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    toks = (
        d.select("doc_id", F.explode(_tok("text")).alias("tok"))
        .where(F.col("tok") != "")
    )
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    doc_tokens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    vnew = (
        firsts.crossJoin(F.broadcast(nd))
        .groupBy(
            F.expr("least(first_doc * 10 div n_docs, 9)").alias("decile")
        )
        .agg(F.count(F.lit(1)).alias("new_vocab"))
        .localCheckpoint(eager=False)
    )
    tmass = (
        doc_tokens.crossJoin(F.broadcast(nd))
        .groupBy(F.expr("least(doc_id * 10 div n_docs, 9)").alias("decile"))
        .agg(F.sum("n_tok").alias("tok_mass"))
        .localCheckpoint(eager=False)
    )
    # the <=10-row decile series are checkpointed: deciles + both
    # cumulate() consumers would otherwise re-run the corpus explode per
    # reference (review finding — the explode evaluates once per
    # aggregate now: firsts and doc_tokens->tmass, nothing more)
    deciles = tmass.select("decile").distinct()

    def cumulate(series: DataFrame, val: str, out: str) -> DataFrame:
        # <=10-row broadcast theta cumulation — the prefix-sum totals
        # trick at fixed fan-out, never an unpartitioned window. The two
        # series cumulate INDEPENDENTLY: a decile introducing no new
        # vocab must still accumulate its token mass (review-caught —
        # the single-join form keyed token mass through vocab rows and
        # flattened cum_tokens to a constant, NULLing the regression).
        return (
            deciles.alias("a")
            .join(
                F.broadcast(series.select(F.col("decile").alias("sd"), val)),
                F.col("sd") <= F.col("a.decile"),
                "left",
            )
            .groupBy(F.col("a.decile").alias("decile"))
            .agg(F.sum(F.coalesce(F.col(val), F.lit(0))).alias(out))
        )

    joined = cumulate(vnew, "new_vocab", "cum_vocab").join(
        cumulate(tmass, "tok_mass", "cum_tokens"), "decile"
    )
    pts = joined.where(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    )
    return pts.groupBy().agg(
        F.count(F.lit(1)).alias("n_points"),
        F.max("cum_vocab").alias("total_vocab"),
        F.max("cum_tokens").alias("total_tokens"),
        F.round(
            F.expr(
                "regr_slope(ln(CAST(cum_vocab AS DOUBLE)),"
                " ln(CAST(cum_tokens AS DOUBLE)))"
            ),
            6,
        ).alias("heaps_beta"),
    )


@query(
    "t_js_divergence_sources",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    tf AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks
      WHERE w <> '' GROUP BY source, w
    ),
    stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS st FROM tf GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.w,
             a.c / CAST(sa.st AS DOUBLE) AS p,
             b.c / CAST(sb.st AS DOUBLE) AS q
      FROM tf a
      JOIN stot sa ON sa.source = a.source
      JOIN tf b ON b.w = a.w AND a.source < b.source
      JOIN stot sb ON sb.source = b.source
    ),
    miss_a AS (
      -- mass present in a but absent in b contributes p*ln(2)/2 and
      -- symmetrically; fold those closed-form tails from the overlap
      SELECT src_a, src_b,
             CAST(sum(0.5 * p * ln(2.0 * p / (p + q))
                      + 0.5 * q * ln(2.0 * q / (p + q))) AS DOUBLE) AS ov,
             CAST(sum(p) AS DOUBLE) AS pa_mass,
             CAST(sum(q) AS DOUBLE) AS qb_mass
      FROM pairs GROUP BY src_a, src_b
    ),
    universe AS (
      -- every source pair, so fully-disjoint vocabularies still ship
      -- a row (JSD = ln 2), not silence
      SELECT a.source AS src_a, b.source AS src_b
      FROM stot a JOIN stot b ON a.source < b.source
    )
    SELECT u.src_a, u.src_b,
           CAST(round(coalesce(m.ov, 0.0)
             + 0.5 * (1.0 - coalesce(m.pa_mass, 0.0)) * ln(2.0)
             + 0.5 * (1.0 - coalesce(m.qb_mass, 0.0)) * ln(2.0), 6)
             AS DOUBLE) AS js_divergence
    FROM universe u
    LEFT JOIN miss_a m ON m.src_a = u.src_a AND m.src_b = u.src_b
    """,
)
def t_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions — the SYMMETRIC, bounded (≤ ln 2) cousin of
    t_source_kl_divergence's source-vs-corpus KL, and the matrix a
    data-mixing pass reads to decide which shards are interchangeable
    (JSD near 0) vs complementary. The trick that keeps it ONE overlap
    join instead of a full outer per pair: tokens present in only one
    source contribute exactly ½·p·ln2 (their mixture term has q=0), so
    the disjoint-support tails fold in CLOSED FORM from the overlap's
    complement masses (1−Σp_overlap)·ln2/2 — no per-token null channel
    for the oracle to diverge on. The pair universe comes from the
    distinct-source cross product, so a pair with fully disjoint
    vocabularies ships its correct JSD = ln 2 row (coalesced masses,
    mirrored both sides) instead of vanishing from the output.
    Probabilities derive from exact
    integer counts and per-source totals; one mirrored float formula,
    round-6. The (source, word) tf aggregate is the single heavy
    shuffle; the pair join is |vocab|·|source-pairs|-bounded."""
    from surge_spark.operators.dedup import tokens as _tok

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(_tok("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # totals + both pair sides consume
    )
    stot = tf.groupBy("source").agg(F.sum("c").alias("st"))
    a = (
        tf.join(stot, "source")
        .select(
            F.col("source").alias("src_a"),
            "w",
            F.expr("c / CAST(st AS DOUBLE)").alias("p"),
        )
    )
    b = (
        tf.join(stot, "source")
        .select(
            F.col("source").alias("src_b"),
            "w",
            F.expr("c / CAST(st AS DOUBLE)").alias("q"),
        )
    )
    pairs = a.join(b, "w").where(F.col("src_a") < F.col("src_b"))
    ov = pairs.groupBy("src_a", "src_b").agg(
        F.expr(
            "CAST(sum(0.5 * p * ln(2.0 * p / (p + q))"
            " + 0.5 * q * ln(2.0 * q / (p + q))) AS DOUBLE)"
        ).alias("ov"),
        F.expr("CAST(sum(p) AS DOUBLE)").alias("pa_mass"),
        F.expr("CAST(sum(q) AS DOUBLE)").alias("qb_mass"),
    )
    # Pair universe from the distinct-source cross product: a pair with
    # fully disjoint vocabularies gets NO overlap row, but its JSD is
    # exactly ln 2 — the left join + coalesce ships it instead of
    # dropping it (mirrored in the oracle). |sources| is tiny, so the
    # triangle cross join is a broadcast nested loop over a few rows.
    srcs = stot.select("source")
    universe = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(srcs.select(F.col("source").alias("src_b")))
        .where(F.col("src_a") < F.col("src_b"))
    )
    return universe.join(ov, ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        F.expr(
            "CAST(round(coalesce(ov, 0.0D)"
            " + 0.5 * (1.0 - coalesce(pa_mass, 0.0D)) * ln(2.0)"
            " + 0.5 * (1.0 - coalesce(qb_mass, 0.0D)) * ln(2.0), 6)"
            " AS DOUBLE)"
        ).alias("js_divergence"),
    )


@query(
    "t_idf_outlier_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    dt AS (
      SELECT DISTINCT doc_id, w FROM toks WHERE w <> ''
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY w),
    scored AS (
      SELECT dt.doc_id,
             CAST(count(*) AS BIGINT) AS n_distinct_tokens,
             round(avg(ln(CAST(nd.n AS DOUBLE) / df.df)), 6) AS mean_idf
      FROM dt JOIN df USING (w) CROSS JOIN nd
      GROUP BY dt.doc_id
    )
    SELECT doc_id, n_distinct_tokens,
           CAST(mean_idf AS DOUBLE) AS mean_idf,
           CAST(row_number() OVER (
             ORDER BY mean_idf DESC, doc_id
           ) AS INT) AS rank
    FROM scored
    ORDER BY mean_idf DESC, doc_id LIMIT 20
    """,
)
def t_idf_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token-density outliers — the 20 documents with the highest
    mean IDF over their distinct tokens: the pretrain-filter heuristic
    for catching noise, code dumps, and ID-laden pages (a document made
    of corpus-rare tokens is the one a quality pass inspects first;
    t_quality_score's length/stopword signals miss it when the junk is
    well-formed). Per-token IDF ln(N/df) comes from exact integer
    df/N; each doc's score is the mean over its DISTINCT tokens,
    rounded to 6 BEFORE the global rank (round-before-rank, with
    doc_id as the total-order tiebreak); the top-20 filter is
    TakeOrdered, never a global window sort. The (doc, token) distinct
    projection is the one corpus-scale shuffle; df joins back
    |vocab|-bounded."""
    from surge_spark.operators.dedup import tokens as _tok

    d = load_table(spark, sf_dir, "documents")
    dt = (
        d.select("doc_id", F.explode(_tok("text")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
        .localCheckpoint(eager=False)  # df + the scoring join consume
    )
    nd = d.groupBy().agg(F.count(F.lit(1)).alias("n"))
    df = dt.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        dt.join(df, "w")
        .crossJoin(F.broadcast(nd))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.round(
                F.avg(F.expr("ln(CAST(n AS DOUBLE) / df)")), 6
            ).alias("mean_idf"),
        )
    )
    return (
        scored.orderBy(F.desc("mean_idf"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.desc("mean_idf"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "n_distinct_tokens", "mean_idf", "rank")
    )


@query(
    "t_log_odds_terms",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    tfq AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks
      WHERE w <> '' GROUP BY source, w
    ),
    two AS (
      SELECT min(source) AS sa,
             min(CASE WHEN source > (SELECT min(source) FROM tfq)
                      THEN source END) AS sb
      FROM tfq
    ),
    gc AS (SELECT w, CAST(sum(c) AS BIGINT) AS g FROM tfq GROUP BY w),
    gt AS (SELECT CAST(sum(g) AS BIGINT) AS gtot FROM gc),
    arm AS (
      SELECT gc.w, gc.g, gt.gtot,
             CAST(coalesce(a.c, 0) AS BIGINT) AS ya,
             CAST(coalesce(b.c, 0) AS BIGINT) AS yb,
             (SELECT CAST(sum(c) AS BIGINT) FROM tfq, two
              WHERE source = two.sa) AS na,
             (SELECT CAST(sum(c) AS BIGINT) FROM tfq, two
              WHERE source = two.sb) AS nb
      FROM gc CROSS JOIN gt CROSS JOIN two
      LEFT JOIN tfq a ON a.w = gc.w AND a.source = two.sa
      LEFT JOIN tfq b ON b.w = gc.w AND b.source = two.sb
      WHERE coalesce(a.c, 0) + coalesce(b.c, 0) > 0
    ),
    scored AS (
      SELECT w, ya, yb,
             round(
               (ln((ya + 1000.0 * g / gtot)
                   / (na + 1000.0 - ya - 1000.0 * g / gtot))
                - ln((yb + 1000.0 * g / gtot)
                     / (nb + 1000.0 - yb - 1000.0 * g / gtot)))
               / sqrt(1.0 / (ya + 1000.0 * g / gtot)
                      + 1.0 / (yb + 1000.0 * g / gtot)), 6) AS z
      FROM arm
    )
    SELECT w AS term, ya AS count_a, yb AS count_b,
           CAST(z AS DOUBLE) AS log_odds_z,
           CAST(row_number() OVER (ORDER BY z DESC, w) AS INT) AS rank
    FROM scored
    ORDER BY z DESC, w LIMIT 20
    """,
)
def t_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Fightin' Words' (Monroe et al. 2008): the 20 terms most
    over-represented in source A vs source B by log-odds with an
    informative Dirichlet prior (α_w ∝ global frequency, α₀=1000) —
    the per-TERM attribution that explains WHAT drives the aggregate
    divergences t_source_kl_divergence / t_js_divergence_sources
    report (raw frequency ratios over-rank rare terms; the prior and
    the variance-normalized z fix exactly that). Arms are the two
    lexicographically-first sources (deterministic, engine-portable);
    every input to the mirrored float formula is an exact integer
    (per-arm counts, arm totals, global counts), z rounds to 6 BEFORE
    the global rank (round-before-rank, term as the tiebreak), and the
    top-20 is TakeOrdered. The (source, word) tf aggregate is the one
    corpus-scale shuffle, checkpointed for its four consumers."""
    from surge_spark.operators.dedup import tokens as _tok

    d = load_table(spark, sf_dir, "documents")
    tfq = (
        d.select("source", F.explode(_tok("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # two/gc/arm-sides consume
    )
    # Arm labels derived IN-PLAN (the oracle's own min / min-above-min
    # pick): one tiny aggregate collects the distinct source set —
    # |sources| is category-bounded — and the two lexicographically
    # first become the arms via a broadcast 1-row scalar frame. F.get
    # (NULL past the end), never [1], which RAISES under ANSI on a
    # single-source corpus. Replaces the former 2-row driver collect.
    two = (
        tfq.groupBy()
        .agg(F.expr("array_sort(collect_set(source))").alias("ss"))
        .select(
            F.get(F.col("ss"), 0).alias("sa"),
            F.get(F.col("ss"), 1).alias("sb"),
        )
    )
    gc = tfq.groupBy("w").agg(F.sum("c").alias("g"))
    gt = gc.groupBy().agg(F.sum("g").alias("gtot"))
    ta = tfq.join(
        F.broadcast(two.select("sa")), F.col("source") == F.col("sa")
    )
    tb = tfq.join(
        F.broadcast(two.select("sb")), F.col("source") == F.col("sb")
    )
    na = ta.groupBy().agg(F.sum("c").alias("na"))
    nb = tb.groupBy().agg(F.sum("c").alias("nb"))
    a = ta.select("w", F.col("c").alias("ca"))
    b = tb.select("w", F.col("c").alias("cb"))
    arm = (
        gc.join(a, "w", "left")
        .join(b, "w", "left")
        .select(
            "w",
            "g",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ya"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("yb"),
        )
        .where(F.expr("ya + yb > 0"))
        .crossJoin(F.broadcast(gt))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    # 1000.0D, not 1000.0: Spark parses a bare decimal literal as
    # DECIMAL, and with BIGINT operands the whole prior chain stays in
    # scale-truncating DECIMAL arithmetic (argA came back as
    # Decimal('0.044476') — 6-digit scale — shifting z by ~1e-5 vs the
    # oracle's float64). The D suffix pins every term to double.
    z = (
        "round((ln((ya + 1000.0D * g / gtot)"
        " / (na + 1000.0D - ya - 1000.0D * g / gtot))"
        " - ln((yb + 1000.0D * g / gtot)"
        " / (nb + 1000.0D - yb - 1000.0D * g / gtot)))"
        " / sqrt(1.0D / (ya + 1000.0D * g / gtot)"
        " + 1.0D / (yb + 1000.0D * g / gtot)), 6)"
    )
    scored = arm.select(
        F.col("w").alias("term"),
        F.col("ya").alias("count_a"),
        F.col("yb").alias("count_b"),
        F.expr(f"CAST({z} AS DOUBLE)").alias("log_odds_z"),
    )
    return (
        scored.orderBy(F.desc("log_odds_z"), F.asc("term"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("log_odds_z"), F.asc("term"))),
        )
    )


@query(
    "t_simpson_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    tf AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks
      WHERE w <> '' GROUP BY source, w
    ),
    g AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             sum(CAST(c AS HUGEINT) * (c - 1)) AS s2
      FROM tf GROUP BY source
    )
    SELECT source, n_tokens, vocab,
           CAST(CASE WHEN n_tokens < 2 THEN NULL
                ELSE round(1.0 - CAST(s2 AS DOUBLE)
                     / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)
                END AS DOUBLE) AS simpson_diversity
    FROM g
    """,
)
def t_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson diversity 1 − λ, λ = Σ c_w(c_w−1) / (N(N−1))
    — the probability two tokens drawn WITHOUT replacement differ: the
    corpus-mix diagnostic beside m_user_entropy_per_type's Shannon
    number (Simpson weights the HEAD of the unigram distribution —
    boilerplate-dominated sources crater it long before entropy moves;
    it is also Gini-Simpson in the diversity literature). The unordered
    numerator Σc(c−1) and denominator are EXACT integers — the
    numerator runs in the wide_int channel from the start (c can reach
    the source's token count, so c² clears bigint at ~3e9 tokens/word,
    real for stop-words at 100 TB); one mirrored float quotient,
    round-6, n<2 → NULL both sides. The (source, word) tf aggregate is
    the one corpus-scale shuffle."""
    from surge_spark.operators.dedup import tokens as _tok

    from .relational import wide_int

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(_tok("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = tf.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.expr(f"{wide_int('c')} * (c - 1)")).alias("s2"),
    )
    return g.select(
        "source",
        "n_tokens",
        "vocab",
        F.expr(
            "CAST(CASE WHEN n_tokens < 2 THEN NULL"
            " ELSE round(1.0 - CAST(s2 AS DOUBLE)"
            " / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)"
            " END AS DOUBLE)"
        ).alias("simpson_diversity"),
    )


@query(
    "a_cohens_kappa",
    oracle=f"""
    WITH lab AS (
      SELECT CASE WHEN length(text) < 500 THEN 'S'
                  WHEN length(text) < 2000 THEN 'M' ELSE 'L' END AS ra,
             CASE WHEN len(list_filter({_DUCK_TOKS}, t -> t <> '')) < 80
                    THEN 'S'
                  WHEN len(list_filter({_DUCK_TOKS}, t -> t <> '')) < 320
                    THEN 'M' ELSE 'L' END AS rb
      FROM documents WHERE text IS NOT NULL
    ),
    cm AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS c FROM lab GROUP BY 1, 2),
    g AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree
      FROM cm
    ),
    r AS (SELECT ra AS l, CAST(sum(c) AS BIGINT) AS rn FROM cm GROUP BY 1),
    cc AS (SELECT rb AS l, CAST(sum(c) AS BIGINT) AS cn FROM cm GROUP BY 1),
    pe AS (SELECT CAST(sum(r.rn * cc.cn) AS BIGINT) AS pe_num
           FROM r JOIN cc USING (l))
    SELECT g.n, g.agree, pe.pe_num,
           CAST(CASE WHEN g.n * g.n = pe.pe_num THEN NULL
                ELSE round((CAST(g.n AS DOUBLE) * g.agree - pe.pe_num)
                     / (CAST(g.n AS DOUBLE) * g.n - pe.pe_num), 6)
                END AS DOUBLE) AS kappa
    FROM g CROSS JOIN pe
    """,
)
def a_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document labelers —
    char-length buckets (S<500/M<2000/L) vs token-count buckets
    (S<80/M<320/L): the chance-corrected agreement score every
    labeling/annotation pipeline reports (raw agreement flatters
    labelers whose marginals happen to align; kappa subtracts the
    expected-by-chance part). The whole statistic is RATIONAL in exact
    integers: kappa = (N·agree − Σᵢrowᵢ·colᵢ) / (N² − Σᵢrowᵢ·colᵢ) from
    the |labels|²-bounded confusion matrix — one mirrored float
    quotient, round-6, degenerate-margin (pe=1) → NULL both sides. NULL
    texts are filtered on both sides (Spark size(NULL)=-1 vs DuckDB
    len(NULL)=NULL would diverge). Overflow: N² clears bigint to ~3e9
    docs; past that the wide_int escape (documented). One corpus pass
    builds the labels; everything after is label-cardinality-bounded."""
    from surge_spark.operators.dedup import tokens as _tok

    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    toks_n = F.size(F.filter(_tok("text"), lambda t: t != ""))
    ra = (
        F.when(F.length("text") < 500, "S")
        .when(F.length("text") < 2000, "M")
        .otherwise("L")
    )
    rb = F.when(toks_n < 80, "S").when(toks_n < 320, "M").otherwise("L")
    cm = (
        d.select(ra.alias("ra"), rb.alias("rb"))
        .groupBy("ra", "rb")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # g / r / cc all consume the matrix
    )
    g = cm.groupBy().agg(
        F.sum("c").alias("n"),
        F.sum(
            F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0)
        ).alias("agree"),
    )
    r = cm.groupBy(F.col("ra").alias("l")).agg(F.sum("c").alias("rn"))
    cc = cm.groupBy(F.col("rb").alias("l")).agg(F.sum("c").alias("cn"))
    pe = r.join(cc, "l").groupBy().agg(
        F.sum(F.expr("rn * cn")).alias("pe_num")
    )
    return g.crossJoin(F.broadcast(pe)).select(
        "n",
        "agree",
        "pe_num",
        F.expr(
            "CAST(CASE WHEN n * n = pe_num THEN NULL"
            " ELSE round((CAST(n AS DOUBLE) * agree - pe_num)"
            " / (CAST(n AS DOUBLE) * n - pe_num), 6) END AS DOUBLE)"
        ).alias("kappa"),
    )


# Shared subset of Java-regex (Spark) and RE2 (DuckDB): char classes,
# +, bounded repetition — no lookaround, no backrefs
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"555-[0-9]{4}"


@query(
    "t_pii_redact",
    oracle=f"""
    WITH built AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com now' ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                  THEN ' call 555-0142 ext 9' ELSE '' END AS t
      FROM documents WHERE text IS NOT NULL
    ),
    red AS (
      SELECT doc_id, t,
             regexp_replace(
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS r
      FROM built
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(length(t) AS BIGINT) AS orig_len,
           CAST(length(r) AS BIGINT) AS redacted_len,
           substr(md5(r), 1, 8) AS redacted_md5
    FROM red
    """,
)
def t_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass every training-data
    pipeline runs before release: count and replace email addresses and
    phone-shaped strings, shipping per-doc counts, before/after lengths,
    and an md5 prefix of the REDACTED text (so the oracle value-checks
    the replacement content itself, not just counts). The synthetic
    corpus contains no PII, so deterministic PII is CONSTRUCTED
    in-query on both engines (doc_id % 7 → an email, % 11 → a phone;
    the mm_feature_extract construct-an-oracle trick — a vacuous
    0-everywhere entry would prove nothing, the r11
    cross-source-leakage lesson). Patterns stay in the Java-regex ∩ RE2
    subset; DuckDB's regexp_replace needs the explicit 'g' flag to
    match Spark's replace-all default. NULL texts filtered both sides.
    Pure map-side — no shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    built = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" call 555-0142 ext 9")
            ).otherwise(""),
        ).alias("t"),
    )
    red = built.withColumn(
        "r",
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
    )
    return red.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).cast("long").alias(
            "n_phones"
        ),
        F.length("t").cast("long").alias("orig_len"),
        F.length("r").cast("long").alias("redacted_len"),
        F.expr("substr(md5(CAST(r AS BINARY)), 1, 8)").alias("redacted_md5"),
    )


@query(
    "a_mcnemar_test",
    oracle=f"""
    WITH lab AS (
      SELECT CASE WHEN length(text) >= 800 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(list_filter({_DUCK_TOKS}, t -> t <> '')) >= 150
                  THEN 1 ELSE 0 END AS b
      FROM documents WHERE text IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a_only,
           CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b_only,
           CAST(CASE WHEN sum(CASE WHEN a <> b THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE round(
                  CAST((sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                        - sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END))
                       AS DOUBLE)
                  * (sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                     - sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END))
                  / sum(CASE WHEN a <> b THEN 1 ELSE 0 END), 6)
                END AS DOUBLE) AS mcnemar_chi2
    FROM lab
    """,
)
def a_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired binary labelers — 'is labeler A
    systematically stricter than B on the SAME units?': the DISCORDANT
    pairs carry all the signal (χ² = (b−c)²/(b+c) over A-only vs
    B-only counts), which is what an unpaired two-proportion z-test
    gets wrong on paired data (a_two_proportion_ztest's complement —
    same-units vs split-units designs). Labelers here: char-length ≥
    800 vs token-count ≥ 150 (deliberately different thresholds from
    a_cohens_kappa's buckets so the discordant cells are populated).
    Everything is exact integers through ONE conditional aggregate —
    one mirrored float quotient, round-6, b+c=0 → NULL both sides.
    NULL texts filtered (the kappa size(NULL) rule)."""
    from surge_spark.operators.dedup import tokens as _tok

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks_n = F.size(F.filter(_tok("text"), lambda t: t != ""))
    lab = d.select(
        F.when(F.length("text") >= 800, 1).otherwise(0).alias("a"),
        F.when(toks_n >= 150, 1).otherwise(0).alias("b"),
    )
    return lab.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END")).alias(
            "n_a_only"
        ),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END")).alias(
            "n_b_only"
        ),
        F.expr(
            "CAST(CASE WHEN sum(CASE WHEN a <> b THEN 1 ELSE 0 END) = 0"
            " THEN NULL"
            " ELSE round("
            "CAST((sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)"
            " - sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)) AS DOUBLE)"
            " * (sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)"
            " - sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END))"
            " / sum(CASE WHEN a <> b THEN 1 ELSE 0 END), 6)"
            " END AS DOUBLE)"
        ).alias("mcnemar_chi2"),
    )


# ONE canonical per-(source, word) term-frequency kernel shared by the
# vocabulary-shape entries (t_hapax_ratio, t_yule_k) — the
# review-discipline factoring (_EQUITY_DD_SQL precedent): the
# tokenization and the empty-token filter must evolve in lockstep or
# the cross-entry vocab pin in tests/test_analytics.py silently breaks.
_SOURCE_TF_SQL = f"""toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents
    ),
    tf AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks
      WHERE w <> '' GROUP BY source, w
    )"""


def _source_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, w, c) mirroring _SOURCE_TF_SQL."""
    d = _docs(spark, sf_dir)
    return (
        d.select("source", F.explode(dd.tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "t_hapax_ratio",
    oracle=f"""
    WITH {_SOURCE_TF_SQL}
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hapax_ppm
    FROM tf GROUP BY source
    """,
)
def t_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena fraction per source — the share of vocabulary seen
    exactly once: the classic productivity/contamination signal beside
    Heaps' growth exponent and Simpson diversity (natural prose sits
    near ~half hapax; template/boilerplate-heavy sources crater it,
    OCR-noise sources inflate it — both are routing signals for a
    cleaning pass). Pure integer channels end to end (counts + ppm
    floor division, `//` ≡ `div`); the (source, word) tf aggregate is
    the one corpus-scale shuffle — the _source_tf/_SOURCE_TF_SQL
    kernel shared with t_yule_k."""
    tf = _source_tf(spark, sf_dir)
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("hapax_ppm"),
    )


# fixed 44-byte WAV header (16-bit mono PCM, 8 kHz, exactly 64 samples =
# 128 data bytes) — derived once from the stdlib wave writer so the
# construct-in-query payloads are byte-identical to real WAV files
_WAV_64S_HEADER = bytes.fromhex(
    "52494646a400000057415645666d7420100000000100010040"
    "1f0000803e0000020010006461746180000000"
)


@query(
    "mm_audio_fingerprint",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 64) AS s
      FROM documents WHERE regexp_matches(text, '^[ -~]{64}')
    ),
    px AS (
      SELECT doc_id, t.i - 1 AS bit,
             CAST(ascii(substring(s, CAST(t.i AS INT), 1)) AS BIGINT) * 256
               AS v
      FROM base, LATERAL (SELECT unnest(range(1, 65)) AS i) t
    ),
    tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS total FROM px GROUP BY 1)
    SELECT p.doc_id,
           CAST(sum(CASE WHEN p.bit >= 32 AND p.v * 64 > t.total
                THEN (CAST(1 AS BIGINT) << (p.bit - 32)) ELSE 0 END)
                AS BIGINT) AS fp_hi,
           CAST(sum(CASE WHEN p.bit < 32 AND p.v * 64 > t.total
                THEN (CAST(1 AS BIGINT) << p.bit) ELSE 0 END)
                AS BIGINT) AS fp_lo
    FROM px p JOIN tot t USING (doc_id) GROUP BY p.doc_id
    """,
)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit AUDIO fingerprint over the REAL WAV decode path — extends
    the construct-in-query family (BMP images, PPM pixels) to audio:
    each doc's first 64 printable-ASCII chars become the high bytes of
    64 signed 16-bit PCM samples in a byte-identical stdlib-format WAV
    (constant 44-byte header derived from the wave writer + \\x00-low
    interleave — plain column concat, no UDF), flow through
    decode_audio's actual frombuffer/mono/resample path inside the
    audio_ahash64 mapInPandas kernel (64 samples ⇒ the nearest-index
    resample is the identity), and the strict integer amplitude
    threshold ``s·64 > Σs`` comes back out as two unsigned-32-bit
    halves DuckDB recomputes from ascii·256. Sample order is char
    order (1-D — no bottom-up flip). One decode pass, no shuffle."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("text").rlike("^[ -~]{64}"))
        .select("doc_id", F.substring("text", 1, 64).alias("s"))
    )
    pad = F.lit(b"\x00")
    parts = [F.lit(_WAV_64S_HEADER)]
    for k in range(1, 65):
        parts.append(pad)
        parts.append(F.encode(F.substring("s", k, 1), "utf-8"))
    with_bin = docs.select("doc_id", F.concat(*parts).alias("payload"))
    fp = mm.image_ahash(with_bin, id_col="doc_id", kind="audio")
    return fp.select(
        F.col("id").alias("doc_id"), "fp_hi", "fp_lo"
    ).where(F.col("fp_hi").isNotNull())


@query(
    "t_yule_k",
    oracle=f"""
    WITH {_SOURCE_TF_SQL},
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(c * c) AS BIGINT) AS sum_c_sq
      FROM tf GROUP BY source
    )
    SELECT source, vocab, n_tokens, sum_c_sq,
           CAST(CASE WHEN n_tokens < 2 THEN NULL
                ELSE round(10000 * (CAST(sum_c_sq AS DOUBLE) - n_tokens)
                     / (CAST(n_tokens AS DOUBLE) * n_tokens), 6)
                END AS DOUBLE) AS yule_k
    FROM g
    """,
)
def t_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source — the REPETITIVENESS twin of
    t_hapax_ratio on the SAME (source, word) tf frame (hapax measures
    the once-seen tail; K = 10⁴·(Σm²V(m) − N)/N² = 10⁴·(Σc² − N)/N²
    weighs the repeated head and, unlike TTR or hapax, is by design
    insensitive to sample SIZE — the standard author/template
    fingerprint: boilerplate-heavy sources push K up, diverse prose
    sits low). Integer channels end to end (Σc² ≤ N² holds bigint to
    ~3e9 tokens per source — the audit-gate bound; wide_int is the
    documented escape past that); ONE mirrored float quotient with an
    integer 10⁴ literal (no decimal-literal channel), round-6, N<2 →
    NULL both sides."""
    tf = _source_tf(spark, sf_dir)
    g = tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.expr("c * c")).alias("sum_c_sq"),
    )
    return g.select(
        "source", "vocab", "n_tokens", "sum_c_sq",
        F.expr(
            "CAST(CASE WHEN n_tokens < 2 THEN NULL"
            " ELSE round(10000 * (CAST(sum_c_sq AS DOUBLE) - n_tokens)"
            " / (CAST(n_tokens AS DOUBLE) * n_tokens), 6)"
            " END AS DOUBLE)"
        ).alias("yule_k"),
    )


# constant little-endian TIFF framing for a 6x3 grey 8-bit single-strip
# image: 8-byte header (IFD pointer past the pixels) ... 18 pixel bytes
# ... 9-entry IFD. Derived once with struct (SHORT inline values are
# LEFT-justified in the 4-byte field — the r10 byte-order trap).
_TIFF_6X3_PREFIX = bytes.fromhex("49492a001a000000")
_TIFF_6X3_SUFFIX = bytes.fromhex(
    "0900"
    "000103000100000006000000"
    "010103000100000003000000"
    "020103000100000008000000"
    "030103000100000001000000"
    "060103000100000001000000"
    "110104000100000008000000"
    "150103000100000001000000"
    "160103000100000003000000"
    "170104000100000012000000"
    "00000000"
)


@query(
    "mm_tiff_real_decode",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 18) AS s
      FROM documents
      WHERE doc_id < 200 AND regexp_matches(text, '^[ -~]{18}')
    ),
    bytes AS (
      SELECT doc_id, t.i, ascii(substring(s, CAST(t.i AS INT), 1)) AS b
      FROM base, LATERAL (SELECT unnest(range(1, 19)) AS i) t
    )
    SELECT doc_id, CAST(6 AS INT) AS width, CAST(3 AS INT) AS height,
           CAST(sum(b) AS BIGINT) AS grey_sum,
           CAST(3 * sum(b) AS BIGINT) AS total_sum,
           CAST(min(b) AS BIGINT) AS min_b,
           CAST(max(b) AS BIGINT) AS max_b
    FROM bytes GROUP BY doc_id
    """,
)
def mm_tiff_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL baseline-TIFF decode path under a FULL value oracle —
    the third container in the construct-in-query family (BMP
    bottom-up rows, PPM, now TIFF's header+strip+trailing-IFD layout):
    each doc's first 18 printable-ASCII chars become the single
    uncompressed strip of a valid little-endian 6×3 grey 8-bit TIFF
    (constant 8-byte header whose IFD pointer jumps PAST the pixels,
    constant 9-entry IFD after them — plain column concat, no UDF),
    route through the actual mapInPandas _decode_tiff (strip assembly,
    inline-SHORT left-justified tag values, grey→RGB expansion), and
    come back as exact integer channel sums. Grey expands to R=G=B, so
    the oracle's single Σb serves all three channels (grey_sum) and
    total = 3Σb; min/max are channel-order-free. The float32 feature
    storage round-trip is the mm_ppm_real_decode argument (~1e-4 off
    an integer, far inside round())."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 200)
        .where(F.col("text").rlike("^[ -~]{18}"))
    )
    payload = F.concat(
        F.lit(_TIFF_6X3_PREFIX),
        F.encode(F.substring("text", 1, 18), "utf-8"),
        F.lit(_TIFF_6X3_SUFFIX),
    )
    with_bin = docs.select(
        "doc_id", payload.alias("payload"), F.lit("image/tiff").alias("mime")
    )
    out = mm.extract_features(with_bin, id_col="doc_id")
    f = lambda i: F.element_at("feat", i).cast("double")  # noqa: E731
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.round(f(1) * 18 * 255).cast("long").alias("grey_sum"),
        F.round(f(4) * 54 * 255).cast("long").alias("total_sum"),
        F.round(f(5) * 255).cast("long").alias("min_b"),
        F.round(f(6) * 255).cast("long").alias("max_b"),
    )


@query(
    "t_code_fraction",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 5 = 0 THEN
               text || chr(10) ||
               repeat('    x = f(a[i]); {y[k] = (m < n);}' || chr(10),
                      CAST(1 + doc_id % 3 AS INT))
             ELSE text END AS t
      FROM documents WHERE text IS NOT NULL
    ),
    ch AS (
      SELECT doc_id, source,
             CAST(length(t) AS BIGINT) AS n_chars,
             CAST(length(t) - length(
               regexp_replace(t, '[{}()\[\];=<>]', '', 'g')) AS BIGINT)
               AS n_sym,
             CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(list_filter(string_split(t, chr(10)),
                  x -> x LIKE '    %')) AS BIGINT) AS n_indent
      FROM aug
    ),
    scored AS (
      SELECT *,
             CASE WHEN n_chars > 0
                    AND n_sym * 1000 // n_chars >= 5
                    AND n_lines > 0
                    AND n_indent * 1000 // n_lines >= 100
                  THEN 1 ELSE 0 END AS is_code
      FROM ch
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sym) * 1000000 // greatest(sum(n_chars), 1)
                AS BIGINT) AS sym_ppm,
           CAST(sum(n_indent) * 1000000 // greatest(sum(n_lines), 1)
                AS BIGINT) AS indent_ppm,
           CAST(sum(is_code) AS BIGINT) AS n_code_docs
    FROM scored GROUP BY source
    """,
)
def t_code_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection per source — the routing signal a
    pretraining pipeline needs before sending documents down the
    code-specific cleaning path (symbol density + indented-line share,
    the two cheapest high-precision code markers): the synthetic corpus
    contains ZERO code, so every fifth doc gets a deterministic
    code-like block APPENDED IN-QUERY (the t_pii_redact
    construct-in-query precedent — vacuous otherwise; the injected
    snippet exercises braces, brackets, assignment, indent). Channels
    are exact integers on both engines: symbol count via
    length-minus-regexp_replace (DuckDB needs the 'g' flag to match
    Spark's replace-all — the pii lesson; the char class is in the
    Java-regex ∩ RE2 subset), indent share via a filtered line split,
    per-doc flag from two integer-ppm thresholds, per-source rollup
    all floor-division ppm. No float channel anywhere."""
    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    aug = d.select(
        "doc_id",
        "source",
        F.expr(
            "CASE WHEN doc_id % 5 = 0 THEN"
            " concat(text, '\\n',"
            " repeat(concat('    x = f(a[i]); {y[k] = (m < n);}', '\\n'),"
            " CAST(1 + doc_id % 3 AS INT)))"
            " ELSE text END"
        ).alias("t"),
    )
    ch = aug.select(
        "doc_id",
        "source",
        F.length("t").cast("long").alias("n_chars"),
        # lengths cast to bigint BEFORE the subtract: length() is INT
        # and the audit gate wants no Integer arithmetic on data-sized
        # channels (bounded here, but the gate is structural)
        (
            F.length("t").cast("long")
            - F.length(F.regexp_replace("t", r"[{}()\[\];=<>]", "")).cast(
                "long"
            )
        ).alias("n_sym"),
        F.expr("CAST(size(split(t, '\\n', -1)) AS BIGINT)").alias("n_lines"),
        F.expr(
            "CAST(size(filter(split(t, '\\n', -1),"
            " x -> x LIKE '    %')) AS BIGINT)"
        ).alias("n_indent"),
    )
    scored = ch.withColumn(
        "is_code",
        F.expr(
            "CASE WHEN n_chars > 0 AND n_sym * 1000 div n_chars >= 5"
            " AND n_lines > 0 AND n_indent * 1000 div n_lines >= 100"
            " THEN 1 ELSE 0 END"
        ),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            "CAST(sum(n_sym) * 1000000 div greatest(sum(n_chars), 1)"
            " AS BIGINT)"
        ).alias("sym_ppm"),
        F.expr(
            "CAST(sum(n_indent) * 1000000 div greatest(sum(n_lines), 1)"
            " AS BIGINT)"
        ).alias("indent_ppm"),
        F.sum("is_code").alias("n_code_docs"),
    )
