"""Deduplication operators for large-scale text pipelines.

All candidate generation is JVM-side (built-in functions over exploded
shingles/tokens — no Python in the hot path); only O(candidates) work ever
crosses a shuffle. Strategies:

- exact:        hash-groupBy on (normalized) content
- ngram-jaccard: shingle inverted index self-join → exact Jaccard (the
                 verification primitive; also usable standalone at small n)
- MinHash+LSH:  k min-hash signature → b bands → band-bucket self-join →
                 exact-Jaccard verification of candidates only
- SimHash:      64-bit sign fingerprint → banded hamming candidates

At 100 TB: the shingle explode is map-side only; the signature aggregation is
partial+final (k min() columns); only band buckets shuffle, and bucket skew
(stop-shingle buckets) is capped by dropping buckets above a size limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import measured_broadcast

TOKEN_PATTERN = "[^a-z0-9]+"

# The DuckDB mirror of normalize_text/tokens — oracles MUST use this string
# so the SQL side can never drift from the Spark tokenizer above.
DUCK_NORMALIZE_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
DUCK_TOKENS_SQL = f"string_split({DUCK_NORMALIZE_SQL}, ' ')"


def normalize_text(col: str | F.Column) -> F.Column:
    """Lowercase, collapse non-alphanumerics to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), TOKEN_PATTERN, " "))


def tokens(col: str | F.Column) -> F.Column:
    return F.split(normalize_text(col), " ")


def shingle_array(text_col: str | F.Column, n: int = 4) -> F.Column:
    """Distinct word n-gram shingles of a document as an array column —
    purely map-side (no explode, no shuffle)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.filter(F.array_distinct(grams), lambda g: g != "")


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 4, distinct: bool = True
) -> DataFrame:
    """Exploded (id, shingle) rows — the inverted-index form used by
    exact-Jaccard joins.

    Grams are built WITHOUT higher-order functions (which run interpreted:
    the transform/slice-per-index form measured 3.8s vs 0.6s at sf0.1):
    the token array is zipped with its n-1 shifted selves (arrays_zip +
    slice — all whole-stage codegen) and the structs exploded into
    concat_ws grams. Docs shorter than n tokens contribute their whole
    normalized text as one shingle.

    ``distinct=True`` (the exact-Jaccard contract) dedupes per doc with a
    dropDuplicates shuffle; pass False where duplicates are harmless —
    MinHash min() is duplicate-insensitive — to keep the path shuffle-free.
    """
    norm = normalize_text(text_col)
    toks = F.split(norm, " ")
    base = df.select(
        F.col(id_col).alias("id"), norm.alias("_norm"), toks.alias("_toks")
    )
    big = 1 << 30
    z = F.arrays_zip(
        F.col("_toks").alias("g0"),
        *[F.slice("_toks", i + 1, big).alias(f"g{i}") for i in range(1, n)],
    )
    # ONE conditional explode instead of a grams/short-docs UNION (r15
    # optimization round): the union form referenced `base` twice, so
    # every shingles() call re-scanned its input AND re-ran the regex
    # normalization in both branches (no cross-branch subexpression
    # sharing) — 2x the text passes for the entire minhash/LSH family.
    # Short docs ride the same explode as a 1-element struct array whose
    # g1..g{n-1} are NULL; concat_ws skips NULLs, so the same projection
    # yields the whole-text shingle for them. Output multiset is
    # branch-for-branch identical to the union form.
    short_arr = F.array(
        F.struct(
            F.col("_norm").alias("g0"),
            *[F.lit(None).cast("string").alias(f"g{i}") for i in range(1, n)],
        )
    )
    out = (
        base.select(
            "id",
            F.size("_toks").alias("_nt"),
            "_norm",
            F.explode(F.when(F.size("_toks") >= n, z).otherwise(short_arr)).alias(
                "s"
            ),
        )
        .where(
            F.col(f"s.g{n - 1}").isNotNull()
            | ((F.col("_nt") < n) & (F.col("_norm") != ""))
        )
        .select(
            "id", F.concat_ws(" ", *[f"s.g{i}" for i in range(n)]).alias("shingle")
        )
    )
    return out.dropDuplicates(["id", "shingle"]) if distinct else out


def exact_dedup(df: DataFrame, id_col: str, text_col: str, normalized: bool = False) -> DataFrame:
    """Exact duplicate groups: one keeper (min id) per distinct content."""
    content = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        df.select(F.col(id_col).alias("id"), content.alias("content"))
        .groupBy("content")
        .agg(F.min("id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def jaccard_pairs(
    sh: DataFrame, max_bucket: int = 1000
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing >= 1 shingle.

    Inverted-index self-join: explode shingle → pairs within a shingle's
    posting list → count co-occurrences → |A∩B| / (|A|+|B|-|A∩B|).
    ``max_bucket`` drops stop-shingles whose posting lists would blow up the
    pair space (skew guard at scale; candidate recall for near-dups is
    unaffected because near-dup pairs share many shingles).

    r15 optimization round: ``sh`` is localCheckpointed — its four lazy
    consumers (sizes, freq, both posting-list join sides) otherwise each
    re-ran the whole shingle pipeline (regex normalize + explode +
    dropDuplicates shuffle; 4 text passes per run measured in the final
    plan of every caller), and the self-join sides are the SAME aliased
    frame renamed AFTER the join (the adamic-adar identical-subtree rule)
    so the posting-list exchange is planned once and reused instead of
    canonicalizing apart."""
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    pruned = sh.join(
        freq.where(F.col("df") <= max_bucket).select("shingle"), "shingle"
    )
    x, y = pruned.alias("x"), pruned.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )


def _minhash_bases(
    shingle: F.Column, hash_fn: str = "xxhash64"
) -> tuple[F.Column, F.Column]:
    """The two base hashes of the Kirsch–Mitzenmacher double-hash MinHash
    family: member i = a + i·b. Two string hashes per shingle instead of
    k — the k-1 remaining members are integer multiply-adds, ~3× cheaper
    end-to-end at k=64 than hashing the shingle string k times. The shifts
    bound a < 2^61 and i·b < 2^60 so every sum stays below 2^63:
    overflow-safe under ANSI mode (on by default in Spark 4 plain
    sessions). minhash_signatures_from_docs inlines the identical
    formulas as SQL text (pinned equal by tests/test_dedup.py) — keep the
    two in sync.

    ``hash_fn='md5'``: engine-portable bases — the two 32-bit halves of
    the shingle's md5 (a,b < 2^32, so a + 63·b < 2^38, overflow-safe in
    any engine's BIGINT). Same K-M family downstream; DuckDB computes the
    identical values via its '0x…'-cast, which is what gives the md5
    catalog twins full value oracles."""
    if hash_fn == "md5":
        hex_ = F.md5(shingle.cast("binary"))
        a = F.conv(F.substring(hex_, 1, 8), 16, 10).cast("long")
        b = F.conv(F.substring(hex_, 9, 8), 16, 10).cast("long")
        return a, b
    a = F.shiftrightunsigned(F.xxhash64(shingle), 3)
    b = F.shiftrightunsigned(F.xxhash64(shingle, F.lit(1)), 10)
    return a, b


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, hash_fn: str = "xxhash64"
) -> DataFrame:
    """k-permutation MinHash signature per id from exploded (id, shingle)
    rows: k min() aggregates (partial+final, map-side combine) over the
    double-hash family — the two base hashes are computed once per shingle
    row inside codegen, the k members are multiply-adds. Prefer
    minhash_signatures_from_docs when the source docs are at hand — it
    avoids this aggregation shuffle entirely.

    The whole k-wide aggregate is ONE parsed expression (array of mins)
    rather than k Column objects: each chained DataFrame op re-analyzes
    its whole subtree eagerly, and at k=64 the per-call py4j + analysis
    overhead of column-at-a-time construction measured ~2× the actual
    execution time at sf0.1."""
    a, b = _minhash_bases(F.col("shingle"), hash_fn)
    hashed = sh.select("id", a.alias("_a"), b.alias("_b"))
    sig = ", ".join(f"min(_a + {i} * _b)" for i in range(num_hashes))
    return hashed.groupBy("id").agg(F.expr(f"array({sig})").alias("sig"))


def minhash_signatures_from_docs(
    df: DataFrame, id_col: str, text_col: str, n: int = 4, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature computed entirely map-side from the per-doc shingle
    array — ZERO shuffles. Same double-hash family as
    ``minhash_signatures`` (the two paths must emit identical signatures):
    the two base-hash arrays are materialized in their own projection
    first, because higher-order functions don't participate in
    subexpression elimination — inlining would re-tokenize and re-hash the
    document once per hash family (measured 8× slower)."""
    base = df.select(
        F.col(id_col).alias("id"), shingle_array(text_col, n).alias("_sh")
    )
    hashed = base.select(
        "id",
        F.expr("transform(_sh, g -> shiftrightunsigned(xxhash64(g), 3))").alias("_a"),
        F.expr("transform(_sh, g -> shiftrightunsigned(xxhash64(g, 1), 10))").alias(
            "_b"
        ),
    )
    sig = ", ".join(
        f"array_min(zip_with(_a, _b, (x, y) -> x + {i} * y))"
        for i in range(num_hashes)
    )
    return hashed.select("id", F.expr(f"array({sig})").alias("sig"))


def _banded(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """One row per (doc id, band): (id, band, bucket-hash of the band's
    signature slice). Shared subtree of ``lsh_candidates`` and
    ``lsh_candidate_ids`` — both shuffle it by (band, bucket), so building
    it identically lets Spark's ReusedExchange compute it once per query."""
    band_hashes = ", ".join(
        "xxhash64({}, {})".format(
            b,
            ", ".join(f"sig[{b * rows_per_band + r}]" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return sig.select(
        "id", F.posexplode(F.expr(f"array({band_hashes})")).alias("band", "bucket")
    )


def _bucket_sized(banded: DataFrame) -> DataFrame:
    """Attach each row's band-bucket population as ``_bsz``. The window
    count runs over the same (band, bucket) keys downstream joins shuffle
    on, so it rides the existing exchange — no extra shuffle."""
    from pyspark.sql import Window

    return banded.withColumn(
        "_bsz", F.count("*").over(Window.partitionBy("band", "bucket"))
    )


def lsh_candidates(
    sig: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = 5000,
    pair_predicate=None,
) -> DataFrame:
    """Band the signature and self-join on (band index, band hash): classic
    MinHash-LSH candidate generation. Output: (id_a, id_b) distinct pairs.
    ``pair_predicate(id_a, id_b)`` overrides the default ``id_a < id_b``
    dedup ordering — the incremental entry passes a side-membership test
    instead (new-vs-corpus pairs).

    ``max_bucket`` caps band-bucket posting lists (same skew guard as
    ``jaccard_pairs``): a bucket of m near-identical boilerplate docs
    otherwise yields m²/2 pairs on a single reducer. Recall for genuine
    near-dups is barely affected — with b bands a pair colliding in a
    dropped hot bucket almost surely collides in another band too, and the
    docs dense enough to fill a hot bucket are exact/near-exact dupes that
    exact_dedup already catches upstream. Pass None to disable."""
    banded = _banded(sig, bands, rows_per_band)
    if max_bucket is not None:
        banded = (
            _bucket_sized(banded).where(F.col("_bsz") <= max_bucket).drop("_bsz")
        )
    # shuffle_hash hint: makes both self-join sides identical shuffle
    # exchanges, so Spark's ReusedExchange computes the (expensive) signature
    # subtree ONCE instead of twice (AQE would otherwise broadcast one side
    # at small SF, killing the reuse). At cluster scale a shuffle join is the
    # right strategy for this self-join anyway. Measured: 8.3s -> 7.6s at
    # sf0.1 for the full near-dup query.
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket").hint("shuffle_hash")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket").hint("shuffle_hash")
    if pair_predicate is None:
        pred = F.col("id_a") < F.col("id_b")
    else:
        pred = pair_predicate(F.col("id_a"), F.col("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .where(pred)
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_candidate_ids(
    sig: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = 5000,
) -> DataFrame:
    """Doc ids that appear in at least one LSH candidate pair, derived
    directly from band buckets: ``_banded`` emits at most one row per
    (id, band), so every member of a surviving bucket with ≥ 2 rows pairs
    with another member — exactly the distinct ids of
    ``lsh_candidates``'s output, with the same ``max_bucket`` filter.

    Standalone form (e.g. to stage candidate ids without building pairs).
    Inside ``minhash_lsh_dedup`` the candidate ids are instead derived from
    the pair table itself: the pair table's final distinct exchange is
    already computed for the verification join, so the id derivation rides
    it via ReusedExchange, whereas this banded form re-executes the
    Window/Sort/distinct above the banded exchange once per plan
    occurrence (measured 2.0 s vs 1.5 s for the full pruned query at
    sf0.1)."""
    sized = _bucket_sized(_banded(sig, bands, rows_per_band))
    cond = F.col("_bsz") >= 2
    if max_bucket is not None:
        cond = cond & (F.col("_bsz") <= max_bucket)
    return sized.where(cond).select("id").distinct()


def _verified_jaccard(
    cands: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """The shared ONE-SCAN verification tail: per-pair n_union/n_common
    from the role-join presence frame, jaccard = n_common/n_union,
    filtered at ``threshold``. The ``n_common > 0`` guard mirrors the
    unpruned path's inner shingle-equality join, which can never emit a
    zero-overlap pair: here a candidate survives the role join via
    EITHER member's shingles and would aggregate to jaccard=0.0 —
    visible (pruned != unpruned) whenever threshold <= 0. Used by the
    production self-join entry AND the incremental new-vs-corpus entry;
    a verification fix lands once, here."""
    per_shingle = _pair_shingle_presence(cands, sh)
    agg = per_shingle.groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_union"),
        F.sum(F.col("_ha") * F.col("_hb")).alias("n_common"),
    )
    return (
        agg.withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .where((F.col("n_common") > 0) & (F.col("jaccard") >= threshold))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _pair_shingle_presence(cands: DataFrame, sh: DataFrame) -> DataFrame:
    """The ONE-SCAN verification core shared by the Jaccard and
    containment entries: each candidate pair contributes a role row per
    member; one join against the shingle stream (broadcast-able — pairs ≪
    corpus is the LSH design assumption), then per (pair, shingle)
    presence-per-side flags (_ha/_hb) from a two-level aggregate. Every
    verification metric (n_union = count(*), n_common = Σ _ha·_hb,
    n_a = Σ _ha, n_b = Σ _hb) derives from this single frame — no
    per-doc sizes pass, the corpus never shuffles in verification."""
    roles = cands.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("id"), F.lit(0).alias("side")),
                F.struct(F.col("id_b").alias("id"), F.lit(1).alias("side")),
            )
        ).alias("r"),
        "id_a",
        "id_b",
    ).select(
        F.col("r.id").alias("id"), "id_a", "id_b", F.col("r.side").alias("side")
    )
    return (
        roles.join(sh, "id")
        .groupBy("id_a", "id_b", "shingle")
        .agg(
            F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("_ha"),
            F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("_hb"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int | None = 5000,
    prune_verification: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs: MinHash-LSH candidates verified with exact Jaccard.

    ``prune_verification`` defaults True — the one-scan O(candidates)
    verification both wins locally (1.31 vs 1.47 s at sf0.1) and is the
    only shape that survives 100 TB (the corpus never shuffles in
    verification); False keeps the full-corpus-join form as the A/B twin.

    Shuffle budget: band-bucket self-join (capped by ``max_bucket``) plus the
    exact-Jaccard verification join. With ``prune_verification=False`` the
    verification joins the FULL exploded shingle table twice (a-side via the
    pair join, b-side as an (id, shingle) lookup) and aggregates per-doc
    sizes over the full corpus — three O(corpus) passes regardless of how
    few candidates there are. With ``prune_verification=True`` verification
    is ONE-SCAN and O(candidates) end to end: the pair table is exploded
    into per-member role rows (id, id_a, id_b, side), joined once against
    the shingle stream — a broadcast map-side join whenever pairs ≪ corpus,
    i.e. the corpus never shuffles at all in verification — and reduced by
    a two-level aggregate: per (pair, shingle) presence-per-side, then per
    pair n_union = count(*) and n_common = Σ(both sides present), giving
    jaccard = n_common / n_union with no per-doc size aggregate, no sizes
    joins, and no semi-join prune passes at all.

    Measured (sf0.1, local[32], back-to-back interleaved medians-of-3):
    one-scan pruned 1.31 s vs unpruned 1.47 s — the r4-r7 semi-join pruned
    form measured 2.14 s in the same session (three broadcast-semi builds +
    candidate-id distinct + full-corpus sizes aggregate = ~10 extra stages),
    and an intermediate full-outer per-pair join form 1.71 s. The one-scan
    form finally puts the at-scale shape at-or-below the local winner too.
    History that must not be retried: an array-based verification
    (array_intersect over per-doc shingle arrays) measured 3× WORSE —
    shingle_array's transform() runs interpreted (see
    minhash_signatures_from_docs note); an explicit repartition(id_a, id_b)
    before the per-pair reduce (to make the final aggregate exchange-free)
    also LOST (1.91 s) — the subset-partitioned sort-merge costs more than
    the small post-join aggregate exchange it saves.

    Skew note: a doc appearing in many pairs ships its shingles once per
    pair through the role join — the same fan-out the unpruned pair join
    has on its a-side; ``max_bucket`` bounds per-band degree exactly as it
    bounds the candidate generation itself."""
    # exploded signature path: xxhash64 over (id, shingle) rows stays inside
    # whole-stage codegen and the k min() aggregates combine map-side —
    # measured ~3x faster than the per-row transform()/array_min form, whose
    # higher-order functions run interpreted. Signatures read the
    # NON-distinct shingle stream (min() is duplicate-insensitive), keeping
    # that branch shuffle-free before the groupBy. Empty-shingle docs simply
    # have no rows and drop out everywhere.
    sig = minhash_signatures(
        shingles(df, id_col, text_col, n, distinct=False), num_hashes, hash_fn
    )
    cands = lsh_candidates(sig, bands, num_hashes // bands, max_bucket)
    sh = shingles(df, id_col, text_col, n)
    if prune_verification:
        # one-scan verification tail shared with the incremental entry —
        # incl. the n_common > 0 guard (rationale at _verified_jaccard)
        return _verified_jaccard(cands, sh, threshold)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.withColumnsRenamed({"id": "id_a"})
    b = sh.withColumnsRenamed({"id": "id_b"})
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_containment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int | None = 5000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """CONTAINMENT near-dup pairs over MinHash-LSH candidates: for each
    candidate pair, containment = |A∩B| / min(|A|, |B|) — the asymmetric-
    overlap detector Jaccard misses (a short doc fully quoted inside a
    long one has high containment but low Jaccard; Broder's original
    resemblance/containment distinction). Same candidate machinery as
    minhash_lsh_dedup; verification is the one-scan O(candidates) shape
    EXTENDED with per-side sizes from the same two-level aggregate
    (n_a = Σ has_a, n_b = Σ has_b over the pair's shingle union — no
    separate sizes pass, the corpus still never shuffles). Returns
    (id_a, id_b, containment)."""
    sig = minhash_signatures(
        shingles(df, id_col, text_col, n, distinct=False), num_hashes, hash_fn
    )
    cands = lsh_candidates(sig, bands, num_hashes // bands, max_bucket)
    sh = shingles(df, id_col, text_col, n)
    per_shingle = _pair_shingle_presence(cands, sh)
    agg = per_shingle.groupBy("id_a", "id_b").agg(
        F.sum("_ha").alias("n_a"),
        F.sum("_hb").alias("n_b"),
        F.sum(F.col("_ha") * F.col("_hb")).alias("n_common"),
    )
    return (
        agg.withColumn(
            "containment", F.col("n_common") / F.least("n_a", "n_b")
        )
        .where((F.col("n_common") > 0) & (F.col("containment") >= threshold))
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


def dedup_clusters(
    df: DataFrame, id_col: str, pairs: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """Turn near-dup PAIRS into dedup CLUSTERS: connected components over
    the similarity graph, singleton docs included. Returns one row per doc:
    (id, component, cluster_size, is_canonical) where component is the min
    doc id in the cluster and the canonical keeper is that min id — the
    deterministic keeper election a production dedup pass applies before
    dropping non-canonical docs.

    Scale: component labeling is O(log d) shuffle rounds (see
    operators/graph.py); the singleton union is a broadcast-able left join
    (components ≪ corpus when dup-rate is low); cluster_size is one more
    partial+final aggregate on the component key.
    """
    from .graph import connected_components

    comp = connected_components(pairs, "id_a", "id_b", max_iterations)
    ids = df.select(F.col(id_col).alias("id"))
    labeled = ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    sizes = labeled.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return labeled.join(sizes, "component").select(
        "id",
        "component",
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_max_bytes: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its distinct
    word n-grams appear anywhere in the benchmark corpus. Returns
    (id, n_shingles, n_hit, contamination, contaminated) — the standard
    eval-leak filter a training-data pipeline runs before every dump.

    Scale: the benchmark shingle set is tiny relative to the corpus (eval
    suites are MBs; the corpus is TBs), so it is broadcast — the training
    shingle stream never shuffles, making the whole pass map-side except
    the per-doc count aggregation (partial+final on doc id).

    The hint contract: an explicit F.broadcast is honored UNCONDITIONALLY
    (never demoted by AQE), so passing a corpus-sized frame as
    ``bench_df`` is a driver-OOM lever. ``broadcast_max_bytes`` opts into
    the measured byte gate (measured_broadcast over a checkpointed bench
    set) for UNTRUSTED benchmark inputs; it is None by default because
    the gate is NOT free here — it splits the single-job plan into
    checkpoint + stats action + main query, measured at sf0.1
    (stash-interleaved, gated/ungated/gated): 1.05-1.31 s vs
    0.59-0.71 s. kcore_converged gates unconditionally instead because
    its per-round probe action already exists — the stats ride it free.
    """
    bench_sh = (
        shingles(bench_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    if broadcast_max_bytes is not None:
        bench_b, _ = measured_broadcast(
            bench_sh.localCheckpoint(eager=False),
            "shingle",
            max_bytes=broadcast_max_bytes,
        )
    else:
        bench_b = F.broadcast(bench_sh)
    tr = shingles(train_df, id_col, text_col, n)
    sizes = tr.groupBy("id").agg(F.count("*").alias("n_shingles"))
    hits = (
        tr.join(bench_b, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_hit"))
    )
    ids = train_df.select(F.col(id_col).alias("id"))
    return (
        ids.join(sizes, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0))
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1)),
                6,
            ).alias("contamination"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    horizon: str = "1 hour",
    normalized: bool = False,
) -> DataFrame:
    """Ingest-time exact dedup for a continuously arriving corpus: emit the
    FIRST document per content fingerprint; drop re-fetches that arrive
    within ``horizon`` of each other (event time). The streaming complement
    of exact_dedup for the crawl-ingest stage of a training-data pipeline.

    Built on dropDuplicatesWithinWatermark: the state store keys on the
    128-bit md5 content fingerprint (not the document text, so state rows
    are fixed-size) and expires entries once the watermark passes the
    horizon — state is bounded by ingest-rate × horizon, not by corpus
    size, which is what makes this run forever at 100 TB/day. A re-fetch
    arriving after the horizon re-emits (matching any bounded-state dedup);
    dedupe the persisted corpus with exact_dedup for the global guarantee.
    """
    content = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        stream.withColumn("_fp", F.md5(F.encode(content, "UTF-8")))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash fingerprint: each distinct token votes ±1 on every bit
    of its 64-bit hash; fingerprint bit = sign of the vote sum. All JVM-side:
    one explode + 64 conditional-sum aggregates (partial+final).

    ``hash_fn``: 'xxhash64' (default — one non-cryptographic JVM hash per
    token, the production choice) or 'md5' (two 32-bit halves of the
    token's md5 hex — ~3× more map-side work, but a pure function both
    engines compute identically, which gives the ENTIRE simhash pipeline
    — votes, sign, bit packing — a value-checked DuckDB oracle; see
    d_simhash_fingerprints_md5). The algorithm downstream of the hash is
    byte-identical in both modes."""
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
        .where(F.col("tok") != "")
    )
    # BOTH hot expression lists are ONE parsed F.expr each (the
    # minhash_signatures precedent): 64 vote aggregates + the 64-term
    # fingerprint chain built column-at-a-time cost ~1.5 s of py4j round
    # trips PER CALL at any SF (measured r11 in the build-time sweep);
    # as text they parse in milliseconds. Values are identical — integer
    # math, same left-assoc order, same conv/shiftright functions.
    if hash_fn == "md5":
        md5_hex = "md5(CAST(tok AS BINARY))"
        hi = f"CAST(conv(substring({md5_hex}, 1, 8), 16, 10) AS BIGINT)"
        lo = f"CAST(conv(substring({md5_hex}, 9, 8), 16, 10) AS BIGINT)"

        def bit_sql(i: int) -> str:
            src, off = (lo, i) if i < 32 else (hi, i - 32)
            return f"(shiftright({src}, {off}) & 1) = 1"

    else:

        def bit_sql(i: int) -> str:
            return f"(shiftright(xxhash64(tok), {i}) & 1) = 1"

    votes = ",".join(
        f"sum(CASE WHEN {bit_sql(i)} THEN 1 ELSE -1 END)" for i in range(64)
    )
    agg = tok.groupBy("id").agg(F.expr(f"array({votes})").alias("_vb"))
    terms = []
    for i in range(64):
        mul = str(1 << i) if i < 63 else "CAST('-9223372036854775808' AS BIGINT)"
        terms.append(
            f"(CASE WHEN _vb[{i}] > 0 THEN CAST(1 AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END) * {mul}"
        )
    fp = "(" + " + ".join(terms) + ")"
    return agg.select("id", F.expr(fp).alias("simhash"))


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Exact duplicated-span detection (the Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better' signal, re-expressed
    relationally): every maximal token span whose every length-k window
    occurs >= min_count times in the corpus. Output one row per (doc,
    span): (id, span_start, span_end, span_tokens) in token offsets —
    the spans a dedup pass would cut out of the training text.

    Plan shape: k-gram extraction is a map-side array transform (one pass
    per doc, no per-gram re-tokenize); the gram frequency table is one
    partial+final aggregate; duplicated positions come back via a semi
    join; span merging is a per-doc window (islands of positions at gap
    <= k). Three shuffles total, none of the corpus text wider than the
    gram stream.

    ``hash_grams=True`` is the 100 TB shuffle-byte shape: the frequency
    aggregate and semi join key on xxhash64(gram) (8 bytes) instead of the
    raw k-token string (~50+ bytes) — identical output barring an xxhash64
    collision between distinct grams in the same corpus (probability
    ~n²/2⁶⁵; a collision can only merge two gram families' counts, never
    drop a genuine duplicate). Default False keeps the keys engine-portable
    for the DuckDB oracle; equality between both modes is pinned in
    tests/test_dedup.py, and the hashed form measures at-or-below the
    string form already at sf0.1 (1.64 s vs 1.77 s median-of-5) where gram
    strings are short — the gap widens with k and corpus size."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_t")
    ).where(F.size("_t") >= k)
    grams = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - k),
                lambda i: F.array_join(F.slice("_t", i + 1, k), " "),
            )
        ).alias("pos", "gram"),
    )
    if hash_grams:
        grams = grams.select("id", "pos", F.xxhash64("gram").alias("gram"))
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("gram")
    )
    marked = grams.join(dup, "gram", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    new_span = F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    spans = marked.withColumn(
        "_span", F.sum(new_span).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        spans.groupBy("id", "_span")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + k - 1).cast("int").alias("span_end"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def cut_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, min_count: int = 2
) -> DataFrame:
    """The transform ``duplicate_spans`` exists for: rebuild each document
    WITHOUT its corpus-duplicated spans (Lee et al. 2022's ExactSubstr cut
    applied to normalized tokens). Output one row per input doc:
    (id, clean_text, n_tokens, n_tokens_removed).

    The span table aggregates to a per-doc array (spans per doc is small —
    bounded by n_tokens/k) and the cut itself is a map-side
    positional filter after one join; docs with no duplicated span pass
    through the left join untouched. The oracle mirrors the cut as a
    positions anti-join — the same plan a 100 TB run would prefer if
    span counts per doc ever grew large."""
    spans = duplicate_spans(df, id_col, text_col, k, min_count)
    spans_arr = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_t"))
    joined = base.join(spans_arr, "id", "left")
    kept = F.when(F.col("_spans").isNull(), F.col("_t")).otherwise(
        F.filter(
            F.col("_t"),
            lambda t, i: ~F.exists(
                F.col("_spans"),
                lambda s: (i >= s.span_start) & (i <= s.span_end),
            ),
        )
    )
    return joined.select(
        "id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("_t").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).alias("n_tokens_removed"),
    )


def minhash_lsh_incremental(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_new,
    n: int = 4,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int | None = 5000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """INCREMENTAL near-dup: the daily-shard-vs-accumulated-corpus shape —
    pairs are (new doc, existing doc) only, never new-new or old-old.
    ``is_new`` is a Column-factory: given the id column it returns the
    membership predicate (e.g. ``lambda c: c % 5 == 0`` or a
    partition-date test).

    Plan shape: ONE signature/banding pass over the union (at 100 TB the
    accumulated corpus' signatures live in a table and only the new
    shard's are computed — this operator recomputes both so the entry is
    self-contained; the join below is the part that matters), reusing
    lsh_candidates with the side-membership test as the pair predicate
    (is_new(id_a) AND NOT is_new(id_b)). Exchange-reuse mechanics,
    stated precisely: under the default ``max_bucket`` the bucket-size
    Window (partitioned on band+bucket, not id) BARRIERS the per-side
    predicates from pushing below the shared exchange, so the signature
    subtree is built once (ReusedExchange, plan-pinned). With
    ``max_bucket=None`` there is no barrier and Catalyst pushes each
    side's predicate down to its scan — the subtrees split, but the two
    builds then cover DISJOINT id subsets (new vs old), so total compute
    stays ~one full pass; only the parquet scan runs twice. Verification
    is the one-scan O(candidates) tail shared with the production entry
    (_verified_jaccard). Output: (new_id, old_id, jaccard)."""
    sig = minhash_signatures(
        shingles(df, id_col, text_col, n, distinct=False), num_hashes, hash_fn
    )
    cands = lsh_candidates(
        sig,
        bands,
        num_hashes // bands,
        max_bucket,
        pair_predicate=lambda ia, ib: is_new(ia) & ~is_new(ib),
    )
    sh = shingles(df, id_col, text_col, n)
    return _verified_jaccard(cands, sh, threshold).select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("old_id"),
        "jaccard",
    )


class SignatureStore:
    """Persisted MinHash signature table for INCREMENTAL near-dup at scale.

    The one admitted gap in the 100 TB daily-dedup story (r10):
    ``minhash_lsh_incremental`` recomputes signatures for the ENTIRE
    accumulated corpus every run — shingle + 2 string hashes + k min()
    aggregates over 100 TB of text, per day. Here the corpus signatures
    live in a table instead: each daily run computes signatures for the
    NEW shard only, checks it against the stored table
    (``minhash_lsh_from_stored``), then appends the shard's signatures.
    The daily cost drops from O(corpus text) to O(shard text) +
    O(corpus signatures) — k longs per doc, ~500 bytes at k=64, i.e. a
    ~200x narrower scan than re-reading and re-hashing the text.

    Storage is a ``SnapshotStore`` (streaming/snapshot_store.py) keyed on
    the stringified doc id — reusing its manifest-atomic commits,
    merge-on-read delta appends with periodic compaction (a daily shard
    append is a flat O(shard) delta write, NOT a corpus rewrite),
    latest-wins semantics (a re-crawled doc's fresh signature replaces
    the stale one), R4 batch dedup (a replayed daily job is a no-op) and
    vacuum/CDF. No new storage code, no new invariants.
    """

    def __init__(self, root: str, num_buckets: int = 64, delta_commits: int = 16):
        from surge_spark.streaming.snapshot_store import SnapshotStore

        # change_feed: capture EVERY commit's own batch (first/COW/
        # compaction included) so the signature table is DR-replicable
        # via the change feed like any snapshot (see .store)
        self._store = SnapshotStore(
            root,
            key_col="id",
            num_buckets=num_buckets,
            delta_commits=delta_commits,
            change_feed=True,
        )

    def append(self, sig: DataFrame, batch_id: str) -> bool:
        """Merge one shard's ``(id, sig)`` signatures (latest-wins per id).
        ``batch_id`` makes replays idempotent (R4). Returns False if the
        batch was already committed."""
        updates = sig.select(F.col("id").cast("string").alias("id"), "sig")
        return self._store.commit(None, updates, batch_id, updates_unique=True)

    def load(self, spark, id_type: str = "long") -> DataFrame:
        """The accumulated corpus signature table: one row per doc,
        ``(id, sig array<bigint>)`` — the narrow scan that replaces the
        full-corpus signature recompute."""
        return self._store.read_state(spark).select(
            F.col("id").cast(id_type).alias("id"), "sig"
        )

    def vacuum(self, keep_last: int = 10) -> list[int]:
        """Reclaim aged-out/orphaned store versions (SnapshotStore.vacuum).
        RETENTION CONTRACT: vacuum reclaims change records along with
        their versions, so ``keep_last`` must exceed the maximum
        replication lag (in appends) of any standby reading the change
        feed — a replica further behind than the retention window can no
        longer catch up incrementally and needs a full re-seed. Size
        keep_last to lag + slack, not to the append cadence."""
        return self._store.vacuum(keep_last=keep_last)

    @property
    def store(self):
        """The underlying SnapshotStore — change feed (read_changes /
        stream_changes) and DR replication (replicate_changes) apply to
        the signature table exactly as to any keyed snapshot, so a
        standby region can replay the corpus signatures without
        re-hashing a byte of text. Migration caveat: a store root
        created BEFORE the feed was enabled (r11) has no change records
        for its old compaction/first commits — read_changes over a range
        including those versions raises the documented no-record error;
        replay such a store from the first feed-enabled version (or
        re-seed the standby from read_state once)."""
        return self._store


def minhash_lsh_from_stored(
    shard_df: DataFrame,
    corpus_df: DataFrame,
    stored_sig: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int | None = 5000,
    hash_fn: str = "xxhash64",
    prune_verification_scan: bool = False,
    shard_sig: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup against a PERSISTED corpus signature table:
    (new doc, existing doc) pairs at ``jaccard >= threshold``, computing
    signatures for the new ``shard_df`` ONLY — the accumulated corpus
    contributes ``stored_sig`` (id, sig), e.g. ``SignatureStore.load``.

    Equals ``minhash_lsh_incremental`` on the same corpus split exactly
    (pinned in tests/test_dedup.py): signatures are a pure function of the
    text, the band-bucket skew cap ``max_bucket`` is applied to the UNION
    of both sides' banded rows (same population the self-contained form
    counts), and the same one-scan O(candidates) verification tail runs —
    ``corpus_df`` is needed for verification shingles only, and since the
    role join broadcasts candidate pairs into the shingle stream, the
    corpus text is scanned once map-side and never shuffled. Docs present
    on BOTH sides (a re-crawled shard doc whose stale signature is still
    stored) never self-pair (id_a != id_b guard).

    What this buys at 100 TB, concretely: the self-contained form's
    signature build is shingle + hash + k-min over every corpus document
    every run; here the old side is a scan of k longs per doc. Measured
    at sf0.1 (local[32], interleaved back-to-back, corpus = 80% of
    documents, md5 family): the REPLACED COMPONENT — the corpus
    signature aggregate — costs 0.70 s recomputed vs 0.16 s scanned from
    the store (4.4x), while end-to-end the full queries measure 1.78 vs
    1.71 s medians because the shared tail (shard signatures + one-scan
    verification over the corpus shingle stream) dominates at this SF.
    The saved aggregate is exactly the part that grows with corpus size
    while the shard stays fixed — at 1000x the corpus it is the whole
    query.
    """
    if shard_sig is None:
        shard_sig = minhash_signatures(
            shingles(shard_df, id_col, text_col, n, distinct=False),
            num_hashes,
            hash_fn,
        )
    rows_per_band = num_hashes // bands
    banded = _banded(shard_sig, bands, rows_per_band).withColumn(
        "_new", F.lit(True)
    ).unionByName(
        _banded(stored_sig, bands, rows_per_band).withColumn("_new", F.lit(False))
    )
    if max_bucket is not None:
        banded = (
            _bucket_sized(banded).where(F.col("_bsz") <= max_bucket).drop("_bsz")
        )
    a = banded.where(F.col("_new")).select(
        F.col("id").alias("id_a"), "band", "bucket"
    )
    b = banded.where(~F.col("_new")).select(
        F.col("id").alias("id_b"), "band", "bucket"
    )
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verification text: shard docs + corpus docs NOT re-crawled in the
    # shard (anti join, broadcast-able — the shard id set is the small
    # side by design), so an id on both sides verifies against its
    # CURRENT text deterministically
    corpus_only = corpus_df.select(F.col(id_col), F.col(text_col)).join(
        shard_df.select(F.col(id_col)), id_col, "left_anti"
    )
    if prune_verification_scan:
        # 100 TB knob: _verified_jaccard's role join keeps only candidate
        # ids anyway, so restricting the corpus to candidate OLD docs
        # before shingling is value-identical BY CONSTRUCTION — but it
        # prunes the per-day corpus work from "shingle-explode every
        # document's text" to "shingle only the candidates" (the corpus
        # text scan itself remains; the explode/normalize CPU goes from
        # O(corpus) to O(candidates)). Costs a candidate materialization
        # + an extra semi join — at sf0.1 it measures a wash (see the
        # equality test), the win grows with corpus/candidate ratio.
        cands = cands.localCheckpoint(eager=False)
        old_ids = cands.select(F.col("id_b").alias(id_col)).distinct()
        corpus_only = corpus_only.join(old_ids, id_col, "left_semi")
    sh = shingles(
        shard_df.select(F.col(id_col), F.col(text_col)).unionByName(corpus_only),
        id_col,
        text_col,
        n,
    )
    return _verified_jaccard(cands, sh, threshold).select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("old_id"),
        "jaccard",
    )


def _incremental_dedup_batch(
    batch_df: DataFrame,
    batch_id,
    store: SignatureStore,
    corpus_path: str,
    pairs_path: str,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_bucket: int | None,
    hash_fn: str,
) -> None:
    """One micro-batch of the incremental-dedup stream (module-level so a
    test can replay a batch id directly). Replay safety, precisely:

    - pairs/docs land under per-batch dirs with mode=overwrite — a
      replayed batch REWRITES its own output;
    - the signature append is R4-deduped on the batch id;
    - the stored table is ANTI-JOINED on the shard's own ids before
      matching: after a crash between store.append and the checkpoint
      commit, the replayed batch would otherwise see its OWN signatures
      as "corpus" and publish in-batch new-new pairs the original run
      (correctly) excluded. The anti join costs nothing semantically even
      without replay — a stored id that is in the shard could only pair
      with other SHARD docs (new-new, excluded by contract) or itself
      (excluded by the self-pair guard); genuine re-crawls still match
      against every OTHER old doc. The verification corpus text is
      replay-safe the same way (minhash_lsh_from_stored anti-joins
      corpus text on shard ids already)."""
    import os as _os

    spark = batch_df.sparkSession
    shard = batch_df.localCheckpoint()
    bdir = f"batch={batch_id}"
    idt = shard.schema[id_col].dataType.simpleString()
    # ONE signature build per batch, shared by the match and the append
    # (the match recomputing it doubled the O(shard text) work per trigger)
    sig = minhash_signatures(
        shingles(shard, id_col, text_col, n, distinct=False), num_hashes, hash_fn
    ).localCheckpoint(eager=False)
    # the PRE-batch corpus = batch dirs strictly below this batch id
    # (stream batch ids are monotone) — a replayed batch reads the exact
    # corpus its original run saw, never text from later batches
    prior = []
    if _os.path.isdir(corpus_path):
        for d in sorted(_os.listdir(corpus_path)):
            if d.startswith("batch="):
                try:
                    k = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if k < int(batch_id):
                    prior.append(_os.path.join(corpus_path, d))
    if prior:
        corpus = spark.read.parquet(*prior)
        stored = store.load(spark, id_type=idt).join(
            shard.select(F.col(id_col).alias("id")), "id", "left_anti"
        )
        pairs = minhash_lsh_from_stored(
            shard, corpus, stored, id_col, text_col,
            n=n, num_hashes=num_hashes, bands=bands,
            threshold=threshold, max_bucket=max_bucket, hash_fn=hash_fn,
            # daily-production shape: shingle only candidate old docs
            # (value-identical, equality-pinned in tests)
            prune_verification_scan=True,
            shard_sig=sig,
        ).withColumn("batch_id", F.lit(str(batch_id)))
    else:
        pairs = spark.createDataFrame(
            [], f"new_id {idt}, old_id {idt}, jaccard double, batch_id string"
        )
    pairs.write.mode("overwrite").parquet(f"{pairs_path}/{bdir}")
    shard.select(id_col, text_col).write.mode("overwrite").parquet(
        f"{corpus_path}/{bdir}"
    )
    store.append(sig, f"stream-{batch_id}")


def run_incremental_dedup_stream(
    docs_stream: DataFrame,
    store: SignatureStore,
    corpus_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int | None = 5000,
    hash_fn: str = "xxhash64",
):
    """The STREAMING daily-dedup pipeline composed end to end: each
    micro-batch of new documents is near-dup-checked against the
    accumulated corpus via the persisted signature table
    (minhash_lsh_from_stored — shard signatures computed ONCE per batch,
    corpus signatures scanned from the SignatureStore), then folded INTO
    the corpus: signatures appended to the store (SnapshotStore flat
    delta, R4-idempotent on the batch id), pairs and raw docs landed
    under per-batch directories with mode=overwrite so a replayed batch
    rewrites its own output instead of duplicating it — the same
    exactly-once-per-batch-id discipline as the command engine's commit
    (crash-replay content-equality pinned in tests/test_dedup.py; see
    _incremental_dedup_batch for the exact replay contract).

    Per batch, in order: (1) match against the PRE-batch corpus (text
    read back from ``corpus_path`` for the one-scan verification), (2)
    publish pairs to ``pairs_path/batch=<id>``, (3) append the batch's
    docs to ``corpus_path/batch=<id>`` and its signatures to the store.
    The first batch seeds an empty corpus (no pairs). Returns the
    configured ``DataStreamWriter`` — callers pick a trigger and
    ``.start()`` it. Within-batch (new-new) duplicates are the caller's
    shard-level dedup (minhash_lsh_dedup on the batch) — same split as
    minhash_lsh_incremental's contract."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        _incremental_dedup_batch(
            batch_df, batch_id, store, corpus_path, pairs_path,
            id_col, text_col, n, num_hashes, bands, threshold,
            max_bucket, hash_fn,
        )

    return docs_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
