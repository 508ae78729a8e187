"""Text-analysis operators for training-data pipelines: language ID
(stopword n-gram heuristic), quality scoring, token counting, document
fingerprinting. Everything is built-in-function only (whole-stage codegen) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import measured_broadcast

from .dedup import normalize_text, shingles, tokens

# Tiny per-language stopword lists for the heuristic language scorer.
# Deterministic and mirrored verbatim in the DuckDB oracle SQL.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

# A BPE-ish token proxy: words plus digit runs plus residual punctuation
# glyphs — deterministic and cheap, matching what a regex pre-tokenizer does
# ahead of BPE merges.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count, distinct tokens, char length, avg token len."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.length(F.array_join(toks, "")) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("avg_token_len"),
    )


def bpe_ish_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return df.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0),
                lambda t: t != "",
            )
        ).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, alpha ratio, stopword ratio,
    mean word length, and a composed [0,1] score. Mirrors the usual
    pretraining-data filters (Gopher/C4-style rules) in spirit."""
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    n_chars = F.greatest(F.length(text_col), F.lit(1))
    stop = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    stop_ratio = n_stop / n_tok
    alpha_ratio = alpha_chars / n_chars
    mean_wlen = F.length(F.array_join(toks, "")) / n_tok
    score = F.least(
        F.lit(1.0),
        (
            F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.4).otherwise(0.0)
            + F.when(alpha_ratio >= 0.6, 0.3).otherwise(0.0)
            + F.when(F.size(toks) >= 10, 0.3).otherwise(0.0)
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(score, 2).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: count stopword hits per language, argmax with
    a fixed preference order on ties ('en' > 'es' > 'fr' > 'de' > 'zh', then
    'und' when nothing matches). Fully declarative → same logic is expressible
    in the oracle SQL."""
    toks = tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("_toks"))
    order = list(LANG_STOPWORDS)
    for lang in order:
        stop = F.array([F.lit(s) for s in LANG_STOPWORDS[lang]])
        out = out.withColumn(
            f"_hits_{lang}", F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(stop, t)))
        )
    # strict > comparison in declaration order → ties resolve to the first
    # language in LANG_STOPWORDS; zero hits everywhere → 'und'
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in order:
        hits = F.col(f"_hits_{lang}")
        take = hits > best_hits
        new_best = F.when(take, F.lit(lang)).otherwise(best)
        new_hits = F.when(take, hits).otherwise(best_hits)
        best, best_hits = new_best, new_hits
    return out.select(
        F.col(id_col),
        best.alias("pred_lang"),
        best_hits.cast("int").alias("stopword_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint of the normalized text (md5 — stable across
    engines, so the oracle can reproduce it)."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("fingerprint")
    )


def repetition_score(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Gopher-style repetition features: the fraction of word n-grams that
    are repeats of an earlier occurrence. High values flag boilerplate /
    template / spam documents that near-dup passes miss (the repetition is
    WITHIN the document). All map-side per doc — the n-gram multiset never
    leaves its row, so this is a pure projection at any corpus size.

    Two measured optimizations (9.1 → ~1 s at sf0.1):
    - grams are counted as arrays_zip STRUCTS of the n token slices, never
      materializing gram STRINGS (8× — string building dominated; struct
      distinct equals string distinct because normalized tokens contain no
      separator, so the join was bijective anyway);
    - the sizes are computed once behind an explode-of-one-struct
      generator barrier: Catalyst inlines deterministic projections, so
      referencing the expensive expression from total/fraction/output
      re-evaluated it per reference (the same multiplication the
      similarity family hit — generators are never collapsed)."""
    from .dedup import tokens as _tokens

    toks = _tokens(text_col)
    n_toks = F.size(toks)
    m = F.greatest(n_toks - n + 1, F.lit(0))
    gram_structs = F.arrays_zip(
        *[F.slice(toks, i + 1, m) for i in range(n)]
    )
    nonempty = (
        F.length(
            F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)
        )
        > 0
    )
    # short-doc parity with the string-gram form: a nonempty doc with
    # fewer than n tokens contributed ONE whole-doc gram (unless its
    # normalized text is empty — the old "" filter dropped that gram)
    nd = (
        F.when(n_toks >= n, F.size(F.array_distinct(gram_structs)))
        .when(F.element_at(toks, 1) != "", F.lit(1))
        .otherwise(F.lit(0))
    )
    base = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(
                    nd.alias("nd"),
                    n_toks.alias("nt"),
                    nonempty.alias("nonempty"),
                )
            )
        ).alias("s"),
    )
    total = F.when(F.col("s.nt") >= n, F.col("s.nt") - n + 1).otherwise(
        F.when(F.col("s.nonempty"), 1).otherwise(0)
    )
    dup_fraction = F.when(
        total > 0, (total - F.col("s.nd")) / total
    ).otherwise(F.lit(0.0))
    return base.select(
        F.col(id_col),
        total.cast("int").alias("n_ngrams"),
        F.col("s.nd").alias("n_distinct_ngrams"),
        F.round(dup_fraction, 6).alias("dup_ngram_fraction"),
    )


# deliberately simple, RE2-compatible patterns (no lookarounds) so the exact
# same regex strings run in Spark (Java regex) and DuckDB (RE2) oracles
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def redact_pii(
    df: DataFrame, id_col: str, text_col: str, replacement: str = "[REDACTED]"
) -> DataFrame:
    """Training-data PII scrub: replace email addresses and phone-number
    shaped spans. Pure regexp_replace projection — map-side, no shuffle,
    engine-portable patterns (also count the hits for audit sampling)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    step1 = F.regexp_replace(c, PII_EMAIL, replacement)
    return df.select(
        F.col(id_col),
        F.regexp_replace(step1, PII_PHONE, replacement).alias("redacted"),
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), 0)).alias("n_phones"),
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Per-document top-k TF-IDF terms (keyword extraction for corpus
    indexing / topic drift monitoring).

    Shape at scale: one shuffle to build per-(doc, term) counts, one partial
    agg for document frequency (term cardinality ~ vocabulary, small), the
    corpus size rides along as a broadcast single row, and the final top-k
    is a WindowGroupLimit partial top-k per partition — no full-corpus sort.
    Ordering ties on the ROUNDED score are broken by term so the result is
    deterministic and engine-portable."""
    from pyspark.sql import Window

    term_rows = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = term_rows.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        term_rows.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), F.col("rank"), F.col("term"), F.col("tfidf"))
    )


def vocab_top_terms(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-wide vocabulary head: top-k terms by document frequency (with
    total term frequency alongside) — the first step of tokenizer/vocab
    construction and corpus-composition auditing.

    Per-(doc, term) dedup happens map-side via array_distinct BEFORE the
    explode, so the shuffle carries one row per distinct term per doc, and
    the global top-k is TakeOrderedAndProject (partial top-k per partition,
    never a full sort)."""
    per_doc = df.select(
        F.explode(F.array_distinct(tokens(text_col))).alias("term")
    ).where(F.col("term") != "")
    # df_docs: one row per (doc, term) from the distinct explode
    counted = per_doc.groupBy("term").agg(F.count("*").alias("df_docs"))
    totals = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("total_tf"))
    )
    return (
        counted.join(totals, "term")
        .orderBy(F.col("df_docs").desc(), F.col("term").asc())
        .limit(k)
    )


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Exact linear-interpolated percentiles of a numeric column per group
    (document-length distribution per language — the pretraining-mix
    diagnostic). Exact percentile sorts within each group, which is fine
    when groups are few and bounded (languages); for high-cardinality
    groups at 100 TB switch to approx_percentile, which is a mergeable
    sketch (not oracle-portable, hence the exact form here)."""
    pct = F.percentile(
        F.col(value_col), F.array(*[F.lit(p) for p in percentiles])
    )
    cols = [
        F.round(F.element_at(F.col("_pct"), i + 1), 6).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for i, p in enumerate(percentiles)
    ]
    return (
        df.groupBy(group_col)
        .agg(pct.alias("_pct"), F.count("*").alias("n_docs"))
        .select(F.col(group_col), F.col("n_docs"), *cols)
    )


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.05,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep-rates applied via
    an md5 threshold on the key — the language-rebalancing step of a
    pretraining mix. Map-side filter (no shuffle, no rand()): the same rows
    are selected on any engine and any partitioning, so mixes are
    reproducible run-to-run and auditable by the oracle.

    The keep-rate is encoded as a 4-hex-digit threshold compared
    lexicographically against the first 4 md5 chars (lowercase hex sorts
    numerically), which ports verbatim to any engine with md5 — no
    hex-to-int conversion to get subtly wrong."""

    def thr(r: float) -> str:
        v = max(0, int(r * 65536))
        if v >= 65536:
            # keep-all: 65536 formats as the 5-char '10000', which sorts
            # BELOW 'ffff' lexicographically and would keep only ~6%.
            # 'g' sorts after every hex digit, so every md5 prefix passes.
            return "g"
        return format(v, "04x")

    threshold = F.lit(thr(default_rate))
    for stratum, r in rates.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(thr(r))
        ).otherwise(threshold)
    return df.where(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4) < threshold
    )


def boilerplate_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 4, min_df: int = 3,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` corpus-duplicated word n-grams: shingles whose DOCUMENT
    frequency is >= ``min_df`` — the boilerplate/template phrases (headers,
    footers, license blurbs) a pretraining pipeline strips or downweights.

    Scale: the shingle explode is map-side; the df count is one
    partial+final aggregate on the shingle key; the top-k is a
    TakeOrdered over the (already tiny) >= min_df survivors — no full
    sort. Deterministic order: (df desc, shingle asc)."""
    sh = shingles(df, id_col, text_col, n)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(k)
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    min_df: int = 3,
    broadcast_max_bytes: int | None = None,
) -> DataFrame:
    """Per-document duplicated-n-gram fraction: the share of a doc's
    distinct word n-grams that are corpus-frequent (df >= ``min_df``) —
    the Gopher-style "fraction of characters in duplicated n-grams" family
    of quality signals, computed corpus-wide.

    Scale shape (same as decontaminate): the hot-shingle set is tiny
    (boilerplate is rare among distinct shingles) and is BROADCAST back
    against the shingle stream, so the per-doc hit count never shuffles on
    the shingle key — the only shuffles are the two partial+final
    aggregates (df count, per-doc counts).

    Hint contract (audited r11, same class as decontaminate): a low
    ``min_df`` on a pathological corpus makes the hot set corpus-sized,
    and explicit hints are never demoted — ``broadcast_max_bytes`` opts
    into the measured byte gate for that case. Default None keeps the
    single-job plan: the gate measured 3x at sf0.1 (stash-interleaved:
    gated 1.18-1.32 s vs ungated 0.34-0.39) because the checkpoint +
    stats action split the plan; kcore gates free because its probe
    action already exists."""
    sh = shingles(df, id_col, text_col, n)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("shingle")
    )
    if broadcast_max_bytes is not None:
        hot_b, _ = measured_broadcast(
            hot.localCheckpoint(eager=False),
            "shingle",
            max_bytes=broadcast_max_bytes,
        )
    else:
        hot_b = F.broadcast(hot)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    hits = (
        sh.join(hot_b, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_boilerplate"))
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(sizes, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_boilerplate", F.lit(0)).alias("n_boilerplate"),
            F.round(
                F.coalesce("n_boilerplate", F.lit(0))
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1)),
                6,
            ).alias("boilerplate_fraction"),
        )
    )


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic dataset shuffle-shard for training data loaders: every
    row gets a pseudo-random ``shard`` and an opaque ``sort_key`` such that
    (shard, sort_key) order is a keyed global permutation of the corpus —
    WITHOUT a global sort. Writers ``partitionBy(shard)`` and sort within
    partitions by ``sort_key``; readers stream shards in any order and get
    a well-mixed sequence.

    Pure map-side projection (no shuffle, no rand()): shard and key derive
    from md5(seed:id), so the permutation is reproducible on any engine and
    any partitioning — re-runs of a 100 TB shuffle produce byte-identical
    shards, and the oracle can audit the assignment. Different ``seed`` →
    independent permutation (per-epoch reshuffling)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    return df.select(
        F.col(id_col).alias("id"), shard.alias("shard"), key.alias("sort_key")
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc mean unigram log10-probability under the corpus's OWN
    unigram LM — the classic cheap perplexity proxy for pretraining-data
    quality filtering (CCNet/Gopher-style: docs far below the corpus mean
    are gibberish, far above are boilerplate).

    Shape at scale: one partial+final aggregation builds the vocab table
    (vocabulary-sized, ≪ corpus — AQE broadcasts it when it fits), then the
    exploded token stream joins against it and aggregates per doc. The
    corpus total enters as a one-row broadcast cross join, not a collect.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_total"))
    scored = (
        toks.join(vocab, "token")
        .groupBy("id")
        .agg(
            F.avg(F.log10("cnt")).alias("_mean_log_cnt"),
            F.count("*").alias("n_tokens"),
        )
    )
    return scored.crossJoin(F.broadcast(total)).select(
        "id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round(F.col("_mean_log_cnt") - F.log10("_total"), 6).alias("mean_logprob"),
    )


def lang_temperature_mix(
    df: DataFrame, text_col: str, lang_col: str = "lang", alpha: float = 0.3
) -> DataFrame:
    """Temperature-weighted multilingual sampling mix: per language, token
    share p and resampling weight p^alpha / Σ p^alpha (the standard
    low-resource-upsampling rule from multilingual pretraining, alpha≈0.3).
    ``sample_factor`` = weight/p is the per-language repeat rate a sampler
    applies to hit the target mix.

    One partial+final aggregate over the corpus; the normalizing sums run
    as unpartitioned windows over the languages-sized aggregate (a few
    hundred rows at most), so nothing large ever funnels to one task."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).alias("lang_tokens"),
    )
    everything = Window.partitionBy()
    p = F.col("lang_tokens") / F.sum("lang_tokens").over(everything)
    shared = per.withColumn("_p", p).withColumn(
        "_pa", F.pow(F.col("_p"), F.lit(alpha))
    )
    w = F.col("_pa") / F.sum("_pa").over(everything)
    return shared.select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.round("_p", 6).alias("raw_share"),
        F.round(w, 6).alias("temp_share"),
        F.round(w / F.col("_p"), 6).alias("sample_factor"),
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a bag of query terms — the
    classic search scorer (Robertson/Lucene form:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    tf_term = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))).
    Returns the top ``k`` docs: (id, score, n_hit_terms, rank).

    Shape at scale: the token stream is filtered to the query terms
    MAP-SIDE (a literal isin over the exploded tokens — Catalyst pushes it
    into the same stage as the explode), so only matching (doc, term) rows
    ever aggregate; doc lengths are one partial+final count and corpus
    N/avgdl a one-row broadcast. Nothing corpus-wide shuffles except the
    doc-length aggregate the scorer needs anyway. Scores are rounded to 6
    BEFORE ranking (ties then break on id) so the ordering is reproducible
    across engines and partitionings."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("_n_docs"), F.avg("dl").alias("_avgdl")
    )
    hits = toks.where(F.col("token").isin(list(query_terms)))
    tf = hits.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "token")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_tfw",
            (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.round(F.sum(F.col("_idf") * F.col("_tfw")), 6).alias("score"),
        F.count("*").cast("int").alias("n_hit_terms"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "score", "n_hit_terms", "rank")
    )


def word_pmi_top_pairs(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 20
) -> DataFrame:
    """Top-k adjacent-word pairs by pointwise mutual information — the
    classic collocation / phrase-mining statistic (Church & Hanks 1990) a
    tokenizer-vocabulary or phrase-merge pass computes over a corpus:
    pmi(x,y) = ln( p(xy) / (p(x)·p(y)) ) with p from corpus counts.

    Bigrams come from zipping each token array with its own tail (slice +
    arrays_zip + explode — all JVM built-ins, no window shuffle per doc and
    no self-join on position). Unigram and bigram counts are partial+final
    aggregates; the four count joins broadcast (a vocabulary is small
    relative to the corpus — same assumption as unigram_logprob); the
    top-k is TakeOrdered. min_count floors c_xy so PMI isn't dominated by
    one-off pairs. Division order is fixed (c_xy/N_bi) / ((c_x/N)·(c_y/N))
    so both engines produce bit-identical doubles before rounding.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    pairs = (
        df.select(
            F.explode(
                F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))
            ).alias("p")
        )
        .select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    # NEGATIVE A/B (r15 optimization round): localCheckpointing uni + bi
    # (uni has three lazy consumers, bi two, each re-tokenizing the
    # corpus) measured WORSE interleaved at sf0.1 — {1.71, 1.84} vs
    # {0.91, 1.16} s lazy. The re-derived subtrees are narrow
    # column-pruned token explodes + partial aggregates that pipeline in
    # parallel inside one DAG; two materialization barriers cost more
    # than the duplicate text passes at this scale (the wave-1
    # bfs/walks/funnel class). Left lazy.
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_xy").alias("n_bi"))
    u1 = uni.withColumnsRenamed({"w": "w1", "c": "c_x"})
    u2 = uni.withColumnsRenamed({"w": "w2", "c": "c_y"})
    pmi = F.round(
        F.log(
            (F.col("c_xy") / F.col("n_bi"))
            / ((F.col("c_x") / F.col("n_uni")) * (F.col("c_y") / F.col("n_uni")))
        ),
        6,
    )
    return (
        bi.where(F.col("c_xy") >= min_count)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int = 50
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, exponential-race form): each row draws u ∈ (0,1] from
    md5(key) and scores ln(u)/w — the top-k scores ARE a weight-
    proportional sample without replacement. The quality-weighted
    selection step of a pretraining mix, reproducible on any engine and
    any partitioning because the randomness is keyed, not rand().

    Rows with non-positive weight are EXCLUDED (A-ES is defined for
    w > 0; a zero-weight row must never win a slot, and clamping small
    weights up would silently flatten fractional quality scores into a
    uniform sample). The division is by the TRUE weight.

    Shape at scale: the score is a map-side expression (two hash/string
    ops + one log per row, no shuffle) and the top-k is
    TakeOrderedAndProject — partial top-k per partition, never a global
    sort. Scores are rounded before ordering so libm last-bit differences
    can't flip a boundary row; ties break on the key."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
        ).cast("double")
        + 1.0
    ) / float(1 << 60)
    score = F.round(F.log(u) / F.col(weight_col), 9)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("score", score)
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df_frac: float = 0.8,
) -> DataFrame:
    """Posting-list construction: term → sorted list of containing doc ids
    plus document frequency — the inverted index behind corpus search and
    contamination lookup. Terms are deduped per document map-side
    (array_distinct BEFORE explode, so the shuffle carries one row per
    distinct term per doc) and banded to min_df ≤ df ≤ max_df_frac·n_docs.
    The band is decided on a counts-only aggregate BEFORE any posting
    list exists — a stopword's m rows reduce to one count via the partial
    aggregate and its list is never materialized; the surviving term set
    then filters the pair stream (term-keyed join) ahead of the
    collect_list. The relative ceiling holds at ANY corpus scale, and
    rarities below min_df go with them. The corpus size rides along as a
    broadcast single row. Postings are sorted so the array is
    deterministic. At 100 TB the surviving heavy lists additionally shard
    every N entries (posting-list chunking) — the band is the first-order
    bound."""
    pairs = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    ).where(F.col("term") != "")
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    # band on a COUNTS-ONLY aggregate first: the df count collapses each
    # stopword's m rows map-side (partial+final), so the banned terms'
    # posting lists are never built, shuffled, or sorted — banding after
    # the collect_list would materialize exactly the m-row lists the band
    # exists to drop (skewed reducers / agg-buffer OOM on 'the'-class
    # terms at scale)
    keep = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_docs"))
        .join(F.broadcast(n_docs))
        .where(
            (F.col("df_docs") >= min_df)
            & (F.col("df_docs") <= max_df_frac * F.col("n_docs"))
        )
        .select("term")
    )
    return (
        pairs.join(keep, "term")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df_docs"),
            F.sort_array(F.collect_list("doc")).alias("postings"),
        )
    )


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    shard_col: str,
    order_exprs: list,
    descending: bool = False,
    n_shards: int = 16,
    rel_err: float = 0.001,
    out_col: str = "cum",
    bounds: list[float] | None = None,
) -> DataFrame:
    """EXACT global running sum of ``value_col`` in (``order_exprs``) order
    without a single-partition window — the two-pass distributed scan:

      1. one ``approxQuantile`` pass over ``shard_col`` (the LEADING order
         column) yields ``n_shards-1`` literal range boundaries; every row
         gets a shard id from a codegen'd comparison chain, so the
         sharding respects a PREFIX of the global order (ties on the
         boundary value always land in one shard — later tiebreaker
         columns never straddle shards and the concatenation of shards IS
         the global order).
      2. a within-shard running-sum window (partitioned — parallel), plus
         per-shard totals aggregated FROM the windowed subtree (rides the
         same exchange, no second scan), cumulated across the ≤ n_shards
         totals by a broadcast theta self-join — so there is NO
         unpartitioned WindowExec anywhere in the plan, not even over the
         totals.

    Exactness does not depend on quantile accuracy: boundaries only shape
    shard SIZES (skewed boundaries = skewed shards, never wrong sums).
    At 100 TB, set n_shards ~ the cluster's task parallelism; the quantile
    pass is the standard pre-pass a range partitioner (global sort) runs
    anyway, but unlike ``orderBy().window()`` the result never funnels
    through one task. NULL shard keys sort the way Spark's default null
    ordering does (NULLS FIRST ascending, NULLS LAST descending).

    Cites: TeraSort-style range partitioning; the reference has no
    distributed analog (single-node fold, PersistentActor.scala)."""
    from pyspark.sql import Window

    if bounds is None:
        probs = [i / n_shards for i in range(1, n_shards)]
        bounds = df.stat.approxQuantile(shard_col, probs, rel_err)
    # caller-supplied ``bounds`` skips the quantile action entirely — a
    # caller chaining several prefix sums over one frame (m_rfm's three
    # rank passes) batches all its columns into ONE multi-column
    # approxQuantile job. Exactness never depends on the boundary values
    # (they only shape shard sizes), so any sorted numeric list is valid.
    bounds = sorted(set(bounds))
    c = F.col(shard_col)
    if descending:
        cmp_exprs = [c < F.lit(b) for b in sorted(bounds, reverse=True)]
        null_shard = len(bounds) + 1  # desc default: NULLS LAST
    else:
        cmp_exprs = [c > F.lit(b) for b in bounds]
        null_shard = -1  # asc default: NULLS FIRST
    shard = F.lit(0)
    for e in cmp_exprs:
        shard = shard + e.cast("int")
    shard = F.when(c.isNull(), F.lit(null_shard)).otherwise(shard)
    with_shard = df.withColumn("__shard", shard)
    w = (
        Window.partitionBy("__shard")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_shard.withColumn("__local_cum", F.sum(value_col).over(w))
    totals = local.groupBy("__shard").agg(F.sum(value_col).alias("__tot"))
    offs = (
        totals.alias("a")
        .join(totals.alias("b"), F.col("b.__shard") < F.col("a.__shard"), "left")
        .groupBy(F.col("a.__shard").alias("__shard"))
        .agg(F.coalesce(F.sum(F.col("b.__tot")), F.lit(0)).alias("__off"))
    )
    cum_col = F.col("__local_cum") + F.col("__off")
    # Preserve the summed type: sum(int*/long) is already LongType, so the
    # long cast is only applied (as a no-op normalization) for integral
    # inputs; fractional/decimal inputs keep sum's natural result type
    # instead of silently truncating the running total.
    vt = dict(df.dtypes).get(value_col)
    if vt is None or vt in ("tinyint", "smallint", "int", "bigint", "boolean"):
        cum_col = cum_col.cast("long")
    return (
        local.join(F.broadcast(offs), "__shard", "left")
        .withColumn(out_col, cum_col)
        .drop("__shard", "__local_cum", "__off")
    )
