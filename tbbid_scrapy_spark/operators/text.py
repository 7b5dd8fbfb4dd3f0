"""Text-analysis operators over the ``documents`` table — language ID,
quality scoring, token counting, document fingerprinting. All pure
Catalyst expressions (regex / higher-order array functions); zero Python
in the hot path, so they run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword seed lists (public common-word lists); the
# heuristic scores stopword hit-rate per language and argmaxes.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
}

# Whitespace as an EXPLICIT character class, not \s: Java regex \s is
# [ \t\n\x0B\f\r] but RE2 (DuckDB, the oracle engine) \s omits \x0B —
# a vertical tab in a document would make word counts, shingle sets,
# and norm keys silently diverge between the engine and every oracle.
# The explicit class means both engines tokenize identically for ALL
# inputs, not just fixtures that happen to avoid \x0B. Interior (for
# composing into other classes) and full class exported for reuse.
WS_CHARS = r" \t\n\x0B\f\r"
WS_CLASS = f"[{WS_CHARS}]"

# BPE-ish tokenizer: words, numbers, or single non-space symbols — a
# deterministic stand-in for subword tokenization with similar count scale.
TOKEN_PATTERN = rf"[A-Za-z]+|[0-9]+|[^{WS_CHARS}A-Za-z0-9]"


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(f"({TOKEN_PATTERN})"), 1)


def token_count(col: Column) -> Column:
    """Whitespace-word count + regex token count in one struct."""
    return F.struct(
        F.size(F.split(F.trim(col), f"{WS_CLASS}+")).alias("words"),
        F.size(tokens(col)).alias("tokens"),
    )


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features (the standard
    pretraining-corpus quality heuristics)."""
    n_chars = F.length(col)
    words = F.split(F.trim(F.lower(col)), f"{WS_CLASS}+")
    n_words = F.size(words)
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(words, lambda w: F.array_contains(en, w)))
    # Unicode-aware punctuation class: Java \w is ASCII-only, so the old
    # [^\w\s] counted every ü/é/汉 as punctuation and the quality gate
    # rejected clean documents in exactly the languages STOPWORDS covers.
    # \p{L}\p{N} are identical Unicode general categories in Java regex
    # and DuckDB's RE2, so the oracle SQL uses the same class verbatim.
    n_punct = n_chars - F.length(F.regexp_replace(col, rf"[^\p{{L}}\p{{N}}_{WS_CHARS}]", ""))
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"),
        "stopword_ratio": (stop_hits / F.greatest(n_words, F.lit(1))).cast("double"),
        "mean_word_len": mean_word_len.cast("double"),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: rewards stopword presence and sane
    word lengths, penalizes punctuation soup — deterministic and cheap."""
    f = quality_features(col)
    word_len_ok = F.when(
        (f["mean_word_len"] >= 2.0) & (f["mean_word_len"] <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    score = (
        F.least(f["stopword_ratio"] * 2.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.least(f["punct_ratio"] * 4.0, F.lit(1.0))) * 0.3
        + word_len_ok * 0.2
    )
    return score.cast("double")


def lang_scores(col: Column) -> Column:
    """Map of language → stopword hit count."""
    words = F.split(F.trim(F.lower(col)), f"{WS_CLASS}+")
    entries = []
    for lang, sw in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in sw])
        entries.append(
            F.struct(
                F.lit(lang).alias("lang"),
                F.size(F.filter(words, lambda w: F.array_contains(arr, w))).alias("hits"),
            )
        )
    return F.array(*entries)


def lang_id(col: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when no
    stopword of any list appears. Ties break by language code order for
    determinism (array_sort on (-hits, lang))."""
    scored = lang_scores(col)
    best = F.element_at(
        F.array_sort(
            scored,
            lambda a, b: F.when(a["hits"] > b["hits"], -1)
            .when(a["hits"] < b["hits"], 1)
            .otherwise(F.when(a["lang"] < b["lang"], -1).when(a["lang"] > b["lang"], 1).otherwise(0)),
        ),
        1,
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column, n: int = 4) -> Column:
    """Order-sensitive 64-bit document fingerprint: xxhash64 chain over
    word 4-gram hashes (a rolling-hash analog, built from sortable
    array ops — min/max/first of gram hashes folded with length)."""
    toks = F.split(F.trim(F.lower(col)), f"{WS_CLASS}+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(n))), i),
    )
    folded = F.aggregate(
        gram_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc, h),
    )
    return F.when(k > 0, folded).otherwise(F.xxhash64(F.concat_ws(" ", toks)))


def with_text_analysis(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """All analyses in one projection (single scan)."""
    c = F.col(text_col)
    feats = quality_features(c)
    return documents.withColumns(
        {
            **feats,
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "n_tokens": F.size(tokens(c)),
            "fingerprint": fingerprint(c),
        }
    )


def corpus_keep(documents: DataFrame, min_words: int = 20,
                max_punct_ratio: float = 0.2, lang: str | None = "en",
                near_dup_threshold: float = 0.5,
                max_shingle_df: int | None = 1000,
                persist_survivors: bool = True) -> DataFrame:
    """End-to-end pretraining-corpus filter — the composition a 100 TB
    data pipeline actually runs, each stage the already-tested operator:

    1. quality gate   : n_words ≥ min_words AND punct_ratio ≤ cap
                        (quality_features — scan-speed Catalyst)
    2. language gate  : lang_id(text) == lang (skip when lang is None)
    3. exact dedup    : keep the smallest doc_id per normalized text
                        (one hash-shuffle, map-side combined)
    4. near-dup drop  : remove any survivor with a SMALLER near-duplicate
                        among survivors (exact n-gram Jaccard ≥ τ via the
                        count-based dedup.ngram_jaccard_pairs — a doc is
                        dropped iff it appears as id_b of some pair)

    Deterministic end to end, so the whole pipeline is DuckDB-oracle
    checkable; returns (doc_id, n_words) of the kept documents. Stage
    order is filter-first: dedup runs on the quality/lang survivors
    (cheaper at scale — the gates are scan-speed, dedup shuffles).

    ``persist_survivors`` (default True) materializes the survivor set
    once before the near-dup stage: ngram_jaccard_pairs references its
    input in four sub-plans (df cap, both self-join sides, set sizes)
    plus the final anti-join — without the persist the quality/lang/
    exact-dedup pipeline (regex-heavy lang_id included) re-executes ~5×
    (measured 17 s → 6.5 s at sf0.1). At 100 TB prefer materializing
    survivors to a table; the persist is MEMORY_AND_DISK either way,
    registered with ``operators.scratch`` — call ``scratch.release()``
    after the final action to free it."""
    from tbbid_scrapy_spark.operators import dedup as _dedup
    from tbbid_scrapy_spark.operators import scratch as _scratch

    c = F.col("text")
    f = quality_features(c)
    # widen a narrow input BEFORE the regex/HOF-heavy quality+lang
    # projection (dedup._spread — no-op for already-wide inputs): the
    # fixture parquet is one row group, so without this the whole
    # quality/lang pipeline ran as ONE task regardless of cores. The
    # raw input width is captured FIRST — it also decides the
    # survivors re-spread below (probing the derived survivors plan
    # directly would finalize + execute it, see safe_num_partitions)
    n_in = _dedup.safe_num_partitions(documents)
    documents = _dedup._spread(documents)
    base = documents.select(
        "doc_id",
        "text",
        f["n_words"].alias("n_words"),
        f["punct_ratio"].alias("punct_ratio"),
        lang_id(c).alias("lang_pred"),
    ).filter(
        (F.col("n_words") >= min_words)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    if lang is not None:
        base = base.filter(F.col("lang_pred") == lang)
    keyed = base.withColumn("_th", F.xxhash64(_dedup.normalize_text(c)))
    # keep-min-doc_id per text hash as ONE partitioned window instead of
    # a groupBy + semi-join back: same semantics, one exchange and no
    # broadcast-build job (the hash groups are tiny, so the window sort
    # is per-group trivial; partitioned by _th — never unpartitioned)
    from pyspark.sql import Window as _W

    _w = _W.partitionBy("_th").orderBy("doc_id")
    survivors = (
        keyed.withColumn("_rn", F.row_number().over(_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_th")
    )
    if persist_survivors:
        # AQE coalesces the small post-window shuffle output down to ONE
        # partition, which would single-thread BOTH the cache-fill and
        # the O(text-length) shingle work downstream (measured 14.5 s vs
        # 3.6 s for the near-dup stage at sf0.1). Narrowness is decided
        # from the INPUT scan (safe to probe — executes nothing), so a
        # 100 TB input never pays a blind repartition: wide in ⇒ AQE
        # keeps the survivors at the advisory partition size.
        target = documents.sparkSession.sparkContext.defaultParallelism
        if n_in is not None and n_in * 2 <= target:
            survivors = survivors.repartition(target)
        survivors = _scratch.persist(survivors)
    pairs = _dedup.ngram_jaccard_pairs(
        survivors.select("doc_id", "text"),
        n=3,
        threshold=near_dup_threshold,
        max_shingle_df=max_shingle_df,
    )
    # no .distinct() on the losers: left_anti semantics are identical
    # against a multiset and the dedup shuffle was pure overhead
    losers = pairs.select(F.col("id_b").alias("doc_id"))
    return (
        survivors.join(losers, "doc_id", "left_anti")
        .select("doc_id", "n_words")
    )
