"""Deduplication operator family over the ``documents`` table
(doc_id, text, lang, source, n_chars).

Five strategies, scale-ordered:

- exact          : hash-groupBy on normalized text. One shuffle, maps to a
                   plain GROUP BY — the 100 TB workhorse.
- ngram_jaccard  : exact n-gram (shingle) Jaccard over candidate pairs —
                   ground truth for the approximate methods. Quadratic per
                   shared-shingle group; used at audit scale / as verifier.
- minhash_lsh    : shingle → k-seed minhash signature → banded LSH →
                   bucket self-join. Signatures are built ENTIRELY with
                   JVM-side xxhash64 (one expression per seed) — no Python
                   in the hot path. This is the near-dup scale path.
- simhash        : 64-bit simhash by per-bit token-hash voting, candidate
                   pairs by 16-bit band equality, verified by
                   bit_count(xor) hamming distance. All built-ins.
- embedding near-dup : cosine ≥ τ pairs over the embeddings table (see
                   operators/similarity.py for the kernels).

All pair outputs are canonical (id_a < id_b) and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Canonical text form for exact dedup: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(documents: DataFrame) -> DataFrame:
    """One row per distinct normalized text: keeper = min(doc_id), plus
    group size. Single hash-shuffle on a 64-bit key; at 100 TB this is
    the cheapest possible full-corpus dedup (partial aggregation map-side,
    no text comparison after hashing — collisions at 2^-64 are accepted
    and can be re-verified with a second equality pass)."""
    return (
        documents.select(
            F.xxhash64(normalize_text(F.col("text"))).alias("text_hash"),
            F.col("doc_id"),
        )
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct, order-free) from whitespace
    tokens — pure Catalyst: split + transform over a slice window."""
    toks = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(n))),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array()))


def _exploded_shingles(documents: DataFrame, n: int) -> DataFrame:
    return documents.select(
        F.col("doc_id"), F.explode(shingles(F.col("text"), n)).alias("shingle")
    )


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3, threshold: float = 0.8,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact Jaccard-similar pairs: explode shingles, self-join on shingle,
    count intersections, |A∪B| = |A|+|B|−|A∩B|.

    ``max_shingle_df`` drops stop-shingles (document frequency above the
    cap) before the self-join — at web scale a shingle appearing in 10^6
    docs would create 10^12 join pairs; capping bounds the blow-up while
    only affecting pairs whose similarity rests on ubiquitous text."""
    ex = _exploded_shingles(documents, n)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    if max_shingle_df is not None:
        rare = (
            ex.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        ex = ex.join(rare, "shingle", "inner")
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "id_a")
                    .withColumnRenamed("n_shingles", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_shingles", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(documents: DataFrame, n: int = 3, num_hashes: int = 32) -> DataFrame:
    """(doc_id, sig array<bigint>) — sig[i] = min over shingles of
    xxhash64(shingle, seed=i). One explode + one groupBy with
    ``num_hashes`` min() aggregates, all codegen'd; map-side partial
    aggregation means the shuffle carries one row per doc."""
    ex = _exploded_shingles(documents, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = ex.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(documents: DataFrame, n: int = 3, num_hashes: int = 32,
                      bands: int = 8, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via banded minhash LSH, verified by the signature
    Jaccard estimate.

    rows-per-band r = num_hashes/bands; a pair colliding in ≥1 band is a
    candidate (p = 1-(1-j^r)^b). Candidates are then scored by the
    fraction of agreeing signature components (unbiased Jaccard
    estimator) and filtered at ``threshold``. Bucket join key is a single
    xxhash64 over the band slice — bucket sizes stay tiny so the
    self-join is local per bucket."""
    r = num_hashes // bands
    sigs = minhash_signatures(documents, n, num_hashes)
    band_rows = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws("|", F.slice(F.col("sig"), b * r + 1, r)), b
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bucket")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return (
        cand.withColumn("jaccard_est", est.cast("double"))
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def simhash(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash bigint): per-bit majority vote over token
    xxhash64s. 64 conditional-sum aggregates, assembled with shift/or —
    whole-stage codegen, one shuffle."""
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("th").bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3,
                  n_bands: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) ≤ k.

    Candidates by band equality (pigeonhole: distance ≤ n_bands-1 ⇒ at
    least one band equal — pick n_bands > max_hamming for a recall
    GUARANTEE, fewer bands for cheaper probabilistic recall), verified
    with bit_count(a XOR b). The band join replaces the quadratic
    all-pairs scan with n_bands bucket joins."""
    assert 64 % n_bands == 0, "n_bands must divide 64"
    width = 64 // n_bands
    mask = (1 << width) - 1
    sh = simhash(documents)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), width * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, on=["band", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
