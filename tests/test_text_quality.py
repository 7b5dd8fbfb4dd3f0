"""Unicode behavior of the text-quality features (operators/text.py).

Java regex \\w is ASCII-only, so a [^\\w\\s] punctuation class counts
every non-ASCII letter as punctuation — a clean German/French/Spanish
document would blow through the punct_ratio quality cap in exactly the
languages STOPWORDS advertises. The class is [^\\p{L}\\p{N}_\\s] now;
these tests pin that accented and CJK letters are NOT punctuation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tbbid_scrapy_spark.operators.text import corpus_keep, quality_features


def _features(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    f = quality_features(F.col("text"))
    return df.select(
        f["punct_ratio"].alias("punct_ratio"),
        f["n_words"].alias("n_words"),
    ).collect()[0]


def test_accented_letters_are_not_punctuation(spark):
    german = (
        "Über die Brücke führt ein schöner Weg und der König "
        "wählt größere Häuser für die Bürger der Stadt während "
        "die Vögel über den Dächern singen und alle zufrieden sind."
    )
    row = _features(spark, german)
    # 2 periods out of ~190 chars — far under the 0.2 quality cap; the
    # ASCII-\w class counted all 14 umlauts/ß as punctuation (~0.08+).
    assert row.punct_ratio < 0.03


def test_cjk_letters_are_not_punctuation(spark):
    row = _features(spark, "这是 一个 很干净 的 中文 文档 没有 标点")
    assert row.punct_ratio == 0.0


def test_clean_german_document_passes_quality_gate(spark):
    words = (
        "der die und das für über schöne größere häuser bürger "
        "wählen können müssen dürfen straße fluß vögel dächer gerne immer"
    ).split()
    text = " ".join(words * 2) + "."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    kept = corpus_keep(df, min_words=20, max_punct_ratio=0.2, lang="de")
    assert kept.count() == 1


def test_vertical_tab_tokenizes_identically_in_spark_and_duckdb(spark):
    """Java regex \\s includes \\x0B (vertical tab); RE2's (DuckDB, the
    oracle engine) does not — with \\s on both sides a VT in any
    document silently diverges word counts, shingle sets, and norm keys
    between engine and oracle. Both sides now use the explicit class
    text.WS_CHARS; this pins the agreement ON a VT-bearing document."""
    import duckdb

    import __spark_entry__ as em
    from tbbid_scrapy_spark.operators.dedup import normalize_text

    text = "alpha\x0bbeta  gamma\tdelta"
    df = spark.createDataFrame([(text,)], "text string")
    spark_norm = df.select(normalize_text(F.col("text")).alias("n")).collect()[0].n
    from tbbid_scrapy_spark.operators.text import WS_CLASS

    spark_words = df.select(
        F.size(F.split(F.trim(F.lower(F.col("text"))), f"{WS_CLASS}+")).alias("w")
    ).collect()[0].w
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.execute("INSERT INTO t VALUES (?)", [text])
    duck_norm = con.execute(
        f"SELECT {em._NORM} FROM t".replace("lower(text)", "lower(text)")
    ).fetchone()[0]
    duck_words = con.execute(
        f"SELECT len(regexp_split_to_array(trim(lower(text)), '{em._WS}+')) FROM t"
    ).fetchone()[0]
    assert spark_norm == duck_norm == "alpha beta gamma delta"
    assert spark_words == duck_words == 4
