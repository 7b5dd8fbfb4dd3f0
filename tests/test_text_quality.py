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
