"""Boilerplate-paragraph dedup (operators/dedup.py:paragraph_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slower_whisper_spark.operators.dedup import paragraph_dedup


def test_boilerplate_removed_order_kept(spark):
    rows = [
        (1, "unique alpha\nSUBSCRIBE now\nunique beta"),
        (2, "subscribe NOW \nown two text"),      # normalized match of doc 1's line
        (3, "own three text\n\n  \nsubscribe now"),  # blanks dropped
        (4, "all mine here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert got[1].text_dedup == "unique alpha\nunique beta"
    assert (got[1].n_paras, got[1].n_kept, got[1].n_removed) == (3, 2, 1)
    assert got[2].text_dedup == "own two text"
    assert got[3].text_dedup == "own three text" and got[3].n_paras == 2
    assert got[4] .text_dedup == "all mine here" and got[4].n_removed == 0


def test_all_boilerplate_doc_survives_empty(spark):
    rows = [(1, "same line"), (2, "same line"), (3, "same line\nmine")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert got[1].text_dedup == "" and got[1].n_kept == 0 and got[1].n_removed == 1
    assert got[3].text_dedup == "mine"


def test_min_docs_threshold_and_no_normalize(spark):
    rows = [(1, "Line A\nx"), (2, "line a\ny"), (3, "Line A\nz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # exact-case matching: 'Line A' appears in docs 1 and 3 only
    got = {r.doc_id: r for r in paragraph_dedup(df, normalize=False).collect()}
    assert got[1].text_dedup == "x" and got[2].text_dedup == "line a\ny"
    # raising min_docs above the max doc-frequency keeps everything
    got3 = {r.doc_id: r for r in paragraph_dedup(df, min_docs=4).collect()}
    assert all(g.n_removed == 0 for g in got3.values())


def test_broadcast_toggle_same_result(spark, docs_small):
    docs, _, _ = docs_small
    src = (
        docs.where(F.col("text").isNotNull() & F.col("url").isNotNull())
        .select("url", F.concat("text", F.lit("\nshared footer")).alias("text"))
        .dropDuplicates(["url"])
        .limit(400)
    )
    a = paragraph_dedup(src, id_col="url").orderBy("url").toPandas()
    b = paragraph_dedup(src, id_col="url", broadcast_boilerplate=False).orderBy("url").toPandas()
    assert a.equals(b)
    assert (a["n_removed"] >= 1).all()  # the shared footer always goes
