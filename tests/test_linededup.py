"""Corpus-level line dedup (textstats.line_dedup): removal modes, blank-line
and normalization semantics, and the no-UDF plan."""

from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import textstats


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "Accept cookies\nAlpha unique line\n\nCopyright 2019 X"),
            (2, "Accept cookies\nBeta unique line\n\nCopyright 2024 X"),
            (3, "ACCEPT COOKIES\nGamma unique line\n\nfresh ending"),
        ],
        "doc_id int, txt string",
    )


def test_drop_all_duplicates(spark):
    out = {
        r["doc_id"]: r
        for r in textstats.line_dedup(_docs(spark), "doc_id", "txt").collect()
    }
    # 'Accept cookies' (case-normalized ×3) and 'Copyright <year> X'
    # (digit-normalized ×2) are dropped everywhere; blanks + uniques survive
    assert out[1]["line_dedup_text"] == "Alpha unique line\n"
    assert out[2]["line_dedup_text"] == "Beta unique line\n"
    assert out[3]["line_dedup_text"] == "Gamma unique line\n\nfresh ending"
    assert out[1]["lines_total"] == 4 and out[1]["lines_removed"] == 2
    assert out[3]["lines_removed"] == 1


def test_keep_first_occurrence(spark):
    out = {
        r["doc_id"]: r["line_dedup_text"]
        for r in textstats.line_dedup(
            _docs(spark), "doc_id", "txt", keep_first=True
        ).collect()
    }
    # first occurrence by (doc_id, pos) survives: doc 1 keeps both dups
    assert out[1] == "Accept cookies\nAlpha unique line\n\nCopyright 2019 X"
    assert out[2] == "Beta unique line\n"
    assert out[3] == "Gamma unique line\n\nfresh ending"


def test_no_normalization_mode(spark):
    out = {
        r["doc_id"]: r["line_dedup_text"]
        for r in textstats.line_dedup(
            _docs(spark), "doc_id", "txt", normalize=False
        ).collect()
    }
    # without normalization only the two verbatim-equal lines dedup
    assert out[3] == "ACCEPT COOKIES\nGamma unique line\n\nfresh ending"
    assert out[1] == "Alpha unique line\n\nCopyright 2019 X"


def test_min_dup_threshold(spark):
    out = textstats.line_dedup(_docs(spark), "doc_id", "txt", min_dup=4)
    # nothing reaches 4 occurrences → all text unchanged
    assert out.filter(F.col("lines_removed") > 0).count() == 0


def test_blank_lines_never_counted(spark):
    docs = spark.createDataFrame(
        [(i, "\n\nonly-doc-%s" % "abcdef"[i]) for i in range(6)],
        "doc_id int, txt string",
    )
    out = textstats.line_dedup(docs, "doc_id", "txt")
    # blank lines appear 12× across the corpus but are never dup-keyed
    assert out.filter(F.col("lines_removed") > 0).count() == 0


def test_no_python_udf(spark):
    plan = (
        textstats.line_dedup(_docs(spark), "doc_id", "txt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
