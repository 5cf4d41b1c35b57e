"""End-to-end training-corpus construction: the composition the individual
text-quality operators exist for.

    raw documents
      → C4 line cleaning            (textstats.c4_line_filter)
      → Gopher quality gate         (textstats.gopher_quality_filter)
      → repetition gate             (textstats.repetition_stats thresholds)
      → language filter             (textstats.lang_id)
      → exact dedup                 (md5 digest, keep smallest id)
      → MinHash-LSH near-dup drop   (dedup.minhash_lsh_candidates +
                                     connected components, keep cluster min)

Shape at 100 TB: the per-document stages are one pass of codegen
expressions (no shuffle until dedup); exact dedup is one shuffle on the
digest; near-dup is the banded LSH shuffle + the component propagation.
Every drop is attributed — the output keeps a ``drop_reason`` per rejected
document (audit table), matching how production pipelines report yield.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import textstats as ts

__all__ = ["build_training_corpus"]


def build_training_corpus(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    max_dup_line_fraction: float = 0.3,
    max_top_word_char_fraction: float = 0.2,
    near_dup_bands_required: int = 2,
    gopher_min_words: int = 50,
    scrub_pii: bool = True,
    near_dup: str = "minhash_lsh",
    simhash_max_hamming: int = 3,
) -> dict:
    """Returns ``{"corpus": DataFrame, "audit": DataFrame}`` — the surviving
    ``(id, clean_text, lang)`` rows and one ``(id, drop_reason)`` row per
    rejected document (first failing stage wins, in pipeline order).

    ``near_dup`` selects the candidate-pair family feeding the
    connected-components drop: ``"minhash_lsh"`` (banded MinHash — the
    production default; hash-randomized) or ``"simhash"`` (16-bit SimHash
    via the pigeonhole band index — fully deterministic, so an external SQL
    oracle can restate the whole composition end-to-end)."""
    cleaned = ts.c4_line_filter(
        documents.select(id_col, text_col), text_col, out_col="clean_text"
    )
    gated = ts.gopher_quality_filter(
        cleaned, "clean_text", min_words=gopher_min_words
    )
    # repetition_stats is pure per-row array expressions and PRESERVES its
    # input columns (r6) — no join-back needed; the whole cleaning ladder
    # through language ID is one shuffle-free codegen pass
    rep = ts.repetition_stats(
        gated.select(id_col, F.col("clean_text").alias("text_kept"),
                     "gopher_pass"),
        "text_kept", id_col,
    )
    langed = ts.lang_id(rep, "text_kept")

    staged = langed.select(
        F.col(id_col).alias("id"),
        F.col("text_kept"),
        F.col("lang_pred"),
        # language first (the usual pipeline order: cheap language ID gates
        # before quality heuristics tuned per language)
        F.when(~F.col("lang_pred").isin(*languages), F.lit("language"))
        .when(~F.col("gopher_pass"), F.lit("gopher_quality"))
        .when(F.col("dup_line_fraction") > max_dup_line_fraction, F.lit("dup_lines"))
        .when(F.col("top_word_char_fraction") > max_top_word_char_fraction,
              F.lit("word_spam"))
        .alias("drop_reason"),
    )
    # materialize before the iterative stages: connected components runs
    # multiple actions, and each would otherwise re-execute (and Catalyst
    # re-analyze) the whole cleaning lineage per iteration — persist the
    # survivor set once, like any iterative algorithm over a derived table
    staged = staged.localCheckpoint()
    survivors = staged.filter(F.col("drop_reason").isNull())

    # exact dedup: keep the smallest id per digest
    digested = survivors.withColumn("_digest", F.md5(F.col("text_kept")))
    canon = digested.groupBy("_digest").agg(F.min("id").alias("_keep"))
    exact = digested.join(canon, "_digest")
    exact_kept = exact.filter(F.col("id") == F.col("_keep")).drop("_digest", "_keep")
    exact_dropped = exact.filter(F.col("id") != F.col("_keep")).select(
        "id", F.lit("exact_dup").alias("drop_reason")
    )

    # near-dup: candidates form clusters; each cluster keeps its minimum id
    if near_dup == "simhash":
        hashes = dd.simhash16(exact_kept, "text_kept", "id")
        pairs = dd.simhash_near_dup_pairs(
            hashes, max_hamming=simhash_max_hamming, id_col="id",
            hash_col="simhash",
        ).select("id_a", "id_b")
    elif near_dup == "minhash_lsh":
        pairs = dd.minhash_lsh_candidates(
            exact_kept, "text_kept", "id"
        ).filter(F.col("n_bands_matched") >= near_dup_bands_required)
    else:
        raise ValueError(f"unknown near_dup strategy: {near_dup!r}")
    comps = dd.connected_components(
        exact_kept.select("id"), pairs.select("id_a", "id_b"), id_col="id"
    )
    near = exact_kept.join(comps, exact_kept["id"] == comps["id"], "left").drop(
        comps["id"]
    )
    corpus = near.filter(
        F.col("component").isNull() | (F.col("id") == F.col("component"))
    ).select("id", F.col("text_kept").alias("clean_text"),
             F.col("lang_pred").alias("lang"))
    if scrub_pii:
        # final scrub on survivors only (the standard order: cheap filters
        # shrink the corpus before the regex-heavy redaction pass)
        corpus = ts.redact_pii(corpus, "clean_text", out_col="_red").drop(
            "clean_text"
        ).withColumnRenamed("_red", "clean_text").select(
            "id", "clean_text", "lang",
            "pii_email_count", "pii_ip_count", "pii_phone_count",
        )
    near_dropped = near.filter(
        F.col("component").isNotNull() & (F.col("id") != F.col("component"))
    ).select("id", F.lit("near_dup").alias("drop_reason"))

    audit = (
        staged.filter(F.col("drop_reason").isNotNull()).select("id", "drop_reason")
        .unionByName(exact_dropped)
        .unionByName(near_dropped)
    )
    return {"corpus": corpus, "audit": audit}
