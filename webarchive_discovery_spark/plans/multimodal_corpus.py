"""Composed multimodal (image-text) training-corpus pipeline — the image-
axis counterpart of :mod:`.training`'s text pipeline.

LAION/DataComp assembly line over archived pages + image captures:
extract ``<img>`` caption candidates → join to captures → caption/dimension
/aspect gates → CLIP-score-style embedding cut → exact perceptual-hash
image dedup (first occurrence wins) — every drop attributed with a reason
so corpus ablations can be recomputed without re-running extraction.

100 TB shape: one Arrow pass (extraction), one big equi-join (candidates ×
captures), pure-codegen gates, an optional broadcast join for the
embedding cut, and ONE additional shuffle for the phash dedup window
(keyed by phash — perceptual-hash buckets are tiny, no skew beyond true
duplicate explosions, which is exactly the data the dedup removes).
Drop-reason precedence is fixed (caption → dims → aspect → clip →
dup_image) and the dedup exemplar choice is deterministic
(page_url, img_url order), so output is identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.imagetext import (
    build_image_text_pairs,
    clip_score_filter,
    filter_image_text_pairs,
)

__all__ = ["build_multimodal_corpus"]


def build_multimodal_corpus(
    pages: DataFrame,
    images: DataFrame,
    pair_embeddings: DataFrame | None = None,
    emb_id_col: str = "doc_id",
    phash_col: str = "phash",
    min_caption_chars: int = 5,
    max_caption_chars: int = 1000,
    min_dim: int = 64,
    max_aspect: float = 3.0,
    clip_threshold: float = 0.28,
    broadcast_embeddings: bool = True,
) -> DataFrame:
    """Run the full pair pipeline and attribute every drop.

    ``images`` must carry ``image_width``/``image_height`` and (for the
    dedup stage) ``phash_col``; ``pair_embeddings`` is an optional
    ``(emb_id_col, img_vec, txt_vec)`` table — when absent the CLIP stage
    is skipped (columns still emitted as NULL so the output schema is
    stable).  Output: one row per candidate pair with audit flags,
    ``drop_reason`` (NULL = kept) and ``corpus_keep``."""
    pairs = build_image_text_pairs(
        pages, images, page_cols=[emb_id_col] if pair_embeddings is not None else []
    )
    flagged = filter_image_text_pairs(
        pairs,
        min_caption_chars=min_caption_chars,
        max_caption_chars=max_caption_chars,
        min_dim=min_dim,
        max_aspect=max_aspect,
    )
    if pair_embeddings is not None:
        b = F.broadcast if broadcast_embeddings else (lambda d: d)
        flagged = clip_score_filter(
            flagged.join(b(pair_embeddings), emb_id_col, "left"),
            "img_vec",
            "txt_vec",
            threshold=clip_threshold,
        ).drop("img_vec", "txt_vec")
    else:
        flagged = flagged.withColumn(
            "clip_score", F.lit(None).cast("double")
        ).withColumn("flag_clip_score", F.lit(None).cast("boolean"))

    gate_ok = (
        F.col("flag_caption_length")
        & F.col("flag_min_dim")
        & F.col("flag_aspect")
        & F.coalesce(F.col("flag_clip_score"), F.lit(True))
    )
    # exact perceptual-hash dedup among gate survivors only: failed pairs
    # must not claim an exemplar slot (their drop_reason is the gate),
    # and the exemplar choice is the deterministic (page_url, img_url) min
    ranked = flagged.withColumn(
        "_dup_rank",
        F.when(gate_ok, F.row_number().over(
            Window.partitionBy(phash_col, gate_ok.cast("int"))
            .orderBy("page_url", "img_url")
        )),
    )
    reason = (
        F.when(~F.coalesce("flag_caption_length", F.lit(False)), "caption")
        .when(~F.coalesce("flag_min_dim", F.lit(False)), "min_dim")
        .when(~F.coalesce("flag_aspect", F.lit(False)), "aspect")
        .when(~F.coalesce(F.col("flag_clip_score"), F.lit(True)), "clip_score")
        .when(F.col("_dup_rank") > 1, "dup_image")
    )
    return (
        ranked.withColumn("drop_reason", reason)
        .withColumn("corpus_keep", F.col("drop_reason").isNull())
        .drop("_dup_rank")
    )
