"""LAION/DataComp-style image-text pair construction over archived HTML
pages + image captures.

The reference indexes pages and images as independent capture documents
(``HTMLAnalyser.java:110-217`` emits ``links_images``;
``FaceDetectionAnalyser``/``ImageAnalyser`` fields describe the image side)
— it never JOINS the two.  Building multimodal training data needs exactly
that join: every ``<img>`` occurrence on a fetched page, its surrounding
caption text (``alt``/``title`` attributes — the LAION-400M/5B recipe),
matched to the archived image capture for that URL, then gated by the
published pair-quality filters (caption length, image dimensions, aspect
ratio) and an embedding-similarity (CLIP-score-style) cut.

Spark-first design, 100 TB shape:

- ``extract_image_captions`` is ONE Arrow batch pass per page (same
  deadline + scan-cost discipline as :mod:`.links`), emitting an array of
  candidate structs — no shuffle; the caller explodes.
- ``build_image_text_pairs`` is the one shuffle: a plain equi-join of the
  exploded candidate set against the image-capture table on the resolved
  image URL.  Both sides are big at crawl scale so this is a shuffle join
  on purpose (broadcast would not survive 100 TB); hot images (one logo
  referenced by millions of pages) are classic join skew — AQE's skew-join
  split handles it, and `salt` on the candidate side stays available via
  ``frontier.salted_repartition``.
- ``filter_image_text_pairs`` and ``clip_score_filter`` are pure codegen
  column expressions (per-rule audit flags, Gopher-gate style) — they run
  inside whole-stage codegen, prune at the scan when pushed ahead of the
  join, and never touch Python.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.markup import PARSE_TIMEOUT_S, Deadline, markup_scan_guard
from .links import LINKS_MAX_CHARS, _ATTR, _COMMENTS, _SCRIPT_STYLE, _resolve

__all__ = [
    "extract_image_captions",
    "build_image_text_pairs",
    "filter_image_text_pairs",
    "clip_score_filter",
    "assign_aspect_buckets",
    "SDXL_ASPECT_BUCKETS",
]

_IMG_TAG = re.compile(r"<img\b[^>]*>", re.I | re.S)
_SRC = re.compile(r"\bsrc" + _ATTR, re.I | re.S)
_ALT = re.compile(r"\balt" + _ATTR, re.I | re.S)
_TITLE = re.compile(r"\btitle" + _ATTR, re.I | re.S)
_WIDTH = re.compile(r"\bwidth" + _ATTR, re.I | re.S)
_HEIGHT = re.compile(r"\bheight" + _ATTR, re.I | re.S)
_WS = re.compile(r"\s+")

CANDIDATE_STRUCT = StructType(
    [
        StructField("img_url", StringType()),
        StructField("alt_text", StringType()),
        StructField("title_text", StringType()),
        StructField("attr_width", IntegerType()),
        StructField("attr_height", IntegerType()),
    ]
)

_OUT_STRUCT = StructType(
    [
        StructField("candidates", ArrayType(CANDIDATE_STRUCT)),
        StructField("pairs_parse_error", StringType()),
    ]
)


def _attr(pattern: re.Pattern, tag: str) -> str | None:
    m = pattern.search(tag)
    if m is None:
        return None
    return next(g for g in m.groups() if g is not None)


def _clean_text(raw: str | None) -> str | None:
    """Entity-decode and whitespace-normalize an alt/title value; None when
    the attribute is absent (distinct from present-but-empty ``alt=""``,
    which decorative images carry deliberately)."""
    if raw is None:
        return None
    return _WS.sub(" ", _htmllib.unescape(raw)).strip()


def _int_attr(pattern: re.Pattern, tag: str) -> int | None:
    v = _attr(pattern, tag)
    if v is None:
        return None
    v = v.strip().removesuffix("px")
    return int(v) if v.isdigit() else None


def _extract_page(base_url: str, page: str, deadline: Deadline) -> list[dict]:
    markup_scan_guard(page)
    cleaned = _SCRIPT_STYLE.sub(" ", _COMMENTS.sub(" ", page))
    deadline.check()
    out: list[dict] = []
    for m in _IMG_TAG.finditer(cleaned):
        tag = m.group(0)
        src = _attr(_SRC, tag)
        if not src:
            continue
        resolved = _resolve(base_url, src.strip())
        if not resolved:
            continue
        out.append(
            {
                "img_url": resolved,
                "alt_text": _clean_text(_attr(_ALT, tag)),
                "title_text": _clean_text(_attr(_TITLE, tag)),
                "attr_width": _int_attr(_WIDTH, tag),
                "attr_height": _int_attr(_HEIGHT, tag),
            }
        )
        deadline.check()
    return out


def extract_image_captions(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "payload",
    max_chars: int = LINKS_MAX_CHARS,
    timeout_s: float = PARSE_TIMEOUT_S,
) -> DataFrame:
    """Append ``candidates`` (array of ``(img_url, alt_text, title_text,
    attr_width, attr_height)`` structs, document order, duplicates kept —
    each occurrence is a distinct training pair) and ``pairs_parse_error``
    to ``df``.  One Arrow pass, no shuffle; per-record recovery mirrors
    :func:`.links.extract_html_links` (bad markup yields an empty array +
    error message, never a task failure)."""

    @F.pandas_udf(_OUT_STRUCT)
    def kernel(urls: pd.Series, pages: pd.Series) -> pd.DataFrame:
        rows = []
        for u, h in zip(urls, pages):
            if h is None:
                rows.append({"candidates": [], "pairs_parse_error": None})
                continue
            try:
                rows.append(
                    {
                        "candidates": _extract_page(
                            u or "", h[:max_chars], Deadline(timeout_s)
                        ),
                        "pairs_parse_error": None,
                    }
                )
            except Exception as exc:  # per-record recovery
                rows.append(
                    {
                        "candidates": [],
                        "pairs_parse_error": f"{type(exc).__name__}: {exc}"[:500],
                    }
                )
        return pd.DataFrame(rows, columns=["candidates", "pairs_parse_error"])

    out = df.withColumn("_it", kernel(F.col(url_col), F.col(html_col)))
    return (
        out.withColumn("candidates", F.col("_it.candidates"))
        .withColumn("pairs_parse_error", F.col("_it.pairs_parse_error"))
        .drop("_it")
    )


def build_image_text_pairs(
    pages: DataFrame,
    images: DataFrame,
    page_url_col: str = "url",
    html_col: str = "payload",
    image_url_col: str = "url",
    how: str = "inner",
    page_cols: list[str] | None = None,
) -> DataFrame:
    """Explode extracted candidates and join them to the image-capture table
    on the resolved image URL.  Output: one row per (page, img occurrence)
    that matched a capture, carrying ``page_url``, the candidate fields, and
    every non-URL column of ``images``.

    ``how='left'`` keeps unmatched candidates (image never crawled) with
    NULL capture columns — the frontier-feedback shape: those URLs are
    exactly what the next crawl epoch should fetch."""
    # explode_outer + explicit null filter, NOT plain explode: for a non-outer
    # generate Catalyst infers a `size(candidates) > 0` filter and pushes it
    # BELOW the generate, where it re-evaluates the extraction UDF — doubling
    # the Arrow kernel cost.  The outer variant infers nothing; the filter on
    # the generator output can't sink, so the plan keeps ONE ArrowEvalPython
    # (pinned by test_plan_quality).
    keep = list(page_cols or [])
    cand = (
        extract_image_captions(pages, page_url_col, html_col)
        .select(
            F.col(page_url_col).alias("page_url"),
            *keep,
            F.explode_outer("candidates").alias("c"),
        )
        .filter(F.col("c").isNotNull())
        .select("page_url", *keep, "c.*")
    )
    img_side = images.withColumnRenamed(image_url_col, "img_url")
    return cand.join(img_side, "img_url", how)


def filter_image_text_pairs(
    pairs: DataFrame,
    caption_col: str = "alt_text",
    width_col: str = "image_width",
    height_col: str = "image_height",
    min_caption_chars: int = 5,
    max_caption_chars: int = 1000,
    min_dim: int = 64,
    max_aspect: float = 3.0,
) -> DataFrame:
    """LAION-style pair gates as pure codegen audit flags (published
    criteria: drop short/absent captions, tiny images, and extreme aspect
    ratios) plus the conjunction ``pair_keep``.  Caption falls back to
    ``title_text`` when ``alt`` is absent (LAION uses alt only; DataComp
    keeps title as a secondary caption source — we record which).

    Flags are *audit* columns — nothing is dropped here, so downstream
    ablations can recompute the corpus under different gates without
    re-running extraction (the Gopher-gate pattern of
    :mod:`.textstats`)."""
    caption = F.coalesce(F.col(caption_col), F.col("title_text"))
    w, h = F.col(width_col).cast("double"), F.col(height_col).cast("double")
    aspect = F.greatest(w, h) / F.least(w, h)
    flags = {
        "caption_source": F.when(F.col(caption_col).isNotNull(), "alt")
        .when(F.col("title_text").isNotNull(), "title")
        .otherwise(F.lit(None).cast("string")),
        "flag_caption_length": (F.length(caption) >= min_caption_chars)
        & (F.length(caption) <= max_caption_chars),
        "flag_min_dim": (w >= min_dim) & (h >= min_dim),
        "flag_aspect": aspect <= max_aspect,
    }
    out = pairs
    for name, col in flags.items():
        out = out.withColumn(name, col)
    keep = (
        F.coalesce(F.col("flag_caption_length"), F.lit(False))
        & F.coalesce(F.col("flag_min_dim"), F.lit(False))
        & F.coalesce(F.col("flag_aspect"), F.lit(False))
    )
    return out.withColumn("pair_caption", caption).withColumn("pair_keep", keep)


def clip_score_filter(
    pairs: DataFrame,
    img_vec_col: str,
    txt_vec_col: str,
    threshold: float = 0.28,
    score_col: str = "clip_score",
) -> DataFrame:
    """Embedding-similarity pair gate (the CLIP-score cut of LAION: keep
    pairs whose image/text embedding cosine ≥ 0.28).  Pure codegen array
    arithmetic — ``F.zip_with`` dot products inside whole-stage codegen, no
    Python, no shuffle; embedding *production* is a model-inference concern
    upstream (stub it, or use any embedding column — the gate only assumes
    two ``array<float/double>`` columns)."""

    def dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    iv = F.transform(F.col(img_vec_col), lambda x: x.cast("double"))
    tv = F.transform(F.col(txt_vec_col), lambda x: x.cast("double"))
    score = dot(iv, tv) / (F.sqrt(dot(iv, iv)) * F.sqrt(dot(tv, tv)))
    out = pairs.withColumn(score_col, score)
    return out.withColumn("flag_clip_score", F.col(score_col) >= threshold)


#: the published SDXL multi-aspect training ladder (≈1024² px per bucket) —
#: any (w, h) ladder works; this is the de-facto default for image models
SDXL_ASPECT_BUCKETS = [
    (640, 1536), (768, 1344), (832, 1216), (896, 1152), (1024, 1024),
    (1152, 896), (1216, 832), (1344, 768), (1536, 640),
]


def assign_aspect_buckets(
    df: DataFrame,
    width_col: str = "image_width",
    height_col: str = "image_height",
    buckets: list[tuple[int, int]] = SDXL_ASPECT_BUCKETS,
) -> DataFrame:
    """Multi-aspect batch bucketing (the SDXL recipe): assign every image to
    the ladder bucket whose log-aspect-ratio is nearest, so training batches
    group images of one shape and crop loss is minimized.  Appends
    ``aspect_bucket_id``/``bucket_w``/``bucket_h``.  Pure codegen — an
    ``array_min`` over (|Δlog ar|, idx) structs, ties to the lower index;
    no shuffle (the later group-by-bucket batch build is the caller's
    shuffle, keyed by a ~10-value column that AQE coalesces)."""
    import math

    ar = F.log(F.col(width_col).cast("double") / F.col(height_col).cast("double"))
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    F.abs(ar - math.log(w / h)).alias("d"),
                    F.lit(i).alias("i"),
                )
                for i, (w, h) in enumerate(buckets)
            ]
        )
    )
    wmap = F.array(*[F.lit(w) for w, _ in buckets])
    hmap = F.array(*[F.lit(h) for _, h in buckets])
    out = df.withColumn("aspect_bucket_id", best["i"])
    return out.withColumn(
        "bucket_w", F.element_at(wmap, F.col("aspect_bucket_id") + 1)
    ).withColumn("bucket_h", F.element_at(hmap, F.col("aspect_bucket_id") + 1))
