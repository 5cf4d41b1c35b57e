"""Main-content extraction (boilerplate removal) over HTML payloads.

The training-pipeline step between raw text extraction and the quality
gates: navigation, link farms, footers and chrome are dropped so the corpus
keeps article text.  Implements the published boilerpipe/Arc90 family
heuristic in its simplest deterministic form:

1. split the (comment/script/style-stripped) markup into BLOCKS at
   block-level element boundaries (p, div, section, article, li, td, h1-h6,
   header, footer, nav, aside, ul, ol, table, blockquote);
2. per block, measure words and ANCHOR-TEXT words (text inside <a> spans);
3. keep blocks with at least ``min_words`` words and link density
   (anchor words / words) at most ``max_link_density``;
4. the document's main content is the kept blocks' text joined by newlines.

One Arrow-batched kernel (the links/metadata idiom) guarded by the same
scan-cost + deadline discipline (``functions/markup.py``); per-record
failures yield a null text + ``boilerplate_parse_error``.  Counts are
emitted for auditability (blocks seen/kept, words dropped).
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..functions.markup import PARSE_TIMEOUT_S, Deadline, markup_scan_guard

__all__ = ["extract_main_content", "BOILERPLATE_STRUCT"]

_COMMENTS = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_BLOCK_SPLIT = re.compile(
    r"</?(?:p|div|section|article|li|td|h[1-6]|header|footer|nav|aside|ul|ol|"
    r"table|blockquote)\b[^>]*>",
    re.I,
)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

BOILERPLATE_STRUCT = StructType([
    StructField("main_text", StringType()),
    StructField("blocks_total", IntegerType()),
    StructField("blocks_kept", IntegerType()),
    StructField("words_total", IntegerType()),
    StructField("words_kept", IntegerType()),
    StructField("boilerplate_parse_error", StringType()),
])


def _clean(fragment: str) -> str:
    return _WS.sub(" ", html_mod.unescape(_TAG.sub(" ", fragment))).strip()


def _extract_one(html: str, min_words: int, max_link_density: float,
                 deadline: Deadline) -> dict:
    markup_scan_guard(html)
    cleaned = _SCRIPT_STYLE.sub(" ", _COMMENTS.sub(" ", html))
    deadline.check()
    blocks = _BLOCK_SPLIT.split(cleaned)
    kept: list[str] = []
    total_blocks = 0
    words_total = 0
    words_kept = 0
    for i, raw in enumerate(blocks):
        if i % 256 == 0:
            deadline.check()
        anchor_words = sum(len(_clean(m.group(1)).split())
                           for m in _ANCHOR.finditer(raw))
        text = _clean(raw)
        if not text:
            continue
        words = len(text.split())
        total_blocks += 1
        words_total += words
        density = anchor_words / words if words else 1.0
        if words >= min_words and density <= max_link_density:
            kept.append(text)
            words_kept += words
    return {
        "main_text": "\n".join(kept) if kept else None,
        "blocks_total": total_blocks,
        "blocks_kept": len(kept),
        "words_total": words_total,
        "words_kept": words_kept,
        "boilerplate_parse_error": None,
    }


def extract_main_content(
    df: DataFrame,
    html_col: str = "payload",
    min_words: int = 10,
    max_link_density: float = 0.33,
    max_chars: int = 1 << 20,
    timeout_s: float = PARSE_TIMEOUT_S,
) -> DataFrame:
    """Append ``main_text`` + block/word audit counters; one Arrow pass, no
    shuffle, per-record failure recovery (``boilerplate_parse_error``)."""

    @F.pandas_udf(BOILERPLATE_STRUCT)
    def kernel(htmls: pd.Series) -> pd.DataFrame:
        rows = []
        for h in htmls:
            if h is None:
                rows.append({f.name: None for f in BOILERPLATE_STRUCT.fields})
                continue
            try:
                rows.append(_extract_one(h[:max_chars], min_words,
                                         max_link_density, Deadline(timeout_s)))
            except Exception as exc:
                rec = {f.name: None for f in BOILERPLATE_STRUCT.fields}
                rec["boilerplate_parse_error"] = f"{type(exc).__name__}: {exc}"[:500]
                rows.append(rec)
        return pd.DataFrame(rows, columns=[f.name for f in BOILERPLATE_STRUCT.fields])

    out = df.withColumn("_bp", kernel(F.col(html_col)))
    for f in BOILERPLATE_STRUCT.fields:
        out = out.withColumn(f.name, F.col(f"_bp.{f.name}"))
    return out.drop("_bp")
