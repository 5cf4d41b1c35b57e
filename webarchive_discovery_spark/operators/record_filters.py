"""Record filter chain + URL-type classification (SURVEY.md §2.3).

The reference applies these as short-circuit guards at the top of
``WARCIndexer.extract()`` before any expensive payload work:

- record-type allowlist — ``WARCIndexer.java:308-310`` (config
  ``reference.conf:90-92``: response/resource/revisit)
- protocol allowlist — ``WARCIndexer.java:850-857``
- URL exclusion regex — ``WARCIndexer.java:840-848``
- response-code prefix allowlist — ``WARCIndexer.java:859-875``
- ``url_type`` classification (slashpage / robots.txt / normal) —
  ``WARCIndexer.java:599-610``

Exact-count conformance fixtures (mirroring ``WARCIndexerTest.java:115-240``)
live in ``tests/test_filters.py``.  Every operator here is a pure Column
expression — whole-stage codegen, pushed to the scan by Catalyst when the
source supports it; filters FIRST in any pipeline so pruning happens before
shuffles (same motivation as the reference's short-circuit ordering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "record_type_filter",
    "protocol_filter",
    "url_exclude_filter",
    "response_code_filter",
    "url_type_expr",
    "with_url_type",
    "slashpage_only",
    "default_filter_chain",
    "url_quality",
    "URL_BAD_FRAGMENTS",
    "URL_MEDIA_EXTENSIONS",
]

DEFAULT_RECORD_TYPES = ("response", "resource", "revisit")
DEFAULT_PROTOCOLS = ("http", "https")
DEFAULT_STATUS_PREFIXES = ("2", "3")

URL_TYPE_SLASHPAGE = "slashpage"
URL_TYPE_ROBOTS_TXT = "robots.txt"
URL_TYPE_NORMAL = "normal"


def record_type_filter(
    df: DataFrame, col: str = "record_type",
    keep: tuple[str, ...] = DEFAULT_RECORD_TYPES,
) -> DataFrame:
    """Keep only the allowlisted WARC record types (``WARCIndexer.java:308-310``)."""
    return df.filter(F.col(col).isin(*keep))


def protocol_filter(
    df: DataFrame, url_col: str = "url",
    protocols: tuple[str, ...] = DEFAULT_PROTOCOLS,
) -> DataFrame:
    """Keep only allowlisted URL schemes (``WARCIndexer.java:850-857``)."""
    pattern = "^(" + "|".join(protocols) + ")://"
    return df.filter(F.col(url_col).rlike(pattern))


def url_exclude_filter(df: DataFrame, url_col: str = "url", pattern: str | None = None) -> DataFrame:
    """Drop URLs matching the exclusion regex (``WARCIndexer.java:840-848``);
    no-op when no pattern configured, like the reference default."""
    if not pattern:
        return df
    return df.filter(~F.col(url_col).rlike(pattern))


def response_code_filter(
    df: DataFrame, status_col: str = "status_code",
    prefixes: tuple[str, ...] = DEFAULT_STATUS_PREFIXES,
) -> DataFrame:
    """Keep responses whose status code starts with an allowed prefix
    (``WARCIndexer.java:859-875`` — the reference matches on the first
    character of the code).  An EMPTY prefix list disables the status
    filter entirely, like the reference's empty ``response_include``
    (golden: ``WARCIndexerTest.testResponseCodeFilters``, where [] indexes
    all 16 responses but ["2"] only 7)."""
    if not prefixes:
        return df
    cond = None
    s = F.col(status_col).cast("string")
    for p in prefixes:
        c = s.startswith(p)
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def url_type_expr(path_col: Column) -> Column:
    """``url_type`` when-ladder over a URL *path* (``WARCIndexer.java:599-610``):
    slashpage for ``/``, empty, or ``/index.<ext>``; robots.txt for exactly
    ``/robots.txt`` (case-insensitive); normal otherwise."""
    path = F.coalesce(path_col, F.lit(""))
    return (
        F.when(
            (path == "/") | (path == "") | path.rlike(r"^/index\.[a-z]+$"),
            F.lit(URL_TYPE_SLASHPAGE),
        )
        .when(F.lower(path) == "/robots.txt", F.lit(URL_TYPE_ROBOTS_TXT))
        .otherwise(F.lit(URL_TYPE_NORMAL))
    )


def with_url_type(
    df: DataFrame,
    url_col: str | None = "url",
    path_col: str | None = None,
    out_col: str = "url_type",
) -> DataFrame:
    """Attach ``url_type``; pass ``path_col`` when a parsed path column already
    exists (avoids re-parsing), else the URL is parsed JVM-side."""
    path = F.col(path_col) if path_col else F.parse_url(F.col(url_col), F.lit("PATH"))
    return df.withColumn(out_col, url_type_expr(path))


def slashpage_only(df: DataFrame, url_col: str = "url", path_col: str | None = None) -> DataFrame:
    """Keep only slash pages — the reference's homepage-harvest mode."""
    path = F.col(path_col) if path_col else F.parse_url(F.col(url_col), F.lit("PATH"))
    return df.filter(url_type_expr(path) == URL_TYPE_SLASHPAGE)


def default_filter_chain(
    df: DataFrame,
    record_type_col: str = "record_type",
    url_col: str = "url",
    status_col: str = "status_code",
    exclude_pattern: str | None = None,
) -> DataFrame:
    """The reference's stacked ``extract()`` guards in their short-circuit
    order: record type → protocol → URL exclusion → response code."""
    out = record_type_filter(df, record_type_col)
    out = protocol_filter(out, url_col)
    out = url_exclude_filter(out, url_col, exclude_pattern)
    return response_code_filter(out, status_col)


#: URL-level quality blocklist (the RefinedWeb/C4-style URL filter tier: a
#: conservative fragment list; production pipelines swap in a full curated
#: blocklist — the mechanics are identical)
URL_BAD_FRAGMENTS = [
    "casino", "viagra", "xxx", "porn", "lottery", "betting", "escort",
]

#: media/binary extensions a text pipeline skips at the URL tier (cheaper
#: than fetching + MIME-sniffing)
URL_MEDIA_EXTENSIONS = [
    "jpg", "jpeg", "png", "gif", "webp", "mp4", "mp3", "avi", "zip", "exe",
    "css", "js", "ico", "svg", "woff", "woff2",
]


def url_quality(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-tier quality filtering for a training-data pipeline (the
    RefinedWeb/C4 first gate — drop documents by URL alone, before any
    payload work): flags blocklist fragments, media/binary extensions,
    excessive query parameters, and digit-heavy paths; ``url_quality_ok``
    is the conjunction.  Pure codegen — at 100 TB this prunes the corpus at
    the scan, upstream of every payload stage."""
    url = F.lower(F.col(url_col))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    bad = None
    for frag in URL_BAD_FRAGMENTS:
        c = url.contains(frag)
        bad = c if bad is None else (bad | c)
    ext = F.regexp_extract(path, r"\.([a-z0-9]+)$", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    digits = F.length(F.regexp_replace(path, r"[^0-9]", ""))
    digit_ratio = F.when(F.length(path) > 0, digits / F.length(path)).otherwise(F.lit(0.0))
    out = df.select(
        "*",
        bad.alias("url_bad_word"),
        ext.isin(URL_MEDIA_EXTENSIONS).alias("url_media_ext"),
        n_params.cast("int").alias("url_param_count"),
        F.round(digit_ratio, 4).alias("url_digit_ratio"),
    )
    return out.withColumn(
        "url_quality_ok",
        ~F.col("url_bad_word") & ~F.col("url_media_ext")
        & (F.col("url_param_count") <= 4) & (F.col("url_digit_ratio") <= 0.5),
    )
