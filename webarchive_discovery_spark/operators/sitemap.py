"""Sitemap discovery: robots ``Sitemap:`` directives + sitemap XML → frontier.

The reference's crawl ecosystem (Heritrix feeding warc-indexer) consumes
sitemaps as a seed/discovery channel alongside robots.txt; warc-indexer
itself spots ``robots.txt`` captures by path (``WARCIndexer.java:603-606``)
and leaves sitemap consumption to the crawler.  This engine closes that loop
in-cluster, the same way ``frontier.parse_robots_txt`` does for politeness
rules: fetched sitemap payloads are parsed into URL entries that feed the
next epoch's discovery frontier with protocol-derived priorities.

Everything here is pure codegen (split + posexplode + regexp extraction —
no UDF): the sitemaps.org protocol is a four-field flat schema, not general
XML, so the same bounded-regex strategy the WET/Solr-XML sinks use applies.
At 100 TB scale this is one narrow projection per capture and one explode
whose fan-out is the sitemap's own entry count (the protocol caps a file at
50k entries), with no shuffle at all until the caller joins the result into
the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "robots_sitemap_directives",
    "parse_sitemaps",
    "sitemap_frontier",
    "CHANGEFREQ_RANK",
]

# sitemaps.org <changefreq> values → crawl-priority affinity in [0, 1].
# "always" means revisit every fetch; "never" still gets a nonzero floor
# (the protocol says crawlers may still check for removal).
CHANGEFREQ_RANK: dict[str, float] = {
    "always": 1.0,
    "hourly": 0.9,
    "daily": 0.8,
    "weekly": 0.6,
    "monthly": 0.4,
    "yearly": 0.2,
    "never": 0.05,
}

_VALID_FREQS = list(CHANGEFREQ_RANK)


def _xml_unescape(col):
    """Decode the five XML entities (sitemaps.org §escaping) — &amp; last so
    double-escapes like ``&amp;lt;`` decode one level only, matching a real
    XML parser."""
    out = F.regexp_replace(col, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&apos;", "'")
    return F.regexp_replace(out, "&amp;", "&")


def robots_sitemap_directives(
    captures: DataFrame,
    host_col: str = "host",
    payload_col: str = "payload",
    url_type_col: str = "url_type",
) -> DataFrame:
    """Extract ``Sitemap:`` directives from robots.txt captures.

    Per RFC 9309 §2.2.4 the Sitemap line is *not* scoped to a User-agent
    group — it applies file-wide, so no section window is needed (unlike
    ``parse_robots_txt``): one explode + one regexp per line.
    Returns ``(host, sitemap_url)`` distinct rows."""
    robots = captures.filter(F.col(url_type_col) == "robots.txt").select(
        F.col(host_col).alias("host"), F.col(payload_col).alias("_txt")
    )
    lines = robots.select(
        "host",
        F.explode(F.split(F.col("_txt"), "\r?\n")).alias("line"),
    )
    # strip comments, then match the directive case-insensitively
    clean = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    url = F.trim(F.regexp_extract(clean, r"(?i)^sitemap\s*:\s*(\S+)\s*$", 1))
    return (
        lines.select("host", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def parse_sitemaps(
    captures: DataFrame,
    host_col: str = "host",
    payload_col: str = "payload",
    url_type_col: str = "url_type",
    url_type: str = "sitemap.xml",
) -> DataFrame:
    """Parse sitemap XML captures (sitemaps.org protocol) into entry rows.

    Handles both document kinds in one pass: ``<urlset>`` URL entries and
    ``<sitemapindex>`` child-sitemap entries (kind column distinguishes
    them, so the caller can feed ``kind='sitemap'`` rows back into the fetch
    frontier to crawl the index's children).  Namespace prefixes
    (``<sm:loc>``), tag attributes, CDATA-free entity escaping, and
    surrounding whitespace are tolerated; malformed entries (no ``<loc>``)
    are dropped rather than failing the file — the same per-record-recovery
    stance as the WARC reader.

    Returns ``(host, kind, loc, lastmod, lastmod_date, changefreq,
    priority)``:

    - ``kind``: ``'url'`` (urlset entry) or ``'sitemap'`` (index entry)
    - ``loc``: entity-decoded, trimmed URL (the protocol's only required
      field)
    - ``lastmod``: raw W3C-datetime string as published; ``lastmod_date``
      its date part (``try``-cast — bad values become NULL, not errors)
    - ``changefreq``: lowercased, validated against the protocol's seven
      values (invalid → NULL)
    - ``priority``: double, protocol default 0.5 when absent/unparseable,
      clamped to the protocol's [0.0, 1.0] range

    Plan: filter → split on entry close-tags → posexplode → regexps.  Zero
    shuffles, zero UDFs; fan-out bounded by the protocol's 50k-entries cap.
    """
    maps = captures.filter(F.col(url_type_col) == url_type).select(
        F.col(host_col).alias("host"), F.col(payload_col).alias("_xml")
    )
    # one chunk per entry: everything before each </url> / </sitemap>
    chunks = maps.select(
        "host",
        F.posexplode(
            F.split(F.col("_xml"), r"</(?:\w+:)?(?:url|sitemap)\s*>")
        ).alias("pos", "chunk"),
    )
    kind = F.regexp_extract(
        F.col("chunk"), r"<(?:\w+:)?(url|sitemap)(?:\s[^>]*)?>", 1
    )
    # fields live after the entry's opening tag; (?s) so values may wrap
    body = F.regexp_extract(
        F.col("chunk"), r"(?s)<(?:\w+:)?(?:url|sitemap)(?:\s[^>]*)?>(.*)$", 1
    )
    loc = F.trim(
        _xml_unescape(
            F.regexp_extract(body, r"(?s)<(?:\w+:)?loc[^>]*>\s*(.*?)\s*</(?:\w+:)?loc\s*>", 1)
        )
    )
    lastmod = F.trim(
        F.regexp_extract(body, r"(?s)<(?:\w+:)?lastmod[^>]*>\s*(.*?)\s*</(?:\w+:)?lastmod\s*>", 1)
    )
    changefreq = F.lower(
        F.trim(
            F.regexp_extract(
                body, r"(?s)<(?:\w+:)?changefreq[^>]*>\s*(.*?)\s*</(?:\w+:)?changefreq\s*>", 1
            )
        )
    )
    priority = F.trim(
        F.regexp_extract(body, r"(?s)<(?:\w+:)?priority[^>]*>\s*(.*?)\s*</(?:\w+:)?priority\s*>", 1)
    )
    out = chunks.select(
        "host",
        kind.alias("kind"),
        loc.alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
        F.when(changefreq.isin(_VALID_FREQS), changefreq).alias("changefreq"),
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.coalesce(priority.try_cast("double"), F.lit(0.5)),
            ),
        ).alias("priority"),
    ).filter((F.col("kind") != "") & (F.col("loc") != ""))
    # date part of the W3C datetime (YYYY-MM-DD prefix); try-semantics
    return out.withColumn(
        "lastmod_date", F.substring(F.col("lastmod"), 1, 10).try_cast("date")
    ).select("host", "kind", "loc", "lastmod", "lastmod_date", "changefreq", "priority")


def sitemap_frontier(
    entries: DataFrame,
    as_of_date=None,
    freshness_half_life_days: float = 30.0,
) -> DataFrame:
    """Score sitemap URL entries into frontier discovery rows.

    ``crawl_priority`` in [0, 1] blends the publisher's declared priority
    (weight 0.5), the changefreq affinity (0.3, :data:`CHANGEFREQ_RANK`,
    absent → 0.5), and a lastmod freshness decay (0.2, half-life
    ``freshness_half_life_days``, absent → 0.5) — all pure codegen, so the
    score participates in whole-stage codegen next to the canonicalization
    kernel when the caller unions these rows into the frontier.

    Returns ``(url, host, crawl_priority)`` for ``kind='url'`` rows.
    ``as_of_date`` (a date/column/literal string) anchors the freshness
    decay; pass the crawl epoch's date for deterministic replays — it
    defaults to the max lastmod_date in scope via a window-free self-agg
    only when None, costing one tiny extra aggregate."""
    urls = entries.filter(F.col("kind") == "url")
    if as_of_date is None:
        anchor = urls.agg(F.max("lastmod_date").alias("_anchor"))
        urls = urls.crossJoin(F.broadcast(anchor))  # 1-row scalar broadcast
        anchor_col = F.col("_anchor")
    else:
        anchor_col = F.lit(as_of_date).cast("date")
    freq_rank = F.lit(None).cast("double")
    for name, rank in CHANGEFREQ_RANK.items():
        freq_rank = F.when(F.col("changefreq") == name, F.lit(rank)).otherwise(freq_rank)
    age_days = F.datediff(anchor_col, F.col("lastmod_date")).cast("double")
    freshness = F.when(
        age_days.isNotNull(),
        F.pow(F.lit(0.5), F.greatest(age_days, F.lit(0.0)) / F.lit(freshness_half_life_days)),
    ).otherwise(F.lit(0.5))
    score = (
        F.col("priority") * 0.5
        + F.coalesce(freq_rank, F.lit(0.5)) * 0.3
        + freshness * 0.2
    )
    return urls.select(
        F.col("loc").alias("url"),
        "host",
        F.round(score, 6).alias("crawl_priority"),
    )
