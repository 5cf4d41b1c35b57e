"""Scoped, date-gated annotation application (collections / subjects /
access terms).

Reference: ``warc-indexer/src/main/java/uk/bl/wa/annotation/Annotator.java``
— four scopes (``Annotator.applyAnnotations``, :127-228):

- ``resource``  — exactly this URL
- ``root``      — every URL starting with this prefix
- ``subdomains`` — the annotation key's host equals the record's www-stripped
  host or is a subdomain of it (``Annotator.java:169-185``)
- ``source_file_matches`` — the record's source file matches a regex key

plus an open-access SURT prefix whitelist that stamps ``access_terms``
OA/RRO (``Annotator.java:216-227``).  ``collection``/``collections`` values
are gated by per-collection date ranges against the record's crawl date
(``updateCollections``, :235-288); subjects are not date-gated.

Spark shape: the annotation set is a small curated dimension (the reference
ships it via DistributedCache), so every scope is a BROADCAST equi-join with
the per-row refinement done by JVM higher-order functions over pre-grouped
payload arrays — no window, no nested-loop join, the capture side never
shuffles:

- resource: equi-join on the full URL;
- root: equi-join on the prefix's host, then ``startswith`` inside the
  matched array (same machinery as the robots longest-prefix matcher);
- subdomains: the key host is exploded into its label suffixes
  (``LinkExtractor.allLevels`` semantics) and equi-joined on the record's
  www-stripped host;
- source_file_matches: regex keys are collected driver-side (tiny config
  table, like the reference's cache file) and applied as literal rlike guards.

Annotations schema: ``(scope string, key string, collection string,
collections array<string>, subjects array<string>, date_from timestamp,
date_to timestamp)``.  Keys must be in canonical URL form (the engine
canonicalises captures' ``url_norm`` the same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_annotations", "load_annotations_json", "ANNOTATION_COLUMNS"]

ANNOTATION_COLUMNS = (
    "scope", "key", "collection", "collections", "subjects", "date_from", "date_to"
)


def _payload(extra: Column | None = None):
    fields = [
        F.col("key"), F.col("collection"), F.col("collections"),
        F.col("subjects"), F.col("date_from"), F.col("date_to"),
    ]
    return F.struct(*fields)


def _in_range(r: Column, date_col: Column) -> Column:
    return (
        (r["date_from"].isNull() | (date_col >= r["date_from"]))
        & (r["date_to"].isNull() | (date_col <= r["date_to"]))
    )


def apply_annotations(
    captures: DataFrame,
    annotations: DataFrame,
    open_access_surts: DataFrame | None = None,
    url_col: str = "url_norm",
    host_col: str = "host",
    date_col: str = "crawl_date",
    source_file_col: str = "source_file",
    surt_col: str | None = None,
) -> DataFrame:
    """Attach ``collection`` / ``collections`` / ``wct_subjects`` (sorted
    arrays) and, when ``open_access_surts(prefix)`` is given, ``access_terms``
    = OA/RRO based on ``surt_col`` prefix membership."""
    date = F.col(date_col)

    # resource scope: exact URL equi-join
    res = (
        annotations.filter(F.col("scope") == "resource")
        .groupBy(F.col("key").alias("_a_url"))
        .agg(F.collect_list(_payload()).alias("_res"))
    )
    out = captures.join(
        F.broadcast(res), F.col(url_col) == F.col("_a_url"), "left"
    ).drop("_a_url")

    # root scope: equi-join on the prefix's host, startswith refinement
    root = (
        annotations.filter(F.col("scope") == "root")
        .groupBy(F.parse_url(F.col("key"), F.lit("HOST")).alias("_a_host"))
        .agg(F.collect_list(_payload()).alias("_root_all"))
    )
    out = out.join(
        F.broadcast(root), F.col(host_col) == F.col("_a_host"), "left"
    ).drop("_a_host")
    url = F.col(url_col)
    out = out.withColumn(
        "_root", F.filter(F.col("_root_all"), lambda r: url.startswith(r["key"]))
    ).drop("_root_all")

    # subdomains scope: key host (or bare-host key) exploded into label
    # suffixes, joined on the record's www-stripped host — annotation applies
    # when its host equals that domain or is a subdomain of it
    khost = F.coalesce(F.parse_url(F.col("key"), F.lit("HOST")), F.col("key"))
    labels = F.split(khost, r"\.")
    nlab = F.size(labels)
    levels = F.transform(
        F.sequence(F.lit(1), nlab),
        lambda i: F.array_join(F.slice(labels, nlab - i + 1, i), "."),
    )
    sub = (
        annotations.filter(F.col("scope") == "subdomains")
        .select(_payload().alias("_p"), F.explode(levels).alias("_a_domain"))
        .groupBy("_a_domain")
        .agg(F.collect_list("_p").alias("_sub"))
    )
    domain = F.regexp_replace(F.col(host_col), r"^www\.", "")
    out = out.join(
        F.broadcast(sub), domain == F.col("_a_domain"), "left"
    ).drop("_a_domain")

    # source_file_matches scope: tiny regex-keyed config, applied as literal
    # guards (collected once at plan build — a dim-table read, not data)
    sf_rows = annotations.filter(F.col("scope") == "source_file_matches").select(
        "key", "collection", "collections", "subjects", "date_from", "date_to"
    ).collect()
    sf_hits = []
    for r in sf_rows:
        lit_payload = F.struct(
            F.lit(r["key"]).alias("key"),
            F.lit(r["collection"]).cast("string").alias("collection"),
            (F.array(*[F.lit(c) for c in r["collections"]]) if r["collections"]
             else F.lit(None).cast("array<string>")).alias("collections"),
            (F.array(*[F.lit(s) for s in r["subjects"]]) if r["subjects"]
             else F.lit(None).cast("array<string>")).alias("subjects"),
            F.lit(r["date_from"]).cast("timestamp").alias("date_from"),
            F.lit(r["date_to"]).cast("timestamp").alias("date_to"),
        )
        sf_hits.append(
            F.when(F.col(source_file_col).rlike(r["key"]), lit_payload)
        )
    sf_arr = (
        F.filter(F.array(*sf_hits), lambda x: x.isNotNull())
        if sf_hits else F.lit(None).cast(
            "array<struct<key:string,collection:string,collections:array<string>,"
            "subjects:array<string>,date_from:timestamp,date_to:timestamp>>"
        )
    )

    matched = F.concat(
        *[F.coalesce(c, F.array()) for c in
          (F.col("_res"), F.col("_root"), F.col("_sub"), sf_arr)]
    )
    gated = F.filter(matched, lambda r: _in_range(r, date))
    out = (
        out.withColumn(
            "collection",
            F.array_sort(F.array_distinct(
                F.filter(F.transform(gated, lambda r: r["collection"]),
                         lambda c: c.isNotNull())
            )),
        )
        .withColumn(
            "collections",
            F.array_sort(F.array_distinct(F.flatten(
                F.filter(F.transform(gated, lambda r: r["collections"]),
                         lambda c: c.isNotNull())
            ))),
        )
        .withColumn(
            "wct_subjects",
            F.array_sort(F.array_distinct(F.flatten(
                F.filter(F.transform(matched, lambda r: r["subjects"]),
                         lambda s: s.isNotNull())
            ))),
        )
        .drop("_res", "_root", "_sub")
    )

    if open_access_surts is not None and surt_col is not None:
        oa = open_access_surts.agg(
            F.collect_list("prefix").alias("_oa_prefixes")
        )
        out = out.join(F.broadcast(oa))  # 1-row broadcast, no explosion
        key = F.col(surt_col)
        # array<string>, matching the multivalued SolrFields access_terms and
        # CAPTURE_SCHEMA (composing with extract_capture must not change the
        # declared column type)
        out = out.withColumn(
            "access_terms",
            F.array(
                F.when(
                    F.exists(F.col("_oa_prefixes"), lambda p: key.startswith(p)),
                    F.lit("OA"),
                ).otherwise(F.lit("RRO"))
            ),
        ).drop("_oa_prefixes")
    return out


def load_annotations_json(spark, path: str) -> DataFrame:
    """Load the reference's curated annotations JSON file
    (``Annotations.java:61-120``; fixture ``test-annotations.json``) into the
    ``ANNOTATION_COLUMNS`` shape.

    The file is a small curated config (the reference ships it whole via
    DistributedCache), so it is read driver-side.  Jackson's ALLOW_COMMENTS
    is mirrored by stripping ``/* */`` headers.  Per-collection date ranges
    (``collectionDateRanges``) gate each collection VALUE independently in
    the reference (``Annotator.updateCollections``, :235-288); that is
    decomposed here into one row per collection value carrying that value's
    own range, plus one ungated row carrying the (never date-gated) subjects
    — row-level gating in :func:`apply_annotations` then reproduces
    per-value gating exactly.  The ``plus1`` scope is loaded but never
    applied, faithfully to the reference (``Annotator.applyAnnotations``
    has no plus1 branch)."""
    import json as _json
    import re as _re

    from pyspark.sql.types import (
        ArrayType, StringType, StructField, StructType, TimestampType,
    )

    text = open(path, encoding="utf-8").read()
    data = _json.loads(_re.sub(r"^\s*/\*.*?\*/", "", text, flags=_re.S))
    ranges = {
        name: (r.get("start"), r.get("end"))
        for name, r in (data.get("collectionDateRanges") or {}).items()
    }

    def _ts(s):
        if s is None:
            return None
        from datetime import datetime

        return datetime.strptime(s.replace("+0000", "+00:00"),
                                 "%Y-%m-%dT%H:%M:%S.%f%z").replace(tzinfo=None)

    rows = []
    for scope, keys in (data.get("collections") or {}).items():
        for key, uc in (keys or {}).items():
            singular = uc.get("collection")
            subjects = uc.get("subject") or []
            values = uc.get("collections") or []
            for v in values:
                start, end = ranges.get(v, (None, None))
                rows.append((scope, key, v if v == singular else None, [v],
                             None, _ts(start), _ts(end)))
            if singular and singular not in values:
                start, end = ranges.get(singular, (None, None))
                rows.append((scope, key, singular, None, None,
                             _ts(start), _ts(end)))
            if subjects:
                rows.append((scope, key, None, None, list(subjects), None, None))

    schema = StructType([
        StructField("scope", StringType()),
        StructField("key", StringType()),
        StructField("collection", StringType()),
        StructField("collections", ArrayType(StringType())),
        StructField("subjects", ArrayType(StringType())),
        StructField("date_from", TimestampType()),
        StructField("date_to", TimestampType()),
    ])
    return spark.createDataFrame(rows, schema)
