"""Config-driven field extraction from archive file names.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/analyser/payload/
ARCNameAnalyser.java:54-170`` — an ordered rule list, each rule a regex
``pattern`` plus ``{field: template}`` map; the FIRST rule whose pattern
matches the file name wins and processing stops (even for fields that rule
does not set), and each field value is ``matcher.replaceAll(template)`` over
the name (``$N`` group references).

Spark shape: pure codegen — one ``when`` ladder per output field over
``rlike`` guards and ``regexp_replace`` (whose ``$N`` semantics match Java's
``replaceAll`` exactly).  Rules are a tiny curated config, so folding them
into literal expressions (like the source_file_matches annotation scope) is
the right plan at any scale: no UDF, no join, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_arcname_rules"]


def apply_arcname_rules(
    df: DataFrame,
    rules: list[tuple[str, dict[str, str]]],
    name_col: str = "source_file",
) -> DataFrame:
    """Append one column per field named across ``rules``.

    ``rules`` is ordered ``[(pattern, {field: template}), ...]``; first
    matching pattern wins for ALL fields (``ARCNameAnalyser.java:123-133`` —
    processing stops after the first match, so a later rule never fills a
    field the winning rule left unset)."""
    fields: list[str] = []
    for _, templates in rules:
        for f in templates:
            if f not in fields:
                fields.append(f)
    name = F.col(name_col)
    out = df
    for f in fields:
        expr = None
        for pattern, templates in rules:
            val = (
                F.regexp_replace(name, pattern, templates[f])
                if f in templates
                else F.lit(None).cast("string")
            )
            cond = name.rlike(pattern)
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        out = out.withColumn(f, expr)
    return out
