"""Named research datasets from a capture stream (the reference's
``WARCDatasetGenerator`` job).

Reference: ``warc-hadoop-indexer/src/main/java/uk/bl/wa/hadoop/datasets/
WARCDatasetGenerator.java:82-87,166-178`` registers the named outputs and
``WARCDatasetMapper.java:185-225`` emits, per successfully extracted capture:

- ``hosts__{year}``     → the capture's host
- ``formats__{year}``   → ``served \\t tika \\t droid`` content-type triple
  (``SolrRecord.getFormatResults``, ``SolrRecord.java:369-390``; absent
  values are empty strings, tabs always present)
- ``faces__{year}``     → one ``url \\t waybackDate \\t <matches>`` line per
  face *kind* (cat first, then human), matches sorted and space-joined
  (``SolrRecord.getFaces``/``gatherMatches``, ``SolrRecord.java:395-433``)
- ``hostLinks__{year}`` → one ``host \\t linked_host`` line per
  ``links_hosts`` value (``SolrRecord.getHostLinks``, :438-448)

then ``FrequencyCountingReducer`` counts identical values per key and
``MultipleOutputs`` routes each ``prefix__year`` to its own dataset
directory.  (``geo`` is registered by the job but never emitted by the
mapper — dead registration, reproduced by omission.)

Spark shape: the capture scan is ONE job; each dataset is a pure projection
off it, unioned with a ``dataset`` tag and counted by a single hash
aggregate (Catalyst's partial+final agg = the reducer's map-side combine).
The write routes with ``partitionBy(dataset, year)`` — same directory-per-
named-output layout, no driver-side loop over datasets.  The year key comes
from the first 4 digits of the 14-digit wayback date, as the mapper does
(``WARCDatasetMapper.java:191-192``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dataset_rows", "generate_datasets", "write_datasets", "DATASETS"]

DATASETS = ("hosts", "formats", "faces", "hostLinks")


def _nz(col):
    return F.coalesce(col, F.lit(""))


def dataset_rows(
    captures: DataFrame,
    datasets: tuple[str, ...] = DATASETS,
    host_col: str = "host",
    url_col: str = "url",
    wayback_col: str = "wayback_date",
) -> DataFrame:
    """Un-counted ``(dataset, year, value)`` emission — the mapper's output
    stream.  One pass over the capture scan; list-valued datasets explode
    AFTER the per-dataset projection so scalar datasets never widen."""
    year = F.substring(F.col(wayback_col).cast("string"), 1, 4)
    parts = []
    if "hosts" in datasets:
        parts.append(
            captures.select(
                F.lit("hosts").alias("dataset"), year.alias("year"),
                F.col(host_col).alias("value"),
            )
        )
    if "formats" in datasets:
        triple = F.concat(
            _nz(F.col("content_type_served")), F.lit("\t"),
            _nz(F.col("content_type_tika")), F.lit("\t"),
            _nz(F.col("content_type_droid")),
        )
        parts.append(
            captures.select(
                F.lit("formats").alias("dataset"), year.alias("year"),
                triple.alias("value"),
            )
        )
    if "faces" in datasets:
        faces = F.array_sort(F.col("image_faces"))

        def _kind_line(kind: str):
            matches = F.filter(faces, lambda v: v.startswith(kind))
            return F.when(
                F.size(matches) > 0,
                F.concat(
                    F.col(url_col), F.lit("\t"),
                    F.col(wayback_col).cast("string"), F.lit("\t"),
                    F.array_join(matches, " "),
                ),
            )

        # cat matches are gathered before human (SolrRecord.java:401-402)
        per_kind = F.array(_kind_line("cat"), _kind_line("human"))
        parts.append(
            captures.filter(F.size(F.col("image_faces")) > 0).select(
                F.lit("faces").alias("dataset"), year.alias("year"),
                F.explode(F.filter(per_kind, lambda v: v.isNotNull())).alias("value"),
            )
        )
    if "hostLinks" in datasets:
        parts.append(
            captures.filter(F.size(F.col("links_hosts")) > 0).select(
                F.lit("hostLinks").alias("dataset"), year.alias("year"),
                F.explode(F.col("links_hosts")).alias("linked"),
                F.col(host_col),
            ).select(
                "dataset", "year",
                F.concat(F.col(host_col), F.lit("\t"), F.col("linked")).alias("value"),
            )
        )
    if not parts:
        unknown = sorted(set(datasets) - set(DATASETS))
        raise ValueError(
            f"no known dataset selected from {datasets!r}"
            + (f" (unknown: {unknown}; note 'geo' is registered but never "
               "emitted by the reference mapper)" if unknown else "")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate_datasets(
    captures: DataFrame, datasets: tuple[str, ...] = DATASETS, **kw
) -> DataFrame:
    """``(dataset, year, value, cnt)`` — the FrequencyCountingReducer stage
    (one hash aggregate over the union; map-side partials for free)."""
    return (
        dataset_rows(captures, datasets, **kw)
        .groupBy("dataset", "year", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def write_datasets(counted: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize with the MultipleOutputs directory-per-dataset layout:
    ``{path}/dataset=hosts/year=2024/…`` tab-separated ``value\\tcnt`` lines
    (TextOutputFormat shape, gzip like the reference jobs)."""
    (
        counted.select(
            "dataset", "year",
            F.concat(F.col("value"), F.lit("\t"), F.col("cnt").cast("string")).alias(
                "line"
            ),
        )
        .write.mode(mode)
        .partitionBy("dataset", "year")
        .option("compression", "gzip")
        .text(path)
    )
