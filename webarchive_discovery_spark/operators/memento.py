"""Memento JSONL output — the reference's typed per-capture JSON dataset.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/Memento.java:37-247``
(Jackson-annotated POJO) filled by ``SolrRecord.toMemento``
(``SolrRecord.java:488-578``) and emitted one-JSON-object-per-line by the
Hadoop reducer when ``--jsonl`` is set
(``WARCIndexerReducer.java:149-151``: ``solr.toMemento().toJSON()``).

Field mapping rules reproduced here:

- JSON property names are the Solr field names (snake_case) — identical to
  the capture schema's column names, so the projection is mostly renames.
- Memento fields declared as single ``String`` take the FIRST value of
  multi-valued Solr fields (``getFieldAsString``): ``access_terms``,
  ``collection``, ``host_surt``; list fields pass through.  (The capture
  schema keeps ``collection`` multi-valued like Solr; Memento's String
  field takes its first value.)
- ``crawl_date`` / ``last_modified`` / ``publication_date`` serialize as
  ISO-8601 strings (Solr date format), ``wayback_date`` as a long.
- ``content_fuzzy_hash`` reformats the per-blocksize ssdeep fields as
  ``blocksize:sig:sig2:resourcename`` (``SolrRecord.reformatSsdeep``,
  ``SolrRecord.java:580-605``) — null unless both signatures exist.
- Null fields SERIALIZE AS EXPLICIT ``null``: the reference's ``toJSON``
  uses a plain Jackson ``ObjectMapper`` (default ``Include.ALWAYS``,
  ``Memento.java:243-247``), so every declared property — including the
  never-populated ``category``/``comments`` — appears on every line.
  ``to_json`` is therefore called with ``ignoreNullFields=false``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["to_memento", "memento_json_lines", "write_memento_jsonl"]

_ISO = "yyyy-MM-dd'T'HH:mm:ss'Z'"

#: capture column → Memento JSON property, in Memento.java declaration order.
#: ``first:`` prefix = getFieldAsString over a multi-valued capture column.
_FIELDS = [
    ("id", "id"),
    ("first:access_terms", "access_terms"),
    ("first:author", "author"),
    ("category", "category"),
    ("first:collection", "collection"),
    ("collections", "collections"),
    ("comments", "comments"),
    ("description", "description"),
    ("keywords", "keywords"),
    ("license_url", "license_url"),
    ("content", "content"),
    ("content_encoding", "content_encoding"),
    ("content_first_bytes", "content_first_bytes"),
    ("first:content_language", "content_language"),
    ("content_length", "content_length"),
    ("content_text_length", "content_text_length"),
    ("content_type_droid", "content_type_droid"),
    ("content_type_ext", "content_type_ext"),
    ("content_type_full", "content_type_full"),
    ("content_type_norm", "content_type_norm"),
    ("content_type_served", "content_type_served"),
    ("content_type_tika", "content_type_tika"),
    ("content_type", "content_type"),
    ("content_type_version", "content_type_version"),
    ("elements_used", "elements_used"),
    ("hash", "hash"),
    ("wayback_date", "wayback_date"),
    ("date:crawl_date", "crawl_date"),
    ("date:last_modified", "last_modified"),
    ("url_norm", "url_norm"),
    ("url_path", "url_path"),
    ("url", "url"),
    ("url_type", "url_type"),
    ("domain", "domain"),
    ("host", "host"),
    ("first:host_surt", "host_surt"),
    ("public_suffix", "public_suffix"),
    ("resourcename", "resourcename"),
    ("image_colours", "image_colours"),
    ("image_dominant_colour", "image_dominant_colour"),
    ("image_faces_count", "image_faces_count"),
    ("image_faces", "image_faces"),
    ("image_height", "image_height"),
    ("image_width", "image_width"),
    ("image_size", "image_size"),
    ("links_images", "links_images"),
    ("links_domains", "links_domains"),
    ("links_hosts", "links_hosts"),
    ("links_hosts_surts", "links_hosts_surts"),
    ("links_public_suffixes", "links_public_suffixes"),
    ("links", "links"),
    ("locations", "locations"),
    ("parse_error", "parse_error"),
    ("postcode_district", "postcode_district"),
    ("postcode", "postcode"),
    ("date:publication_date", "publication_date"),
    ("record_type", "record_type"),
    ("server", "server"),
    ("status_code", "status_code"),
    ("generator", "generator"),
    ("redirect_to_norm", "redirect_to_norm"),
    ("source_file_path", "source_file_path"),
    ("source_file_offset", "source_file_offset"),
    ("source_file", "source_file"),
]


def to_memento(captures: DataFrame) -> DataFrame:
    """Project a capture-schema DataFrame into the Memento JSONL shape
    (one column per JSON property; missing capture columns become typed
    nulls so partial capture frames still serialize)."""
    cols = []
    have = set(captures.columns)

    def col_or_null(name):
        return F.col(name) if name in have else F.lit(None)

    for src, out in _FIELDS:
        if src.startswith("first:"):
            name = src.split(":", 1)[1]
            if name in have:
                # getFieldAsString = first value of a multi-valued field;
                # already-scalar columns pass through
                is_array = captures.schema[name].dataType.typeName() == "array"
                c = F.element_at(F.col(name), 1) if is_array else F.col(name)
            else:
                c = F.lit(None)
        elif src.startswith("date:"):
            name = src.split(":", 1)[1]
            c = F.date_format(col_or_null(name), _ISO) if name in have else F.lit(None)
        else:
            c = col_or_null(src)
        cols.append(c.alias(out))
    # content_fuzzy_hash: blocksize:sig:sig2:resourcename when both present
    if {"ssdeep_hash_bs_3", "ssdeep_hash_bs_6"} <= have:
        fuzzy = F.when(
            F.col("ssdeep_hash_bs_3").isNotNull() & F.col("ssdeep_hash_bs_6").isNotNull(),
            F.concat_ws(
                ":",
                F.lit("3"), F.col("ssdeep_hash_bs_3"), F.col("ssdeep_hash_bs_6"),
                F.coalesce(F.col("resourcename") if "resourcename" in have else F.lit(None), F.lit("")),
            ),
        )
    else:
        fuzzy = F.lit(None).cast("string")
    cols.append(fuzzy.alias("content_fuzzy_hash"))
    return captures.select(*cols)


def memento_json_lines(captures: DataFrame) -> DataFrame:
    """One ``line`` column of compact JSON per capture; null fields kept as
    explicit ``null`` (Jackson ``Include.ALWAYS``, the reference's
    ``Memento.toJSON`` default — all declared properties present on every
    line)."""
    m = to_memento(captures)
    return m.select(
        F.to_json(
            F.struct(*[F.col(c) for c in m.columns]),
            {"ignoreNullFields": "false"},
        ).alias("line")
    )


def write_memento_jsonl(captures: DataFrame, path: str, gzip_output: bool = True,
                        mode: str = "overwrite") -> None:
    """The ``--jsonl`` dataset output (``WARCIndexerReducer.java:149-151``)."""
    writer = memento_json_lines(captures).write.mode(mode)
    if gzip_output:
        writer = writer.option("compression", "gzip")
    writer.text(path)
