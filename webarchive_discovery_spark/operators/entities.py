"""Named-entity extraction: a real, deterministic rule system in pure
codegen, plus the model-registry slot for a statistical NER.

Reference analog: ``EntityMapper`` / the ``warc-nlp`` GATE + Stanford-NER
analysers (``EntityMapper.java:119``) — their MODELS are external files that
don't ship here, so (as with language-ID) the engine provides (a) an honest
rule-based extractor whose semantics a SQL oracle can restate, and (b) the
``register_ner_model`` slot where a learned model drops in behind the same
output shape.

Rules (classic public heuristics, all JVM-side ``regexp_extract_all`` +
array expressions — no UDF, whole-stage codegen):

- PERSON: honorific (Mr/Mrs/Ms/Dr/Prof) followed by two capitalized tokens.
- ORGANIZATION: one-or-more capitalized tokens ending in a corporate /
  institutional suffix (Inc, Ltd, Corp, Company, University, Institute,
  Foundation, Agency).
- LOCATION: capitalized tokens found in the embedded place gazetteer.

Output shape is the exploded ``(id, entity, entity_type)`` rows that the
reference's frequency-count jobs consume (entity → count is then one hash
aggregate — ``FrequencyCountingReducer``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_entities",
    "extract_chemical_entities",
    "entity_frequencies",
    "register_ner_model",
    "NER_MODELS",
    "HONORIFICS",
    "ORG_SUFFIXES",
    "PLACE_GAZETTEER",
]

HONORIFICS = ["Mr", "Mrs", "Ms", "Dr", "Prof"]
ORG_SUFFIXES = [
    "Inc", "Ltd", "Corp", "Company", "University", "Institute",
    "Foundation", "Agency",
]
#: compact embedded place gazetteer (public geography); a production
#: deployment swaps a full GeoNames extract into the same broadcast array
PLACE_GAZETTEER = [
    "London", "Paris", "Berlin", "Madrid", "Rome", "Vienna", "Amsterdam",
    "Brussels", "Lisbon", "Dublin", "Edinburgh", "Manchester", "Tokyo",
    "Beijing", "Delhi", "Mumbai", "Sydney", "Toronto", "Chicago", "Boston",
    "Seattle", "Austin", "Cairo", "Lagos", "Nairobi", "Singapore", "Seoul",
    "Oslo", "Stockholm", "Helsinki", "Copenhagen", "Warsaw", "Prague",
    "Budapest", "Athens", "Istanbul", "Moscow", "Kyiv", "England",
    "Scotland", "Wales", "Ireland", "France", "Germany", "Spain", "Italy",
    "Japan", "China", "India", "Australia", "Canada", "Brazil", "Mexico",
    "Egypt", "Kenya", "Nigeria",
]

#: NER model registry: name → object with
#: ``predict_batch(texts) -> list[list[tuple[entity, etype]]]``
NER_MODELS: dict[str, object] = {}


def register_ner_model(name: str, model) -> None:
    """Register a statistical NER for :func:`extract_entities`'s ``model=``
    path (must expose ``predict_batch(texts)`` returning per-text lists of
    ``(entity, entity_type)`` pairs; picklable)."""
    if not hasattr(model, "predict_batch"):
        raise TypeError("model must expose predict_batch(texts)")
    NER_MODELS[name] = model


def extract_entities(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: str | None = None,
) -> DataFrame:
    """Exploded ``(id, entity, entity_type)`` rows per document.

    Default path: the rule system above, entirely codegen (three
    ``regexp_extract_all`` families + one gazetteer ``array_intersect``,
    one explode).  ``model=<registered>`` routes a real NER through one
    Arrow-batched UDF instead, same output shape."""
    text = F.col(text_col)
    if model is not None:
        if model == "default" and model not in NER_MODELS:
            # the committed statistical NER (averaged perceptron), trained
            # lazily once per process — the rule system stays model=None
            from ..functions.nermodel import default_ner

            register_ner_model("default", default_ner())
        m = NER_MODELS[model]

        @F.pandas_udf("array<struct<entity:string,entity_type:string>>")
        def _predict(texts: pd.Series) -> pd.Series:
            return pd.Series(
                [m.predict_batch([t])[0] if t is not None else [] for t in texts],
                dtype=object,
            )

        ents = df.select(F.col(id_col), F.explode(_predict(text)).alias("_e"))
        return ents.select(
            id_col,
            F.col("_e.entity").alias("entity"),
            F.col("_e.entity_type").alias("entity_type"),
        )

    hon = "|".join(HONORIFICS)
    suf = "|".join(ORG_SUFFIXES)
    persons = F.regexp_extract_all(
        text, F.lit(rf"\b(?:{hon})\.? ([A-Z][A-Za-z0-9]+ [A-Z][A-Za-z0-9]+)"), F.lit(1)
    )
    orgs = F.regexp_extract_all(
        text, F.lit(rf"\b((?:[A-Z][A-Za-z0-9]+ )+(?:{suf}))\b"), F.lit(1)
    )
    caps = F.regexp_extract_all(text, F.lit(r"\b([A-Z][a-z]+)\b"), F.lit(1))
    locs = F.array_intersect(
        F.array_distinct(caps), F.array([F.lit(p) for p in PLACE_GAZETTEER])
    )
    tagged = F.concat(
        F.transform(persons, lambda e: F.struct(
            e.alias("entity"), F.lit("PERSON").alias("entity_type"))),
        F.transform(orgs, lambda e: F.struct(
            e.alias("entity"), F.lit("ORGANIZATION").alias("entity_type"))),
        F.transform(locs, lambda e: F.struct(
            e.alias("entity"), F.lit("LOCATION").alias("entity_type"))),
    )
    return df.select(F.col(id_col), F.explode(tagged).alias("_e")).select(
        id_col,
        F.col("_e.entity").alias("entity"),
        F.col("_e.entity_type").alias("entity_type"),
    )


def entity_frequencies(
    df: DataFrame, text_col: str, id_col: str, model: str | None = None
) -> DataFrame:
    """``(entity_type, entity, n_docs, n_mentions)`` — the reference's
    entity frequency-count job (``FrequencyCountingReducer`` over
    ``EntityMapper`` output) as one extract + one hash aggregate."""
    ents = extract_entities(df, text_col, id_col, model=model)
    return ents.groupBy("entity_type", "entity").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


def extract_chemical_entities(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """OSCAR4-contract chemistry NER: exploded ``(id, entity)`` rows where
    ``entity`` is ``OSCAR4:MATCH:<surface>`` or ``OSCAR4:STD_INCHI:<inchi>``
    — the exact unique strings the reference adds to the Tika metadata
    list (``Oscar4TextAnalyser.java:63-85``).  One Arrow pass
    (``functions/chemner.py``); the explode stays JVM-side."""
    from ..functions.chemner import chem_entities_udf

    ents = chem_entities_udf()
    return df.select(
        F.col(id_col), F.explode(ents(F.col(text_col))).alias("entity")
    )
