"""Rule-based NER (operators/entities.py): rule goldens, frequency rollup,
registry path, and the no-UDF plan property of the default rules."""

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import entities as ent


def test_entity_rules_goldens(spark):
    text = (
        "Yesterday Dr Grace Hopper met Mr Alan Turing in London before "
        "visiting the Allen Institute and Acme Widgets Ltd near Paris. "
        "lowercase corp and plain Words stay out."
    )
    df = spark.createDataFrame([(1, text)], "id long, txt string")
    got = {(r["entity"], r["entity_type"])
           for r in ent.extract_entities(df, "txt", "id").collect()}
    assert got == {
        ("Grace Hopper", "PERSON"),
        ("Alan Turing", "PERSON"),
        ("Allen Institute", "ORGANIZATION"),
        ("Acme Widgets Ltd", "ORGANIZATION"),
        ("London", "LOCATION"),
        ("Paris", "LOCATION"),
    }
    # pure codegen: the default rules path must not spawn a Python stage
    plan = ent.extract_entities(df, "txt", "id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_entity_frequencies(spark):
    df = spark.createDataFrame(
        [(1, "Dr Ada Lovelace visited Paris."),
         (2, "Dr Ada Lovelace and Dr Ada Lovelace again, in Paris and London.")],
        "id long, txt string",
    )
    rows = {(r["entity_type"], r["entity"]): (r["n_docs"], r["n_mentions"])
            for r in ent.entity_frequencies(df, "txt", "id").collect()}
    assert rows[("PERSON", "Ada Lovelace")] == (2, 3)
    assert rows[("LOCATION", "Paris")] == (2, 2)
    assert rows[("LOCATION", "London")] == (1, 1)


class _ToyNER:
    def predict_batch(self, texts):
        return [[("Model Entity", "PERSON")] if t else [] for t in texts]


def test_ner_registry_path(spark):
    ent.register_ner_model("toy", _ToyNER())
    df = spark.createDataFrame([(1, "anything")], "id long, txt string")
    got = [(r["entity"], r["entity_type"])
           for r in ent.extract_entities(df, "txt", "id", model="toy").collect()]
    assert got == [("Model Entity", "PERSON")]
    with pytest.raises(TypeError, match="predict_batch"):
        ent.register_ner_model("bad", object())
