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


def test_perceptron_ner_fits_training_and_generalizes():
    """The committed statistical NER (averaged perceptron + BIO decode):
    100% sentence-exact on its training corpus (the property the
    ``entity_extract_model`` gate's gold oracle rests on), correct on
    held-out sentences with unseen entity strings, total on None/empty,
    and deterministic across retrains."""
    from webarchive_discovery_spark.functions.nermodel import (
        NER_SENTENCES, default_ner, train_demo_ner,
    )

    m = default_ner()
    tm = {"PER": "PERSON", "ORG": "ORGANIZATION", "LOC": "LOCATION"}
    for sent in NER_SENTENCES:
        text = " ".join(tok for tok, _ in sent)
        gold, cur, ctype = [], [], None
        for tok, tag in list(sent) + [("", "O")]:
            if tag.startswith("B-"):
                if cur:
                    gold.append((" ".join(cur), tm[ctype]))
                cur, ctype = [tok], tag[2:]
            elif tag.startswith("I-"):
                cur.append(tok)
            else:
                if cur:
                    gold.append((" ".join(cur), tm[ctype]))
                cur, ctype = [], None
        assert m.predict_batch([text])[0] == gold, text
    # held-out: unseen person/org/location surface forms
    assert m.predict_batch(["Ms Lena Kraus joined Zenix Ltd ."])[0] == [
        ("Ms Lena Kraus", "PERSON"), ("Zenix Ltd", "ORGANIZATION")]
    assert m.predict_batch(["Dr Ivan Petrov visited Prague ."])[0] == [
        ("Dr Ivan Petrov", "PERSON"), ("Prague", "LOCATION")]
    assert m.predict_batch([None, ""]) == [None, []]
    assert train_demo_ner().w == train_demo_ner().w  # deterministic
    assert default_ner() is m  # memoized


def test_ner_default_model_spark_path(spark):
    """model="default" auto-registers the committed perceptron; one Arrow
    stage, same exploded output shape as the rule path."""
    df = spark.createDataFrame(
        [(1, "Prof Mary Stone teaches at Oxford University .")],
        "id long, txt string",
    )
    out = ent.extract_entities(df, "txt", "id", model="default")
    got = {(r["entity"], r["entity_type"]) for r in out.collect()}
    assert got == {("Prof Mary Stone", "PERSON"),
                   ("Oxford University", "ORGANIZATION")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
