"""Language-ID model registry: a real trained char-trigram Naive Bayes
(functions/langmodel.py) plugged through the documented ``lang_id``
``model=`` slot — proving the fastText-class swap path end-to-end while the
codegen heuristic stays the dependency-free default."""

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.functions.langmodel import (
    DEMO_SENTENCES,
    train_demo_model,
)
from webarchive_discovery_spark.operators import textstats

# held-out sentences — NOT in the training corpus
HELD_OUT = {
    "en": "please remember that every saved page can still be read tomorrow",
    "de": "bitte denken sie daran dass jede gespeicherte seite morgen noch lesbar ist",
    "fr": "veuillez noter que chaque page sauvegardée pourra encore être lue demain",
    "es": "recuerde que cada página guardada todavía podrá leerse mañana",
    "pt": "lembre se de que cada página guardada ainda poderá ser lida amanhã",
    "ru": "помните что каждая сохранённая страница будет доступна и завтра",
}


def test_model_generalizes_to_held_out_sentences():
    model = train_demo_model()
    preds = model.predict_batch(list(HELD_OUT.values()))
    assert preds == list(HELD_OUT.keys())
    assert model.predict_batch([None, ""]) == [None, "und"]


def test_registry_override_on_gate_query_shape(spark):
    """Same shape as the lang_id_counts gate (documents-derived texts →
    lang_id → groupBy counts), but routed through a REGISTERED model: the
    output column, downstream grouping, and plan shape (one Arrow stage)
    are identical to the heuristic path."""
    textstats.register_lang_id_model("demo_nb", train_demo_model())
    langs = list(HELD_OUT)
    rows = [(i, langs[i % len(langs)], HELD_OUT[langs[i % len(langs)]])
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, expected string, txt string")
    out = textstats.lang_id(df, "txt", model="demo_nb")
    assert out.filter(F.col("lang_pred") != F.col("expected")).count() == 0
    counts = {r["lang_pred"]: r["n"] for r in
              out.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {l: 10 for l in langs}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_registry_validation():
    with pytest.raises(TypeError, match="predict_batch"):
        textstats.register_lang_id_model("bad", object())
    with pytest.raises(KeyError):
        textstats.LANG_ID_MODELS["never_registered"]


def test_heuristic_remains_default(spark):
    """No model argument → the codegen heuristic path, zero Python stages."""
    df = spark.createDataFrame(
        [(1, "the cat and the dog of a man")], "id long, txt string"
    )
    out = textstats.lang_id(df, "txt")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert out.collect()[0]["lang_pred"] == "en"


def test_demo_corpus_is_balanced():
    sizes = {len(v) for v in DEMO_SENTENCES.values()}
    assert sizes == {4}
