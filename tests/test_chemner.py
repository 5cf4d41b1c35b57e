"""OSCAR4-style chemistry NER: the reference's test golden, the three
recall tiers, false-positive discipline, and the Spark explode shape."""

from webarchive_discovery_spark.functions.chemner import (
    CHEM_DICT,
    FORMULA_INCHI,
    find_chemical_entities,
)
from webarchive_discovery_spark.operators.entities import (
    extract_chemical_entities,
)


def test_reference_golden_acetone():
    # Oscar4TextAnalyserTest.java:49-61, ported verbatim: both the MATCH
    # and the resolved standard-InChI strings must come back.
    results = find_chemical_entities("Hello acetone world!")
    assert "OSCAR4:MATCH:acetone" in results
    assert ("OSCAR4:STD_INCHI:InChI=1S/C3H6O/c1-3(2)4/h1-2H3" in results)


def test_dictionary_tier_multiword_and_case():
    ents = find_chemical_entities("Dissolve Sulfuric Acid in water.")
    # Surface form preserved (OSCAR4's getSurface), lookup case-folded.
    assert "OSCAR4:MATCH:Sulfuric Acid" in ents
    assert "OSCAR4:MATCH:water" in ents
    assert ("OSCAR4:STD_INCHI:" + CHEM_DICT["sulfuric acid"]) in ents


def test_dictionary_entry_without_structure_is_match_only():
    ents = find_chemical_entities("They found caffeine traces.")
    assert ents == ["OSCAR4:MATCH:caffeine"]


def test_formula_tier():
    ents = find_chemical_entities("Mix H2SO4 with NaCl and KMnO4.")
    assert "OSCAR4:MATCH:H2SO4" in ents
    assert ("OSCAR4:STD_INCHI:" + FORMULA_INCHI["H2SO4"]) in ents
    assert "OSCAR4:MATCH:NaCl" in ents
    # Valid element tokenization without a committed structure → MATCH only
    assert "OSCAR4:MATCH:KMnO4" in ents
    assert not any("KMnO4" in e and "INCHI" in e for e in ents)


def test_morphology_tier_match_only():
    ents = find_chemical_entities("Trace butanone and methyl sulfate.")
    assert "OSCAR4:MATCH:butanone" in ents
    assert "OSCAR4:MATCH:methyl" in ents
    assert "OSCAR4:MATCH:sulfate" in ents
    assert not any(e.startswith("OSCAR4:STD_INCHI") for e in ents)


def test_false_positive_discipline():
    # Prose that shares roots/shapes with chemistry must stay clean:
    # dec+ide, dec+orate, oct+al, In/He element-symbol words, acronyms.
    assert find_chemical_entities(
        "I decided to decorate the octal display alone In October; "
        "He read the HTML spec at NASA."
    ) == []
    assert find_chemical_entities(None) == []
    assert find_chemical_entities("") == []


def test_unique_set_semantics():
    # The reference collects into a HashSet — repeated mentions collapse.
    ents = find_chemical_entities("acetone, acetone and more acetone")
    assert ents == [
        "OSCAR4:MATCH:acetone",
        "OSCAR4:STD_INCHI:InChI=1S/C3H6O/c1-3(2)4/h1-2H3",
    ]


def test_spark_explode_shape(spark):
    df = spark.createDataFrame(
        [(1, "Hello acetone world!"), (2, "nothing here"), (3, None)],
        "doc_id int, text string",
    )
    rows = extract_chemical_entities(df, "text", "doc_id").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r["entity"])
    assert sorted(by_id[1]) == [
        "OSCAR4:MATCH:acetone",
        "OSCAR4:STD_INCHI:InChI=1S/C3H6O/c1-3(2)4/h1-2H3",
    ]
    assert 2 not in by_id and 3 not in by_id
