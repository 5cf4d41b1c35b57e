"""OSCAR4-style chemical named-entity recognition.

Reference analog: ``warc-analysers-oscar4/src/main/java/uk/bl/wa/analyser/
text/Oscar4TextAnalyser.java:63-85`` — ``Oscar.findAndResolveNamedEntities``
over the extracted text, emitting the UNIQUE strings
``OSCAR4:MATCH:<surface>`` and, where the entity resolves to a standard
InChI, ``OSCAR4:STD_INCHI:<inchi>`` into the Tika metadata list.  Its test
golden (``Oscar4TextAnalyserTest.java:49-61``: "Hello acetone world!" →
both strings for acetone) is ported verbatim in ``tests/test_chemner.py``.

OSCAR4 itself is a MEMM tagger over a ChEBI-derived dictionary plus
chemical morphology; its model files are external and don't ship here, so
— exactly like the language-ID and NER tiers — this re-expression keeps
the three recall tiers that define the output contract, as one linear
vectorized pass per text:

- **dictionary**: a committed public subset of common compounds
  (solvents, acids, gases, aromatics) with their standard InChIs where
  the subset knows them; a dictionary hit without a committed structure
  resolves to ``MATCH`` only, exactly like an OSCAR4 entity with no
  ``ChemicalStructure``.
- **molecular formulas**: tokens that tokenize completely into element
  symbols with optional counts (``H2SO4``, ``NaCl``) and carry at least a
  digit or two capitals (so prose tokens like ``In`` or ``He`` never
  match); known formulas resolve to the same InChIs.
- **systematic-name morphology**: IUPAC root + suffix shapes
  (``meth|eth|prop|…`` + ``ane|ene|ol|one|…``) — MATCH only.

Spark shape: the per-text kernel is pure Python over small strings, so the
engine exposes it as ONE Arrow-batched UDF (``chem_entities_udf``); the
downstream frequency/explode shapes are plain DataFrame ops.
"""

from __future__ import annotations

import re

import pandas as pd

__all__ = [
    "CHEM_DICT",
    "FORMULA_INCHI",
    "find_chemical_entities",
    "chem_entities_udf",
]

# Committed public dictionary subset: surface form (lower-case) → standard
# InChI, or None when this subset doesn't commit a structure (the entity
# then yields MATCH only, mirroring an unresolved OSCAR4 entity).
CHEM_DICT: dict[str, str | None] = {
    "acetone": "InChI=1S/C3H6O/c1-3(2)4/h1-2H3",
    "water": "InChI=1S/H2O/h1H2",
    "methane": "InChI=1S/CH4/h1H4",
    "ethanol": "InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3",
    "methanol": "InChI=1S/CH4O/c1-2/h2H,1H3",
    "benzene": "InChI=1S/C6H6/c1-2-4-6-5-3-1/h1-6H",
    "toluene": "InChI=1S/C7H8/c1-7-5-3-2-4-6-7/h2-6H,1H3",
    "phenol": "InChI=1S/C6H6O/c7-6-4-2-1-3-5-6/h1-5,7H",
    "ammonia": "InChI=1S/H3N/h1H3",
    "ethylene": "InChI=1S/C2H4/c1-2/h1-2H2",
    "acetic acid": "InChI=1S/C2H4O2/c1-2(3)4/h1H3,(H,3,4)",
    "sulfuric acid": "InChI=1S/H2O4S/c1-5(2,3)4/h(H2,1,2,3,4)",
    "hydrogen peroxide": "InChI=1S/H2O2/c1-2/h1-2H",
    "carbon dioxide": "InChI=1S/CO2/c2-1-3",
    "sodium chloride": "InChI=1S/ClH.Na/h1H;/q;+1/p-1",
    # MATCH-only entries (no committed structure in this subset):
    "glucose": None,
    "aspirin": None,
    "caffeine": None,
    "chloroform": None,
    "formaldehyde": None,
}

# Known molecular formulas → the same standard InChIs.
FORMULA_INCHI: dict[str, str | None] = {
    "H2O": CHEM_DICT["water"],
    "CO2": CHEM_DICT["carbon dioxide"],
    "NH3": CHEM_DICT["ammonia"],
    "CH4": CHEM_DICT["methane"],
    "H2O2": CHEM_DICT["hydrogen peroxide"],
    "H2SO4": CHEM_DICT["sulfuric acid"],
    "NaCl": CHEM_DICT["sodium chloride"],
    "C6H6": CHEM_DICT["benzene"],
}

_DICT_RE = re.compile(
    r"\b(" + "|".join(sorted((re.escape(k) for k in CHEM_DICT), key=len,
                             reverse=True)) + r")\b",
    re.IGNORECASE,
)

# IUPAC 118-element symbol set (public periodic table).
_ELEMENTS = frozenset(
    "H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe "
    "Co Ni Cu Zn Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In "
    "Sn Sb Te I Xe Cs Ba La Ce Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf "
    "Ta W Re Os Ir Pt Au Hg Tl Pb Bi Po At Rn Fr Ra Ac Th Pa U Np Pu Am "
    "Cm Bk Cf Es Fm Md No Lr Rf Db Sg Bh Hs Mt Ds Rg Cn Nh Fl Mc Lv Ts "
    "Og".split()
)

_FORMULA_TOKEN = re.compile(r"\b[A-Z][A-Za-z0-9]*\b")
_FORMULA_SEG = re.compile(r"([A-Z][a-z]?)(\d*)")

# Systematic-name morphology: three chemically-shaped alternatives —
# (alkyl root + saturation infix + functional suffix), (hetero/functional
# root + salt suffix), (alkyl/aryl root + -yl).  The saturation-infix
# requirement is what keeps common English words out: "decide"/"decorate"
# have the root "dec" but no an/en/yn infix, "octal" has no infix, while
# every systematic name ("butanone", "hexanal", "propene") has one.
_MORPH_RE = re.compile(
    r"\b(?:"
    r"(?:meth|eth|prop|but|pent|hex|hept|oct|non|dec|undec|dodec|"
    r"cyclopent|cyclohex)(?:an|en|yn)(?:e|ol|one|al|oate|amine|amide)"
    r"|(?:chlor|brom|fluor|iod|nitr|sulf|phosph|carbon|ox|hydr)"
    r"(?:ide|ate|ite|ium)"
    r"|(?:meth|eth|prop|but|phen|benz)yl"
    r")s?\b"
)


def _is_formula(token: str) -> bool:
    """True when the token tokenizes completely into element symbols with
    optional counts AND is unambiguously formula-like (has a digit, or at
    least two capital letters) — so prose words like ``In``/``He`` or
    acronyms with non-element segments never match."""
    if len(token) < 2:
        return False
    caps = sum(1 for c in token if c.isupper())
    if not (any(c.isdigit() for c in token) or caps >= 2):
        return False
    pos = 0
    segs = 0
    while pos < len(token):
        m = _FORMULA_SEG.match(token, pos)
        if not m or m.start() != pos:
            return False
        sym = m.group(1)
        if sym not in _ELEMENTS:
            # Retry the single-letter symbol when the two-letter one fails
            # (e.g. "CO" tokenizes as C+O, not the invalid "Co"? — Co IS an
            # element, so prefer the longest VALID parse first).
            if len(sym) == 2 and sym[0] in _ELEMENTS:
                sym = sym[0]
                pos = m.start() + 1
                while pos < len(token) and token[pos].isdigit():
                    pos += 1
                segs += 1
                continue
            return False
        pos = m.end()
        segs += 1
    return segs >= 2


def find_chemical_entities(text: str | None) -> list[str]:
    """Unique ``OSCAR4:MATCH:`` / ``OSCAR4:STD_INCHI:`` strings for one
    text, sorted (the reference collects them in a ``HashSet`` —
    ``Oscar4TextAnalyser.java:68``; sorting makes the set deterministic
    for the value oracle)."""
    if not text:
        return []
    out: set[str] = set()
    spans: list[tuple[int, int]] = []
    for m in _DICT_RE.finditer(text):
        out.add("OSCAR4:MATCH:" + m.group(1))
        inchi = CHEM_DICT[m.group(1).lower()]
        if inchi is not None:
            out.add("OSCAR4:STD_INCHI:" + inchi)
        spans.append(m.span())

    def _covered(s: int, e: int) -> bool:
        return any(s >= a and e <= b for a, b in spans)

    for m in _FORMULA_TOKEN.finditer(text):
        tok = m.group(0)
        if _covered(*m.span()) or not _is_formula(tok):
            continue
        out.add("OSCAR4:MATCH:" + tok)
        inchi = FORMULA_INCHI.get(tok)
        if inchi is not None:
            out.add("OSCAR4:STD_INCHI:" + inchi)
    lowered = text.lower()
    for m in _MORPH_RE.finditer(lowered):
        if _covered(*m.span()):
            continue
        out.add("OSCAR4:MATCH:" + text[m.start():m.end()])
    return sorted(out)


def chem_entities_udf():
    """Arrow-batched ``string → array<string>`` UDF over the kernel (one
    Python stage; the explode/frequency shapes stay JVM-side)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def kernel(texts: pd.Series) -> pd.Series:
        return texts.map(find_chemical_entities)

    return kernel
