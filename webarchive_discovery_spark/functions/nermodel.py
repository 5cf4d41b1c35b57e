"""A real, trainable statistical NER for the ``extract_entities`` registry
slot: an averaged perceptron over token context features with BIO decoding
— the same model family the reference's Stanford-NER wrapper loads
(``EntityMapper.java:119``: linear sequence models over token features;
the published CRF/perceptron NER baseline).

Deterministic end to end: fixed embedded training corpus, fixed feature
order, fixed epoch count, no RNG — so the gate's arithmetic oracle can
state the model's outputs for known inputs and ``test_entities`` can pin
held-out generalization.

Protocol expected by ``operators.entities.register_ner_model``:

    model.predict_batch(texts) -> list[list[tuple[entity, entity_type]]]
"""

from __future__ import annotations

from collections import defaultdict

__all__ = ["PerceptronNER", "train_demo_ner", "default_ner", "NER_SENTENCES"]

#: embedded annotated training corpus: (token, BIO tag) sequences.
#: PER/ORG/LOC follow the output types PERSON/ORGANIZATION/LOCATION.
NER_SENTENCES: list[list[tuple[str, str]]] = [
    [("Dr", "B-PER"), ("Jane", "I-PER"), ("Porter", "I-PER"), ("visited", "O"),
     ("London", "B-LOC"), ("yesterday", "O"), (".", "O")],
    [("Mr", "B-PER"), ("Alan", "I-PER"), ("Reed", "I-PER"), ("works", "O"),
     ("for", "O"), ("Acme", "B-ORG"), ("Corp", "I-ORG"), (".", "O")],
    [("The", "O"), ("British", "B-ORG"), ("Library", "I-ORG"), ("keeps", "O"),
     ("archives", "O"), ("in", "O"), ("London", "B-LOC"), (".", "O")],
    [("Prof", "B-PER"), ("Mary", "I-PER"), ("Stone", "I-PER"), ("teaches", "O"),
     ("at", "O"), ("Oxford", "B-ORG"), ("University", "I-ORG"), (".", "O")],
    [("Paris", "B-LOC"), ("and", "O"), ("Berlin", "B-LOC"), ("signed", "O"),
     ("the", "O"), ("accord", "O"), (".", "O")],
    [("Mrs", "B-PER"), ("Ada", "I-PER"), ("Byron", "I-PER"), ("founded", "O"),
     ("the", "O"), ("Analytical", "B-ORG"), ("Institute", "I-ORG"),
     (".", "O")],
    [("Researchers", "O"), ("at", "O"), ("Stanford", "B-ORG"),
     ("University", "I-ORG"), ("study", "O"), ("crawlers", "O"), (".", "O")],
    [("Ms", "B-PER"), ("Eva", "I-PER"), ("Green", "I-PER"), ("moved", "O"),
     ("to", "O"), ("Tokyo", "B-LOC"), ("last", "O"), ("year", "O"),
     (".", "O")],
    [("The", "O"), ("Web", "B-ORG"), ("Foundation", "I-ORG"), ("met", "O"),
     ("in", "O"), ("Geneva", "B-LOC"), (".", "O")],
    [("Dr", "B-PER"), ("Omar", "I-PER"), ("Hassan", "I-PER"), ("leads", "O"),
     ("the", "O"), ("Cairo", "B-ORG"), ("Institute", "I-ORG"), (".", "O")],
    [("Engineers", "O"), ("from", "O"), ("Nova", "B-ORG"), ("Ltd", "I-ORG"),
     ("visited", "O"), ("Dublin", "B-LOC"), (".", "O")],
    [("Mr", "B-PER"), ("Liu", "I-PER"), ("Wei", "I-PER"), ("opened", "O"),
     ("an", "O"), ("office", "O"), ("in", "O"), ("Beijing", "B-LOC"),
     (".", "O")],
    [("The", "O"), ("National", "B-ORG"), ("Archives", "I-ORG"), ("hold", "O"),
     ("records", "O"), ("from", "O"), ("Edinburgh", "B-LOC"), (".", "O")],
    [("Prof", "B-PER"), ("Kim", "I-PER"), ("Soo", "I-PER"), ("joined", "O"),
     ("Hana", "B-ORG"), ("Company", "I-ORG"), ("in", "O"), ("Seoul", "B-LOC"),
     (".", "O")],
    [("Delegates", "O"), ("travelled", "O"), ("from", "O"), ("Madrid", "B-LOC"),
     ("to", "O"), ("Rome", "B-LOC"), (".", "O")],
    [("Mrs", "B-PER"), ("Ana", "I-PER"), ("Silva", "I-PER"), ("chairs", "O"),
     ("the", "O"), ("Atlantic", "B-ORG"), ("Agency", "I-ORG"), (".", "O")],
    [("Ms", "B-PER"), ("Ruth", "I-PER"), ("Lane", "I-PER"), ("joined", "O"),
     ("Orbit", "B-ORG"), ("Ltd", "I-ORG"), (".", "O")],
    [("Staff", "O"), ("of", "O"), ("Vega", "B-ORG"), ("Inc", "I-ORG"),
     ("met", "O"), ("in", "O"), ("Oslo", "B-LOC"), (".", "O")],
]

_TYPE_MAP = {"PER": "PERSON", "ORG": "ORGANIZATION", "LOC": "LOCATION"}
_TAGS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]

_HONORIFICS = {"Mr", "Mrs", "Ms", "Dr", "Prof"}
_ORG_SUFFIX = {"Inc", "Ltd", "Corp", "Company", "University", "Institute",
               "Foundation", "Agency", "Library", "Archives"}


def _features(tokens: list[str], i: int) -> list[str]:
    w = tokens[i]
    prev = tokens[i - 1] if i > 0 else "<s>"
    nxt = tokens[i + 1] if i + 1 < len(tokens) else "</s>"
    feats = [
        f"w={w.lower()}",
        f"cap={w[:1].isupper()}",
        f"prev={prev.lower()}",
        f"next={nxt.lower()}",
        f"suf2={w[-2:].lower()}",
        f"prev_hon={prev in _HONORIFICS}",
        f"is_hon={w in _HONORIFICS}",
        f"org_suf={w in _ORG_SUFFIX}",
        f"next_org_suf={nxt in _ORG_SUFFIX}",
        f"prev_cap={prev[:1].isupper()}",
        "bias",
    ]
    return feats


class PerceptronNER:
    """Averaged perceptron sequence tagger with greedy left-to-right BIO
    decoding (the previous PREDICTED tag is a feature — a first-order
    dependency, the standard greedy-perceptron NER baseline)."""

    def __init__(self, epochs: int = 8):
        self.epochs = epochs
        # weights[feature][tag] -> float
        self.w: dict[str, dict[str, float]] = {}

    # -- training ---------------------------------------------------------
    def fit(self, sentences: list[list[tuple[str, str]]]) -> "PerceptronNER":
        acc: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
        cur: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
        t = 1
        for _ in range(self.epochs):
            for sent in sentences:  # fixed order: deterministic
                tokens = [tok for tok, _ in sent]
                prev_tag = "O"
                for i, (_, gold) in enumerate(sent):
                    feats = _features(tokens, i) + [f"prev_tag={prev_tag}"]
                    pred = self._score_argmax(cur, feats)
                    if pred != gold:
                        for f in feats:
                            cur[f][gold] += 1.0
                            cur[f][pred] -= 1.0
                            acc[f][gold] += t
                            acc[f][pred] -= t
                    prev_tag = gold  # gold history during training
                    t += 1
        # averaged weights: w_avg = w_final - acc/t
        self.w = {
            f: {tag: cur[f][tag] - acc[f][tag] / t for tag in cur[f]}
            for f in cur
        }
        return self

    @staticmethod
    def _score_argmax(weights, feats) -> str:
        best_tag, best = "O", float("-inf")
        for tag in _TAGS:
            s = 0.0
            for f in feats:
                tf = weights.get(f)
                if tf:
                    s += tf.get(tag, 0.0)
            if s > best:
                best, best_tag = s, tag
        return best_tag

    # -- inference (registry protocol) ------------------------------------
    def _tag(self, tokens: list[str]) -> list[str]:
        tags = []
        prev_tag = "O"
        for i in range(len(tokens)):
            feats = _features(tokens, i) + [f"prev_tag={prev_tag}"]
            prev_tag = self._score_argmax(self.w, feats)
            tags.append(prev_tag)
        return tags

    def predict_batch(self, texts) -> list[list[tuple[str, str]] | None]:
        out: list[list[tuple[str, str]] | None] = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            tokens = text.split()
            tags = self._tag(tokens)
            ents: list[tuple[str, str]] = []
            cur_toks: list[str] = []
            cur_type = None
            for tok, tag in list(zip(tokens, tags)) + [("", "O")]:
                if tag.startswith("B-") or (
                    tag.startswith("I-") and cur_type != tag[2:]
                ):
                    if cur_toks:
                        ents.append((" ".join(cur_toks), _TYPE_MAP[cur_type]))
                    cur_toks, cur_type = [tok], tag[2:]
                elif tag.startswith("I-"):
                    cur_toks.append(tok)
                else:
                    if cur_toks:
                        ents.append((" ".join(cur_toks), _TYPE_MAP[cur_type]))
                    cur_toks, cur_type = [], None
            out.append(ents)
        return out


def train_demo_ner() -> PerceptronNER:
    """Train the embedded NER (deterministic: fixed corpus/order, no RNG)."""
    return PerceptronNER().fit(NER_SENTENCES)


_DEFAULT: PerceptronNER | None = None


def default_ner() -> PerceptronNER:
    """The committed statistical NER, trained once per process — the default
    model behind ``extract_entities(..., model="default")`` (the codegen
    rule extractor stays the ``model=None``, SQL-restatable tier)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = train_demo_ner()
    return _DEFAULT
