"""A real, trainable language-ID model for the ``lang_id`` registry slot.

The engine's default language detection is the codegen marker-word
heuristic in ``operators/textstats.py`` (the honest stand-in documented
since round 1 — a fastText-class model's weights don't ship in this
sandbox).  This module proves the MODEL SLOT itself end-to-end with a real
learned classifier built from nothing but numpy: a multinomial Naive Bayes
over hashed character trigrams — the same family langdetect/fastText
reduce to at small scale (char n-gram features × linear log-odds), and the
shape the reference's ``LanguageAnalyser.java:65`` wraps (langdetect's
n-gram profiles ARE per-language n-gram log-frequencies).

Protocol expected by ``textstats.register_lang_id_model``:

    model.predict_batch(texts: Sequence[str | None]) -> list[str | None]

Anything satisfying it (a fastText wrapper, an ONNX session, this class)
drops into the same Arrow-batched UDF; the model object is pickled to the
executors once per task via closure capture, so keep it small or wrap a
broadcast variable for multi-MB weights.
"""

from __future__ import annotations

import numpy as np

__all__ = ["CharNgramNB", "train_demo_model", "DEMO_SENTENCES"]


class CharNgramNB:
    """Multinomial Naive Bayes over hashed character trigrams.

    Features: all char 3-grams of ``" " + lower(text) + " "`` hashed into
    ``n_buckets`` (vectorized numpy view-as-bytes hashing, no Python per
    n-gram); training = Laplace-smoothed log-frequencies per class, i.e.
    exactly langdetect's per-language n-gram profile table; prediction =
    argmax of summed log-probabilities + log-prior."""

    def __init__(self, n_buckets: int = 1 << 15, alpha: float = 0.5):
        self.n_buckets = n_buckets
        self.alpha = alpha
        self.classes_: list[str] = []
        self.log_prob_: np.ndarray | None = None  # (C, n_buckets) float32
        self.log_prior_: np.ndarray | None = None  # (C,) float32

    # -- feature hashing -------------------------------------------------
    def _bucket_counts(self, text: str) -> np.ndarray:
        """Hashed-trigram count vector (n_buckets,) int64, fully vectorized:
        utf-8 bytes → all length-3 byte windows → FNV-1a-style mix → bucket."""
        b = (" " + text.lower() + " ").encode("utf-8", "replace")
        arr = np.frombuffer(b, dtype=np.uint8)
        if arr.size < 3:
            return np.zeros(self.n_buckets, dtype=np.int64)
        with np.errstate(over="ignore"):
            h = (
                arr[:-2].astype(np.uint64) * np.uint64(0x100000001B3)
                + arr[1:-1].astype(np.uint64) * np.uint64(0x01000193)
                + arr[2:].astype(np.uint64)
            )
            h ^= h >> np.uint64(15)
        buckets = (h % np.uint64(self.n_buckets)).astype(np.int64)
        return np.bincount(buckets, minlength=self.n_buckets)

    # -- training --------------------------------------------------------
    def fit(self, texts: list[str], labels: list[str]) -> "CharNgramNB":
        self.classes_ = sorted(set(labels))
        idx = {c: i for i, c in enumerate(self.classes_)}
        counts = np.zeros((len(self.classes_), self.n_buckets), dtype=np.float64)
        prior = np.zeros(len(self.classes_), dtype=np.float64)
        for t, lab in zip(texts, labels):
            counts[idx[lab]] += self._bucket_counts(t)
            prior[idx[lab]] += 1
        counts += self.alpha
        self.log_prob_ = np.log(counts / counts.sum(axis=1, keepdims=True)).astype(np.float32)
        self.log_prior_ = np.log(prior / prior.sum()).astype(np.float32)
        return self

    # -- inference (the registry protocol) -------------------------------
    def predict_batch(self, texts) -> list[str | None]:
        assert self.log_prob_ is not None, "fit() first"
        out: list[str | None] = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            v = self._bucket_counts(t)
            nz = np.nonzero(v)[0]
            if nz.size == 0:
                out.append("und")
                continue
            scores = self.log_prob_[:, nz] @ v[nz] + self.log_prior_
            out.append(self.classes_[int(np.argmax(scores))])
        return out


#: small embedded training corpus (original sentences, one list per
#: language) — enough signal for char-trigram NB to separate these eight
#: high-volume web languages; a production deployment swaps in real weights
#: through the identical registry call
DEMO_SENTENCES: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "archives of the web preserve pages that would otherwise be lost forever",
        "this document describes how the crawler schedules and fetches new pages",
        "a library collects books and keeps them available for future readers",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund am flussufer",
        "das webarchiv bewahrt seiten auf die sonst für immer verloren wären",
        "dieses dokument beschreibt wie der crawler neue seiten plant und abruft",
        "eine bibliothek sammelt bücher und hält sie für künftige leser bereit",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux près de la rivière",
        "les archives du web conservent des pages qui seraient perdues à jamais",
        "ce document décrit comment le robot planifie et récupère les nouvelles pages",
        "une bibliothèque rassemble des livres et les garde pour les lecteurs futurs",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso junto al río",
        "los archivos de la web conservan páginas que de otro modo se perderían",
        "este documento describe cómo el rastreador programa y recupera páginas nuevas",
        "una biblioteca reúne libros y los mantiene disponibles para futuros lectores",
    ],
    "it": [
        "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
        "gli archivi del web conservano pagine che altrimenti andrebbero perdute",
        "questo documento descrive come il crawler pianifica e recupera nuove pagine",
        "una biblioteca raccoglie libri e li conserva per i lettori futuri",
    ],
    "pt": [
        "a rápida raposa marrom salta sobre o cão preguiçoso perto do rio",
        "os arquivos da web preservam páginas que de outra forma se perderiam",
        "este documento descreve como o rastreador agenda e busca novas páginas",
        "uma biblioteca reúne livros e os mantém disponíveis para futuros leitores",
    ],
    "nl": [
        "de snelle bruine vos springt over de luie hond bij de rivieroever",
        "het webarchief bewaart pagina's die anders voorgoed verloren zouden gaan",
        "dit document beschrijft hoe de crawler nieuwe pagina's plant en ophaalt",
        "een bibliotheek verzamelt boeken en houdt ze beschikbaar voor toekomstige lezers",
    ],
    "ru": [
        "быстрая коричневая лиса прыгает через ленивую собаку у берега реки",
        "вебархивы сохраняют страницы которые иначе были бы потеряны навсегда",
        "этот документ описывает как краулер планирует и загружает новые страницы",
        "библиотека собирает книги и хранит их для будущих читателей",
    ],
}


def train_demo_model() -> CharNgramNB:
    """Train the embedded demo model (deterministic: fixed corpus, no RNG)."""
    texts, labels = [], []
    for lang, sents in DEMO_SENTENCES.items():
        for s in sents:
            texts.append(s)
            labels.append(lang)
    return CharNgramNB().fit(texts, labels)
