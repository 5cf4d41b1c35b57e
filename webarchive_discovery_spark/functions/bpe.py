"""Byte-pair-encoding tokenizer with an embedded learned merge table.

Replaces the chars/4 token-count estimate with REAL subword tokenization:
the published BPE algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units" — also the GPT-2 tokenizer's
core): train = iteratively merge the most frequent adjacent symbol pair;
encode = greedily apply merges in rank order per whitespace-pre-tokenized
word (with the ``</w>`` end-of-word marker).

The merge table is LEARNED at import from the embedded seed corpus below —
deterministic (fixed corpus, fixed merge count, lexicographic tie-break), so
token counts are stable across runs/machines and the DuckDB gate oracle can
state them arithmetically.  A production vocabulary (e.g. a real GPT-2
``merges.txt``) drops into :class:`BPETokenizer` unchanged — the file format
IS a merge list.

Spark usage: ``operators/textstats.token_stats(..., with_bpe=True)`` runs
:meth:`BPETokenizer.count_tokens` in one Arrow-batched UDF with a per-word
memo (web text repeats words heavily; the memo makes the amortized cost one
dict hit per token).
"""

from __future__ import annotations

from collections import Counter

__all__ = ["train_bpe", "BPETokenizer", "default_tokenizer", "NUM_MERGES"]

NUM_MERGES = 300
_EOW = "</w>"

#: embedded seed corpus (original text): generic English plus the engine's
#: own domain vocabulary so the learned merges are representative of the
#: documents the pipeline actually tokenizes
_CORPUS = """
the quick brown fox jumps over the lazy dog and the dog sleeps by the river
a web archive preserves pages that would otherwise be lost forever and the
crawler schedules fetches for every new page it discovers on the frontier
the indexing pipeline extracts text links images and metadata from each
record and writes documents to the search index for later discovery
deduplication removes documents whose content is identical or nearly
identical so that training corpora contain each page exactly once
the archive preserves pages forever and readers can browse the past
tokens are counted with byte pair encoding which merges frequent pairs of
characters into subword units until the vocabulary reaches a fixed size
quality scoring measures length repetition stopword ratio and punctuation
to decide whether a document should survive the cleaning pipeline
politeness rules limit how often the crawler fetches from a single host
and robots files tell the crawler which paths it must never fetch
the frontier orders urls by priority hops and inlink counts so that
important pages are fetched before obscure ones and budgets are respected
language identification assigns each document a language code so that
corpora can be filtered to the languages a model should learn from
crawl indexing deduplication preserves preserved preserving archives
archived archiving pages page fetches fetched fetching schedules scheduled
"""


def train_bpe(corpus: str, num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges (most-frequent-pair first; ties resolve
    to the lexicographically smallest pair for determinism)."""
    vocab: Counter = Counter()
    for w in corpus.split():
        vocab[tuple(w) + (_EOW,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        max_c = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == max_c)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter = Counter()
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


class BPETokenizer:
    """Encode/count with a fixed merge table (rank order = train order)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._word_len: dict[str, int] = {}  # per-word token-count memo

    def encode_word(self, word: str) -> list[str]:
        symbols = list(word) + [_EOW]
        ranks = self.ranks
        while len(symbols) > 1:
            best_rank = None
            for a, b in zip(symbols, symbols[1:]):
                r = ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best = (a, b)
            if best_rank is None:
                break
            merged = best[0] + best[1]
            out = []
            i = 0
            while i < len(symbols):
                if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        return symbols

    def count_word(self, word: str) -> int:
        n = self._word_len.get(word)
        if n is None:
            n = len(self.encode_word(word))
            self._word_len[word] = n
        return n

    def count_tokens(self, text: str) -> int:
        """Total BPE tokens of whitespace-pre-tokenized ``text``."""
        return sum(self.count_word(w) for w in text.split())


_DEFAULT: BPETokenizer | None = None


def default_tokenizer() -> BPETokenizer:
    """Process-wide singleton over the embedded corpus (trained on first
    use — executors each train once, ~50 ms, then memoize per word)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = BPETokenizer(train_bpe(_CORPUS, NUM_MERGES))
    return _DEFAULT
