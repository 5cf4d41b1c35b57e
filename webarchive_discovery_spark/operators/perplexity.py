"""CCNet-style LM-perplexity quality filtering, trained in-cluster.

Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
Web Crawl Data" (LREC 2020) scores every document with a language-model
perplexity and splits each language into head/middle/tail tertiles — the
classic pre-LLM web-corpus quality gate.  CCNet uses pre-trained KenLM
5-gram models; this module trains the LM itself as a Spark job (an add-k
smoothed bigram model over a hashed vocabulary) so the whole pipeline —
train → score → bucket — runs inside the engine with no external model
file, and every step stays ANSI-SQL restatable for the correctness gate.

(The reference has no perplexity tier; nearest analog is its language
detection (``LanguageAnalyser.java``).  This is part of the
beyond-reference LLM-pipeline surface.)

100 TB design:

- Training is token/bigram explode → TWO hash aggregates (unigram + bigram
  counts).  The model is at most ``buckets + buckets²`` rows but in
  practice ≈ distinct observed bigrams; with a hashed vocab the driver
  never sees it — it stays a DataFrame.
- Scoring joins the corpus bigram stream against the model: broadcast
  joins when the model fits (``broadcast_model=True``), plain shuffle
  equi-joins otherwise — either way no Python, no window over the corpus.
- Bucketing is one window per language over the (tiny) per-doc score
  table, ordered by rounded score + id so tertile assignment is
  deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_bigram_lm", "doc_perplexity", "perplexity_buckets"]


def _hash_bucket(col, buckets: int):
    """md5-derived token hash — identical arithmetic is restatable in
    DuckDB (``int(md5(w)[:8], 16) % buckets``); swap for ``xxhash64`` when
    oracle parity is not needed."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets)


def _bigram_stream(df: DataFrame, text_col: str, id_col: str, buckets: int) -> DataFrame:
    """``(id, w1, w2)`` — one row per adjacent-token pair occurrence, token
    identity hashed into ``buckets``.  Explode-FIRST (pre-projected token
    array + flat index + ``get``) like :func:`.dsir.hashed_ngram_buckets`:
    a ``transform`` lambda over the tokenizer *expression* re-evaluates the
    split per element — measured ~12× slower for identical output."""
    t = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != "")
    pre = df.select(F.col(id_col).alias("id"), t.alias("_t")).filter(
        F.size("_t") >= 2
    )
    return pre.select(
        "id", "_t",
        F.explode(F.sequence(F.lit(1), F.size("_t") - 1)).alias("_i"),
    ).select(
        "id",
        _hash_bucket(F.get("_t", F.col("_i") - 1), buckets).alias("w1"),
        _hash_bucket(F.get("_t", F.col("_i")), buckets).alias("w2"),
    )


def train_bigram_lm(
    df: DataFrame, text_col: str, id_col: str, buckets: int = 512
) -> tuple[DataFrame, DataFrame]:
    """Count model from a reference corpus: returns ``(uni, bi)`` where
    ``uni = (w1, c1)`` counts each context token's occurrences *as a bigram
    left side* and ``bi = (w1, w2, c2)`` counts bigram occurrences — exactly
    the statistics add-k bigram probability needs
    (``p(w2|w1) = (c2+k)/(c1+k·buckets)``).  Two hash aggregates over one
    exploded stream; no driver traffic.

    The bigram table is materialized (``localCheckpoint``) before the
    unigram rollup: both returned models are typically broadcast by
    :func:`doc_perplexity`, and each broadcast build is its own job — an
    unmaterialized ``bi`` would re-run the corpus scan + explode + count
    shuffle TWICE (once per broadcast), while the pinned table is at most
    ``buckets²`` rows (r6, guide §2.4: reuse one materialization)."""
    stream = _bigram_stream(df, text_col, id_col, buckets)
    bi = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    bi = bi.localCheckpoint()
    uni = bi.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return uni, bi


def doc_perplexity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    uni: DataFrame,
    bi: DataFrame,
    buckets: int = 512,
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document bigram perplexity under the trained model:
    ``ppl = exp(-mean(ln p(w2|w1)))`` over the document's adjacent-token
    pairs, with add-k smoothing so unseen bigrams (and unseen contexts —
    ``c1`` defaults 0) stay finite.  Output ``(id_col, n_bigrams, ppl)``;
    documents with fewer than two tokens have no bigrams and are absent
    (score them trivially clean or dirty by policy upstream)."""
    b = F.broadcast if broadcast_model else (lambda d: d)
    stream = _bigram_stream(df, text_col, id_col, buckets)
    logp = F.log(
        (F.coalesce("c2", F.lit(0)) + k)
        / (F.coalesce("c1", F.lit(0)) + k * buckets)
    )
    return (
        stream.join(b(uni), "w1", "left")
        .join(b(bi), ["w1", "w2"], "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.exp(-F.avg(logp)).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "ppl")
    )


def perplexity_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    ppl_col: str = "ppl",
    group_col: str | None = None,
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's per-language tertile split: ``ntile(n)`` over perplexity
    ascending (head = lowest perplexity = most fluent under the reference
    LM).  Ordering uses the score rounded to 6 dp with the id as tie-break,
    so bucket assignment is identical at any parallelism (and in the SQL
    oracle).  The window runs over the per-doc score table — tiny next to
    the corpus — partitioned by language, so no single-partition global
    window at scale."""
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(F.round(F.col(ppl_col), 6), F.col(id_col))
    tile = F.ntile(n_buckets).over(w)
    label = F.element_at(F.array(*[F.lit(x) for x in labels[:n_buckets]]), tile)
    return scored.withColumn("ppl_bucket", label)
