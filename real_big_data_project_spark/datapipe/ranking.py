"""Lexical relevance ranking over the corpus: TF-IDF / BM25.

The retrieval-side complement of the dedup/quality operators: given query
terms, score every matching document with BM25 (the Robertson/Spärck Jones
probabilistic idf variant used by Lucene/Elasticsearch).

Determinism contract (cross-engine float discipline, see
plans/catalog.py conventions):
  * avgdl (a float mean whose summation order differs between engines)
    and idf (a log) are ROUNDED before entering the per-term expression;
  * the per-term score is then pure elementwise arithmetic with an
    identical operand order in both engines — bit-exact;
  * the final per-doc sum over query terms is rounded once more before
    ranking.

Scale shape: the exploded token stream is filtered to the query terms
FIRST (a broadcast-able literal set), so tf/df/idf are all tiny; document
lengths are a map-side expression; the only full-corpus pass is the
single explode+filter — no corpus shuffle beyond the (small) tf
aggregation. A full-corpus *index* build is the same pipeline without the
term filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import normalized_tokens

BM25_K1 = 1.2
BM25_B = 0.75
AVGDL_ROUND = 6
IDF_ROUND = 6
SCORE_ROUND = 5


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 query term.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)            [rounded]
    score  = Σ_t idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), normalized_tokens(text_col).alias("t")
    )
    lens = toks.select("doc_id", F.size("t").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n"),
        F.round(F.avg("dl"), AVGDL_ROUND).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1),
            IDF_ROUND,
        ).alias("idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf") * F.col("tf") * (k1 + 1)
                / (F.col("tf")
                   + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    return per_term.groupBy("doc_id").agg(
        F.round(F.sum("s"), SCORE_ROUND).alias("bm25")
    )


SURPRISAL_ROUND = 5


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, mean_surprisal): per-doc mean of −ln p(t) under
    the corpus unigram model — the cheapest perplexity-style quality
    signal (the shape of a 1-gram LM filter in a pretraining pipeline).
    High values = rare-token soup (garbled text, codes); low = stopword
    mush; both tails are filter candidates.

    Per-token surprisal is a pure function of two integers (term count,
    corpus total), so it is bit-identical across engines; only the
    per-doc mean is rounded. Shape: one explode pass, a term-frequency
    aggregate, a broadcast-able frequency join, one per-doc aggregate.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(normalized_tokens(text_col)).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("n_t"))
    total = freq.agg(F.sum("n_t").alias("total"))
    scored = (
        toks.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (-F.log(F.col("n_t") / F.col("total"))).alias("surprisal"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("surprisal"), SURPRISAL_ROUND).alias("mean_surprisal"),
    )
