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

from pyspark.sql import DataFrame, Window
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


def source_divergence(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token-distribution diagnostics: Shannon entropy
    H(p_s) = −Σ p_s(t)·ln p_s(t) and KL(p_s ‖ p_corpus) — the domain-
    drift / mixture-health metrics a pretraining pipeline tracks per
    data source (a source whose KL spikes has drifted from the corpus
    mixture; entropy collapse flags boilerplate floods).

    Everything is ratios of integer counts into ln (the surprisal
    contract: per-term values bit-identical across engines; only the
    final sums round). KL is finite by construction — every source term
    is also a corpus term. Shape: one explode, one (source, term)
    aggregate, a broadcast corpus-frequency join, one per-source
    aggregate.
    """
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(normalized_tokens(text_col)).alias("term"),
    )
    st = toks.groupBy("source", "term").agg(F.count("*").alias("n_st"))
    s_tot = st.groupBy(F.col("source").alias("s2")).agg(
        F.sum("n_st").alias("n_s")
    )
    corpus = st.groupBy(F.col("term").alias("t2")).agg(
        F.sum("n_st").alias("n_t")
    )
    c_tot = corpus.agg(F.sum("n_t").alias("n_c"))
    p_s = F.col("n_st") / F.col("n_s")
    p_c = F.col("n_t") / F.col("n_c")
    return (
        st.join(F.broadcast(s_tot), F.col("source") == F.col("s2"))
        .join(F.broadcast(corpus), F.col("term") == F.col("t2"))
        .crossJoin(F.broadcast(c_tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.round(F.sum(-p_s * F.log(p_s)), 5).alias("entropy"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 5).alias("kl_vs_corpus"),
        )
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit for the corpus: OLS of ln(frequency) on ln(rank)
    over the term-frequency table — slope ≈ −1 is the healthy-natural-
    text signature; |slope| far off flags synthetic/templated corpora.
    Returns one row (n_terms, slope, intercept).

    Ranks are exact (operators/windows.py::global_row_number over
    (freq DESC, term) — vocabulary-scale, no single-task window); the
    closed-form OLS is the five-partial-sums single-aggregate shape of
    q_trend_slope_sql. Slope/intercept round at 5 dp under the ln
    parity contract.
    """
    from ..operators.windows import global_row_number

    toks = docs.select(F.explode(normalized_tokens(text_col)).alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").alias("n_t"))
    ranked = global_row_number(
        freq, [F.col("n_t").desc(), F.col("term")], out_col="rank"
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n_t").cast("double")).alias("y"),
    )
    sums = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 5).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 5)
        .alias("intercept"),
    )


JACCARD_ROUND = 6


def source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n_shingle: int = 3,
) -> DataFrame:
    """Pairwise source-level content overlap: exact Jaccard between every
    two sources' DISTINCT n-gram shingle sets — the cross-source
    companion to source_divergence (that one asks "has this source
    drifted from the mixture?"; this one asks "are two feeds actually
    the same crawl?" — the signal behind merging mirrored dumps before
    doc-level dedup ever runs).

    Shape (never all-pairs on documents): one explode to DISTINCT
    (source, shingle) rows, then per SHINGLE the sorted source list via
    one hash aggregate — per-key fan-out is bounded by the SOURCE count,
    not the corpus — and pair counts from exploding each list's
    O(|sources|²) pairs. Set sizes come from the same distinct frame.
    The output is |sources|² rows: report-sized, broadcast-joinable.
    Jaccard = |∩| / (|a| + |b| − |∩|), an integer ratio (bit-exact
    across engines), rounded for presentation only.
    """
    # Round 11: the shingle set comes from the codegen'd map-only
    # pipeline (dedup_text.exploded_shingles — posexplode + array `get`),
    # not the interpreted `word_shingles` HOF (~300 lambda evals per doc,
    # the known scalar-path pathology; guide §4). exploded_shingles
    # already emits DISTINCT (key, shingle) rows, and keyed by source it
    # computes exactly the per-source distinct shingle set: per-doc
    # distinctness only collapses duplicates this distinct would collapse
    # anyway, and the short-doc fallback is shared (both forms emit the
    # full normalized text of a short doc as its single shingle).
    from .dedup_text import exploded_shingles

    sh = exploded_shingles(docs, n_shingle, id_col=source_col,
                           text_col=text_col).select(
        F.col("doc_id").alias("src"), F.col("shingle").alias("s")
    )
    sizes = sh.groupBy("src").agg(F.count("*").alias("n"))
    srcs_per_shingle = sh.groupBy("s").agg(
        F.sort_array(F.collect_set("src")).alias("srcs")
    )
    pairs = srcs_per_shingle.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("srcs"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("srcs"), i + 2,
                            F.greatest(
                                F.size("srcs") - i - 1, F.lit(0)
                            ),
                        ),
                        lambda b: F.struct(
                            a.alias("src_a"), b.alias("src_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    inter = pairs.groupBy("src_a", "src_b").agg(
        F.count("*").alias("n_common")
    )
    grid = (
        sizes.select(F.col("src").alias("src_a"), F.col("n").alias("n_a"))
        .crossJoin(
            sizes.select(F.col("src").alias("src_b"), F.col("n").alias("n_b"))
        )
        .where(F.col("src_a") < F.col("src_b"))
    )
    return (
        grid.join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a", "src_b", "n_a", "n_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0))
                / (F.col("n_a") + F.col("n_b")
                   - F.coalesce("n_common", F.lit(0))),
                JACCARD_ROUND,
            ).alias("jaccard"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al., LREC 2020): split
    each language's documents into head/middle/tail terciles of the
    LM score (here the corpus-unigram mean surprisal — lower = more
    fluent). CCNet trains on `head`, samples `middle`, drops `tail`.

    Deliberately NOT a per-lang ntile window: ranking a language's whole
    corpus in one window partition is a single-task sort at 100 TB.
    Instead the tercile cutoffs come from the per-(lang, score) COUNT
    HISTOGRAM — scores are rounded to SURPRISAL_ROUND dp so the
    histogram is value-bounded, the cumulative window runs over that
    report-sized frame, and the bucket assignment is a broadcast-join +
    map-only CASE over the corpus. Integer cumulative-count comparisons
    (3·cum ≥ n, 3·cum ≥ 2n) keep the cutoff rule bit-deterministic; docs
    with equal rounded scores always share a bucket, so bucket sizes are
    n/3 up to score-tie granularity.
    """
    scored = (
        unigram_surprisal(docs, id_col=id_col)
        .join(docs.select(F.col(id_col).alias("doc_id"), lang_col), "doc_id")
        .select("doc_id", F.col(lang_col).alias("lang"),
                F.col("mean_surprisal").alias("score"))
    )
    hist = scored.groupBy("lang", "score").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(Window.partitionBy("lang").orderBy("score")),
    )
    totals = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    cuts = (
        cum.join(F.broadcast(totals), "lang")
        .groupBy("lang")
        .agg(
            F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("score")))
            .alias("c1"),
            F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("score")))
            .alias("c2"),
        )
    )
    bucket = (
        F.when(F.col("score") <= F.col("c1"), F.lit("head"))
        .when(F.col("score") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select("doc_id", "lang", "score", bucket.alias("bucket"))
    )
