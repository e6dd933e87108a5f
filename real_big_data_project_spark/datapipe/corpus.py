"""Corpus construction + per-document text analysis.

The synthetic `documents` table has no duplicates (every fingerprint is
unique at every scale factor), so the dedup-family operators would all be
exercised on empty outputs. `with_near_duplicates` deterministically plants
duplicates — exact copies and tail-truncated near-copies — so exact dedup,
MinHash/LSH, SimHash, and n-gram Jaccard all have non-trivial, oracle-
checkable results. The same construction is mirrored in SQL for DuckDB
(see plans/queries_datapipe.py::SQL_WITH_DUPS).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import normalized_tokens

TRUNCATE_TAIL_TOKENS = 3

# Version token for the tokenizer/normalization rules
# (functions.hashing.normalized_tokens: lowercase + single-space split).
# Folded into fixture cache keys that store truth derived from tokenized
# text — bump it on ANY rule change so stored truth rebuilds.
TOKENIZER_VERSION = "v1"


def with_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents ∪ planted duplicates → (doc_id, text).

    Planting rule (deterministic, id-keyed; OFFSET = max(doc_id)+1 so
    planted ids can never collide with real ones at ANY scale factor —
    a fixed constant silently collides once the table outgrows it):
      * doc_id % 3 == 0 → exact copy (normalized text) at doc_id+OFFSET
      * doc_id % 3 == 1 → near copy: last TRUNCATE_TAIL_TOKENS tokens
        dropped, at doc_id+OFFSET
      * doc_id % 3 == 2 → no copy

    Copies carry *normalized* text (lowercase, single-space); every dedup
    operator normalizes before hashing, so exact copies collide exactly and
    truncated copies are high-Jaccard near-duplicates.
    """
    toks = normalized_tokens(text_col)
    n = F.size(toks)
    exact = F.array_join(toks, " ")
    trunc = F.array_join(
        F.slice(toks, F.lit(1), F.greatest(n - TRUNCATE_TAIL_TOKENS, F.lit(1))), " "
    )
    off = docs.agg(
        (F.coalesce(F.max(id_col), F.lit(0)) + 1).alias("_off")
    )
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    copies = (
        docs.filter(F.col(id_col) % 3 != 2)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col(id_col) + F.col("_off")).alias("doc_id"),
            F.when(F.col(id_col) % 3 == 0, exact).otherwise(trunc).alias("text"),
        )
    )
    return base.unionByName(copies)


# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation.
# The shape of GPT-2-style pretokenization, portable to RE2 (DuckDB oracle).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("bigint")


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document analysis row: token counts (whitespace + BPE-ish),
    char count, punctuation ratio, mean token length, stopword ratio, and
    the composite quality score. All JVM-side Column expressions — this is
    the map-only, shuffle-free pass that precedes any corpus filter at
    scale."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        T.token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        T.char_count(text_col).alias("n_chars"),
        T.punct_ratio(text_col).alias("punct_ratio"),
        T.mean_token_length(text_col).alias("mean_token_len"),
        T.stopword_ratio(text_col).alias("stopword_ratio"),
        T.quality_score(text_col).alias("quality"),
    )


def selection_signals(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Every per-doc signal a corpus-selection pass consumes — token
    count, quality score, language guess, exact-dedup fingerprint — in
    ONE projection over the text, lazily pinned because selection always
    has at least two consumers (the corpus-wide keeper aggregate ranges
    over ALL docs; the filter reads the same signals). The regex
    tokenizations dominate the scan, so separate per-signal scans
    re-joined on the id pay them once per signal (measured 3× at sf0.1).
    Shared by q_corpus_select and q_datapipe_e2e — one definition, two
    oracles."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        T.token_count(text_col).alias("n_tokens"),
        T.quality_score(text_col).alias("quality"),
        T.lang_guess(text_col).alias("lang_guess"),
        T.fingerprint(text_col).alias("fp"),
    ).localCheckpoint(eager=False)


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Language-ID heuristic (marker n-gram argmax) next to the labeled
    `lang` column, so accuracy is measurable downstream."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang").alias("lang_label"),
        T.lang_guess(text_col).alias("lang_guess"),
    )


def pack_sequences(
    toks: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 400,
    n_shards: int = 64,
) -> DataFrame:
    """Sequence packing: assign each doc a (bin_id, offset_in_bin) under a
    fixed token ``budget`` from a running prefix sum in ``id_col`` order —
    WITHOUT a global-order window.

    Sharded prefix sum (the 100 TB shape):
      1. one tiny min/max aggregate of the integer id space, broadcast;
      2. a monotone fixed-width shard key keeps every shard a contiguous
         slice of the global order — per-shard window prefix sums run in
         parallel (Exchange hashpartitioning, never SinglePartition over
         the corpus);
      3. per-shard token totals (<= n_shards rows) take an exclusive
         running sum on the aggregate-sized frame and broadcast back as
         base offsets.
    offset(doc) = shard_base + local_prefix, bit-identical to the global
    window (integer arithmetic, identical order). Reference analogue: the
    batch loaders in etl/etl.py concatenate feeds in file order; this is
    the LM-training equivalent over `documents`.
    """
    from pyspark.sql import Window

    bounds = toks.agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
    width = F.greatest(
        F.ceil((F.col("_hi") - F.col("_lo") + F.lit(1)) / F.lit(n_shards))
        .cast("long"),
        F.lit(1).cast("long"),
    )
    sharded = (
        toks.crossJoin(F.broadcast(bounds))
        .withColumn("_shard",
                    F.floor((F.col(id_col) - F.col("_lo")) / width)
                    .cast("long"))
        .drop("_lo", "_hi")
    )
    local_w = (
        Window.partitionBy("_shard").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn("_local_end", F.sum(tokens_col).over(local_w))
    # Exclusive running sum over the per-shard totals: <= n_shards rows,
    # so the single-partition window here is aggregate-sized by design.
    base_w = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        sharded.groupBy("_shard").agg(F.sum(tokens_col).alias("_tot"))
        .withColumn("_base",
                    F.coalesce(F.sum("_tot").over(base_w), F.lit(0)))
        .select("_shard", "_base")
    )
    packed = (
        local.join(F.broadcast(bases), "_shard")
        .withColumn("offset_tokens",
                    F.col("_base") + F.col("_local_end") - F.col(tokens_col))
    )
    return packed.select(
        id_col, tokens_col,
        F.floor(F.col("offset_tokens").cast("double") / budget)
        .cast("long").alias("bin_id"),
        (F.col("offset_tokens") % budget).cast("long").alias("offset_in_bin"),
    )


def token_budget_select(
    stats: DataFrame,
    budget: int,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Budgeted corpus selection: keep the highest-``quality_col`` docs
    until ``budget`` tokens are filled — the 'pick the best N-token
    training mix' pass that follows scoring in a curation pipeline
    (where pack_sequences then lays the keepers out).

    Greedy prefix policy: docs are ranked by (quality DESC, id) — a
    total ordering — and a doc is kept iff the tokens BEFORE it are
    under budget, so the straddling doc is included and the output is
    never empty for budget > 0. The cumulative sum is exact and
    distributed (operators/windows.py::global_running_sum — range-
    repartition + broadcast prefix bases, no single-task window).

    ``stats`` is pinned (lazy localCheckpoint) before the cumsum:
    ``repartitionByRange`` evaluates its child once to SAMPLE the range
    cutpoints and again for the exchange, and the scoring pipeline
    feeding this selector is regex-heavy (tokenize + quality), so the
    un-pinned plan paid the scoring twice — measured 157 s → 40.5 s at
    the sf10 sweep scale (500 k docs). Pinning the 3-narrow-column
    stats frame costs one tiny materialization and is exactly what a
    production curation run does between scoring and the global cut.
    """
    from ..operators.windows import global_running_sum

    cum = global_running_sum(
        stats.localCheckpoint(eager=False),
        order=[F.col(quality_col).desc(), F.col(id_col)],
        val_col=tokens_col,
        out_col="cum_tokens",
    )
    return cum.filter(F.col("cum_tokens") - F.col(tokens_col) < budget)


def corpus_report(docs: DataFrame) -> DataFrame:
    """Per-source corpus report card — the daily health sheet a corpus
    operator reads before anything trains: volume (docs, tokens,
    tokens/doc), exact-duplication rate within the source, and language
    concentration (the modal language and its share).

    Every metric is one hash aggregate over the corpus; the modal-lang
    argmax runs on the report-sized (source, lang) count frame via a
    window (|sources|·|langs| rows — sorting THERE is free, unlike a
    corpus-sized argmax). Integer-ratio arithmetic throughout → bit-
    exact oracle.
    """
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(normalized_tokens("text"))).alias("n_tokens"),
        F.countDistinct(F.md5(F.concat_ws(" ", normalized_tokens("text"))))
        .alias("n_distinct_texts"),
    )
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("lc"))
    w = Window.partitionBy("source").orderBy(F.desc("lc"), F.asc("lang"))
    modal = (
        lang_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("modal_lang"),
                F.col("lc").alias("modal_n"))
    )
    return (
        base.join(modal, "source")
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6)
            .alias("tokens_per_doc"),
            F.round((F.col("n_docs") - F.col("n_distinct_texts"))
                    / F.col("n_docs"), 6).alias("exact_dup_rate"),
            "modal_lang",
            F.round(F.col("modal_n") / F.col("n_docs"), 6)
            .alias("modal_lang_share"),
        )
        .orderBy("source")
    )
