"""Training-data selection: deterministic sampling, mixture rebalancing,
and PII scrubbing.

All randomness is hash-derived (md5 of the row id with a purpose salt), so
every operator is (a) reproducible across runs/partitionings/engines —
re-running selection on the same corpus yields the same sample, which is
what makes training mixes auditable — and (b) oracle-checkable bit-for-bit
in DuckDB.

The uniform-in-[0,1) draw is the first 8 hex chars of the md5, COMPARED AS
A STRING against a fixed-width hex threshold: 8-char lowercase hex compares
lexicographically exactly as its numeric value, and string comparison
behaves identically in Spark and DuckDB — no hex→int conversion dialect to
keep in sync.

Scale shape: sampling and scrubbing are map-only (no shuffle at all);
mixture take-N shuffles once on the stratum key and its window never
materializes more than a partition's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import normalized_tokens


def rate_to_hex_threshold(rate: float) -> str:
    """Fraction in [0,1] → 8-char lowercase hex threshold such that
    P[substr(md5(x),1,8) < threshold] = rate for a uniform hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate out of [0,1]: {rate}")
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def _sample_key(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum Bernoulli sampling with a deterministic hash draw:
    keep a row iff hex(md5(salt:id))[:8] < threshold(stratum).

    Unlike df.sample(), membership is a pure function of the row id — no
    seed plumbing, no partitioning sensitivity, stable under reruns and
    appends (a row's fate never changes when other rows arrive). Map-only."""
    thr = None
    for s, r in sorted(rates.items()):
        lit_thr = F.lit(rate_to_hex_threshold(r))
        cond = F.col(stratum_col) == s
        thr = F.when(cond, lit_thr) if thr is None else thr.when(cond, lit_thr)
    thr = (
        thr.otherwise(F.lit(rate_to_hex_threshold(default_rate)))
        if thr is not None
        else F.lit(rate_to_hex_threshold(default_rate))
    )
    return df.withColumn("sample_key", _sample_key(id_col, salt)).filter(
        F.col("sample_key") < thr
    )


def mixture_take(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quotas: dict[str, int],
    default_quota: int,
    salt: str = "mix",
) -> DataFrame:
    """Training-mix rebalancing: take at most quota(stratum) rows per
    stratum, chosen in hash order (a deterministic pseudo-random shuffle;
    id tiebreak makes the ordering total). Strata smaller than their quota
    contribute everything.

    One shuffle on the stratum key; rank N is assigned without sorting the
    whole table (window per stratum). At extreme stratum skew, pre-filter
    with stratified_hash_sample at ~quota/|stratum| to cap the window
    input, then take-N exactly."""
    key = _sample_key(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(F.col("mix_key"), F.col(id_col))
    quota = None
    for s, q in sorted(quotas.items()):
        cond = F.col(stratum_col) == s
        quota = F.when(cond, q) if quota is None else quota.when(cond, q)
    quota = quota.otherwise(default_quota) if quota is not None else F.lit(default_quota)
    return (
        df.withColumn("mix_key", key)
        .withColumn("mix_rank", F.row_number().over(w))
        .filter(F.col("mix_rank") <= quota)
        .drop("mix_key")
    )


ES_KEY_ROUND = 8


def weighted_sample_take(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    n: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    draw u ~ U(0,1) per row from the id hash, rank by −ln(u)/w ascending
    (equivalent to uᵂ descending), take the top n — inclusion probability
    ∝ weight, deterministic, single pass.

    This is the quality-weighted corpus subset selector: w = a quality or
    length score, and the same n rows come back on every run/partitioning
    — auditable training mixes. The top-n is orderBy+limit
    (TakeOrderedAndProject: per-partition heaps, no global sort); the key
    is rounded so the cross-engine oracle ranks identically (pow/ln libm
    implementations may differ in the last ulp).

    Weights must be positive; fractional weights (quality scores in
    (0, 1]) are honored as-is. Non-positive weights are clamped to a tiny
    epsilon — the E–S limit as w→0+ is "never sampled", so w ≤ 0 rows
    sort to the very end instead of poisoning the key with ±inf.
    """
    hex8 = _sample_key(id_col, salt)
    # denominator 2^32+1 keeps u STRICTLY inside (0,1): with /2^32 a
    # once-in-2^32 'ffffffff' hash prefix gives u=1, -ln(u)=0, and key 0
    # regardless of weight -- that row (even a w<=0 one) would rank FIRST,
    # violating the ordering contract below.
    u = (F.conv(hex8, 16, 10).cast("long") + 1) / F.lit(4294967297.0)
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    key = F.round(-F.log(u) / w, ES_KEY_ROUND)
    top = (
        df.withColumn("es_key", key)
        .orderBy(F.col("es_key").asc(), F.col(id_col).asc())
        .limit(n)
    )
    rank_w = Window.orderBy(F.col("es_key").asc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(rank_w).cast("int"))


# PII patterns — deliberately restricted to syntax portable between Java
# regex (Spark) and RE2 (DuckDB): char classes, bounded repetition, \b.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_PATTERN = r"\b\d{3}-\d{4}\b"

_PII = (
    (EMAIL_PATTERN, "<EMAIL>", "n_emails"),
    (IPV4_PATTERN, "<IP>", "n_ips"),
    (PHONE_PATTERN, "<PHONE>", "n_phones"),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-shaped numbers from
    `text_col`, adding per-kind match counts and the scrubbed text.

    Replacement order matters (an email's domain must not be re-matched as
    something else), so counts are taken on the original text and
    replacements apply sequentially. Map-only, expression-only: the whole
    scrub runs inside whole-stage codegen — this is a full-corpus pass at
    scale and must never drop to Python."""
    out = df
    scrubbed = F.col(text_col)
    for pattern, token, count_alias in _PII:
        out = out.withColumn(
            count_alias,
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))
            .cast("long"),
        )
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return out.withColumn("scrubbed", scrubbed)


def hash_split(
    df: DataFrame,
    id_col: str,
    salt: str = "split0",
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Deterministic train/valid/test assignment by id hash.

    The split a training pipeline actually needs: stable under
    re-partitioning, re-runs, and corpus growth (a doc's split never
    changes when other docs arrive), with no shuffle at all — the bucket
    is a map-only expression on the id. Same md5-prefix → uniform-bucket
    construction as weighted_sample_take's u."""
    bucket = F.conv(_sample_key(id_col, salt), 16, 10).cast("long") % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuf0",
    num_ranges: int = 32,
) -> DataFrame:
    """Deterministic global permutation: shuffle_key = md5(salt:id), pos =
    exact global rank over (key, id).

    Training-data order matters (shuffling a corpus before sharding into
    sequence files); a seeded `rand()` is NOT reproducible across Spark
    partitionings, an id-keyed md5 is. The rank comes from
    operators/windows.py::global_row_number — range repartition +
    broadcast prefix-sum offsets — so the permutation of a 100 TB corpus
    never funnels through a single-task window."""
    from ..operators.windows import global_row_number

    keyed = df.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
    )
    return global_row_number(
        keyed, ["shuffle_key", id_col], out_col="pos", num_ranges=num_ranges
    )

# --- DSIR-shaped importance resampling -------------------------------------

DSIR_BUCKETS = 128
DSIR_LR_SCALE = 10**8     # per-bucket log-ratio travels as an INTEGER
                          # (round(lr * 1e8) as long): per-doc sums of
                          # longs are summation-order independent, so the
                          # cross-engine value can never straddle the
                          # final rounding boundary (a plain double sum
                          # of ~50 rounded doubles did, at sf0.01)
DSIR_LOGW_ROUND = 8       # MUST equal log10(DSIR_LR_SCALE): the per-doc
                          # sum is an exact multiple of 1e-8, so rounding
                          # at 8 dp just recovers that decimal exactly in
                          # both engines — any COARSER rounding can land
                          # exactly on a half boundary (sum ≡ 500 mod
                          # 1000 did at sf0.01), where Spark's BigDecimal
                          # HALF_UP and DuckDB's binary round() disagree
DSIR_KEY_ROUND = 6        # Gumbel selection key


def _feature_bucket(term: Column, n_buckets: int, salt: str) -> Column:
    """Hashed n-gram feature bucket: first 4 hex chars of a salted md5 →
    int in [0, n_buckets). Portable: DuckDB mirrors it as
    CAST(concat('0x', substr(md5(...), 1, 4)) AS INT) % n_buckets."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), term)), 1, 4),
            16, 10,
        ).cast("int") % n_buckets
    )


def dsir_importance_select(
    docs: DataFrame,
    target_pred: Column,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR-shaped; Xie et al.,
    NeurIPS 2023): select raw documents that look like a TARGET domain by
    (1) estimating importance weights over hashed unigram features and
    (2) Gumbel-top-n resampling with those weights.

    Stages, all deterministic and SQL-mirrorable:
      * features: token → md5 bucket in [0, n_buckets) — the paper's
        hashed n-gram generative model with unigram features;
      * bucket log-ratio: ln((ct+1)/(T+B)) − ln((cr+1)/(R+B)) per bucket
        (Laplace-smoothed target vs raw counts — integer ratios into ln,
        the surprisal parity contract), scaled to an integer once per
        bucket (DSIR_LR_SCALE) so downstream sums are exact;
      * per-doc log importance weight: integer sum of its tokens' bucket
        log-ratios (summation-order independent), divided back once and
        rounded;
      * resample: Gumbel-max — key = log_w + (−ln(−ln(u))) with u drawn
        from the id hash exactly like weighted_sample_take's u, so
        inclusion ∝ importance weight without ever exponentiating the
        log-weight. Top-n via orderBy+limit (TakeOrderedAndProject —
        per-partition heaps, no global sort).

    Scale shape: two explode→hash-agg passes whose outputs are
    n_buckets-sized (map-side combine does almost all the work), one
    broadcast of the n_buckets-row weight table back onto the exploded
    token stream, ONE shuffle on doc_id for the per-doc sum, and a top-n.
    The corpus text is never shuffled; at 100 TB the only wide exchange
    is doc_id-keyed partial sums.

    `target_pred` is a boolean Column over `docs` rows marking the target
    domain sample (e.g. lang = 'en', or a trusted-source flag).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("_is_target"),
        F.explode(normalized_tokens(text_col)).alias("term"),
    ).withColumn("b", _feature_bucket(F.col("term"), n_buckets, f"{salt}f"))

    counts = toks.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cr").alias("r_total"), F.sum("ct").alias("t_total")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            (F.log((F.col("ct") + 1)
                   / (F.col("t_total") + F.lit(float(n_buckets))))
             - F.log((F.col("cr") + 1)
                     / (F.col("r_total") + F.lit(float(n_buckets)))))
            * DSIR_LR_SCALE
        ).cast("long").alias("lr8"),
    )
    log_w = (
        toks.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.round(
            F.sum("lr8") / F.lit(float(DSIR_LR_SCALE)), DSIR_LOGW_ROUND,
        ).alias("log_w"))
    )
    # Gumbel-max resampling key; u strictly inside (0,1) per the
    # weighted_sample_take denominator note.
    u = (
        F.conv(_sample_key("doc_id", f"{salt}g"), 16, 10).cast("long") + 1
    ) / F.lit(4294967297.0)
    keyed = log_w.withColumn(
        "sel_key", F.round(F.col("log_w") - F.log(-F.log(u)), DSIR_KEY_ROUND)
    )
    top = keyed.orderBy(
        F.col("sel_key").desc(), F.col("doc_id").asc()
    ).limit(n)
    rank_w = Window.orderBy(F.col("sel_key").desc(), F.col("doc_id").asc())
    return top.withColumn("rnk", F.row_number().over(rank_w).cast("int"))
