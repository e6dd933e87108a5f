"""Named query catalog — the driver contract.

Every operator in SURVEY.md §2 is exercised by a named query over the
synthetic testdata (FIXTURES.md §B mapping), paired with an ANSI-SQL oracle
string that DuckDB runs on the same parquet for the correctness gate.

Cross-engine conventions (SURVEY.md §7 risk register):
- `min_by`/`max_by` instead of first/last (order-deterministic, exists in
  both engines);
- every ORDER BY / row_number ordering is total (tiebreak columns);
- every computed column is aliased identically on both sides;
- floating aggregates whose summation order differs between engines
  (big sums, windowed avg/stddev) are ROUNDed identically on both sides;
  pure elementwise arithmetic is left unrounded (IEEE ops are
  deterministic given identical expression trees).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        QUERIES[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn
    return deco


# The driver's CORRECTNESS gate samples the FIRST 50 entries of
# ``queries()``, so exposure order is risk order, not registration order.
# The priority prefix rotates each round: new/changed queries lead (a green
# prior-round row does not certify new output), then the LEAST-recently
# gated queries, so every catalog entry is periodically re-proven on
# current-generation testdata.
#
# GENERATED — do not hand-edit.  Regenerate with
#     python tools/gen_rotation.py [pinned new/changed query names...]
# and paste the _ROTATION_VINTAGE/_PINNED/_RISKIEST block below verbatim.
# tests/test_plans.py::test_rotation_prefix_is_generated recomputes
# compute_prefix(_PINNED) from the live CORRECTNESS_r*.json set and fails
# the suite if this block is stale (VERDICT r8 item 1: round 8 silently
# re-proved the identical r7 sample; a hand-maintained prefix cannot be
# trusted to rotate).  Round-12 prefix: _PINNED is empty (round 12 is an
# optimization round — no new queries, no output changes; every touched
# query was re-proven bit-equal against its oracle this round); the
# staleness-first fill leads with the r08-vintage rows (dedup/streaming/
# scan families), then r09 — after this gate no catalog query's latest
# green row predates r08.
_ROTATION_VINTAGE = 11
_PINNED: tuple[str, ...] = ()
_RISKIEST: tuple[str, ...] = (
    "q_dedup_ngram_jaccard",  # last green r08
    "q_dedup_recall",  # last green r08
    "q_dedup_simhash",  # last green r08
    "q_doc_fingerprint",  # last green r08
    "q_dq_expectations",  # last green r08
    "q_ewma_daily",  # last green r08
    "q_filter_funnel",  # last green r08
    "q_gapfill_locf",  # last green r08
    "q_incremental_ohlcv",  # last green r08
    "q_kmeans",  # last green r08
    "q_knn_graph",  # last green r08
    "q_ntile_deciles",  # last green r08
    "q_pagerank",  # last green r08
    "q_pii_scrub",  # last green r08
    "q_pipeline_e2e",  # last green r08
    "q_scan_excel",  # last green r08
    "q_scan_jdbc",  # last green r08
    "q_semantic_dedup",  # last green r08
    "q_simjoin_prefix",  # last green r08
    "q_stream_stream_join",  # last green r08
    "q_streaming_dedup",  # last green r08
    "q_streaming_enrich",  # last green r08
    "q_streaming_ohlcv",  # last green r08
    "q_streaming_sessions",  # last green r08
    "q_tags_resolve",  # last green r08
    "q_train_test_split",  # last green r08
    "q_trend_slope_sql",  # last green r08
    "q_union_all",  # last green r08
    "q_bigram_lm",  # last green r09
    "q_bm25",  # last green r09
    "q_bpe_train",  # last green r09
    "q_containment",  # last green r09
    "q_corpus_report",  # last green r09
    "q_data_mixture",  # last green r09
    "q_datapipe_e2e_v2",  # last green r09
    "q_dedup_exact",  # last green r09
    "q_doc_chunking",  # last green r09
    "q_embedding_pool",  # last green r09
    "q_grouping_sets",  # last green r09
    "q_having_large_orders",  # last green r09
    "q_heavy_hitters",  # last green r09
    "q_idle_rich_customers",  # last green r09
    "q_importance_resample",  # last green r09
    "q_label_propagation",  # last green r09
    "q_linreg_train",  # last green r09
    "q_median_mode",  # last green r09
    "q_merge_upsert",  # last green r09
    "q_min_price_supplier",  # last green r09
    "q_percentiles",  # last green r09
    "q_perplexity_buckets",  # last green r09
)


def _family_rank(name: str, spec: QuerySpec) -> tuple[int, int]:
    if name in _RISKIEST:
        return (0, _RISKIEST.index(name))
    mod = spec.builder.__module__
    if mod.endswith("queries_datapipe"):
        return (1, 0)
    if mod.endswith("queries_streaming"):
        return (2, 0)
    return (3, 0)


def _ordered_specs() -> list[tuple[str, QuerySpec]]:
    _load_all()
    # Phantom prefix entries fail loudly: a _RISKIEST name that no
    # queries_* module registers would silently waste a gate slot.
    missing = [n for n in _RISKIEST if n not in QUERIES]
    if missing:
        raise AssertionError(
            f"_RISKIEST names not registered in QUERIES: {missing}"
        )
    # sorted() is stable: within a family, registration order is kept.
    return sorted(QUERIES.items(), key=lambda kv: _family_rank(*kv))


def queries_map() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in _ordered_specs()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered_specs() if spec.oracle}


_loaded = False


def _load_all() -> None:
    """Import the query modules (registration side effect), once."""
    global _loaded
    if not _loaded:
        from . import queries_core  # noqa: F401
        from . import queries_datapipe  # noqa: F401
        from . import queries_streaming  # noqa: F401
        from . import queries_subquery  # noqa: F401
        from . import queries_tokenizer  # noqa: F401
        _loaded = True
