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
# Round 2 proved the whole relational core green under the driver gate;
# the datapipe/streaming families only ever passed the local replica.
# Surface them first (riskiest named queries up front, then the rest of
# datapipe + streaming, then core) so the driver's sample covers the
# operators most likely to diverge cross-engine.
_RISKIEST: tuple[str, ...] = (
    "q_dedup_minhash_lsh",
    "q_dedup_components",
    "q_ann_ivf",
    "q_kmeans",
    "q_streaming_ohlcv",
    "q_stream_stream_join",
    # round-3 additions — new operators go under the driver gate first
    "q_multimodal_decode",
    "q_scan_excel",
    "q_scan_jdbc",
    "q_trend_slope_sql",
    "q_corpus_shuffle",
    "q_train_test_split",
    "q_dedup_incremental",
    "q_ntile_deciles",  # re-gate: global window -> exact_ntile rewrite
    "q_knn_graph",
    "q_tags_resolve",
    "q_filter_funnel",
    "q_corpus_shard",
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
        _loaded = True
