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
# The priority prefix rotates each round: queries that already hold a green
# driver row (union of CORRECTNESS_r02–r04 on current-generation testdata)
# are dropped from the prefix so the sample reaches never-gated queries
# first.  Round-5 prefix = the 12 queries that have never had a driver row
# (VERDICT r4 Missing #1), then round-5 additions and any query whose
# OUTPUT changed this round (a green r04 row does not certify new output),
# then queries whose implementation was touched this round.
_RISKIEST: tuple[str, ...] = (
    # never driver-sampled (all pass the local replica gate)
    "q_grouping_sets",
    "q_idle_rich_customers",
    "q_order_count_distribution",
    "q_supplier_excl_count",
    "q_top_revenue_supplier",
    "q_qualified_suppliers",
    "q_promo_revenue",
    "q_profit_by_nation_year",
    "q_up_streaks",
    "q_source_divergence",
    "q_zipf_fit",
    "q_variant_extract",
    # round-5 additions — new operators go under the driver gate first
    "q_dashboard_session",
    "q_ann_recall_ivf",  # output changed: multi-probe recall at n_probe 1/2/4
    # round-5 touched implementations — re-gate after the decimal-sum fix
    "q_market_share",
    "q_small_qty_revenue",
    # everything after the prefix is already r04-green; family rank fills
    # the remaining sample slots with re-verification of existing rows.
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
        from . import queries_subquery  # noqa: F401
        _loaded = True
