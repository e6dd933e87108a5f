"""Distributed heavy hitters: exact frequent-item detection whose shuffle
cost scales with the CANDIDATES, not the key cardinality.

The naive `groupBy(key).count().filter(n >= T)` shuffles every distinct
key — at 100 TB with a mostly-unique long tail (URLs, token n-grams,
user ids) the shuffle IS the job. The classical two-pass local-threshold
algorithm keeps the tail on its own partition:

  pass 1  per-partition local counts (one Arrow-batched mapInPandas over
          the key column; nothing shuffles), keep keys whose LOCAL count
          ≥ ceil(T / p). Pigeonhole guarantee: a key with GLOBAL count
          ≥ T must reach that bar in at least one of the p partitions,
          so the candidate union is a superset of every true heavy
          hitter — under ANY partitioning.
  pass 2  exact counts of candidates only: the candidate set broadcasts,
          the stream is semi-join-filtered map-side, and only surviving
          keys enter the final hash aggregate. The long tail never
          crosses the network.

The result is therefore EXACT and partitioning-invariant (extra
candidates are removed by the final `n >= T` filter), which is what lets
a plain SQL `HAVING count(*) >= T` oracle check it bit-for-bit. The
price is a second scan of the input — the streaming-sketch alternative
(count-min + heap) trades that scan for approximate counts; this
operator is the exact side of that tradeoff.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """All keys with exact global count ≥ `threshold`, with their counts.

    `threshold` is an absolute support bar (the practical form: "every
    item seen ≥ T times"); tune it per corpus. Output columns:
    (key, n), n descending with a key tiebreak.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    keyed = df.select(key)
    p = keyed.rdd.getNumPartitions()
    local_t = max(1, -(-threshold // max(p, 1)))  # ceil(T / p)
    out_schema = f"`{key}` {keyed.schema[key].dataType.simpleString()}"

    def local_counts(batches: Iterator) -> Iterator:
        import pandas as pd

        cnt: Counter = Counter()
        for pdf in batches:
            # dropna=False: a frequent NULL key is a heavy hitter too —
            # GROUP BY keeps the NULL group, so must the candidate pass.
            for k, v in pdf[key].value_counts(dropna=False).items():
                cnt[None if pd.isna(k) else k] += int(v)
        yield pd.DataFrame(
            {key: pd.array(
                [k for k, v in cnt.items() if v >= local_t], dtype=object
            )}
        )

    candidates = keyed.mapInPandas(local_counts, out_schema).distinct()
    # eqNullSafe: a plain semi-join key can never match the NULL group
    return (
        df.join(
            F.broadcast(candidates.withColumnRenamed(key, "_hh_cand")),
            on=F.col(key).eqNullSafe(F.col("_hh_cand")),
            how="left_semi",
        )
        .groupBy(key)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
        .orderBy(F.desc("n"), key)
    )
