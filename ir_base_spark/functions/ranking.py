"""Window-free bounded top-k ranking.

The reference's top-k is a bounded min-heap per query
(/root/reference/src/structures/MyPriorityQueue.java:40-52). The Spark
analog is ``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition
bounded heap + driver merge). Producing the 1-based ``rank`` column via
``row_number`` over an unpartitioned Window would plan a WindowExec in
no-partition mode — a single-partition bottleneck pre-limit, and a
spurious scale warning even post-limit (Catalyst folds constant
partition keys away). Instead: after the bounded heap the k survivors
are re-sorted in ONE partition and numbered positionally —
``monotonically_increasing_id`` yields 0..k-1 in partition row order,
and nondeterministic-expression fencing stops Catalyst reordering the
sort underneath it. No WindowExec anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_bounded(
    df: DataFrame,
    order: list[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Global top-k of ``df`` under ``order`` with a dense 1-based rank.

    Plan: TakeOrderedAndProject (distributed bounded heap, only k rows
    survive) → repartition(1) + in-partition sort of those k rows →
    positional numbering. The single partition holds exactly k rows by
    construction, so this is scale-safe at any input size.
    """
    top = df.orderBy(*order).limit(k)
    one = top.repartition(1).sortWithinPartitions(*order)
    return one.withColumn(
        rank_name, (F.monotonically_increasing_id() + 1).cast("int")
    )
