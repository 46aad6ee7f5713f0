"""Relational operator coverage on the TPC-H-ish testdata tables.

Maps the reference's scan/filter/join/agg/sort/top-k operator families
(SURVEY §2.1-2.4, §2.7-2.8, §2.10) onto declarative DataFrame plans:
Catalyst pushes the filters into the parquet scans, prunes columns,
broadcasts the dimension sides, and keeps all arithmetic in whole-stage
codegen. Monetary aggregates are rounded to 4-6 dp so the DuckDB oracle
hash matches despite summation-order float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped aggregate: filter → groupBy → 8 aggregates.

    Reference analog: corpus-stat aggregation pass (DF/TTF/class counts,
    SURVEY §2.4). Filter is pushed to the parquet scan.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    nation: DataFrame, region: DataFrame,
) -> DataFrame:
    """Q5-shaped multi-join: fact-fact shuffle join + broadcast dims.

    nation/region/customer broadcast; orders⋈lineitem is the only big
    shuffle, on the join key both sides pre-aggregate into.
    """
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def top_customers_per_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, k: int = 3
) -> DataFrame:
    """Per-group bounded top-k via window row_number — the reference's
    MyPriorityQueue per-query top-k shape
    (/root/reference/src/structures/MyPriorityQueue.java:40-52)."""
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spend"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey").asc()
    )
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("n_name", "rank", "c_custkey", "total_spend")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join — the stopword-difference set op (SURVEY §2.8)."""
    return (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey", "c_name")
    )


def order_priority_distinct_union(orders: DataFrame) -> DataFrame:
    """union + distinct — the two-ranking union
    (/root/reference/src/Analyzer/Analyzer.java:423-436)."""
    hi = orders.filter(F.col("o_totalprice") > 200000).select("o_orderpriority")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderpriority"
    )
    return hi.union(urgent).distinct()


def user_event_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization by inactivity gap: lag window + cumulative session
    ids per user — the per-user time-ordered sequence pattern
    (/root/reference/src/Analyzer/UserAnalyzer.java:206-237)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # NTZ-safe epoch secs
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )


def ndcg_by_event_type(events: DataFrame, k: int = 10) -> DataFrame:
    """NDCG@k per event_type over a deterministic pseudo-ranking.

    Ranking: users ordered by total value desc within event_type;
    relevance label: user_id % 4. Gain 2^rel − 1, discount 1/ln(rank+1)
    — the reference evaluator
    (/root/reference/src/Ranker/evaluator/NDCG_Evaluator.java:22-84).
    """
    # rank on the ROUNDED total so summation-order float noise between
    # engines cannot flip near-equal users at the rank boundary (portable
    # floor-rounding — see textops.quality_score)
    ranked_src = events.groupBy("event_type", "user_id").agg(
        (F.floor(F.sum("value") * 1000000.0 + 0.5) / 1000000.0).alias("total_value")
    ).withColumn("rel", (F.col("user_id") % 4).cast("double"))
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    w_ideal = Window.partitionBy("event_type").orderBy(
        F.col("rel").desc(), F.col("user_id").asc()
    )
    ranked = (
        ranked_src.withColumn("rank", F.row_number().over(w_rank))
        .withColumn("irank", F.row_number().over(w_ideal))
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
    dcg = F.sum(
        F.when(F.col("rank") <= k, gain / F.log(F.col("rank") + 1.0)).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(F.col("irank") <= k, gain / F.log(F.col("irank") + 1.0)).otherwise(0.0)
    )
    return ranked.groupBy("event_type").agg(
        F.round(dcg / idcg, 6).alias("ndcg")
    )
