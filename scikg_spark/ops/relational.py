"""Relational operator coverage over the TPC-H-ish tables — the rebuild's
joins/aggregations/windows/set-ops (SURVEY.md §2.3-2.6 map these to Spark
built-ins; these queries prove the mappings under the DuckDB oracle).

Plan hygiene: dimension sides are broadcast, filters sit on the scan
(pushed-down parquet predicates), aggregates are partial-before-shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style roll-up (A1/A4 aggregation analog)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customer_revenue(spark, sf_dir):
    """3-way join + top-k (broadcast the dimension chain)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        # orders is a fact table (~1.5M rows/SF): no broadcast hint — AQE
        # picks the strategy by size; only the true dimension broadcasts
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_user_first_event(spark, sf_dir):
    """Window function coverage (O3 argmax-per-group analog)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type",
                F.round("value", 4).alias("value_r"))
    )


def q_event_type_overlap(spark, sf_dir):
    """Set-op coverage: users having BOTH of the two most common event types
    (INTERSECT), minus users of the rarest (EXCEPT).

    Fully declarative: the type ranking is a broadcast-joined aggregate of
    the same scan, not a driver collect at plan-build — the plan stays
    buildable before any data exists and the histogram job runs inside the
    query, not at registration. The ranking window is over the (metadata-
    sized) per-type counts; its constant partition key is column-derived so
    it survives constant folding (same trick as similarity's centroid id)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id").isNotNull())
    counts = ev.groupBy("event_type").agg(F.count("*").alias("c"))
    w_top = Window.partitionBy(F.substring("event_type", 1, 0)) \
        .orderBy(F.desc("c"), F.asc("event_type"))
    w_rare = Window.partitionBy(F.substring("event_type", 1, 0)) \
        .orderBy(F.asc("c"), F.desc("event_type"))
    ranked = counts.withColumn("r_top", F.row_number().over(w_top)) \
                   .withColumn("r_rare", F.row_number().over(w_rare))

    def users_of(rank_col, rank):
        pick = ranked.filter(F.col(rank_col) == rank).select("event_type")
        return ev.join(F.broadcast(pick), "event_type") \
                 .select("user_id").distinct()

    return (
        users_of("r_top", 1).intersect(users_of("r_top", 2))
        .exceptAll(users_of("r_rare", 1))
        .orderBy("user_id")
    )


def q_nation_order_priority(spark, sf_dir):
    """Grouped aggregation through a snowflake join with pushed filters."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.filter(F.col("o_totalprice") > 1000.0)
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


ORACLE = {
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_top_customer_revenue": """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q_user_first_event": """
        SELECT user_id, event_id, event_type, round(value, 4) AS value_r
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts ASC, event_id ASC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "q_event_type_overlap": """
        WITH counts AS (
            SELECT event_type, count(*) AS c FROM events
            WHERE user_id IS NOT NULL
            GROUP BY 1 ORDER BY c DESC, event_type ASC
        ),
        tops AS (SELECT event_type, row_number() OVER (ORDER BY c DESC, event_type ASC) AS r
                 FROM counts),
        rare AS (SELECT event_type, row_number() OVER (ORDER BY c ASC, event_type DESC) AS r
                 FROM counts)
        SELECT DISTINCT user_id FROM events
        WHERE user_id IS NOT NULL
          AND event_type = (SELECT event_type FROM tops WHERE r = 1)
          AND user_id IN (SELECT user_id FROM events
                          WHERE event_type = (SELECT event_type FROM tops WHERE r = 2))
          AND user_id NOT IN (SELECT user_id FROM events
                              WHERE user_id IS NOT NULL
                                AND event_type = (SELECT event_type FROM rare WHERE r = 1))
        ORDER BY user_id
    """,
    "q_nation_order_priority": """
        SELECT n_name, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_totalprice > 1000.0
        GROUP BY n_name, o_orderpriority
    """,
}


def q_orders_by_month(spark, sf_dir):
    """Date-function coverage: monthly order roll-up."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def q_events_sessionize(spark, sf_dir, gap_sec: int = 1800):
    """lag-window sessionization: sessions = 1 + count(gaps > 30min)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull() |
            ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > gap_sec),
            1).otherwise(0))
    return (
        gaps.groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


def q_part_type_stats(spark, sf_dir):
    """Fact-to-dim join WITHOUT a broadcast hint: AQE picks the strategy."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_type")
        .agg(F.count("*").alias("n_items"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


def q_supplier_balance_rank(spark, sf_dir):
    """rank() window: top-3 suppliers by balance per nation."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "s_suppkey", "s_name",
                F.round("s_acctbal", 2).alias("balance"), "rnk")
    )


ORACLE.update({
    "q_orders_by_month": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2
    """,
    "q_events_sessionize": """
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM (
            SELECT user_id,
                   CASE WHEN prev_ts IS NULL
                             OR date_diff('second', prev_ts, ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS prev_ts
                  FROM events))
        GROUP BY user_id
    """,
    "q_part_type_stats": """
        SELECT p_type, count(*) AS n_items,
               round(avg(l_quantity), 4) AS avg_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    """,
    "q_supplier_balance_rank": """
        SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS balance, rnk
        FROM (SELECT n_name, s_suppkey, s_name, s_acctbal,
                     CAST(rank() OVER (PARTITION BY n_name
                                  ORDER BY s_acctbal DESC, s_suppkey ASC) AS BIGINT) AS rnk
              FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        WHERE rnk <= 3
    """,
})


def q_asof_event_order(spark, sf_dir):
    """AS-OF join — a custom operator Spark lacks natively, expressed as the
    union+window composition: for each event, the user's most recent order
    with o_orderdate <= ts. Oracle uses DuckDB's native ASOF JOIN, so the
    duel checks the full as-of semantics."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id")
    # make the as-of target unique per (user, timestamp): DuckDB's ASOF picks
    # an arbitrary row among equal timestamps, so ties must not exist for the
    # duel to be well-defined — keep the max orderkey per (custkey, date)
    raw_orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey"))
    orders = (
        raw_orders.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
            "o_orderkey", "o_totalprice")
    )
    left = ev.select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(1).alias("is_left"))
    right = orders.select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey", "o_totalprice",
        F.lit(0).alias("is_left"))
    # at equal ts the right row sorts first, so '<=' semantics hold
    w = (Window.partitionBy("user_id")
         .orderBy(F.asc("ts"), F.asc("is_left"), F.asc("o_orderkey"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = left.unionByName(right).withColumn(
        "asof_orderkey",
        F.last(F.when(F.col("is_left") == 0, F.col("o_orderkey")),
               ignorenulls=True).over(w)).withColumn(
        "asof_totalprice",
        F.last(F.when(F.col("is_left") == 0, F.col("o_totalprice")),
               ignorenulls=True).over(w))
    return (
        merged.filter(F.col("is_left") == 1)
        .select("event_id", "user_id", "asof_orderkey",
                F.round("asof_totalprice", 2).alias("asof_totalprice"))
    )


ORACLE["q_asof_event_order"] = """
    WITH uniq_orders AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                         ORDER BY o_orderkey DESC) AS _rn
            FROM orders) WHERE _rn = 1
    )
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS asof_orderkey,
           round(o.o_totalprice, 2) AS asof_totalprice
    FROM events e
    ASOF LEFT JOIN uniq_orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_lineitem_rollup(spark, sf_dir):
    """ROLLUP grouping-sets coverage with grouping() indicator columns."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_quantity"), 2).alias("qty"),
             F.grouping("l_returnflag").cast("long").alias("g1"),
             F.grouping("l_linestatus").cast("long").alias("g2"))
    )


ORACLE["q_lineitem_rollup"] = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g1,
           CAST(grouping(l_linestatus) AS BIGINT) AS g2
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_customers_without_orders(spark, sf_dir):
    """ANTI-join coverage: customers having no orders at all."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_active_customers(spark, sf_dir):
    """SEMI-join coverage: customers with at least one order above 1000."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_totalprice") > 1000.0)
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
        .select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("balance"))
    )


ORACLE.update({
    "q_customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "q_active_customers": """
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS balance
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 1000.0)
    """,
})


def q_price_percentiles(spark, sf_dir):
    """Exact-percentile aggregation coverage: median / p90 extended price
    per return flag. Spark ``percentile`` and DuckDB ``percentile_cont``
    use the same linear interpolation, so values duel exactly (rounded).
    At scale the exact percentile is a sort-based aggregate — acceptable
    per-group; use approx_percentile when a sketch is enough."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2)
             .alias("p50"),
             F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2)
             .alias("p90"))
    )


ORACLE["q_price_percentiles"] = """
    SELECT l_returnflag, count(*) AS n,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p90
    FROM lineitem GROUP BY l_returnflag
"""
