"""Join / set-operation queries (SURVEY.md §2.3, §2.7).

The reference's only join-shaped operation is a driver-side dict lookup
(Dataset.py:291-312); this module provides the real distributed surface
on the TPC-H-shaped star schema, engineered for 100 TB:

- dimension tables (region, nation — and customer relative to lineitem)
  are broadcast: the fact side never shuffles for the join;
- semi/anti joins never materialize right-side columns;
- money sums are rounded in query (floating-point addition is
  order-sensitive; the oracle hash needs a stable value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.relational import (
    anti_join,
    dim_join,
    semi_join,
)
from big_data_chicago_crimes_spark.operators.skew import salted_join
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables

def REVENUE():
    # built lazily — Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "revenue_by_nation",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name ORDER BY n_name
    """,
    tags=("join", "flagship", "reference:§2.3"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship 5-table star join (TPC-H Q5 shape): revenue per nation.

    Plan shape at scale: lineitem (the 100 TB side) shuffles ONCE on
    l_orderkey to meet orders; customer/nation/region are broadcast —
    with AQE the orders join may itself flip to broadcast at low SF."""
    t = load_tables(spark, sf_dir)
    # customer is NOT hinted: it scales with the fact tables (~1-2% of
    # lineitem bytes), so the broadcast decision belongs to AQE stats;
    # nation (25 rows) and region (5) are bounded → unconditional hint.
    enriched_orders = dim_join(
        t.orders.select("o_orderkey", "o_custkey"),
        t.customer.select("c_custkey", "c_nationkey"),
        t.orders.o_custkey == t.customer.c_custkey,
        hint=None,
    )
    enriched_orders = dim_join(
        enriched_orders,
        t.nation.select("n_nationkey", "n_name", "n_regionkey"),
        enriched_orders.c_nationkey == t.nation.n_nationkey,
    )
    enriched_orders = dim_join(
        enriched_orders,
        t.region.select("r_regionkey"),
        enriched_orders.n_regionkey == t.region.r_regionkey,
    )
    fact = t.lineitem.select("l_orderkey", REVENUE().alias("rev"))
    joined = fact.join(
        enriched_orders.select("o_orderkey", "n_name"),
        fact.l_orderkey == enriched_orders.o_orderkey,
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("n_name")
    )


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch:q1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical wide hash-aggregate:
    8 aggregates over a 6-group key, filter pushed to the parquet scan,
    map-side partials make the shuffle carry only 6 rows per task."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(REVENUE()), 2).alias("sum_disc_price"),
            F.round(F.sum(REVENUE() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "orders_q3_topk_surface",
    # merges the former top_revenue_orders (all-time BUILDING-segment
    # revenue top-10) and shipping_priority_top10 (the date-filtered
    # unshipped-revenue TPC-H Q3) registrations — both r13-green Q3
    # shapes with the IDENTICAL output schema — into one leg-labeled
    # surface (the part_catalog_surface precedent): both join plans
    # still execute and hash-certify in a single registry slot. The
    # slot freed funds embedding_ivf_pq_topk (the r15 slot plan,
    # VERDICT r14 #2).
    oracle="""
        SELECT 'all_time' AS leg, o_orderkey AS orderkey, revenue, orderdate
        FROM (
            SELECT o_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        )
        UNION ALL
        SELECT 'unshipped' AS leg, l_orderkey AS orderkey, revenue, orderdate
        FROM (
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS orderdate
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1999-01-01'
              AND l_shipdate  > TIMESTAMP '1999-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        )
        ORDER BY leg, revenue DESC, orderkey
    """,
    tags=("join", "topk", "tpch:q3"),
)
def orders_q3_topk_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 top-k surface, two legs in one driver row:

    - ``all_time``: top-10 orders by revenue for the BUILDING segment,
      no date filter. The customer filter is applied BEFORE the join
      (semi-join style reduction); no broadcast hints — customer-subset
      and orders both scale with the fact data, so AQE's runtime stats
      make the broadcast-vs-SMJ call (they do go broadcast at bench SF).
    - ``unshipped``: the canonical Q3 — unshipped revenue top-10, both
      date filters pushed to the scans before the joins.

    Both top-10s are TakeOrderedAndProject (per-partition heaps, never a
    global sort)."""
    t = load_tables(spark, sf_dir)
    building = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    all_orders = dim_join(
        t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        building,
        t.orders.o_custkey == building.c_custkey,
        hint=None,
    ).select("o_orderkey", "o_orderdate")
    li_all = t.lineitem.select("l_orderkey", REVENUE().alias("rev"))
    all_time = (
        li_all.join(all_orders, li_all.l_orderkey == all_orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .select(
            F.lit("all_time").alias("leg"),
            F.col("o_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )

    dated_orders = t.orders.filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    dated_orders = dated_orders.join(
        building, dated_orders.o_custkey == building.c_custkey, "left_semi"
    )
    li_unshipped = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    ).select("l_orderkey", REVENUE().alias("rev"))
    unshipped = (
        li_unshipped.join(
            dated_orders, li_unshipped.l_orderkey == dated_orders.o_orderkey
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .select(
            F.lit("unshipped").alias("leg"),
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )
    return all_time.unionByName(unshipped).orderBy(
        "leg", F.col("revenue").desc(), "orderkey"
    )


# segment_customers_with_orders merged into exists_join_surface below —
# the 'segment_customers' leg is the identical semi_join plan.


@register(
    "part_catalog_surface",
    # merges the former top10_part_types (reference O4 top-k,
    # Dataset.py:477's top-10-locations shape) and parts_never_ordered
    # (LEFT ANTI / NOT EXISTS) registrations (both r11-green, both
    # part-catalog scans) into one leg-labeled surface: the
    # TakeOrderedAndProject top-k and the anti join both still execute
    # and hash-certify in a single registry slot (the
    # purchaser_error_overlap precedent). The slot freed funds
    # docs_bigram_perplexity.
    oracle="""
        SELECT 'never_ordered_brand' AS leg, p_brand AS key, n_parts AS cnt
        FROM (
            SELECT p_brand, COUNT(*) AS n_parts
            FROM part
            WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
            GROUP BY p_brand
        )
        UNION ALL
        SELECT 'top_type' AS leg, p_type AS key, cnt
        FROM (
            SELECT p_type, COUNT(*) AS cnt
            FROM part GROUP BY p_type
            ORDER BY cnt DESC, p_type LIMIT 10
        )
        ORDER BY leg, key
    """,
    tags=("join", "anti", "topk", "reference:O4"),
)
def part_catalog_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'never_ordered_brand' leg — LEFT ANTI join (NOT EXISTS): parts
    absent from lineitem, counted by brand. 'top_type' leg — top-10 part
    types (Dataset.py:477's top-10-locations shape) via
    aggregates.top_k: orderBy+limit → TakeOrderedAndProject with a
    p_type tie-break for deterministic hashing."""
    from big_data_chicago_crimes_spark.operators.aggregates import top_k

    t = load_tables(spark, sf_dir)
    never = anti_join(t.part, t.lineitem.select("l_partkey"),
                      t.part.p_partkey == F.col("l_partkey"))
    never_leg = never.groupBy("p_brand").agg(F.count("*").alias("cnt")).select(
        F.lit("never_ordered_brand").alias("leg"),
        F.col("p_brand").alias("key"),
        "cnt",
    )
    top_leg = top_k(t.part, ["p_type"], 10).select(
        F.lit("top_type").alias("leg"),
        F.col("p_type").alias("key"),
        F.col("cnt"),
    )
    return never_leg.unionByName(top_leg).orderBy("leg", "key")


@register(
    "purchaser_error_overlap",
    # merges the former purchasers_with_errors (INTERSECT) and
    # purchasers_without_errors (EXCEPT) registrations into one two-leg
    # query: both set operators still execute and hash-certify in a
    # single registry slot (the driver's 50-row sample window is the
    # scarce resource; the slot freed funds the partitioned-parquet-sink
    # query in layout_queries.py)
    oracle="""
        SELECT 'with' AS leg, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
        )
        UNION ALL
        SELECT 'without' AS leg, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'error'
        )
        ORDER BY leg, user_id
    """,
    tags=("setop", "reference:§2.7"),
)
def purchaser_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct) in one result: purchasing users
    split into those who also errored ('with' leg) and those who never
    did ('without' leg)."""
    t = load_tables(spark, sf_dir)
    buy = t.events.filter(F.col("event_type") == "purchase").select("user_id")
    err = t.events.filter(F.col("event_type") == "error").select("user_id")
    with_leg = buy.intersect(err).select(F.lit("with").alias("leg"), "user_id")
    without_leg = buy.subtract(err).select(F.lit("without").alias("leg"), "user_id")
    return with_leg.unionByName(without_leg).orderBy("leg", "user_id")


@register(
    "all_account_balances",
    oracle="""
        SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(acctbal), 2) AS total_bal
        FROM (
            SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
            UNION ALL
            SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
        ) GROUP BY kind ORDER BY kind
    """,
    tags=("setop", "union"),
)
def all_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name across heterogeneous tables, then aggregate."""
    t = load_tables(spark, sf_dir)
    cust = t.customer.select(F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal"))
    supp = t.supplier.select(F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal"))
    return (
        cust.unionByName(supp)
        .groupBy("kind")
        .agg(F.count("*").alias("n"), F.round(F.sum("acctbal"), 2).alias("total_bal"))
        .orderBy("kind")
    )


@register(
    "exists_join_surface",
    # merges the former late_shipment_orders (TPC-H Q4 conditional
    # left-semi: equi key + inequality residual) and
    # segment_customers_with_orders (plain EXISTS left-semi)
    # registrations — both r13-green semi-join certifications with a
    # (key, count) output — into one leg-labeled surface (the
    # part_catalog_surface precedent): both semi-join plans still
    # execute and hash-certify in a single registry slot. The slot
    # freed funds docs_exact_substring_spans (VERDICT r14 #6).
    oracle="""
        SELECT 'late_shipment' AS leg, o_orderpriority AS key,
               COUNT(*) AS cnt
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'segment_customers' AS leg, c_mktsegment AS key,
               COUNT(*) AS cnt
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        GROUP BY c_mktsegment
        ORDER BY leg, key
    """,
    tags=("join", "semi", "tpch:q4"),
)
def exists_join_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery surface, two left-semi joins in one driver row:

    - ``late_shipment``: TPC-H Q4 shape — orders with ≥1 lineitem
      shipped >60 days after the order date, per priority. A
      CONDITIONAL left-semi join (equi key + inequality residual).
    - ``segment_customers``: customers having ≥1 order, per segment —
      the plain EXISTS left-semi, right side reduced to its join key,
      no right-column materialization.
    """
    t = load_tables(spark, sf_dir)
    o = t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.date_add(o.o_orderdate, 60)
    )
    late = (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.lit("late_shipment").alias("leg"),
            F.col("o_orderpriority").alias("key"),
            "cnt",
        )
    )
    have = semi_join(
        t.customer,
        t.orders.select("o_custkey"),
        t.customer.c_custkey == F.col("o_custkey"),
    )
    segments = (
        have.groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.lit("segment_customers").alias("leg"),
            F.col("c_mktsegment").alias("key"),
            "cnt",
        )
    )
    return late.unionByName(segments).orderBy("leg", "key")


# shipping_priority_top10 merged into orders_q3_topk_surface above — the
# 'unshipped' leg is the identical plan (filters pushed before the joins,
# semi-joined segment customers, TakeOrderedAndProject top-10).


@register(
    "returned_item_top_customers",
    oracle="""
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(c_acctbal, 2) AS acctbal,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate <  TIMESTAMP '1998-07-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "topk", "tpch:q10"),
)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in a
    two-quarter window. The returnflag + date filters push to the scans;
    nation broadcasts; the customer join keys the one fact shuffle."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", REVENUE().alias("rev")
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
    )
    cust = dim_join(
        t.customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        t.nation.select("n_nationkey", "n_name"),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.round("rev", 2).alias("revenue"),
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "supplier_nation_revenue",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(DISTINCT s_suppkey) AS n_suppliers
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    tags=("join", "tpch:q5-supplier-side"),
)
def supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per SUPPLIER nation — the supply-side star path
    (lineitem ⋈ supplier ⋈ nation), complementing revenue_by_nation's
    customer-side path. Supplier scales with the facts → no hint (AQE
    decides); nation is bounded → broadcast."""
    t = load_tables(spark, sf_dir)
    supp = dim_join(
        t.supplier.select("s_suppkey", "s_nationkey"),
        t.nation.select("n_nationkey", "n_name"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = t.lineitem.select("l_suppkey", REVENUE().alias("rev"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


@register(
    "events_by_segment_salted_join",
    oracle="""
        SELECT c_mktsegment,
               ROUND(SUM(value), 2) AS total_value,
               COUNT(*) AS n_events
        FROM events
        JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("join", "skew", "reference:§7.4-risk5"),
)
def events_by_segment_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value per customer market segment, joined through
    ``salted_join`` (operators/skew.py): the explicit skew-mitigation
    path for a hot-key fact/dim join AQE can't split (e.g. the dim is
    broadcast-ineligible and one user_id dominates the event stream).

    The fact side is a deterministic parquet scan (the salt's
    determinism precondition); the dim is replicated ``buckets``× so the
    hot key's rows land on ``buckets`` reducers instead of one. Result
    is identical to the plain join — the DuckDB oracle IS the plain
    join, so the driver's hash check certifies the equivalence at sf0.01
    on top of the constructed-fixture tests (test_relational.py,
    test_dedup.py:146 pins the hot-key spread itself)."""
    t = load_tables(spark, sf_dir)
    fact = t.events.select("user_id", "value")
    dim = t.customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(fact, dim, "user_id", buckets=8, how="inner")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("c_mktsegment")
    )
