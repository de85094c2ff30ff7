"""Relational (TPC-H-shaped) + storage/IO round-trip queries."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as _F

from userbehavioranalysis_spark import jobs as _jobs  # noqa: F401
from userbehavioranalysis_spark.functions import text as _T  # noqa: F401
from userbehavioranalysis_spark.operators import dedup as _dedup  # noqa: F401
from userbehavioranalysis_spark.operators import sequences as _seq  # noqa: F401
from userbehavioranalysis_spark.operators import similarity as _sim  # noqa: F401
from userbehavioranalysis_spark.operators import topn  # noqa: F401
from userbehavioranalysis_spark.operators import windowed_counts as wc  # noqa: F401
from userbehavioranalysis_spark.operators.graph import (  # noqa: F401
    item_triangles_oracle_sql as _triangles_oracle_sql,
    pagerank_oracle_sql as _pagerank_oracle_sql,
)
from userbehavioranalysis_spark.operators.sketches import (  # noqa: F401
    cms_oracle_sql as _cms_oracle_sql,
    histogram_quantiles_oracle_sql as _hq_oracle_sql,
    hll_oracle_sql as _hll_oracle_sql,
)
from userbehavioranalysis_spark.plans import relational as _rel  # noqa: F401
from userbehavioranalysis_spark.registry.core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _STREAM_STAGE_CACHE,
    _tables,
    query,
)
from userbehavioranalysis_spark.sources.readers import (  # noqa: F401
    events_with_item,
    load_testdata,
)


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS sum_base_price,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-06-17'
    GROUP BY 1, 2
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rel.pricing_summary(_tables(spark, sf_dir)["lineitem"])


@query(
    "shipping_priority",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           o_orderpriority,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS revenue_r4
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-06-17'
      AND l_shipdate > TIMESTAMP '1995-06-17'
    GROUP BY 1, 2, 3
    ORDER BY revenue_r4 DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return _rel.shipping_priority(t["customer"], t["orders"], t["lineitem"])


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS revenue_r4
    FROM region, nation, customer, supplier, orders, lineitem
    WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
      AND c_nationkey = n_nationkey AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
    GROUP BY 1
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return _rel.local_supplier_volume(
        t["region"], t["nation"], t["customer"], t["supplier"], t["orders"], t["lineitem"]
    )


@query(
    "market_share",
    oracle="""
    WITH per AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, n2.n_name AS nation,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                        AS DECIMAL(30,12))) AS rev_dec
        FROM lineitem, orders, customer, supplier, part, nation n1, nation n2, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA' AND l_partkey = p_partkey AND p_type = 'PROMO'
          AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        GROUP BY 1, 2
    )
    SELECT o_year, nation,
           round(CAST(rev_dec AS DOUBLE), 4) AS revenue_r4,
           round(CAST(rev_dec AS DOUBLE)
                 / CAST(sum(rev_dec) OVER (PARTITION BY o_year) AS DOUBLE), 6)
               AS share_r6
    FROM per
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shape: supplier-nation share of yearly PROMO revenue sold
    into AMERICA — nation dim in two roles, exact-decimal revenue, a
    window over the per-year totals."""
    t = _tables(spark, sf_dir)
    return _rel.market_share(
        t["region"], t["nation"], t["customer"], t["supplier"],
        t["orders"], t["lineitem"], t["part"],
    )


@query(
    "quantity_tiers",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
        VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0), ('high', 25.0, 60.0)
    )
    SELECT tier, CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS revenue_r4
    FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity < hi
    GROUP BY tier
    """,
)
def q_quantity_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (value ∈ [lo, hi) band lookup): broadcast nested-loop
    against the tiny tier dim — the IP-geo/price-band join shape."""
    return _rel.revenue_by_quantity_tier(_tables(spark, sf_dir)["lineitem"])


@query(
    "pricing_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty,
           CAST(count(*) AS BIGINT) AS count_order,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
               AS grouping_level
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-06-17'
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rel.pricing_rollup(_tables(spark, sf_dir)["lineitem"])


@query(
    "order_priority_checking",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate < TIMESTAMP '1995-06-17'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY 1
    """,
)
def q_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return _rel.order_priority_checking(t["orders"], t["lineitem"])


@query(
    "parts_never_shipped",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS part_count
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    GROUP BY 1
    """,
)
def q_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return _rel.parts_never_shipped(t["part"], t["lineitem"])


@query(
    "large_volume_orders",
    oracle="""
    WITH q AS (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty_dec
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_date,
           round(CAST(o.o_totalprice AS DOUBLE), 2) AS o_totalprice_r2,
           round(CAST(q.qty_dec AS DOUBLE), 2) AS total_qty
    FROM q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shape: aggregate lineitem first, HAVING-filter the per-order
    quantity, broadcast the surviving key set back into orders⋈customer."""
    t = _tables(spark, sf_dir)
    return _rel.large_volume_orders(t["customer"], t["orders"], t["lineitem"])


@query(
    "top_return_customers",
    oracle="""
    WITH rev AS (
        SELECT o.o_custkey,
               round(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                                   * (CAST(1 AS DECIMAL(18,6))
                                      - CAST(l.l_discount AS DECIMAL(18,6)))
                                   AS DECIMAL(30,12))) AS DOUBLE), 4) AS returned_rev_r4
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1
    )
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(CAST(c.c_acctbal AS DOUBLE), 2) AS acctbal_r2,
           rev.returned_rev_r4
    FROM rev
    JOIN customer c ON rev.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY returned_rev_r4 DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q_top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shape: returned-revenue per customer, top 20 via
    TakeOrderedAndProject with a deterministic custkey tie-break."""
    t = _tables(spark, sf_dir)
    return _rel.top_return_customers(
        t["customer"], t["nation"], t["orders"], t["lineitem"]
    )


@query(
    "promo_revenue_share",
    oracle="""
    WITH agg AS (
        SELECT sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                                  * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                                  AS DECIMAL(30,12))
                        ELSE CAST(0 AS DECIMAL(30,12)) END) AS promo_dec,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                        AS DECIMAL(30,12))) AS total_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT round(CAST(promo_dec AS DOUBLE), 4) AS promo_revenue_r4,
           round(CAST(total_dec AS DOUBLE), 4) AS total_revenue_r4,
           round(CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6)
               AS promo_share_r6
    FROM agg
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shape conditional-aggregate ratio: PROMO-part revenue share,
    one broadcast join + one pass."""
    t = _tables(spark, sf_dir)
    return _rel.promo_revenue_share(t["lineitem"], t["part"])


@query(
    "customers_without_recent_orders",
    oracle="""
    WITH threshold AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS avg_bal
        FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,6)) > 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS total_acctbal_r2
    FROM customer, threshold
    WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q_customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shape scalar-subquery threshold + anti-join: above-average
    balance, no order since 2000 (lapsed high-value customers)."""
    t = _tables(spark, sf_dir)
    return _rel.customers_without_recent_orders(t["customer"], t["orders"])


@query(
    "top_supplier",
    oracle="""
    WITH revs AS (
        SELECT l_suppkey,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                        AS DECIMAL(30,12))) AS rev_dec
        FROM lineitem GROUP BY 1
    )
    SELECT s_suppkey, s_name, round(CAST(rev_dec AS DOUBLE), 4) AS revenue_r4
    FROM revs JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_dec = (SELECT max(rev_dec) FROM revs)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shape argmax join-back: max-revenue supplier(s), exact-decimal
    max comparison, no global sort."""
    t = _tables(spark, sf_dir)
    return _rel.top_supplier(t["supplier"], t["lineitem"])


@query(
    "nation_trade_volume",
    oracle="""
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS revenue_r4
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shape bidirectional two-nation trade volume by year; nation
    dim in two roles."""
    t = _tables(spark, sf_dir)
    return _rel.nation_trade_volume(
        t["nation"], t["customer"], t["supplier"], t["orders"], t["lineitem"]
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH p AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN p ON l_partkey = p_partkey
    ),
    stats AS (
        SELECT l_partkey AS k,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
               count(*) AS n
        FROM li GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly_r4
    FROM li JOIN stats ON l_partkey = k
    WHERE CAST(l_quantity AS DECIMAL(18,6)) * CAST(5 AS DECIMAL(3,0))
          * CAST(n AS DECIMAL(12,0)) < sum_qty
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shape correlated-average join-back: revenue in lineitems
    below 20% of their part's average quantity; division-free exact
    boundary (qty*5*n < sum)."""
    t = _tables(spark, sf_dir)
    return _rel.small_quantity_revenue(t["part"], t["lineitem"])


@query(
    "min_cost_supplier",
    oracle="""
    WITH n AS (
        SELECT n_nationkey, n_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ),
    s AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN n ON s_nationkey = n_nationkey
    ),
    supply AS (
        SELECT l_partkey, l_suppkey, s_name, n_name,
               min(CAST(l_extendedprice AS DECIMAL(18,6))) AS cost_dec
        FROM lineitem JOIN s ON l_suppkey = s_suppkey
        GROUP BY 1, 2, 3, 4
    ),
    best AS (
        SELECT l_partkey AS bk, min(cost_dec) AS min_cost
        FROM supply GROUP BY 1
    )
    SELECT p_partkey, p_name, l_suppkey AS s_suppkey, s_name,
           n_name AS supp_nation,
           round(CAST(cost_dec AS DOUBLE), 2) AS min_cost_r2
    FROM supply
    JOIN best ON l_partkey = bk AND cost_dec = min_cost
    JOIN part ON l_partkey = p_partkey
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shape argmin join-back over a lineitem-derived supply
    relation (no partsupp in the testdata); region dims broadcast,
    exact-decimal min equality keeps all ties."""
    t = _tables(spark, sf_dir)
    return _rel.min_cost_supplier(
        t["part"], t["supplier"], t["nation"], t["region"], t["lineitem"]
    )


@query(
    "important_supply_values",
    oracle="""
    WITH s AS (
        SELECT s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
    ),
    vals AS (
        SELECT l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                             * (CAST(1 AS DECIMAL(18,6))
                                - CAST(l_discount AS DECIMAL(18,6)))
                             AS DECIMAL(30,12))) AS DECIMAL(26,6)) AS value_dec
        FROM lineitem JOIN s ON l_suppkey = s_suppkey
        GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(value_dec) AS DECIMAL(30,6)) AS total_dec FROM vals)
    SELECT l_partkey, round(CAST(value_dec AS DOUBLE), 4) AS value_r4
    FROM vals, tot
    WHERE value_dec * CAST(1000000 AS DECIMAL(7,0))
          > total_dec * CAST(10 AS DECIMAL(3,0))
    """,
)
def q_important_supply_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shape scalar-threshold report: parts whose nation-supplied
    trade value exceeds 0.001% of the nation total; division-free
    decimal boundary."""
    t = _tables(spark, sf_dir)
    return _rel.important_supply_values(
        t["supplier"], t["nation"], t["lineitem"]
    )


@query(
    "sole_returning_supplier",
    oracle="""
    WITH per_os AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned
        FROM lineitem GROUP BY 1, 2
    ),
    per_o AS (
        SELECT l_orderkey AS ok, count(*) AS n_supp, sum(returned) AS n_ret
        FROM per_os GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_sole_return_orders
    FROM per_os
    JOIN per_o ON l_orderkey = ok AND n_supp >= 2 AND n_ret = 1
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE returned = 1
    GROUP BY 1, 2
    """,
)
def q_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shape sole-failing-supplier: EXISTS/NOT-EXISTS collapsed to
    one grouped pass (two aggregates on one exchange)."""
    t = _tables(spark, sf_dir)
    return _rel.sole_returning_supplier(t["supplier"], t["lineitem"])


@query(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY 1
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shape histogram incl. zero-order customers (the outer-join
    point); first aggregate reuses the join partitioning."""
    t = _tables(spark, sf_dir)
    return _rel.customer_order_distribution(t["customer"], t["orders"])


@query(
    "disjunctive_bracket_revenue",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6))
                                  - CAST(l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS revenue_r4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size <= 20
           AND l_quantity BETWEEN 2 AND 12)
       OR (p_brand = 'Brand#3' AND p_size <= 30
           AND l_quantity BETWEEN 3 AND 13)
    """,
)
def q_disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shape OR-bracket revenue: disjunction → scan pushdown +
    residual join filter, not a union fan-out."""
    t = _tables(spark, sf_dir)
    return _rel.disjunctive_bracket_revenue(t["part"], t["lineitem"])


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                               * CAST(l_discount AS DECIMAL(18,6))
                               AS DECIMAL(30,12))) AS DOUBLE), 4)
               AS revenue_change_r4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND CAST(l_discount AS DECIMAL(18,6))
          BETWEEN CAST(0.05 AS DECIMAL(18,6)) AND CAST(0.07 AS DECIMAL(18,6))
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shape forecasting aggregate: one scan, zero joins, all three
    predicates pushed to the parquet reader."""
    return _rel.forecast_revenue_change(_tables(spark, sf_dir)["lineitem"])


@query(
    "product_type_profit",
    oracle="""
    WITH p AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    li AS (
        SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
               l_extendedprice, l_discount
        FROM lineitem JOIN p ON l_partkey = p_partkey
    ),
    cost AS (
        SELECT l_partkey AS ck, l_suppkey AS cs,
               min(CAST(l_extendedprice AS DECIMAL(18,6))) AS cost_dec
        FROM li GROUP BY 1, 2
    )
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(CAST(sum(CAST(
               CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (CAST(1 AS DECIMAL(18,6))
                       - CAST(l_discount AS DECIMAL(18,6)))
                    AS DECIMAL(30,12))
               - CAST(CAST(cost_dec AS DECIMAL(19,6))
                      * CAST(l_quantity AS DECIMAL(8,6))
                      AS DECIMAL(30,12))
           AS DECIMAL(32,12))) AS DOUBLE), 4) AS profit_r4
    FROM li
    JOIN cost ON l_partkey = ck AND l_suppkey = cs
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shape profit by (nation, year) over the lineitem-derived
    supply-cost relation; part filter broadcast first, one fact-fact
    shuffle."""
    t = _tables(spark, sf_dir)
    return _rel.product_type_profit(
        t["part"], t["supplier"], t["nation"], t["orders"], t["lineitem"]
    )


@query(
    "shipping_delay_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS critical_lines,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS other_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
          BETWEEN 30 AND 90
    GROUP BY 1
    """,
)
def q_shipping_delay_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shape conditional priority split over delayed shipments —
    one join, one-pass conditional aggregate, integer day math."""
    t = _tables(spark, sf_dir)
    return _rel.shipping_delay_priority_counts(t["orders"], t["lineitem"])


@query(
    "supplier_counts_by_part_attrs",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    per_supp AS (
        SELECT l_suppkey AS bs,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_ret,
               count(*) AS n_tot
        FROM lineitem GROUP BY 1
    ),
    blocked AS (
        SELECT bs FROM per_supp WHERE n_ret * 1000000 > n_tot * 500000
    )
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT bs FROM blocked)
    GROUP BY 1, 2
    """,
)
def q_supplier_counts_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shape supplier diversity per (brand, size) with a derived
    high-return supplier blocklist as the NOT IN."""
    t = _tables(spark, sf_dir)
    return _rel.supplier_counts_by_part_attrs(t["part"], t["lineitem"])


@query(
    "excess_share_suppliers",
    oracle="""
    WITH p AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    li AS (
        SELECT l_partkey, l_suppkey, l_quantity
        FROM lineitem JOIN p ON l_partkey = p_partkey
    ),
    per_pair AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS pair_qty
        FROM li GROUP BY 1, 2
    ),
    per_part AS (
        SELECT l_partkey AS tk, CAST(sum(pair_qty) AS DECIMAL(30,6)) AS part_qty
        FROM per_pair GROUP BY 1
    ),
    dom AS (
        SELECT DISTINCT l_suppkey
        FROM per_pair JOIN per_part ON l_partkey = tk
        WHERE CAST(pair_qty AS DECIMAL(26,6)) * CAST(100 AS DECIMAL(3,0))
              > part_qty * CAST(10 AS DECIMAL(3,0))
    )
    SELECT s_suppkey, s_name, n_name AS supp_nation
    FROM dom
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shape dominant-supplier report: share-of-part-volume test on
    the derived supply relation, division-free decimal boundary."""
    t = _tables(spark, sf_dir)
    return _rel.excess_share_suppliers(
        t["supplier"], t["nation"], t["part"], t["lineitem"]
    )


@query(
    "bloom_filter_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                               * (CAST(1 AS DECIMAL(18,6)) - CAST(l.l_discount AS DECIMAL(18,6)))
                               AS DECIMAL(30,12))) AS DOUBLE), 4) AS revenue_r4
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1, 2
    """,
)
def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join pruning: a DataFrame-built Bloom filter over
    the filtered orders prunes lineitem BEFORE its shuffle; the exact
    join removes the false positives, so the result (and the oracle) is
    the plain inner join — only the exchanged volume differs."""
    from userbehavioranalysis_spark.operators.joinopt import bloom_prefiltered_join

    t = _tables(spark, sf_dir)
    urgent = (
        t["orders"]
        .where(_F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    joined = bloom_prefiltered_join(t["lineitem"], "l_orderkey", urgent, "o_orderkey")
    ext = _F.col("l_extendedprice").cast("decimal(18,6)")
    disc = _F.lit(1).cast("decimal(18,6)") - _F.col("l_discount").cast("decimal(18,6)")
    return joined.groupBy("o_orderkey", "o_custkey").agg(
        _F.count(_F.lit(1)).alias("n_items"),
        _F.round(_F.sum((ext * disc).cast("decimal(30,12)")).cast("double"), 4).alias(
            "revenue_r4"
        ),
    )


@query(
    "merge_upsert_users",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_id, round(value, 2) AS value_r2
        FROM events
    ),
    s AS (
        SELECT user_id, event_type, ts_us, value_r2 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM e WHERE event_id % 2 = 0
        ) WHERE rn = 1
    ),
    c AS (
        SELECT user_id, event_type, ts_us, value_r2,
               (event_type = 'error') AS is_del
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM e WHERE event_id % 2 = 1
        ) WHERE rn = 1
    )
    SELECT user_id,
           CASE WHEN c.user_id IS NOT NULL THEN c.event_type
                ELSE s.event_type END AS event_type,
           CASE WHEN c.user_id IS NOT NULL THEN c.ts_us ELSE s.ts_us END AS ts_us,
           CASE WHEN c.user_id IS NOT NULL THEN c.value_r2
                ELSE s.value_r2 END AS value_r2
    FROM s FULL OUTER JOIN c USING (user_id)
    WHERE NOT COALESCE(c.is_del, false)
    """,
)
def q_merge_upsert_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO applied to a per-user state table: even
    events are the persisted snapshot, odd events the CDC batch
    (compacted to one row per key by latest_state first — the standard
    CDC-apply composition); a user whose newest change is an 'error'
    event is treated as a DELETE.  Updates, inserts, carry-overs and
    deletes in ONE keyed pass."""
    from userbehavioranalysis_spark.operators.compaction import (
        latest_state,
        merge_upsert,
    )

    ev = _tables(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        _F.unix_micros("ts").alias("ts_us"),
        "event_id",
        _F.round("value", 2).alias("value_r2"),
    )
    payload = ["event_type", "ts_us", "value_r2"]
    snap = latest_state(
        ev.where(_F.pmod("event_id", _F.lit(2)) == 0),
        ["user_id"], "ts_us", "event_id", payload,
    )
    changes = latest_state(
        ev.where(_F.pmod("event_id", _F.lit(2)) == 1),
        ["user_id"], "ts_us", "event_id", payload,
    ).withColumn("is_del", _F.col("event_type") == "error")
    return merge_upsert(snap, changes, ["user_id"], "is_del")


_ROUNDTRIP_ORACLE = """
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id,
           event_type, round(value, 2) AS value_r2, props
    FROM events
"""


@query("events_jsonl_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_events_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → line-delimited JSON → schema-explicit FAILFAST read-back;
    the oracle reads the ORIGINAL parquet, so the value hash proves the
    round trip is lossless (incl. microsecond timestamps)."""
    from userbehavioranalysis_spark.sources.formats import events_roundtrip

    return events_roundtrip(spark, sf_dir, "jsonl")


@query("events_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_events_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → schema-explicit read-back, checked against the
    original parquet through the oracle's value hash."""
    from userbehavioranalysis_spark.sources.formats import events_roundtrip

    return events_roundtrip(spark, sf_dir, "orc")


@query("events_compaction_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_events_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (lakehouse OPTIMIZE bin-packing): events
    scattered into 64 micro-batch-sized files, compacted by BYTE budget
    into ~4 via a shuffle-free coalesce rewrite — the oracle reads the
    ORIGINAL parquet, so the value hash proves the rewrite lossless."""
    import math
    import os
    import tempfile

    import pyspark.sql.functions as _F2

    from userbehavioranalysis_spark.operators.compaction import compact_small_files
    from userbehavioranalysis_spark.sources.formats import _STAGE_CACHE

    events = _tables(spark, sf_dir)["events"]
    stage = _STAGE_CACHE.get((sf_dir, "compact"))
    if stage is None or not os.path.isdir(os.path.join(stage, "small")):
        stage = tempfile.mkdtemp(prefix="uba_compact_")
        events.repartition(64).write.mode("overwrite").parquet(
            os.path.join(stage, "small")
        )
        _STAGE_CACHE[(sf_dir, "compact")] = stage
    src = os.path.join(stage, "small")
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    back = compact_small_files(
        spark, src, os.path.join(stage, "compacted"),
        target_bytes=max(1, math.ceil(total / 4)),
    )
    return back.select(
        "event_id",
        _F2.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        _F2.round("value", 2).alias("value_r2"),
        "props",
    )


@query(
    "events_schema_evolution",
    oracle="""
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id,
           CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type,
           CASE WHEN event_id % 2 = 1 THEN round(value, 2) END AS value_r2
    FROM events
    """,
)
def q_events_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeSchema ingest across two differently-shaped parquet batches
    (an early narrow export + a widened one): history surfaces NULLs in
    the added columns, no rewrite — value-hashed against the original
    table."""
    from userbehavioranalysis_spark.sources.formats import events_schema_evolution

    return events_schema_evolution(spark, sf_dir)


@query(
    "events_time_range_scan",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 06:30:00'
      AND ts <  TIMESTAMP '2024-01-12 18:45:00'
    GROUP BY 1, 2
    """,
)
def q_events_time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned event-lake scan: the events table is written
    ONCE as Hive-partitioned (event_date, event_hour) parquet
    (sources/writers.write_time_partitioned_events — one file per
    hour, rows ts-sorted) and a 2.5-day range query reads it back
    through read_time_range, whose predicate prunes whole hour
    DIRECTORIES (PartitionFilters asserted in tests) before the exact
    row-level bound applies.  The oracle runs the same range aggregate
    over the ORIGINAL flat table — hash equality proves the
    partitioned layout is lossless and the pruning result-preserving."""
    import os
    import tempfile

    from userbehavioranalysis_spark.sources.writers import (
        read_time_range,
        write_time_partitioned_events,
    )

    ev = _tables(spark, sf_dir)["events"]
    key = (sf_dir, "events-time-lake")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "lake")):
        stage = tempfile.mkdtemp(prefix="uba_time_lake_")
        write_time_partitioned_events(ev, os.path.join(stage, "lake"))
        _STREAM_STAGE_CACHE[key] = stage
    ranged = read_time_range(
        spark,
        os.path.join(stage, "lake"),
        "2024-01-10 06:30:00",
        "2024-01-12 18:45:00",
    )
    return ranged.groupBy(
        (_F.floor(_F.unix_timestamp("ts") / 3600).cast("long") * 3600).alias(
            "window_start"
        ),
        "event_type",
    ).agg(_F.count(_F.lit(1)).alias("n"))


@query(
    "events_user_delete",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE user_id <> 7
    GROUP BY 1, 2
    """,
)
def q_events_user_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the time-partitioned lake: user 7's
    rows are deleted by rewriting ONLY the hour partitions that
    contain them (sources/writers.delete_rows_partition_scoped —
    dynamic partition overwrite + empty-partition removal; untouched
    partitions proven byte-identical in tests), then the whole lake is
    re-aggregated.  The oracle aggregates the ORIGINAL flat table
    minus the user — hash equality proves the delete removed exactly
    the target rows and nothing else.  Fresh lake per invocation: the
    delete mutates it."""
    import os
    import shutil
    import tempfile

    from userbehavioranalysis_spark.sources.writers import (
        delete_rows_partition_scoped,
        write_time_partitioned_events,
    )

    ev = _tables(spark, sf_dir)["events"]
    # the delete MUTATES its lake, so each invocation works on an
    # OS-level copy of a once-built pristine lake (copytree of the
    # hour dirs is far cheaper than re-running the partitioned write)
    key = (sf_dir, "pristine-time-lake")
    pristine = _STREAM_STAGE_CACHE.get(key)
    if pristine is None or not os.path.isdir(os.path.join(pristine, "lake")):
        pristine = tempfile.mkdtemp(prefix="uba_pristine_lake_")
        write_time_partitioned_events(ev, os.path.join(pristine, "lake"))
        _STREAM_STAGE_CACHE[key] = pristine
    stage = tempfile.mkdtemp(prefix="uba_delete_lake_")
    lake = os.path.join(stage, "lake")
    try:
        shutil.copytree(os.path.join(pristine, "lake"), lake)
        delete_rows_partition_scoped(spark, lake, _F.col("user_id") == 7)
        out = (
            spark.read.parquet(lake)
            .groupBy(
                (_F.floor(_F.unix_timestamp("ts") / 3600).cast("long") * 3600).alias(
                    "window_start"
                ),
                "event_type",
            )
            .agg(_F.count(_F.lit(1)).alias("n"))
            .localCheckpoint()  # materialize before the lake dir vanishes
        )
        return out
    finally:
        shutil.rmtree(stage, ignore_errors=True)
