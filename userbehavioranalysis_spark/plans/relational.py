"""Relational benchmark plans over the TPC-H-style testdata tables.

The reference has no relational queries (SURVEY §2.6: J1-J3 are its only
joins), but the engine must also carry a training-data pipeline's
warehouse-side workload; these classic shapes are the bench headliners
exercising the relational optimizer end to end:

- ``pricing_summary``  (TPC-H Q1 shape) — full-scan aggregate: partial
  HashAggregate before the exchange, 4 aggregates over 2 group keys.
- ``shipping_priority`` (Q3 shape) — fact-fact join orders⋈lineitem with
  a broadcast dim filter (customer segment), date predicates pushed to
  the parquet scan.
- ``local_supplier_volume`` (Q5 shape) — five-table star join: all four
  dims broadcast, the single fact (lineitem) never shuffles for joins,
  only for the final group-by.

Scale notes live where they matter: at 100 TB the fact-fact join in Q3
is the one real shuffle; bucketing both facts on orderkey (or relying
on AQE + storage partitioning) removes it.  ``.explain`` on each plan
shows PushedFilters on the scans and BroadcastHashJoin on every dim —
asserted in tests/test_plans.py so regressions in plan shape fail CI,
not just slow down the bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F




def _dsum(col: F.Column) -> F.Column:
    """Engine-portable money sum: exact decimal accumulation, one final
    double conversion.  Distributed double sums are order-dependent in
    the last ulp (partial sums combine in partition order), which would
    wobble the cross-engine value hash; decimal sums are exact, so the
    result is identical no matter the partitioning — on Spark, on
    DuckDB, on a 1000-executor cluster."""
    return F.round(F.sum(col.cast("decimal(18,6)")).cast("double"), 4)


def _dsum_disc() -> F.Column:
    """sum(l_extendedprice * (1 - l_discount)) in exact decimals."""
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    return F.round(F.sum((ext * disc).cast("decimal(30,12)")).cast("double"), 4)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1995-06-17") -> DataFrame:
    """Q1-shape pricing summary: grouped aggregates over one scan."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum_disc().alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-06-17",
) -> DataFrame:
    """Q3-shape shipping priority: dim-filtered fact-fact join + top-N.

    customer (filtered on segment) broadcasts into orders; the
    orders⋈lineitem equi join is the real shuffle; final rank keeps the
    10 highest-revenue orders (deterministic tie-break on orderkey).
    """
    cut = F.lit(cutoff).cast("timestamp_ntz")
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum_disc().alias("revenue_r4"))
        .orderBy(F.desc("revenue_r4"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
            "revenue_r4",
        )
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """Q5-shape star join: revenue per nation where customer and
    supplier share the nation, one region, all dims broadcast."""
    r = region.filter(F.col("r_name") == region_name)
    dims = (
        nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"])
        .select("n_nationkey", "n_name")
    )
    c = customer.join(
        F.broadcast(dims), customer["c_nationkey"] == dims["n_nationkey"]
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"), "n_name")
    s = supplier.select("s_suppkey", F.col("s_nationkey").alias("s_nat"))
    j = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), lineitem["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nat") == F.col("s_nat"))
    )
    return j.groupBy("n_name").agg(_dsum_disc().alias("revenue_r4"))


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    region_name: str = "AMERICA",
    part_type: str = "PROMO",
) -> DataFrame:
    """Q8-shape market share: each supplier nation's share of yearly
    revenue for one part type sold into one customer region.

    Exercises the nation dim in *two roles* (customer-side region
    filter, supplier-side output label) plus a window over the yearly
    totals.  Plan shape at scale: part/customer/supplier dims all
    broadcast (the part filter drops most lineitems before anything
    else), lineitem⋈orders is the one real shuffle, and the share
    window repartitions only the tiny (year, nation) aggregate.
    Revenue accumulates in exact decimals (`_dsum` rationale), so the
    share division sees identical operands on every engine and
    partitioning.
    """
    from pyspark.sql import Window

    r = region.filter(F.col("r_name") == region_name)
    cnat = nation.join(
        F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey")
    c = customer.join(
        F.broadcast(cnat), customer["c_nationkey"] == cnat["n_nationkey"]
    ).select("c_custkey")
    p = part.filter(F.col("p_type") == part_type).select("p_partkey")
    snat = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    s = supplier.join(
        F.broadcast(snat), supplier["s_nationkey"] == F.col("sn_key")
    ).select("s_suppkey", "nation")
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    j = (
        lineitem.join(F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"])
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), lineitem["l_suppkey"] == s["s_suppkey"])
    )
    per = j.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year"), F.col("nation")
    ).agg(F.sum((ext * disc).cast("decimal(30,12)")).alias("rev_dec"))
    w = Window.partitionBy("o_year")
    return per.select(
        "o_year",
        "nation",
        F.round(F.col("rev_dec").cast("double"), 4).alias("revenue_r4"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double"),
            6,
        ).alias("share_r6"),
    )


DEFAULT_TIERS: list[tuple[str, float, float]] = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 25.0),
    ("high", 25.0, 60.0),
]


def revenue_by_quantity_tier(
    lineitem: DataFrame, tiers: list[tuple[str, float, float]] | None = None
) -> DataFrame:
    """Range join: lineitems banded into [lo, hi) quantity tiers.

    The generic range-join shape (value BETWEEN dim.lo AND dim.hi —
    as in IP→geo, price→band, time→calendar lookups) that Spark has no
    native operator for.  With a broadcast dim, Catalyst plans a
    BroadcastNestedLoopJoin: each fact row tests the handful of ranges
    in memory — a map-only pass at any scale, no shuffle of the fact
    side at all.  (For a *large* range table the standard play is
    prefix-bucketing both sides to an equi key + range residual; the
    tier table here is definitionally tiny, so broadcast is the right
    plan at 100 TB too.)  Returns (tier, n_items, revenue_r4).
    """
    spark = lineitem.sparkSession
    t = spark.createDataFrame(
        tiers or DEFAULT_TIERS, "tier string, lo double, hi double"
    )
    j = lineitem.join(
        F.broadcast(t),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
    )
    return j.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        _dsum_disc().alias("revenue_r4"),
    )


def pricing_rollup(lineitem: DataFrame, cutoff: str = "1995-06-17") -> DataFrame:
    """Hierarchical totals via ``rollup`` (grouping sets — absent from
    the reference, SURVEY §2.5; one scan, one shuffle for all levels).

    Emits (l_returnflag, l_linestatus) detail rows plus per-flag
    subtotals and the grand total; null group keys are rendered as
    'ALL' and a ``grouping_level`` disambiguates genuine nulls —
    Catalyst plans a single Expand + HashAggregate, not one job per
    level.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
            F.grouping_id().cast("int").alias("grouping_level"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "count_order",
            "grouping_level",
        )
    )


def order_priority_checking(
    orders: DataFrame, lineitem: DataFrame, cutoff: str = "1995-06-17"
) -> DataFrame:
    """Q4-shape EXISTS: orders (before cutoff) having at least one
    returned line, counted per priority.

    ``left_semi`` is the plan-level EXISTS: the probe side streams
    once, no row duplication however many lines match (a plain inner
    join + distinct would shuffle the multiplied rows first).  The
    existence side is pre-filtered and pre-projected to the join key,
    so the shuffle moves one bigint column.
    """
    flagged = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(flagged, orders["o_orderkey"] == flagged["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def parts_never_shipped(
    part: DataFrame, lineitem: DataFrame, min_qty: int = 45
) -> DataFrame:
    """NOT EXISTS via ``left_anti``: parts with no bulk lineitem
    (quantity > ``min_qty``), counted per brand.  Same shuffle
    discipline as the semi form — the anti side is pre-filtered and
    reduces to a single key column."""
    bulk = lineitem.filter(F.col("l_quantity") > min_qty).select("l_partkey")
    return (
        part.join(bulk, part["p_partkey"] == F.col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("part_count"))
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """Q18-shape HAVING-subquery join-back: orders whose total lineitem
    quantity exceeds ``min_qty``, annotated with their customer.

    The scale-critical ordering: aggregate lineitem FIRST (partial
    HashAggregate combines map-side, the shuffle carries one row per
    order), apply the HAVING filter on the aggregate, and only then
    join.  The surviving order set is tiny by construction (the filter
    is in the distribution's tail), so it is small enough to broadcast
    into orders and the orders⋈customer join stays the only real
    shuffle.  The naive plan — join everything, then aggregate —
    shuffles the full multiplied fact join; this one shuffles lineitem
    once, reduced.  The broadcast is deliberately NOT forced: the
    surviving set's size depends entirely on the caller's ``min_qty``
    (a low threshold keeps most orders), so a hint would bypass the
    autoBroadcastJoinThreshold guard and can OOM the driver at scale —
    AQE converts the join to broadcast at runtime whenever the
    filtered aggregate actually is small.

    Quantity sums accumulate in exact decimals (`_dsum` rationale) so
    the HAVING boundary cannot wobble with partition order.
    """
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit(min_qty).cast("decimal(18,6)"))
        .select("l_orderkey", F.round(F.col("qty_dec").cast("double"), 2).alias("total_qty"))
    )
    return (
        orders.join(qty, orders["o_orderkey"] == qty["l_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_date"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice_r2"),
            "total_qty",
        )
    )


def top_return_customers(
    customer: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    n: int = 20,
) -> DataFrame:
    """Q10-shape returned-revenue ranking: the ``n`` customers who
    returned the most revenue, with their nation.

    Plan shape at scale: the returnflag filter pushes into the lineitem
    scan, orders⋈lineitem is the one fact-fact shuffle, nation
    broadcasts into customer, and the rev⋈customer join runs on the
    already-aggregated per-customer side — deliberately NOT a forced
    broadcast, because customer is the second-largest dim and won't fit
    a broadcast at 100 TB (AQE still converts it at small SF).  The
    final ``ORDER BY revenue DESC LIMIT n`` compiles to
    TakeOrderedAndProject — each task keeps a local top-n heap and the
    driver merges n·tasks rows, never a global sort.  Ties break on
    c_custkey so the cut is deterministic cross-engine.
    """
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    nat = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("nation")
    )
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == F.col("cn_key")
    ).select("c_custkey", "c_name", "c_acctbal", "nation")
    rev = (
        returned.join(
            orders.select("o_orderkey", "o_custkey"),
            returned["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(_dsum_disc().alias("returned_rev_r4"))
    )
    return (
        rev.join(cust, rev["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "nation",
            F.round(F.col("c_acctbal").cast("double"), 2).alias("acctbal_r2"),
            "returned_rev_r4",
        )
        .orderBy(F.col("returned_rev_r4").desc(), F.col("c_custkey").asc())
        .limit(n)
    )


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame, promo_type: str = "PROMO"
) -> DataFrame:
    """Q14-shape conditional-aggregate ratio: the share of revenue from
    parts of one type, computed in a single pass.

    Plan shape: part broadcasts into lineitem (the only join), then ONE
    aggregation produces both the conditional numerator and the total —
    no second scan, no self-join.  At 100 TB the fact scans once, the
    conditional ``sum(CASE …)`` partial-aggregates map-side, and the
    exchange carries exactly one row per partition.  Revenue
    accumulates in exact decimals (`_dsum` rationale) so the ratio is
    bit-stable across engines and partitionings.
    """
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    rev = (ext * disc).cast("decimal(30,12)")
    agg = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .agg(
            F.sum(F.when(F.col("p_type") == promo_type, rev).otherwise(
                F.lit(0).cast("decimal(30,12)"))).alias("promo_dec"),
            F.sum(rev).alias("total_dec"),
        )
    )
    return agg.select(
        F.round(F.col("promo_dec").cast("double"), 4).alias("promo_revenue_r4"),
        F.round(F.col("total_dec").cast("double"), 4).alias("total_revenue_r4"),
        F.round(
            F.col("promo_dec").cast("double") / F.col("total_dec").cast("double"), 6
        ).alias("promo_share_r6"),
    )


def customers_without_recent_orders(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """Q22-shape anti-join with a scalar-subquery threshold: customers
    whose balance exceeds the average positive balance but who placed
    no order since ``since`` — the lapsed-high-value-customer report —
    summarized per market segment.

    Plan shape: the scalar average is a one-row aggregate broadcast
    into the customer scan (a literal-like cross join, no shuffle);
    the no-recent-orders test is a LEFT ANTI join against a
    date-filtered one-column projection of orders (the date predicate
    pushes to the parquet scan).  At scale the anti-join shuffles
    customer against that pruned projection — or flips to broadcast
    when either filtered side is small enough for AQE to convert.
    """
    bal = F.col("c_acctbal").cast("decimal(18,6)")
    # exact decimal sum, ONE double division: both engines see identical
    # operands, so the resulting threshold double (and the boundary set)
    # is bit-identical regardless of partition order
    threshold = customer.where(bal > 0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = (
        customer.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp_ntz")
    ).select("o_custkey")
    no_orders = rich.join(
        recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2
        ).alias("total_acctbal_r2"),
    )


def top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q15-shape argmax join-back: the supplier(s) with maximum revenue.

    Plan shape: one aggregation builds per-supplier revenue, a one-row
    max over it broadcasts back, and the equality join keeps the
    argmax rows — no global sort, no window over an unpartitioned
    frame (the classic Q15 view-max formulation).  The max comparison
    happens on the EXACT decimal revenue, never the rounded double, so
    cross-engine ties cannot be manufactured by rounding.  Supplier
    names arrive via a broadcast dim join at the very end, on the
    (tiny) argmax set only.
    """
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    revs = lineitem.groupBy("l_suppkey").agg(
        F.sum((ext * disc).cast("decimal(30,12)")).alias("rev_dec")
    )
    mx = revs.agg(F.max("rev_dec").alias("mx_dec"))
    return (
        revs.crossJoin(F.broadcast(mx))
        .where(F.col("rev_dec") == F.col("mx_dec"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_dec").cast("double"), 4).alias("revenue_r4"),
        )
    )


def nation_trade_volume(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """Q7-shape bidirectional trade volume: yearly revenue shipped
    between two nations, in both directions, keyed by (supplier
    nation, customer nation, year).

    Plan shape: the nation dim enters TWICE under different roles
    (supplier side / customer side); each side pre-filters to the two
    nations before joining its fact, so lineitem⋈orders stays the
    single real shuffle and the cross-direction predicate
    (``supp_nation != cust_nation``) is evaluated before the
    aggregation.  Only the 25-row nation dim carries an explicit
    broadcast hint: filtered customer/supplier are 2/25 of their
    tables — small here, but at 100 TB still far beyond driver memory,
    so their joins are left to AQE to convert when actually small
    (the `large_volume_orders` forced-broadcast lesson).
    """
    pair = (nation_a, nation_b)
    n_s = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(
        F.broadcast(n_s), supplier["s_nationkey"] == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n_c), customer["c_nationkey"] == F.col("cn_key")
    ).select("c_custkey", "cust_nation")
    o = orders.join(
        cust, orders["o_custkey"] == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate", "cust_nation")
    return (
        lineitem.join(supp, lineitem["l_suppkey"] == F.col("s_suppkey"))
        .join(o, lineitem["l_orderkey"] == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("integer").alias("o_year"),
        )
        .agg(_dsum_disc().alias("revenue_r4"))
    )


def small_quantity_revenue(
    part: DataFrame, lineitem: DataFrame, name_token: str = "red"
) -> DataFrame:
    """Q17-shape correlated-average join-back: yearly-averaged revenue
    lost to small orders — lineitems whose quantity is below 20% of
    that part's average order quantity, for parts whose name contains
    ``name_token`` (stand-in for TPC-H's brand/container predicate —
    the testdata part table has no container column).

    Plan shape: the part filter broadcasts into lineitem FIRST, so the
    per-part average aggregates only the filtered fact (TPC-H's
    correlated scalar subquery = aggregate-then-join-back; computing
    the average after the part restriction is equivalent because the
    average is per part).  The per-part aggregate is one row per
    surviving part — AQE broadcasts it back into the same filtered
    scan, so lineitem shuffles once (partial agg on l_partkey) and the
    final global aggregate is a single row.

    The 20%-of-average comparison never divides: ``qty * 5 * n_lines <
    sum_qty`` in exact decimals, so the boundary set is bit-identical
    across engines and partition orders.
    """
    p = part.where(F.col("p_name").contains(name_token)).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    stats = li.groupBy(F.col("l_partkey").alias("sq_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sum_qty_dec"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    qty5n = (
        F.col("l_quantity").cast("decimal(18,6)")
        * F.lit(5).cast("decimal(3,0)")
        * F.col("n_lines").cast("decimal(12,0)")
    )
    return (
        li.join(stats, F.col("l_partkey") == F.col("sq_partkey"))
        .where(qty5n < F.col("sum_qty_dec"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.round(
                (
                    F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                        "double"
                    )
                    / F.lit(7.0)
                ),
                4,
            ).alias("avg_yearly_r4"),
        )
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """Q2-shape min-cost-supplier argmin join-back, adapted to the
    testdata schema: there is no partsupp table, so the supply relation
    is DERIVED from observed trade — per (part, supplier) the minimum
    extended price ever charged is the supply cost.

    Plan shape mirrors Q15's argmax: build the supply relation with one
    lineitem aggregate (partial agg on the composite key — the only
    fact shuffle), restrict suppliers to the region via broadcast
    nation⋈region dims, take the per-part min cost with a second (tiny,
    per-part) aggregate, and join back on exact-decimal cost equality
    to recover the argmin supplier(s).  No window over an unpartitioned
    frame, no global sort; ties (two suppliers at the same min cost)
    are all kept, which is what join-back-on-equality means and what
    the oracle's correlated-min formulation returns.
    """
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(
        F.broadcast(r), nation["n_regionkey"] == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(n), supplier["s_nationkey"] == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "n_name")
    supply = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(18,6)")).alias("cost_dec")
        )
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
    )
    best = supply.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost_dec").alias("min_cost_dec")
    )
    return (
        supply.join(
            best,
            (supply["l_partkey"] == F.col("mc_partkey"))
            & (supply["cost_dec"] == F.col("min_cost_dec")),
        )
        .join(
            part.select("p_partkey", "p_name"),
            supply["l_partkey"] == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.round(F.col("cost_dec").cast("double"), 2).alias("min_cost_r2"),
        )
    )


def important_supply_values(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_1",
    fraction_bp100: int = 10,
) -> DataFrame:
    """Q11-shape important-stock report, adapted (no partsupp): per
    part, the traded value ``sum(extendedprice * (1 - discount))``
    supplied by ``nation_name``'s suppliers, keeping parts whose value
    exceeds ``fraction_bp100`` / 1 000 000 of the nation's total (10 →
    0.001%, Q11's scaled fraction).

    Plan shape: suppliers restrict via a broadcast nation dim, the
    filtered fact aggregates per part (one shuffle, partial agg), and
    the global total is a ONE-ROW aggregate broadcast back — the
    scalar-subquery pattern (Q22's threshold) on an aggregate input.
    The threshold comparison multiplies by an integer instead of
    dividing (``value * 1_000_000 > total * fraction_bp100``).  Both
    sides first settle onto scale-6 decimals — a rounding BOTH engines
    perform half-away-from-zero on the same exact operand — because a
    scale-12 value times 10^6 needs precision 40 and Spark's
    precision-loss rule would silently re-round ONE side only; at
    (26,6)×(7,0) → (34,6) every product stays exact in both engines and
    the boundary cannot wobble.
    """
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    s = supplier.join(
        F.broadcast(n), supplier["s_nationkey"] == F.col("n_nationkey")
    ).select("s_suppkey")
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    vals = (
        lineitem.join(F.broadcast(s), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum((ext * disc).cast("decimal(30,12)"))
            .cast("decimal(26,6)")
            .alias("value_dec")
        )
    )
    total = vals.agg(F.sum("value_dec").cast("decimal(30,6)").alias("total_dec"))
    keep = (
        F.col("value_dec") * F.lit(1_000_000).cast("decimal(7,0)")
        > F.col("total_dec") * F.lit(fraction_bp100).cast("decimal(3,0)")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .where(keep)
        .select(
            "l_partkey",
            F.round(F.col("value_dec").cast("double"), 4).alias("value_r4"),
        )
    )


def sole_returning_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q21-shape sole-failing-supplier report, adapted: the testdata
    lineitem has no commit/receipt dates, so 'failed delivery' is
    ``l_returnflag = 'R'`` — suppliers who were the ONLY supplier with
    returned lines on a multi-supplier order, counted per supplier.

    Q21's EXISTS / NOT EXISTS pair collapses into one grouped pass:
    per (order, supplier) compute a returned flag, per order count
    suppliers and returning suppliers (EXISTS another supplier ⇔
    ``n_supp >= 2``; NOT EXISTS another returning supplier ⇔
    ``n_ret = 1``), then join the qualifying orders back to their
    single returning supplier.  Two aggregates ride ONE exchange (both
    key on l_orderkey; the second is a near-no-op after the first),
    versus the four correlated-subquery scans of the literal SQL.
    """
    per_os = (
        lineitem.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("returned"))
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("ro_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("returned").alias("n_ret"),
    )
    culprits = (
        per_os.where(F.col("returned") == 1)
        .join(
            per_o.where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1)),
            F.col("l_orderkey") == F.col("ro_orderkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_sole_return_orders"))
    )
    return culprits.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")),
        culprits["l_suppkey"] == F.col("s_suppkey"),
    ).select("s_suppkey", "s_name", "n_sole_return_orders")


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """Q13-shape customer-distribution histogram: for each order count
    c, how many customers placed exactly c qualifying orders —
    INCLUDING the zero-order customers (the whole point of Q13's left
    outer join; the testdata stands in TPC-H's comment-pattern
    exclusion with an order-priority exclusion).

    Plan shape: the exclusion filter pushes into the orders scan (it is
    a join-side predicate on the OUTER join's right side, so Catalyst
    may push it below the join — asserted in the plan test); the outer
    join shuffles orders against customer on custkey; both aggregates
    after it are tiny (|customers|, then |distinct counts|).  At scale
    the one real exchange is the join — and because the first aggregate
    keys on the SAME custkey, it reuses the join's partitioning
    exchange-free.
    """
    o = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, customer["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def disjunctive_bracket_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q19-shape disjunctive-predicate revenue: three OR'd brackets of
    correlated (brand, size, quantity) conditions — the classic test
    that an optimizer converts a disjunction into scan-level pushdown
    plus a residual join filter instead of a fan-out union.

    Bracket b (b = 1, 2, 3): p_brand = Brand#b, p_size ≤ 10·b, and
    l_quantity in [b, b + 10].  The common conjuncts each side CAN
    push (part: size ≤ 30 over all brackets' union bound; lineitem:
    quantity between 1 and 13) land in PushedFilters; the exact
    bracket correlation evaluates as the join's residual condition.
    One broadcast join (the filtered part side is small), one scan
    each, exact-decimal revenue.
    """
    p = part.select("p_partkey", "p_brand", "p_size")
    li = lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    qty = F.col("l_quantity")
    bracket = None
    for b in (1, 2, 3):
        cond = (
            (F.col("p_brand") == f"Brand#{b}")
            & (F.col("p_size") <= 10 * b)
            & (qty >= b)
            & (qty <= b + 10)
        )
        bracket = cond if bracket is None else (bracket | cond)
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(bracket)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum((ext * disc).cast("decimal(30,12)")).cast("double"), 4
            ).alias("revenue_r4"),
        )
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    year: int = 1995,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """Q6-shape forecasting aggregate: revenue that would vanish if
    discounts in a band were dropped — one scan, zero joins.

    The whole value is in the scan: all three predicates (ship year,
    discount band, quantity cap) push into the parquet reader as
    min/max range filters, so row groups outside the year skip without
    decompression — at 100 TB this is the difference between a scan
    and a no-op.  PushedFilters asserted in the plan test.  The
    discount-band boundaries compare as exact decimals (doubles like
    0.07 are not exactly representable; both engines must see the same
    decimal operand or boundary rows flip).
    """
    d = F.col("l_discount").cast("decimal(18,6)")
    sel = (
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz"))
        & (d >= F.lit(disc_lo).cast("decimal(18,6)"))
        & (d <= F.lit(disc_hi).cast("decimal(18,6)"))
        & (F.col("l_quantity") < max_qty)
    )
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    return lineitem.where(sel).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum((ext * d).cast("decimal(30,12)")).cast("double"), 4
        ).alias("revenue_change_r4"),
    )


def product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_token: str = "red",
) -> DataFrame:
    """Q9-shape product-line profit by (supplier nation, order year),
    adapted: TPC-H's ``ps_supplycost`` does not exist here, so cost is
    the DERIVED supply relation from Q2 — per (part, supplier) the
    minimum extended price ever charged, i.e. profit measures margin
    over each pair's best observed price.

    Plan shape: the part-name filter broadcasts into lineitem first
    (drops most of the fact before anything else), the derived cost
    attaches as a min() WINDOW on the (part, supplier) partitioning —
    one exchange, no aggregate-and-self-join — orders joins on orderkey
    (the one fact-fact shuffle), and nation arrives via a broadcast dim
    on the supplier side.  All money math in exact decimals until the
    final rounding.
    """
    p = part.where(F.col("p_name").contains(name_token)).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey")
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    from pyspark.sql import Window

    sn = supplier.join(
        F.broadcast(
            nation.select(F.col("n_nationkey").alias("sn_key"), "n_name")
        ),
        supplier["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "n_name")
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    # derived cost as a WINDOW over the filtered fact, not an aggregate
    # + join-back: min() over the (part, supplier) partition attaches
    # the pair's best price on the pair partitioning itself — one
    # exchange where the groupBy+self-join formulation needs two and a
    # sort-merge of the fact against its own aggregate
    wcost = Window.partitionBy("l_partkey", "l_suppkey")
    li = li.withColumn("cost_dec", F.min(ext).over(wcost))
    # cost widened to (19,6) so DuckDB's oracle multiply takes the
    # int128 path (its int64 fast-path overflows when both operands fit
    # int64 but the product exceeds it); (19,6)x(8,6) is exact in both
    # engines, so the subtraction sees identical operands
    amount = (ext * disc).cast("decimal(30,12)") - (
        F.col("cost_dec").cast("decimal(19,6)") * qty.cast("decimal(8,6)")
    ).cast("decimal(30,12)")
    return (
        li.join(sn, li["l_suppkey"] == sn["s_suppkey"])
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("integer").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(amount.cast("decimal(32,12)")).cast("double"), 4
            ).alias("profit_r4")
        )
    )


def shipping_delay_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    min_delay_days: int = 30,
    max_delay_days: int = 90,
) -> DataFrame:
    """Q12-shape delayed-shipment priority split, adapted: the testdata
    has no shipmode/commit/receipt columns, so the 'mode' axis is
    ``l_returnflag`` and 'late receipt' is an order→ship delay between
    ``min_delay_days`` and ``max_delay_days``; per flag, count critical
    (1-URGENT / 2-HIGH) vs other-priority lines — Q12's exact
    conditional-aggregate shape on the orders⋈lineitem join.

    Plan: delay bounds become a residual join predicate (they correlate
    both sides, so no scan can push them alone); the join is the single
    fact-fact shuffle and the priority split is a one-pass conditional
    aggregate — never two scans or a union of the two priority classes.
    Day arithmetic is integer (``datediff``), TZ-free.
    """
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_returnflag", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where((delay >= min_delay_days) & (delay <= max_delay_days))
        .groupBy("l_returnflag")
        .agg(
            F.sum(crit.cast("long")).alias("critical_lines"),
            F.sum((~crit).cast("long")).alias("other_lines"),
        )
    )


def supplier_counts_by_part_attrs(
    part: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#1",
    max_return_ppm: int = 500_000,
) -> DataFrame:
    """Q16-shape supplier diversity report, adapted: per (brand, size)
    — no container/type axis needed — how many DISTINCT suppliers have
    traded the part, excluding one brand (Q16's ``NOT IN`` brand
    exclusion pushes as a scan filter) and excluding suppliers whose
    corpus-wide return rate exceeds ``max_return_ppm`` parts-per-million
    (the complaints-supplier NOT IN, derived from the data itself).

    Plan: the supplier blocklist is a (tiny) aggregate broadcast as a
    LEFT ANTI join; the supply relation dedupes (part, supplier) pairs
    BEFORE joining part attributes, so the count-distinct aggregates a
    pre-shrunk frame.  Return rate compares division-free:
    ``returned · 1_000_000 > total · ppm`` in longs.
    """
    pairs = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("l_partkey", "l_suppkey")
    )
    per_supp = lineitem.groupBy(F.col("l_suppkey").alias("b_suppkey")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_ret"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    blocked = per_supp.where(
        F.col("n_ret") * F.lit(1_000_000) > F.col("n_tot") * F.lit(max_return_ppm)
    ).select("b_suppkey")
    p = part.where(F.col("p_brand") != exclude_brand).select(
        "p_partkey", "p_brand", "p_size"
    )
    return (
        pairs.join(
            F.broadcast(blocked),
            pairs["l_suppkey"] == F.col("b_suppkey"),
            "left_anti",
        )
        .join(p, pairs["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def excess_share_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    name_token: str = "red",
    share_pct: int = 10,
) -> DataFrame:
    """Q20-shape dominant-supplier report, adapted: suppliers who
    carried MORE than ``share_pct``% of the total traded quantity of
    some name-filtered part, labeled with their nation — Q20's nested
    quantity-threshold subquery, with 'availqty > ½ demand' becoming a
    share-of-part-volume test on the derived supply relation.  (Q20
    also FILTERS to one nation; with this testdata's 25-way nation
    spread that filter empties the answer at every tested SF, so the
    nation rides as an output label — same dim join, non-degenerate
    result.)

    Plan: the per-(part, supplier) aggregate is the one real exchange;
    part totals attach as a window over it (the rollup-and-join-back
    alternative re-shuffles the pair frame against itself); the share test
    multiplies exact decimals (division-free, `important_supply_values`
    discipline); the qualifying pairs collapse to DISTINCT suppliers
    (a tiny set) before the broadcast dim joins.  The part-name filter
    pushes into its scan.
    """
    p = part.where(F.col("p_name").contains(name_token)).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    from pyspark.sql import Window

    qty = F.col("l_quantity").cast("decimal(18,6)")
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("pair_qty")
    )
    # part totals as a WINDOW on the pair aggregate's own partitioning —
    # no rollup-and-join-back (which would re-exchange per_pair on the
    # part key and sort-merge it against its own aggregate)
    wpart = Window.partitionBy("l_partkey")
    dominant = (
        per_pair.withColumn(
            "part_qty", F.sum("pair_qty").over(wpart).cast("decimal(30,6)")
        )
        .where(
            F.col("pair_qty").cast("decimal(26,6)")
            * F.lit(100).cast("decimal(3,0)")
            > F.col("part_qty") * F.lit(share_pct).cast("decimal(3,0)")
        )
        .select("l_suppkey")
        .distinct()
    )
    dims = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return dominant.join(
        F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
