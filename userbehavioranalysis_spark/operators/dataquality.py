"""Data-quality audit: declarative expectation checks over the
warehouse tables (the dbt-test / Deequ / Great-Expectations stage of a
production pipeline — no reference analogue; training-pipeline
extension).

Design for scale, not per-rule jobs:

- every SINGLE-TABLE rule (null rate, range, domain membership) over
  one table compiles into ONE conditional-aggregation pass —
  ``sum(case when violated)`` columns side by side, so auditing five
  lineitem rules costs one lineitem scan, not five;
- referential-integrity rules are LEFT ANTI joins counted to one row —
  the orphan check's only shuffle, and AQE broadcasts the parent side
  when it fits;
- uniqueness is ``count − count(distinct)`` (two-phase distinct, the
  standard skew-safe plan).

Output is the audit table (rule, n_violations, n_checked) — tiny at
any corpus size, value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one(rule: str, viol: F.Column, checked: F.Column, df: DataFrame) -> DataFrame:
    return df.agg(
        F.lit(rule).alias("rule"),
        viol.cast("bigint").alias("n_violations"),
        checked.cast("bigint").alias("n_checked"),
    )


def dq_audit(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame
) -> DataFrame:
    """The audit table for the order-to-lineitem pipeline."""
    n = F.count(F.lit(1))

    def bad(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    li_rules = lineitem.agg(
        F.array(
            F.struct(
                F.lit("lineitem.quantity_not_null").alias("rule"),
                bad(F.col("l_quantity").isNull()).cast("bigint").alias("n_violations"),
                n.cast("bigint").alias("n_checked"),
            ),
            F.struct(
                F.lit("lineitem.discount_in_[0,1]").alias("rule"),
                bad((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
                .cast("bigint")
                .alias("n_violations"),
                n.cast("bigint").alias("n_checked"),
            ),
            F.struct(
                F.lit("lineitem.extendedprice_positive").alias("rule"),
                bad(F.col("l_extendedprice") <= 0).cast("bigint").alias("n_violations"),
                n.cast("bigint").alias("n_checked"),
            ),
        ).alias("rules")
    ).select(F.explode("rules").alias("r")).select("r.*")

    o_rules = orders.agg(
        F.array(
            F.struct(
                F.lit("orders.totalprice_positive").alias("rule"),
                bad(F.col("o_totalprice") <= 0).cast("bigint").alias("n_violations"),
                n.cast("bigint").alias("n_checked"),
            ),
            F.struct(
                F.lit("orders.status_in_domain").alias("rule"),
                bad(~F.col("o_orderstatus").isin("O", "F", "P"))
                .cast("bigint")
                .alias("n_violations"),
                n.cast("bigint").alias("n_checked"),
            ),
        ).alias("rules")
    ).select(F.explode("rules").alias("r")).select("r.*")

    fk_orders_customer = _one(
        "orders.custkey_fk_customer",
        F.count(F.lit(1)),
        F.lit(None),
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
        ),
    )

    fk_lineitem_orders = _one(
        "lineitem.orderkey_fk_orders",
        F.count(F.lit(1)),
        F.lit(None),
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
        ),
    )

    uniq = orders.agg(
        F.lit("orders.orderkey_unique").alias("rule"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("n_violations"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
    )

    return (
        li_rules.unionAll(o_rules)
        .unionAll(fk_orders_customer.select("rule", "n_violations", "n_checked"))
        .unionAll(fk_lineitem_orders.select("rule", "n_violations", "n_checked"))
        .unionAll(uniq)
    )
