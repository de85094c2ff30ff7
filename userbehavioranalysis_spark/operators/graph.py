"""Graph analytics over event-derived graphs (build-brief extension).

``dedup.dedup_clusters`` already demonstrates the O(log d)
pointer-jumping iteration for connected components; this module adds
the other canonical iterative shape — fixed-point score propagation
(PageRank) — over the item-transition graph mined from user event
sequences (edge src→dst weighted by how often users move from item src
to item dst).

**Integer-exact PageRank.**  Floating-point PageRank is
order-dependent (partial sums combine in partition order), which would
break cross-engine value hashing; instead ranks live in integer
"micro-rank" units (scale 10¹²) and every update is integer
arithmetic::

    pr₀[v]   = S div N
    pr_{i+1}[v] = (15·S) div (100·N) + (85 · Σ_in (pr[u]·w) div outw[u]) div 100

Floor-division leaks a few units of mass per step (standard for
fixed-point PageRank) and dangling-node mass is dropped — both
documented, both identical in any engine, so a DuckDB oracle can
replay the exact iteration.  Overflow headroom: ``pr·w`` stays under
2⁶³ while edge weights are below ~9×10⁶; beyond that flip the product
to ``decimal(38,0)`` (changes nothing below the threshold).

Scale shape: the expensive part is EDGE EXTRACTION (one user-keyed lag
window over all events — the `event_transitions` exchange); the
iteration itself runs on the |items|² transition graph, which is tiny
for a catalog and Pregel-shaped (join on src, aggregate on dst) for a
graph that isn't.  Each iteration reuses the cached edge frame; the
loop is driver control-flow only, like `dedup_clusters`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # micro-rank units per unit of probability mass


def item_transition_edges(events: DataFrame, key: str = "k") -> DataFrame:
    """Weighted src→dst edges: consecutive items (``props.$key``) in a
    user's event sequence.  One user-keyed window exchange."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    k = F.get_json_object("props", f"$.{key}").try_cast("long")
    seq = (
        events.select("user_id", "ts", "event_id", k.alias("dst"))
        .where(F.col("dst").isNotNull())
        .withColumn("src", F.lag("dst").over(w))
        .where(F.col("src").isNotNull())
    )
    return seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


def item_pagerank(
    events: DataFrame, iterations: int = 5, key: str = "k"
) -> DataFrame:
    """Fixed-iteration integer PageRank over the item-transition graph.

    Returns (node, pr) after ``iterations`` exact integer updates —
    bit-identical on every engine and partitioning by construction.
    """
    edges = item_transition_edges(events, key=key)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = edges.groupBy(F.col("src").alias("o_src")).agg(
        F.sum("w").alias("ow")
    )
    e = edges.join(outw, edges["src"] == F.col("o_src")).select(
        "src", "dst", "w", "ow"
    )
    n = nodes.count()  # |items| — driver scalar, tiny by construction
    if n == 0:  # edgeless corpus: no sequences of length >= 2
        return nodes.select("node", F.lit(None).cast("long").alias("pr"))
    pr = nodes.select("node", F.lit(SCALE // n).cast("long").alias("pr"))
    base = (15 * SCALE) // (100 * n)
    for _ in range(iterations):
        contrib = (
            e.join(pr, e["src"] == pr["node"])
            .select("dst", F.expr("(pr * w) div ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        pr = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left_outer"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr("85 * coalesce(c, 0L) div 100")
            ).cast("long").alias("pr"),
        )
    return pr


def pagerank_oracle_sql(iterations: int = 5, key: str = "k") -> str:
    """The DuckDB oracle: the SAME integer iteration, unrolled."""
    sql = f"""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               TRY_CAST(json_extract_string(props, '$.{key}') AS BIGINT) AS dst
        FROM events
    ),
    pairs AS (
        SELECT lag(dst) OVER (
                   PARTITION BY user_id ORDER BY us, event_id) AS src,
               dst
        FROM seq WHERE dst IS NOT NULL
    ),
    edges AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2
    ),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    ),
    outw AS (SELECT src AS o_src, sum(w) AS ow FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS cnt FROM nodes),
    pr0 AS (SELECT node, {SCALE} // cnt AS pr FROM nodes, nn)
    """
    prev = "pr0"
    for i in range(1, iterations + 1):
        sql += f""",
    c{i} AS (
        SELECT e.dst, sum((p.pr * e.w) // o.ow) AS c
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outw o ON o.o_src = e.src
        GROUP BY 1
    ),
    pr{i} AS (
        SELECT n.node,
               (15 * {SCALE}) // (100 * nn.cnt)
               + (85 * COALESCE(c.c, 0)) // 100 AS pr
        FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node, nn
    )"""
        prev = f"pr{i}"
    sql += f"""
    SELECT node, CAST(pr AS BIGINT) AS pr FROM {prev}
    """
    return sql
