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
graph that isn't.  The unrolled iterations' repeated edge subtrees are
deduplicated at runtime by AQE exchange reuse — an explicit cache of
edges/nodes/e was A/B-measured (r9) at no gain over that reuse (3.12 s
either way at sf0.1, occasionally slower from the materialization
barrier) and is deliberately absent; the loop is driver control-flow
only, like `dedup_clusters`.
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


def item_triangles(events: DataFrame, key: str = "k") -> DataFrame:
    """Per-item triangle counts over the undirected item co-transition
    graph — the third canonical distributed-graph shape next to
    connected components (`dedup.dedup_clusters`) and PageRank:
    a self-join whose fan-out must be bounded by DEGREE ORDERING.

    Edges: distinct undirected pairs from :func:`item_transition_edges`
    (direction and weight dropped, self-loops dropped).  The naive
    wedge join — edges ⋈ edges on the shared endpoint — fans out by
    Σ deg(v)², which a single hub vertex turns quadratic.  The classic
    fix (node-iterator++ / Schank-Wagner): orient each edge from the
    endpoint with (degree, id)-smaller rank to the larger; every
    triangle then has exactly ONE wedge rooted at its rank-minimum
    vertex, and out-degrees under this orientation are O(√|E|), so the
    wedge fan-out is Σ outdeg(v)² ≤ |E|^1.5 — skew-proof regardless of
    hubs.  Wedges close against the oriented edge set by equi-join.

    Output: (item, n_triangles) for every item in ≥1 triangle — each
    triangle {a,b,c} credits all three members (the per-vertex counts
    behind local clustering coefficients).

    All joins are equi-joins on item ids; the graph is catalog-sized
    (items), not corpus-sized (events), after the one edge-extraction
    exchange it shares with PageRank.
    """
    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    # the corpus-sized edge-extraction window feeds deg + ranked (and
    # `oriented` feeds three join branches below); without the caches
    # each self-join branch replays the full events exchange
    release_pooled()
    und = pooled_cache(
        item_transition_edges(events, key)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient u -> w iff (deg,id)(u) < (deg,id)(w)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = pooled_cache(
        ranked.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
    )
    # every join below is a self-join on the `oriented` lineage; explicit
    # aliases keep Spark's attribute deduplication from silently resolving
    # a join key to the wrong side (observed: dropped closures)
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .where(F.col("e1.w") < F.col("e2.w"))
        .select(
            F.col("e1.u").alias("p"), F.col("e1.w").alias("x"), F.col("e2.w").alias("y")
        )
    )
    closer = oriented.select(F.col("u").alias("x"), F.col("w").alias("y")).unionAll(
        oriented.select(F.col("w").alias("x"), F.col("u").alias("y"))
    )
    tris = (
        wedges.alias("wg")
        .join(
            closer.alias("cl"),
            (F.col("wg.x") == F.col("cl.x")) & (F.col("wg.y") == F.col("cl.y")),
        )
        .select(
            F.col("wg.p").alias("p"), F.col("wg.x").alias("x"), F.col("wg.y").alias("y")
        )
    )
    per_item = (
        tris.select(F.col("p").alias("item"))
        .unionAll(tris.select(F.col("x").alias("item")))
        .unionAll(tris.select(F.col("y").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_item


def item_triangles_oracle_sql(key: str = "k") -> str:
    """DuckDB oracle: identical orientation + wedge-close joins."""
    return f"""
    WITH seq AS (
        SELECT user_id,
               CAST(json_extract(props, '$.{key}') AS BIGINT) AS dst,
               lag(CAST(json_extract(props, '$.{key}') AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS src
        FROM events
        WHERE json_extract(props, '$.{key}') IS NOT NULL
    ),
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM seq WHERE src IS NOT NULL AND least(src, dst) <> greatest(src, dst)
    ),
    deg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
        ) GROUP BY v
    ),
    oriented AS (
        SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
                    THEN u.b ELSE u.a END AS w
        FROM und u
        JOIN deg da ON da.v = u.a
        JOIN deg db ON db.v = u.b
    ),
    wedges AS (
        SELECT e1.u AS p, e1.w AS x, e2.w AS y
        FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u
        WHERE e1.w < e2.w
    ),
    closer AS (
        SELECT u AS x, w AS y FROM oriented
        UNION ALL SELECT w AS x, u AS y FROM oriented
    ),
    tris AS (
        SELECT p, x, y FROM wedges JOIN closer USING (x, y)
    )
    SELECT item, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT p AS item FROM tris
        UNION ALL SELECT x AS item FROM tris
        UNION ALL SELECT y AS item FROM tris
    ) GROUP BY item
    """
