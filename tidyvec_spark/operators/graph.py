"""Link-graph centrality for crawl curation.

Web-scale corpus curation ranks pages by link structure before (or
alongside) content quality: Common-Crawl-derived corpora routinely
keep the high-centrality slice of the host/page graph. The reference
engine scores items by content only (`R/quality.R` has no graph
signal); this module adds the standard centrality, PageRank, in a
Spark-iterative form that composes with the existing quality stack
(`functions/quality.py` rules, `operators/classifier.py`,
`operators/lm.py` perplexity).

Determinism is a design requirement, not a nicety: curation decisions
("keep the top 40% by rank") must be reproducible across runs,
partitionings, and engines, and floating-point summation is
order-dependent under Spark's parallel aggregation. The iteration
therefore runs in **fixed-point integer units** (``scale`` units = a
rank of 1.0): contributions are integer-divided, sums are exact
BIGINT arithmetic, and every engine that implements the same integer
recurrence — including the DuckDB oracle — produces bit-identical
ranks. Precision is 1/scale per term (default 1e-6), far below any
curation threshold anyone would set.

Scale shape (per iteration): ONE shuffle joining the rank table to
the out-edge table on the source id + ONE groupBy-sum on the
destination id. The edge table is persisted once and reused every
round; lineage is cut per round with ``localCheckpoint`` so the plan
stays O(1) deep regardless of ``iterations``. Rank state is one
(id, bigint) row per node — 16 bytes/node before overhead, so 1e9
nodes ≈ 16 GB spread across the cluster, well inside shuffle budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from tidyvec_spark.partitioning import cut_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Unnormalized PageRank (the GraphX/Pregel convention) over a
    directed edge list: ``rank(v) = (1-d) + d * sum(rank(u)/outdeg(u))``
    over in-edges ``u -> v``, iterated a FIXED number of rounds from
    ``rank0 = 1.0``.

    Returns one row per node: ``(id, rank double, outdeg bigint,
    indeg bigint)``. Nodes are the union of sources and destinations;
    dangling nodes (no out-edges) contribute nothing (their mass
    leaks, as in GraphX) and sink nodes (no in-edges) settle at
    ``1-d``.

    Fixed-point arithmetic: ranks are carried as BIGINT multiples of
    ``1/scale``; per-edge contribution is ``rank_units div outdeg``
    and the update is ``(1-d)·scale + (d_num · sum) div d_den`` with
    ``damping`` read as a ratio of integers (e.g. 0.85 → 85/100).
    All sums are exact integers — results are independent of
    partitioning, parallelism, and engine. ``damping`` must therefore
    be expressible in at most 6 decimal places.

    ``scale`` bounds the value range: the total in-flow of one node is
    at most ``n_nodes * scale`` units, and the update multiplies by
    ``d_num ≤ 10^6``; keep ``n_nodes * scale * d_num < 2^63`` (the
    default scale supports ~9.7e6 nodes per *single* receiving node's
    worst-case in-flow; real graphs are nowhere near one node
    receiving all mass, but drop ``scale`` to 1e4 for extreme graphs).
    """
    if int(iterations) < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    # damping as an exact integer ratio so both engines do the same
    # integer arithmetic (0.85 -> 850000/1000000)
    d_den = 1_000_000
    d_num = round(float(damping) * d_den)
    if not (0 <= d_num <= d_den):
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    base_u = ((d_den - d_num) * int(scale)) // d_den  # (1-d) in units

    # hash-partition the static edge side by the per-round join key
    # BEFORE persisting: the dedup aggregate runs on that partitioning
    # (keys ⊇ partition key, no second exchange) and every one of the
    # `iterations` joins below then reads a side that already satisfies
    # its required distribution — without this the cached edge list is
    # re-shuffled once per round (r14, guide §2.4)
    # localCheckpoint instead of persist: a persisted frame keeps its
    # FULL logical plan, and every one of the `iterations` round plans
    # below embeds that deep subtree — at 10 rounds the analyzer was
    # re-walking the whole edge-build tree per round, ~0.7 s of pure
    # driver planning each (measured: rounds-build 6.9 s → 3.1 s with
    # the cut; r14, guide §7.3/§3.3 "materialise to truncate the
    # plan"). The checkpointed scan preserves the es-hash partitioning
    # (verified: the per-round join still reads the edge side with no
    # added Exchange), so the §2.4 exchange-elimination holds.
    out = (
        edges.select(F.col(src).alias("es"), F.col(dst).alias("ed"))
        .repartition(F.col("es"))
        .dropDuplicates(["es", "ed"])
        .transform(cut_lineage)
    )
    outdeg = out.groupBy(F.col("es").alias("id")).agg(
        F.count("*").alias("outdeg")
    )
    indeg = out.groupBy(F.col("ed").alias("id")).agg(
        F.count("*").alias("indeg")
    )
    nodes = (
        out.select(F.col("es").alias("id"))
        .union(out.select(F.col("ed").alias("id")))
        .distinct()
        .join(outdeg, "id", "left")
        .join(indeg, "id", "left")
        .select(
            "id",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
        )
        .transform(cut_lineage)  # same plan-truncation as `out`
    )
    # eager=False: the iteration count is FIXED (no convergence read
    # between rounds, unlike connected_components), so there is
    # nothing for the driver to decide per round — lazy checkpoints
    # still cut lineage to O(1) but skip the per-round job barrier
    # (measured ~8% at sf0.1; on a cluster the removed driver
    # round-trips matter more)
    ranks = nodes.select(
        "id", "outdeg", F.lit(int(scale)).cast("long").alias("rank_u")
    ).transform(cut_lineage)
    for _ in range(int(iterations)):
        contrib = (
            out.join(ranks, out["es"] == ranks["id"])
            # outdeg >= 1 by construction for every row of `out`
            .select(
                F.col("ed").alias("id"),
                F.expr("rank_u div outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.select("id", "outdeg")
            .join(contrib, "id", "left")
            .select(
                "id",
                "outdeg",
                (
                    F.lit(base_u)
                    + F.expr(
                        f"({d_num} * coalesce(inflow, 0L)) div {d_den}"
                    )
                ).cast("long").alias("rank_u"),
            )
            .transform(cut_lineage)
        )
    # NOTE: `out`/`nodes` are lazy localCheckpoints — they materialize
    # at the caller's first action and their blocks are freed when the
    # RDDs are garbage-collected (or by a session's explicit
    # persistent-RDD sweep, as bench.py does between queries).
    return (
        ranks.select("id", "rank_u")
        .join(nodes, "id")
        .select(
            "id",
            (F.col("rank_u").cast("double") / F.lit(float(scale))).alias(
                "rank"
            ),
            "outdeg",
            "indeg",
        )
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    round_to: int = 6,
) -> DataFrame:
    """Exact triangle census of the UNDIRECTED view of an edge list —
    ONE row (n_nodes, n_edges, n_wedges, n_triangles,
    global_clustering = 3T/W): the cohesion number that separates a
    mirror-farm link graph (cliquish, clustering → 1) from organic
    link structure, and the triad completing pagerank (flow
    centrality) and label_propagation (communities).

    Algorithm is the degree-oriented node-iterator (Schank & Wagner
    2005 "forward"): each undirected edge is directed from its
    lower-(degree, id) endpoint to the higher, so every wedge is
    enumerated at its LOWEST-degree vertex — join work is O(m^1.5)
    regardless of skew (a hub of degree d never expands d² paths; the
    orientation caps each node's out-degree at ~√m). Two equi-joins:
    path enumeration + closure check. The same orientation is replayed
    in the SQL oracle.
    """
    und, deg, fwd = _degree_oriented(edges, src, dst)
    tri = _closed_wedges(und, fwd).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    stats = und.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2)
            .cast("long")
            .alias("n_wedges"),
        )
    )
    out = (
        stats.crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    round_to,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("global_clustering"),
        )
    )
    out._tidyvec_persisted = [und, fwd]
    return out


def _degree_oriented(edges: DataFrame, src: str, dst: str):
    """The shared Schank & Wagner scaffolding behind
    :func:`triangle_stats` and :func:`node_clustering`: canonical
    undirected edges (u < v, deduped, persisted — two consumers),
    undirected degrees, and the forward orientation from the
    lower-(degree, id) endpoint (persisted — wedge enumeration
    self-joins it), which caps every node's out-degree at ~√m so join
    work is O(m^1.5) regardless of hub skew."""
    e = edges.select(
        F.col(src).cast("long").alias("a"),
        F.col(dst).cast("long").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    und = (
        e.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # orient each edge from the smaller (d, id) endpoint to the larger
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            )
            .alias("e")
        )
        .select("e.s", "e.t")
        # clustered on the wedge apex before persisting: the wedge
        # enumeration self-joins this frame on s, so one build-time
        # exchange replaces two at use (r14, guide §2.4)
        .repartition(F.col("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return und, deg, fwd


def _closed_wedges(und: DataFrame, fwd: DataFrame) -> DataFrame:
    """One row (a, b, c) per TRIANGLE: wedges enumerated at their
    oriented apex ``a``, closed by the canonical-edge check — und is
    already in u < v form, so (b, c) with b < c closes iff it is an
    undirected edge. Each triangle appears exactly once (its unique
    apex under the orientation)."""
    p1 = fwd.select(F.col("s").alias("a"), F.col("t").alias("b"))
    p2 = fwd.select(F.col("s").alias("a"), F.col("t").alias("c"))
    wedge = p1.join(p2, "a").filter(F.col("b") < F.col("c"))
    return wedge.join(
        und.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"],
    )


def node_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    round_to: int = 6,
) -> DataFrame:
    """Per-node LOCAL clustering coefficient of the undirected view —
    one row per node: (node, degree, n_triangles, local_clustering =
    triangles_at_node / C(degree, 2)) — the standard spam-farm node
    feature (Watts & Strogatz 1998's C_v): mirror-farm nodes sit in
    near-cliques (coefficient → 1) while organic hubs bridge
    otherwise-unconnected neighbours (coefficient → 0).
    :func:`triangle_stats` is the census; this is its per-node
    refinement, ONE extra groupBy over the SAME degree-oriented
    wedge/closure joins: every triangle row (a, b, c) credits its
    three vertices via a 3-element explode — never a per-node
    neighborhood materialization, so the O(m^1.5) skew-proof bound is
    unchanged. Degree-1 nodes have no wedge pairs: coefficient 0.0 by
    convention."""
    und, deg, fwd = _degree_oriented(edges, src, dst)
    tri_nodes = (
        _closed_wedges(und, fwd)
        .select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    pairs = (F.col("d") * (F.col("d") - 1) / 2).cast("double")
    out = (
        deg.join(tri_nodes, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.when(
                F.col("d") >= 2,
                F.round(
                    F.coalesce(F.col("n_triangles"), F.lit(0)).cast(
                        "double"
                    )
                    / pairs,
                    round_to,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("local_clustering"),
        )
    )
    out._tidyvec_persisted = [und, fwd]
    return out


def synthetic_link_graph(
    df: DataFrame,
    id_col: str,
    out_links: int = 3,
    mult: int = 7919,
    step: int = 104729,
) -> DataFrame:
    """Deterministic synthetic edge list over a table's CONTIGUOUS
    integer ids (``0..n-1``): node ``i`` links to
    ``(i * mult + j * step) % n`` for ``j = 1..out_links``, self-loops
    dropped.

    The fixtures have no link column, so graph operators are exercised
    on this LCG-style graph — the same closed form is replayed in the
    DuckDB oracles (plain modular arithmetic, no engine-specific hash).
    Multipliers are primes so successive ``j`` land far apart.
    """
    n = df.select(F.countDistinct(id_col).alias("n"))
    return (
        df.select(F.col(id_col).cast("long").alias("src"))
        .distinct()
        .crossJoin(F.broadcast(n))
        .select(
            "src",
            F.explode(
                F.expr(
                    f"transform(sequence(1, {int(out_links)}), "
                    f"j -> pmod(src * {int(mult)} + j * {int(step)}, n))"
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007,
    arXiv:0709.2938) over an undirected view of the edge list —
    community detection as ``rounds`` fixed synchronous updates:
    every node adopts the most frequent label among its neighbors
    PLUS its own current label (the self-vote stabilizes oscillation
    on bipartite-ish structure), ties broken by SMALLEST label.

    Where connected components answer "what touches what", LPA
    answers "what is DENSELY tied to what": a near-dup component
    over-merged through one accidental bridge pair splits back into
    its dense cores, because one bridge vote never outvotes a
    community's internal majority. The deterministic synchronous form
    (fixed rounds, explicit tie law, integer labels) is chosen over
    the async converge-until-stable variant so results are
    reproducible across runs, partitionings, and engines — the same
    argument as pagerank's fixed-point arithmetic above.

    Scale shape per round: ONE join of the label table to the
    undirected edge list + ONE (node, label) count + a per-node
    argmax aggregate (min over (−count, label) structs — partial
    map-side combining, no window sort) — the same bounded recurrence
    as a PageRank round;
    label state is one (id, label) row per node and lineage is cut
    per round. Labels start as the node's own id, so the output
    community key is the smallest id that won each node's
    neighborhood vote.

    Returns ``(id, community)``.
    """
    if int(rounds) < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # partitioned by the per-round join key before the dedup aggregate
    # (same exchange-elimination move as pagerank's edge side above):
    # each of the `rounds` joins reads the cached side pre-clustered
    # on b instead of re-shuffling it every round (r14, guide §2.4)
    und = (
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .repartition(F.col("b"))
        .dropDuplicates(["a", "b"])
        # lineage cut, not just persist: every round's plan embeds
        # this subtree, and with a deep edge build (minhash pairs)
        # the analyzer re-walked it per round (r14, guide §7.3 —
        # same fix as pagerank above); b-hash partitioning is
        # preserved by the checkpointed scan
        .transform(cut_lineage)
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("community"))
        .transform(cut_lineage)
    )
    for _ in range(int(rounds)):
        neigh = und.join(
            labels, und["b"] == labels["id"]
        ).select(F.col("a").alias("id"), "community")
        votes = neigh.unionByName(labels)  # self-vote
        # the argmax (most votes, then SMALLEST label) as min(struct):
        # min(struct(-c, community)) picks the identical winner the
        # previous row_number window did — count desc via the exact
        # integer negation, label asc via struct lexicographic order —
        # but it is a plain aggregate: partial (map-side) combining
        # applies before the id exchange and the per-partition window
        # SORT disappears (r14, guide §2.3).
        labels = (
            votes.groupBy("id", "community")
            .agg(F.count("*").alias("c"))
            .groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"),
                        F.col("community").alias("community"),
                    )
                ).alias("__w")
            )
            .select("id", F.col("__w.community").alias("community"))
            .transform(cut_lineage)
        )
    # deliberately NOT unpersisting `und` here: the whole function is
    # lazy, so an unpersist now would drop the cache intent BEFORE the
    # caller's first action and recompute the union+distinct edge
    # build once per round — the same trap pagerank documents above.
    # Instead the handle rides on the result (the dedup.py pair-
    # generator convention) so long-lived sessions can free it with
    # operators.dedup.release(labels) after the terminal action.
    labels._tidyvec_persisted = [und]
    return labels
