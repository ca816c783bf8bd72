"""PageRank / link-graph tests.

Pins the fixed-point integer recurrence against a plain-Python twin
(same integer arithmetic → must be bit-identical), plus structural
invariants: determinism across partitionings, sink/dangling handling,
and the synthetic graph law.
"""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.graph import pagerank, synthetic_link_graph


def _pagerank_py(edges, damping=0.85, iterations=10, scale=1_000_000):
    """Driver twin: identical integer recurrence, plain dicts."""
    d_den = 1_000_000
    d_num = round(damping * d_den)
    base_u = (d_den - d_num) * scale // d_den
    out = sorted(set(edges))
    nodes = sorted({s for s, _ in out} | {d for _, d in out})
    outdeg = {}
    for s, _ in out:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: scale for v in nodes}
    for _ in range(iterations):
        inflow = {}
        for s, d in out:
            inflow[d] = inflow.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {
            v: base_u + (d_num * inflow.get(v, 0)) // d_den for v in nodes
        }
    return {v: r / scale for v, r in ranks.items()}


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0), (4, 3),
    # 5 is a sink (in-edges only); 6 -> 5 dangling-ish chain
    (4, 5), (6, 5),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_pagerank_matches_python_twin_exactly(spark, edge_df):
    got = {
        r["id"]: r["rank"]
        for r in pagerank(edge_df, iterations=10).collect()
    }
    want = _pagerank_py(EDGES, iterations=10)
    assert got == want  # integer arithmetic -> exact equality


def test_pagerank_partitioning_invariance(spark, edge_df):
    a = pagerank(edge_df.repartition(1), iterations=7).collect()
    b = pagerank(edge_df.repartition(13, "dst"), iterations=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_sink_and_degrees(spark, edge_df):
    rows = {r["id"]: r for r in pagerank(edge_df, iterations=5).collect()}
    # node 6 has no in-edges: rank settles at 1 - d
    assert rows[6]["rank"] == pytest.approx(0.15, abs=1e-6)
    assert rows[6]["indeg"] == 0 and rows[6]["outdeg"] == 1
    # node 5 is a sink: no out-edges, receives from 4 and 6
    assert rows[5]["outdeg"] == 0 and rows[5]["indeg"] == 2
    # the 0<->2 cycle concentrates the mass: those two outrank the rest
    ordered = sorted(rows.values(), key=lambda r: -r["rank"])
    assert {ordered[0]["id"], ordered[1]["id"]} == {0, 2}


def test_pagerank_zero_iterations_is_initial_rank(spark, edge_df):
    rows = pagerank(edge_df, iterations=0).collect()
    assert all(r["rank"] == 1.0 for r in rows)


def test_pagerank_rejects_bad_params(spark, edge_df):
    with pytest.raises(ValueError):
        pagerank(edge_df, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(edge_df, damping=1.5)


def test_synthetic_link_graph_law(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    got = sorted(
        map(
            tuple,
            synthetic_link_graph(
                df, "doc_id", out_links=2, mult=3, step=7
            ).collect(),
        )
    )
    want = sorted(
        {
            (i, (i * 3 + j * 7) % 10)
            for i in range(10)
            for j in (1, 2)
            if i != (i * 3 + j * 7) % 10
        }
    )
    assert got == want


def test_pagerank_mass_conservation_without_dangling(spark):
    """On a graph where every node has out-edges (no dangling mass
    leak) the unnormalized total starts at n and the update
    0.15·n + 0.85·total keeps it there — only integer-division
    remainders may shave ulps. The synthetic generator produces such
    graphs (every id 0..n-1 is a source)."""
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(df, "doc_id", out_links=3)
    ranks = pagerank(edges, iterations=10)
    n = ranks.count()
    total = sum(r["rank"] for r in ranks.collect())
    assert n == 200
    assert 0.99 * n <= total <= n + 1e-6


class TestLabelPropagation:
    """graph.py::label_propagation — deterministic synchronous LPA."""

    def test_two_triangles_bridge_split(self, spark):
        from tidyvec_spark.operators.graph import label_propagation

        # two triangles {1,2,3} and {10,11,12} joined by ONE bridge
        # 3-10: the dense cores keep distinct communities because the
        # single bridge vote never outvotes the internal majority
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
             (3, 10)],
            "src LONG, dst LONG",
        )
        got = {
            r["id"]: r["community"]
            for r in label_propagation(edges, rounds=4).collect()
        }
        assert got[1] == got[2] == got[3] == 1
        assert got[10] == got[11] == got[12] == 10
        # a connected-components pass would merge all six

    def test_deterministic_and_tie_law(self, spark):
        from tidyvec_spark.operators.graph import label_propagation

        # single edge: after round 1 both nodes hold {own, other} with
        # equal counts -> tie law picks the SMALLEST label for both
        edges = spark.createDataFrame([(5, 9)], "src LONG, dst LONG")
        one = {
            r["id"]: r["community"]
            for r in label_propagation(edges, rounds=1).collect()
        }
        assert one == {5: 5, 9: 5}
        # same input, same answer, any round count
        for rounds in (2, 4):
            again = {
                r["id"]: r["community"]
                for r in label_propagation(edges, rounds=rounds).collect()
            }
            assert again == {5: 5, 9: 5}

    def test_string_ids_tie_and_majority(self, spark):
        # r14: the per-round argmax is min(struct(-count, community)) —
        # the count lives in the negated numeric field, the label in
        # the second struct field, so ANY orderable label type must
        # keep working. Pin string ids through both laws: tie -> the
        # lexicographically smallest label; majority -> count beats a
        # smaller label with fewer votes (triangle holds against a
        # single bridge vote from "aaa").
        from tidyvec_spark.operators.graph import label_propagation

        edges = spark.createDataFrame(
            [("bb", "cc")], "src STRING, dst STRING"
        )
        got = {
            r["id"]: r["community"]
            for r in label_propagation(edges, rounds=2).collect()
        }
        assert got == {"bb": "bb", "cc": "bb"}
        tri = spark.createDataFrame(
            [("xx", "yy"), ("yy", "zz"), ("xx", "zz"), ("aaa", "xx")],
            "src STRING, dst STRING",
        )
        got = {
            r["id"]: r["community"]
            for r in label_propagation(tri, rounds=4).collect()
        }
        # the xx/yy/zz triangle's internal majority keeps community
        # "xx" for all three despite aaa's smaller label bridging in
        assert got["yy"] == "xx" and got["zz"] == "xx"

    def test_rounds_zero_is_identity(self, spark):
        from tidyvec_spark.operators.graph import label_propagation

        edges = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
        got = {
            r["id"]: r["community"]
            for r in label_propagation(edges, rounds=0).collect()
        }
        assert got == {1: 1, 2: 2}

    def test_validation(self, spark):
        import pytest as pt

        from tidyvec_spark.operators.graph import label_propagation

        edges = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
        with pt.raises(ValueError):
            label_propagation(edges, rounds=-1)


def test_triangle_stats_known_graphs(spark):
    """triangle_stats: exact counts on K4 (clustering 1.0), a path
    (no triangles), and a triangle with a pendant (3T/W = 0.6);
    direction/duplicate edges collapse into the undirected view."""
    from tidyvec_spark.operators.graph import triangle_stats

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b],
        "src long, dst long",  # both directions: must dedup to 6 edges
    )
    r = triangle_stats(k4).first()
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) \
        == (4, 6, 12, 4)
    assert r["global_clustering"] == 1.0

    path = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    r = triangle_stats(path).first()
    assert r["n_triangles"] == 0 and r["global_clustering"] == 0.0

    pend = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    r = triangle_stats(pend).first()
    assert r["n_triangles"] == 1 and abs(r["global_clustering"] - 0.6) < 1e-9


def test_node_clustering_known_graph(spark):
    """node_clustering: exact local coefficients on a hand-checked
    graph — a triangle {0,1,2} with a pendant 3 on node 0 — plus the
    clique law (all coefficients 1.0) and degree-1 convention (0.0).
    Cross-checked against triangle_stats: per-node triangle credits
    sum to 3T."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.graph import node_clustering, triangle_stats

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src long, dst long"
    )
    got = {r["node"]: r for r in node_clustering(edges).collect()}
    assert got[0]["degree"] == 3 and got[0]["n_triangles"] == 1
    assert got[0]["local_clustering"] == round(1 / 3, 6)
    assert got[1]["local_clustering"] == 1.0
    assert got[2]["local_clustering"] == 1.0
    assert got[3]["degree"] == 1 and got[3]["local_clustering"] == 0.0
    t = triangle_stats(edges).first()["n_triangles"]
    assert sum(r["n_triangles"] for r in got.values()) == 3 * t

    # 4-clique: every node closes all its wedge pairs
    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    for r in node_clustering(clique).collect():
        assert r["degree"] == 3 and r["n_triangles"] == 3
        assert r["local_clustering"] == 1.0


def test_reliable_checkpoint_path_matches_local(spark, edge_df, tmp_path):
    """use_reliable_checkpoints routes every iterative lineage cut
    through DataFrame.checkpoint into a durable dir (the 100 TB
    preemptible-cluster escape hatch — localCheckpoint blocks die with
    their executor); results must be identical and checkpoint files
    must actually land in the directory."""
    import os

    from tidyvec_spark import partitioning as P
    from tidyvec_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    local_pr = sorted(map(tuple, pagerank(edge_df, iterations=5).collect()))
    local_cc = sorted(map(tuple, connected_components(pairs).collect()))

    ckpt_dir = str(tmp_path / "reliable_ckpt")
    P.use_reliable_checkpoints(ckpt_dir)
    try:
        rel_pr = sorted(
            map(tuple, pagerank(edge_df, iterations=5).collect())
        )
        rel_cc = sorted(map(tuple, connected_components(pairs).collect()))
    finally:
        P.use_reliable_checkpoints(None)

    assert rel_pr == local_pr
    assert rel_cc == local_cc
    # the reliable path really wrote durable checkpoint data
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckpt_dir)
        for f in files
    ]
    assert found, "no checkpoint files written to the reliable dir"
