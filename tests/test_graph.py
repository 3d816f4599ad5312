"""Connected components (operators/graph.py): oracle match plus unit
tests on crafted graphs the hash compare can't cover."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.operators.graph import connected_components
from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle


def test_dedup_components_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "dedup_components")


def test_dedup_components_has_nontrivial_clusters(spark, sf_dir):
    rows = get("dedup_components").builder(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == docs.count()  # exhaustive labeling
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r["doc_id"])
    sizes = sorted((len(v) for v in by_comp.values()), reverse=True)
    assert sizes[0] >= 2  # the corpus does contain near-dup clusters
    # component id is always the minimum member
    assert all(min(v) == comp for comp, v in by_comp.items())


def test_cc_transitive_chain_and_isolates(spark):
    """A path graph 1-2-3-4 (diameter 3) must converge to one label;
    isolated vertex keeps its own; two-cliques stay separate."""
    vertices = spark.createDataFrame([(i,) for i in range(1, 9)], ["vid"])
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7), (7, 8)], ["src", "dst"]
    )
    got = {
        r["vid"]: r["label"] for r in connected_components(vertices, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6, 8: 6}


def test_cc_label_flows_against_edge_direction(spark):
    """Edges are undirected: the min label must flow dst→src too."""
    vertices = spark.createDataFrame([(10,), (3,), (7,)], ["vid"])
    edges = spark.createDataFrame([(10, 3), (7, 10)], ["src", "dst"])
    got = {
        r["vid"]: r["label"] for r in connected_components(vertices, edges).collect()
    }
    assert got == {10: 3, 3: 3, 7: 3}


def _labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def test_star_cc_matches_propagation_on_crafted_graphs(spark):
    from lime_etl_spark.operators.graph import connected_components_star

    cases = [
        # long chain: the case star rounds exist for
        [(i, i + 1) for i in range(1, 60)],
        # two cliques + bridge + isolates via vertex list
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (20, 21)],
        # star already
        [(5, 1), (5, 2), (5, 3), (5, 4)],
    ]
    for edges_py in cases:
        vids = sorted({x for e in edges_py for x in e} | {99})  # 99 isolated
        vertices = spark.createDataFrame([(v,) for v in vids], ["vid"])
        edges = spark.createDataFrame(edges_py, ["src", "dst"])
        # diameter-59 chain needs > default rounds for plain propagation
        a = _labels(connected_components(vertices, edges, max_iterations=100))
        b = _labels(connected_components_star(vertices, edges))
        assert a == b, f"divergence on {edges_py[:5]}..."


def test_star_cc_random_graphs_match(spark):
    import random

    from lime_etl_spark.operators.graph import connected_components_star

    rng = random.Random(42)
    for trial in range(3):
        n = 80
        edges_py = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(rng.randint(20, 70))
        ]
        edges_py = [(a, b) for a, b in edges_py if a != b]
        vertices = spark.createDataFrame([(v,) for v in range(1, n + 1)], ["vid"])
        edges = spark.createDataFrame(edges_py, ["src", "dst"])
        a = _labels(connected_components(vertices, edges))
        b = _labels(connected_components_star(vertices, edges))
        assert a == b



def test_cc_raises_instead_of_silently_truncating(spark):
    """A diameter-9 chain with a 3-round budget must raise, not return
    half-flooded labels."""
    import pytest as _pytest

    vertices = spark.createDataFrame([(v,) for v in range(1, 11)], ["vid"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 10)], ["src", "dst"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iterations=3)


def test_cluster_dedup_weights_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "cur_cluster_dedup_weights")


def test_cluster_dedup_weights_conserve_corpus(spark, sf_dir):
    """Representatives + multiplicities must account for every document
    and every character exactly once."""
    rows = get("cur_cluster_dedup_weights").builder(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["multiplicity"] for r in rows) == docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["cluster_chars"] for r in rows) == total_chars
    # representatives are cluster minima, hence unique
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_cluster_density_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "graph_cluster_density")


def test_cluster_density_bounds(spark, sf_dir):
    """Every cluster's density lies in (0, 1]; a 2-doc cluster is
    exactly 1.0; edge counts never exceed n(n-1)/2."""
    rows = get("graph_cluster_density").builder(spark, sf_dir).collect()
    assert rows  # corpus has near-dup clusters
    for r in rows:
        n, e = r["n_docs"], r["n_edges"]
        assert 1 <= e <= n * (n - 1) // 2
        assert 0.0 < r["density"] <= 1.0
        if n == 2:
            assert r["density"] == 1.0


def test_label_propagation_cliques_equal_components(spark):
    """On disjoint cliques LP must agree with connected components
    (each clique is its own maximal community)."""
    from lime_etl_spark.operators.graph import label_propagation

    cliques = [[1, 2, 3], [4, 5, 6, 7], [8, 9]]
    edges = [
        (a, b) for grp in cliques for i, a in enumerate(grp) for b in grp[i + 1 :]
    ]
    vs = spark.createDataFrame([(v,) for grp in cliques for v in grp] + [(99,)], ["vid"])
    es = spark.createDataFrame(edges, ["src", "dst"])
    lp = {r["vid"]: r["community"] for r in label_propagation(vs, es).collect()}
    cc = {r["vid"]: r["label"] for r in connected_components(vs, es).collect()}
    assert lp == cc
    assert lp[99] == 99  # isolated vertex labels itself


def test_label_propagation_two_cycle_converges(spark):
    """The self-vote breaks the a<->b label swap oscillation."""
    from lime_etl_spark.operators.graph import label_propagation

    vs = spark.createDataFrame([(1,), (2,)], ["vid"])
    es = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {r["vid"]: r["community"] for r in label_propagation(vs, es).collect()}
    assert got == {1: 1, 2: 1}


def test_label_propagation_splits_bridged_communities(spark):
    """Two 4-cliques joined by ONE bridge edge: CC merges them, LP
    keeps them as two communities — the over-merge audit LP exists
    for (each vertex in a clique gets 4+ same-clique votes vs 1
    bridge vote)."""
    from lime_etl_spark.operators.graph import label_propagation

    left = [1, 2, 3, 4]
    right = [11, 12, 13, 14]
    edges = (
        [(a, b) for i, a in enumerate(left) for b in left[i + 1 :]]
        + [(a, b) for i, a in enumerate(right) for b in right[i + 1 :]]
        + [(4, 11)]  # the bridge
    )
    vs = spark.createDataFrame([(v,) for v in left + right], ["vid"])
    es = spark.createDataFrame(edges, ["src", "dst"])
    lp = {r["vid"]: r["community"] for r in label_propagation(vs, es).collect()}
    cc = {r["vid"]: r["label"] for r in connected_components(vs, es).collect()}
    assert len(set(cc.values())) == 1  # CC sees one blob
    assert len({lp[v] for v in left}) == 1
    assert len({lp[v] for v in right}) == 1
    assert lp[1] != lp[11]  # LP separates the bridged cliques


def test_template_communities_contained_in_components(spark, sf_dir):
    """Every LP community must lie inside ONE connected component
    (LP refines CC, never crosses it), and multi-doc community
    membership must cover >= as many docs as the largest clusters
    suggest."""
    from pyspark.sql import functions as F

    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.operators.graph import dedup_components, label_propagation
    from lime_etl_spark.sources.readers import load_table

    rows = get("graph_template_communities").builder(spark, sf_dir).collect()
    assert rows and all(r["n_docs"] >= 2 for r in rows)
    assert all(r["rep_doc_id"] == r["community_id"] or r["n_docs"] >= 2 for r in rows)

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(
        sh, candidates=lsh_candidates(minhash_signatures(sh))
    ).where(F.col("jaccard") >= JACCARD_TAU)
    lp = label_propagation(
        docs.select(F.col("doc_id").alias("vid")),
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    comp = dedup_components(spark, sf_dir).select(
        F.col("doc_id").alias("vid"), "component_id"
    )
    spanning = (
        lp.join(comp, "vid")
        .groupBy("community")
        .agg(F.countDistinct("component_id").alias("nc"))
        .where(F.col("nc") > 1)
        .count()
    )
    assert spanning == 0


def test_dense_templates_invariants(spark, sf_dir):
    """Density ∈ (0,1], char_share partitions ≤ 1, representative is
    the min member, and every community here also appears in
    graph_template_communities (same LP labeling, same pair input)."""
    rows = get("graph_dense_templates").builder(spark, sf_dir).collect()
    assert rows, "no multi-doc communities found"
    for r in rows:
        assert r["n_docs"] >= 2
        assert 0.0 < r["density"] <= 1.0
        assert 0.0 < r["char_share"] < 1.0
        assert r["rep_doc_id"] <= r["community_id"] or r["n_docs"] >= 2
        max_edges = r["n_docs"] * (r["n_docs"] - 1) // 2
        assert 1 <= r["n_edges"] <= max_edges
    assert sum(r["char_share"] for r in rows) < 1.0
    tc = {
        r["community_id"]
        for r in get("graph_template_communities").builder(spark, sf_dir).collect()
    }
    assert {r["community_id"] for r in rows} <= tc


def test_best_rep_dedup_matches_oracle(spark, sf_dir):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "cur_best_rep_dedup")


def test_best_rep_is_longest_member_and_consistent_with_weights(spark, sf_dir):
    """The representative must be the longest member (so reps carry at
    least cluster_chars / n_docs), and clusters must agree with
    cur_cluster_dedup_weights on membership counts."""
    reps = get("cur_best_rep_dedup").builder(spark, sf_dir).collect()
    assert reps
    for r in reps:
        assert r["n_docs"] >= 2
        assert r["rep_chars"] * r["n_docs"] >= r["cluster_chars"]
        assert r["chars_saved"] == r["cluster_chars"] - r["rep_chars"]
    weights = {
        r["doc_id"]: r["multiplicity"]
        for r in get("cur_cluster_dedup_weights").builder(spark, sf_dir).collect()
        if r["multiplicity"] >= 2
    }
    assert {r["component_id"]: r["n_docs"] for r in reps} == weights


def test_pagerank_uniform_on_clique(spark):
    """A 4-clique is regular: the uniform quantized fixpoint must be
    reproduced exactly. With mass units: round 1 gives
    150000 + (85 * 3*(1e6 div 3)) div 100 = 999999, which is then
    stable (999999 div 3 = 333333 again)."""
    from lime_etl_spark.operators.graph import pagerank

    vids = [1, 2, 3, 4]
    edges_py = [(a, b) for i, a in enumerate(vids) for b in vids[i + 1 :]]
    vs = spark.createDataFrame([(v,) for v in vids], ["vid"])
    es = spark.createDataFrame(edges_py, ["src", "dst"])
    got = {r.vid: r.pagerank_ppm for r in pagerank(vs, es).collect()}
    assert got == {v: 999999 for v in vids}


def test_pagerank_star_center_dominates_and_matches_int_reference(spark):
    """Star K1,4: the center must outrank every leaf and every value
    must EQUAL a driver-side integer power iteration with the same
    round count (bit-exact, not approx — that's the quantized-mass
    contract the DuckDB oracle relies on)."""
    from lime_etl_spark.operators.graph import (
        PR_DAMPING_PCT,
        PR_ITERATIONS,
        PR_MASS,
        pagerank,
    )

    vids = [0, 1, 2, 3, 4]
    edges_py = [(0, leaf) for leaf in vids[1:]]
    vs = spark.createDataFrame([(v,) for v in vids], ["vid"])
    es = spark.createDataFrame(edges_py, ["src", "dst"])
    got = {r.vid: r.pagerank_ppm for r in pagerank(vs, es).collect()}

    # reference integer power iteration (same fixed rounds, same
    # floor-division formula)
    base = PR_MASS * (100 - PR_DAMPING_PCT) // 100
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    pr = {v: PR_MASS for v in vids}
    for _ in range(PR_ITERATIONS):
        inbound = {v: 0 for v in vids}
        for a, b in edges_py:
            inbound[b] += pr[a] // deg[a]
            inbound[a] += pr[b] // deg[b]
        pr = {v: base + (PR_DAMPING_PCT * inbound[v]) // 100 for v in vids}

    assert got == pr
    # quantization leaks at most a few ppm per round — mass stays put
    assert sum(got.values()) <= len(vids) * PR_MASS
    assert sum(got.values()) >= len(vids) * (PR_MASS - 100)
    assert all(got[0] > got[leaf] for leaf in vids[1:])


def test_pagerank_top_is_ordered_and_bounded(spark, sf_dir):
    """Registered query: ≤ k rows, ordered by (ppm desc, vid), every
    vertex has degree ≥ 1 (active subgraph only)."""
    from lime_etl_spark.operators.graph import PR_TOP_K
    from lime_etl_spark.plans.registry import all_queries

    rows = all_queries()["graph_pagerank_top"].builder(spark, sf_dir).collect()
    assert 0 < len(rows) <= PR_TOP_K
    keys = [(-r.pagerank_ppm, r.vid) for r in rows]
    assert keys == sorted(keys)
    assert all(r.degree >= 1 for r in rows)


def test_kcore_analytic_cases(spark):
    """Peeling fixpoints: a 4-clique IS its own 3-core; a 5-chain has
    an empty 2-core (ends peel and the chain cascades); a clique with
    a pendant strips exactly the pendant at k=2."""
    from lime_etl_spark.operators.insights2 import k_core

    def run(vids, edges_py, k):
        vs = spark.createDataFrame([(v,) for v in vids], ["vid"])
        es = spark.createDataFrame(edges_py, ["src", "dst"])
        return {r.vid for r in k_core(vs, es, k=k).collect()}

    clique = [(a, b) for i, a in enumerate([1, 2, 3, 4]) for b in [1, 2, 3, 4][i + 1 :]]
    assert run([1, 2, 3, 4], clique, 3) == {1, 2, 3, 4}

    chain = [(i, i + 1) for i in range(1, 5)]
    assert run(list(range(1, 6)), chain, 2) == set()

    pendant = clique + [(4, 9)]
    assert run([1, 2, 3, 4, 9], pendant, 2) == {1, 2, 3, 4}


def test_node_jaccard_matches_oracle(spark, sf_dir):
    from lime_etl_spark.plans.registry import release_tracked_persists

    assert_query_matches_oracle(spark, sf_dir, "graph_node_jaccard")
    release_tracked_persists()


def test_node_jaccard_analytic_star_and_bounds(spark, sf_dir):
    """On a star a-x-b, the leaves (a, b) share exactly the hub: J =
    1/(1+1-1) = 1.0 when both have degree 1; general rows stay in
    (0, 1] with the exact division identity."""
    from lime_etl_spark.operators.graph import graph_node_jaccard
    from lime_etl_spark.plans.registry import release_tracked_persists

    rows = graph_node_jaccard(spark, sf_dir).collect()
    release_tracked_persists()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 1 <= r.common_neighbors <= min(r.deg_a, r.deg_b)
        expect = r.common_neighbors / (r.deg_a + r.deg_b - r.common_neighbors)
        assert r.node_jaccard == expect
        assert 0.0 < r.node_jaccard <= 1.0
    # descending by score with (doc_a, doc_b) tie-break: the LIMIT's
    # order contract
    keys = [(-r.node_jaccard, r.doc_a, r.doc_b) for r in rows]
    assert keys == sorted(keys)


# --- wedge-join degree capping (r6 verdict #2) ---------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


def test_cap_adjacency_keeps_smallest_neighbors_deterministically(spark):
    from lime_etl_spark.functions.skew import cap_adjacency

    sym = _edges(spark, [(i, 0) for i in range(1, 11)]).selectExpr(
        "doc_a AS v", "doc_b AS n"
    )
    kept = cap_adjacency(sym, pivot="n", other="v", cap=4).collect()
    assert sorted(r.v for r in kept) == [1, 2, 3, 4]
    # no-op when the cap exceeds the degree
    assert cap_adjacency(sym, pivot="n", other="v", cap=100).count() == 10


def test_node_jaccard_cap_binds_on_planted_hub(spark):
    """Star hub 0 with 10 leaves: uncapped wedge enumeration emits
    C(10,2)=45 leaf pairs through the hub; cap=4 bounds it to
    C(4,2)=6 pairs over the 4 smallest leaf ids, while degrees in the
    denominator stay UNcapped (leaves keep deg=1 -> J=1.0)."""
    from lime_etl_spark.operators.graph import node_jaccard_from_edges

    star = _edges(spark, [(0, i) for i in range(1, 11)])
    full = node_jaccard_from_edges(star, cap=None).collect()
    assert len(full) == 45
    capped = node_jaccard_from_edges(star, cap=4).collect()
    assert len(capped) == 6
    assert {(r.doc_a, r.doc_b) for r in capped} == {
        (a, b) for a in range(1, 5) for b in range(a + 1, 5)
    }
    for r in capped:
        assert (r.deg_a, r.deg_b) == (1, 1)  # full degrees, not capped
        assert r.common_neighbors == 1
        assert r.node_jaccard == 1.0


def test_node_jaccard_cap_is_no_op_below_cap(spark):
    """On a graph whose max degree is under the cap, capped == uncapped
    exactly — the 'exact whenever max degree <= cap' contract."""
    from lime_etl_spark.operators.graph import (
        WEDGE_DEGREE_CAP,
        node_jaccard_from_edges,
    )

    edges = _edges(
        spark,
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (1, 4), (0, 5), (5, 6)],
    )
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    capped = sorted(node_jaccard_from_edges(edges).collect(), key=key)
    full = sorted(node_jaccard_from_edges(edges, cap=None).collect(), key=key)
    assert [tuple(r) for r in capped] == [tuple(r) for r in full]
    assert WEDGE_DEGREE_CAP >= 8  # sanity: test graph is far below the cap


def test_triangle_cap_exact_below_cap_and_lower_bound_above(spark):
    """K6 has C(6,3)=20 triangles: exact when cap >= max degree,
    a strict lower bound (never an overcount) when the cap binds."""
    from lime_etl_spark.operators.graph import triangle_count_from_edges

    k6 = _edges(spark, [(a, b) for a in range(6) for b in range(a + 1, 6)])
    assert triangle_count_from_edges(k6, cap=None).collect()[0].n_triangles == 20
    assert triangle_count_from_edges(k6, cap=5).collect()[0].n_triangles == 20
    capped = triangle_count_from_edges(k6, cap=2).collect()[0].n_triangles
    assert 0 < capped < 20
