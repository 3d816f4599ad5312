"""Distributed connected components + duplicate-cluster assignment.

Near-dup PAIRS (dedup.py) are only half the dedup story: to keep one
canonical doc per duplicate *cluster* you need the transitive closure
of the pair relation — A≈B, B≈C puts A,C in one cluster even if A,C
never paired. That closure is connected components over the pair
graph.

Spark-first design (min-label propagation):

- Each iteration is one join (labels → symmetrized edges) + one
  groupBy-min, both hashing on vertex id — the label table's
  partitioning is reused across iterations.
- Iterating DataFrames grows the lineage/plan exponentially, so each
  round ``localCheckpoint``s the new label table (materialize +
  truncate lineage) and unpersists the old one; the edge table is
  persisted once up front.
- Convergence = zero labels changed (one count() action per round).
  Rounds needed = graph diameter; duplicate clusters are shallow
  (near-clique), so 3–5 rounds in practice. For adversarially long
  chain graphs the large-star/small-star variant (Kiveris et al.,
  "Connected Components in MapReduce", SOCC'14) halves diameter per
  round — documented here as the escalation path; min-propagation is
  the right default for dedup-shaped graphs.
- The oracle is a DuckDB RECURSIVE CTE computing the same closure —
  UNION-dedup semantics guarantee termination; MIN over reachable
  ids is exactly the propagated label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.operators.dedup import (
    JACCARD_TAU,
    _minhash_sql,
    doc_shingles,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
)
from lime_etl_spark.plans.registry import register, track_persist
from lime_etl_spark.sources.readers import load_table

MAX_CC_ITERATIONS = 25


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iterations: int = MAX_CC_ITERATIONS
) -> DataFrame:
    """(vid, label) with label = min vertex id in the component.

    ``vertices``: one column ``vid``. ``edges``: columns ``src``,
    ``dst`` (undirected; one row per pair is enough).
    """
    # cache the edge input FIRST: the symmetrizing union has two
    # branches, and without the cache each branch re-runs the whole
    # upstream pair-mining pipeline (LSH candidates + verify) once.
    # The count is a deliberate eager materializer: on a multi-executor
    # cluster, cache get-or-compute dedup is per-BlockManager, so two
    # sibling stages reading an UNCACHED edges_c could each run the
    # expensive pair-mining upstream concurrently. sym itself needs no
    # warm-up — its legs read the now-cached edges_c, so duplicated
    # work there is a cheap union, not the upstream pipeline.
    edges_c = edges.select("src", "dst").persist()
    edges_c.count()
    sym = edges_c.unionByName(
        edges_c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # iterate ONLY the active subgraph: vertices touching an edge.
    # Isolated vertices (the overwhelming majority in a dedup graph —
    # most docs have no near-dup) can never change label, so they
    # skip the loop entirely and rejoin at the end. At 100 TB this is
    # the difference between iterating N docs and iterating the few
    # that actually have a duplicate.
    labels = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .select(F.col("vid"), F.col("vid").alias("label"))
    )
    # the INIT checkpoint stays eager (it is consumed twice per
    # round); its job also populates the sym cache from the already-
    # cached edges_c. The IN-LOOP checkpoints are lazy: each is
    # materialized exactly once by the round's convergence count
    # before the next round builds, folding checkpoint + count into
    # one scheduler job per round.
    labels = labels.localCheckpoint()
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.src == labels.vid)
            .groupBy(F.col("dst").alias("nv"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # the moved flag rides along in the SAME materialization, so
        # convergence detection costs one filter-count on the already
        # checkpointed table instead of a new-vs-old join per round
        new_labels = (
            labels.join(nbr_min, labels.vid == F.col("nv"), "left")
            .select(
                labels.vid,
                F.least(
                    labels.label, F.coalesce(F.col("nbr_label"), labels.label)
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), labels.label) < labels.label).alias(
                    "moved"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=False)
        labels = new_labels.select("vid", "label")
        if new_labels.where("moved").count() == 0:
            break
    else:
        # a silent cap would return WRONG labels (a half-flooded chain)
        edges_c.unpersist()
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            "(graph diameter exceeds the budget); raise max_iterations or use "
            "connected_components_star, which converges in O(log diameter)."
        )
    edges_c.unpersist()
    sym.unpersist()
    return vertices.join(labels, "vid", "left").select(
        vertices.vid, F.coalesce(F.col("label"), vertices.vid).alias("label")
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    )
    SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
    FROM reach
    GROUP BY vid
    ORDER BY doc_id
    """,
    description="duplicate clusters: connected components over LSH-verified near-dup pairs",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document labeled with its duplicate-cluster id (min doc_id
    reachable through Jaccard≥τ near-dup pairs; singletons label
    themselves). Pairs come from the scale path — MinHash+LSH
    candidates, candidate-scoped exact-Jaccard verify — then the
    min-label loop closes the clusters."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    return cc.select(
        F.col("vid").alias("doc_id"), F.col("label").alias("component_id")
    ).orderBy("doc_id")


def connected_components_star(
    vertices: DataFrame, edges: DataFrame, max_iterations: int = MAX_CC_ITERATIONS
) -> DataFrame:
    """(vid, label) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14) — the escalation path min-propagation documents: star
    rounds HALVE long paths, so convergence is O(log diameter) rounds
    instead of O(diameter). Use for adversarially chain-shaped graphs;
    for shallow near-clique dedup graphs plain propagation wins on
    constant factors.

    Each round is two groupBy-min passes over the edge list:
      large-star: every node links its LARGER neighbors to its
        current minimum (min of neighborhood ∪ self);
      small-star: every node links its smaller-or-equal neighbors
        to that minimum, collapsing local stars.
    Both hash on the node id; each round's edge list is
    localCheckpoint'd (lineage truncation, same discipline as the
    propagation loop). Converged when an alternation leaves the
    canonical edge set unchanged.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", "u").alias("m"))
        out = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
        )
        return out.where(F.col("lo") != F.col("hi")).distinct()

    def small_star(e: DataFrame) -> DataFrame:
        # orient every edge toward the larger endpoint: u = hi, v = lo
        nbr = e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        mins = nbr.groupBy("u").agg(F.min("v").alias("m"))
        linked = nbr.join(mins, "u").select(
            F.col("m").alias("lo"), F.col("v").alias("hi")
        )
        self_link = mins.select(F.col("m").alias("lo"), F.col("u").alias("hi"))
        out = linked.unionByName(self_link)
        return out.where(F.col("lo") != F.col("hi")).distinct()

    cur = canon
    for _ in range(max_iterations):
        # lazy: the first exceptAll count materializes the checkpoint
        nxt = small_star(large_star(cur)).localCheckpoint(eager=False)
        changed = (
            nxt.exceptAll(cur).limit(1).count() + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iterations} rounds."
        )
    # fixpoint is a forest of stars: hi points at its component min
    star = cur.select(F.col("hi").alias("vid"), F.col("lo").alias("label"))
    return vertices.join(star, "vid", "left").select(
        vertices.vid, F.coalesce(F.col("label"), vertices.vid).alias("label")
    )


@register(
    "cur_cluster_dedup_weights",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    ),
    comp AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    )
    SELECT component_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS multiplicity,
           CAST(SUM(n_chars) AS BIGINT) AS cluster_chars
    FROM comp JOIN documents USING (doc_id)
    GROUP BY component_id
    ORDER BY doc_id
    """,
    description="cluster-deduped corpus: one representative per duplicate cluster with multiplicity weight",
)
def cur_cluster_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step AFTER duplicate clustering in a real curation pipeline:
    collapse each near-dup cluster to its representative (min doc_id)
    and carry the evidence as columns — ``multiplicity`` (cluster
    size, the standard upweighting/downsampling signal: dup count ≈
    popularity) and ``cluster_chars`` (bytes the dedup saved).

    Scale: reuses the LSH→verify→connected-components pipeline
    (candidate-scoped, active-subgraph-only); the final rollup is a
    groupBy on component_id — cluster-sized groups, overwhelmingly
    singletons in a real corpus, so the shuffle carries one row per
    document and combines map-side."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    return (
        cc.join(docs.select(F.col("doc_id").alias("vid"), "n_chars"), "vid")
        .groupBy(F.col("label").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("multiplicity"),
            F.sum("n_chars").cast("bigint").alias("cluster_chars"),
        )
        .orderBy("doc_id")
    )


LP_MAX_ITERATIONS = 10


def label_propagation(
    vertices: DataFrame, edges: DataFrame, max_iterations: int = LP_MAX_ITERATIONS
) -> DataFrame:
    """(vid, community) via synchronous label propagation (Raghavan et
    al. 2007): each round every vertex adopts the most frequent label
    in its neighborhood, ties broken by smallest label. Communities
    are denser-than-their-surroundings groups — on a near-dup graph
    this separates template families that connected components would
    merge through a single accidental bridge edge.

    Determinism: synchronous updates + the (count desc, label asc)
    tie-break make every round a pure function of the previous
    labeling. A self-loop vote is added for every vertex — without
    it, 2-cycles swap labels forever (a←b, b←a); with it the pair
    ties and both take the min.

    Scale: one join (labels → symmetrized edges) + one (dst, label)
    count + one per-dst top-1 window per round — all hash on vertex
    id, same reuse discipline as connected_components; each round
    localCheckpoints to stop lineage growth. Runs on the active
    subgraph only (vertices with an edge); isolated vertices label
    themselves and skip the loop. Fixed round budget: LP is a
    heuristic that stabilizes in a handful of rounds on clustered
    graphs; unlike connected_components a non-fixpoint is still a
    valid community labeling, so hitting the cap is not an error."""
    from pyspark.sql import Window

    # eager materializer — see connected_components: an uncached
    # edges_c read by sibling stages would duplicate the expensive
    # pair-mining upstream on a multi-executor cluster
    edges_c = edges.select("src", "dst").where(F.col("src") != F.col("dst")).persist()
    edges_c.count()
    active = (
        edges_c.select(F.col("src").alias("vid"))
        .unionByName(edges_c.select(F.col("dst").alias("vid")))
        .distinct()
    )
    # symmetrize + self-loops: every vertex votes for itself once
    sym = (
        edges_c.unionByName(
            edges_c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .unionByName(active.select(F.col("vid").alias("src"), F.col("vid").alias("dst")))
        .persist()
    )
    # eager init checkpoint (it is read twice per round; note its
    # lineage is active/edges_c only — sym first materializes inside
    # round 1, from the already-cached edges_c). In-loop checkpoints
    # are lazy — the round's convergence count materializes each
    # exactly once before the next round builds.
    labels = active.select("vid", F.col("vid").alias("community")).localCheckpoint()
    top1 = Window.partitionBy("dst").orderBy(
        F.desc("n_votes"), F.asc("community")
    )
    for _ in range(max_iterations):
        votes = (
            sym.join(labels, sym.src == labels.vid)
            .groupBy("dst", "community")
            .agg(F.count(F.lit(1)).alias("n_votes"))
        )
        new_labels = (
            votes.withColumn("rn", F.row_number().over(top1))
            .where(F.col("rn") == 1)
            .select(F.col("dst").alias("vid"), "community")
        )
        # carry a moved flag in the same materialization (one action/round)
        flagged = (
            labels.withColumnRenamed("community", "prev")
            .join(new_labels, "vid")
            .select("vid", "community", (F.col("community") != F.col("prev")).alias("moved"))
            .localCheckpoint(eager=False)
        )
        labels = flagged.select("vid", "community")
        if flagged.where("moved").count() == 0:
            break
    edges_c.unpersist()
    sym.unpersist()
    return vertices.join(labels, "vid", "left").select(
        vertices.vid, F.coalesce(F.col("community"), vertices.vid).alias("community")
    )


@register(
    "graph_cluster_density",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    ),
    comp AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    ncnt AS (
        SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM comp GROUP BY component_id
    ),
    ecnt AS (
        SELECT c.component_id, CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM pairs p JOIN comp c ON p.doc_a = c.doc_id
        GROUP BY c.component_id
    )
    SELECT n.component_id, n.n_docs, e.n_edges,
           CAST(2 * e.n_edges AS DOUBLE) / (n.n_docs * (n.n_docs - 1)) AS density
    FROM ncnt n JOIN ecnt e USING (component_id)
    WHERE n.n_docs >= 2
    ORDER BY n_docs DESC, component_id
    """,
    description="per-duplicate-cluster edge density (templated-corpus detector)",
)
def graph_cluster_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density profile of every duplicate cluster: n_docs, verified
    near-dup edge count, and edge density 2E/(n(n-1)). Density ≈ 1
    with large n is the templated-corpus signature (every member
    near-dups every other — a boilerplate family worth one
    representative); low density flags chain-merged clusters where a
    bridge doc glued unrelated groups (the classic over-merge audit
    before trusting transitive dedup).

    Scale: the verified pair table is persisted and used twice (CC
    edge input + per-cluster edge rollup) — never recomputed; both
    rollups are counters-only groupBys on component_id. The density
    division is one IEEE-exact double op over exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    ncnt = cc.groupBy(F.col("label").alias("component_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    ecnt = (
        pairs.join(cc, pairs.doc_a == cc.vid)
        .groupBy(F.col("label").alias("component_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    return (
        ncnt.join(ecnt, "component_id")
        .where(F.col("n_docs") >= 2)
        .select(
            "component_id",
            "n_docs",
            "n_edges",
            (
                (F.lit(2) * F.col("n_edges")).cast("double")
                / (F.col("n_docs") * (F.col("n_docs") - 1))
            ).alias("density"),
        )
        .orderBy(F.desc("n_docs"), "component_id")
    )


# Wedge-enumeration degree cap (r6 verdict #2): bound the Σ deg(pivot)²
# term in graph_node_jaccard / graph_triangles to ≤ CAP² rows per pivot
# vertex. 64 is far above the max near-dup degree at the test scales
# (results identical to the uncapped plan there) while bounding the
# hot-template hub at 100 TB — a deg=10⁵ boilerplate hub would
# otherwise put 10¹⁰ wedge rows through one key.
WEDGE_DEGREE_CAP = 64


def node_jaccard_from_edges(
    pairs: DataFrame, cap: int | None = WEDGE_DEGREE_CAP
) -> DataFrame:
    """Structural neighborhood Jaccard from a canonical (doc_a < doc_b)
    undirected edge list: all wedge pairs with their common-neighbor
    count, full degrees, and node_jaccard score (unordered, unlimited —
    callers rank/limit). ``cap`` bounds each pivot vertex's adjacency
    list during wedge enumeration (see cap_adjacency); degrees in the
    denominator always come from the UNcapped graph, so the score stays
    a true Jaccard lower bound rather than drifting with the cap.
    """
    from lime_etl_spark.functions.skew import cap_adjacency

    sym = pairs.select(
        F.col("doc_a").alias("v"), F.col("doc_b").alias("n")
    ).unionByName(pairs.select(F.col("doc_b").alias("v"), F.col("doc_a").alias("n")))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    wedge_src = sym if cap is None else cap_adjacency(sym, pivot="n", other="v", cap=cap)
    a, b = wedge_src.alias("a"), wedge_src.alias("b")
    common = (
        a.join(b, (F.col("a.n") == F.col("b.n")) & (F.col("a.v") < F.col("b.v")))
        .groupBy(F.col("a.v").alias("doc_a"), F.col("b.v").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_neighbors"))
    )
    da = deg.select(F.col("v").alias("doc_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("doc_b"), F.col("deg").alias("deg_b"))
    # No broadcast hints on the degree tables (r6 ADVICE): degree rows
    # scale with the number of docs that have near-dups, so a
    # data-proportional broadcast can exceed driver limits at 100 TB —
    # AQE picks broadcast at runtime whenever the side is actually small.
    return (
        common.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors"))
            ).alias("node_jaccard"),
        )
    )


def triangle_count_from_edges(
    pairs: DataFrame, cap: int | None = WEDGE_DEGREE_CAP
) -> DataFrame:
    """Single-row exact-below-cap triangle count from a canonical
    (doc_a < doc_b) edge list. The a<b<c expansion join pivots on the
    middle vertex, so BOTH its adjacency directions are degree-capped
    (cap_adjacency) before the join — ≤ cap² candidate paths per
    pivot; the edge-existence probe stays uncapped (it only filters).
    A lower bound through hubs hotter than the cap, exact otherwise.
    """
    from lime_etl_spark.functions.skew import cap_adjacency

    pin = pairs if cap is None else cap_adjacency(pairs, "doc_b", "doc_a", cap)
    pout = pairs if cap is None else cap_adjacency(pairs, "doc_a", "doc_b", cap)
    p1, p2, p3 = pin.alias("p1"), pout.alias("p2"), pairs.alias("p3")
    return (
        p1.join(p2, F.col("p2.doc_a") == F.col("p1.doc_b"))
        .join(
            p3,
            (F.col("p3.doc_a") == F.col("p1.doc_a"))
            & (F.col("p3.doc_b") == F.col("p2.doc_b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


@register(
    "graph_node_jaccard",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    sym AS (
        SELECT doc_a AS v, doc_b AS n FROM pairs
        UNION ALL
        SELECT doc_b AS v, doc_a AS n FROM pairs
    ),
    deg AS (SELECT v, COUNT(*) AS deg FROM sym GROUP BY v),
    capped AS (
        SELECT v, n FROM (
            SELECT v, n, ROW_NUMBER() OVER (PARTITION BY n ORDER BY v) AS rn
            FROM sym
        ) WHERE rn <= {WEDGE_DEGREE_CAP}
    ),
    common AS (
        SELECT a.v AS doc_a, b.v AS doc_b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
        FROM capped a JOIN capped b ON a.n = b.n AND a.v < b.v
        GROUP BY a.v, b.v
    )
    SELECT c.doc_a, c.doc_b, c.common_neighbors,
           CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
           CAST(c.common_neighbors AS DOUBLE)
             / (da.deg + db.deg - c.common_neighbors) AS node_jaccard
    FROM common c
    JOIN deg da ON da.v = c.doc_a
    JOIN deg db ON db.v = c.doc_b
    ORDER BY node_jaccard DESC, c.doc_a, c.doc_b
    LIMIT 20
    """,
    description="structural neighborhood Jaccard on the near-dup graph: top wedge pairs by shared-neighbor overlap (link-prediction / cluster-merge primitive; degree-capped wedge enumeration)",
)
def graph_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURAL similarity on the near-dup graph: for every wedge
    pair (two docs sharing >=1 graph neighbor), the Jaccard of their
    neighbor SETS — |N(a)∩N(b)| / |N(a)∪N(b)|. High node-Jaccard
    pairs that are NOT yet edges are the classic link-prediction /
    cluster-merge candidates: two docs whose duplicates all overlap
    are the same template family even if their own pairwise text
    similarity fell just under τ. Distinct from the content Jaccard
    everywhere else in this family — this one never looks at text.

    Scale: wedge enumeration joins the symmetrized edge list on the
    shared endpoint, so cost is Σ_x deg(x)² — the standard wedge
    shape shared with graph_triangles. Each pivot's adjacency list is
    DEGREE-CAPPED at WEDGE_DEGREE_CAP before the self-join
    (cap_adjacency in functions/skew.py), bounding every task to
    ≤ cap² wedge rows per pivot — the hot-hub mitigation the r6
    docstring promised; the DuckDB oracle applies the identical
    deterministic cap. Degrees in the denominator stay UNcapped.
    Recall: wedges whose shared neighbor keeps >cap edges are
    undercounted (lower-bound scores through hubs); exact whenever
    max degree ≤ cap, which holds at every test scale. Output is a
    windowless top-20 (exact float ties broken on ids; the division
    is ONE IEEE op of exact integers on both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    sh.unpersist()
    out = (
        node_jaccard_from_edges(pairs)
        .orderBy(F.desc("node_jaccard"), "doc_a", "doc_b")
        .limit(20)
    )
    track_persist(pairs)
    return out


@register(
    "graph_local_clustering",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    sym AS (
        SELECT doc_a AS v, doc_b AS n FROM pairs
        UNION ALL
        SELECT doc_b AS v, doc_a AS n FROM pairs
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY v),
    capped AS (
        SELECT v, n FROM (
            SELECT v, n, ROW_NUMBER() OVER (PARTITION BY v ORDER BY n) AS rn
            FROM sym
        ) WHERE rn <= {WEDGE_DEGREE_CAP}
    ),
    tri AS (
        SELECT a.v, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM capped a
        JOIN capped b ON b.v = a.v AND a.n < b.n
        JOIN pairs p ON p.doc_a = a.n AND p.doc_b = b.n
        GROUP BY a.v
    )
    SELECT t.v AS doc_id, t.n_tri, d.deg,
           CAST(2 * t.n_tri AS DOUBLE) / (d.deg * (d.deg - 1)) AS local_clustering
    FROM tri t JOIN deg d ON d.v = t.v
    ORDER BY local_clustering DESC, doc_id
    LIMIT 20
    """,
    description="per-vertex local clustering coefficient of the near-dup graph (degree-capped wedge enumeration): top docs whose neighborhoods are cliques — true duplicate cores vs accidental hubs",
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watts–Strogatz LOCAL clustering coefficient per vertex:
    2·tri(v)/(deg(v)·(deg(v)−1)) — 1.0 means v's near-dups are all
    near-dups of each other (a true duplicate clique: collapse
    safely), low values mean v is a hub stitching unrelated docs
    (boilerplate contamination: review before collapsing). The
    per-vertex refinement of graph_triangles' single global
    transitivity number, and the per-DOC version of
    graph_cluster_density's per-cluster story.

    Scale: wedge enumeration self-joins each vertex's adjacency list,
    degree-capped at WEDGE_DEGREE_CAP exactly like graph_node_jaccard
    (≤ cap² wedges per vertex, identical deterministic cap in the
    oracle); the edge-existence probe joins the canonical pair list
    uncapped. Degrees in the denominator stay UNcapped, so the
    coefficient is a lower bound through hubs hotter than the cap and
    exact otherwise. Vertices with zero triangles drop out of the
    INNER join identically on both engines; top-20 order
    (coefficient DESC, doc_id) is total.
    """
    from lime_etl_spark.functions.skew import cap_adjacency

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    sh.unpersist()
    sym = pairs.select(
        F.col("doc_a").alias("v"), F.col("doc_b").alias("n")
    ).unionByName(pairs.select(F.col("doc_b").alias("v"), F.col("doc_a").alias("n")))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    capped = cap_adjacency(sym, pivot="v", other="n", cap=WEDGE_DEGREE_CAP)
    a, b = capped.alias("a"), capped.alias("b")
    tri = (
        a.join(b, (F.col("b.v") == F.col("a.v")) & (F.col("a.n") < F.col("b.n")))
        .join(
            pairs.alias("p"),
            (F.col("p.doc_a") == F.col("a.n")) & (F.col("p.doc_b") == F.col("b.n")),
        )
        .groupBy(F.col("a.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    out = (
        tri.join(deg, "v")
        .select(
            F.col("v").alias("doc_id"),
            "n_tri",
            "deg",
            (
                (F.lit(2) * F.col("n_tri")).cast("double")
                / (F.col("deg") * (F.col("deg") - 1))
            ).alias("local_clustering"),
        )
        .orderBy(F.desc("local_clustering"), "doc_id")
        .limit(20)
    )
    track_persist(pairs)
    return out


def _lpa_sql() -> str:
    """CTE-list fragment (no WITH keyword) replaying label_propagation
    round by round in DuckDB. Valid because every LPA round is a pure
    integer function of the previous labeling (vote counts + the
    (count desc, label asc) tie-break), and a converged labeling is a
    FIXPOINT — so unrolling the full LP_MAX_ITERATIONS budget equals
    the Spark loop's early-exit result whether or not it converged
    early (extra rounds are no-ops). MATERIALIZED CTEs stop the
    2^rounds inlining blowup (each round references the previous one
    inside an aggregate)."""
    from lime_etl_spark.operators.dedup import _minhash_sql

    rounds = []
    for k in range(1, LP_MAX_ITERATIONS + 1):
        rounds.append(f"""
    lab{k} AS MATERIALIZED (
        SELECT dst AS vid, community FROM (
            SELECT dst, community,
                   ROW_NUMBER() OVER (PARTITION BY dst
                                      ORDER BY n_votes DESC, community ASC) AS rn
            FROM (
                SELECT s.dst, l.community, COUNT(*) AS n_votes
                FROM lpa_sym s JOIN lab{k - 1} l ON l.vid = s.src
                GROUP BY s.dst, l.community
            )
        ) WHERE rn = 1
    )""")
    return f"""
    lpa_pairs AS MATERIALIZED (SELECT doc_a, doc_b, jaccard FROM ({_minhash_sql()})),
    lpa_sym AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM lpa_pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM lpa_pairs
        UNION
        SELECT v AS src, v AS dst FROM (
            SELECT doc_a AS v FROM lpa_pairs UNION SELECT doc_b FROM lpa_pairs
        )
    ),
    lab0 AS MATERIALIZED (
        SELECT DISTINCT src AS vid, src AS community FROM lpa_sym
    ),
    {",".join(rounds)}
    """


_LPA_FINAL = f"lab{LP_MAX_ITERATIONS}"


@register(
    "graph_template_communities",
    oracle=f"""
    WITH {_lpa_sql()},
    stats AS (
        SELECT l.community AS community_id, COUNT(*) AS n_docs,
               MIN(l.vid) AS rep_doc_id, SUM(d.n_chars) AS total_chars
        FROM {_LPA_FINAL} l JOIN documents d ON d.doc_id = l.vid
        GROUP BY l.community
    )
    SELECT CAST(community_id AS BIGINT) AS community_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(rep_doc_id AS BIGINT) AS rep_doc_id,
           CAST(total_chars AS BIGINT) AS total_chars
    FROM stats
    WHERE n_docs >= 2
    ORDER BY n_docs DESC, community_id
    """,
    description="template families: label-propagation communities over the near-dup graph with size/volume stats (unrolled-round DuckDB oracle)",
)
def graph_template_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-family mining: label-propagation communities over
    the verified near-dup graph, one row per multi-doc community with
    member count, representative (min doc id), and total characters —
    the triage table a curation team reads top-down to decide which
    template explosions to collapse. Differs from dedup_components
    exactly where it matters: a bridge edge glues two families into
    one component, but LP keeps them separate communities (the
    containment is strict: every community lies inside one component).

    Scale: same candidate-scoped LSH pair input and active-subgraph
    iteration as CC; the stats rollup rides the community label —
    one counter groupBy. Oracle: the synchronous vote rounds are pure
    integer functions, so DuckDB replays them unrolled (_lpa_sql);
    convergence being a fixpoint makes the unroll-at-cap equal to the
    Spark loop's early exit."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    lp = label_propagation(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    return (
        lp.join(docs.select(F.col("doc_id").alias("vid"), "n_chars"), "vid")
        .groupBy(F.col("community").alias("community_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("vid").cast("bigint").alias("rep_doc_id"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "community_id")
    )


@register(
    "graph_dense_templates",
    oracle=f"""
    WITH {_lpa_sql()},
    stats AS (
        SELECT l.community AS community_id, COUNT(*) AS n_docs,
               MIN(l.vid) AS rep_doc_id, SUM(d.n_chars) AS total_chars
        FROM {_LPA_FINAL} l JOIN documents d ON d.doc_id = l.vid
        GROUP BY l.community
        HAVING COUNT(*) >= 2
    ),
    e_in AS (
        SELECT la.community AS community_id, COUNT(*) AS n_edges
        FROM lpa_pairs p
        JOIN {_LPA_FINAL} la ON la.vid = p.doc_a
        JOIN {_LPA_FINAL} lb ON lb.vid = p.doc_b
        WHERE la.community = lb.community
        GROUP BY la.community
    ),
    tot AS (SELECT SUM(n_chars) AS corpus_chars FROM documents)
    SELECT CAST(s.community_id AS BIGINT) AS community_id,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(s.rep_doc_id AS BIGINT) AS rep_doc_id,
           CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
           CAST(2 * COALESCE(e.n_edges, 0) AS DOUBLE)
             / CAST(s.n_docs * (s.n_docs - 1) AS DOUBLE) AS density,
           CAST(s.total_chars AS BIGINT) AS total_chars,
           CAST(s.total_chars AS DOUBLE) / CAST(t.corpus_chars AS DOUBLE)
               AS char_share
    FROM stats s
    LEFT JOIN e_in e ON e.community_id = s.community_id
    CROSS JOIN tot t
    ORDER BY density DESC, total_chars DESC, community_id
    """,
    description="densest-template mining: LP communities ranked by density × char volume (unrolled-round DuckDB oracle)",
)
def graph_dense_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The triage table for boilerplate collapse, ranked by payoff:
    label-propagation communities with their internal edge density,
    representative doc, and share of total corpus characters. A
    curation team works this list top-down — a community with
    density ≈ 1 and a large char_share is a template explosion where
    keeping one representative deletes the most redundant bytes with
    the least risk (low-density communities need human eyes first;
    graph_cluster_density measures that failure mode corpus-wide).

    Scale: ONE LSH pair pipeline feeds both uses (community detection
    and the within-community edge count) — the pair table is persisted
    across them, so the expensive candidate-verify runs once. The
    density join rides the community labels (broadcast-sized rollup);
    the corpus char total is a 1-row broadcast, and char_share is a
    single IEEE division.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    sh.unpersist()
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    lp = label_propagation(docs.select(F.col("doc_id").alias("vid")), edges).persist()

    # within-community verified edges: both endpoints share the label
    la = lp.select(F.col("vid").alias("doc_a"), F.col("community").alias("comm_a"))
    lb = lp.select(F.col("vid").alias("doc_b"), F.col("community").alias("comm_b"))
    e_in = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("comm_a") == F.col("comm_b"))
        .groupBy(F.col("comm_a").alias("community_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    total_chars = docs.agg(F.sum("n_chars").cast("bigint").alias("corpus_chars"))
    stats = (
        lp.join(docs.select(F.col("doc_id").alias("vid"), "n_chars"), "vid")
        .groupBy(F.col("community").alias("community_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("vid").cast("bigint").alias("rep_doc_id"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .where(F.col("n_docs") >= 2)
    )
    # LEFT join + coalesce: a 2+-doc community whose members share a
    # label without a direct verified edge has zero internal edges —
    # an inner join would silently drop exactly the density-0 rows a
    # triage list must surface (same zero-group principle as the
    # q_cross_sell_gaps fix).
    n_edges = F.coalesce(F.col("n_edges"), F.lit(0)).cast("bigint")
    out = (
        stats.join(e_in, "community_id", "left")
        .join(F.broadcast(total_chars))
        .select(
            "community_id",
            "n_docs",
            "rep_doc_id",
            n_edges.alias("n_edges"),
            (
                (2 * n_edges).cast("double")
                / (F.col("n_docs") * (F.col("n_docs") - 1)).cast("double")
            ).alias("density"),
            "total_chars",
            (F.col("total_chars").cast("double") / F.col("corpus_chars").cast("double")).alias(
                "char_share"
            ),
        )
        .orderBy(F.desc("density"), F.desc("total_chars"), "community_id")
    )
    return out


@register(
    "cur_best_rep_dedup",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    ),
    comp AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    ranked AS (
        SELECT c.component_id, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY c.component_id) AS n_docs,
               SUM(d.n_chars) OVER (PARTITION BY c.component_id) AS cluster_chars
        FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT component_id, CAST(n_docs AS BIGINT) AS n_docs,
           doc_id AS rep_doc_id,
           CAST(n_chars AS BIGINT) AS rep_chars,
           CAST(cluster_chars AS BIGINT) AS cluster_chars,
           CAST(cluster_chars - n_chars AS BIGINT) AS chars_saved
    FROM ranked
    WHERE rn = 1 AND n_docs >= 2
    ORDER BY component_id
    """,
    description="quality-aware cluster collapse: keep the LONGEST member of each near-dup cluster",
)
def cur_best_rep_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection that keeps CONTENT, not the accident of
    the smallest id: within each near-dup cluster the longest member
    (ties → min id) survives — the excerpt/truncated variants are the
    ones dropped, which is what you want when clusters mix a full
    article with its teasers (dedup_containment finds exactly those
    shapes). chars_saved is the dedup payoff ledger per cluster.

    Same persisted LSH→verify→CC pipeline as cur_cluster_dedup_weights;
    the argmax is a per-cluster top-1 window (WindowGroupLimit prunes
    map-side), so collapsing adds one bounded window over cluster-sized
    groups to the clustering cost.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    member = cc.join(docs.select(F.col("doc_id").alias("vid"), "n_chars"), "vid").select(
        F.col("label").alias("component_id"),
        F.col("vid").alias("doc_id"),
        "n_chars",
    )
    w = Window.partitionBy("component_id")
    ranked = member.select(
        "component_id",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_docs"),
        F.sum("n_chars").over(w).alias("cluster_chars"),
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("n_docs") >= 2))
        .select(
            "component_id",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").cast("bigint").alias("rep_chars"),
            F.col("cluster_chars").cast("bigint").alias("cluster_chars"),
            (F.col("cluster_chars") - F.col("n_chars")).cast("bigint").alias("chars_saved"),
        )
        .orderBy("component_id")
    )


# ---------------------------------------------------------------------------
# PageRank (power iteration)
# ---------------------------------------------------------------------------

PR_ITERATIONS = 10
PR_DAMPING_PCT = 85  # damping as an integer percentage (0.85)
PR_MASS = 1_000_000  # per-vertex mass units: pagerank in ppm of uniform


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = PR_ITERATIONS,
    damping_pct: int = PR_DAMPING_PCT,
) -> DataFrame:
    """(vid, degree, pagerank_ppm) by fixed-round INTEGER-QUANTIZED
    power iteration over the UNDIRECTED graph. Rank is carried in
    mass units of PR_MASS per vertex (uniform = 1e6 "ppm"), so the
    update pr'(v) = (1-d)/N + d·Σ_{u~v} pr(u)/deg(u) becomes pure
    int64 arithmetic:

        pr'(v) = PR_MASS·(100-d)/100  +  (d · Σ pr(u) div deg(u)) div 100

    Determinism: EXACT — every message is an integer floor division,
    every reduce an int64 sum, so the result is bit-identical under
    any partitioning/engine (the same md5-bridge discipline as the
    CMS/Bloom sketches; the per-round floors leak <deg ppm of mass,
    which is quantization, not noise). This is what lets the
    registered query carry a full DuckDB oracle (unrolled rounds).
    Int budget: total mass N·1e6 and the d·inbound product stay under
    2^63 for N up to ~1e11 vertices. Symmetrized edges mean no
    dangling-mass correction is needed; pass only the ACTIVE vertex
    set (isolated vertices hold the analytic base mass and never need
    iterating — same active-subgraph discipline as CC/LP).

    Scale: each round is one join (ranks → symmetrized edges) + one
    dst-keyed sum — both hash on vertex id, so every round reuses the
    same partitioning. Degrees are computed once and ride the rank
    frame. At 1000 executors the cost is iterations × one shuffle of
    |edges| messages — PageRank's irreducible core.

    The carry-forward side of a round only needs the STATIC
    (vid, deg) frame — not the previous round's ranks — so that frame
    is checkpointed once and every round consumes `ranks` exactly
    once (the r9-and-earlier form re-joined the full rank row and
    consumed ranks twice per round). Checkpoint cadence was MEASURED,
    not assumed (guide §1, r10): running all 10 rounds as one lazy
    plan is 1.4x SLOWER at sf0.1 (median 7.2 s vs 4.9 s; Catalyst
    re-analysis of the 30-join chain outgrows the saved scheduler
    barriers) and batched cadences sit in between (every-2: 5.7 s,
    every-3: 5.4 s, every-5: 5.3 s), so the per-round localCheckpoint
    stays — it bounds every submitted plan to one round while the
    shuffle files of the previous round double as recovery points.

    lime-etl analog: none — this is LLM-corpus graph triage (rank
    template hubs by centrality, not just size), grouped with the
    reference's report-job pattern (job_spec.py:40).
    """
    base = PR_MASS * (100 - damping_pct) // 100
    edges_c = edges.select("src", "dst").persist()
    sym = (
        edges_c.unionByName(
            edges_c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # The one eager materialization: the static degree frame, consumed
    # by every round's carry-forward join (and as the pr0 seed).
    vd = (
        vertices.join(deg, vertices.vid == deg.src)
        .select("vid", "deg")
        .localCheckpoint()
    )
    ranks = vd.select("vid", "deg", F.lit(PR_MASS).cast("bigint").alias("pr"))
    for _ in range(iterations):
        contrib = (
            ranks.join(sym, ranks.vid == sym.src)
            .select(F.col("dst").alias("vid"), F.expr("pr div deg").alias("c"))
            .groupBy("vid")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = vd.join(contrib, "vid", "left").select(
            "vid",
            "deg",
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({damping_pct} * coalesce(inbound, 0L)) div 100")
            ).alias("pr"),
        ).localCheckpoint()
    edges_c.unpersist()
    sym.unpersist()
    return ranks.select(
        "vid",
        F.col("deg").cast("bigint").alias("degree"),
        F.col("pr").cast("bigint").alias("pagerank_ppm"),
    )


PR_TOP_K = 20


def _pagerank_sql() -> str:
    """Unrolled-round DuckDB replay of the quantized PageRank over the
    LSH near-dup pair graph (same unroll trick as graph_kcore_summary;
    exact because every round is int64 floor arithmetic)."""
    from lime_etl_spark.operators.dedup import _minhash_sql

    base = PR_MASS * (100 - PR_DAMPING_PCT) // 100
    rounds = []
    for k in range(1, PR_ITERATIONS + 1):
        rounds.append(f"""
    pr{k} AS MATERIALIZED (
        SELECT d.vid, d.deg,
               {base} + ({PR_DAMPING_PCT} * COALESCE(inb.s, 0)) // 100 AS pr
        FROM (SELECT vid, deg FROM pr{k - 1}) d
        LEFT JOIN (
            SELECT e.dst AS vid, SUM(p.pr // p.deg) AS s
            FROM pr{k - 1} p JOIN edges e ON e.src = p.vid
            GROUP BY e.dst
        ) inb ON inb.vid = d.vid
    )""")
    return f"""
    WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_minhash_sql()})),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    pr0 AS MATERIALIZED (SELECT src AS vid, deg, CAST({PR_MASS} AS BIGINT) AS pr FROM deg),
    {",".join(rounds)}
    SELECT vid, CAST(deg AS BIGINT) AS degree, CAST(pr AS BIGINT) AS pagerank_ppm
    FROM pr{PR_ITERATIONS}
    ORDER BY pagerank_ppm DESC, vid
    LIMIT {PR_TOP_K}
    """


@register(
    "graph_pagerank_top",
    oracle=_pagerank_sql(),
    description="PageRank centrality over the near-dup graph: top hub documents (integer-quantized power iteration, oracle-replayed round by round)",
)
def graph_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template HUBS by centrality: the documents that near-duplicate
    into the most (and most-connected) neighborhoods — degree counts
    edges, PageRank weighs them by how duplicated the neighbors
    themselves are, which ranks the true template root above
    incidental members of the same family.

    The quantized-integer pagerank (mass units, floor divisions) is
    bit-exact cross-engine, so this carries a FULL DuckDB oracle: the
    LSH pair CTE shared with dedup_components plus the ten power
    rounds unrolled (graph_kcore_summary's unroll trick).

    Scale: same persisted LSH pair input as the CC/LP family; the
    power iteration runs on the active subgraph only. Top-k order is
    (pagerank_ppm desc, vid) — rank ties (isomorphic positions and
    quantization collisions) break on the id."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    active = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    pr = pagerank(active, edges)
    sh.unpersist()
    return pr.orderBy(F.desc("pagerank_ppm"), "vid").limit(PR_TOP_K)
