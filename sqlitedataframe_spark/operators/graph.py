"""Distributed connected components — the clustering step that turns
near-duplicate candidate *pairs* (MinHash/SimHash/Jaccard edges) into
duplicate *groups*, so a curation pipeline can keep one representative per
component.

Algorithm: min-label propagation with pointer jumping.

  labels[v]   starts as v.
  Each round: (1) every vertex takes the min label over itself and its
  neighbours (one groupBy on the edge list); (2) pointer jump — every
  vertex replaces its label L by labels[L] (one self-join on the labels
  frame). Step (2) halves the remaining propagation distance each round,
  so convergence is O(log diameter) rounds instead of O(diameter) — the
  difference between ~20 and ~10^5 rounds on chain-shaped dup clusters.

Scale notes (100 TB):
- State per round is one (node, comp) long-pair frame and the slim
  (src, dst) edge list; nothing wider ever shuffles.
- Each round = 2 shuffles (neighbour-min aggregation, pointer-jump join),
  both partitioned by node id; AQE coalesces as components collapse.
- Per-round state is localCheckpoint-truncated (the pointer-jump
  self-join doubles the plan per round without truncation), with an
  EXPLICIT block lifecycle (r5): each round unpersists the previous
  round's checkpoint handles once the witness materializes the new one,
  and the final round's handles are registered for
  util.release_caches() — PySpark never releases checkpoint blocks via
  GC, so without this every call pinned ~rounds block sets for the
  session. On a real cluster use ``setCheckpointDir`` + ``checkpoint()``
  for fault-tolerant truncation; the lifecycle is the same.
- The only driver-side state is the per-round changed-row count (one long).
  This is the standard stopping rule; the label frames never collect.

The reference (jackpal/SQLiteDataFrame) has no graph surface; this is part
of the training-data pipeline extension (dedup clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.util import (
    persistent_rdd_ids as _rdd_ids,
)
from sqlitedataframe_spark.operators.util import (
    register_cache as _register_cache,
)
from sqlitedataframe_spark.operators.util import (
    register_rdd_handles as _register_handles,
)
from sqlitedataframe_spark.operators.util import (
    take_rdd_handles as _take_handles,
)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` is an undirected edge list (each pair listed once is enough);
    ``nodes`` optionally supplies isolated vertices (defaults to the ids
    appearing in ``edges``). Returns (node, component) with component =
    min id of the node's connected component.
    """
    # r12: the incoming edge frame is referenced TWICE by the
    # symmetrizing union — when the caller hands a lazily-built expensive
    # frame (a banded LSH join, a wedge join), both branches re-ran it
    # inside e's one materialization. Lazy persist computes it once; CC
    # consumes edges fully, so no pushdown is lost (the minhash_lsh_pairs
    # lesson applies only to subsetting consumers).
    ed = _register_cache(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    )
    e = ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    if nodes is None:
        base = e.select(F.col("a").alias("node")).distinct()
    else:
        base = nodes.select(F.col(node_col).alias("node")).distinct()
    labels = base.select("node", F.col("node").alias("comp"))
    # Symmetrized edges are re-joined every round: keep them materialized
    # once instead of recomputing union+distinct per round.
    e = e.persist()
    # Round state MUST be localCheckpoint, not persist: the pointer-jump
    # self-join references the round's subtree TWICE, so without lineage
    # truncation the logical plan doubles per round (2^rounds nodes —
    # measured 6.8 s -> 55.7 s at sf0.01 when r5 briefly tried persist).
    # But PySpark never releases checkpoint blocks via GC (see
    # util.eager_cache), so the blocks are managed EXPLICITLY: each
    # round's handles are delta-captured after the witness action
    # materializes them, the previous round's are unpersisted (its blocks
    # are unreachable — the new checkpoint's plan is just LogicalRDD,
    # truncated), and the FINAL round's handles are registered for
    # util.release_caches(). Contract: consume the result before the
    # harness releases; a checkpoint-backed frame cannot re-execute after
    # release. On a real cluster use reliable checkpoint() to a DFS dir
    # for fault tolerance — same lifecycle.
    spark = labels.sparkSession
    seen = _rdd_ids(spark)
    labels = labels.localCheckpoint(eager=True)
    live = _take_handles(spark, seen)
    # Labels are monotone non-increasing, so the label-sum is a complete
    # convergence witness: stable sum <=> no label changed. One tiny
    # aggregate per round — no old-vs-new join, no extra action (the lazy
    # checkpoint is materialized by this same job). decimal(38,0) so the
    # sum cannot overflow ANSI bigint on huge id spaces.
    def _witness(frame: DataFrame) -> object:
        return frame.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev = _witness(labels)
    for _ in range(max_iter):
        # (1) neighbour-min: candidates = own label + labels flowing across
        # every edge, one min-agg partitioned by node.
        flowed = e.join(labels, e.a == labels.node).select(
            F.col("b").alias("node"), "comp"
        )
        relabeled = (
            flowed.union(labels.select("node", "comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # (2) pointer jump: comp <- labels[comp] (labels frame keyed by
        # node), strictly-decreasing so min() keeps correctness.
        ptr = relabeled.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        seen = _rdd_ids(spark)
        jumped = (
            relabeled.join(ptr, relabeled.comp == ptr.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("p_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        cur = _witness(jumped)  # materializes the lazy checkpoint
        new_handles = _take_handles(spark, seen)
        for h in live:  # previous round's blocks are unreachable now
            h.unpersist(False)
        live = new_handles
        labels = jumped
        if cur == prev:
            break
        prev = cur
    e.unpersist()
    _register_handles(live)  # released by the harness after consumption
    return labels


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_dp: int = 10,
    src: str = "src",
    dst: str = "dst",
    all_nodes_receive: bool = False,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list -> (node, pr).

    The canonical iterative-algorithm shape on Spark (the pattern GraphX/
    Pregel formalize), expressed purely in DataFrame ops so Catalyst/AQE
    plan every step:

    - out-degrees are computed ONCE and joined into the edge list before
      the loop, so each iteration is exactly one join (ranks -> edges on
      ``src``) plus one aggregation (contributions by ``dst``) — two
      hash exchanges on node id, nothing wider than (node, double).
    - each iteration's rank frame is persist()ed and materialized, the
      previous iteration unpersisted (r5 — see connected_components for
      why persist replaced localCheckpoint); iterations are few and
      fixed, so the growing-but-bounded lineage is cheap to plan (on a
      real cluster with many iterations use ``checkpoint()`` with a DFS
      checkpoint dir for truncation).
    - ranks are rounded to ``round_dp`` decimals each iteration. This is
      a *determinism contract*, not a numeric shortcut: parallel sums add
      contributions in partition order, so two runs (or two engines)
      differ in the last ulp; re-rounding every round pins the value both
      engines carry into the next iteration, which is what lets a SQL
      oracle reproduce the result exactly.

    Nodes are taken from the edge list (every src; sinks that never occur
    as src receive rank but contribute nothing). For an undirected graph
    pass both directions in ``edges``.

    ``all_nodes_receive=True`` is a caller promise that every node has at
    least one in-edge (always true for undirected graphs, where the node
    set IS the src set): the per-iteration left-join that re-attaches
    contribution-less nodes is then skipped — one fewer shuffle per
    iteration. Perf note for callers: shuffles carry the node id every
    round, so prefer compact integer ids and map to display labels after
    the loop, not before.

    ``broadcast_ranks=True`` broadcasts the (node, pr) and (node, degree)
    frames into the edge join, turning each iteration into a map-side
    join over the persisted edge list + one small aggregation exchange.
    Use it when the NODE count fits an executor broadcast (edges may
    still be arbitrarily large — node count is what matters). AQE cannot
    make this call itself: the rank frame sits behind a cache boundary
    with unknown size, so without the hint both per-iteration
    joins fall back to sort-merge. Leave False for billion-node graphs —
    the loop then uses hash-partitioned joins, the scale-safe default.

    The reference (jackpal/SQLiteDataFrame) has no graph surface; part of
    the training-data pipeline extension (SURVEY Tier D).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    ew = e.join(F.broadcast(deg) if broadcast_ranks else deg, "src").persist()
    nodes = ew.select(F.col("src").alias("node")).union(
        ew.select(F.col("dst").alias("node"))
    ).distinct()
    if all_nodes_receive:
        # node set == src set: seed ranks straight from the degree frame
        # (no distinct over both sides needed)
        ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
    else:
        ranks = nodes.select("node", F.lit(1.0).alias("pr"))
    base = F.lit(round(1.0 - damping, 10))
    prev = None
    for _ in range(iterations):
        rhs = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ew.join(rhs, ew.src == rhs.node)
            .groupBy("dst")
            .agg(
                F.round(base + F.lit(damping) * F.sum(F.col("pr") / F.col("_deg")), round_dp).alias("pr")
            )
            .select(F.col("dst").alias("node"), "pr")
        )
        if all_nodes_receive:
            ranks = contrib.persist()
        else:
            # nodes with no in-edges fall back to the teleport base rank
            ranks = (
                nodes.join(contrib, "node", "left")
                .select("node", F.coalesce("pr", base).alias("pr"))
                .persist()
            )
        ranks.count()  # materialize before dropping the previous round
        if prev is not None:
            prev.unpersist(False)
        prev = ranks
    ew.unpersist()
    _register_cache(ranks)  # released by the harness after consumption
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via the degree-ordered wedge join
    (compact-forward / node-iterator++): orient every undirected edge from
    its lower (degree, id) endpoint to the higher one, join wedges through
    the middle vertex, close them against the oriented edge list.

    The orientation is the scale story: on ANY graph the oriented
    out-degree is O(sqrt(m)), so the wedge stage is bounded even on
    power-law graphs — a hub with 10^7 neighbors would emit ~10^14 wedges
    under naive id-ordering if it had a low id, but emits only its
    few higher-degree neighbors' wedges when ordered by degree. Every
    triangle is counted exactly once (it has a unique (degree, id)-minimal
    vertex), so the total equals the naive id-ordered count — which is
    what the SQL oracle computes.

    Shuffles carry (long, long) edge rows only; the two joins key on
    single vertex columns; the result is one row (n_edges, n_triangles).
    """
    # r12: the caller's edge frame is typically an expensive build (a
    # co-occurrence join + HAVING aggregate); `e` is referenced twice by
    # the symmetrization, `und` twice (degrees + orientation), and
    # `oriented` FIVE times (both wedge sides, both closing orientations,
    # the edge count) — unpersisted, the whole upstream chain re-executed
    # per reference. Lazy persists: every consumer here reads the frames
    # in full, so no pushdown is lost.
    e = _register_cache(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .persist()
    )
    und = _register_cache(
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = und.groupBy(F.col("a").alias("n")).agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("_db"))
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = _register_cache(
        und.join(da, "a")
        .join(db, "b")
        .filter(lower_first)
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
        .persist()
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("m"))
    w2 = oriented.select(F.col("u").alias("m"), F.col("v").alias("w"))
    wedges = w1.join(w2, "m").select("u", "w", "m")
    closing = oriented.select(
        F.col("u").alias("u"), F.col("v").alias("w"), F.lit(1).alias("_c")
    ).union(
        # the closing edge may be oriented either way between u and w
        oriented.select(
            F.col("v").alias("u"), F.col("u").alias("w"), F.lit(1).alias("_c")
        )
    )
    tri = wedges.join(closing, ["u", "w"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    n_edges = oriented.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return n_edges.crossJoin(tri)


def degree_stats(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    d_min: int = 2,
    round_dp: int = 4,
) -> DataFrame:
    """Degree-distribution profile of an undirected graph: per
    floor(log2(degree)) bucket, node counts and mean degree, plus the
    continuous-MLE power-law exponent (Hill/Clauset estimator,
    ``alpha = 1 + n / sum(ln(d / (d_min - 0.5)))`` over nodes with
    degree >= d_min) — the first diagnostic on any co-occurrence or
    interaction graph (is this power-law? where do the hubs start?),
    and the input to hub-guard threshold choices like this repo's
    max_basket / hot-bucket caps.

    Scale shape: degrees are one count aggregate over the (deduped,
    both-direction) edge list; everything downstream — buckets, the
    alpha moments — aggregates the node-sized degree table; alpha rides
    back onto the bucket rows as a 1-row broadcast.
    """
    # r12: the edge argument (often an expensive co-occurrence join) is
    # referenced twice by the symmetrizing union, and the degree table
    # twice downstream (alpha + buckets) — lazily persisted so each
    # builds once
    ed = _register_cache(
        edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
        .persist()
    )
    und = ed.union(ed.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))).distinct()
    deg = _register_cache(
        und.groupBy("_a").agg(F.count(F.lit(1)).alias("_d")).persist()
    )
    alpha = deg.filter(F.col("_d") >= d_min).agg(
        F.round(
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("_d") / F.lit(d_min - 0.5))),
            round_dp,
        ).alias("alpha"),
        F.count(F.lit(1)).cast("bigint").alias("n_tail_nodes"),
    )
    return (
        deg.groupBy(F.floor(F.log2("_d")).cast("int").alias("deg_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.round(F.avg("_d") + 1e-9, round_dp).alias("avg_degree"),
        )
        .join(F.broadcast(alpha))
        .orderBy("deg_bucket")
    )


def neighbor_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_k: int = 20,
    round_dp: int = 6,
    max_center_degree: int | None = 10_000,
) -> DataFrame:
    """Link prediction by neighborhood Jaccard: score every NON-adjacent
    vertex pair (u < v) that shares at least one neighbor by
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| and return the ``top_k`` strongest
    candidate links — the classic structural similarity used for
    recommend-an-edge and entity-merge candidates.

    Input hygiene (ADVICE r6): edges are normalized FIRST —
    ``(least, greatest)``, self-loops dropped, duplicates distinct'd — so
    an edge stored as (hi, lo), stored twice, or stored in both
    orientations neither inflates degrees/common-neighbor counts nor
    slips past the known-edge anti-join (which runs against the
    normalized set, matching triangle_count's contract).

    Skew guard (VERDICT r6 #1): a hub vertex as a shared neighbor emits
    deg(hub)^2 wedges — the quadratic cliff that takes down a 100 TB run
    when one celebrity vertex connects to millions. Wedge CENTERS with
    degree above ``max_center_degree`` are excluded from wedge generation
    (the window count shuffles on the same key as the wedge join, so
    ReuseExchange shares one exchange), mirroring dedup's
    ``_suppress_hot_buckets``. The trade is explicit and local: pairs
    whose ONLY shared neighbors are suppressed hubs are not scored, and
    cn undercounts by the suppressed-hub paths — for link prediction the
    standard practice, since hub co-membership carries ~no signal
    (everyone shares the hub). True degrees in the Jaccard denominator
    are NEVER capped — only wedge generation is. ``None`` disables.

    Scale shape: the same degree-bounded wedge join as triangle_count —
    adjacency is symmetrized once, common-neighbor counts come from one
    equi-join on the shared neighbor id (shuffle key = vertex id, slim
    (w, u) pairs), degrees from one groupBy, and the union size is
    deg(u) + deg(v) - cn (no second pass over edges). Adjacent pairs are
    removed with an anti-join on the normalized edge list. Never
    materializes all-pairs: only wedge-connected pairs exist after the
    neighbor join. The final top-k is a TakeOrdered, not a global sort.

    Exactness: jaccard is one division of two small ints — bit-identical
    across engines — so ORDER BY (jaccard DESC, u, v) is drift-free.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    wedge = adj
    if max_center_degree is not None:
        cw = Window.partitionBy("v")
        wedge = (
            adj.withColumn("_wn", F.count(F.lit(1)).over(cw))
            .filter(F.col("_wn") <= max_center_degree)
            .drop("_wn")
        )
    a = wedge.select(F.col("v").alias("w"), F.col("u").alias("x"))
    b = wedge.select(F.col("v").alias("w"), F.col("u").alias("y"))
    cn = (
        a.join(b, "w")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    non_adj = cn.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    du = deg.select(F.col("u").alias("x"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("y"), F.col("deg").alias("deg_v"))
    scored = (
        non_adj.join(du, "x")
        .join(dv, "y")
        .select(
            F.col("x").alias("u"),
            F.col("y").alias("v"),
            "cn",
            "deg_u",
            "deg_v",
            F.round(
                F.col("cn")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
                round_dp,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(top_k)


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_k: int = 20,
    round_dp: int = 6,
    max_center_degree: int | None = 10_000,
) -> DataFrame:
    """Adamic–Adar link prediction: score every non-adjacent pair (u < v)
    by sum over shared neighbors w of 1/ln(deg(w)) — the classic
    degree-discounted companion to ``neighbor_jaccard`` (a shared rare
    neighbor is strong evidence; a shared hub is weak), returning the
    ``top_k`` candidates.

    Same input hygiene and wedge shape as neighbor_jaccard: normalized
    distinct edges, symmetrized adjacency, one equi-join on the shared
    neighbor id, anti-join against known edges, TakeOrdered top-k.
    The 1/ln(deg(w)) weight joins onto the wedge center BEFORE the pair
    aggregation (one vertex-keyed hash join — the wedge join's own
    shuffle key, so the exchange is shared). deg(w) = 1 cannot occur as
    a wedge center of a PAIR (one neighbor makes no pair), so ln is
    never zero. The hub cap (``max_center_degree``) doubles as the skew
    guard and as model hygiene — an uncapped hub contributes ~0 weight
    at deg^2 wedge cost.

    Exactness: the score is a <=deg-term float sum, rounded with the
    +1e-9 half-even bias; ordering is (rounded score DESC, u, v).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    wedge = adj
    if max_center_degree is not None:
        cw = Window.partitionBy("v")
        wedge = (
            adj.withColumn("_wn", F.count(F.lit(1)).over(cw))
            .filter(F.col("_wn") <= max_center_degree)
            .drop("_wn")
        )
    wdeg = wedge.join(
        deg.select(F.col("u").alias("v"), F.col("deg").alias("_dw")), "v"
    )
    a = wdeg.select(F.col("v").alias("w"), F.col("u").alias("x"), "_dw")
    b = wdeg.select(F.col("v").alias("w"), F.col("u").alias("y"))
    scored = (
        a.join(b, "w")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.round(F.sum(1.0 / F.log("_dw")) + 1e-9, round_dp).alias("aa_score"),
        )
    )
    non_adj = scored.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    return (
        non_adj.select(
            F.col("x").alias("u"), F.col("y").alias("v"), "cn", "aa_score"
        )
        .orderBy(F.col("aa_score").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(top_k)
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst", round_dp: int = 6
) -> DataFrame:
    """Degree assortativity coefficient: the Pearson correlation of
    (deg(u), deg(v)) over both orientations of every edge — positive for
    social-style graphs (hubs link hubs), negative for web/biology-style
    (hubs link leaves). The one-number structural summary that decides
    whether hub-capped algorithms (neighbor_jaccard, adamic_adar) will
    bite on this graph.

    Shape: normalize edges, one groupBy for degrees, two vertex-keyed
    hash joins to attach (deg_u, deg_v) to each directed edge end, one
    global 1-row aggregate. The product moments (x*y, x*x, y*y) are
    formed and summed in DECIMAL(38,0) — exact and order-free like the
    bigint path, but safe past int64: a celebrity hub of degree d
    contributes ~d^3 to sx2, which wraps int64 at d ≈ 2.1e6 while the
    decimal path stays exact to 1e38 (d ≈ 4.6e12). Only the final
    closed-form correlation switches to DOUBLE, from those exact sums —
    bit-identical across engines after rounding.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    du = deg.select(F.col("u"), F.col("deg").alias("x"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("y"))
    pairs = adj.join(du, "u").join(dv, "v")
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sx2"),
        F.sum(yd * F.col("y")).alias("sy2"),
    )
    # exact decimal sums -> DOUBLE only here; the oracle mirrors the
    # exact same IEEE op sequence over its own exact (HUGEINT) sums
    n = F.col("m2").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * F.col("sy")
    den = F.sqrt(
        (n * F.col("sx2").cast("double") - sx * F.col("sx"))
        * (n * F.col("sy2").cast("double") - sy * F.col("sy"))
    )
    return agg.select(
        F.col("m2"),
        # + 0.0: signed-zero convention — assortativity can be a tiny
        # negative, and DuckDB ROUND would emit -0.0 vs Spark's +0.0
        (
            F.round(
                F.when(den > 0, num / den).otherwise(F.lit(None)) + 1e-9, round_dp
            )
            + 0.0
        ).alias("assortativity"),
    )


def kcore_rounds(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling over an undirected edge list: each round
    drops every node whose degree among SURVIVORS is < k, then recounts.
    The k-core (the maximal subgraph where everyone keeps >= k neighbors)
    is the densest-region screen a curation pipeline runs on
    co-occurrence graphs — spam/bot rings and template farms live in
    high cores; organic long-tail content does not.

    Returns one row per round: (round, n_nodes, n_edges) of the surviving
    subgraph — the shrinking sequence is the readout, and round i ==
    round i-1 is the convergence witness. FIXED round count (not
    run-to-convergence) is the determinism contract: both engines do
    exactly ``rounds`` peels, so the output is identical even if some
    exotic graph hasn't converged by the last round.

    Plan per round: one degree aggregate over the surviving edge frame +
    one semi-join to keep edges whose BOTH endpoints survive — two hash
    exchanges on node id, nothing wider than (node, bigint). Each round
    references its predecessor THREE times (both adjacency directions +
    the edge filter), so round state is localCheckpoint-TRUNCATED with
    the explicit block lifecycle from connected_components — persist
    alone leaves the logical plan growing 3^rounds (measured: round 4
    took 50 s at sf0.01 under persist, <1 s truncated). The result rows
    are driver-local scalars, so ALL blocks release before returning.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    seen = _rdd_ids(spark)
    cur = e.localCheckpoint(eager=True)
    live = _take_handles(spark, seen)
    out: list[tuple[int, int, int]] = []
    for rnd in range(1, rounds + 1):
        adj = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.filter(F.col("_deg") >= k).select(F.col("u").alias("node"))
        seen = _rdd_ids(spark)
        nxt = (
            cur.join(keep.select(F.col("node").alias("u")), "u", "semi")
            .join(keep.select(F.col("node").alias("v")), "v", "semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n_edges = nxt.count()  # materializes the lazy checkpoint
        new_handles = _take_handles(spark, seen)
        n_nodes = (
            nxt.select("u").union(nxt.select("v")).distinct().count()
            if n_edges
            else 0
        )
        out.append((rnd, n_nodes, n_edges))
        for h in live:  # previous round's blocks are unreachable now
            h.unpersist(False)
        live = new_handles
        cur = nxt
    for h in live:  # result is driver-local; nothing re-executes cur
        h.unpersist(False)
    return spark.createDataFrame(
        out, "round: int, n_nodes: bigint, n_edges: bigint"
    )


def bfs_hops(
    edges: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-round BFS from the graph's top-degree hub (ties -> min id):
    one row per hop with the count of NEWLY reached nodes — the
    reachability profile that says how fast the giant component closes
    around its hub (a 2-hop-saturating graph is hub-and-spoke; a long
    tail of hops is chain-shaped). At most ``rounds`` expansions; the
    first EMPTY hop is emitted and then expansion stops (every later
    frontier is empty too), so the row set is a pure function of the
    data that the unrolled SQL oracle replays exactly.

    Plan per round: one hash join frontier->adjacency + one anti-join
    against the visited set — two node-id exchanges on slim pairs.
    Round state is localCheckpoint-truncated (each round references both
    the frontier and the growing visited set; persist alone would stack
    lineage), with the connected_components block lifecycle. The result
    rows are driver-local scalars, so all blocks release before return.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    seen = _rdd_ids(spark)
    adj = adj.localCheckpoint(eager=True)
    live = _take_handles(spark, seen)
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
    seed_row = (
        deg.orderBy(F.col("_deg").desc(), F.col("u").asc()).limit(1).collect()
    )
    out: list[tuple[int, int]] = [(0, 1)]
    if not seed_row:
        for h in live:
            h.unpersist(False)
        return spark.createDataFrame(out[:0], "hop: int, n_new: bigint")
    seed = seed_row[0]["u"]
    visited = spark.createDataFrame([(seed,)], "node: long")
    frontier = visited
    vis_handles: list = []
    for hop in range(1, rounds + 1):
        nxt = (
            adj.join(
                frontier.select(F.col("node").alias("u")), "u", "semi"
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "anti")
        )
        seen = _rdd_ids(spark)
        nxt = nxt.localCheckpoint(eager=False)
        n_new = nxt.count()
        new_h = _take_handles(spark, seen)
        out.append((hop, n_new))
        seen = _rdd_ids(spark)
        visited = visited.union(nxt).localCheckpoint(eager=True)
        new_vh = _take_handles(spark, seen)
        for h in vis_handles:
            h.unpersist(False)
        vis_handles = new_h + new_vh
        frontier = nxt
        # Emit the FIRST empty hop, then stop: once a frontier is empty
        # every later one is too, so both engines derive the same row
        # set from the data (the unrolled oracle guards each hop row on
        # the previous frontier being nonempty)
        if n_new == 0:
            break
    for h in vis_handles + live:
        h.unpersist(False)
    return spark.createDataFrame(out, "hop: int, n_new: bigint")


def _degree_oriented_triangles(e: DataFrame) -> DataFrame:
    """Enumerate every triangle of the normalized undirected edge list
    ``e`` (u < v by id, distinct) EXACTLY once as (a, b, c) — the
    compact-forward orientation shared with triangle_count: direct each
    edge from its lower (degree, id) endpoint to the higher one, form
    wedges at the orientation-minimal vertex, close against the oriented
    list. Only the wedge whose legs agree with the closing edge's
    orientation closes, so no explicit wedge dedup is needed.

    The orientation is the scale story: oriented out-degree is O(sqrt(m))
    on any graph, so wedge count is bounded even when a hub would emit
    ~deg^2 wedges under id-ordering.
    """
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("n")).agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("n").alias("u"), F.col("d").alias("_du"))
    db = deg.select(F.col("n").alias("v"), F.col("d").alias("_dv"))
    lower_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(da, "u")
        .join(db, "v")
        .filter(lower_first)
        .select(F.col("u").alias("x"), F.col("v").alias("y"))
    )
    w1 = oriented.select(F.col("x").alias("a"), F.col("y").alias("b"))
    w2 = oriented.select(F.col("x").alias("a"), F.col("y").alias("c"))
    wedges = w1.join(w2, "a").filter(F.col("b") != F.col("c"))
    closing = oriented.select(F.col("x").alias("b"), F.col("y").alias("c"))
    return wedges.join(closing, ["b", "c"]).select("a", "b", "c")


def local_clustering_topk(
    edges: DataFrame,
    top: int = 20,
    src: str = "src",
    dst: str = "dst",
    round_dp: int = 6,
) -> DataFrame:
    """Per-vertex triangle counts and local clustering coefficient
    ``c_v = 2*T_v / (deg_v * (deg_v - 1))`` for the ``top`` most
    triangle-heavy vertices (ties -> min id) — the node-level density
    screen (a vertex whose neighborhood is a clique is inside a spam
    ring or template cluster; triangle_count's global number can't say
    WHERE).

    Exactness: T_v and deg_v are exact integers; the coefficient is one
    closed-form double. Plan: triangles enumerate once via the
    degree-ordered compact-forward join (_degree_oriented_triangles —
    O(sqrt(m)) oriented out-degree, hub-safe where the id-ordered a<b<c
    join the oracle uses would emit ~deg^2 wedges at a low-id hub);
    per-vertex counts come from a 3-role explode of the triangle stream;
    top-k is TakeOrderedAndProject.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    tri = _degree_oriented_triangles(e)
    roles = F.array(F.col("a"), F.col("b"), F.col("c"))
    per_v = (
        tri.select(F.explode(roles).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    out = (
        per_v.join(deg.select(F.col("u").alias("node"), "deg"), "node")
        .select(
            "node",
            "deg",
            "triangles",
            F.round(
                2.0 * F.col("triangles").cast("double")
                / (F.col("deg") * (F.col("deg") - F.lit(1))).cast("double")
                + 1e-9,
                round_dp,
            ).alias("clustering_coef"),
        )
        .orderBy(F.col("triangles").desc(), F.col("node").asc())
        .limit(top)
    )
    _register_cache(e)
    return out


def ktruss_rounds(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-truss peeling: each round drops every edge whose
    triangle SUPPORT among surviving edges is < k-2, then recounts.
    The k-truss is the cohesion screen one notch stricter than k-core —
    a k-core hub can be a star (zero triangles), a truss edge must sit
    inside k-2 triangles, so trusses isolate the actually-clique-like
    spam/template rings that stars and brokers dilute in the core.

    Returns one row per round: (round, n_edges, n_nodes) of the
    surviving subgraph. FIXED round count (not run-to-convergence) is
    the determinism contract with the unrolled SQL oracle, exactly like
    kcore_rounds.

    Plan per round: one degree-ordered compact-forward triangle
    enumeration (_degree_oriented_triangles — O(sqrt(m)) oriented
    out-degree, hub-safe) and a 3-role explode to id-normalized per-edge
    support; the support>=k-2 survivors ARE the next round's edges.
    Round state references its predecessor several times, so it is
    localCheckpoint-TRUNCATED with the connected_components block
    lifecycle; the result rows are driver-local scalars, so all blocks
    release before return.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    seen = _rdd_ids(spark)
    cur = e.localCheckpoint(eager=True)
    live = _take_handles(spark, seen)
    out: list[tuple[int, int, int]] = []
    need = k - 2
    for rnd in range(1, rounds + 1):
        # degree-ordered enumeration: triangle vertices arrive in
        # orientation order, so re-normalize each edge to (min, max) by
        # id before counting support (cur stores edges u < v by id)
        tri = _degree_oriented_triangles(cur)

        def edge(x: str, y: str):
            return F.struct(
                F.least(F.col(x), F.col(y)).alias("u"),
                F.greatest(F.col(x), F.col(y)).alias("v"),
            )

        sup = (
            tri.select(
                F.explode(
                    F.array(edge("a", "b"), edge("b", "c"), edge("a", "c"))
                ).alias("e")
            )
            .select("e.u", "e.v")
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("_sup"))
            .filter(F.col("_sup") >= need)
            .select("u", "v")
        )
        seen = _rdd_ids(spark)
        # sup is by construction a subset of cur's edges, so it IS the
        # surviving edge set — no semi join back needed
        nxt = sup.localCheckpoint(eager=False)
        n_edges = nxt.count()  # materializes the lazy checkpoint
        new_handles = _take_handles(spark, seen)
        n_nodes = (
            nxt.select("u").union(nxt.select("v")).distinct().count()
            if n_edges
            else 0
        )
        out.append((rnd, n_nodes, n_edges))
        for h in live:
            h.unpersist(False)
        live = new_handles
        cur = nxt
    for h in live:
        h.unpersist(False)
    return spark.createDataFrame(
        out, "round: int, n_nodes: bigint, n_edges: bigint"
    )


def rich_club(
    edges: DataFrame,
    thresholds: tuple[int, ...] = (2, 4, 8, 16, 32),
    src: str = "src",
    dst: str = "dst",
    round_dp: int = 6,
) -> DataFrame:
    """Rich-club coefficient at fixed degree thresholds: for each k,
    ``phi(k) = 2 * E_k / (N_k * (N_k - 1))`` where N_k nodes have degree
    > k and E_k edges connect two such nodes — rising phi(k) means the
    hubs preferentially wire to EACH OTHER (an elite template/spam
    clique); flat phi means hubs are independent stars. The
    hub-structure readout degree_stats alone cannot give.

    Exactness: N_k and E_k are exact integers; phi is one closed-form
    double per threshold row.

    Plan: one degree aggregate, two hash joins to tag each edge with its
    endpoint degrees, one explode over the constant threshold list, two
    tiny conditional aggregates — no triangular or nested-loop joins.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    ks = F.array(*[F.lit(int(k)) for k in thresholds])
    nk = (
        deg.select("deg", F.explode(ks).alias("k"))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    tagged = (
        e.join(deg.select(F.col("u"), F.col("deg").alias("du")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("dv")), "v"
        )
        .select(F.least("du", "dv").alias("dmin"))
    )
    ek = (
        tagged.select("dmin", F.explode(ks).alias("k"))
        .filter(F.col("dmin") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    out = nk.join(ek, "k", "left").select(
        "k",
        "n_nodes",
        F.coalesce(F.col("n_edges"), F.lit(0)).cast("bigint").alias("n_edges"),
    )
    phi = F.when(
        F.col("n_nodes") > 1,
        F.round(
            (2.0 * F.col("n_edges").cast("double"))
            / (
                F.col("n_nodes").cast("double")
                * (F.col("n_nodes").cast("double") - 1.0)
            )
            + 1e-9,
            round_dp,
        ),
    )
    return out.select("k", "n_nodes", "n_edges", phi.alias("rich_club_coef")).orderBy(
        "k"
    )


def label_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """Newman modularity of a GIVEN node partition (labels), per
    community and in total: ``Q = sum_c [ e_c/m - (d_c/(2m))^2 ]`` with
    ``e_c`` within-community edges, ``d_c`` the community degree sum,
    ``m`` total edges. The does-this-attribute-explain-the-graph test:
    Q near 0 means the labeling (brand, source, language) is irrelevant
    to who links to whom; Q >> 0 means the communities are real and the
    label is a usable blocking key for dedup/linkage.

    Exactness: m, e_c, d_c are exact integers; per-community
    contributions are closed-form doubles, and the TOTAL row folds the
    exact integer sums (sum e_c, sum d_c^2) before any division — fully
    drift-proof. Nodes without a label are dropped from communities but
    still count in m and in their neighbors' degrees (documented
    convention; labels joined on the node id).

    Plan: two broadcast-ish label joins onto the slim edge list, one
    degree aggregate, one 1-row m broadcast onto the #communities frame.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    lab = labels.select(
        F.col(node_col).alias("n"), F.col(label_col).alias("c")
    ).distinct()
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    m_row = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    tagged = e.join(
        lab.select(F.col("n").alias("u"), F.col("c").alias("cu")), "u"
    ).join(lab.select(F.col("n").alias("v"), F.col("c").alias("cv")), "v")
    within = (
        tagged.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("within_edges"))
    )
    dsum = (
        deg.join(lab.select(F.col("n").alias("u"), "c"), "u")
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("degree_sum"),
        )
    )
    per = dsum.join(within, "c", "left").select(
        "c",
        "n_nodes",
        F.coalesce(F.col("within_edges"), F.lit(0))
        .cast("bigint")
        .alias("within_edges"),
        "degree_sum",
    )
    # both output branches (per-community rows + TOTAL) read this
    # #communities-row frame; persist so the edge/degree aggregates run
    # once, not twice (the frame is community-cardinality tiny)
    per = per.crossJoin(F.broadcast(m_row)).persist()
    _register_cache(per)
    md = F.col("m").cast("double")
    contrib = F.col("within_edges").cast("double") / md - (
        F.col("degree_sum").cast("double") / (2.0 * md)
    ) * (F.col("degree_sum").cast("double") / (2.0 * md))
    rows = per.select(
        F.col("c").cast("string").alias("community"),
        "n_nodes",
        "within_edges",
        "degree_sum",
        # + 0.0: signed-zero convention — per-community contribution can be
        # a tiny negative (DuckDB ROUND -> -0.0 vs Spark +0.0)
        (F.round(contrib + 1e-9, round_dp) + 0.0).alias("contribution"),
    )
    tot = (
        per.groupBy("m")
        .agg(
            F.sum("n_nodes").cast("bigint").alias("n_nodes"),
            F.sum("within_edges").cast("bigint").alias("within_edges"),
            F.sum("degree_sum").cast("bigint").alias("degree_sum"),
            F.sum(
                (
                    F.col("degree_sum").cast("decimal(38,0)")
                    * F.col("degree_sum").cast("decimal(38,0)")
                ).cast("decimal(38,0)")
            ).alias("_d2"),
        )
        .select(
            F.lit("TOTAL").alias("community"),
            "n_nodes",
            "within_edges",
            "degree_sum",
            (
                F.round(
                    F.col("within_edges").cast("double")
                    / F.col("m").cast("double")
                    - F.col("_d2").cast("double")
                    / (
                        (2.0 * F.col("m").cast("double"))
                        * (2.0 * F.col("m").cast("double"))
                    )
                    + 1e-9,
                    round_dp,
                )
                + 0.0
            ).alias("contribution"),
        )
    )
    return rows.unionByName(tot).orderBy("community")


def hyperball_harmonic(
    edges: DataFrame,
    rounds: int = 3,
    p: int = 4,
    top: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall harmonic-centrality estimates (Boldi & Vigna 2013): per
    node, an HLL sketch of its radius-r ball, grown one hop per round by
    register-max MERGE over neighbors — harmonic centrality falls out as
    sum_r (|ball_r| - |ball_{r-1}|) / r. THE web-scale centrality
    algorithm: exact all-pairs BFS carries O(n^2) (source, node) state,
    HyperBall carries n x m registers per round (m = 2^p), merges are
    associative bucket-wise maxes, and every round is one join + one
    grouped max — the same shuffle shape as a grouped aggregate.

    Built on the deterministic md5 HLL family (operators.sketch.
    hll_registers/hll_merge/hll_estimate), so every register — and the
    whole centrality table — is a pure function of the graph,
    bit-identical across engines and EXACTLY oracle-checkable (unlike
    any engine-internal HLL). The harmonic sum combines the per-round
    estimates AFTER their 4-dp round (both engines combine identical
    values; ln() ulp drift is absorbed upstream).

    Output: the ``top`` nodes by estimated harmonic centrality (ties ->
    min node id), with the per-round ball estimates for transparency.
    """
    from sqlitedataframe_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Round state is localCheckpoint-TRUNCATED (the ktruss/bfs round
    # pattern): each round's register table is consumed TWICE downstream
    # (the next round's neighbor merge + its own estimate), so persist
    # alone would stack — and re-print — every earlier round's lineage in
    # each consumer's plan. Blocks are registered for release by the
    # harness AFTER the result is consumed (register_rdd_handles
    # contract: checkpoint-truncated frames cannot re-execute).
    seen = _rdd_ids(spark)
    adj = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    _register_handles(_take_handles(spark, seen))
    nodes = adj.select("u").distinct()
    seen = _rdd_ids(spark)
    cur = hll_registers(
        nodes.select(F.col("u").alias("node"), F.col("u").alias("member")),
        key="member",
        group_cols=["node"],
        p=p,
    ).localCheckpoint(eager=True)
    _register_handles(_take_handles(spark, seen))
    ests = [hll_estimate(cur, ["node"], p=p, out="ball0")]
    for r in range(1, rounds + 1):
        nbr = (
            adj.join(cur, adj["v"] == cur["node"])
            .select(adj["u"].alias("node"), "bucket", "r")
        )
        seen = _rdd_ids(spark)
        cur = hll_merge(
            nbr.unionByName(cur.select("node", "bucket", "r")), ["node"]
        ).localCheckpoint(eager=True)
        _register_handles(_take_handles(spark, seen))
        ests.append(hll_estimate(cur, ["node"], p=p, out=f"ball{r}"))
    out = ests[0]
    for est in ests[1:]:
        out = out.join(est, "node")
    harmonic = sum(
        (F.col(f"ball{r}") - F.col(f"ball{r - 1}")) / float(r)
        for r in range(1, rounds + 1)
    )
    return (
        out.select(
            "node",
            *[F.col(f"ball{r}") for r in range(rounds + 1)],
            F.round(harmonic + 1e-9, 4).alias("harmonic_est"),
        )
        .orderBy(F.col("harmonic_est").desc(), F.col("node").asc())
        .limit(top)
    )
