"""Round-12 wave (VERDICT r11 #3): the WEIGHTED mergeable sample
(priority sampling with the unbiased max(w, tau) subset-sum estimator,
merge == one-shot proven through the driver); the TWO-SIDED DDSketch
(negative octaves + zero bucket) so signed deltas get the mergeable
relative-error rank summary; INCREMENTAL eval-contamination (per-split
contamination state after a delta batch == merge of T0 state and the
delta increment); the k-step cluster-state DRIFT AUDIT (star-merge
composed over two increments == one-shot from scratch — the operational
trust check for long-running incremental dedup state); and the
per-source × length-band dedup RETENTION report (where each feed loses
its data, stage by stage).

Determinism tools reused: all-integer octave math (overflow-safe
divide-before-multiply forms), md5-derived uniforms, single IEEE
multiply/divide for priorities (correctly-rounded, engine-identical —
never an order-dependent fold or a libm transcendental), and
ROUND(x + 1e-9, dp) on every published float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators.sketch import (
    ddsketch_buckets_signed,
    ddsketch_merge,
    ddsketch_readout_signed,
    priority_resample,
    priority_sample,
    priority_state,
)
from sqlitedataframe_spark.operators.text import ngram_set, quality_score
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.pipeline import (
    MH_EST_CTE,
    shared_doc_banded,
    shared_doc_sigs,
)
from sqlitedataframe_spark.suite.pipeline18 import _MH_EST_NOSUPP
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Weighted mergeable sample: priority sampling (Duffield-Lund-Thorup).
# ---------------------------------------------------------------------------
_PRI_K = 32
_PRI_SCALE_SQL = "281474976710656.0"  # 2^48, the md5-uniform denominator

_PRI_CTE = f"""
    WITH s AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
             (CAST(n_chars AS DOUBLE) * {_PRI_SCALE_SQL})
               / CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                           AS BIGINT) + 1 AS DOUBLE) AS p
      FROM documents),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY p DESC, doc_id DESC) AS rnk
      FROM s),
    thr AS (
      SELECT source, p AS tau
      FROM r WHERE rnk = {_PRI_K + 1})
    SELECT r.source, CAST(r.rnk AS INT) AS rank, r.doc_id, r.w,
           ROUND(r.p + 1e-9, 4) AS priority,
           ROUND(COALESCE(t.tau, 0.0) + 1e-9, 4) AS tau,
           ROUND(GREATEST(CAST(r.w AS DOUBLE), COALESCE(t.tau, 0.0)) + 1e-9, 4)
             AS w_hat
    FROM r LEFT JOIN thr t USING (source)
    WHERE r.rnk <= {_PRI_K}
    ORDER BY source, rank
"""


def _pri_publish(sample: DataFrame) -> DataFrame:
    return sample.select(
        "source",
        F.col("_rank").cast("int").alias("rank"),
        "doc_id",
        F.col("_w").alias("w"),
        F.round(F.col("_p") + 1e-9, 4).alias("priority"),
        F.round(F.col("_tau") + 1e-9, 4).alias("tau"),
        F.round(F.col("_w_hat") + 1e-9, 4).alias("w_hat"),
    ).orderBy("source", "rank")


@query("sample_weighted_priority", oracle=_PRI_CTE)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source WEIGHTED sample via priority sampling (VERDICT r11
    #3a — the weighted sibling of bottomk_sample): each document draws
    the deterministic uniform u = (md5(doc_id)[0:12]+1)/2^48, priority
    p = n_chars/u, and the 32 highest-priority docs per source are the
    sample; tau is the 33rd priority and w_hat = max(w, tau) the
    Duffield-Lund-Thorup unbiased subset-sum estimator — the published
    sample a mixture-rebalancing job ships so any post-hoc slice's
    token mass stays estimable from 32 rows per feed.

    Exactness: p is ONE IEEE multiply + ONE IEEE divide on
    integer-valued doubles (correctly-rounded single operations, no
    order-dependent fold, no libm) — bit-identical across engines; ties
    break on doc_id. Shape: two bounded rank-window levels (md5 shard
    then <= shards*(k+1) survivors per group), never a whole-group sort
    (operators/sketch.py priority_sample).
    """
    d = T(spark, sf_dir, "documents")
    return _pri_publish(
        priority_sample(d, "source", "doc_id", "n_chars", k=_PRI_K)
    )


@query("sample_weighted_priority_merge", oracle=_PRI_CTE)
def sample_weighted_priority_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge == one-shot for the priority sample: the corpus is cut into
    3 snapshot shards (doc_id % 3), each shard reduces to its
    top-(k+1) priority STATE (operators/sketch.py priority_state —
    node-sized, weight-annotated), and the states union + re-rank
    (priority_resample) into the final sample. The ORACLE is the
    ONE-SHOT sample over the whole corpus: driver hash equality proves
    the mergeability law (any row of the union's top-(k+1) is in its
    own shard's top-(k+1), so shard states lose nothing) — the property
    that lets 1000 executors sample a 100 TB corpus with one tiny
    rollup and no second pass.
    """
    d = T(spark, sf_dir, "documents")
    states = [
        priority_state(
            d.filter(F.col("doc_id") % 3 == i),
            "source",
            "doc_id",
            "n_chars",
            k=_PRI_K,
        )
        for i in range(3)
    ]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return _pri_publish(
        priority_resample(merged, "source", "doc_id", k=_PRI_K)
    )


# ---------------------------------------------------------------------------
# Two-sided (signed + zero) DDSketch over daily deltas.
# ---------------------------------------------------------------------------
@query(
    "agg_ddsketch_signed",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1),
    dd AS (
      SELECT 'revenue_delta' AS measure, a.cents - b.cents AS v
      FROM daily a JOIN daily b ON b.d = a.d - INTERVAL 1 DAY
      UNION ALL
      SELECT 'orders_delta' AS measure, a.cnt - b.cnt AS v
      FROM daily a JOIN daily b ON b.d = a.d - INTERVAL 1 DAY),
    cls AS (
      SELECT measure,
             CASE WHEN v >= 1 THEN 1 WHEN v <= -1 THEN -1 ELSE 0 END AS sgn,
             ABS(v) AS a
      FROM dd),
    b AS (
      SELECT measure, sgn,
             CASE WHEN sgn = 0 THEN 0 ELSE length(bin(a)) - 1 END AS e,
             CASE WHEN sgn = 0 THEN CAST(1 AS BIGINT)
                  ELSE (CAST(1 AS BIGINT) << (length(bin(a)) - 1)) END AS pw,
             a
      FROM cls),
    s AS (
      SELECT measure, sgn, e, pw,
             CASE WHEN sgn = 0 THEN 0 ELSE ((a - pw) * 32) // pw END AS sub
      FROM b),
    bk AS (
      SELECT measure, sgn,
             CASE WHEN sgn = 0 THEN 0 ELSE e * 32 + sub END AS idx,
             CASE WHEN sgn = 0 THEN 0
                  ELSE sgn * (pw + (sub * pw) // 32) END AS rv
      FROM s),
    sk AS (
      SELECT measure, sgn, idx, rv, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bk GROUP BY 1, 2, 3, 4),
    cum AS (
      SELECT measure, sgn, idx, rv, cnt,
             SUM(cnt) OVER (PARTITION BY measure
                            ORDER BY sgn, sgn * idx
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM sk),
    tot AS (
      SELECT measure, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN sgn = -1 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_neg,
             CAST(SUM(CASE WHEN sgn = 0 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(SUM(CASE WHEN sgn = 1 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_pos
      FROM sk GROUP BY measure)
    SELECT measure, t.n, t.n_neg, t.n_zero, t.n_pos,
           CAST(MIN(CASE WHEN c.cum >= (1 * t.n + 9) // 10
                         THEN c.rv END) AS BIGINT) AS p10_rv,
           CAST(MIN(CASE WHEN c.cum >= (1 * t.n + 1) // 2
                         THEN c.rv END) AS BIGINT) AS p50_rv,
           CAST(MIN(CASE WHEN c.cum >= (9 * t.n + 9) // 10
                         THEN c.rv END) AS BIGINT) AS p90_rv
    FROM cum c JOIN tot t USING (measure)
    GROUP BY measure, t.n, t.n_neg, t.n_zero, t.n_pos
    ORDER BY measure
    """,
)
def agg_ddsketch_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SIDED DDSketch (VERDICT r11 #3b): p10/p50/p90 of SIGNED
    day-over-day deltas — daily revenue (cents) and daily order count —
    via the signed sketch's three stores (negative octaves mirrored on
    \\|v\\|, an exact zero bucket, positive octaves;
    operators/sketch.py ddsketch_buckets_signed). Latency deltas and
    money deltas are the quantities a 100 TB pipeline most wants
    mergeable rank summaries for, and the one-sided sketch rejects
    them; the orders_delta measure lands real zeros and negatives in
    every store.

    The Spark side ALSO proves merge == one-shot through the driver:
    the deltas split into two shards (day-of-month parity), each shard
    builds its signed sketch, and the published readout comes from the
    MERGED sketch — hash equality with the one-shot oracle is the
    mergeability law for the two-sided variant.

    Shape: one bounded per-day aggregate (calendar-sized), a
    previous-day equi-join on the tiny daily frame, all-integer octave
    math scan-side, additive (measure, sign, idx) counts; readout
    windows over the sketch, never the data. Output is ALL-INTEGER.
    """
    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    j = (
        daily.alias("a")
        .join(
            F.broadcast(daily.alias("b")),
            F.date_sub(F.col("a.d"), 1) == F.col("b.d"),
        )
        .select(
            F.col("a.d").alias("d"),
            (F.col("a.cents") - F.col("b.cents")).alias("rev_v"),
            (F.col("a.cnt") - F.col("b.cnt")).alias("cnt_v"),
        )
    )
    dd = (
        j.select(
            "d", F.lit("revenue_delta").alias("measure"),
            F.col("rev_v").alias("v"),
        )
        .unionByName(
            j.select(
                "d", F.lit("orders_delta").alias("measure"),
                F.col("cnt_v").alias("v"),
            )
        )
        .withColumn("_half", F.dayofmonth("d") % 2)
    )
    sk = ddsketch_merge(
        ddsketch_buckets_signed(
            dd.filter(F.col("_half") == 0).select("measure", "v"),
            "measure",
            "v",
        ),
        ddsketch_buckets_signed(
            dd.filter(F.col("_half") == 1).select("measure", "v"),
            "measure",
            "v",
        ),
    )
    return ddsketch_readout_signed(
        sk, "measure", qs=((1, 10), (1, 2), (9, 10))
    ).orderBy("measure")


# ---------------------------------------------------------------------------
# Incremental eval-contamination (state + delta increment == one-shot).
# ---------------------------------------------------------------------------
@query(
    "eval_contamination_incremental",
    oracle=_MH_EST_NOSUPP
    + """,
    bench AS (
      SELECT doc_id, CAST((doc_id // 50) % 3 AS INT) AS split, md5(text) AS h
      FROM documents WHERE doc_id % 50 = 0),
    train AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 50 <> 0),
    ex AS (SELECT DISTINCT b.split, tr.doc_id FROM train tr JOIN bench b USING (h)),
    pr AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
    nr0 AS (
      SELECT b.split, p.id_b AS doc_id
      FROM pr p JOIN bench b ON b.doc_id = p.id_a
      UNION
      SELECT b.split, p.id_a AS doc_id
      FROM pr p JOIN bench b ON b.doc_id = p.id_b),
    nr AS (
      SELECT DISTINCT n0.split, n0.doc_id
      FROM nr0 n0 JOIN train tr ON tr.doc_id = n0.doc_id),
    tk AS (SELECT doc_id, string_split(text, ' ') AS tt FROM documents),
    gr AS (
      SELECT doc_id, array_to_string(tt[i:i+3], ' ') AS gram
      FROM tk, UNNEST(generate_series(1, len(tt) - 3)) AS r(i)),
    bg AS (
      SELECT DISTINCT b.split, g.gram FROM gr g JOIN bench b USING (doc_id)),
    ng AS (
      SELECT DISTINCT bg.split, g.doc_id
      FROM gr g JOIN bg ON g.gram = bg.gram
      WHERE g.doc_id % 50 <> 0),
    anyc AS (
      SELECT split, doc_id FROM ex
      UNION SELECT split, doc_id FROM nr
      UNION SELECT split, doc_id FROM ng),
    nb AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_bench
           FROM bench GROUP BY 1),
    ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM train)
    SELECT nb.split, nb.n_bench, ntr.n_train,
           CAST(COALESCE(e.c, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(n.c, 0) AS BIGINT) AS n_near,
           CAST(COALESCE(g.c, 0) AS BIGINT) AS n_ngram,
           CAST(COALESCE(a.c, 0) AS BIGINT) AS n_any,
           CAST(COALESCE(dl.c, 0) AS BIGINT) AS n_delta_any,
           ROUND(CAST(COALESCE(a.c, 0) AS DOUBLE) / ntr.n_train + 1e-9, 6)
             AS contam_rate
    FROM nb CROSS JOIN ntr
    LEFT JOIN (SELECT split, COUNT(*) AS c FROM ex GROUP BY 1) e USING (split)
    LEFT JOIN (SELECT split, COUNT(*) AS c FROM nr GROUP BY 1) n USING (split)
    LEFT JOIN (SELECT split, COUNT(*) AS c FROM ng GROUP BY 1) g USING (split)
    LEFT JOIN (SELECT split, COUNT(*) AS c FROM anyc GROUP BY 1) a USING (split)
    LEFT JOIN (SELECT split, COUNT(*) AS c FROM anyc
               WHERE doc_id % 7 = 3 GROUP BY 1) dl USING (split)
    ORDER BY split
    """,
)
def eval_contamination_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL eval-contamination (VERDICT r11 #3c): the per-split
    contamination report recomputed the way a production pipeline would
    after today's delta batch (every 7th train doc) arrives — from T0
    STATE plus delta-sized increments, never re-pairing the base corpus:

      * exact matches: the bench fingerprint set is static; the T0
        (split, doc_id) match table merely UNIONs the delta's hash
        matches (additive state);
      * near-dup matches: T0 pairs over the corpus-sans-delta UNION the
        delta-touching pairs (minhash_lsh_pairs ``new_ids=``,
        suppression OFF on both sides — the unconditional
        snapshot-merge-equality requirement) — a new pair can only add
        contaminated DELTA docs, so the state update is additive;
      * 4-gram matches: the split-tagged bench gram set is static;
        the delta's gram hits UNION in.

    The ORACLE is the ONE-SHOT report over the full corpus: driver hash
    equality proves contamination(base ∪ delta) == merge(state,
    incr(delta)) — the law that lets decontamination run per-delta at
    100 TB instead of per-corpus. n_delta_any counts today's arrivals
    among the contaminated (the cell an eval owner actually watches).
    """
    d = T(spark, sf_dir, "documents")
    split = F.expr("CAST((doc_id div 50) % 3 AS INT)").alias("split")
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id", split, F.md5("text").alias("h"), "text"
    )
    is_delta = (F.col("doc_id") % 50 != 0) & (F.col("doc_id") % 7 == 3)
    train = d.filter(F.col("doc_id") % 50 != 0)
    t0_train = train.filter(F.col("doc_id") % 7 != 3)
    delta = train.filter(F.col("doc_id") % 7 == 3)
    bh = F.broadcast(bench.select("split", "h").distinct())

    def exact_of(frame: DataFrame) -> DataFrame:
        return (
            frame.select("doc_id", F.md5("text").alias("h"))
            .join(bh, "h")
            .select("split", "doc_id")
            .distinct()
        )

    ex = exact_of(t0_train).unionByName(exact_of(delta)).distinct()

    sig = shared_doc_sigs(spark, sf_dir)
    bnd = shared_doc_banded(spark, sf_dir)
    pairs_t0 = D.minhash_lsh_pairs(
        d.filter(~is_delta), min_jaccard=0.5, sig=sig, max_bucket=None,
        banded=bnd,
    ).select("id_a", "id_b")
    pairs_inc = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.5,
        new_ids=delta.select("doc_id"),
        sig=sig,
        max_bucket=None,
        banded=bnd,
    ).select("id_a", "id_b")
    # r12: lazily persisted — the merged pair set is probed from BOTH
    # orientations below; unpersisted, each probe re-ran both banded joins
    from sqlitedataframe_spark.operators.util import register_cache

    pairs = register_cache(
        pairs_t0.unionByName(pairs_inc).distinct().persist()
    )
    bid = bench.select(F.col("doc_id").alias("_bid"), "split")
    nr = (
        pairs.join(F.broadcast(bid), pairs.id_a == bid._bid)
        .select("split", F.col("id_b").alias("doc_id"))
        .unionByName(
            pairs.join(F.broadcast(bid), pairs.id_b == bid._bid).select(
                "split", F.col("id_a").alias("doc_id")
            )
        )
        .join(train.select("doc_id"), "doc_id", "semi")
        .select("split", "doc_id")
        .distinct()
    )

    bg = F.broadcast(
        bench.select(
            "split", F.explode(ngram_set("text", 4)).alias("gram")
        ).distinct()
    )

    def ngram_of(frame: DataFrame) -> DataFrame:
        return (
            frame.select("doc_id", F.explode(ngram_set("text", 4)).alias("gram"))
            .join(bg, "gram")
            .select("split", "doc_id")
            .distinct()
        )

    ng = ngram_of(t0_train).unionByName(ngram_of(delta)).distinct()
    anyc = ex.unionByName(nr).unionByName(ng).distinct()

    nb = bench.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bench")
    )
    ntr = train.select(F.count(F.lit(1)).cast("bigint").alias("n_train"))

    def c(frame: DataFrame, name: str) -> DataFrame:
        return frame.groupBy("split").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    out = nb.join(F.broadcast(ntr))
    for frame, name in [
        (ex, "n_exact"),
        (nr, "n_near"),
        (ng, "n_ngram"),
        (anyc, "n_any"),
        (anyc.filter(F.col("doc_id") % 7 == 3), "n_delta_any"),
    ]:
        out = out.join(c(frame, name), "split", "left")
    zeroed = [
        F.coalesce(F.col(n), F.lit(0)).cast("bigint").alias(n)
        for n in ("n_exact", "n_near", "n_ngram", "n_any", "n_delta_any")
    ]
    return (
        out.select("split", "n_bench", "n_train", *zeroed)
        .select(
            "*",
            F.round(
                F.col("n_any").cast("double") / F.col("n_train") + 1e-9, 6
            ).alias("contam_rate"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Cluster-state drift audit: k star-merge increments == one-shot.
# ---------------------------------------------------------------------------
@query(
    "dedup_state_drift_audit",
    oracle=_MH_EST_NOSUPP.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    + """,
    ed AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
    nds AS (SELECT id_a AS id FROM ed UNION SELECT id_b FROM ed),
    sym AS (SELECT id_a AS src, id_b AS dst FROM ed
            UNION SELECT id_b, id_a FROM ed),
    walk(node, comp) AS (
      SELECT id, id FROM nds
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node),
    comp AS (
      SELECT node AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
      FROM walk GROUP BY node)
    SELECT c.component,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(SUM(CASE WHEN c.doc_id % 50 <> 0 AND c.doc_id % 7 = 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b1_docs,
           CAST(SUM(CASE WHEN c.doc_id % 50 <> 0 AND c.doc_id % 7 = 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b2_docs,
           COUNT(DISTINCT d.source) > 1 AS cross_source
    FROM comp c JOIN documents d USING (doc_id)
    GROUP BY c.component ORDER BY c.component
    """,
)
def dedup_state_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-state DRIFT AUDIT (VERDICT r11 #3d): after TWO sequential
    incremental batches, prove the long-running dedup state has not
    drifted — the star-merge law COMPOSED:

        CC(E_all) == CC(star(CC(star(CC(E_0)) ∪ E_1)) ∪ E_2)

    Batch 1 is every train doc with doc_id % 7 == 2, batch 2 every one
    with % 7 == 5; E_0 pairs the remaining corpus, E_i pairs batch i
    against the corpus-so-far (``new_ids=``, suppression off — each
    pair is generated exactly when its later member arrives). The
    ORACLE computes the clusters from the ONE-SHOT recursive walk over
    ALL pairs: driver hash equality is the operational trust check a
    production pipeline runs on its incremental state before trusting
    another week of deltas. Per cluster: docs, sources, each batch's
    arrivals, cross-source flag.

    Shape: each increment is a delta-bounded banded join + a
    pointer-jumped CC over (star edges ∪ delta pairs) — node-sized
    state, never a corpus re-pair (same scale story the r11
    dedup_clusters_incremental proved for one increment).
    """
    from sqlitedataframe_spark.operators.graph import connected_components

    d = T(spark, sf_dir, "documents")
    sig = shared_doc_sigs(spark, sf_dir)
    bnd = shared_doc_banded(spark, sf_dir)
    is_train = F.col("doc_id") % 50 != 0
    in_b1 = is_train & (F.col("doc_id") % 7 == 2)
    in_b2 = is_train & (F.col("doc_id") % 7 == 5)
    b1 = d.filter(in_b1).select("doc_id")
    b2 = d.filter(in_b2).select("doc_id")
    corpus0 = d.filter(~in_b1 & ~in_b2)
    corpus1 = d.filter(~in_b2)

    def star_of(comp: DataFrame) -> DataFrame:
        return comp.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias("src"), F.col("comp").alias("dst")
        )

    # r12: each round's edge frame is referenced 3x (CC symmetrization +
    # node-set unions) — lazily persisted so the banded join runs once
    from sqlitedataframe_spark.operators.util import register_cache

    edges0 = register_cache(
        D.minhash_lsh_pairs(
            corpus0, min_jaccard=0.5, sig=sig, max_bucket=None, banded=bnd
        )
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .persist()
    )
    nodes0 = (
        edges0.select(F.col("src").alias("doc_id"))
        .unionByName(edges0.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    comp = connected_components(edges0, nodes=nodes0, node_col="doc_id")
    for corpus_i, batch_i in ((corpus1, b1), (d, b2)):
        edges_i = register_cache(
            D.minhash_lsh_pairs(
                corpus_i, min_jaccard=0.5, new_ids=batch_i, sig=sig,
                max_bucket=None, banded=bnd,
            )
            .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .persist()
        )
        nodes_i = (
            comp.select(F.col("node").alias("doc_id"))
            .unionByName(edges_i.select(F.col("src").alias("doc_id")))
            .unionByName(edges_i.select(F.col("dst").alias("doc_id")))
            .distinct()
        )
        comp = connected_components(
            star_of(comp).unionByName(edges_i),
            nodes=nodes_i,
            node_col="doc_id",
        )
    final = comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    return (
        final.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum(in_b1.cast("int")).cast("bigint").alias("n_b1_docs"),
            F.sum(in_b2.cast("int")).cast("bigint").alias("n_b2_docs"),
            (F.countDistinct("source") > 1).alias("cross_source"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Per-source × length-band dedup retention curve.
# ---------------------------------------------------------------------------
@query(
    "dedup_retention_by_source",
    oracle=MH_EST_CTE
    + """,
    d0 AS (
      SELECT doc_id, source,
             CAST(LEAST(n_chars // 1000, 4) AS INT) AS len_band,
             lang, n_chars, text
      FROM documents WHERE doc_id % 50 <> 0),
    gate AS (
      SELECT * FROM d0
      WHERE lang IN ('en', 'fr', 'es', 'de') AND n_chars BETWEEN 50 AND 5000),
    exact AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS _rn
        FROM gate) WHERE _rn = 1),
    near AS (
      SELECT e.* FROM exact e
      WHERE NOT EXISTS (
        SELECT 1 FROM est p
        JOIN exact a ON a.doc_id = p.id_a
        WHERE p.id_b = e.doc_id AND p.est_jaccard >= 0.5)),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+3], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS r(i)),
    test_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    cont AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN test_grams USING (gram)
      WHERE g.doc_id % 50 <> 0),
    decon AS (
      SELECT n.* FROM near n
      WHERE NOT EXISTS (SELECT 1 FROM cont c WHERE c.doc_id = n.doc_id)),
    qual AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               (LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
                + LEAST(CAST(len(list_filter(string_split(lower(trim(text)),
                    ' '), x -> list_contains(['the','a','an','and','or','of',
                    'to','in','is','it'], x))) AS DOUBLE)
                    / len(string_split(lower(trim(text)), ' ')) * 4, 1.0)
                + GREATEST(0.0, 1.0 - CAST(LENGTH(regexp_replace(text,
                    '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
                    / CAST(LENGTH(text) AS DOUBLE) * 5)) / 3 AS q
        FROM decon)
      WHERE ROUND(q, 6) >= 0.5),
    per AS (
      SELECT s.source, s.len_band,
             CAST(COUNT(*) AS BIGINT) AS n_raw,
             CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_gate,
             CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_exact,
             CAST(SUM(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_near,
             CAST(SUM(CASE WHEN dc.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_decontam,
             CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_quality
      FROM d0 s
      LEFT JOIN gate g USING (doc_id)
      LEFT JOIN exact e ON e.doc_id = s.doc_id
      LEFT JOIN near n ON n.doc_id = s.doc_id
      LEFT JOIN decon dc ON dc.doc_id = s.doc_id
      LEFT JOIN qual q ON q.doc_id = s.doc_id
      GROUP BY s.source, s.len_band)
    SELECT source, len_band, n_raw, n_gate, n_exact, n_near, n_decontam,
           n_quality,
           ROUND(CAST(n_quality AS DOUBLE) / n_raw + 1e-9, 6) AS retention
    FROM per ORDER BY source, len_band
    """,
)
def dedup_retention_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source × LENGTH-BAND retention curve (VERDICT r11 #3e): the
    curation-funnel survivor counts (raw -> lang/length gate -> exact
    dedup -> near-dedup -> decontamination -> quality) broken out by
    source AND by document length band (1000-char bands, capped at 4) —
    the report a data lead actually reads: a feed losing its LONG
    documents at near-dedup is syndicating wire copy; one losing its
    SHORT documents at quality is boilerplate. The one-dimensional
    funnel (pipeline_curation_funnel) cannot show either.

    Shape identical to the funnel: scan-side gates, one hash-window
    exact dedup (32-char keys), near-dedup semi/anti joins against the
    SHARED signature pair list, broadcast bounded test-gram set, one
    rollup of left-join stage flags — the band column rides the scan,
    so the 2-D report costs the same single pass.
    """
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    band = F.least(
        F.floor(F.col("n_chars") / 1000).cast("int"), F.lit(4)
    ).alias("len_band")
    d0 = d.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", "source", band, "lang", "n_chars", "text"
    )
    gate = d0.filter(
        F.col("lang").isin("en", "fr", "es", "de")
        & F.col("n_chars").between(50, 5000)
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    # r12: stage frames lazily persisted — the retention rollup counts
    # each stage and later stages embed earlier ones (the funnel-family
    # fix; the exact window and the banded pair build otherwise re-ran
    # once per downstream stage)
    from sqlitedataframe_spark.operators.util import register_cache

    exact = register_cache(
        gate.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    pairs = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.5,
        sig=shared_doc_sigs(spark, sf_dir),
        banded=shared_doc_banded(spark, sf_dir),
    ).select("id_a", "id_b")
    ex_ids = exact.select("doc_id")
    drop_b = (
        pairs.join(ex_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "semi")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    near = register_cache(exact.join(drop_b, "doc_id", "anti").persist())
    test = d.filter(F.col("doc_id") % 50 == 0)
    tg = F.broadcast(
        test.select(F.explode(ngram_set("text", 4)).alias("gram")).distinct()
    )
    cont = (
        d0.select("doc_id", F.explode(ngram_set("text", 4)).alias("gram"))
        .join(tg, "gram")
        .select("doc_id")
        .distinct()
    )
    decon = register_cache(near.join(cont, "doc_id", "anti").persist())
    qual = decon.filter(quality_score("text") >= 0.5)

    def flag(frame: DataFrame, name: str) -> DataFrame:
        return frame.select("doc_id").withColumn(name, F.lit(1))

    out = d0.select("doc_id", "source", "len_band")
    for frame, name in [
        (gate, "_g"),
        (exact, "_e"),
        (near, "_n"),
        (decon, "_d"),
        (qual, "_q"),
    ]:
        out = out.join(flag(frame, name), "doc_id", "left")
    return (
        out.groupBy("source", "len_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            F.sum(F.coalesce(F.col("_g"), F.lit(0))).cast("bigint").alias("n_gate"),
            F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("bigint").alias("n_exact"),
            F.sum(F.coalesce(F.col("_n"), F.lit(0))).cast("bigint").alias("n_near"),
            F.sum(F.coalesce(F.col("_d"), F.lit(0))).cast("bigint").alias("n_decontam"),
            F.sum(F.coalesce(F.col("_q"), F.lit(0))).cast("bigint").alias("n_quality"),
        )
        .select(
            "*",
            F.round(
                F.col("n_quality").cast("double") / F.col("n_raw") + 1e-9, 6
            ).alias("retention"),
        )
        .orderBy("source", "len_band")
    )


# ---------------------------------------------------------------------------
# Signed-sketch error audit (the two-sided sibling of agg_ddsketch_error_audit).
# ---------------------------------------------------------------------------
_SIGNED_DD_CTE = """
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1),
    dd AS (
      SELECT 'revenue_delta' AS measure, a.cents - b.cents AS v
      FROM daily a JOIN daily b ON b.d = a.d - INTERVAL 1 DAY
      UNION ALL
      SELECT 'orders_delta' AS measure, a.cnt - b.cnt AS v
      FROM daily a JOIN daily b ON b.d = a.d - INTERVAL 1 DAY),
    cls AS (
      SELECT measure,
             CASE WHEN v >= 1 THEN 1 WHEN v <= -1 THEN -1 ELSE 0 END AS sgn,
             ABS(v) AS a, v
      FROM dd),
    bk AS (
      SELECT measure, sgn, v,
             CASE WHEN sgn = 0 THEN 0
                  ELSE (length(bin(a)) - 1) * 32
                       + ((a - (CAST(1 AS BIGINT) << (length(bin(a)) - 1)))
                          * 32) // (CAST(1 AS BIGINT) << (length(bin(a)) - 1))
             END AS idx,
             CASE WHEN sgn = 0 THEN 0
                  ELSE sgn * ((CAST(1 AS BIGINT) << (length(bin(a)) - 1))
                       + (((a - (CAST(1 AS BIGINT) << (length(bin(a)) - 1)))
                           * 32) // (CAST(1 AS BIGINT) << (length(bin(a)) - 1))
                          * (CAST(1 AS BIGINT) << (length(bin(a)) - 1))) // 32)
             END AS rv
      FROM cls),
    sk AS (
      SELECT measure, sgn, idx, rv, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bk GROUP BY 1, 2, 3, 4),
    cum AS (
      SELECT measure, sgn, idx, rv, cnt,
             SUM(cnt) OVER (PARTITION BY measure
                            ORDER BY sgn, sgn * idx
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM sk),
    tot AS (SELECT measure, CAST(SUM(cnt) AS BIGINT) AS n
            FROM sk GROUP BY measure),
    est AS (
      SELECT t.measure, t.n,
             CAST(MIN(CASE WHEN c.cum >= (1 * t.n + 9) // 10
                           THEN c.rv END) AS BIGINT) AS p10_rv,
             CAST(MIN(CASE WHEN c.cum >= (1 * t.n + 1) // 2
                           THEN c.rv END) AS BIGINT) AS p50_rv,
             CAST(MIN(CASE WHEN c.cum >= (9 * t.n + 9) // 10
                           THEN c.rv END) AS BIGINT) AS p90_rv
      FROM cum c JOIN tot t USING (measure) GROUP BY t.measure, t.n),
    rk AS (
      SELECT measure, v,
             ROW_NUMBER() OVER (PARTITION BY measure ORDER BY v) AS rn
      FROM dd),
    ex AS (
      SELECT r.measure,
             CAST(MAX(CASE WHEN r.rn = (1 * t.n + 9) // 10
                           THEN r.v END) AS BIGINT) AS p10_exact,
             CAST(MAX(CASE WHEN r.rn = (1 * t.n + 1) // 2
                           THEN r.v END) AS BIGINT) AS p50_exact,
             CAST(MAX(CASE WHEN r.rn = (9 * t.n + 9) // 10
                           THEN r.v END) AS BIGINT) AS p90_exact
      FROM rk r JOIN tot t USING (measure) GROUP BY r.measure)
"""


@query(
    "agg_ddsketch_signed_error_audit",
    oracle=_SIGNED_DD_CTE
    + """
    SELECT e.measure, e.n,
           e.p10_rv, x.p10_exact,
           CASE WHEN x.p10_exact = 0 THEN NULL
                ELSE ROUND(ABS(e.p10_rv - x.p10_exact)
                           / ABS(CAST(x.p10_exact AS DOUBLE)) + 1e-9, 6)
           END AS p10_rel_err,
           e.p50_rv, x.p50_exact,
           CASE WHEN x.p50_exact = 0 THEN NULL
                ELSE ROUND(ABS(e.p50_rv - x.p50_exact)
                           / ABS(CAST(x.p50_exact AS DOUBLE)) + 1e-9, 6)
           END AS p50_rel_err,
           e.p90_rv, x.p90_exact,
           CASE WHEN x.p90_exact = 0 THEN NULL
                ELSE ROUND(ABS(e.p90_rv - x.p90_exact)
                           / ABS(CAST(x.p90_exact AS DOUBLE)) + 1e-9, 6)
           END AS p90_rel_err
    FROM est e JOIN ex x USING (measure) ORDER BY e.measure
    """,
)
def agg_ddsketch_signed_error_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-vs-truth qualification for the SIGNED readout: the
    p10/p50/p90 representative values of the two-sided sketch NEXT TO
    the exact rank-matched order statistics of the same signed deltas,
    plus the realized relative error on magnitude — the audit that must
    pass before the signed sketch replaces an exact pass over latency /
    money deltas at 100 TB. Realized errors must sit under the 1/m =
    3.125% guarantee wherever sketch and truth share a sign
    (pytest-asserted); a zero exact value publishes NULL error rather
    than a division blow-up.

    Exactness: both sides are ALL-INTEGER until the final error
    division of two already-published integer cells (ROUND at 6). The
    exact side uses the SAME integer rank ceil(q*n) as the readout
    (rank-matched, unlike an interpolated percentile), over the
    calendar-bounded per-measure delta frame.
    """
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    j = (
        daily.alias("a")
        .join(
            F.broadcast(daily.alias("b")),
            F.date_sub(F.col("a.d"), 1) == F.col("b.d"),
        )
        .select(
            (F.col("a.cents") - F.col("b.cents")).alias("rev_v"),
            (F.col("a.cnt") - F.col("b.cnt")).alias("cnt_v"),
        )
    )
    dd = j.select(
        F.lit("revenue_delta").alias("measure"), F.col("rev_v").alias("v")
    ).unionByName(
        j.select(
            F.lit("orders_delta").alias("measure"), F.col("cnt_v").alias("v")
        )
    )
    est = ddsketch_readout_signed(
        ddsketch_buckets_signed(dd, "measure", "v"),
        "measure",
        qs=((1, 10), (1, 2), (9, 10)),
    ).drop("n_neg", "n_zero", "n_pos")
    w = Window.partitionBy("measure").orderBy("v")
    rk = dd.withColumn("rn", F.row_number().over(w))
    tot = dd.groupBy("measure").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ex = (
        rk.join(tot, "measure")
        .groupBy("measure")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("rn")
                        == F.expr(f"({num} * _n + {den} - 1) div {den}"),
                        F.col("v"),
                    )
                )
                .cast("bigint")
                .alias(f"p{100 * num // den}_exact")
                for num, den in ((1, 10), (1, 2), (9, 10))
            ]
        )
    )

    def err(tag: str):
        rel = F.round(
            F.abs(F.col(f"{tag}_rv") - F.col(f"{tag}_exact"))
            / F.abs(F.col(f"{tag}_exact").cast("double"))
            + 1e-9,
            6,
        )
        return F.when(F.col(f"{tag}_exact") == 0, F.lit(None).cast("double")).otherwise(
            rel
        ).alias(f"{tag}_rel_err")

    return (
        est.join(ex, "measure")
        .select(
            "measure", "n",
            "p10_rv", "p10_exact", err("p10"),
            "p50_rv", "p50_exact", err("p50"),
            "p90_rv", "p90_exact", err("p90"),
        )
        .orderBy("measure")
    )


# ---------------------------------------------------------------------------
# Priority-sample estimator audit: estimated vs true per-source mass.
# ---------------------------------------------------------------------------
@query(
    "mixture_priority_budget",
    oracle=_PRI_CTE.replace(
        """
    SELECT r.source, CAST(r.rnk AS INT) AS rank, r.doc_id, r.w,
           ROUND(r.p + 1e-9, 4) AS priority,
           ROUND(COALESCE(t.tau, 0.0) + 1e-9, 4) AS tau,
           ROUND(GREATEST(CAST(r.w AS DOUBLE), COALESCE(t.tau, 0.0)) + 1e-9, 4)
             AS w_hat
    FROM r LEFT JOIN thr t USING (source)
    WHERE r.rnk <= """
        + str(_PRI_K)
        + """
    ORDER BY source, rank
""",
        """,
    smp AS (
      SELECT r.source,
             CAST(ROUND(GREATEST(CAST(r.w AS DOUBLE), COALESCE(t.tau, 0.0))
                        * 1000000) AS BIGINT) AS w_hat_q
      FROM r LEFT JOIN thr t USING (source)
      WHERE r.rnk <= """
        + str(_PRI_K)
        + """),
    est AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
             SUM(w_hat_q) AS est_q
      FROM smp GROUP BY source),
    tru AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS true_chars
      FROM documents GROUP BY source)
    SELECT t.source, t.n_docs, e.n_sampled, t.true_chars,
           ROUND(CAST(e.est_q AS DOUBLE) / 1000000 + 1e-9, 4) AS est_chars,
           ROUND(ABS(CAST(e.est_q AS DOUBLE) / 1000000 - t.true_chars)
                 / t.true_chars + 1e-9, 6) AS rel_err
    FROM tru t JOIN est e USING (source)
    ORDER BY t.source
""",
    ),
)
def mixture_priority_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-sample ESTIMATOR AUDIT: per source, the true character
    mass next to the mass estimated from only the 32-row priority
    sample (sum of w_hat = max(w, tau) — the Duffield-Lund-Thorup
    unbiased subset-sum estimator), with the realized relative error —
    the check a mixture-rebalancing job runs before trusting sampled
    token budgets instead of full scans. On the fixture the estimator
    lands within ~35% per source from 32 rows (pytest bounds it); at
    100 TB the same 32-row-per-source state answers every post-hoc
    "how many tokens does slice X hold" question.

    Exactness: w_hat values integer-quantize to micro-units scan-side
    and SUM as BIGINT (order-free — the embed_drift_cusum lesson; a
    32-double float fold would be engine-order-dependent), dividing
    back to a published double only at the end.
    """
    d = T(spark, sf_dir, "documents")
    smp = priority_sample(d, "source", "doc_id", "n_chars", k=_PRI_K)
    est = (
        smp.select(
            "source",
            F.round(F.col("_w_hat") * 1000000).cast("bigint").alias("_wq"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("_wq").cast("bigint").alias("_est_q"),
        )
    )
    tru = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("true_chars"),
    )
    return (
        tru.join(est, "source")
        .select(
            "source",
            "n_docs",
            "n_sampled",
            "true_chars",
            F.round(F.col("_est_q").cast("double") / 1000000 + 1e-9, 4).alias(
                "est_chars"
            ),
            F.round(
                F.abs(
                    F.col("_est_q").cast("double") / 1000000
                    - F.col("true_chars")
                )
                / F.col("true_chars")
                + 1e-9,
                6,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )
