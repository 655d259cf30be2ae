"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401
from pyspark.storagelevel import StorageLevel

#: Live frames materialized by :func:`eager_cache`, released by
#: :func:`release_caches`. A module-level registry (not per-call handles)
#: because the frames outlive the operator call that created them — the
#: caller holds only the derived result DataFrame.
_LIVE_CACHES: list[DataFrame] = []


def eager_cache(df: DataFrame) -> DataFrame:
    """Materialize ``df`` into the block cache NOW and register it for
    :func:`release_caches`.

    Why persist + eager count, not localCheckpoint: a localCheckpoint
    TRUNCATES lineage, so releasing its blocks makes any still-unexecuted
    consumer fail hard with missing checkpoint blocks — and (measured, r5)
    PySpark never releases them via GC either: the JVM pins the
    checkpointed RDD even after the Python frame is collected and
    System.gc() runs, so every call leaks storage for the session
    lifetime, the exact r3 defect shape. persist keeps lineage, so
    ``unpersist`` at ANY time is safe — a late consumer silently
    recomputes instead of failing — and the eager count() gives the same
    compute-once guarantee while the cache lives. Harnesses (bench,
    oracle gate, plan audit, the streaming foreachBatch loop) call
    :func:`release_caches` after each query/batch, which is what keeps a
    100 TB session's storage bounded; long-lived library users do the
    same.
    """
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    _LIVE_CACHES.append(out)
    return out


def register_cache(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for :func:`release_caches`
    (for operators that manage materialization themselves — iterative
    loops persisting per-round state)."""
    _LIVE_CACHES.append(df)
    return df


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of currently-pinned RDDs (cache + localCheckpoint blocks)."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def take_rdd_handles(spark, exclude: set[int]) -> list:
    """Java handles of every pinned RDD whose id is not in ``exclude`` —
    the delta-capture that lets an iterative operator unpersist a
    PREVIOUS round's localCheckpoint blocks explicitly (PySpark never
    releases them via GC; see :func:`eager_cache`). Call with the id
    snapshot taken before the round materialized."""
    out = []
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().toList().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() not in exclude:
            out.append(t._2())
    return out


def register_rdd_handles(handles: list) -> None:
    """Register java RDD handles (e.g. a result frame's final
    localCheckpoint) for :func:`release_caches`. NOTE the stronger
    contract vs persisted frames: a checkpoint-backed frame cannot be
    re-executed after release (truncated lineage) — harnesses must
    consume results before releasing, which they do."""
    _LIVE_CACHES.extend(handles)


def release_caches() -> int:
    """Unpersist every :func:`eager_cache` frame (safe at any time —
    persist keeps lineage, so late consumers recompute). Returns the
    number released."""
    n = len(_LIVE_CACHES)
    for df in _LIVE_CACHES:
        try:
            df.unpersist(False)
        except Exception:  # a stopped session has nothing to release
            pass
    _LIVE_CACHES.clear()
    return n


_SHARED_CACHES: dict[tuple, DataFrame] = {}
#: Pinned-RDD ids belonging to shared_eager_cache frames (the delta of
#: persistent ids across each eager materialization) — what
#: :func:`sweep_unshared_rdds` must NOT release.
_SHARED_RDD_IDS: set[int] = set()
#: Wall seconds spent BUILDING each shared frame (builder + persist +
#: eager count), keyed by the user key. Bench reads this so its JSON can
#: attribute the one-time build cost that otherwise lands on whichever
#: query first touches a shared frame (ADVICE r10: per-query medians are
#: no longer end-to-end for shared-frame consumers; this row makes the
#: end-to-end cost reconstructible).
SHARED_BUILD_SECONDS: dict[str, float] = {}


def shared_eager_cache(spark, key: tuple, builder) -> DataFrame:
    """Keyed eager cache that SURVIVES :func:`release_caches` — for frames
    several registry queries recompute identically (the MinHash signature
    table: dedup_minhash_lsh, dedup_incremental_lsh and
    pipeline_near_dedup_lsh all derive it from the same documents scan,
    VERDICT r5 #5). First caller pays the build + persist + eager count;
    later callers — including later *queries* in the same bench/gate
    session — read InMemoryTableScan.

    The key is namespaced by the Spark application id, so a cached frame
    from a stopped session is never served to a new one. Memory stays
    bounded because entries are signature-sized (8 + 8*n_hashes bytes per
    doc, never text-sized) and keyed per (sf_dir, params) — a handful per
    process; :func:`release_shared_caches` frees them (harness end /
    test teardown)."""
    full_key = (spark.sparkContext.applicationId, *key)
    df = _SHARED_CACHES.get(full_key)
    if df is not None:
        try:
            sl = df.storageLevel
            if sl.useMemory or sl.useDisk:
                return df
            # Spark's CacheManager dedupes persists by normalized plan, so
            # an unrelated release_caches() on an identically-planned frame
            # drops this entry too — re-persist rather than silently
            # degrading every later consumer to recompute.
            pre = persistent_rdd_ids(spark)
            df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()
            _SHARED_RDD_IDS.update(persistent_rdd_ids(spark) - pre)
            return df
        except Exception:
            pass  # stopped session etc. — rebuild below
    import time as _time

    pre = persistent_rdd_ids(spark)
    t0 = _time.time()
    out = builder().persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    kstr = "/".join(str(p) for p in key)
    SHARED_BUILD_SECONDS[kstr] = SHARED_BUILD_SECONDS.get(kstr, 0.0) + round(
        _time.time() - t0, 3
    )
    _SHARED_RDD_IDS.update(persistent_rdd_ids(spark) - pre)
    _SHARED_CACHES[full_key] = out
    return out


def release_shared_caches() -> int:
    """Unpersist every :func:`shared_eager_cache` frame."""
    n = len(_SHARED_CACHES)
    for df in _SHARED_CACHES.values():
        try:
            df.unpersist(False)
        except Exception:
            pass
    _SHARED_CACHES.clear()
    _SHARED_RDD_IDS.clear()
    return n


def sweep_unshared_rdds(spark) -> int:
    """Unpersist every pinned RDD that does NOT belong to a
    shared_eager_cache frame — the bench/harness hygiene that replaced
    ``spark.catalog.clearCache()`` (r10): clearCache also destroyed the
    deliberately session-shared frames (MinHash signatures, the co-order
    edge list), re-charging every later rep for their rebuild, which is
    what doubled graph_local_clustering's solo median at the r9 close.
    This sweep keeps clearCache's guarantee — an unregistered persist()
    cannot accumulate storage across a 380+-query session — while the
    shared frames keep amortizing. Safe at any time: persisted frames
    keep lineage, so a late consumer recomputes instead of failing."""
    handles = take_rdd_handles(spark, exclude=_SHARED_RDD_IDS)
    for h in handles:
        try:
            h.unpersist(False)
        except Exception:
            pass
    return len(handles)


def hof_let(bound, fn):
    """Let-bind an expensive expression for a higher-order-function body:
    ``hof_let(expr, lambda v: body(v))`` evaluates ``expr`` ONCE per row
    and hands the computed value to ``body`` as a bound lambda variable.

    Why this exists (r12, guide §7.2 "duplicated subtrees"): Catalyst
    collapses Projects, so a HOF lambda that references a derived column
    (e.g. ``tokens = split(lower(trim(text)))``) ends up with the whole
    derivation INLINED at every reference — and HOF bodies are interpreted
    with no subexpression elimination, so ``element_at(tokens, i)`` /
    ``slice(tokens, i, n)`` re-runs the full tokenize once PER ELEMENT.
    Measured on the sf0.1 text family: bigram explode+count 12.5 s -> 0.9 s,
    char-trigram count 6.9 s -> 2.3 s, word-4-gram count 2.5 s -> 0.8 s.
    The binding is ``element_at(transform(array(expr), fn), 1)`` — the
    1-element-array transform that similarity.cosine and the MinHash
    signature already used locally; centralized here so every n-gram /
    window operator shares one audited idiom.
    """
    return F.element_at(F.transform(F.array(bound), fn), 1)


_BYTE_SUFFIX = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
                "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40,
                "tb": 1 << 40}


def _parse_bytes(text: str) -> int:
    """Spark byte-size conf string ('134217728b', '128m', '1g') -> bytes."""
    t = text.strip().lower()
    digits = "".join(ch for ch in t if ch.isdigit())
    suffix = t[len(digits):].strip() if t.startswith(digits) else ""
    return int(digits or "0") * _BYTE_SUFFIX.get(suffix, 1)


def spread(df: DataFrame, key: str) -> DataFrame:
    """Ensure at least default-parallelism partitions before a CPU-heavy
    per-row stage (signature hashing, vector math). A small compressed file
    scans as ONE partition, which would serialize that stage on a single
    core; on a real cluster the input already has many splits and this is a
    no-op.

    Probe: plan metadata only — no RDD conversion
    (``df.rdd.getNumPartitions()`` materializes a Python RDD bridge per
    call; VERDICT r1). Scan splits are estimated as
    ``max(file_count, size_bytes / maxPartitionBytes)``: file count
    lower-bounds split count, and the optimizer's size statistic catches
    the few-large-splittable-files case. Fact-scale inputs always clear
    the threshold and skip the shuffle entirely.
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        est = len(df.inputFiles())
    except Exception:
        est = 0
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        mpb_raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        est = max(est, size // max(_parse_bytes(str(mpb_raw)), 1))
    except Exception:
        pass
    if est < n:
        return df.repartition(n, key)
    return df
