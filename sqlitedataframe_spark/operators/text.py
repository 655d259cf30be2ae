"""Text-analysis operators for training-data pipelines: tokenization, token
counting, language-ID heuristic, quality scoring, document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly): at 100 TB these run
inside the parquet scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.util import hof_let

#: Tiny deterministic English stopword list used by the heuristics. The
#: point is the *plumbing* (ratio features computed at scale), not the model.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

#: BPE-ish token pattern: runs of letters, runs of digits, or single
#: non-space symbols — a deterministic stand-in for a real tokenizer's
#: pre-tokenization regex.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased text (array<string>)."""
    return F.split(F.trim(F.lower(_c(col))), r"\s+")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count via the pre-tokenization regex."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def avg_token_len(col: Column | str) -> Column:
    """Mean token length — cheap fluency signal."""
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t)


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords."""
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return n_sw.cast("double") / F.size(t)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    c = _c(col)
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return n_punct.cast("double") / F.length(c)


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality score combining length, stopword and
    punctuation signals — the standard cheap pre-filter shape for LLM
    training-data pipelines (C4/Gopher-style rules, simplified)."""
    c = _c(col)
    len_score = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 4, F.lit(1.0))  # saturates at 25% stopwords
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5)
    return F.round((len_score + sw_score + punct_penalty) / 3, 6)


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID over character/stopword signals.

    Deterministic rule set (the fixtures' text is synthetic, so this is the
    plumbing for a real n-gram model): CJK chars -> 'zh'; else high English
    stopword ratio -> 'en'; else accented Latin -> 'fr'; else 'unknown'.
    """
    c = _c(col)
    # rlike, not length(regexp_replace(...)): existence tests short-circuit
    # on the first matching char instead of materializing a stripped copy
    # of every document
    has_cjk = c.rlike("[一-鿿]")
    accents = c.rlike("[à-ÿ]")
    return (
        F.when(has_cjk, "zh")
        .when(stopword_ratio(c) >= 0.08, "en")
        .when(accents, "fr")
        .otherwise("unknown")
    )


#: Rolling-hash modulus: prime below 2^57, so acc*31 + char stays under
#: 2^62 and never overflows ANSI bigint arithmetic.
ROLLING_HASH_P = 144115188075855859


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of the full text (Rabin-Karp shape):
    ``h = (h*31 + codepoint) mod P`` folded left-to-right — order-SENSITIVE
    (complements the order-insensitive token fingerprint below) and
    bit-identical across engines since the fold is sequential."""
    chars = F.regexp_extract_all(_c(col), F.lit("."), F.lit(0))
    return F.aggregate(
        F.transform(chars, lambda ch: F.ascii(ch).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * F.lit(31) + x, F.lit(ROLLING_HASH_P)),
    )


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set. Documents that are permutations/duplications of the same
    vocabulary collapse to one fingerprint — a cheap exact near-dup key."""
    t = F.array_sort(F.array_distinct(tokens(col)))
    return F.md5(F.array_join(t, " "))


#: Word tokenization shared by the TF-IDF path and its SQL oracle twin:
#: split on any non-alphanumeric run. Kept as a constant so the Spark and
#: DuckDB sides can never drift apart.
WORD_SPLIT_PATTERN = "[^a-z0-9]+"

#: Minimum term length for TF-IDF (drops split artifacts and stop-ish
#: 1-2 char tokens).
TFIDF_MIN_TERM_LEN = 3


def tfidf_topk(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_term_len: int = TFIDF_MIN_TERM_LEN,
):
    """Top-k TF-IDF terms per document.

    Plan shape (3 shuffles total, each on a slim projection):
      1. scan -> lower/split/explode (map-side) -> groupBy(doc, term) for tf;
      2. groupBy(term) on the tf table for df (term-document frequency) —
         partial aggregation map-side, so the exchange carries one row per
         distinct (partition, term), not one per posting;
      3. tf join df on term (shuffle join; vocabulary is unbounded so the
         df side is NOT assumed broadcastable at 100 TB), then a window
         partitioned by doc for the top-k.
    N (corpus size) rides along as a 1-row broadcast — no collect().

    Ranking is by the integer pair (tf DESC, df ASC, term ASC), not by the
    float score: tf*ln(N/df) ties and last-ulp drift would make top-k
    nondeterministic across engines; the integer ordering is total and
    engine-portable. The rounded score is still reported.
    """
    from pyspark.sql import Window

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    terms = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), WORD_SPLIT_PATTERN)).alias("term"),
    ).filter(F.length("term") >= min_term_len)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_tbl, "term")
        .join(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            "rank",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")) + 1e-9, 6
            ).alias("tfidf"),
        )
    )


def chunk_text(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Split each document into overlapping fixed-size token windows — the
    context-window preparation step of a training pipeline.

    Pure map-side: tokenize once, generate the chunk-start offsets with
    ``sequence`` and ``posexplode`` them, slice the token array per chunk.
    No shuffle at all; output rows = sum of per-doc chunk counts. At 100 TB
    this runs entirely inside the scan stage.

    Chunks: starts at 0, stride ``chunk_tokens - overlap``; every token is
    covered and the final window may be short (never empty). A document
    with <= chunk_tokens tokens yields exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    # number of windows = ceil(max(s - chunk, 0) / stride) + 1; sequence's
    # inclusive stop is (n-1)*stride
    extra = F.greatest(F.size(toks) - F.lit(chunk_tokens), F.lit(0))
    stop = ((extra + F.lit(stride - 1)) / F.lit(stride)).cast("int") * F.lit(stride)
    starts = F.sequence(F.lit(0), stop, F.lit(stride))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_t"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_t"), F.col("_start") + 1, chunk_tokens)
    return d.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_sequential(
    df,
    size_col: str,
    shard_col,
    order_col: str,
    capacity: int,
    bin_col: str = "bin",
):
    """Assign rows to fixed-capacity bins by cumulative size within a shard
    — deterministic sequence packing for context-length batching.

    ``bin = floor(cumulative_size_before_row / capacity)`` over the shard's
    ``order_col`` order: contiguous documents fill a bin until the running
    total crosses the capacity boundary (a document may straddle — this is
    offset-based packing, not bin-packing; deterministic and one-pass).

    Scale: packing is inherently sequential, so the global problem is
    sharded — each shard packs independently under one window partitioned
    by ``shard_col`` (one exchange, parallel across shards); at 100 TB pick
    shard counts >> executor count and bins stay balanced by the law of
    large numbers.
    """
    from pyspark.sql import Window

    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    w = (
        Window.partitionBy(shard)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(size_col).over(w) - F.col(size_col)
    return df.withColumn(bin_col, F.floor(cum_before / F.lit(capacity)).cast("bigint"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram repetition statistics — the Gopher-style
    repetition filter signal (a document whose single most frequent
    n-gram covers a large fraction of all its n-grams is boilerplate or
    spam, not prose).

    Returns (id, n_grams, top_count, rep_ratio): total n-gram occurrences,
    the count of the most frequent n-gram, and their ratio (6 dp).
    Documents shorter than ``n`` tokens contribute one whole-text gram
    (ratio 1.0 — maximally "repetitive" degenerate case, callers usually
    length-gate first).

    Plan shape: ZERO shuffles on fact-scale input. The statistic is
    per-document, so it never needed the (id, gram) counting exchange the
    first implementation used: sort the gram array in-row and fold once
    tracking the longest run of equal neighbors — the run length of the
    sorted array IS the top gram count. Everything evaluates inside the
    scan stage; at 100 TB the gram strings never leave their executor.
    ``spread`` parallelizes the CPU-heavy fold when a small input scans as
    one partition (local fixtures; a no-op on real splits) — measured 4x
    on the sf0.1 bench, where the whole query ran on 1 of 32 cores.
    """
    from sqlitedataframe_spark.operators.util import spread

    df = spread(df, id_col)
    # let-bind the TOKEN array too (r12, util.hof_let): the outer binding
    # below covers the sorted gram array, but without this inner one the
    # slice-per-position gram builder re-tokenizes the text once per gram
    grams = hof_let(
        tokens(text_col),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    )
    zero = F.lit(0).cast("bigint")

    def fold(g: Column) -> Column:
        return F.aggregate(
            g,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                zero.alias("run"),
                zero.alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("bigint"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                        F.lit(1).cast("bigint")
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    # let-bind the sorted gram array (transform over a 1-element array, as
    # in similarity.cosine): size() and the fold both reference it, and
    # without the binding the whole tokenize+gram+sort tree would evaluate
    # twice per row
    stats = F.element_at(
        F.transform(
            F.array(F.array_sort(grams)),
            lambda g: F.struct(
                F.size(g).cast("bigint").alias("n"), fold(g).alias("b")
            ),
        ),
        1,
    )
    return df.select(
        F.col(id_col).alias("id"),
        stats["n"].alias("n_grams"),
        stats["b"].alias("top_count"),
    ).select(
        "id",
        "n_grams",
        "top_count",
        F.round(F.col("top_count") / F.col("n_grams") + 1e-9, 6).alias("rep_ratio"),
    )


def ngram_set(text_col: Column | str, n: int, sep: str = " ") -> Column:
    """Distinct word n-grams of the raw text (array<string>), split on
    single spaces — the exact-match unit for train/test decontamination.
    Documents with fewer than ``n`` tokens yield an empty set (no partial
    grams), matching SQL ``generate_series(1, len-n+1)`` semantics.

    Pure scan-side Column expression; ``array_distinct`` makes per-document
    dedup free (no shuffle) for downstream set operations.
    """
    # let-bound (r12, util.hof_let): the split must not be inlined into the
    # per-position lambda — that re-splits the text once per gram
    grams = hof_let(
        F.split(_c(text_col), sep),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), sep),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.array_distinct(grams)


def ngram_contamination(
    train,
    test,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    broadcast_test: bool = True,
):
    """Train/test decontamination: per train document, the number of
    distinct word ``n``-grams it shares with ANY test document — the
    standard exact-overlap contamination check run before training on
    web-scale corpora (cf. GPT-3/PaLM appendix decontamination: n-gram
    collision against benchmark test sets).

    Plan shape at 100 TB: both sides expand to (id, gram) pairs map-side
    (``ngram_set`` is a scan-stage expression; ``array_distinct`` already
    dedups within a document, so no global distinct is needed on the train
    side). The TEST gram set — benchmarks, inherently bounded — collapses
    to a distinct gram list and is broadcast, so the 100-TB train side
    joins without shuffling; one final aggregate on train ids returns the
    per-document overlap count. Set ``broadcast_test=False`` for an
    atypically large test corpus and the optimizer plans a shuffle join
    (AQE may still broadcast if small enough).
    """
    test_grams = (
        test.select(F.explode(ngram_set(text_col, n)).alias("gram")).distinct()
    )
    if broadcast_test:
        test_grams = F.broadcast(test_grams)
    train_pairs = train.select(
        F.col(id_col), F.explode(ngram_set(text_col, n)).alias("gram")
    )
    return (
        train_pairs.join(test_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> DataFrame:
    """Per-document mean bigram log-likelihood under a Laplace-smoothed
    bigram model trained on the corpus itself — the perplexity-style
    quality filter (KenLM-shaped): documents whose word transitions are
    improbable under the corpus model are noise/boilerplate/garbled.

    Model: P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = corpus vocabulary
    size. Score = avg(ln P) over the document's bigrams (docs with < 2
    tokens drop out — no bigrams to score).

    Plan shape (the part that matters at 100 TB):
    - bigrams are built MAP-SIDE inside the scan (transform over the
      token array), so the only data that shuffles is (w1, w2) pairs for
      counting — never document text;
    - the model is two count aggregations (bigram, unigram-context) plus
      a 1-row vocabulary count;
    - scoring joins doc-bigrams to the model ON THE BIGRAM KEY — a hash
      join that scales with model size, deliberately NOT a driver-side
      broadcast of the model (a web-corpus bigram table is billions of
      rows); Catalyst/AQE may still broadcast when the model is small;
    - per-document mean = one aggregation by doc id.
    Rounded to ``round_dp`` so the score is engine-reproducible (the
    suite oracle re-derives the identical model in SQL).
    """
    # let-bound (r12, util.hof_let): the projected-column defense this
    # used before does NOT survive the optimizer — CollapseProject inlines
    # the tokens() expression back into the lambda, re-tokenizing once per
    # element (the HOF common-subexpression pitfall; re-measured this
    # round at ~10x on the sibling perplexity operator). hof_let binds the
    # computed array to a lambda variable the optimizer cannot inline
    # through.
    toks_df = df.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_t")
    )
    t = F.col("_t")
    bigrams = hof_let(
        t,
        lambda tt: F.transform(
            F.sequence(F.lit(1), F.size(tt) - 1),
            lambda i: F.struct(
                F.element_at(tt, i).alias("w1"),
                F.element_at(tt, i + 1).alias("w2"),
            ),
        ),
    )
    doc_bi = (
        toks_df.filter(F.size(t) >= 2)
        .select("_id", F.explode(bigrams).alias("b"))
        .select("_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    uni = toks_df.select(F.explode(t).alias("w1"))
    c12 = doc_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = uni.agg(F.count_distinct("w1").alias("_v"))
    logp = F.log(
        (F.col("_c12") + 1).cast("double") / (F.col("_c1") + F.col("_v"))
    )
    return (
        doc_bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), round_dp).alias("avg_logp"),
        )
        .select(F.col("_id").alias(id_col), "n_bigrams", "avg_logp")
    )


def frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = 50,
    sep: str = " ",
) -> DataFrame:
    """Corpus-wide top-``k`` most frequent word ``n``-grams — the
    boilerplate radar (repeated navigation chrome, cookie banners, license
    headers surface instantly) and the counting primitive behind vocabulary
    induction. Counts every occurrence (unlike ``ngram_set``, which dedups
    per document for contamination checks).

    Scale shape: grams expand map-side from the token array (scan-stage
    ``transform``/``slice`` expressions, no Python); the only shuffle is the
    gram-count aggregate with map-side partial combine, so what crosses the
    exchange is bounded by DISTINCT grams per partition, not corpus size;
    the global top-k plans as TakeOrderedAndProject (per-partition heaps,
    k rows to the driver), not a full sort. Ties break on the gram text so
    the row set is engine-reproducible.
    """
    # let-bound (r12, util.hof_let): keep the split out of the per-position
    # lambda — inlined, it re-splits the text once per gram
    grams = hof_let(
        F.split(_c(text_col), sep),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), sep),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(k)
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
    sep: str = " ",
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies within words — the
    counting step of a BPE merge iteration (the argmax row IS the next
    merge). Word boundaries are respected (pairs never span the
    separator), matching standard BPE pre-tokenization.

    Scale shape: both explodes (words, then in-word pairs) are map-side
    scan-stage expressions; the only shuffle is the pair-count aggregate,
    partially combined map-side so at most |alphabet|^2 rows per partition
    cross the exchange — input-size-independent, like the sketches. Top-k
    via TakeOrderedAndProject with the pair text as tiebreak.

    A full BPE trainer iterates merge->re-segment; that loop is driver-
    orchestrated (like pagerank/k-means here) with this operator as the
    per-iteration kernel.
    """
    words = df.select(
        F.explode(F.split(_c(text_col), sep)).alias("_w")
    ).filter(F.length("_w") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("_w") - 1),
        lambda i: F.col("_w").substr(i, F.lit(2)),
    )
    return (
        words.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def skipgram_pairs(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    k: int = 50,
    sep: str = " ",
) -> DataFrame:
    """Top-``k`` skip-gram (center, context) pair counts within a
    ``window``-token lookahead — the co-occurrence counting step behind
    word2vec/GloVe-style embedding training and PMI collocation mining.
    Pairs are ordered (context follows center), each occurrence counted.

    Scale shape: pair expansion is a scan-stage nested transform over the
    let-bound token array (window * n pairs per doc, built map-side); the
    only shuffle is the pair-count aggregate with map-side partial
    combine, bounded per partition by the distinct-pair count; top-k is
    TakeOrderedAndProject with the pair as tiebreak.
    """
    pairs_of = lambda t: F.flatten(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(window)),
                    lambda d: F.when(
                        i + d <= F.size(t),
                        F.struct(
                            F.element_at(t, i.cast("int")).alias("w1"),
                            F.element_at(t, (i + d).cast("int")).alias("w2"),
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    # Single-token guard: for size(t) == 1, sequence(1, size-1) would be the
    # DESCENDING sequence [1, 0] and the i=0, d=1 step passes the
    # i+d <= size test (1 <= 1), so element_at(t, 0) would throw
    # INVALID_INDEX_OF_ZERO. Documents with < 2 tokens contribute no pairs.
    guarded = lambda t: F.when(F.size(t) >= 2, pairs_of(t)).otherwise(  # noqa: E731
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    pairs = F.element_at(
        F.transform(F.array(F.split(_c(text_col), sep)), guarded), 1
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1"), F.col("w2"))
        .limit(k)
    )


def tfidf_cosine_pairs(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df_frac: float = 0.1,
    max_df_cap: int = 500,
    min_term_len: int = TFIDF_MIN_TERM_LEN,
    round_dp: int = 6,
):
    """Sparse TF-IDF cosine similarity join via the inverted index — the
    all-pairs document-similarity primitive over TEXT weights (the sparse
    sibling of the dense-embedding cosine join): postings self-join on
    the term, partial dot products accumulate per pair, norms divide at
    the end.

    Scale shape: the pair generator is the postings join, and its cost is
    sum over terms of df^2 — so terms whose document frequency exceeds
    ``max_df_frac`` of the corpus are pruned from the JOIN (the
    DISCO/df-cut idea, same policy family as the LSH hot-bucket guard).
    The cut is ``min(max_df_frac * N, max_df_cap)`` — two failure modes,
    two knobs, both caught by the 10x scale check: a purely ABSOLUTE cut
    silently empties the result as df values grow with the corpus, and a
    purely RELATIVE cut lets per-term pair work (df^2) grow quadratically
    until the join explodes. The absolute cap bounds per-term work at
    cap^2 exactly like the LSH hot-bucket / mega-basket guards; recall is
    traded only on terms commoner than the cap, whose IDF contribution is
    smallest. Norms keep ALL terms either way
    (retained scores stay exact): a corpus-wide stopword
    pairs everything with everything and contributes almost nothing to
    any cosine. Norms still use ALL terms, so retained scores are exact,
    not approximated — pruning only loses pairs whose similarity lives
    in their common terms. Shuffles carry (doc, term-hash, weight) rows.
    The threshold compares the ROUNDED cosine (+1e-9) so last-ulp
    parallel-sum drift cannot flip membership across engines.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    terms = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), WORD_SPLIT_PATTERN)).alias("term"),
    ).filter(F.length("term") >= min_term_len)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "df",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    # shared shuffle (ReuseExchange): norms, and both sides of the join
    # r12: ALSO lazily persisted post-repartition — ReuseExchange is
    # best-effort under AQE; the cache guarantees the tf/df/weight build
    # runs once while keeping the term hash-partitioning for the joins
    from sqlitedataframe_spark.operators.util import register_cache

    w = register_cache(w.repartition("term").persist())
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_nrm"))
    keep = w.join(F.broadcast(n_docs)).filter(
        F.col("df")
        <= F.least(
            F.floor(F.col("n_docs") * F.lit(max_df_frac)), F.lit(max_df_cap)
        )
    )
    a = keep.select(F.col("doc_id").alias("id_a"), "term", F.col("w").alias("_wa"))
    b = keep.select(F.col("doc_id").alias("id_b"), "term", F.col("w").alias("_wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("_nrm").alias("_na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("_nrm").alias("_nb"))
    cos = F.round(F.col("_dot") / (F.col("_na") * F.col("_nb")) + 1e-9, round_dp)
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def bm25_topk(
    docs,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
):
    """Top-``k`` documents by BM25 score against a fixed bag of query
    terms — the classic lexical-retrieval ranking (Robertson/Sparck Jones;
    the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` idf variant), the retrieval
    half of RAG data pipelines and the usual hard-negative source for
    embedding training.

    Plan shape at 100 TB — NO per-posting shuffle at all: per-document
    term frequencies for the |Q| query terms compute SCAN-SIDE as one
    let-bound array expression (tf vector + doc length per row), a single
    partial-aggregated 1-row global agg derives (N, avgdl, df_i), which
    broadcasts back for a scan-side score evaluation; top-k compiles to
    TakeOrderedAndProject. Compare tfidf_topk, which must shuffle postings
    because its vocabulary is unbounded — BM25 against a FIXED query only
    ever carries |Q| counters per document.

    Scores are rounded to 6 dp and ordered (score DESC, id ASC), a total
    order both engines reproduce; zero-score documents (no query term) are
    dropped.
    """
    qarr = F.array(*[F.lit(t) for t in query_terms])
    # let-bind the token array so length + |Q| filters evaluate one split
    per_doc = F.element_at(
        F.transform(
            F.array(tokens(text_col)),
            lambda t: F.struct(
                F.size(t).alias("dl"),
                F.transform(
                    qarr, lambda q: F.size(F.filter(t, lambda tok: tok == q))
                ).alias("tfs"),
            ),
        ),
        1,
    )
    base = docs.select(F.col(id_col), per_doc.alias("_s")).select(
        F.col(id_col), F.col("_s.dl").alias("dl"), F.col("_s.tfs").alias("tfs")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.element_at("tfs", i + 1) > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    def term_score(i: int) -> Column:
        tf = F.element_at("tfs", i + 1)
        dfreq = F.col(f"df_{i}")
        idf = F.log(
            (F.col("n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
            + F.lit(1.0)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        return F.when(tf > 0, idf * tf * F.lit(k1 + 1.0) / denom).otherwise(
            F.lit(0.0)
        )

    score = term_score(0)
    for i in range(1, len(query_terms)):
        score = score + term_score(i)
    return (
        base.join(F.broadcast(stats))
        .select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def vocab_oov_stats(
    docs,
    group_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 100,
):
    """Per-``group_col`` out-of-vocabulary statistics against the corpus'
    own top-``vocab_size`` token vocabulary — the tokenizer-coverage
    screen run before committing a vocab/tokenizer to a training mix
    (a source whose OOV rate spikes is under-served by the tokenizer).

    Plan shape: token counts are one explode + partially-aggregated
    groupBy(token) (the only posting-sized shuffle); the top-k vocabulary
    compiles to TakeOrderedAndProject (count DESC, token ASC — total
    order) and collapses to a ONE-ROW array via collect_list, which
    broadcasts to a scan-side membership filter — the corpus is never
    shuffled for the membership test, and nothing touches the driver
    (the vocab rides executor-side as a bounded broadcast row, the
    centroid pattern). avg() of the per-doc OOV ratio partially
    aggregates map-side.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"), tokens(text_col).alias("_t")
    )
    vocab = (
        toks.select(F.explode("_t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(vocab_size)
        .agg(F.sort_array(F.collect_list("tok")).alias("_vocab"))
    )
    oov = F.size(
        F.filter("_t", lambda x: ~F.array_contains("_vocab", x))
    ).cast("double") / F.size("_t")
    return (
        toks.join(F.broadcast(vocab))
        .select("grp", oov.alias("_oov"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("_oov"), 6).alias("avg_oov_rate"),
        )
        .withColumnRenamed("grp", "source" if group_col == "source" else group_col)
        .orderBy("source" if group_col == "source" else group_col)
    )


def token_entropy(text_col: Column | str) -> Column:
    """Shannon entropy (nats) of the document's token distribution —
    the repetitiveness/diversity quality signal: boilerplate and
    keyword-stuffed documents score low, natural prose scores near
    ln(distinct tokens). Entirely scan-side: the token array and its
    distinct set are let-bound once, then one nested fold sums
    -(c/n)·ln(c/n) over distinct tokens. Cost is O(|distinct| · n) per
    document — bounded for natural-language documents, zero shuffles,
    no posting explode.
    """
    inner = F.element_at(
        F.transform(
            F.array(tokens(text_col)),
            lambda t: F.aggregate(
                F.array_distinct(t),
                F.lit(0.0),
                lambda acc, tok: acc
                - (
                    F.size(F.filter(t, lambda x: x == tok)).cast("double")
                    / F.size(t)
                )
                * F.log(
                    F.size(F.filter(t, lambda x: x == tok)).cast("double")
                    / F.size(t)
                ),
            ),
        ),
        1,
    )
    return inner


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``k`` adjacent-bigram collocations by pointwise mutual
    information — ``pmi(x,y) = ln(N * c(xy) / (c(x) * c(y)))`` over
    corpus token counts with a ``min_count`` support cut (Church & Hanks
    1990). The standard phrase-detection pass (word2vec-style phrase
    merging, tokenizer vocab seeding) run before training.

    Everything derives from integer counts, so PMI is a pure function
    both engines evaluate identically; the output orders by
    (round(pmi), w1, w2) — a total order.

    Scale shape at 100 TB: bigram and unigram postings both explode
    scan-side and collapse through partially-combined groupBys whose
    output is vocabulary-sized, not corpus-sized. The two unigram-count
    joins onto the bigram table are key joins on the word (shuffle of
    vocabulary-sized tables only); N rides in as a 1-row broadcast. The
    ``min_count`` cut applies BEFORE the joins, so rare-pair noise never
    reaches the exchange.
    """
    t = tokens(text_col)
    bigrams = F.filter(
        F.zip_with(t, F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        lambda s: s["w2"].isNotNull(),
    )
    bg = (
        df.select(F.explode(bigrams).alias("_p"))
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    uni = (
        df.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    tot = uni.agg(F.sum("c_w").alias("n_tokens"))
    pmi = F.log(
        (F.col("c_xy").cast("double") * F.col("n_tokens"))
        / (F.col("c_x").cast("double") * F.col("c_y"))
    )
    return (
        bg.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_y")), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.round(pmi, round_dp).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def ngram_novelty_curve(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bucket: int = 50,
) -> DataFrame:
    """Corpus novelty curve: for documents in ``id_col`` order, the
    fraction of each document's DISTINCT n-grams appearing for the first
    time (no earlier doc contains them), averaged per ``bucket`` of
    ids — how fast a growing corpus stops contributing new content, the
    curation signal for "more of this source adds nothing".

    Scale shape: n-grams hash scan-side to 64-bit md5 prefixes (text
    never shuffles); one groupBy per hashed gram finds the minimal
    owning id (vocabulary-sized output), which joins back to the slim
    (id, gram-hash) postings; per-doc and per-bucket means are two more
    key aggregates. The gram hash is the portable md5 recipe, so the
    DuckDB twin reproduces first-owner assignment exactly.
    """
    g = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(ngram_set(text_col, n)).alias("_gram"),
    ).select(
        "_id",
        F.substring(F.md5(F.col("_gram").cast("binary")), 1, 16).alias("_h"),
    )
    first = g.groupBy("_h").agg(F.min("_id").alias("_first"))
    per_doc = (
        g.join(first, "_h")
        .groupBy("_id")
        .agg(
            (
                F.sum((F.col("_first") == F.col("_id")).cast("int"))
                / F.count(F.lit(1))
            ).alias("_novel")
        )
    )
    return (
        per_doc.groupBy(
            F.floor(F.col("_id") / bucket).cast("bigint").alias("id_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("_novel") + 1e-9, 6).alias("avg_novelty"),
        )
        .orderBy("id_bucket")
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 500,
    round_dp: int = 6,
) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: OLS slope of
    ``ln(freq)`` on ``ln(rank)`` for the top ``top_n`` tokens (natural
    language sits near -1; strong deviation flags synthetic, templated,
    or boilerplate-heavy corpora — a cheap corpus-health fingerprint).

    One vocabulary-sized count aggregate, a TakeOrderedAndProject top-n
    cut, ranks over the BOUNDED top-n list via a count-of-better
    self-join (<= top_n^2 bounded comparisons — a window over even the
    bounded list would read as a single-partition WindowExec, the shape
    this repo's plan audit bans outright), and a 1-row closed-form OLS
    aggregate. Output: slope, intercept, r2, n_tokens.
    """
    cnt = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(top_n)
    )
    a = cnt.select(F.col("tok").alias("_ta"), F.col("n").alias("_na"))
    b = cnt.select(F.col("tok").alias("_tb"), F.col("n").alias("_nb"))
    better = (F.col("_nb") > F.col("_na")) | (
        (F.col("_nb") == F.col("_na")) & (F.col("_tb") < F.col("_ta"))
    )
    ranked = (
        a.join(F.broadcast(b), better, "left")
        .groupBy("_ta", "_na")
        .agg((F.count("_tb") + 1).alias("_rank"))
    )
    xy = ranked.select(
        F.log(F.col("_rank").cast("double")).alias("_x"),
        F.log(F.col("_na").cast("double")).alias("_y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("_x"), F.sum("_y")
    sxx, syy, sxy = (
        F.sum(F.col("_x") * F.col("_x")),
        F.sum(F.col("_y") * F.col("_y")),
        F.sum(F.col("_x") * F.col("_y")),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r_num = n * sxy - sx * sy
    r_den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return xy.agg(
        F.round(slope, round_dp).alias("zipf_slope"),
        F.round(intercept, round_dp).alias("intercept"),
        F.round((r_num / r_den) * (r_num / r_den), round_dp).alias("r2"),
        n.cast("bigint").alias("n_tokens"),
    )


def hashed_tfidf_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Feature hashing ("the hashing trick", Weinberger et al. 2009):
    fixed-``dim`` TF-IDF document vectors with no vocabulary dictionary
    — token -> md5 bucket, value = tf * ln(N / df) summed per bucket.
    The classical scalable featurization for clustering/classification/
    near-dup over text when training an embedding model is overkill;
    the output array plugs directly into this repo's cosine/ANN/k-means
    operators.

    Scale shape: postings carry (id, bucket-int, 1) — text never
    shuffles; df counts collapse to a <= dim... no: df is per-BUCKET
    (bucketed df, the hashing trick's collision semantics), so the df
    table is dim-sized and broadcasts; one groupBy per (id, bucket) and
    a map-side array_agg-by-position (pivot via sequence + sum) build
    the dense vector without a per-component shuffle. Signed hashing
    (the +/- trick) is omitted deliberately: the oracle twin and the
    cosine consumers want non-negative tf-idf.
    """
    n_docs = docs.select(F.count(F.lit(1)).alias("_nd"))
    postings = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("_tok"),
    ).select(
        id_col,
        (
            F.conv(F.substring(F.md5(F.col("_tok").cast("binary")), 1, 8), 16, 10)
            .cast("bigint") % dim
        ).alias("_b"),
    )
    tf = postings.groupBy(id_col, "_b").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("_b").agg(F.count(F.lit(1)).alias("_df"))
    weighted = (
        tf.join(F.broadcast(dfreq), "_b")
        .join(F.broadcast(n_docs))
        .select(
            id_col, "_b",
            F.round(
                F.col("_tf") * F.log(F.col("_nd").cast("double") / F.col("_df")),
                round_dp,
            ).alias("_v"),
        )
    )
    # dense vector: map of present buckets -> array over 0..dim-1
    dense = (
        weighted.groupBy(id_col)
        .agg(F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m"))
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0.0)
                ),
            ).alias("features"),
        )
    )
    return dense


def source_ngram_overlap(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_pairs: int = 20,
) -> DataFrame:
    """Pairwise word-n-gram Jaccard between corpus SOURCES (not
    documents): which feeds are near-mirrors of each other — the
    corpus-composition diagnostic run before mixture weighting, since
    two 0.9-overlap sources would otherwise be double-counted by any
    per-source sampling budget.

    Plan shape at 100 TB: per-source DISTINCT gram sets are built by
    one scan + one (gram, source)-keyed aggregate (map-side partial
    dedup via scan-side ``ngram_set``); the pair intersection is a
    gram-keyed self-join carrying only (gram, source) — never text —
    and the output is #sources^2/2 rows. Set sizes ride back as a
    sources-sized broadcast. A hot gram appearing in all S sources
    contributes S^2/2 join rows, bounded by the (small) source count,
    so no skew guard is needed — the heavy dimension (gram frequency
    inside a source) is already collapsed by the distinct.
    """
    grams = (
        docs.select(
            F.col(group_col).alias("_g"),
            F.explode(ngram_set(text_col, n)).alias("_gram"),
        )
        .distinct()
    )
    sizes = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
    a = grams.select(F.col("_g").alias("src_a"), "_gram")
    b = grams.select(F.col("_g").alias("src_b"), "_gram")
    inter = (
        a.join(b, "_gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col("_g").alias("src_a"), F.col("_sz").alias("_na"))
    sb = sizes.select(F.col("_g").alias("src_b"), F.col("_sz").alias("_nb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("_inter").cast("bigint").alias("n_common_grams"),
            F.round(
                F.col("_inter")
                / (F.col("_na") + F.col("_nb") - F.col("_inter"))
                + 1e-9,
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "src_a", "src_b")
        .limit(top_pairs)
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth ``V(N) ~ K * N^beta``: the
    corpus splits into ``n_buckets`` id-ordered prefix buckets, each
    bucket contributes its token count and its FIRST-SEEN distinct
    tokens, and the (cumulative tokens, cumulative vocab) points fit a
    log-log OLS — beta ~ 0.4-0.6 for natural text; beta near 0 means
    the corpus has stopped contributing new vocabulary (saturation /
    heavy duplication), beta near 1 means noise/ids masquerading as
    words.

    Plan shape: first-seen bucket is one ``min(bucket)`` aggregate
    keyed by token (the only data-sized shuffle — same key as every
    vocab op); bucket totals are scan-side sums; cumulatives ride a
    <= ``n_buckets``-row triangular self-join (no global window) and
    the OLS is a 1-row moments aggregate.
    """
    width = df.agg(
        F.ceil((F.max(id_col) + 1) / F.lit(n_buckets)).alias("_w")
    )
    toks = df.join(F.broadcast(width)).select(
        F.least(
            F.floor(F.col(id_col) / F.col("_w")), F.lit(n_buckets - 1)
        ).cast("int").alias("_b"),
        tokens(text_col).alias("_toks"),
    )
    n_tok = toks.groupBy("_b").agg(
        F.sum(F.size("_toks")).cast("bigint").alias("_n")
    )
    first_seen = (
        toks.select("_b", F.explode("_toks").alias("_t"))
        .groupBy("_t")
        .agg(F.min("_b").alias("_fb"))
        .groupBy(F.col("_fb").alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    )
    per = n_tok.join(first_seen, "_b", "left").select(
        "_b", "_n", F.coalesce("_v", F.lit(0)).alias("_v")
    )
    a, b = per.alias("a"), per.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b._b") <= F.col("a._b"))
        .groupBy(F.col("a._b").alias("_b"))
        .agg(
            F.sum("b._n").alias("_cn"),
            F.sum("b._v").alias("_cv"),
        )
    )
    x = F.log(F.col("_cn").cast("double"))
    y = F.log(F.col("_cv").cast("double"))
    pts = cum.filter((F.col("_cn") > 0) & (F.col("_cv") > 0)).select(
        F.col("_cn"), F.col("_cv"), x.alias("_x"), y.alias("_y")
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("_x"), F.sum("_y")
    sxx = F.sum(F.col("_x") * F.col("_x"))
    syy = F.sum(F.col("_y") * F.col("_y"))
    sxy = F.sum(F.col("_x") * F.col("_y"))
    # degeneracy guards on EXACT INTEGER extremes, not FP variances: a
    # saturated vocabulary (every bucket the same cumulative V — true of
    # fixed-vocab synthetic corpora) zeroes the y-variance, where the
    # catastrophically-cancelled FP moment can land at +-1e-13 and the
    # two engines disagree (or sqrt goes negative). Constant V => beta
    # is exactly 0 and K is exactly V; r2 is undefined => NULL.
    y_flat = F.min("_cv") == F.max("_cv")
    x_flat = F.min("_cn") == F.max("_cn")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r_num = n * sxy - sx * sy
    r_den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return pts.agg(
        F.round(
            F.when(y_flat, F.lit(0.0)).when(x_flat, F.lit(None)).otherwise(
                slope
            )
            + 1e-9,
            6,
        ).alias("beta"),
        F.round(
            F.when(y_flat, F.max("_cv").cast("double")).otherwise(
                F.exp((sy - slope * sx) / n)
            )
            + 1e-9,
            4,
        ).alias("k"),
        F.round(
            F.when(y_flat | x_flat, F.lit(None)).otherwise(
                (r_num / r_den) * (r_num / r_den)
            )
            + 1e-9,
            6,
        ).alias("r2"),
        n.cast("bigint").alias("n_points"),
    )


def perplexity_heldout(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    holdout_mod: int = 5,
    k: float = 0.5,
    round_dp: int = 4,
) -> DataFrame:
    """Held-out bigram perplexity per language: train an add-k bigram LM on
    docs with ``id % holdout_mod != 0``, score the held-out rest —
    P(w2|w1) = (c(w1,w2)+k) / (c(w1,.)+k*V) with V the train vocabulary —
    and report per-lang mean log-prob and perplexity. The standard
    corpus-quality / domain-shift probe for pretraining mixes (is the
    held-out slice predictable from the rest?), composing the
    bigram_lm_scores machinery into an end-to-end train/test eval.

    Scale shape: bigram construction is map-side (transform over the
    token array, no explode before the count aggregates); the LM tables
    are two keyed aggregates joined onto the exploded held-out bigrams ON
    THE BIGRAM KEY (hash joins — never a broadcast of a corpus-sized
    model); vocabulary sizes are a #langs-row broadcast. No windows, no
    driver state; floating work is one log per scored bigram plus a
    per-lang mean, rounded.

    Holdout assignment (ADVICE r6): NUMERIC ids split by
    ``id % holdout_mod`` (cheap, oracle-trivial); STRING ids — supported
    by the rest of the dedup/text family — split by a portable md5 hash
    mod ``holdout_mod`` (the sampling family's recipe) instead of
    failing analysis. Both are deterministic pure functions of the id.
    """
    id_type = dict(docs.dtypes).get(id_col, "")
    numeric_id = any(
        id_type.startswith(t)
        for t in ("tinyint", "smallint", "int", "bigint", "decimal")
    )
    if numeric_id:
        fold = F.col("_id") % holdout_mod
    else:
        fold = (
            F.conv(
                F.substring(F.md5(F.col("_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % holdout_mod
        )
    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(lang_col).alias("_lang"),
        toks.alias("_t"),
    ).filter(F.size(toks) >= 2)
    # let-bound (r12, util.hof_let): the projected _t did not protect the
    # lambda — CollapseProject re-inlined the tokenize into every
    # element_at, re-splitting the text once per bigram (measured: this
    # one expression was 12.5 s of the query's 12.5 s at sf0.1; 0.9 s
    # bound)
    base = base.withColumn(
        "_bg",
        hof_let(
            F.col("_t"),
            lambda tt: F.transform(
                F.sequence(F.lit(1), F.size(tt) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(tt, i), F.element_at(tt, i + 1)
                ),
            ),
        ),
    )
    train = base.filter(fold != 0)
    test = base.filter(fold == 0)

    tr_bg = train.select("_lang", F.explode("_bg").alias("_b"))
    c2 = tr_bg.groupBy("_lang", "_b").agg(F.count(F.lit(1)).cast("long").alias("_c2"))
    # c1 (context counts) DERIVED from c2 instead of a second full
    # tokenize+explode pass over train (r12, guide §2.3 "aggregate before
    # you shuffle"): c(w1,·) == sum over bigrams starting with w1 of
    # c(w1,w2) — exactly, since every bigram occurrence contributes one
    # context occurrence. One scan fewer, and the c1 aggregation now
    # shuffles the already-collapsed c2 rows, not raw bigrams.
    c1 = (
        c2.select(
            "_lang",
            F.split(F.col("_b"), " ", 2).getItem(0).alias("_w1"),
            "_c2",
        )
        .groupBy("_lang", "_w1")
        .agg(F.sum("_c2").cast("long").alias("_c1"))
    )
    vocab = (
        train.select("_lang", F.explode("_t").alias("_w"))
        .distinct()
        .groupBy("_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("_v"))
    )

    te = test.select("_lang", F.explode("_bg").alias("_b")).withColumn(
        "_w1", F.split(F.col("_b"), " ", 2).getItem(0)
    )
    scored = (
        te.join(c2, ["_lang", "_b"], "left")
        .join(c1, ["_lang", "_w1"], "left")
        .join(F.broadcast(vocab), "_lang")
        .select(
            "_lang",
            F.log(
                (F.coalesce(F.col("_c2"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(k) * F.col("_v"))
            ).alias("_lp"),
        )
    )
    return (
        scored.groupBy(F.col("_lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("_lp"), round_dp).alias("avg_logprob"),
            F.round(F.exp(-F.avg("_lp")), 2).alias("perplexity"),
        )
        .orderBy("lang")
    )


_CODE_SYMBOLS = "[{}()\\[\\];=<>]"
_CODE_KEYWORDS = (
    r"\b(def|return|class|import|function|var|const|lambda|void|struct)\b"
)


def code_symbol_ratio(col: Column | str) -> Column:
    """Share of characters that are code-structural symbols
    ({ } ( ) [ ] ; = < >) — near zero for prose, high for source code."""
    c = _c(col)
    stripped = F.regexp_replace(c, _CODE_SYMBOLS, "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    ).cast("double")


def code_keyword_hits(col: Column | str) -> Column:
    """Count of programming-keyword word matches (def/return/class/...)
    in the lowercased text."""
    return F.regexp_count(F.lower(_c(col)), F.lit(_CODE_KEYWORDS)).cast(
        "bigint"
    )


def code_likeness(col: Column | str) -> Column:
    """Deterministic [0,1] code-likeness score: 60% saturated symbol
    density + 40% saturated keyword density — the cheap filter a corpus
    pipeline uses to route documents to a code-vs-prose pipeline (or to
    cap code share in a training mixture). Pure Column expressions:
    runs inside the scan stage, zero extra shuffles."""
    c = _c(col)
    sym = F.least(code_symbol_ratio(c) * 12.5, F.lit(1.0))  # saturates at 8%
    kw = F.least(code_keyword_hits(c).cast("double") / 3.0, F.lit(1.0))
    return F.round(sym * 0.6 + kw * 0.4, 6)


#: Engine-portable character classes for unicode_quality: RE2 (DuckDB) and
#: Java regex (Spark) agree on explicit ranges; \s is avoided because the
#: two engines disagree on vertical tab membership.
_CTRL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_NON_ASCII_CLASS = "[^\\x00-\\x7f]"
_WS_CLASS = "[ \\t\\n\\r\\f]"


def _count_class(col: Column | str, cls: str) -> Column:
    """Occurrences of a 1-char regex class: length minus the stripped
    length — one vectorized regexp_replace, no explode."""
    c = _c(col)
    return (F.length(c) - F.length(F.regexp_replace(c, cls, ""))).cast("bigint")


def unicode_quality(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_dp: int = 6,
) -> DataFrame:
    """Per-group mojibake/garbage screen: average control-character count,
    non-ASCII ratio, U+FFFD replacement-character total, and whitespace
    ratio — the cheap first-pass filter that catches broken decodes,
    binary-in-text, and whitespace-stuffed spam before any model-based
    quality scorer runs.

    Scale shape: four vectorized regexp_replace length-diffs inside the
    scan (no explode, no UDF), one group aggregate. Character classes are
    spelled as explicit ranges so Java regex and RE2 count identically.

    Engine portability (verified, incl. NON-BMP input): Spark SQL's
    length() and regexp_replace() operate on CODE POINTS (UTF8String
    counts an astral char such as U+1F600 as ONE, length('a😀b') = 3),
    matching DuckDB's code-point LENGTH — so the ratios agree even on
    emoji-bearing documents; there is no UTF-16 code-unit mismatch at
    the SQL layer. (Only JVM java.lang.String.length inside a UDF would
    count code units — no UDFs here.)
    """
    t = _c(text_col)
    n = F.length(t).cast("double")
    per = docs.select(
        F.col(group_col).alias("grp"),
        _count_class(t, _CTRL_CLASS).alias("_ctrl"),
        (_count_class(t, _NON_ASCII_CLASS) / n).alias("_na"),
        _count_class(t, "\\ufffd").alias("_repl"),
        (_count_class(t, _WS_CLASS) / n).alias("_ws"),
    ).filter(n > 0)
    return (
        per.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("_ctrl") + 1e-9, round_dp).alias("avg_ctrl_chars"),
            F.round(F.avg("_na") + 1e-9, round_dp).alias("avg_non_ascii_ratio"),
            F.sum("_repl").cast("bigint").alias("n_replacement_chars"),
            F.round(F.avg("_ws") + 1e-9, round_dp).alias("avg_ws_ratio"),
        )
        .orderBy(group_col)
    )


#: Small fixed English stopword list shared by stopword_profile and its
#: oracle (kept tiny and explicit so the SQL twin inlines it verbatim).
STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)


def stopword_profile(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group stopword-token ratio against a fixed list — the language/
    register fingerprint (high for fluent English prose, near zero for
    code, tables, or other languages) used both as a quality gate and as
    a cheap feature for language ID.

    Scale shape: the per-document stop count is a map-side array filter
    over the token array (the stopword list is a literal — no join);
    totals are one group aggregate. Never explodes tokens.
    """
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    per = docs.select(
        F.col(group_col).alias("grp"),
        F.size(toks).cast("bigint").alias("_n"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(stop_arr, t))
        ).cast("bigint").alias("_stop"),
    ).filter(F.col("_n") > 0)
    return (
        per.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_n").cast("bigint").alias("n_tokens"),
            F.sum("_stop").cast("bigint").alias("n_stop_tokens"),
            F.round(F.sum("_stop") / F.sum("_n") + 1e-9, round_dp).alias(
                "stop_ratio"
            ),
        )
        .orderBy(group_col)
    )


def hapax_ratio(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_dp: int = 6,
) -> DataFrame:
    """Per-group hapax legomena share: the fraction of the group's
    vocabulary that occurs exactly once — high hapax = rich/long-tail
    text (or OCR noise), low = templated/boilerplate. The vocabulary-
    health companion to the Zipf/Heaps fits.

    Scale shape: explode once, one (group, token) count aggregate, one
    group rollup — two shuffles total, both on bounded-cardinality keys.
    """
    freq = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(text_col)).alias("_w"),
        )
        .groupBy("grp", "_w")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    return (
        freq.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum((F.col("_f") == 1).cast("bigint")).cast("bigint").alias("hapax"),
            F.round(
                F.sum((F.col("_f") == 1).cast("bigint"))
                / F.count(F.lit(1))
                + 1e-9,
                round_dp,
            ).alias("hapax_ratio"),
        )
        .orderBy(group_col)
    )


def ttr_stats(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    prefix_tokens: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group type-token ratio (distinct tokens / tokens) averaged over
    documents, plus the same over each document's first ``prefix_tokens``
    tokens — the length-controlled variant that makes TTR comparable
    across documents of different sizes (raw TTR falls with length).

    Scale shape: both ratios are map-side array expressions
    (array_distinct + slice) — no explode, one group aggregate.
    """
    toks = tokens(text_col)
    head = F.slice(toks, 1, prefix_tokens)
    per = docs.select(
        F.col(group_col).alias("grp"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("_ttr"),
        (F.size(F.array_distinct(head)) / F.size(head)).alias("_pttr"),
    ).filter(F.size(toks) > 0)
    return (
        per.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("_ttr") + 1e-9, round_dp).alias("avg_ttr"),
            F.round(F.avg("_pttr") + 1e-9, round_dp).alias(
                "avg_prefix_ttr"
            ),
        )
        .orderBy(group_col)
    )


# ---------------------------------------------------------------------------
# URL parsing / canonicalization (the C4-pipeline per-domain stage).
# ---------------------------------------------------------------------------

#: Query parameters stripped by canonicalization: tracking params that vary
#: per click without changing the resource (the C4/CommonCrawl recipe).
URL_TRACKING_PARAMS = ("utm_[a-z]+", "ref", "fbclid", "gclid")

#: Shared regexes — kept lookaround-free so Java regex (Spark) and RE2
#: (DuckDB) match identically.
_URL_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_URL_HOSTPORT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_URL_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
_URL_QUERY = r"\?([^#]*)"


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Parse a URL column into (scheme, host, port, registrable domain,
    path depth, query-param count, tracking-param flag) — the per-domain
    grouping keys and quality priors a web-corpus pipeline computes
    before any content heuristic (C4 groups by registrable domain;
    domain-level spam priors beat per-doc scores at the margin).

    Pure scan-side regexp_extract columns (no UDF, no shuffle); the
    registrable domain is the last-two-labels heuristic (a full public-
    suffix list is a broadcast-join lookup table away — the plumbing is
    identical, the label count is what changes).
    """
    u = F.col(url_col)
    hostport = F.regexp_extract(u, _URL_HOSTPORT, 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(u, _URL_PATH, 1)
    query = F.regexp_extract(u, _URL_QUERY, 1)
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    return df.select(
        "*",
        F.lower(F.regexp_extract(u, _URL_SCHEME, 1)).alias("scheme"),
        host.alias("host"),
        F.when(port != "", port.cast("int")).alias("port"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        (
            F.length(path) - F.length(F.regexp_replace(path, "/", ""))
        ).cast("int").alias("path_depth"),
        F.size(params).cast("int").alias("n_params"),
        F.exists(
            params, lambda p: p.rlike("^(" + "|".join(URL_TRACKING_PARAMS) + ")=")
        ).alias("has_tracking"),
    )


def url_canonical(url_col) -> Column:
    """Canonical form of a URL: lowercase scheme+host, default ports
    dropped (:80 http / :443 https), fragment dropped, tracking params
    removed, surviving params SORTED — so click-variant URLs of the same
    resource collapse to one dedup key. Pure column expression.
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME, 1))
    hostport = F.regexp_extract(u, _URL_HOSTPORT, 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(u, _URL_PATH, 1)
    query = F.regexp_extract(u, _URL_QUERY, 1)
    tracking = "^(" + "|".join(URL_TRACKING_PARAMS) + ")="
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(tracking),
        )
    )
    qs = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path != "", path).otherwise(F.lit("/")),
        qs,
    )


def char_ngram_topk(
    docs: DataFrame,
    n: int = 3,
    top: int = 10,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Top-k character n-grams per group — the language-ID feature
    extractor (char trigram profiles separate languages long before a
    model does) and the template-detector (a handful of trigrams
    dominating a source = boilerplate).

    Plan: n-grams explode scan-side from a position sequence (no UDF),
    collapse to (group, gram) counts map-side; top-k is a PARTITIONED
    rank window over the per-group count frame (bounded by distinct
    grams), ties -> gram asc.
    """
    t = F.lower(F.col(text_col))
    # let-bound (r12, util.hof_let): inlined, the lowercase ran once per
    # POSITION (O(len^2) per doc) — measured 3x on text_char_trigrams
    grams = hof_let(
        t,
        lambda s: F.transform(
            F.sequence(F.lit(1), F.length(s) - (n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    )
    c = (
        docs.filter(F.length(t) >= n)
        .select(F.col(group_col).alias("grp"), F.explode(grams).alias("gram"))
        .groupBy("grp", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    )
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            F.col("grp").alias(group_col), "rank", "gram", "n_occurrences"
        )
        .orderBy(group_col, "rank")
    )


def ql_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 100.0,
    k: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``k`` documents by Dirichlet-smoothed query likelihood —
    BM25's language-model sibling (Zhai & Lafferty):
    ``score(d) = sum_t ln((tf_td + mu * cf_t / T) / (dl + mu))``.
    The smoothing borrows from the corpus unigram model, so documents
    missing a term are penalized, never zeroed — the scorer of choice
    when query terms are rare.

    Same 100 TB shape as bm25_topk — NO posting shuffle: the |Q| tf
    counters + doc length compute scan-side from one let-bound token
    array; ONE 1-row global agg derives (cf_t, T) and broadcasts back;
    top-k is TakeOrderedAndProject. Every model input (tf, dl, cf, T) is
    an exact integer, so the log closed form is deterministic IEEE in
    any engine; 6 dp rounding, ties -> id asc.
    """
    qarr = F.array(*[F.lit(t) for t in query_terms])
    per_doc = F.element_at(
        F.transform(
            F.array(tokens(text_col)),
            lambda t: F.struct(
                F.size(t).alias("dl"),
                F.transform(
                    qarr, lambda q: F.size(F.filter(t, lambda tok: tok == q))
                ).alias("tfs"),
            ),
        ),
        1,
    )
    base = docs.select(F.col(id_col), per_doc.alias("_s")).select(
        F.col(id_col), F.col("_s.dl").alias("dl"), F.col("_s.tfs").alias("tfs")
    )
    stats = base.agg(
        F.sum("dl").cast("bigint").alias("tt"),
        *[
            F.sum(F.element_at("tfs", i + 1)).cast("bigint").alias(f"cf_{i}")
            for i in range(len(query_terms))
        ],
    )
    def term_score(i: int) -> Column:
        tf = F.element_at("tfs", i + 1).cast("double")
        cf = F.col(f"cf_{i}").cast("double")
        return F.log(
            (tf + F.lit(mu) * cf / F.col("tt").cast("double"))
            / (F.col("dl").cast("double") + F.lit(mu))
        )

    score = None
    for i in range(len(query_terms)):
        s = term_score(i)
        score = s if score is None else score + s
    return (
        base.join(F.broadcast(stats))
        .filter(F.col("dl") > 0)
        .select(
            F.col(id_col),
            F.round(score + 1e-9, round_dp).alias("ql_score"),
        )
        .orderBy(F.col("ql_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def shared_shingles_topk(
    docs: DataFrame,
    n: int = 5,
    top: int = 20,
    min_sources: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source boilerplate detector: ``n``-token shingles that appear
    in >= ``min_sources`` DISTINCT sources, ranked by source spread then
    total occurrences — the screen that finds license headers, navigation
    chrome, and template sentences BEFORE near-dup clustering (shared
    shingles across unrelated sources are boilerplate almost by
    definition; within-source repeats are just house style).

    Output: (shingle, n_sources, n_occurrences, n_docs), top-``top`` by
    (n_sources DESC, n_occurrences DESC, shingle ASC) — a total order.

    Plan: shingles explode scan-side from the token array (one slim
    (shingle, source, doc) stream), collapse to per-shingle counts with
    map-side combine; top-k is TakeOrderedAndProject. At 100 TB the
    posting shuffle is the unavoidable cost; everything else is bounded.
    """
    t = tokens(text_col)
    # let-bind the token array: without it the slice-per-position tree
    # re-splits the text once per shingle
    sh_bound = F.element_at(
        F.transform(
            F.array(t),
            lambda tt: F.transform(
                F.sequence(F.lit(1), F.size(tt) - (n - 1)),
                lambda i: F.array_join(F.slice(tt, i, n), " "),
            ),
        ),
        1,
    )
    rows = docs.filter(F.size(t) >= n).select(
        F.col(id_col).alias("_doc"),
        F.col(source_col).alias("_src"),
        F.explode(sh_bound).alias("shingle"),
    )
    agg = rows.groupBy("shingle").agg(
        F.countDistinct("_src").cast("bigint").alias("n_sources"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("_doc").cast("bigint").alias("n_docs"),
    )
    return (
        agg.filter(F.col("n_sources") >= min_sources)
        .orderBy(
            F.col("n_sources").desc(),
            F.col("n_occurrences").desc(),
            F.col("shingle").asc(),
        )
        .limit(top)
    )


def chao1_vocab(
    docs,
    text_col: str = "text",
    group_col: str = "source",
):
    """Chao1 vocabulary-richness estimate + Good-Turing unseen mass per
    group: from the per-group token-frequency spectrum, ``V`` observed
    types, ``f1``/``f2`` singleton/doubleton counts, the bias-corrected
    Chao1 lower bound on TRUE vocabulary size
    ``V + f1*(f1-1) / (2*(f2+1))``, and the Good-Turing estimate of the
    probability mass on UNSEEN types ``f1/N`` — the corpus-coverage
    readout that says whether a source is exhausted or still surfacing
    new vocabulary (a high unseen mass argues for collecting more data
    before freezing a tokenizer).

    Exactness: V, f1, f2, N are exact integers; the two estimates are
    one closed-form double each — drift-proof under any partitioning.

    Plan: one token explode + two keyed aggregations (map-side combined),
    nothing wider than (group, token); no windows, no driver loops.
    """
    t = tokens(text_col)
    tok = docs.select(
        F.col(group_col).alias("g"), F.explode(t).alias("tok")
    ).filter(F.col("tok") != "")
    freq = tok.groupBy("g", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    spec = freq.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    f1d = F.col("f1").cast("double")
    return spec.select(
        F.col("g").alias(group_col),
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        F.round(
            F.col("vocab").cast("double")
            + (f1d * (f1d - 1.0)) / (2.0 * (F.col("f2").cast("double") + 1.0))
            + 1e-9,
            4,
        ).alias("chao1_est"),
        F.round(
            f1d / F.col("n_tokens").cast("double") + 1e-9, 6
        ).alias("gt_unseen_mass"),
    ).orderBy(group_col)


def burrows_delta(
    docs,
    top_m: int = 30,
    text_col: str = "text",
    group_col: str = "source",
    round_dp: int = 4,
):
    """Burrows' Delta stylometric distance between every pair of groups:
    over the ``top_m`` globally most-frequent tokens, z-score each
    group's relative token frequency against the across-group
    mean/population-std, then Delta(a, b) = mean absolute z difference —
    the classic authorship/style screen (two "sources" with near-zero
    Delta are the same template farm wearing different domains).

    Drift-proofing: counts and totals are exact integers; every float
    reduction over groups or tokens is a FIXED-ORDER fold over an
    array_sort'ed struct list (group asc / token asc), so both engines
    execute bit-identical IEEE sequences (the brown_double_ewma recipe).

    Plan: token counts (one shuffle), a broadcast-sized top-m frame, a
    #groups x top_m grid, per-token folds, then a pairs^2/2 join over
    #groups rows — everything after the first aggregate is
    frame-bounded.
    """
    t = tokens(text_col)
    tok = docs.select(
        F.col(group_col).alias("g"), F.explode(t).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("g", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = cnt.groupBy("g").agg(F.sum("c").cast("bigint").alias("n"))
    top = (
        cnt.groupBy("tok")
        .agg(F.sum("c").cast("bigint").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("tok").asc())
        .limit(top_m)
        .select("tok")
    )
    grid = totals.select("g", "n").crossJoin(F.broadcast(top))
    f = grid.join(cnt, ["g", "tok"], "left").select(
        "g",
        "tok",
        (
            F.coalesce(F.col("c"), F.lit(0)).cast("double")
            / F.col("n").cast("double")
        ).alias("f"),
    )
    lst = F.array_sort(
        F.collect_list(F.struct(F.col("g").alias("g"), F.col("f").alias("f")))
    )
    per_tok = f.groupBy("tok").agg(lst.alias("_l"))
    s_cnt = F.size("_l").cast("double")
    mean = (
        F.aggregate("_l", F.lit(0.0), lambda a, s: a + s["f"]) / s_cnt
    )
    per_tok = per_tok.select("tok", "_l", mean.alias("_m"))
    var = (
        F.aggregate(
            "_l",
            F.lit(0.0),
            lambda a, s: a + (s["f"] - F.col("_m")) * (s["f"] - F.col("_m")),
        )
        / s_cnt
    )
    per_tok = per_tok.select("tok", "_l", "_m", F.sqrt(var).alias("_sd"))
    z = (
        per_tok.filter(F.col("_sd") > 0)
        .select("tok", "_m", "_sd", F.explode("_l").alias("s"))
        .select(
            "tok",
            F.col("s.g").alias("g"),
            ((F.col("s.f") - F.col("_m")) / F.col("_sd")).alias("z"),
        )
    )
    za = z.select(
        F.col("tok"), F.col("g").alias("ga"), F.col("z").alias("za")
    )
    zb = z.select(
        F.col("tok").alias("tok2"),
        F.col("g").alias("gb"),
        F.col("z").alias("zb"),
    )
    pairs = za.join(
        zb, (F.col("tok") == F.col("tok2")) & (F.col("ga") < F.col("gb"))
    ).select(
        "ga",
        "gb",
        "tok",
        F.abs(F.col("za") - F.col("zb")).alias("ad"),
    )
    plst = F.array_sort(
        F.collect_list(
            F.struct(F.col("tok").alias("tok"), F.col("ad").alias("ad"))
        )
    )
    agg = pairs.groupBy("ga", "gb").agg(plst.alias("_p"))
    total = F.aggregate("_p", F.lit(0.0), lambda a, s: a + s["ad"])
    return agg.select(
        F.col("ga").alias("source_a"),
        F.col("gb").alias("source_b"),
        F.size("_p").cast("bigint").alias("n_tokens_used"),
        F.round(total / F.size("_p").cast("double") + 1e-9, round_dp).alias(
            "delta"
        ),
    ).orderBy("source_a", "source_b")


BPE_SEP = "␟"


def _bpe_apply_merge(s: "Column", a: str, b: str) -> "Column":
    """Apply ONE learned BPE merge (a, b) -> ab to a separator-joined
    symbol string with a left-to-right whole-symbol FOLD (a merge can
    never fire across symbol boundaries the way substring replace
    would). Shared by the training loop (:func:`bpe_merge_rounds`) and
    the apply-only fertility pass (:func:`bpe_fertility_by_group`);
    mirrors the DuckDB ``list_reduce`` in the oracles exactly.
    """
    S = BPE_SEP
    arr = F.split(s, S)
    sa, sb = F.lit(a), F.lit(b)
    return F.aggregate(
        arr,
        F.lit(""),
        lambda acc, x: F.when(
            (x == sb) & ((acc == sa) | acc.endswith(S + a)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(len(a))),
                F.lit(a + b),
            ),
        ).otherwise(
            F.when(acc == "", x).otherwise(F.concat(acc, F.lit(S), x))
        ),
    )


def bpe_merge_rounds(
    docs, text_col: str = "text", n_merges: int = 5
):
    """Learn-and-apply ``n_merges`` BPE merge rounds over the corpus and
    report each round's chosen merge plus the total symbol count after
    applying it — the train->apply loop of the tokenizer family
    (:func:`bpe_pair_counts` is one round's counting kernel; this runs
    the actual greedy iteration).

    The textbook formulation: the corpus first collapses to the DISTINCT
    word table with frequencies (one aggregate — the only data-sized
    pass), and every round then runs over the model-sized vocabulary
    with frequency-weighted pair counts. Symbol totals, merge choices
    and supports are IDENTICAL to the per-occurrence formulation (count
    of pair p = sum of f(word) * occurrences-in-word), but each round
    costs a vocab-sized job instead of a corpus-sized one — at 100 TB
    the vocabulary is the compressible object, the corpus is not.

    Each round: (1) frequency-weighted adjacent-pair counts over the
    vocab, (2) argmax pair (count DESC, pair ASC — the deterministic
    greedy rule; a 1-row driver collect, the train_centroids
    model-state pattern), (3) the merge applied with a left-to-right
    non-overlapping FOLD over each word's symbol array (``F.aggregate``
    with a string accumulator — whole-symbol comparisons, so a merge
    can never fire across symbol boundaries the way a plain substring
    replace would). Words are ␟-separated symbol strings; symbols never
    contain the separator.

    Exactness: pair counts and symbol totals are integers; the argmax
    tie-break is a binary string compare; the fold is the identical
    sequential recurrence in both engines (DuckDB ``list_reduce``) — the
    whole trajectory is a pure function of the corpus.

    Returns an ``n_merges``-row literal frame (round, merge_a, merge_b,
    n_pair, total_symbols) — all stats cross the driver as model state,
    the corpus never does.
    """
    from pyspark.sql import functions as F

    S = BPE_SEP
    spark = docs.sparkSession
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") >= 1)
    vocab = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    cur = vocab.select(F.array_join(chars, S).alias("s"), "f").persist()
    rows = []
    try:
        for r in range(1, n_merges + 1):
            arr = F.split(F.col("s"), S)
            # let-bound (r12, util.hof_let): inlined, the symbol-string
            # re-splits once per adjacent pair (O(len^2) per word-form)
            pair_list = hof_let(
                arr,
                lambda a: F.transform(
                    F.sequence(F.lit(1), F.size(a) - 1),
                    lambda i: F.concat(
                        F.element_at(a, i), F.lit(S), F.element_at(a, i + 1)
                    ),
                ),
            )
            top = (
                cur.filter(F.size(arr) >= 2)
                .select(F.explode(pair_list).alias("p"), "f")
                .groupBy("p")
                .agg(F.sum("f").cast("bigint").alias("n"))
                .orderBy(F.desc("n"), "p")
                .limit(1)
                .collect()
            )
            if not top:
                break
            p, n_pair = top[0]["p"], int(top[0]["n"])
            a, b = p.split(S)
            merged = _bpe_apply_merge(F.col("s"), a, b)
            nxt = cur.select(merged.alias("s"), "f").persist()
            try:
                total = nxt.agg(
                    F.sum(F.col("f") * F.size(F.split(F.col("s"), S)))
                    .cast("bigint")
                    .alias("t")
                ).collect()[0]["t"]
            except Exception:
                # cur is still the finally-covered frame; release nxt here
                # so a mid-round failure cannot leak its cached blocks
                nxt.unpersist()
                raise
            cur.unpersist()
            cur = nxt
            rows.append((r, a, b, n_pair, int(total)))
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        rows,
        "round int, merge_a string, merge_b string, "
        "n_pair bigint, total_symbols bigint",
    )


def bpe_fertility_by_group(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    n_merges: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Tokenizer fertility / compression table per group (VERDICT r9
    #2b): after learning ``n_merges`` BPE merges on the WHOLE corpus
    (:func:`bpe_merge_rounds` — the merge table is model state), apply
    them and report, per (lang, source)-style group: docs, whitespace
    words, BPE symbols, text bytes, fertility = symbols per word, and
    bytes per symbol (the compression ratio). The readout a mixture
    planner uses to convert per-source byte budgets into token budgets
    — a feed with fertility 1.8 costs 1.8x the sequence length of a
    fertility-1.1 feed for the same word count.

    Scale shape: merges are learned once (5-row collect); the APPLY
    pass never touches per-document state — symbol counts are computed
    per UNIQUE WORD (the vocab frame, exactly one fold per word no
    matter how often it repeats) and joined back to the slim
    (group, word) occurrence stream; the byte/doc side is one scan
    aggregate. Exact integers everywhere; the two ratios are single
    divisions per output row.
    """
    spark = docs.sparkSession  # noqa: F841  (parity with sibling ops)
    merges = [
        (r["merge_a"], r["merge_b"])
        for r in bpe_merge_rounds(docs, text_col, n_merges=n_merges)
        .orderBy("round")
        .collect()
    ]
    words = docs.select(
        *group_cols, F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") >= 1)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    s = F.array_join(chars, BPE_SEP)
    for a, b in merges:
        s = _bpe_apply_merge(s, a, b)
    vocab = words.select("w").distinct().select(
        "w", F.size(F.split(s, BPE_SEP)).cast("bigint").alias("_syms")
    )
    per_words = words.join(vocab, "w").groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("_syms").cast("bigint").alias("n_symbols"),
    )
    per_docs = docs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.octet_length(text_col)).cast("bigint").alias("n_bytes"),
    )
    return (
        per_docs.join(per_words, list(group_cols))
        .select(
            *group_cols,
            "n_docs",
            "n_words",
            "n_symbols",
            "n_bytes",
            F.round(
                F.col("n_symbols").cast("double") / F.col("n_words") + 1e-9,
                round_dp,
            ).alias("fertility"),
            F.round(
                F.col("n_bytes").cast("double") / F.col("n_symbols") + 1e-9,
                round_dp,
            ).alias("bytes_per_symbol"),
        )
        .orderBy(*group_cols)
    )
