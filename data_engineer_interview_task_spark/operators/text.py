"""Text-analysis operators over ``documents`` (SURVEY.md §2.8): quality
scoring, token counting, language-ID heuristic, fingerprinting. All pure
column expressions (whole-stage codegen; no Python in the hot path), each
with an ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table

#: tiny deterministic stopword list for quality scoring
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")

#: language marker words for the n-gram/lexicon heuristic. The testdata text
#: is synthetic English-vocabulary word salad, so markers are chosen from
#: that vocabulary purely to make the heuristic deterministic and testable.
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("en", "the"),
    ("es", "el"),
    ("de", "der"),
    ("fr", "le"),
)


def _tokens(text_col):
    return F.split(text_col, " ")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: char/token counts, distinct-token
    ratio (repetitiveness), mean token length, stopword ratio. These are
    the standard cheap quality filters for pretraining corpora; each is a
    single pass over the tokens array — narrow, no shuffle at all."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", _tokens(F.col("text"))
    )
    toks = F.col("toks")
    n_toks = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    total_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        # raw IEEE divisions of exact integers — bit-identical across
        # engines, unlike round(), whose half-case handling can differ
        (n_distinct.cast("double") / n_toks).alias("distinct_ratio"),
        (total_tok_len.cast("double") / n_toks).alias("avg_token_len"),
        (stop_hits.cast("double") / n_toks).alias("stopword_ratio"),
    )


def token_counts(spark: SparkSession, sf_dir: str, min_count: int = 1) -> DataFrame:
    """Corpus-level token frequency: explode -> hash-aggregate. The
    classic vocabulary-building pass; partial aggregation makes the
    exchange carry one row per (partition, token), so at 100 TB the
    shuffle is bounded by vocabulary size x partitions, not corpus size."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, pick the
    max (ties broken by marker order, 'en' first; no hits -> 'und').
    A lexicon-profile classifier as a CASE-expression cascade — the shape
    of real n-gram lang-ID (score profiles, argmax), kept SQL-expressible."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", _tokens(F.col("text"))
    )
    toks = F.col("toks")

    def marker_hits(marker: str):
        # NB: the lambda must be unary — a second parameter would be bound
        # to the array index by F.filter's (element, index) overload.
        return F.size(F.filter(toks, lambda t: t == F.lit(marker)))

    scores = {lang: marker_hits(marker) for lang, marker in LANG_MARKERS}
    best = None
    for lang, _ in LANG_MARKERS:
        cond = scores[lang] > 0
        for other, _ in LANG_MARKERS:
            if other == lang:
                break
            cond = cond & (scores[lang] > scores[other])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    pred = best.otherwise("und")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
    )


def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION MATRIX of the language-ID heuristic against the
    declared label — the classifier-evaluation rollup every lang-ID
    deployment tracks per corpus slice: (labeled, predicted) counts
    plus each cell's share of its labeled row in exact fixed point.
    Composes :func:`lang_id`; the oracle composes its SQL verbatim, so
    the whole evaluation is hash-pinned to the classifier under test."""
    pred = lang_id(spark, sf_dir)
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = pred.groupBy("labeled_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_labeled")
    )
    return cells.join(F.broadcast(totals), "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        "n",
        "n_labeled",
        F.expr("n * 1000 DIV n_labeled").cast("long").alias("share_millis"),
    )


def hashed_tf_features(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> DataFrame:
    """FEATURE HASHING (the hashing-trick vectorizer): every token maps
    to ``md5(token) mod n_buckets`` and each document's feature vector
    is the per-bucket term frequency — the fixed-width, vocab-free text
    featurization classical ML pipelines feed to linear models. Long
    format (doc_id, bucket, tf) so the output is engine-comparable
    (wide arrays would hash differently); the md5 bucket fold is the
    repo's engine-independent hash convention, so even the collisions
    are bit-identical. One explode + one partial-aggregated shuffle."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = docs.select(
        "doc_id", F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    bucket = F.expr(
        f"CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
        f" % {n_buckets}"
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def term_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF building blocks as exact integers: per token, document
    frequency (distinct docs containing it) and total term frequency.
    The idf itself (a log) is left to the caller: log implementations can
    differ at the ULP level across engines, but these integer inputs are
    exact everywhere. One explode + one aggregation."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    return pairs.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )


def salted_token_counts(spark: SparkSession, sf_dir: str, n_salts: int = 16) -> DataFrame:
    """Token frequency via explicit two-phase SALTED aggregation — the
    skew-mitigation pattern for hot keys: phase 1 groups on (salt, token)
    so one hot token spreads over ``n_salts`` reducers, phase 2 merges the
    partials. The result is IDENTICAL to the direct aggregation (the
    DuckDB oracle is the plain GROUP BY), only the physical distribution
    changes. Spark's own partial aggregation handles mild skew already;
    explicit salting is for keys so hot a single final-phase reducer
    would still choke — and the same trick applies to skewed JOIN keys."""
    docs = read_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    salted = tokens.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    )
    partial = salted.groupBy("salt", "token").agg(
        F.count(F.lit(1)).alias("partial_n")
    )
    return partial.groupBy("token").agg(F.sum("partial_n").alias("n"))


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass of a cleaning pipeline: lowercase, strip
    non-alphanumerics (keeping spaces), collapse whitespace, trim — plus
    the char counts before/after (the cheap "how much was junk" signal)."""
    docs = read_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""), r" +", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed keep/drop decision over the quality features — the shape of
    a production pretraining filter: explicit per-rule booleans (for audit
    counts) plus the conjunction. Pure column logic over one pass."""
    q = text_quality(spark, sf_dir)
    rules = {
        "len_ok": (F.col("n_tokens") >= 20) & (F.col("n_chars") <= 10_000),
        "diversity_ok": F.col("distinct_ratio") >= 0.45,
        "stopwords_ok": F.col("stopword_ratio") <= 0.5,
    }
    out = q.select(
        "doc_id", *[expr.alias(name) for name, expr in rules.items()]
    )
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (the budget-estimation pass of a training
    pipeline): whitespace tokens and a BPE-ish regex segmentation
    (letter-runs / digit-runs / single punctuation — the shape of GPT-style
    pre-tokenization), plus chars-per-token. Pure regexp column work."""
    docs = read_table(spark, sf_dir, "documents")
    bpe_pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    ws = F.size(F.split("text", " "))
    # idx=0 = whole match (Spark defaults to capture group 1)
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(bpe_pat), 0))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
        (F.length("text").cast("double") / bpe).alias("chars_per_token"),
    )


def chargram_minhash(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    bottom: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Rolling-hash document fingerprint, winnowing-style: hash every
    ``k``-char gram and keep the ``bottom`` smallest hashes as the
    document's sketch. Bottom-k sketches are the order-independent
    fingerprint family behind content-defined dedup: near-identical docs
    share most of their smallest gram hashes.

    ``hash_family``: "md5" (default) is cross-engine deterministic —
    lexicographically-smallest hex strings, DuckDB-oracle-checked.
    "xxhash64" is the production family (JVM long hashes, numeric
    bottom-k) — 2-4x cheaper on the hash step but engine-specific, so
    it's sketch-overlap-tested against the md5 twin instead.

    Gram extraction uses one regexp with a lookahead-free trick: positions
    come from a (doc x offset) explode of substring — all codegen'd.

    Served from the process artifact store (one build per
    (sf_dir, k, bottom, hash_family)): bottom-k sketches are a persisted
    fingerprint column in a deployed pipeline, scanned — not re-hashed —
    by every consumer."""
    from ..plans.artifacts import materialized

    return materialized(
        spark,
        ("chargram_minhash", sf_dir, k, bottom, hash_family),
        "chargram_sketch_",
        lambda: _chargram_minhash_build(spark, sf_dir, k, bottom, hash_family),
        inputs=(f"{sf_dir}/documents.parquet",),
    )


def _chargram_minhash_build(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    bottom: int,
    hash_family: str,
) -> DataFrame:
    # repartition: the one-split documents file would otherwise run the
    # whole (doc x offset) explode + hash on a single task (SCALE.md)
    docs = read_table(spark, sf_dir, "documents").repartition("doc_id")
    # explode positions FIRST, then substring+hash as ordinary projections:
    # inside a transform() lambda they run interpreted (~7x slower measured
    # at sf0.1); as post-explode projections they stay in codegen
    positions = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1)))
        ).alias("i"),
    )
    gram = F.expr(f"substring(text, i, {k})")
    if hash_family == "xxhash64":
        hashed = positions.select("doc_id", F.xxhash64(gram).alias("h"))
    elif hash_family == "md5":
        hashed = positions.select("doc_id", F.md5(gram).alias("h"))
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    # ONE aggregation: collect_set dedups per doc, sort, take the bottom-k
    # slice — vs distinct + ranking window, this drops a whole shuffle
    # (per-group state is bounded by grams-per-doc, fine for documents)
    return hashed.groupBy("doc_id").agg(
        F.concat_ws(
            "|", F.slice(F.sort_array(F.collect_set("h")), 1, bottom)
        ).alias("sketch")
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: md5 over whitespace-normalized
    lowercase text (cross-engine stable), plus a 16-hex-digit prefix as a
    compact 64-bit-equivalent key. The dedup-blocking fingerprint pass."""
    docs = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 16).alias("fingerprint64"),
    )


def doc_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality surrogate with EXACT arithmetic: per document,
    the mean corpus frequency of its tokens (how 'common' its vocabulary
    is — the integer-domain cousin of unigram log-likelihood, whose log()
    is ULP-unsafe across engines). Two aggregations: corpus token
    frequencies (vocabulary-bounded shuffle), then a broadcast join of the
    frequency table onto the exploded tokens and a per-doc mean of exact
    integers. At 100 TB the frequency table is Zipf-bounded (vocab ~1e7)
    and still broadcastable; if not, it's a plain shuffle join on token."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    freqs = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        toks.join(F.broadcast(freqs), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("total_freq"),
            (F.sum("freq").cast("double") / F.count(F.lit(1))).alias(
                "mean_token_freq"
            ),
        )
    )


def chunk_documents(
    spark: SparkSession, sf_dir: str, chunk_size: int = 64, stride: int = 48
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step of a
    pretraining pipeline (split each document's token stream into
    ``chunk_size``-token windows every ``stride`` tokens; overlap =
    chunk_size - stride preserves cross-boundary context).

    Shape: one narrow map-side fan-out — ``sequence`` of start offsets ->
    explode -> ``slice`` + ``concat_ws``. NO shuffle at any scale: each
    input row produces ceil(n/stride) output rows in place, so 100 TB
    chunks with scan parallelism. The tokens array is materialized as a
    column BEFORE the explode (lambda-CSE rule), and chunk_id is
    start/stride so ids are stable under any partitioning."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", _tokens(F.col("text"))
    )
    n = F.size("toks")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        docs.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("int").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_size), F.size("toks") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
        )
    )


def vocab_coverage(
    spark: SparkSession, sf_dir: str, vocab_size: int = 500
) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-``vocab_size`` corpus
    vocabulary (frequency-ranked, total tie-break count DESC then token
    ASC) and report each document's out-of-vocabulary token rate — the
    metric that decides whether a tokenizer's vocab fits a new corpus.

    Scale shape: the vocabulary top-k is a TakeOrderedAndProject
    (orderBy + limit) over the token-aggregate table — each partition
    keeps its own top ``vocab_size`` under the total tie-break
    (count DESC, token ASC) and only those merge, so there is NO
    single-task global sort even at web-scale vocabularies (billions of
    distinct tokens, Heaps-sublinear but unbounded — VERDICT r8 item 1;
    the old global row_number window was the last top-k of that shape).
    The per-doc pass then BROADCASTS the vocab (a few MB) into a
    map-side left join — one exchange total (the token count), never a
    corpus-sized shuffle."""
    toks = (
        read_table(spark, sf_dir, "documents")
        .withColumn("toks", _tokens(F.col("text")))
        .select("doc_id", F.explode("toks").alias("tok"))
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0))).alias("n_in_vocab"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.col("n_in_vocab")).alias("n_oov"),
        # raw IEEE division of exact integers (cross-engine bit-identical)
        (
            (F.col("n_tokens") - F.col("n_in_vocab")).cast("double")
            / F.col("n_tokens")
        ).alias("oov_rate"),
    )


def heavy_hitters_per_source(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Top-``k`` most frequent tokens per document source — grouped heavy
    hitters, the per-slice summary a corpus dashboard shows. Exact, not
    sketched: the (source, token) aggregate is vocabulary-bounded per
    source, so the rank window partitions by source over small groups.
    At 100 TB the first groupBy does map-side partial aggregation (token
    diversity ≪ rows), one bounded exchange; total tie-break (count DESC,
    token ASC) keeps ranks deterministic at any parallelism."""
    from pyspark.sql import Window

    toks = (
        read_table(spark, sf_dir, "documents")
        .withColumn("toks", _tokens(F.col("text")))
        .select("source", F.explode("toks").alias("tok"))
    )
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("source", F.col("rk").cast("int").alias("rk"), "tok", "cnt")
    )


def quality_score_model(
    spark: SparkSession, sf_dir: str, threshold: float = 1.5
) -> DataFrame:
    """Model scoring at corpus scale: a (tiny, broadcast-in-the-plan)
    linear quality model applied as pure column arithmetic — the
    classifier-filter stage every pretraining pipeline runs after
    heuristic cleaning, here with literal weights standing in for a
    trained model's coefficients.

    Deterministic-by-construction: features are integer counts and one
    exact ratio, the score is a fixed-association double expression with
    NO transcendentals (log/exp differ in the last ulp across libm
    implementations; polynomial scoring does not), so the oracle
    hash-matches bit-for-bit. SCALE: map-only — no shuffle, whole-stage
    codegen end to end; at 100 TB swap the literal weights for a
    broadcast coefficients row without changing the plan shape."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("x_chars"),
        F.size(toks).cast("double").alias("x_toks"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("x_ttr"),  # type-token ratio (lexical diversity)
    )
    score = (
        F.lit(0.001) * F.col("x_chars")
        + F.lit(0.01) * F.col("x_toks")
        + F.lit(2.0) * F.col("x_ttr")
    )
    return d.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= F.lit(threshold)).alias("keep"),
    )


def count_min_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    depth: int = 4,
    width: int = 256,
    top: int = 20,
) -> DataFrame:
    """Count-Min sketch token-frequency estimation — the bounded-memory
    heavy-hitter family member beside HLL (distinct), KLL (quantiles)
    and MinHash (similarity): a depth x width counter matrix replaces
    the full token dictionary, with one-sided error (estimate >= truth,
    overshoot <= corpus_tokens/width per row w.h.p., min over depth rows
    tightens it). This is the `vocab_coverage` docstring's prescription
    for when the key space itself explodes (n-gram hitters): sketch size
    is FIXED regardless of vocabulary.

    Implementation is pure DataFrame aggregation: each token explodes
    into ``depth`` (row, md5-bucket) cells, one groupBy builds the
    matrix (depth x width rows — aggregate-sized), and the estimate for
    a candidate token is the MIN over its depth cells via a broadcast
    join. md5-derived buckets make the whole sketch engine-neutral, so
    the approximate structure is EXACTLY oracle-checkable — emitted next
    to true counts so the one-sided error is visible (and tested:
    estimate >= truth always).

    At 100 TB: the token stream is never shuffled by token for the
    sketch — the exchange carries depth x width partial counters per
    partition. The true-count column here exists for the harness; a
    production user queries the sketch alone."""
    docs = read_table(spark, sf_dir, "documents")
    tokens = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    # ONE md5 per token supplies all `depth` hash rows: its 32 hex digits
    # are four independent 8-digit u32 slices (d-th row reads digits
    # [8d+1, 8d+8]) — 4x less hashing than a per-row md5(d:token), the
    # standard slice-one-digest construction for small depth. r13: the
    # digest is MATERIALIZED in its own projection BEFORE the depth
    # explode — inlined, `md5(token)` re-evaluated per exploded row
    # (depth x per token; Spark does no CSE across generated rows — the
    # r12 lambda-dot lesson), which the old form silently paid.
    assert depth <= 4, "one 128-bit md5 yields at most four u32 slices"
    rows = F.array(*[F.lit(i) for i in range(depth)])
    bucket = (
        F.conv(
            F.expr("substring(h, d * 8 + 1, 8)"), 16, 10
        ).cast("long")
        % width
    )
    cells = (
        tokens.select(F.md5("token").alias("h"))
        .withColumn("d", F.explode(rows))
        .groupBy("d", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    true_counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n_true"))
    cands = true_counts.orderBy(
        F.col("n_true").desc(), F.col("token").asc()
    ).limit(top)
    probes = (
        cands.select("token", "n_true", F.md5("token").alias("h"))
        .withColumn("d", F.explode(rows))
        .select("token", "n_true", "d", bucket.alias("bucket"))
    )
    return (
        cells.join(F.broadcast(probes), ["d", "bucket"])
        .groupBy("token", "n_true")
        .agg(F.min("c").alias("n_est"))
        .select("token", "n_true", "n_est")
    )


def sparse_cosine_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_df: int = 20,
    min_cos: float = 0.5,
) -> DataFrame:
    """Sparse lexical cosine similarity pairs via an INVERTED INDEX —
    the token-space complement of the dense embedding near-dup family:
    documents are bag-of-words term-frequency vectors restricted to RARE
    tokens (document frequency <= ``max_df``), and candidate pairs are
    generated only where two docs share an indexed token.

    Terms are word BIGRAMS, not unigrams — at web scale (and in this
    corpus) the unigram vocabulary is stop-word-dense and the df cap
    would empty it; bigrams recover discriminative sparsity (916 terms
    vs 31 unigrams at sf0.01). The df cap is the same hot-key guard as
    ``max_shingle_df``: a stop-phrase-grade term would fan the index
    join out by its df² and carries no discriminative signal anyway, so
    the operator's DEFINED semantics are cosine in the capped-vocabulary
    subspace — both engines share that definition, making the oracle
    exact. Per-term join fan-out is bounded by ``max_df²``; everything
    else is map-side-combined leaf aggregates.

    Determinism: dot products and squared norms are exact BIGINTs; the
    emitted cosine is ``double(dot) / (sqrt(double(n2a)) *
    sqrt(double(n2b)))`` — correctly-rounded conversions and three IEEE
    ops, mirrored op-for-op in the oracle."""
    from pyspark.ml.feature import NGram

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    docs = NGram(n=2, inputCol="toks", outputCol="grams").transform(docs)
    tf = (
        docs.select("doc_id", F.explode("grams").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    rare = tf.join(
        df.filter(F.col("df") <= max_df).select("token"), "token"
    )
    norms = rare.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = rare.select(
        F.col("token"), F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a")
    )
    b = rare.select(
        F.col("token"), F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b")
    )
    dots = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2b"))
    cos = (
        F.col("dot").cast("double")
        / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double")))
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "dot", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cos)
    )


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase matching over a POSITIONAL inverted index: find
    every document containing the corpus's most frequent word bigram,
    with its per-doc occurrence count. Token positions come from
    ``posexplode``; adjacency is a self-equi-join on ``(doc_id, pos+1)``
    — co-partitioned by doc, so at 100 TB the join never crosses
    documents. The target phrase is selected IN-QUERY (count DESC,
    bigram ASC — total order) and broadcast, so the whole thing is one
    lineage with no side-channel parameter."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).filter(F.col("token") != "")
    a = toks.select("doc_id", F.col("pos").alias("p"), F.col("token").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("pos") - 1).alias("p"), F.col("token").alias("w2")
    )
    bi = a.join(b, ["doc_id", "p"]).select(
        "doc_id", F.concat_ws(" ", "w1", "w2").alias("bigram")
    )
    top = (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(1)
        .select("bigram")
    )
    return (
        bi.join(F.broadcast(top), "bigram")
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


def chunk_documents_udtf(
    spark: SparkSession, sf_dir: str, chunk_size: int = 64, stride: int = 48
) -> DataFrame:
    """Python UDTF twin of :func:`chunk_documents` — the LAST Spark-4
    Python extension API this repo exercises (next to mapInPandas /
    applyInPandas(WithState) / mapInArrow / the DataSource API): a
    user-defined TABLE function fanning each document row out to its
    sliding-window chunks via a SQL ``LATERAL`` join.

    Same contract rules as every Python seam here: the UDTF class is
    defined INSIDE this function so cloudpickle ships it BY VALUE and the
    Spark workers never import this package; parameters are captured as
    plain ints. Emits the exact rows of the JVM-side operator (identical
    chunk ids, text, token counts), so it SHARES chunk_documents' DuckDB
    oracle and an equality test pins the twins together. The JVM
    sequence/explode/slice form remains the production path (codegen, no
    Python workers); this is the extensibility seam for fan-outs that
    genuinely need Python (tokenizers, samplers)."""
    import uuid

    from pyspark.sql.functions import udtf

    cs, st = chunk_size, stride

    @udtf(returnType="chunk_id int, chunk_text string, n_tokens int")
    class _Chunker:
        def eval(self, text: str):
            toks = text.split(" ")
            n = len(toks)
            last = max(n - 1, 0)
            for start in range(0, last + 1, st):
                window = toks[start : start + cs]
                yield start // st, " ".join(window), min(cs, n - start)

    name = f"chunker_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(name, _Chunker)
    docs = read_table(spark, sf_dir, "documents")
    view = f"docs_{name}"
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_tokens
        FROM {view} AS d, LATERAL {name}(d.text) AS c
        """
    )
    return out


def bm25_doc_rank(
    spark: SparkSession, sf_dir: str, n_terms: int = 2, k: int = 20
) -> DataFrame:
    """BM25 relevance ranking, EXACT-RATIONAL form: top-``k`` documents
    for the corpus's ``n_terms`` highest-df tokens (selected IN-QUERY
    with a df DESC / token ASC total order, like ``phrase_search``'s
    bigram) — the retrieval-scoring member of the text family next to
    ``sparse_cosine_pairs`` (vector) and ``phrase_search`` (positional).

    Standard BM25 needs ``ln`` (idf) and float division (tf saturation)
    — neither is bit-stable across engines (JVM Math.log is not
    correctly rounded). This formulation replaces idf with its exact
    rational core ``(2N − 2df + 1)/(2df + 1)`` (the argument of the
    classic idf's ln — same ordering per term, no logarithm) and clears
    every denominator: with k1 = 6/5 and b = 3/4,

        tf_sat = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/L))
               = 44·tf·L / (20·tf·L + 6·L + 18·dl·N)

    so each term's score is ONE integer floor-division of exact
    DECIMAL(38,0)/HUGEINT products, scaled by 1e6:
    ``(1e6·44·tf·L·(2N−2df+1)) DIV ((20·tf·L+6·L+18·dl·N)·(2df+1))`` —
    bit-identical on any engine, overflow headroom to ~1e12 corpus
    tokens × 1e9 docs inside 38 digits.

    Plan: token explode reduces map-side to (doc, term) tfs against a
    BROADCAST 2-row term list; doc lengths and corpus totals are partial
    aggregates; the final top-k is TakeOrdered (score DESC, doc_id ASC
    total order), never a full sort."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    df_tab = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qterms = (
        df_tab.orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(n_terms)
        .select("token", "df")
    )
    tf = (
        toks.join(F.broadcast(qterms), "token")
        .groupBy("doc_id", "token", "df")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = tf.join(dl, "doc_id").crossJoin(F.broadcast(totals))
    num = (
        F.lit(1_000_000).cast("decimal(38,0)")
        * d38(F.lit(44) * F.col("tf"))
        * d38(F.col("total_len"))
        * d38(2 * F.col("n_docs") - 2 * F.col("df") + 1)
    )
    # every factor is cast to DECIMAL(38,0) BEFORE multiplying — the
    # BIGINT products 20·tf·L / 18·dl·N would wrap silently near 2^63
    # (~4.6e17 token-pairs, reachable at 100 TB) if formed pre-cast
    den = (
        d38(F.lit(20) * F.col("tf")) * d38(F.col("total_len"))
        + d38(F.lit(6)) * d38(F.col("total_len"))
        + d38(F.lit(18) * F.col("dl")) * d38(F.col("n_docs"))
    ) * d38(2 * F.col("df") + 1)
    scored = (
        joined.withColumn("num", num)
        .withColumn("den", den)
        .select("doc_id", F.expr("num DIV den").alias("term_fp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_fp").cast("long").alias("score_fp"))
        .orderBy(F.col("score_fp").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bigram_collocations(
    spark: SparkSession, sf_dir: str, k: int = 25, min_count: int = 5
) -> DataFrame:
    """Collocation mining: the ``k`` adjacent token pairs whose observed
    frequency most exceeds independence — PMI-style association ranked
    by the exact rational lift ``n_xy * N / (n_x * n_y)`` (the argument
    of PMI's log; log dropped exactly like ``bm25_doc_rank`` drops it —
    same ordering, no transcendental). The ranking key is ONE correctly
    -rounded IEEE division of exact BIGINTs — monotone rounding keeps
    the rational order, and (token_x, token_y) breaks any double-level
    tie identically on both engines.

    Plan: bigrams come from an index-transform over the materialized
    token array (single pass, codegen — no self-join on position);
    unigram and bigram counts are partial-aggregated; the three count
    tables meet in broadcast joins (vocabulary-sized); top-k is
    TakeOrdered, never a full sort."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = docs.select(
        "doc_id", F.explode(F.col("toks")).alias("token")
    ).filter(F.col("token") != "")
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    # adjacent pairs via one index transform over the token array
    bi = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS tx, toks[i] AS ty))"
                )
            ).alias("p")
        )
        .select(F.col("p.tx").alias("tx"), F.col("p.ty").alias("ty"))
        .filter((F.col("tx") != "") & (F.col("ty") != ""))
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    nx = uni.select(F.col("token").alias("tx"), F.col("n").alias("n_x"))
    ny = uni.select(F.col("token").alias("ty"), F.col("n").alias("n_y"))
    scored = (
        bi.join(F.broadcast(nx), "tx")
        .join(F.broadcast(ny), "ty")
        .crossJoin(F.broadcast(total))
        .select(
            "tx",
            "ty",
            "n_xy",
            "n_x",
            "n_y",
            (
                (F.col("n_xy") * F.col("n_total")).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("tx").asc(), F.col("ty").asc()
    ).limit(k)


def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources: Jaccard similarity
    of the distinct-token sets of every source pair — the corpus-mix
    diagnostic that tells a curation pass which sources are redundant
    vocabulary-wise. Exact integers (intersection / set sizes) plus one
    IEEE division for the emitted coefficient.

    Plan: one (source, token) DISTINCT pass over the corpus, then the
    pair intersection is a self-join ON TOKEN (vocabulary-sized — never
    a doc-level pair join), vocab sizes broadcast in. |sources| is
    assumed dashboard-small (pairs = s² rows); the token join is the
    part that scales with the corpus and it is linear in vocab."""
    st = (
        read_table(spark, sf_dir, "documents")
        .select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    a = st.select(F.col("source").alias("src_a"), "token")
    b = st.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    va = sizes.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    vb = sizes.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    return (
        inter.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            "vocab_a",
            "vocab_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def simpson_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity as the Gini-Simpson index
    ``1 - Σp_i²`` — the diversity metric that stays EXACT-rational where
    Shannon entropy's logs cannot be made bit-stable: with integer token
    counts, ``1 - Σn_i²/N² = (N² - Σn_i²)/N²`` is one IEEE division of
    exact integers. High index = diverse vocabulary use; a source
    collapsing toward one token drives it to 0 — the cheap template/spam
    source detector.

    Counts aggregate map-side per (source, token); products go through
    DECIMAL(38,0) before summation (BIGINT n² is safe to ~3e9
    occurrences of one token per source; the decimal ladder removes the
    ceiling), with BIGINT transport for the emitted sums."""
    toks = (
        read_table(spark, sf_dir, "documents")
        .select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    counts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_src = counts.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(d38(F.col("n")) * d38(F.col("n"))).cast("long").alias("sum_sq"),
    )
    n2 = d38(F.col("n_tokens")) * d38(F.col("n_tokens"))
    return per_src.select(
        "source",
        "n_tokens",
        "sum_sq",
        (
            (n2 - F.col("sum_sq")).cast("double") / n2.cast("double")
        ).alias("simpson"),
    )


def top_keywords_per_doc(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Keyword extraction: each document's ``k`` most tf-idf-distinctive
    tokens. The idf log is dropped for its exact rational core (ranking
    by ``tf/df`` — ``tf * N/df`` differs per doc only by the constant N,
    same order): the per-doc ranking key is one IEEE division of exact
    integers with a total (key DESC, token ASC) tie-break, so the
    extracted keyword set is bit-deterministic.

    Plan: one explode pass feeds both the (doc, token) tf counts and
    the document-frequency table; df broadcasts (vocabulary-sized); the
    per-doc top-k is a row_number window partitioned BY DOC — embarras-
    singly parallel, no global sort anywhere."""
    from pyspark.sql import Window

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df").cast("double")).desc(),
        F.col("token").asc(),
    )
    return (
        tf.join(F.broadcast(df_tab), "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "token", "tf", "df")
    )


def bigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LANGUAGE-MODEL QUALITY SCORING without a model: per-doc corpus
    bigram SURPRISAL — how "unexpected" a document's token transitions
    are under the corpus's own bigram statistics, the classic
    perplexity-style curation signal (boilerplate and templated text
    score low, garbled or off-distribution text scores high).

    EXACT integer formulation (the reason it is oracle-checkable where
    true log-prob scoring is not): the surprisal of bigram (a, b) is
    ``floor(log2 n(a·)) - floor(log2 n(a,b))`` — bit lengths via
    ``length(bin(x)) - 1``, the ``copurchase_degree_histogram``
    convention, so no float ever touches an integer boundary. Because
    ``n(a,b) <= n(a·)`` the per-bigram score is >= 0, and the doc score
    is a plain BIGINT sum; ``avg_millibits`` is the exact integer
    ``total * 1000 DIV n_bigrams``. This integer surprisal brackets the
    true -log2 P(b|a) within 1 bit on each side — rank-faithful for
    curation thresholds while staying hash-exact.

    Plan: bigrams come from one index-transform over the materialized
    token array (no position self-join); corpus bigram counts and the
    left-prefix totals are partial-aggregated; the doc-grain frame
    joins the vocabulary-sized score table on the bigram key (broadcast
    at this corpus, plain shuffle-hash at 100 TB — the key dictionary,
    never the corpus, is the small side). Docs with < 2 tokens have no
    bigrams and are absent by construction on both engines."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    bi_doc = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS tx, toks[i] AS ty))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.tx").alias("tx"), F.col("p.ty").alias("ty"))
        .filter((F.col("tx") != "") & (F.col("ty") != ""))
    )
    bi_cnt = bi_doc.groupBy("tx", "ty").agg(F.count(F.lit(1)).alias("n_xy"))
    prefix = bi_cnt.groupBy("tx").agg(F.sum("n_xy").alias("n_x"))
    vocab = bi_cnt.join(prefix, "tx").select(
        "tx",
        "ty",
        (
            (F.length(F.bin(F.col("n_x"))) - 1)
            - (F.length(F.bin(F.col("n_xy"))) - 1)
        )
        .cast("long")
        .alias("bits"),
    )
    return (
        bi_doc.join(vocab, ["tx", "ty"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "surprisal_bits",
            F.expr("surprisal_bits * 1000 DIV n_bigrams")
            .cast("long")
            .alias("avg_millibits"),
        )
    )


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """REAL BPE TOKENIZER TRAINING — the classic byte-pair-encoding loop
    (Sennrich et al.) over the corpus vocabulary: start from characters,
    repeatedly merge the most frequent adjacent symbol pair (frequency
    weighted by word count, ties broken (count DESC, left ASC, right
    ASC)), and emit the learned merge table — the artifact every LLM
    tokenizer ships. Output: one row per merge step
    ``(step, left, right, pair_count)``.

    EXACT CROSS-ENGINE ENCODING (what makes tokenizer training
    oracle-checkable): a word's symbolization is the string of wrapped
    units ``/s1//s2//.../`` — each symbol owns its surrounding slashes,
    so applying a merge is ONE literal left-to-right non-overlapping
    ``replace('/l//r/' -> '/lr/')``, which is exactly BPE's application
    convention, with no false matches across symbol boundaries (the
    leading '/' anchors a symbol start) and no separator-sharing bugs
    on runs (``/x//x//x//x/`` -> ``/xx//xx/``). Both engines have the
    same literal ``replace``; no regex subtleties cross the engine
    boundary. Words containing '/' are excluded by contract (mirrored
    in the oracle; none exist in this corpus).

    SCALE SHAPE: the only corpus-scale work is the word-frequency
    aggregate (map-side combined; Heaps' law makes the vocab sublinear
    in corpus size). The merge loop runs ``n_merges`` rounds over the
    VOCAB frame — per round one adjacent-pair explode + count and a
    1-row argmax collect (training metadata, the kcenter/Gonzalez
    pattern: BPE is inherently sequential in its merge order, the
    per-round work is what distributes). localCheckpoint after each
    application keeps the replace-lineage from nesting 8 deep.

    r13: the merge table is served from the TRAINED-TOKENIZER artifact
    (``_bpe_trained`` — trained at most once per (sf_dir, n_merges) per
    process, scanned by every consumer). A tokenizer's merge table is
    the canonical persisted model artifact: production trains once and
    ships the table; encode/fertility/packing all read it. Values are
    identical to the direct training (the artifact IS the training
    output; oracle-gated at all four corpora)."""
    return _bpe_trained(spark, sf_dir, n_merges)[1]


def _char_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency vocabulary for the char-level BPE trainer."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    return (
        docs.select(F.explode("toks").alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains("/")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _bpe_trained(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """(final vocab, merge table) for the char-level BPE trainer, both
    MATERIALIZED through the artifact store (keyed on the documents
    input fingerprint): the sequential training loop runs at most once
    per process per (sf_dir, n_merges); the vocab artifact feeds the
    encode/fertility joins, the merge artifact is the registered
    training output. A per-call dict memo makes the two builds share
    ONE training run even when both artifacts are cold."""
    from ..plans.artifacts import materialized

    doc_path = f"{sf_dir}/documents.parquet"
    trained: dict = {}

    def _train():
        if "r" not in trained:
            trained["r"] = _bpe_loop(_char_words(spark, sf_dir), n_merges)
        return trained["r"]

    vocab = materialized(
        spark,
        ("bpe_vocab", sf_dir, n_merges),
        "bpe_vocab_",
        lambda: _train()[0],
        inputs=(doc_path,),
    )
    merges = materialized(
        spark,
        ("bpe_merges", sf_dir, n_merges),
        "bpe_merges_",
        lambda: spark.createDataFrame(
            _train()[1],
            "step long, left string, right string, pair_count long",
        ),
        inputs=(doc_path,),
    )
    return vocab, merges


def _bpe_loop(words: DataFrame, n_merges: int):
    """The shared BPE training loop: returns (final vocab frame with
    (word, s, freq) where ``s`` is the wrapped-symbol string after all
    merges, merge list [(step, l, r, cnt)])."""
    # r12 opt: LAZY localCheckpoint — the next round's argmax collect
    # materializes the round's vocab in the SAME job, halving the
    # per-round job count of the training loop (lineage truncation is
    # identical; values are unchanged)
    cur = words.select(
        "word", F.regexp_replace("word", "(.)", "/$1/").alias("s"), "freq"
    ).localCheckpoint(eager=False)
    out: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = (
            cur.select(
                F.split(F.expr("trim(BOTH '/' FROM s)"), "//").alias(
                    "syms"
                ),
                "freq",
            )
            # fully-merged single-symbol words have no pairs; without
            # this guard Spark's sequence(1, 0) DESCENDS and fabricates
            # (sym, NULL) pairs (caught by the reference-BPE test)
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        out.append((step, l, r, cnt))
        cur = cur.select(
            "word",
            F.replace(
                F.col("s"), F.lit(f"/{l}//{r}/"), F.lit(f"/{l}{r}/")
            ).alias("s"),
            "freq",
        ).localCheckpoint(eager=False)
    return cur, out


def bpe_fertility_report(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """TOKENIZER FERTILITY audit per source — the first number anyone
    checks after training a tokenizer: how many BPE tokens per
    whitespace word (fertility) and how many UTF-8 bytes per BPE token
    (compression) each corpus slice pays. A source whose fertility is
    far above the corpus norm is the slice the vocab under-serves —
    the signal behind per-language vocab-budget decisions.

    Exact fixed-point ratios (``x * 1e6 DIV y``, both operands exact
    BIGINT sums), so the report hashes. One corpus-scale incidence
    frame; the trained vocab (``_bpe_loop``, Heaps-sublinear) joins it
    broadcast-sized; one aggregate to source grain."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    word_inc = docs.select(
        "doc_id", "source", F.explode("toks").alias("word")
    ).filter((F.col("word") != "") & (~F.col("word").contains("/")))
    vocab, _merges = _bpe_trained(spark, sf_dir, n_merges)
    sized = vocab.select(
        "word",
        F.size(F.split(F.expr("trim(BOTH '/' FROM s)"), "//"))
        .cast("long")
        .alias("n_syms"),
    )
    return (
        word_inc.join(F.broadcast(sized), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.sum(F.octet_length("word")).cast("long").alias("n_utf8_bytes"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            "n_utf8_bytes",
            F.expr("n_bpe_tokens * 1000000 DIV n_words")
            .cast("long")
            .alias("fertility_fp"),
            F.expr("n_utf8_bytes * 1000000 DIV n_bpe_tokens")
            .cast("long")
            .alias("bytes_per_token_fp"),
        )
    )


def benchmark_contamination_13gram(
    spark: SparkSession, sf_dir: str, n: int = 13, bench_mod: int = 31
) -> DataFrame:
    """BENCHMARK DECONTAMINATION audit — the GPT-3-style 13-gram overlap
    check every serious pretraining pipeline runs before training: a
    training document is CONTAMINATED if it shares any 13-token n-gram
    with the held-out benchmark set (here the deterministic eval slice
    ``doc_id % bench_mod == 0``). Emits one row per contaminated
    training doc with its distinct-13-gram count and how many of them
    hit the benchmark — the evidence sheet a decontamination pass
    filters on.

    Shape: both sides explode per-doc DISTINCT n-grams from the
    materialized token array (an index transform, no position
    self-join); the benchmark gram dictionary is the SMALL side by
    construction (the eval set is a fixed tiny fraction), so the probe
    join broadcasts it at any corpus scale; one aggregate back to doc
    grain. The n-gram string key is exact — no hashing, so no
    false-positive rate to argue about in the oracle."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    grams = docs.filter(F.size("toks") >= n).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}),"
                    f" i -> array_join(slice(toks, i, {n}), ' '))"
                )
            )
        ).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % bench_mod == 0)
        .select("gram")
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % bench_mod != 0)
    per_doc = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bench_hits"))
    )
    return hits.join(per_doc, "doc_id").select(
        "doc_id", "n_grams", "n_bench_hits"
    )


def unigram_entropy_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SOURCE unigram ENTROPY — the corpus-diversity diagnostic next
    to Gini-Simpson: the (integer-surprisal) Shannon entropy of each
    source's token distribution, ``H ~= sum_w c_w * (log2 N_s - log2
    c_w) / N_s``. Low entropy = templated/repetitive slice; the number
    curation dashboards track per ingest source.

    Same bit-length log2 convention as ``bigram_surprisal_score``
    (``length(bin(x)) - 1`` — no float near an integer boundary, each
    term brackets the true log2 within 1 bit), so the whole report is
    BIGINT-exact: ``total_bits = sum c_w * (bitlen(N_s) - bitlen(c_w))``
    and ``milli_bits_per_token = total_bits * 1000 DIV N_s``. Two
    partial-aggregated shuffles: corpus -> (source, word) counts ->
    source grain."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    wc = (
        docs.select("source", F.explode("toks").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = wc.groupBy("source").agg(F.sum("c").alias("n_tokens"))
    return (
        wc.join(F.broadcast(tot), "source")
        .select(
            "source",
            "n_tokens",
            (
                F.col("c")
                * (
                    (F.length(F.bin(F.col("n_tokens"))) - 1)
                    - (F.length(F.bin(F.col("c"))) - 1)
                )
            ).alias("bits"),
        )
        .groupBy("source")
        .agg(
            F.first("n_tokens").cast("long").alias("n_tokens"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
        .select(
            "source",
            "n_tokens",
            "total_bits",
            F.expr("total_bits * 1000 DIV n_tokens")
            .cast("long")
            .alias("milli_bits_per_token"),
        )
    )


def _greedy_noninteracting(rows, batch: int, rnd: int):
    """One BPE round's greedy NON-INTERACTING pick over the ordered
    pair-prefix ``rows`` (already sorted ``cnt DESC, l, r``): take up to
    ``batch`` pairs whose symbols are disjoint from every earlier pick's
    ``{l, r, l||r}``. ADVICE r11 guard: a FULL 4096-row prefix that still
    under-fills the batch means rows past the cap could have been picked
    — the capped scan would no longer replicate the uncapped selection
    rule — so raise a clear error instead of letting the divergence
    surface as a bare oracle hash mismatch downstream."""
    picked: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for r0 in rows:
        if len(picked) == batch:
            break
        if r0["l"] in used or r0["r"] in used:
            continue
        picked.append((r0["l"], r0["r"], int(r0["cnt"])))
        used.update({r0["l"], r0["r"], r0["l"] + r0["r"]})
    if len(rows) == 4096 and len(picked) < batch:
        raise RuntimeError(
            "bpe_train_merges_bytelevel: the top-4096 ordered-prefix cap"
            f" bound round {rnd}'s selection ({len(picked)}/{batch} picks"
            " from a full prefix); raise the cap for this vocabulary"
        )
    return picked


def bpe_train_merges_bytelevel(
    spark: SparkSession,
    sf_dir: str,
    n_rounds: int = 16,
    batch: int = 4,
) -> DataFrame:
    """BYTE-LEVEL BPE training with BATCHED merge rounds — the two
    production-shape increments over :func:`bpe_train_merges`
    (VERDICT r7 item 4):

    BYTE-LEVEL START: initial symbols are the word's UTF-8 BYTES as
    two-hex-digit units (``hex(word)`` wrapped per byte pair), the
    GPT-2 convention that needs no character exclusions at all — any
    word, any script, any separator character is trainable, because
    the symbol alphabet [0-9A-F] can never collide with the '/'
    wrapper. 64 merges here vs 8 in the char-level entry.

    BATCHED ROUNDS: per round the pair table is counted ONCE and up to
    ``batch`` NON-INTERACTING merges are picked greedily in
    (count DESC, l ASC, r ASC) order — a candidate is eligible iff
    neither of its symbols appears among any earlier pick's
    {l, r, l||r}. Disjointness makes every picked pair's count
    invariant under the other picks' applications, so the batch
    applies as ``batch`` chained literal replaces in rank order —
    cutting driver argmax round-trips 4x (16 rounds for 64 merges).
    This is a DOCUMENTED VARIANT of strictly-sequential BPE (sequential
    re-ranking could promote a pair overlapping the round's top pick);
    counts are measured at round start, applications chain in rank
    order, and the oracle replays the same selection rule and chain
    exactly, so the merge table is hash-pinned end to end.

    The per-round greedy scan collects only the ORDERED PREFIX of the
    pair table (top 4096 under the selection order ``cnt DESC, l, r`` —
    a TakeOrderedAndProject, never a full-table driver pull): the
    non-interacting filter consumes a few dozen rows per round in
    practice (``batch`` picks block at most ``3 * batch`` symbols), so
    the documented cap preserves the selection rule exactly while
    bounding the driver transfer even on a pathological vocabulary
    (VERDICT r10 advisory 1). A guard RAISES if the cap ever binds — a
    full 4096-row prefix that still under-fills the batch (ADVICE r11),
    so a binding cap is a clear error, never a silent hash divergence. Output: one row per merge
    ``(round, rk, left, right, pair_count)``.

    r13: served from the trained-tokenizer artifact like the char-level
    entry — the sequential training runs at most once per
    (sf_dir, n_rounds, batch) per process and the registered query
    scans the persisted merge table (values identical; oracle-gated at
    all four corpora)."""
    from ..plans.artifacts import materialized

    return materialized(
        spark,
        ("bpe_bl_merges", sf_dir, n_rounds, batch),
        "bpe_bl_merges_",
        lambda: _bytelevel_train(spark, sf_dir, n_rounds, batch),
        inputs=(f"{sf_dir}/documents.parquet",),
    )


def _bytelevel_train(
    spark: SparkSession, sf_dir: str, n_rounds: int, batch: int
) -> DataFrame:
    """The direct byte-level batched training loop — see
    :func:`bpe_train_merges_bytelevel` for semantics."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    words = (
        docs.select(F.explode("toks").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        "word",
        F.regexp_replace(F.hex(F.col("word")), "(..)", "/$1/").alias("s"),
        "freq",
    ).localCheckpoint(eager=False)
    out: list[tuple[int, int, str, str, int]] = []
    for rnd in range(1, n_rounds + 1):
        pairs = (
            cur.select(
                F.split(F.expr("trim(BOTH '/' FROM s)"), "//").alias("syms"),
                "freq",
            )
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        rows = sorted(
            pairs.orderBy(F.col("cnt").desc(), "l", "r")
            .limit(4096)
            .collect(),
            key=lambda r: (-r["cnt"], r["l"], r["r"]),
        )
        picked = _greedy_noninteracting(rows, batch, rnd)
        if not picked:
            break
        s_expr = F.col("s")
        for k, (l, r, cnt) in enumerate(picked, start=1):
            out.append((rnd, k, l, r, cnt))
            s_expr = F.replace(
                s_expr, F.lit(f"/{l}//{r}/"), F.lit(f"/{l}{r}/")
            )
        # r12 opt: lazy — materialized by the next round's top-4096
        # collect in the same job (see _bpe_loop)
        cur = cur.select("word", s_expr.alias("s"), "freq").localCheckpoint(eager=False)
    return spark.createDataFrame(
        out, "round long, rk long, left string, right string, pair_count long"
    )


def bpe_train_merges_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEEP byte-level BPE training (VERDICT r8 item 4): the 32-round /
    128-merge-capacity parameterization of
    :func:`bpe_train_merges_bytelevel`. On the driver corpus training
    EXHAUSTS first — round 23 fully merges every word (89 merges) and
    rounds past the fixed point pick nothing — so the entry pins BOTH
    the depth scaling and the exhaustion behavior. The batched
    non-interacting selection keeps the driver round count ~merges/4
    until the tail (89 merges in 23 rounds here; the 128-round / sf1
    re-gate measurement is in SCALE.md). Per-round driver traffic stays
    the vocab-sized pair table (Heaps-sublinear), never the corpus."""
    return bpe_train_merges_bytelevel(spark, sf_dir, n_rounds=32, batch=4)


def bpe_encode_token_counts(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """BPE ENCODE — the second half of the tokenizer story: apply the
    merge table :func:`bpe_train_merges` learns to every document and
    report the real post-BPE token count next to the whitespace word
    count (the compression ratio that decides sequence-packing budgets,
    and the honest replacement for heuristic char-per-token
    estimators).

    Because BPE application is per-WORD, encoding a corpus is a join of
    the doc->word incidence against the trained vocabulary's final
    symbolization — the engine never re-segments raw text at encode
    time. ``n_bpe_tokens`` = sum over the doc's words of that word's
    final symbol count. The oracle replays training AND encoding (the
    same 8 unrolled merge steps, then the same join), so a divergence
    in any merge's application surfaces as a count mismatch somewhere
    in the corpus."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    word_inc = (
        docs.select("doc_id", F.explode("toks").alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains("/")))
    )
    vocab, _merges = _bpe_trained(spark, sf_dir, n_merges)
    sized = vocab.select(
        "word",
        F.size(
            F.split(F.expr("trim(BOTH '/' FROM s)"), "//")
        ).cast("long").alias("n_syms"),
    )
    return (
        word_inc.join(F.broadcast(sized), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
    )


def zipf_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW fit per source — the corpus-health diagnostic: rank each
    source's vocabulary by frequency and OLS-fit log2(freq) against
    log2(rank). Natural text reads a slope near -1; a flat slope flags
    template/boilerplate corpora, a cliff flags deduplication damage.

    EXACT integer formulation (the ``grouped_linear_trend`` discipline):
    both logs are bit-length floors (``length(bin(v)) - 1``), the OLS
    moments are BIGINT sums, and the emitted slope is
    ``neg_slope_milli = 1000 * (SxSy - nSxy) DIV (nSxx - SxSx)`` — the
    NEGATED slope, so every division operand is nonnegative and Spark's
    truncating DIV agrees with DuckDB's ``//`` regardless of floor
    semantics. Ranks use the total tie-break (freq DESC, token ASC).

    Scale: the (source, token) aggregate is vocabulary-bounded per
    source; the rank window partitions by source over those bounded
    groups (the ``heavy_hitters_per_source`` shape); the OLS reduce is
    one aggregate-grain groupBy."""
    from pyspark.sql import Window

    toks = (
        read_table(spark, sf_dir, "documents")
        .withColumn("toks", _tokens(F.col("text")))
        .select("source", F.explode("toks").alias("tok"))
    )
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("freq")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("tok").asc()
    )
    pts = counts.select(
        "source",
        F.expr("length(bin(freq)) - 1").cast("long").alias("y"),
        (F.row_number().over(w)).alias("rank"),
    ).select(
        "source",
        "y",
        F.expr("length(bin(rank)) - 1").cast("long").alias("x"),
    )
    m = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        "source",
        "n_terms",
        F.col("sx").cast("long").alias("sum_log_rank"),
        F.col("sy").cast("long").alias("sum_log_freq"),
        F.expr(
            "1000 * (sx * sy - n_terms * sxy) DIV (n_terms * sxx - sx * sx)"
        ).cast("long").alias("neg_slope_milli"),
    )


def ngram_novelty_curve(
    spark: SparkSession, sf_dir: str, n: int = 5
) -> DataFrame:
    """N-GRAM NOVELTY per document — the memorization/staleness audit a
    continuously-growing corpus runs: in deterministic ``doc_id`` order,
    how much of each document's 5-gram vocabulary is NEW (never seen in
    any earlier document)? Near-duplicate tails read ~0 novelty; fresh
    content reads ~1. The per-doc curve is the marginal-information
    signal dedup thresholds and crawl-stop rules calibrate against.

    FIRST-OCCURRENCE ATTRIBUTION makes this one aggregate instead of a
    quadratic prior-join: a doc's novel grams are exactly the grams
    whose corpus-wide MIN(doc_id) is this doc — so the plan is one
    distinct (doc, gram) projection, one gram-grain MIN aggregate, one
    join back on gram, one doc-grain rollup. Every step is key-grain
    shuffled and map-side combinable; nothing is quadratic at any
    corpus size. ``novelty_ppm`` is an exact nonnegative floor."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", _tokens(F.col("text"))
    )
    grams = (
        docs.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}),"
                    f" i -> array_join(slice(toks, i, {n}), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).cast("long").alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.expr("1000000 * n_novel DIV n_grams").cast("long").alias(
            "novelty_ppm"
        ),
    )


def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA of the lang-ID heuristic against the declared
    label — the chance-corrected agreement statistic reported next to a
    confusion matrix (``lang_confusion_matrix``) whenever raw accuracy
    is inflated by class imbalance. Exact rational form with cleared
    denominators: ``kappa = (N*agree - Σ_k r_k*c_k) / (N² - Σ_k
    r_k*c_k)`` (r/c = row/column marginals), emitted in signed ppm —
    the numerator's sign is split by CASE so every floor division runs
    on nonnegative operands, and all products form in
    DECIMAL(38,0)/HUGEINT so the statistic stays exact at any corpus
    size (N² overflows BIGINT past ~3e9 rows). Also emits observed
    (accuracy) and chance agreement in ppm.

    Shape: one classifier pass; the (labeled, predicted) cell frame is
    language-bounded, materialized once (localCheckpoint) and reused
    for the diagonal, both marginals and the totals — the corpus is
    scanned exactly once."""
    pred = lang_id(spark, sf_dir).select("labeled_lang", "predicted_lang")
    cells = (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    rows_ = cells.groupBy(F.col("labeled_lang").alias("k")).agg(
        F.sum("n").alias("r")
    )
    cols_ = cells.groupBy(F.col("predicted_lang").alias("k")).agg(
        F.sum("n").alias("c")
    )
    rc = rows_.join(cols_, "k").agg(
        F.coalesce(
            F.sum(F.col("r").cast("decimal(38,0)") * F.col("c")),
            F.lit(0),
        )
        .cast("decimal(38,0)")
        .alias("sum_rc")
    )
    tot = cells.agg(
        F.sum("n").cast("decimal(38,0)").alias("n_docs"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("labeled_lang") == F.col("predicted_lang"),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("decimal(38,0)")
        .alias("n_agree"),
    )
    return tot.crossJoin(F.broadcast(rc)).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.expr("CAST(1000000 * n_agree DIV n_docs AS BIGINT)").alias(
            "accuracy_ppm"
        ),
        F.expr(
            "CAST(1000000 * sum_rc DIV (n_docs * n_docs) AS BIGINT)"
        ).alias("chance_ppm"),
        F.expr(
            "CAST(CASE WHEN n_docs * n_docs = sum_rc THEN 0"
            " WHEN n_docs * n_agree >= sum_rc THEN"
            " 1000000 * (n_docs * n_agree - sum_rc)"
            " DIV (n_docs * n_docs - sum_rc)"
            " ELSE -(1000000 * (sum_rc - n_docs * n_agree)"
            " DIV (n_docs * n_docs - sum_rc)) END AS BIGINT)"
        ).alias("kappa_ppm"),
    )


def perplexity_bucket_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-STYLE PERPLEXITY BUCKETING — the curation step that made
    CommonCrawl usable (Wenzek et al.): rank each source's documents by
    a language-model quality score and cut the ranking into HEAD (most
    fluent 30%), MIDDLE (next 30%) and TAIL (the rest), then report the
    doc/bigram mass and score range per (source, bucket) so a mixing
    recipe can sample head-heavy.

    The score is :func:`bigram_surprisal_score`'s exact integer
    ``avg_millibits`` (the in-corpus perplexity proxy — no float model,
    hash-exact), so the whole report is oracle-checkable; the oracle
    composes the surprisal SQL verbatim as a CTE. Docs with no bigrams
    (< 2 non-empty tokens) carry no score and are absent identically
    on both engines.

    Scale shape: the per-source rank runs through
    :func:`relational.two_phase_cumsum` with ``part_cols=("source",)``
    — range-partitioned on (source, score, doc_id), so a mega-source
    never becomes one sort task (the ``stratified_holdout_exact``
    pattern); per-source totals ride the same materialized frame.
    Bucket cuts are pure integer thresholds (``rk <= 3n DIV 10`` etc.)
    under the total (score, doc_id) tie-break order."""
    from .relational import two_phase_cumsum

    scores = bigram_surprisal_score(spark, sf_dir)
    src = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = scores.join(src, "doc_id")
    ranked = two_phase_cumsum(
        base,
        [F.col("avg_millibits").asc(), F.col("doc_id").asc()],
        F.lit(1),
        "rk",
        part_cols=("source",),
        totals=((F.count(F.lit(1)).cast("long"), "n_src"),),
    )
    bucket = (
        F.when(F.col("rk") <= F.expr("3 * n_src DIV 10"), F.lit("head"))
        .when(F.col("rk") <= F.expr("6 * n_src DIV 10"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ranked.select(
            "source", bucket.alias("bucket"), "n_bigrams", "avg_millibits"
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.min("avg_millibits").cast("long").alias("min_millibits"),
            F.max("avg_millibits").cast("long").alias("max_millibits"),
        )
    )


def good_turing_vocab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOOD-TURING frequency-of-frequencies over token 3-grams — the
    vocabulary-mass estimate a tokenizer/LM pipeline reads to size its
    unseen-event budget: for each observed occurrence count r, the
    number of distinct trigram types N_r seen exactly r times, and the
    Good-Turing smoothed count ``r* = (r+1)·N_{r+1}/N_r`` in exact ppm
    (``(r+1)·N_{r+1}·10⁶ DIV N_r`` — all-integer, so the classically
    estimated quantity is a deterministic cross-engine fact; rows whose
    successor count N_{r+1} is empty report 0, identically on both
    engines). Trigrams, not unigrams: the 31-token vocabulary makes
    unigram N_r degenerate singletons, while the trigram type space is
    large enough that the low-r head (the part Good-Turing exists for)
    is populated at every SF.

    Scale shape: one corpus scan to the (gram, count) frame (map-side
    combined), one groupBy to the frequency-of-frequencies frame —
    bounded by max count, tiny — and an r→r+1 self-join on that frame.
    No windows."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )
    grams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', slice(toks, i, 3)))"
            )
        ).alias("gram")
    ).filter(F.size(F.split("gram", " ")) == 3)
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("r"))
    nr = counts.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    succ = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        nr.join(succ, "r", "left_outer")
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.coalesce(
                F.expr("(r + 1) * n_r_next * 1000000 DIV n_r"), F.lit(0)
            )
            .cast("long")
            .alias("r_star_ppm"),
        )
    )


def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW vocabulary-growth curve — the sub-linearity check a
    tokenizer training run reads before extrapolating vocabulary size to
    the full corpus: at doc-prefix checkpoints 2^j (docs ordered by
    doc_id), the exact token-instance count and DISTINCT-token vocabulary
    size of the prefix, plus the prefix's new-vocab fraction in ppm.
    Sub-linear growth (each doubling adds a shrinking vocab fraction) is
    the Heaps regime; a linear curve means the corpus never repeats
    itself — a data-quality signal in its own right.

    The vocabulary is token TRIGRAMS, not unigrams — the 31-token word
    vocabulary saturates by the second checkpoint (probed: vocab 31 from
    n=2 on), while the trigram type space keeps growing through the
    whole corpus, so the curve actually curves (the r8 vacancy
    discipline: probe fixture non-degeneracy before pinning).

    First-occurrence attribution does all the work (the
    ``ngram_novelty_curve`` recipe): vocab(prefix k) = grams whose
    MIN(doc_id) < k — one aggregate to the type frame, then a bounded
    ×|checkpoints| explode of THAT frame (never the corpus). No windows,
    no sequential scan."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n_docs = docs.count()
    cps = []
    j = 0
    while (1 << j) < n_docs:
        cps.append(1 << j)
        j += 1
    cps.append(n_docs)
    cp_df = spark.createDataFrame([(c,) for c in cps], "cp long")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', slice(toks, i, 3)))"
            )
        ).alias("gram"),
    ).filter(F.size(F.split("gram", " ")) == 3)
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    vocab = (
        first.crossJoin(F.broadcast(cp_df))
        .filter(F.col("first_doc") < F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    )
    lens = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    mass = (
        lens.crossJoin(F.broadcast(cp_df))
        .filter(F.col("doc_id") < F.col("cp"))
        .groupBy("cp")
        .agg(F.sum("nt").cast("long").alias("n_gram_instances"))
    )
    return (
        vocab.join(mass, "cp")
        .select(
            F.col("cp").cast("long").alias("n_docs_prefix"),
            "n_gram_instances",
            "vocab_size",
            F.expr("vocab_size * 1000000 DIV n_gram_instances")
            .cast("long")
            .alias("vocab_per_gram_ppm"),
        )
    )
