"""Deterministic sampling / data-mixing operators over ``documents``
(SURVEY.md §2.8 extension surface: the selection half of a training-data
pipeline). The reference has no sampling at all (its weekly batch is ~1,250
rows, ``dags/google_trends_to_bigquery.py:13,38``); at 100 TB, corpus
selection IS the pipeline, and it must be *deterministic* so reruns and
incremental loads agree.

Every operator here keys randomness off ``md5`` of a stable id — md5 is
bit-identical across engines (unlike ``xxhash64``/``hash``, which are
engine-specific), so each query has an exact DuckDB oracle twin, and a rerun
on any cluster size selects the same rows. No ``rand()``: seeded ``rand()``
is partition-order dependent in Spark and would not survive a repartition,
let alone an engine change.

All pure column expressions — whole-stage codegen, no Python in the hot
path; the only shuffles are the ones the semantics require (stratified
ranking, per-source packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import read_table

#: Bernoulli keep-threshold on the first 8 hex digits of md5(doc_id):
#: '40000000' / 2^32 = exactly 25%. Lexicographic compare works because
#: lowercase hex orders like the integer it encodes.
HASH_SAMPLE_THRESHOLD = "40000000"

#: Per-stratum exact sample size for stratified_sample.
STRATUM_N = 3

#: Token capacity per pack for pack_token_shards (whitespace tokens).
PACK_CAPACITY = 512


def _sample_key(id_col):
    """64-bit-equivalent uniform key: first 16 hex chars of md5(id)."""
    return F.md5(id_col.cast("string"))


def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample (rate = 25%) of ``documents``: keep a
    doc iff the md5 of its id falls below a fixed threshold. Embarrassingly
    parallel — a pure filter with no shuffle, and the predicate pushes down
    to the scan's partition workers; at 100 TB this is the *only* sampling
    shape that is both rerun-stable and free of a global pass."""
    docs = read_table(spark, sf_dir, "documents")
    key = _sample_key(F.col("doc_id"))
    return docs.filter(
        F.substring(key, 1, 8) < HASH_SAMPLE_THRESHOLD
    ).select("doc_id", "source", "lang", key.alias("sample_key"))


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n-per-stratum sample: the smallest ``STRATUM_N`` docs per
    (source, lang) by hashed order (md5 ties broken by doc_id — a total
    order, so ranks are rerun-stable). One shuffle on the stratum key;
    ``row_number`` keeps per-group state O(1). This is the 'balanced
    evaluation subset' selector of a data pipeline — per-language /
    per-domain quotas rather than corpus-proportional sampling."""
    docs = read_table(spark, sf_dir, "documents")
    key = _sample_key(F.col("doc_id"))
    w = Window.partitionBy("source", "lang").orderBy(
        key.asc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "doc_id", "source", "lang", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= STRATUM_N)
        .select("doc_id", "source", "lang", F.col("rn").cast("int").alias("rn"))
    )


def per_source_quality_cap(
    spark: SparkSession, sf_dir: str, cap: int = 15
) -> DataFrame:
    """Domain-cap curation: keep at most ``cap`` documents per source,
    ranked by a quality priority (here length DESC — the stand-in for a
    model quality score; ties broken by doc_id for a rerun-stable total
    order). This is the standard guard against a handful of crawl domains
    dominating a training mix — unlike ``stratified_sample`` (hash-random
    quota), the cap keeps the BEST docs per domain, which is what an
    over-represented-domain policy actually wants.

    Shape: one shuffle on source + row_number with O(1) per-group state;
    Spark plans the rank-filter as WindowGroupLimit (top-k per group
    pushed below the full sort) so per-domain work is bounded by the cap,
    not the domain size — the property that matters when one domain is
    10^8 docs. Cap default 15 BITES at every test SF (25+ docs per
    source), so the filter is exercised, not vacuous."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).alias("quality_rank"),
        )
        .filter(F.col("quality_rank") <= cap)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("quality_rank").cast("int").alias("quality_rank"),
        )
    )


def source_weights(n_sources: int = 20) -> list[tuple[str, str]]:
    """Deterministic per-source mixing weights as (source, hex threshold on
    the first 4 md5 digits). Weight cycle 0.10/0.30/0.50/0.70/0.90 by source
    index — the 'data mixture' config a training pipeline would load from a
    recipe file. Thresholds are precomputed hex literals so BOTH engines
    compare strings, with no float-parsing drift."""
    out = []
    for i in range(n_sources):
        w = 0.10 + 0.20 * (i % 5)
        out.append((f"src{i}", format(int(w * 65536), "04x")))
    return out


def weighted_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: downsample each source to its recipe weight with the
    same md5-threshold trick, then report per-source audit counts
    (n_docs, n_kept). The weights table is a literal broadcast join — at
    scale the recipe is tiny and the join never shuffles the corpus; the
    audit aggregation carries one row per (partition, source)."""
    docs = read_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        source_weights(), schema="source string, w_hex string"
    )
    key4 = F.substring(_sample_key(F.col("doc_id")), 1, 4)
    return (
        docs.join(F.broadcast(weights), "source", "left")
        .withColumn("kept", key4 < F.col("w_hex"))
        .groupBy("source", "w_hex")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        )
    )


def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign each doc to a fixed-capacity token shard
    (``PACK_CAPACITY`` whitespace tokens) by cumulative token count in
    deterministic (doc_id) order, partitioned by source. pack_id =
    floor(tokens-before-me / capacity) — the streaming-friendly variant of
    greedy first-fit (a doc may straddle a boundary; the trainer's loader
    splits it, which is what sequence packing does anyway).

    Scale: the running sum is windowed PER SOURCE, so parallelism = number
    of sources (at 100 TB, partition by (source, date-bucket) to bound any
    one window's span — same two-level trick as salted aggregation)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        "doc_id", "source", toks.alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    before = F.col("cum_tokens") - F.col("n_tokens")
    return with_cum.select(
        "doc_id",
        "source",
        "n_tokens",
        before.alias("tokens_before"),
        F.expr(f"(cum_tokens - n_tokens) div {PACK_CAPACITY}").alias("pack_id"),
    )


def pack_token_shards_scalable(
    spark: SparkSession, sf_dir: str, bucket_span: int = 100
) -> DataFrame:
    """The TWO-LEVEL form of ``pack_token_shards`` — the decomposition
    its docstring (and SCALE.md) prescribe for 100 TB, implemented and
    proven identical: the single per-source running-sum window caps
    parallelism at |sources|, so instead

      1. bucket docs deterministically (``doc_id div bucket_span`` —
         id-range buckets preserve the doc_id pack order);
      2. LEVEL 1: per-(source, bucket) token totals — an aggregate-sized
         frame — get a running-sum window over BUCKETS to become each
         bucket's base offset (tiny: |sources × buckets| rows);
      3. LEVEL 2: the within-bucket running sum is windowed on
         (source, bucket) — parallelism = total buckets — and adds the
         broadcast base.

    tokens_before = base + within-bucket prefix reproduces the global
    per-source prefix sum EXACTLY (integer addition is associative), so
    pack ids are bit-identical to the one-window form — asserted by an
    equality test, and the registered oracle is the SAME SQL as
    ``pack_token_shards``. This is the generic recipe for any windowed
    prefix sum whose key is too coarse: decompose into (coarse key,
    fine bucket), prefix-sum the bucket TOTALS, then offset."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    base_rows = docs.select(
        "doc_id",
        "source",
        toks.alias("n_tokens"),
        (F.col("doc_id") / bucket_span).cast("long").alias("bkt"),
    )
    # level 1: bucket totals -> exclusive running base per (source, bkt)
    w_bkt = (
        Window.partitionBy("source")
        .orderBy(F.col("bkt").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = (
        base_rows.groupBy("source", "bkt")
        .agg(F.sum("n_tokens").alias("bkt_tokens"))
        .withColumn(
            "base", F.sum("bkt_tokens").over(w_bkt) - F.col("bkt_tokens")
        )
        .select("source", "bkt", "base")
    )
    # level 2: within-bucket prefix + broadcast base
    w_in = (
        Window.partitionBy("source", "bkt")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (
        F.col("base") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
    )
    return (
        base_rows.join(F.broadcast(bases), ["source", "bkt"])
        .withColumn("tokens_before", before)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "tokens_before",
            F.expr(f"tokens_before div {PACK_CAPACITY}").alias("pack_id"),
        )
    )


def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) off the same md5 key
    as ``hash_sample``: the split a doc lands in is a pure function of its
    id — stable across reruns, engines, partitionings, and additions of
    new docs (old docs never migrate). Emits per-split audit counts; the
    doc-level label is the same expression un-aggregated. Zero-shuffle
    labeling + one tiny aggregation."""
    docs = read_table(spark, sf_dir, "documents")
    key4 = F.substring(_sample_key(F.col("doc_id")), 1, 4)
    # 4 hex digits = 65536 buckets: [0, 0xcccc) train, [0xcccc, 0xe666) val
    split = (
        F.when(key4 < "cccc", "train")
        .when(key4 < "e666", "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance (rate-varying) Bernoulli sample: short documents keep a
    25% rate, long ones 6.25% — the up-weight-the-rare-stratum shape used
    to rebalance a length-skewed corpus without a shuffle. Same md5-keyed
    determinism as ``hash_sample``; the only addition is that the keep
    threshold is itself a column (CASE on the stratum), so the predicate
    is still a pure scan-level filter at 100 TB."""
    docs = read_table(spark, sf_dir, "documents")
    key8 = F.substring(_sample_key(F.col("doc_id")), 1, 8)
    thr = F.when(F.col("n_chars") < 200, F.lit("40000000")).otherwise(
        F.lit("10000000")
    )
    return docs.filter(key8 < thr).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(F.col("n_chars") < 200, F.lit("short"))
        .otherwise(F.lit("long"))
        .alias("stratum"),
        key8.alias("sample_key8"),
    )


def token_budget_mix(
    spark: SparkSession, sf_dir: str, budget_tokens: int = 500
) -> DataFrame:
    """Token-budget data mixing: each source contributes documents — in a
    deterministic md5-shuffled order — until its TOKEN budget (not doc
    count) is filled; the cut is on the running token total. This is how
    real mixture recipes are specified ("N tokens of source X per epoch").
    One shuffle on the source key; per-group window state is O(1) (a
    running sum), and the kept set is rerun-stable because the order key
    (md5(doc_id), doc_id) is a total order."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "n_toks", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(_sample_key(F.col("doc_id")).asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_toks").over(w)
    return (
        docs.select("doc_id", "source", "n_toks", cum.alias("cum_toks"))
        .filter(F.col("cum_toks") <= budget_tokens)
    )


def quality_threshold_for_budget(
    spark: SparkSession, sf_dir: str, budget_tenths: int = 3
) -> DataFrame:
    """Calibrate a quality cutoff against a token budget: the curation
    question "what distinct-token-ratio threshold keeps roughly
    ``budget_tenths``/10 of the corpus tokens?", answered with the full
    quality CDF so the trade-off curve is visible, not just the cutoff.

    Output: one row per DISTINCT quality score (distinct-token ratio from
    ``text_quality``'s exact integer counts — a single IEEE division, so
    bit-identical cross-engine and safely groupable), with the per-score
    doc/token mass, the cumulative mass at-or-above that score, the exact
    integer budget (``total_tokens * budget_tenths DIV 10``), and
    ``selected`` marking the crossing row — the highest threshold whose
    kept tokens first reach the budget.

    Scale shape: per-doc scoring is map-only; the CDF groupBy reduces the
    corpus to |distinct scores| rows BEFORE the cumulative pass — but
    score grain approaches DOC count on a real corpus (ratio doubles),
    so the two running sums go through
    :func:`relational.two_phase_cumsum` (VERDICT r8 item 1): range-
    repartition on score desc, window within each range partition,
    broadcast prefix offsets — no single-task global sort at any score
    cardinality. Scores are distinct after the groupBy (tie groups are
    singletons, the two-phase precondition), and the budget scalar
    derives from the SAME materialized partition frame
    (sum-of-per-score-tokens == corpus tokens), so the second corpus
    scan the old separate aggregate paid is gone too. All masses are
    exact BIGINTs.
    """
    from .relational import two_phase_cumsum

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    n_toks = F.size("toks")
    scored = docs.select(
        (F.size(F.array_distinct("toks")).cast("double") / n_toks).alias("score"),
        n_toks.cast("long").alias("n_toks"),
    )
    per_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    cdf = two_phase_cumsum(
        per_score,
        [F.col("score").desc()],
        F.col("n_docs"),
        "cum_docs",
        extra=((F.col("n_tokens"), "cum_tokens"),),
        totals=(
            (
                F.expr(f"sum(n_tokens) * {budget_tenths} DIV 10"),
                "budget",
            ),
        ),
    )
    return cdf.select(
        "score",
        "n_docs",
        "n_tokens",
        "cum_docs",
        "cum_tokens",
        "budget",
        (
            (F.col("cum_tokens") >= F.col("budget"))
            & (F.col("cum_tokens") - F.col("n_tokens") < F.col("budget"))
        ).alias("selected"),
    )


def systematic_token_sample(
    spark: SparkSession, sf_dir: str, per_source_target: int = 8
) -> DataFrame:
    """Weighted sampling WITHOUT randomness or transcendentals: per-source
    SYSTEMATIC sampling by cumulative token weight. Docs are laid on each
    source's token axis in a deterministic md5-shuffled order; every
    ``step = source_tokens DIV target`` tokens, the doc under the grid
    line is picked — selection probability is proportional to token
    weight (the A-ES goal) with EXACT integer arithmetic (A-ES itself
    needs log(), which no cross-engine oracle can hash-match).

    A doc is picked iff a grid line falls inside its token interval:
    ``cum DIV step > (cum - w) DIV step``. Long docs can cover several
    lines; ``n_picks`` reports the multiplicity (mixture weight for an
    up-sampling pipeline).

    Scale shape: one window per SOURCE (parallel across sources, the
    partitioner the mixture semantics already demand); the per-source
    token total joins back as a broadcast. Rerun-stable and engine-exact:
    the md5 order key and integer division have no ties to break.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("w"),
    )
    totals = docs.groupBy("source").agg(F.sum("w").alias("src_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy(_sample_key(F.col("doc_id")).asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.withColumn("cum", F.sum("w").over(w)).join(
        F.broadcast(totals), "source"
    )
    step = F.expr(f"greatest(src_tokens DIV {per_source_target}, 1L)")
    picks = (
        F.expr("cum DIV step") - F.expr("(cum - w) DIV step")
    )
    return (
        cum.withColumn("step", step)
        .withColumn("n_picks", picks.cast("long"))
        .filter(F.col("n_picks") > 0)
        .select("doc_id", "source", "w", "cum", "n_picks")
    )


def corpus_curation_v2(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = 0.4,
    per_source_target: int = 8,
) -> DataFrame:
    """End-to-end curation composition v2 — the session-3 primitives
    chained into one lazy lineage: (1) near-dup clusters collapse to
    their HIGHEST-quality canonical doc (``quality_canonical_docs``),
    (2) a quality floor drops low-distinct-ratio survivors, (3) weighted
    SYSTEMATIC sampling picks a token-proportional per-source subset of
    what remains. Output carries full provenance (cluster, quality,
    token weight, pick multiplicity) so the recipe is auditable.

    Plan: the only corpus-scale work is the LSH clustering already
    inside step 1; steps 2-3 run on the survivor frame. One lineage, no
    driver round-trips."""
    from . import dedup as _dedup

    survivors = _dedup.quality_canonical_docs(spark, sf_dir).filter(
        F.col("quality") >= min_quality
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("w"),
    )
    s = survivors.join(
        docs.withColumnRenamed("doc_id", "survivor_id"), "survivor_id"
    )
    totals = s.groupBy("source").agg(F.sum("w").alias("src_tokens"))
    wsrc = (
        Window.partitionBy("source")
        .orderBy(_sample_key(F.col("survivor_id")).asc(), F.col("survivor_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = s.withColumn("cum", F.sum("w").over(wsrc)).join(
        F.broadcast(totals), "source"
    )
    step = F.expr(f"greatest(src_tokens DIV {per_source_target}, 1L)")
    picks = F.expr("cum DIV step") - F.expr("(cum - w) DIV step")
    return (
        cum.withColumn("step", step)
        .withColumn("n_picks", picks.cast("long"))
        .filter(F.col("n_picks") > 0)
        .select(
            "survivor_id",
            "source",
            "cluster_id",
            "cluster_size",
            "quality",
            "w",
            "n_picks",
        )
    )


def priority_sample_topk(
    spark: SparkSession, sf_dir: str, k: int = 25
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via PRIORITY SAMPLING
    (Duffield-Lund-Thorup, JACM 2007): each doc draws a deterministic
    uniform ``u`` (52 bits of md5(doc_id), exact as a double) and gets
    priority key ``q = u / w`` with ``w`` = whitespace token count; the
    ``k`` SMALLEST keys win, so inclusion probability grows with token
    weight. This is the transcendental-free sibling of A-ES reservoir
    sampling (``systematic_token_sample``'s docstring notes A-ES needs
    ``log()`` and can never hash-match a cross-engine oracle): both
    operands are exact in IEEE doubles (u < 2^53, integer w), and one
    correctly-rounded division is bit-identical on every IEEE engine —
    so the oracle twin hashes exactly.

    Scale shape: ``orderBy(q).limit(k)`` compiles to TakeOrderedAndProject
    — each task keeps a k-row heap and the driver merges P·k rows, no
    global sort, no full shuffle. That is THE cluster-scale top-k plan;
    the rank is then a window over the k surviving rows only.

    The reference has no sampling at all; this is the §2.8 corpus-mixing
    surface (pick a token-weighted subset of a 100 TB corpus in one pass,
    rerun-stable)."""
    docs = read_table(spark, sf_dir, "documents")
    # 13 hex chars = 52 bits: the widest md5 prefix exactly representable
    # as a double (2^52 < 2^53), so u/w is ONE correctly-rounded IEEE op.
    u = F.conv(F.substring(_sample_key(F.col("doc_id")), 1, 13), 16, 10).cast(
        "long"
    )
    w = F.greatest(F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(1))
    cand = docs.select(
        "doc_id",
        "source",
        w.alias("w"),
        (u.cast("double") / w.cast("double")).alias("q"),
    )
    topk = cand.orderBy(F.col("q").asc(), F.col("doc_id").asc()).limit(k)
    wr = Window.orderBy(F.col("q").asc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        "source",
        "w",
        F.row_number().over(wr).cast("int").alias("rk"),
    )


def cv_fold_assignment(spark: SparkSession, sf_dir: str, folds: int = 5) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5(doc_id) mod k — the same zero-shuffle labeling contract as
    ``dataset_splits`` (pure function of the id: rerun-stable, engine-
    stable, and new docs never migrate old ones between folds). Emits the
    per-fold audit frame a training harness checks before trusting the
    folds: document count, total characters, and distinct source count
    (folds should look statistically interchangeable; a fold missing a
    source signals id-correlated skew).

    One scan-level projection + one fold-keyed aggregate of k rows."""
    docs = read_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(_sample_key(F.col("doc_id")), 1, 8), 16, 10)
        .cast("long")
        % folds
    )
    return (
        docs.select(fold.alias("fold"), "n_chars", "source")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def split_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit between each train/val/test split and the
    whole corpus: TOTAL-VARIATION distance of the source distribution,
    ``TV = ½ Σ_s |p_split(s) − p_corpus(s)|`` — the drift metric that
    (unlike PSI/KL) needs no logarithm, so it stays exact-rational until
    ONE final IEEE division: each term is |n_s·M − m_s·N| with the
    products in DECIMAL(38,0) (n·M at corpus scale wraps BIGINT), summed
    exactly, divided once by 2·N·M. A split drawn uniformly (as the md5
    split is) should sit near 0; TV → 1 means a split sees sources the
    corpus elsewhere lacks.

    Two aggregate-sized frames (split×source and source marginals)
    joined and re-aggregated — nothing beyond the first pass touches
    corpus-sized data."""
    docs = read_table(spark, sf_dir, "documents")
    key4 = F.substring(_sample_key(F.col("doc_id")), 1, 4)
    split = (
        F.when(key4 < "cccc", "train")
        .when(key4 < "e666", "val")
        .otherwise("test")
    )
    cell = (
        docs.select(split.alias("split"), "source")
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    marg = cell.groupBy("source").agg(F.sum("n").alias("m"))
    split_n = cell.groupBy("split").agg(F.sum("n").alias("n_split"))
    total = marg.agg(F.sum("m").alias("m_total"))
    # every source x split pair, including sources absent from a split
    grid = split_n.crossJoin(F.broadcast(marg))
    joined = grid.join(cell, ["split", "source"], "left").select(
        "split",
        "n_split",
        "m",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    return (
        joined.crossJoin(F.broadcast(total))
        .select(
            "split",
            "n_split",
            F.abs(
                F.col("n").cast("decimal(38,0)")
                * F.col("m_total").cast("decimal(38,0)")
                - F.col("m").cast("decimal(38,0)")
                * F.col("n_split").cast("decimal(38,0)")
            ).alias("num"),
            (
                F.lit(2).cast("decimal(38,0)")
                * F.col("n_split").cast("decimal(38,0)")
                * F.col("m_total").cast("decimal(38,0)")
            ).alias("den"),
        )
        .groupBy("split", "n_split", "den")
        .agg(F.sum("num").alias("num_sum"))
        .select(
            "split",
            F.col("n_split").cast("long").alias("n_docs"),
            (
                F.col("num_sum").cast("double") / F.col("den").cast("double")
            ).alias("tv_distance"),
        )
    )


def temporal_backtest_splits(
    spark: SparkSession, sf_dir: str, n_folds: int = 4
) -> DataFrame:
    """EXPANDING-WINDOW time-series cross-validation boundaries — the
    split protocol that is actually valid for forecasting work, where
    ``cv_fold_assignment``'s i.i.d. folds would leak the future into
    training: the date span divides into ``n_folds + 1`` equal segments,
    and fold i trains on segments 1..i, tests on segment i+1 (train
    always strictly precedes test). Boundaries are pure integer date
    arithmetic (``lo + (span·i) DIV (k+1)`` days), so every engine draws
    identical cut lines. Emits per fold the boundary dates and exact
    train/test order counts.

    One scan: the bounds frame is 1 row, the fold grid is k rows, and
    counting is a broadcast range join of orders against the grid."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day")
    )
    bounds = orders.agg(
        F.min("day").alias("lo"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    folds = spark.range(1, n_folds + 1).select(F.col("id").cast("int").alias("fold"))
    grid = bounds.crossJoin(F.broadcast(folds)).select(
        "fold",
        F.expr(f"date_add(lo, CAST(span * fold DIV {n_folds + 1} AS INT))").alias(
            "train_end"
        ),
        F.expr(
            f"date_add(lo, CAST(span * (fold + 1) DIV {n_folds + 1} AS INT))"
        ).alias("test_end"),
    )
    joined = orders.crossJoin(F.broadcast(grid))
    return (
        joined.groupBy("fold", "train_end", "test_end")
        .agg(
            F.sum(
                F.when(F.col("day") <= F.col("train_end"), 1).otherwise(0)
            ).alias("n_train"),
            F.sum(
                F.when(
                    (F.col("day") > F.col("train_end"))
                    & (F.col("day") <= F.col("test_end")),
                    1,
                ).otherwise(0)
            ).alias("n_test"),
        )
        .select(
            "fold",
            "train_end",
            "test_end",
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_test").cast("long").alias("n_test"),
        )
    )


def quantile_normalize_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUANTILE NORMALIZATION of document length across sources — the
    feature-prep transform that forces every source's length distribution
    onto the corpus-global one (rank within source → the global order
    statistic at the proportional rank ``ceil(r·N/n_src)``): after it, a
    verbose source and a terse source contribute comparable length
    features. All rank arithmetic is exact integers; the mapped value IS
    a real corpus value (an order statistic), not an interpolation, so
    the whole transform is hash-exact.

    Plan: one per-source rank window (parallel across sources), one
    TWO-PHASE global numbering over (n_chars, doc_id) — VERDICT r7
    item 1: the old unpartitioned ``row_number`` window was a
    single-task full-corpus sort; ``two_phase_cumsum`` of 1 over the
    same tie-broken total order produces bit-identical ranks with
    range-partitioned parallel sorts — and a join on the computed
    target rank."""
    from .relational import two_phase_cumsum

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    n_total = docs.count()
    ws = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    per_src = docs.withColumn("r", F.row_number().over(ws))
    src_n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    global_ranked = two_phase_cumsum(
        docs,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        F.lit(1),
        "g_rank",
    ).select("g_rank", F.col("n_chars").alias("g_chars"))
    targeted = per_src.join(F.broadcast(src_n), "source").select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(f"(r * {n_total} + n_src - 1) DIV n_src").alias("t_rank"),
    )
    return targeted.join(
        global_ranked, F.col("t_rank") == F.col("g_rank")
    ).select("doc_id", "source", "n_chars", F.col("g_chars").alias("normalized_chars"))


def pack_bpe_token_shards(
    spark: SparkSession, sf_dir: str, pack_size: int = 512
) -> DataFrame:
    """Sequence packing on REAL tokenizer counts — ``pack_token_shards``
    with the whitespace token estimate replaced by the trained BPE
    vocabulary's actual per-doc token counts
    (``text.bpe_encode_token_counts``): pack boundaries now fall where
    the model's tokenizer says they fall, which is what decides true
    sequence-length utilization. Same per-source running-sum shape as
    the estimate-based form (the ``pack_token_shards_scalable``
    two-level decomposition is the documented 100 TB recipe when
    |sources| caps parallelism); the BPE counts come from the
    vocab-join encode path, so no text is re-tokenized here."""
    from .text import bpe_encode_token_counts

    counts = bpe_encode_token_counts(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    rows = docs.join(counts.select("doc_id", "n_bpe_tokens"), "doc_id")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_bpe_tokens").over(w)
    return rows.select(
        "doc_id",
        "source",
        "n_bpe_tokens",
        (cum - F.col("n_bpe_tokens")).cast("long").alias("tokens_before"),
    ).withColumn(
        "pack_id",
        F.expr(f"tokens_before DIV {pack_size}").cast("long"),
    )


def dsir_importance_weights(
    spark: SparkSession, sf_dir: str, target_lang: str = "en"
) -> DataFrame:
    """DSIR-style IMPORTANCE WEIGHTS (Xie et al., Data Selection for LMs
    via Importance Resampling): score every document by how much more
    likely its tokens are under a TARGET distribution (here the
    ``lang = target_lang`` slice's unigram LM) than under the source
    (full-corpus) LM — the weights importance resampling then samples
    by. Docs scoring high look like the target domain; the classic
    recipe for tilting a web-scale corpus toward a quality slice.

    EXACT integer log-ratio (the ``bigram_surprisal_score`` bit-length
    convention, applied twice): per word, with add-one smoothing over
    the corpus vocabulary V,

        bits(w) = [bitlen(N_src + V) - bitlen(c_src(w) + 1)]
                - [bitlen(N_tgt + V) - bitlen(c_tgt(w) + 1)]

    i.e. an integer log2(p_tgt / p_src) bracketed within 2 bits, and a
    doc's score is the BIGINT sum over its token instances. The
    per-token average uses the NONNEGATIVE-SHIFT floor trick
    (``(s*1000 + n*K) DIV n - K``, K = 100000 > 64*1000 >= |bits|*1000
    per token): Spark DIV truncates toward zero while DuckDB //
    floors, so a negative numerator would diverge the engines — the
    shift keeps the numerator provably nonnegative on both.

    Shape: one corpus incidence frame; two vocabulary-sized aggregates
    (corpus + target slice) joined into one score dictionary that
    broadcasts; one doc-grain aggregate."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    inc = docs.select(
        "doc_id", "lang", F.explode("toks").alias("word")
    ).filter(F.col("word") != "")
    src = inc.groupBy("word").agg(F.count(F.lit(1)).alias("c_src"))
    tgt = (
        inc.filter(F.col("lang") == target_lang)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    scal = src.agg(
        F.sum("c_src").alias("n_src"), F.count(F.lit(1)).alias("v")
    ).crossJoin(
        tgt.agg(F.sum("c_tgt").alias("n_tgt"))
    )
    bl = lambda c: F.length(F.bin(c)) - 1  # noqa: E731 — exact floor log2
    dic = (
        src.join(tgt, "word", "left_outer")
        .crossJoin(F.broadcast(scal))
        .select(
            "word",
            (
                (bl(F.col("n_src") + F.col("v")) - bl(F.col("c_src") + 1))
                - (
                    bl(F.col("n_tgt") + F.col("v"))
                    - bl(F.coalesce(F.col("c_tgt"), F.lit(0)) + 1)
                )
            )
            .cast("long")
            .alias("bits"),
        )
    )
    return (
        inc.join(F.broadcast(dic), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("bits").cast("long").alias("dsir_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dsir_bits",
            (
                F.expr(
                    "(dsir_bits * 1000 + n_tokens * 100000) DIV n_tokens"
                )
                - 100000
            )
            .cast("long")
            .alias("avg_millibits"),
        )
    )


def curriculum_order_assignment(
    spark: SparkSession, sf_dir: str, n_phases: int = 4
) -> DataFrame:
    """CURRICULUM ordering — assign every document a training phase and
    a global curriculum step, short-to-long (sequence length is the
    standard difficulty proxy for curriculum schedules, and the one
    that also packs best early in training). Phase = ntile over the
    tie-broken (n_chars, doc_id) total order; step = the global rank.

    Both numberings run on the round-7/8 two-phase machinery
    (:func:`_two_phase_ntile` for the phase, :func:`two_phase_cumsum`
    of 1 for the step) — zero single-task global sorts; output is
    bit-identical to SQL NTILE/ROW_NUMBER over the same order, so the
    oracle is the plain window pair."""
    from .relational import _two_phase_ntile, two_phase_cumsum

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").asc(), F.col("doc_id").asc()]
    phased = _two_phase_ntile(docs, n_phases, order, "phase")
    stepped = two_phase_cumsum(phased, order, F.lit(1), "step")
    return stepped.select(
        "doc_id", "n_chars", "phase", F.col("step").cast("long").alias("step")
    )


def dsir_resample_corpus(
    spark: SparkSession, sf_dir: str, keep_pct: int = 25
) -> DataFrame:
    """DSIR END-TO-END: importance scoring composed into the actual
    corpus-tilting SELECTION — keep the top ``keep_pct`` percent of
    documents by target-likeness (:func:`dsir_importance_weights`'s
    integer log-ratio, tie-broken by doc_id), the deterministic
    rank-based form of importance resampling (rank selection keeps the
    whole pipeline hash-exact where exponentiated-weight sampling
    cannot be). Emits the selected docs with their selection rank.

    Shape: the score frame ranks through :func:`two_phase_cumsum` —
    no single-task sort even at corpus grain; the cutoff
    ``k = n * keep_pct DIV 100`` derives from the SAME materialized
    partition frame (``totals=``), so the corpus-scale scoring pipeline
    (explode + two vocab aggregates + doc aggregate) executes exactly
    ONCE per invocation — the old driver-side ``scores.count()`` ran it
    a second time before the rank pass (ADVICE r8)."""
    from .relational import two_phase_cumsum

    scores = dsir_importance_weights(spark, sf_dir).select(
        "doc_id", "n_tokens", "dsir_bits"
    )
    ranked = two_phase_cumsum(
        scores,
        [F.col("dsir_bits").desc(), F.col("doc_id").asc()],
        F.lit(1),
        "sel_rank",
        totals=((F.count(F.lit(1)).cast("long"), "_n"),),
    )
    k = F.expr(f"_n * {int(keep_pct)} DIV 100")
    return ranked.filter(F.col("sel_rank") <= k).select(
        "doc_id",
        "n_tokens",
        "dsir_bits",
        F.col("sel_rank").cast("long").alias("sel_rank"),
    )


def eb_shrunk_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES shrinkage of per-source quality rates — the
    classic small-sample curation scorer: a source's observed pass rate
    ``k/n`` (success = ``n_chars >= 300``) is pulled toward the corpus
    prior by a beta-binomial method-of-moments fit, so sources with few
    docs can't dominate a curation ranking on noise:

        shrunk_s = (k_s + alpha) / (n_s + alpha + beta),
        alpha + beta = m(1-m)/v - 1,   alpha = m * (alpha + beta),

    with ``m`` the mean and ``v`` the sample variance of the per-source
    rates.

    PINNED 1e-9 FIXED-POINT CHAIN (every step one floor DIV over
    nonnegative integers, mirrored verbatim in the oracle):
    ``rate = k*Q DIV n``; ``m = sum(rate) DIV S``;
    ``v = sum((rate-m)^2) DIV (S-1)`` (squares summed in
    DECIMAL(38,0)); ``apb = (m*(Q-m)*Q) DIV v - Q`` clamped at 0;
    ``a = m*apb DIV Q``; ``shrunk = ((k*Q + a)*Q) DIV (n*Q + apb)``.
    Products that cross 2^63 form in DECIMAL(38,0)/HUGEINT (the
    isotonic-overflow lesson applied up front).

    Shape: one map-side-combined aggregate to the source grain;
    everything after runs on the |sources|-row frame with broadcast
    scalars."""
    Q = 1_000_000_000
    docs = read_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_chars") >= 300).cast("long")).alias("k_success"),
    )
    rates = per.select(
        "source",
        "n_docs",
        "k_success",
        F.expr(f"k_success * {Q} DIV n_docs").alias("rate_fp"),
    )
    m = rates.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.expr(f"sum(rate_fp) DIV count(1)").alias("m_fp"),
    )
    withm = rates.crossJoin(F.broadcast(m))
    # Degenerate-corpus guards (ADVICE r7), mirrored verbatim in the
    # oracle: (a) one source -> the sample variance's n-1 denominator is
    # zero (Spark DIV NULLs, DuckDB // raises) -> var_fp := 0; (b)
    # var_fp <= 0 (identical rates) -> apb_fp := 0, which collapses the
    # whole chain to shrunk == rate (no shrinkage — the documented
    # fallback: with no observable between-source variance there is no
    # prior to shrink toward); (c) a tiny-but-positive var_fp makes the
    # apb quotient exceed BIGINT (Spark cast NULLs, DuckDB raises) ->
    # cap apb at 10^18, tested IN DECIMAL before dividing
    # (num >= (CAP+Q)*var <=> num DIV var - Q >= CAP, exact because all
    # operands are nonneg integers), so the ELSE branch provably fits.
    CAP = 10**18
    prior = withm.agg(
        F.first("n_sources").alias("n_sources"),
        F.first("m_fp").alias("m_fp"),
        F.expr(
            "CASE WHEN count(1) >= 2 THEN CAST("
            "sum(CAST(rate_fp - m_fp AS DECIMAL(38,0))"
            " * (rate_fp - m_fp)) DIV (count(1) - 1) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        )
        .cast("long")
        .alias("var_fp"),
    ).select(
        "n_sources",
        "m_fp",
        "var_fp",
        F.expr(
            f"CASE WHEN var_fp <= 0 THEN CAST(0 AS BIGINT)"
            f" WHEN CAST(m_fp AS DECIMAL(38,0)) * ({Q} - m_fp) * {Q}"
            f" >= CAST({CAP + Q} AS DECIMAL(38,0)) * var_fp"
            f" THEN CAST({CAP} AS BIGINT)"
            f" ELSE greatest(CAST(0 AS BIGINT), CAST(CAST(m_fp AS"
            f" DECIMAL(38,0)) * ({Q} - m_fp) * {Q} DIV var_fp - {Q}"
            f" AS BIGINT)) END"
        ).alias("apb_fp"),
    ).select(
        "m_fp",
        "var_fp",
        "apb_fp",
        F.expr(f"CAST(m_fp AS DECIMAL(38,0)) * apb_fp DIV {Q}")
        .cast("long")
        .alias("a_fp"),
    )
    return (
        rates.crossJoin(F.broadcast(prior))
        .select(
            "source",
            "n_docs",
            "k_success",
            "rate_fp",
            F.col("a_fp").cast("long").alias("alpha_fp"),
            (F.col("apb_fp") - F.col("a_fp")).cast("long").alias("beta_fp"),
            F.expr(
                f"CAST((CAST(k_success AS DECIMAL(38,0)) * {Q} + a_fp)"
                f" * {Q} DIV (CAST(n_docs AS DECIMAL(38,0)) * {Q}"
                f" + apb_fp) AS BIGINT)"
            ).alias("shrunk_rate_fp"),
        )
    )


def padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH-PADDING efficiency audit — the measurement behind
    length-bucketed batching: if documents are batched within log2
    length buckets and each batch pads to its bucket's max length, how
    many pad tokens does each bucket burn? Reports per bucket the doc
    count, min/max/sum token lengths, the padded total
    (``n_docs * max_tokens`` — the worst-case per-bucket pad bill) and
    the exact waste rate in ppm. The report decides bucket granularity for
    a packing pipeline (wide buckets => pad waste; narrow => small
    batches); ``pack_token_shards`` is the remedy this report sizes.

    Exact integers end to end (bucket = bit length of the token count,
    the log2 binning the degree histogram uses; waste_ppm is one floor
    division of nonnegative BIGINTs). One map-only scoring pass + one
    bucket-grain aggregate."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks")
    )
    b = docs.select(
        F.expr("length(bin(n_toks)) - 1").cast("long").alias("bucket"),
        "n_toks",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_toks").cast("long").alias("min_tokens"),
            F.max("n_toks").cast("long").alias("max_tokens"),
            F.sum("n_toks").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket",
            F.expr("CAST(1 AS BIGINT) << bucket").cast("long").alias(
                "bucket_lo"
            ),
            "n_docs",
            "min_tokens",
            "max_tokens",
            "sum_tokens",
            (F.col("n_docs") * F.col("max_tokens")).cast("long").alias(
                "padded_tokens"
            ),
            F.expr(
                "1000000 * (n_docs * max_tokens - sum_tokens)"
                " DIV (n_docs * max_tokens)"
            ).cast("long").alias("waste_ppm"),
        )
    )


def stratified_holdout_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-PROPORTION stratified train/val/test split — the companion
    to the hash-band splits (``cv_fold_assignment``/``split_leakage``):
    hash banding only hits 80/10/10 in expectation, but fairness
    audits and small strata need EXACT quotas per source. Each source's
    docs are ranked in the rerun-stable (md5(doc_id), doc_id) order and
    cut at ``8n/10`` and ``9n/10``; the report emits per (source,
    split) doc and token masses.

    Scale shape: the per-source rank runs through
    :func:`relational.two_phase_cumsum` with ``part_cols=("source",)``
    — range-partitioned on (source, order key), so even a single
    mega-source never becomes one sort task (the weighted_median
    class); the per-source totals ride the same materialized frame
    (``totals=``). Pure integer thresholds: rank <= 8n DIV 10 -> train,
    <= 9n DIV 10 -> val, else test."""
    from .relational import two_phase_cumsum

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
        _sample_key(F.col("doc_id")).alias("k"),
    )
    ranked = two_phase_cumsum(
        docs,
        [F.col("k").asc(), F.col("doc_id").asc()],
        F.lit(1),
        "rk",
        part_cols=("source",),
        totals=((F.count(F.lit(1)).cast("long"), "n_src"),),
    )
    split = (
        F.when(F.col("rk") <= F.expr("8 * n_src DIV 10"), F.lit("train"))
        .when(F.col("rk") <= F.expr("9 * n_src DIV 10"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ranked.select("source", split.alias("split"), "n_toks")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )


def priority_sample_per_source(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """STRATIFIED weighted sampling without replacement — the per-source
    twin of :func:`priority_sample_topk` (Duffield-Lund-Thorup priority
    keys ``q = u / w``), keeping the ``k`` smallest keys WITHIN EACH
    source: the corpus-mixing primitive that draws a token-weighted,
    rerun-stable quota from every stratum in one pass (a global top-k
    would let one verbose source crowd out the rest).

    Exactness: identical key construction to the global twin — 52-bit
    md5 prefix as an exact double over the integer token weight, one
    correctly-rounded IEEE division — so the oracle twin hashes exactly.

    Scale shape: the ``row_number <= k`` filter over the
    ``partitionBy(source)`` window triggers Spark's WindowGroupLimit
    pushdown (plan-pinned): every map task keeps only its local top-k
    rows PER GROUP before the shuffle, so the exchange carries
    O(tasks·sources·k) rows, never the corpus — the distributed
    per-group top-k plan, not a per-source sort of unbounded
    partitions."""
    docs = read_table(spark, sf_dir, "documents")
    u = F.conv(F.substring(_sample_key(F.col("doc_id")), 1, 13), 16, 10).cast(
        "long"
    )
    w = F.greatest(F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(1))
    cand = docs.select(
        "doc_id",
        "source",
        w.alias("w"),
        (u.cast("double") / w.cast("double")).alias("q"),
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("q").asc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", "w", "rk")
    )


def doc_length_percentile_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source token-length PERCENTILE LADDER (p25/p50/p75/p90/p99)
    as EXACT order statistics — the length profile a curation recipe
    reads before setting chunking/packing parameters (interpolated
    percentiles diverge across engines; the rank-probe
    ``ceil(p·n/100)`` = ``(p·n + 99) DIV 100`` does not — the
    ``orders_percentile_ladder`` convention at document grain).

    Scale shape: the per-source rank runs through
    :func:`relational.two_phase_cumsum` with ``part_cols=("source",)``
    (range-partitioned — a mega-source never becomes one sort task);
    per-source counts ride the same materialized frame (``totals=``);
    the 5-probe join is against an aggregate-sized ladder frame."""
    from .relational import two_phase_cumsum

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
    )
    ranked = two_phase_cumsum(
        docs,
        [F.col("n_toks").asc(), F.col("doc_id").asc()],
        F.lit(1),
        "rk",
        part_cols=("source",),
        totals=((F.count(F.lit(1)).cast("long"), "n_docs"),),
    )
    ps = spark.createDataFrame(
        [(25,), (50,), (75,), (90,), (99,)], "p long"
    )
    return (
        ranked.join(
            F.broadcast(ps),
            F.col("rk") == F.expr("(p * n_docs + 99) DIV 100"),
        )
        .select(
            "source",
            "p",
            F.col("n_docs").alias("n_docs"),
            F.col("n_toks").alias("p_tokens"),
        )
    )


def token_budget_mixture_plan(
    spark: SparkSession, sf_dir: str, budget_ppm: int = 500_000
) -> DataFrame:
    """DATA-MIXTURE PLAN under a token budget — the allocation sheet a
    training run derives from its recipe: given the per-source available
    token mass and the recipe's mixing weights (``source_weights()`` —
    the SAME config ``weighted_source_mix`` enforces), split a total
    budget of ``budget_ppm`` of the corpus across sources by weight with
    LARGEST-REMAINDER rounding (targets sum to the budget EXACTLY — the
    ``order_revenue_allocation`` conservation discipline), and report the
    per-source epoch factor ``epochs_ppm = target·10⁶ DIV available``
    (> 10⁶ means the source repeats — the up-sampling a low-resource
    source pays under a high weight).

    All-integer: budget ``B = T·budget_ppm DIV 10⁶``, base share
    ``(B·w) DIV W``, remainders ranked by ``(B·w) mod W`` (total
    tie-break by source), +1 to the top ``B − Σbase``. Products run in
    DECIMAL(38,0)/HUGEINT (B·w AND target·10⁶ brush 2⁶³ at 100 TB token
    masses — the epochs_ppm product rides the same ladder, ADVICE r11).

    Scale shape: ONE map-side-combined groupBy to the |sources| frame;
    every window after runs on that ≤|recipe| row frame (the documented
    bounded-grain class — the 6-row profile-frame precedent), and the
    weights join is a literal broadcast."""
    docs = read_table(spark, sf_dir, "documents")
    avail = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("avail_tokens"))
    )
    weights = spark.createDataFrame(
        [(s, int(h, 16)) for s, h in source_weights()],
        "source string, weight_64k long",
    )
    frame = avail.join(F.broadcast(weights), "source").localCheckpoint()
    totals = frame.agg(
        F.sum("avail_tokens").alias("t_total"),
        F.sum("weight_64k").alias("w_total"),
    )
    j = frame.crossJoin(F.broadcast(totals)).withColumn(
        "budget",
        F.expr(
            f"CAST(CAST(t_total AS DECIMAL(38,0)) * {budget_ppm}"
            " DIV 1000000 AS BIGINT)"
        ),
    )
    j = j.withColumn(
        "base",
        F.expr(
            "CAST(CAST(budget AS DECIMAL(38,0)) * weight_64k"
            " DIV w_total AS BIGINT)"
        ),
    ).withColumn(
        "rem",
        F.expr(
            "CAST(CAST(budget AS DECIMAL(38,0)) * weight_64k"
            " % w_total AS BIGINT)"
        ),
    )
    # bounded-grain windows: the frame is |sources| rows (<= the recipe
    # size) at ANY corpus scale — the documented acceptable window class
    wrem = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    j = (
        j.withColumn("rem_rank", F.row_number().over(wrem))
        .withColumn(
            "base_sum",
            F.sum("base").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn(
            "target_tokens",
            (
                F.col("base")
                + (
                    F.col("rem_rank") <= F.col("budget") - F.col("base_sum")
                ).cast("long")
            ).cast("long"),
        )
    )
    return j.select(
        "source",
        F.col("avail_tokens").cast("long").alias("avail_tokens"),
        F.col("weight_64k").cast("long").alias("weight_64k"),
        "target_tokens",
        # DECIMAL(38,0) route (ADVICE r11): a plain BIGINT product wraps
        # silently past target_tokens ~9.2e12 — exactly the 100TB token
        # masses the base/rem ladder already guards against
        F.expr(
            "CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000000"
            " DIV avail_tokens AS BIGINT)"
        ).alias("epochs_ppm"),
    )
