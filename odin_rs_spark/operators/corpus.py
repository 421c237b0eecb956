"""Training-corpus construction operators (north-star scope: the ops a
large-scale LLM data pipeline runs between raw documents and training
shards). All are deterministic — sampling decisions derive from the
portable md5 hash, not an RNG — so runs are reproducible across engines
and re-executions, and every operator here is value-checkable against a
plain-SQL oracle.

Scale notes: every op is a narrow projection/filter or a single keyed
window — no driver collects, no cross joins. Contamination check joins
on shingle hashes (equi-join, broadcastable benchmark side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from odin_rs_spark.operators.dedup import portable_hash60, shingles_from_words


def _salted_hash(c: Column, salt: str = "") -> Column:
    """The module's ONE salted portable hash (used by hash_fraction,
    source_quota, shard_assignments — one definition, no drift)."""
    return portable_hash60(F.concat(c.cast("string"), F.lit(salt)))


def hash_fraction(c: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) draw per value: portable_hash60 of
    the value (+ salt) scaled by 2^60. The same id always draws the same
    number — in any engine — so samples are stable across reruns,
    backfills, and engine migrations (the property that matters for
    reproducible training mixes; an RNG-based sample() has none of it).
    """
    return _salted_hash(c, salt) / F.lit(float(1 << 60))


def hash_sample(
    df: DataFrame, fraction: float, key: str, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with draw < fraction."""
    return df.filter(hash_fraction(F.col(key), salt) < F.lit(float(fraction)))


def source_mix(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Weighted source mixing: per-source deterministic sampling rates
    (the "data recipe" step — e.g. keep 100% of wiki, 10% of crawl).
    Unlisted sources get default_rate. One scan, no shuffle.
    """
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_fraction(F.col(key), salt) < rate)


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled source rebalancing: resample so the kept
    corpus' source shares follow p_s^alpha (renormalized) — the
    multilingual sampling rule popularized by mBERT / XLM-R (alpha in
    (0,1) flattens the source distribution toward uniform; alpha=1
    keeps it unchanged). No source is upsampled (a deterministic
    Bernoulli filter cannot repeat rows): keep rates are
    r_s = (n_min/n_s)^(1-alpha), so the rarest source keeps everything
    and kept counts satisfy r_s·n_s ∝ p_s^alpha.

    Plan shape: one tiny per-source count agg (map-side combinable)
    broadcast-joined back onto the corpus, then the hash-Bernoulli
    filter — one wide scan, one broadcast, the corpus itself never
    shuffles.

    alpha=0.5 computes rates with sqrt() instead of pow(): IEEE-754
    sqrt is correctly rounded in every engine while pow(x, 0.5) need
    not be, so keep decisions at a rate boundary are bit-reproducible
    across engines at the default temperature.
    """
    # NULL sources form their own group: a plain equi-join would drop
    # every NULL-source row silently (SQL NULL != NULL), inconsistent
    # with source_mix's default_rate handling — normalize through a
    # sentinel on both sides instead
    src = F.coalesce(F.col(source_col).cast("string"), F.lit("\u0000null"))
    counts = df.groupBy(src.alias("__src")).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    n_min = counts.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin") / F.col("__n")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        F.col("__src"), rate.alias("__rate")
    )
    return (
        df.withColumn("__src", src)
        .join(F.broadcast(rates), "__src")
        .filter(hash_fraction(F.col(key), salt) < F.col("__rate"))
        .drop("__rate", "__src")
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    shingle_n: int = 3,
    min_hits: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Benchmark-contamination detection: docs sharing ≥ min_hits
    distinct n-gram shingles with any benchmark item.

    Shingle hashes on both sides → explode → equi-join on the hash
    (benchmark side is small → broadcast), count distinct shared
    shingles per (doc, bench) pair. At 100 TB the doc side stays
    partitioned; only (doc_id, shingle_hash) pairs flow.
    Output: (doc_id, bench_id, n_shared).

    The hash is only a JOIN KEY — the output (shared-shingle counts) is
    identical for any injective-modulo-collisions hash — so the default
    is the engine hash (xxhash64, ~2× cheaper than md5 over a corpus'
    shingle stream). Pass portable=True to hash with `portable_hash60`
    when the hashed stream itself is persisted as a cross-engine
    fingerprint store.
    """

    def hashed(df: DataFrame, idc: str, txt: str, out_id: str) -> DataFrame:
        from odin_rs_spark.functions.text import norm_text

        hfn = portable_hash60 if portable else F.xxhash64
        return (
            df.select(
                F.col(idc).alias(out_id),
                F.split(norm_text(F.col(txt)), " ").alias("__w"),
            )
            .select(out_id, shingles_from_words(F.col("__w"), shingle_n).alias("__sh"))
            .select(out_id, F.explode_outer("__sh").alias("__s"))
            # blank/NULL text yields the single empty shingle — without
            # this filter every blank doc "matches" every blank
            # benchmark row and gets flagged contaminated
            .filter(F.col("__s") != "")
            .select(out_id, hfn(F.col("__s")).alias("__h"))
        )

    d = hashed(docs, id_col, text_col, "doc_id")
    b = F.broadcast(hashed(benchmark, bench_id_col, bench_text_col, "bench_id"))
    return (
        d.join(b, "__h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count_distinct("__h").alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    partition_col: Column | None = None,
) -> DataFrame:
    """Stream-slice sequence packing: concatenate docs in id order and
    cut the token stream at max_tokens boundaries; each doc lands in the
    chunk where its LAST token falls (counts capped at max_tokens so an
    oversized doc advances exactly one chunk). This is the standard
    concat-then-slice training layout, document-aligned at boundaries —
    a chunk can exceed the budget by less than one doc, it is NOT
    best-fit bin packing.

    Deterministic and expressible as one window cumsum, so the oracle
    reproduces it and the operator needs no stateful iteration. With
    `partition_col` packing restarts per partition (e.g. per source/
    shard), which is also how you bound window state at 100 TB — a
    single global cumsum window would funnel everything through one
    task.
    Output: input columns + (chunk_id, chunk_pos).
    """
    part = [partition_col] if partition_col is not None else []
    w = Window.partitionBy(*part).orderBy(F.col(id_col).asc())
    capped = F.least(F.col(token_count_col).cast("long"), F.lit(int(max_tokens)))
    run = F.sum(capped).over(w)
    # ceil(run/max) - 1 == (run - 1) div max for run >= 1: pure integer
    # form (no double round-trip, no 2^53 precision cliff, no clamp)
    out = df.withColumn("__run", run).withColumn(
        "chunk_id", F.expr(f"(__run - 1) div {int(max_tokens)}")
    ).drop("__run")
    wp = Window.partitionBy(*part, "chunk_id").orderBy(F.col(id_col).asc())
    return out.withColumn(
        "chunk_pos", (F.row_number().over(wp) - 1).cast("long")
    )


def source_quota(
    df: DataFrame,
    n_max: int,
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-source document quota: keep at most n_max docs per source,
    chosen in deterministic portable-hash order — the hard-cap
    complement of `temperature_mix`'s proportional resampling ("no
    source may contribute more than N docs"). The hash order makes the
    kept set stable across engines, runs, and input order; ordering is
    on the raw 60-bit hash INTEGER (not the [0,1) fraction — dividing
    60-bit hashes into 53-bit doubles can collide, and a collision
    would let the engines tiebreak different rows). One window shuffle
    partitioned by source.
    """
    h = _salted_hash(F.col(key), salt)
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_max)
        .drop("__rn")
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int = 64,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic training-order shuffle + shard assignment: the
    global order is the portable hash of the key — a fixed pseudorandom
    permutation reproducible across engines, runs, and backfills (an
    RNG shuffle is none of those) — with shard = hash mod n_shards and
    pos = rank of the hash within its shard.

    Scale shape: shard assignment is a narrow projection; the
    within-shard position is ONE shuffle partitioned by shard, so each
    writer task sorts only its own shard — the classic sharded-write
    layout (no global sort, no driver ordering).

    Output: input columns + (shard int, pos long).
    """
    h = _salted_hash(F.col(key), salt)
    w = Window.partitionBy("shard").orderBy("__h", key)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into fixed-size word-window chunks with overlap
    (stride < chunk_size), the standard context-window prep for training
    and retrieval corpora. Chunk starts are 0, stride, 2·stride, … while
    < n_words, so every word lands in ≥1 chunk and consecutive chunks
    overlap by (chunk_size − stride) words.

    One explode, no shuffle: chunking is embarrassingly parallel per
    doc; downstream packing/grouping decides the partitioning. Output:
    (id, extra…, chunk_id, chunk_text, n_words).
    """
    from odin_rs_spark.functions.text import norm_text

    if stride <= 0 or stride > chunk_size:
        # stride > chunk_size would silently drop the words between
        # chunk ends and the next stride boundary; stride <= 0 divides
        # by zero — both violate the every-word-covered invariant
        raise ValueError(
            f"stride must be in [1, chunk_size={chunk_size}], got {stride}"
        )
    words = F.split(norm_text(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col), *[F.col(c) for c in extra_cols], words.alias("__w")
    ).withColumn("__n", F.size("__w"))
    n_chunks = F.lit(1) + F.expr(f"(__n - 1) div {stride}")
    exploded = base.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        "__w",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    cw = F.slice(F.col("__w"), F.col("chunk_id") * stride + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        "chunk_id",
        F.array_join(cw, " ").alias("chunk_text"),
        F.size(cw).alias("n_words"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
    salt: str = "dsir",
    round_to: int = 6,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): pick the k raw-corpus documents that look most
    like the target corpus. Importance weight per doc under add-one-
    smoothed unigram LMs trained on target and raw:

        ln w(d) = sum_tok [ln p_target(tok) - ln p_raw(tok)]

    and sampling WITHOUT replacement via the Gumbel-max trick (the
    paper's sampling scheme): key = ln w + Gumbel(0,1), take top-k. The
    Gumbel draw derives from the portable doc hash — u = (h + 0.5)/2^60,
    g = -ln(-ln(u)) — so selection is deterministic, reproducible across
    engines, and replayable by the SQL oracle.

    Scale shape: one vocabulary aggregation per corpus (map-side
    combinable word counts), one vocab-side merge join (both sides are
    vocabulary-sized — Heaps' law keeps them tiny relative to the
    corpus), one token→vocab equi-join where only (id, word) pairs
    move, one per-doc aggregation, one TakeOrdered. Documents never
    shuffle; nothing collects.
    """
    from odin_rs_spark.functions.text import norm_text

    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("__t"),
        )

    raw_toks = toks(raw)
    ct = toks(target).groupBy("__t").agg(F.count(F.lit(1)).alias("__ct"))
    cr = raw_toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__cr"))
    vocab = ct.join(cr, "__t", "full").select(
        "__t",
        F.coalesce("__ct", F.lit(0)).alias("__ct"),
        F.coalesce("__cr", F.lit(0)).alias("__cr"),
    )
    totals = F.broadcast(
        vocab.agg(
            F.sum("__ct").cast("double").alias("__Nt"),
            F.sum("__cr").cast("double").alias("__Nr"),
            F.count(F.lit(1)).cast("double").alias("__V"),
        )
    )
    # per-token ratio uses only vocabulary counts; the corpus-size terms
    # factor out as n_tokens * (ln(Nr+V) - ln(Nt+V))
    scored = (
        raw_toks.join(vocab, "__t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("__ct") + 1.0) - F.log(F.col("__cr") + 1.0)).alias("__s"),
        )
        .crossJoin(totals)
        .withColumn(
            "__lnw",
            F.col("__s")
            + F.col("n_tokens") * (F.log(F.col("__Nr") + F.col("__V")) - F.log(F.col("__Nt") + F.col("__V"))),
        )
    )
    u = (_salted_hash(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    out = scored.withColumn("__key", F.col("__lnw") + gumbel)
    return (
        out.orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "n_tokens",
            F.round("__lnw", round_to).alias("ln_weight"),
            F.round("__key", round_to).alias("gumbel_key"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    fraction: float,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exact-count stratified sample: per stratum, keep EXACTLY
    ceil(fraction·n_stratum) rows — the ones with the smallest portable
    hash draw (ties broken by key). `hash_sample` gives each stratum a
    binomial count; this gives the guaranteed per-stratum quota a
    balanced eval split or a per-language calibration set needs, while
    keeping the same engine-portable determinism (the kept set is a pure
    function of (key, salt), never of partitioning or an RNG).

    One shuffle: a window over the strata columns computes both the
    stratum size and the hash rank in a single pass — no pre-count join,
    no driver collect. Skew note: a stratum is a language/source-sized
    group, so a single window partition holds an entire stratum; at
    100 TB with few huge strata, pre-aggregate the counts instead and
    sample via the threshold trick (hash < quantile) — this exact-rank
    form is for stratum counts that fit a partition (the eval-split use
    case).
    """
    h = hash_fraction(F.col(key), salt)
    w = Window.partitionBy(*strata)
    wr = w.orderBy(h.asc(), F.col(key).asc())
    need = F.ceil(F.count(F.lit(1)).over(w) * F.lit(float(fraction)) - F.lit(1e-9))
    return (
        df.withColumn("__rk", F.row_number().over(wr))
        .withColumn("__need", need)
        .filter(F.col("__rk") <= F.col("__need"))
        .drop("__rk", "__need")
    )


def select_until_budget(
    df: DataFrame,
    score_col: str,
    token_col: str,
    budget: int,
    key: str = "doc_id",
    num_ranges: int = 32,
) -> DataFrame:
    """Token-budget data selection: walk the corpus in (score DESC, key
    ASC) order and keep documents while the running token total stays
    within `budget` — "take the best docs until the training budget is
    full", the final step of a scored data recipe.

    The naive form is a global-order window cumsum = ONE partition doing
    all the work. This implementation is the distributed two-phase
    prefix sum: range-partition on the sort key (`repartitionByRange`
    samples the distribution, so ranges balance even when scores skew),
    cumsum WITHIN each range partition, and add each partition's prefix
    offset — computed from a tiny per-partition total aggregate
    (num_ranges rows, broadcast back). The corpus shuffles once (the
    range exchange); the only other moving data is num_ranges rows.
    Partition count is a knob: at 100 TB raise num_ranges so each range
    holds ~one executor-core's worth of rows.

    Keep rule is inclusive-while-fits: a doc is kept iff every token up
    to AND including it fits the budget (prefix + within-cumsum <=
    budget). Deterministic: (score, key) totally orders the corpus.
    """
    from pyspark.sql.functions import spark_partition_id

    order = [F.col(score_col).desc(), F.col(key).asc()]
    ranged = df.repartitionByRange(num_ranges, *order).withColumn(
        "__pid", spark_partition_id()
    )
    # per-partition token totals -> prefix offsets (bounded: num_ranges
    # rows; broadcast back as a tiny dim join)
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum(F.col(token_col).cast("long")).alias("__t"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__t").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    wp = Window.partitionBy("__pid").orderBy(*order)
    return (
        ranged.withColumn(
            "__cum", F.sum(F.col(token_col).cast("long")).over(wp)
        )
        .join(F.broadcast(totals), "__pid")
        .filter(F.col("__offset") + F.col("__cum") <= F.lit(int(budget)))
        .drop("__pid", "__cum", "__offset")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES / exponential-clocks): row i draws u_i from the
    portable hash and gets clock e_i = −ln(u_i)/w_i; the k smallest
    clocks are a weighted sample without replacement — P(i first) =
    w_i/Σw, exactly. This is THE primitive for "sample k documents
    proportional to quality/length" in a training-mix recipe, and the
    deterministic-hash draw makes the sample stable across reruns,
    backfills and engines (same property as hash_sample, same reason).

    Scale shape: one projection + one distributed TakeOrdered(k) —
    the corpus never shuffles; rows with weight <= 0 are excluded
    (their inclusion probability is 0). u = (h + 0.5)/2^60 keeps u
    strictly inside (0,1) (the dsir_select convention), so ln is
    finite and the clock is SQL-replayable."""
    w = F.col(weight_col).cast("double")
    u = (_salted_hash(F.col(key), salt).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 60)
    )
    clock = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__e", clock)
        .orderBy("__e")
        .limit(k)
        .withColumnRenamed("__e", "clock")
    )


def mixture_sample(
    df: DataFrame,
    weights: DataFrame,
    domain_col: str = "source",
    key_col: str = "doc_id",
    default_rate_milli: int | None = None,
) -> DataFrame:
    """Deterministic per-domain DOWN-SAMPLING to a target mixture —
    the static-reweighting step (CCNet per-source rates / DoReMi-style
    domain weights applied at materialization): each domain carries a
    keep-rate in milli-units (`rate_milli` 0..1000 in the `weights`
    dim) and a document survives iff

        bucket = parse_hex(md5(key ‖ domain)[:8]) % 1000 < rate_milli

    The md5-derived bucket makes the sample REPRODUCIBLE (same corpus
    + same weights → the same documents, on any cluster size — no RNG
    state, no partition sensitivity) and STABLE under weight changes
    (raising a rate only ADDS documents; it never swaps the kept set,
    because the bucket is a pure function of the row). Adds `bucket`
    and keeps surviving rows.

    Domains ABSENT from the weights dim are handled EXPLICITLY
    (r9 self-review — silence here mis-sizes a corpus): with
    `default_rate_milli=None` (the default) they are dropped, which
    is the "weights DEFINE the corpus" reading; pass an integer to
    keep unknown domains at that rate instead.

    Scale shape: weights is a per-domain dim (broadcast hash join);
    the filter is pure column math — zero shuffle beyond the
    broadcast, zero Python. Reference parity: corpus-pipeline surface
    beyond the reference (odin-rs has no sampling notion)."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(key_col).cast("string"),
                        F.lit("|"),
                        F.col(domain_col),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 1000
    )
    if default_rate_milli is None:
        out = df.join(F.broadcast(weights), domain_col)
    else:
        out = df.join(F.broadcast(weights), domain_col, "left").withColumn(
            "rate_milli",
            F.coalesce(F.col("rate_milli"), F.lit(int(default_rate_milli))),
        )
    return out.withColumn("bucket", bucket).filter(
        F.col("bucket") < F.col("rate_milli")
    )
