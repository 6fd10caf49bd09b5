"""Corpus curation operators: benchmark-contamination detection, DSIR
importance weighting, and domain-mixture rebalancing.

These fill the "what a 100-TB training-data pipeline needs" gaps the
reference does not cover (its ML surface is GCP-API wrappers —
SURVEY.md §2.11):

- ``benchmark_overlap``: flag training documents whose word n-grams
  overlap an evaluation/benchmark set (decontamination). The benchmark
  side is tiny by construction → broadcast hash join on the n-gram
  string; the corpus side is one scan-side explode. No shuffle of
  document text, ever.
- ``dsir_log_ratio``: data-selection importance weights in the DSIR
  style (hashed n-gram language models, target/source log-likelihood
  ratio). Both LMs are fixed-width bucket histograms (default 1024
  rows) → broadcast; the corpus is scanned twice (once to build, once
  to score), both passes scan-side expressions only.
- ``domain_rebalance``: deterministic down-sampling to equalize domain
  shares. Pure integer md5 arithmetic (``bucket * n_d < min_n * 1e6``)
  so the kept set is stable across engines, reruns, and executors —
  and exactly reproducible by the DuckDB oracle.

All md5-keyed decisions follow the same engine-portable idiom as
``packing.hash_split``: first 8 hex chars of md5 → int. 32 bits of
hash per decision is ample for sampling; collisions only perturb the
sample, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _md5_bucket(col: Column, salt: str, mod: int) -> Column:
    """Engine-portable uniform bucket in [0, mod): first 8 md5 hex chars
    as an integer. Matches DuckDB ``('0x'||substr(md5(...),1,8))::BIGINT``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % mod
    )


def word_ngrams(text_col: Column, n: int) -> Column:
    """Distinct word n-grams of ``text_col`` as an array of
    space-joined strings — all scan-side built-ins (lower →
    regexp_extract_all → transform/slice), no UDF."""
    words = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: for every document, the number of
    its distinct word n-grams that also occur in the benchmark set, and
    a flag when the overlap fraction reaches ``threshold_pct``.

    Scale shape: the benchmark n-gram set (distinct, deduplicated) is
    broadcast — benchmarks are thousands of documents, the corpus is
    billions, so the join never shuffles the corpus. The flag compares
    integers (``n_hit * 100 >= n_ngrams * threshold_pct``) so the
    result is exact on every engine. Documents with fewer than ``n``
    words produce no n-grams and are absent from the output (nothing to
    decontaminate against).
    """
    doc_ng = docs.select(
        id_col, F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    bench_ng = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        doc_ng.join(F.broadcast(bench_ng), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_hit"),
        )
        .withColumn(
            "contaminated",
            (F.col("n_hit") * 100 >= F.col("n_ngrams") * threshold_pct).cast("long"),
        )
    )


def dsir_log_ratio(
    docs: DataFrame,
    target: Column,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weight per document: the mean (per token)
    log-likelihood ratio between a hashed-unigram LM of the TARGET
    subset (rows where ``target`` is true) and the LM of the full
    corpus, add-one smoothed. Documents resembling the target domain
    score high; resampling by these weights steers a web-scale corpus
    toward the target distribution.

    Scale shape: tokens hash to ``buckets`` histogram cells via md5
    (engine-portable), so both LMs are ``buckets``-row tables built by
    one count shuffle each and then BROADCAST back; scoring is one
    scan + broadcast joins + per-doc mean. Nothing large ever shuffles.
    The mean (not sum) makes the weight length-invariant.
    """
    tok = docs.select(
        id_col,
        target.alias("__t"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).withColumn(
        # unsalted md5 of the raw token: matches the oracle's md5(token)
        "bk",
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long") % buckets,
    )
    source_lm = tok.groupBy("bk").agg(F.count(F.lit(1)).alias("sc"))
    target_lm = tok.filter(F.col("__t")).groupBy("bk").agg(
        F.count(F.lit(1)).alias("tc")
    )
    totals = tok.agg(
        F.count(F.lit(1)).alias("ts"),
        F.count_if(F.col("__t")).alias("tt"),
    )
    b = F.lit(buckets)
    return (
        tok.join(F.broadcast(source_lm), "bk")
        .join(F.broadcast(target_lm), "bk", "left")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1) / (F.col("tt") + b))
                    - F.log((F.col("sc") + 1) / (F.col("ts") + b))
                ),
                4,
            ).alias("dsir_logratio")
        )
    )


def domain_rebalance(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic domain-mixture rebalancing: down-sample every
    domain to (in expectation) the size of the SMALLEST domain, so the
    kept corpus is uniform across domains. The keep decision is pure
    integer arithmetic — ``md5_bucket(id) * n_d < min_n * 1_000_000`` —
    equivalent to keeping a ``min_n / n_d`` fraction, with no floating
    point and no RNG: the same rows survive on every engine and rerun,
    and adding a new domain never changes which rows of existing
    domains are kept.

    Scale shape: the per-domain histogram is tiny (one row per domain)
    → broadcast back; the filter is scan-side. One count shuffle total.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_d"))
    min_n = counts.agg(F.min("n_d").alias("min_n"))
    bucket = _md5_bucket(F.col(id_col), seed, 1_000_000)
    return (
        df.join(F.broadcast(counts), domain_col)
        .join(F.broadcast(min_n))
        .filter(bucket * F.col("n_d") < F.col("min_n") * F.lit(1_000_000))
        .drop("n_d", "min_n")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weight-proportional sampling without replacement
    (sequential Poisson / priority sampling, Ohlsson '98): each row gets
    priority u/w with u an md5-uniform in [1, 1e6] and w a positive
    INTEGER weight; the k smallest priorities win. Higher weight →
    smaller priority → more likely kept. No RNG: u is md5 of the id, so
    the sample is identical on every engine and rerun — and exactly
    oracle-checkable, because IEEE integer-to-double division is
    bit-exact everywhere (unlike pow/ln, which vary by libm).

    Scale shape: priority is scan-side; top-k lowers to
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows
    — never a global sort of the corpus).
    """
    u = _md5_bucket(F.col(id_col), seed, 1_000_000) + 1
    pri = u.cast("double") / weight.cast("double")
    return (
        df.select(id_col, weight.cast("long").alias("w"), pri.alias("priority"))
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(k)
    )


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based domain resampling at T=2 (exponent alpha=1/2):
    retarget the domain mixture from p_d to q_d = sqrt(p_d)/sum sqrt(p_d')
    — the standard multilingual/multi-domain rebalance (mT5/XLM-R style),
    which upweights small domains and downweights dominant ones. Kept
    fraction per domain f_d = min(1, q_d * N / n_d); rows keep
    deterministically via md5 bucket < round(f_d * 1e6).

    alpha is pinned to 1/2 because sqrt is IEEE-correctly-rounded on
    every engine, so the thresholds (and hence the exact kept set) are
    engine-reproducible — general pow/exp/ln are not. The cross-domain
    normalizer folds in domain-name order so the float sum is
    order-identical on every engine.

    Scale: one tiny count-by-domain aggregate, normalizer computed over
    the handful of domain rows, thresholds broadcast back; the keep
    decision is a scan-side md5 filter. Nothing but per-domain counts
    ever shuffles.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_d"))
    # ordered fold => bit-identical normalizer on every engine
    norm = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col(domain_col), F.col("n_d")))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["n_d"].cast("double")),
        ).alias("z"),
        F.sum("n_d").alias("n_total"),
    )
    thresh = (
        counts.crossJoin(F.broadcast(norm))
        .withColumn(
            "f_d",
            F.least(
                F.lit(1.0),
                F.sqrt(F.col("n_d").cast("double"))
                / F.col("z")
                * F.col("n_total")
                / F.col("n_d"),
            ),
        )
        .select(domain_col, F.round(F.col("f_d") * 1_000_000).cast("long").alias("keep_lt"))
    )
    bucket = _md5_bucket(F.col(id_col), seed, 1_000_000)
    return (
        df.join(F.broadcast(thresh), domain_col)
        .filter(bucket < F.col("keep_lt"))
        .drop("keep_lt")
    )


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram language-model scoring with add-1 smoothing — the KenLM
    counting shape distributed: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).
    Returns (doc_id, mean_logprob) over each document's bigrams
    (documents with fewer than 2 tokens emit nothing).

    Scale: the bigram table is |distinct bigrams| rows and is NOT
    broadcast — scoring joins it back on the (w1,w2) key; the context
    (unigram) table is |vocab| and broadcasts; V is one scalar. The
    TOKENIZED base (id, token-array — ~1x corpus text) is MATERIALIZED
    ONCE (``materialize_once``) and all four consumers — the bigram
    stream feeding the c2 count, the c1 count, the score join, and the
    vocab count — re-derive from the stored arrays with a cheap explode
    instead of re-running the scan + regex tokenization (four
    evaluations before r11; ReuseExchange cannot dedupe HOF-lambda
    subtrees). Only two-word keys shuffle — never documents."""
    from .dedup import materialize_once
    from .text import tokens

    base = materialize_once(
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("ts"))
    )
    big = (
        base.filter(F.size("ts") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts)-1), "
                    "i -> struct(element_at(ts, i) as w1, element_at(ts, i+1) as w2))"
                )
            ).alias("bz"),
        )
        .select(id_col, F.col("bz.w1").alias("w1"), F.col("bz.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = base.select(F.explode("ts").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    return (
        big.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))), 4
            ).alias("mean_logprob")
        )
    )


def epoch_repeats(
    docs: DataFrame,
    domain_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-document repeat counts that EQUALIZE domains by repetition —
    the up-sampling half of mixture control (temperature_resample /
    domain_rebalance down-sample): every domain is repeated to match the
    LARGEST domain's total weight, fractional epochs resolved per
    document (LLaMA-style data scheduling: 2.3 epochs = 2 full copies +
    a 30% md5-deterministic chance of a third).

    Returns (id, domain, n_copies >= 1). Sum over a domain of n_copies
    approaches target/available exactly in expectation and is fully
    deterministic (md5 uniforms — rerun-stable, engine-portable).

    Scale: per-domain totals are a |domains|-row aggregate broadcast
    back; the repeat decision is scan-side arithmetic. Nothing else
    shuffles — the exploded copies (if the caller explodes) inherit the
    scan's partitioning."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    d = docs.select(F.col(id_col), F.col(domain_col).alias("domain"), w.alias("w"))
    totals = d.groupBy("domain").agg(F.sum("w").alias("avail"))
    target = totals.agg(F.max("avail").alias("target"))
    rates = totals.crossJoin(F.broadcast(target))
    # integer micro-rate: pure BIGINT division — float would lose
    # precision past 2^53 (a 10B-doc domain x 1e6 exceeds it); exact up
    # to ~9e12 docs/weight per domain (long overflow bound, documented)
    rates = rates.select(
        "domain",
        F.expr("target * 1000000L DIV avail").alias("rate_ppm"),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(f"rep{seed}"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % 1_000_000
    return (
        d.join(F.broadcast(rates), "domain")
        .select(
            id_col,
            "domain",
            (
                (F.col("rate_ppm") / 1_000_000).cast("long")
                + F.when(u < F.col("rate_ppm") % 1_000_000, 1).otherwise(0)
            ).alias("n_copies"),
        )
    )


def bigram_kn_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the smoothing the real
    KenLM models behind CCNet-style perplexity filters use (add-1 in
    ``bigram_logprob`` is the teaching baseline; KN replaces the raw
    unigram back-off with the CONTINUATION probability, fixing the
    "San Francisco" pathology where a frequent-but-unpromiscuous word
    gets an outsized back-off weight):

        p(w2|w1) = [max(c(w1,w2) - d, 0) + d * N1+(w1.) * N1+(.w2)/B]
                   / c(w1.)

    with d = ``discount``, N1+(w1.) = distinct continuations of w1,
    N1+(.w2) = distinct contexts preceding w2, B = distinct bigram
    types. Returns (doc_id, mean_kn_logprob) over each document's
    bigrams, rounded 4dp (masks libm ULP differences — the family
    precedent; the arithmetic uses ONE shared expression order so both
    engines evaluate the identical float chain).

    Scale shape matches bigram_logprob: the |bigrams| c2 table joins
    back CO-PARTITIONED on (w1,w2) (never broadcast); the per-w1
    context/continuation-fan tables and per-w2 continuation table are
    |vocab| rows and broadcast; B is one scalar."""
    from .text import tokens

    base = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("ts"))
    big = (
        base.filter(F.size("ts") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts)-1), "
                    "i -> struct(element_at(ts, i) as w1, element_at(ts, i+1) as w2))"
                )
            ).alias("bz"),
        )
        .select(id_col, F.col("bz.w1").alias("w1"), F.col("bz.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = big.groupBy("w1").agg(
        F.count(F.lit(1)).alias("c1"), F.countDistinct("w2").alias("fwd")
    )
    cont = big.groupBy("w2").agg(F.countDistinct("w1").alias("bwd"))
    b = c2.agg(F.count(F.lit(1)).alias("b"))
    d = float(discount)
    p = (
        F.greatest(F.col("c2") - d, F.lit(0.0))
        + F.lit(d) * F.col("fwd") * F.col("bwd") / F.col("b")
    ) / F.col("c1")
    return (
        big.join(c2, ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(b))
        .groupBy(id_col)
        .agg(F.round(F.avg(F.log(p)), 4).alias("mean_kn_logprob"))
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    bigram LM (``bigram_logprob``), then split EACH language into
    equal-count tiers by score — head (best mean log-prob = lowest
    perplexity), middle, tail. CCNet keeps head+middle and drops or
    down-weights tail; downstream mixing samples per (lang, tier).

    Determinism: the LM score is the shared 4dp-rounded float both
    engines already hash-match on (gate doc_bigram_logprob); the tier
    is ``ntile(n_buckets)`` over (score DESC, id) so ties are resolved
    identically everywhere. Documents with <2 tokens have no bigram
    score and are excluded, exactly as in the scoring gate.

    Scale: one extra hash-partitioned window over (lang) on top of the
    scorer's shuffles — the window carries only (id, lang, score),
    never text. Per-language partitions are corpus-language-count
    sized; for a 100-TB corpus with a skewed language mix the window
    key is (lang) and AQE skew-split applies (the score join back to
    the doc row is key-partitioned, not broadcast).
    """
    from pyspark.sql.window import Window

    scored = bigram_logprob(docs, id_col=id_col, text_col=text_col)
    langs = docs.select(F.col(id_col), F.col(group_col))
    w = Window.partitionBy(group_col).orderBy(
        F.desc("mean_logprob"), F.asc(id_col)
    )
    tiered = (
        scored.join(langs, id_col)
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )
    tier = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return tiered.select(
        id_col, group_col, "mean_logprob", F.col("bucket"), tier.alias("tier")
    )
