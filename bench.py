"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query
wall seconds. Usage: python bench.py [--sf-dir DIR] [--repeat N]."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from incubator_beam_spark import registry
from incubator_beam_spark.session import get_spark

# Headline set: one per major operator family (kept fast but representative).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_per_key",
    "cogroup_by_key",
    "set_union_distinct",
    "win_rank_functions",
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_session_window",
    "nexmark_q5_hot_items",
    "sql_exists_subquery",
    "fn_string_suite",
    "doc_exact_dedup",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "emb_cosine_topk",
    "emb_neardup_pairs",
    "nexmark_q6_avg_selling_last10",
    "cep_match_recognize",
    # round-2 additions: TPC-H completion, temporal joins, near-dup
    # clustering (iterative CC), batched model inference
    "q2_min_cost_supplier",
    "evt_asof_join",
    "doc_neardup_clusters",
    "emb_inference",
    # full-text retrieval + compressed-vector search
    "doc_bm25_topk",
    "emb_pq_adc_topk",
    # round-3 additions: quality rules, exact-substring dup, PCM decode,
    # synthetic load-gen + the GBK load pipeline over it
    "doc_gopher_rules",
    "doc_substring_dup",
    "mm_audio_rms",
    "io_synthetic_bounded",
    "load_gbk",
    # round-3 session additions: skew-salted join, CDC materialization,
    # z-order layout values, corpus line dedup
    "join_skew_salted",
    "io_cdc_apply",
    "io_zorder_histogram",
    "doc_line_dedup",
    # bloom-prefiltered shuffle join + general (disjoint) merging windows
    "join_bloom_prefilter",
    "evt_disjoint_merge_window",
    # capped sessionization + funnel analysis + retention + anomaly + bigram LM
    "evt_capped_session_window",
    "evt_funnel_steps",
    "evt_retention_cohorts",
    "evt_anomaly_zscore",
    "doc_bigram_logprob",
    # end-to-end curation composition + mixture up-sampling
    "doc_curation_pipeline",
    "doc_epoch_repeats",
    # round-4 additions: TPC-DS conformance shapes (dim join, rollup+rank,
    # cumulative full-outer), CEP bounded quantifiers, ANN recall eval,
    # sketch-accuracy bounds
    "sql_tpcds_q3",
    "sql_tpcds_q36",
    "sql_tpcds_q51",
    "cep_quantifier_bounded",
    "emb_ivf_recall",
    "agg_approx_quantiles_bounds",
    # round-4 session additions: the costliest new TPC-DS shapes (6-way
    # self-join growth chain; deep rollup + rank). Streaming gates stay
    # OUT of the headline on purpose: a scripted drain is ~7s of fixed
    # micro-batch machinery per run, which would swamp the batch
    # throughput signal this lane exists to track.
    "sql_tpcds_q4",
    "sql_tpcds_q4_pivot",
    "sql_tpcds_q67",
    # tokenization is THE hot loop of training-data prep — keep the BPE
    # encoder's throughput visible per round
    "doc_bpe_encode",
    # round-5 additions: the join-heaviest new TPC-DS shape (q72: four
    # dims + inequality date roles + nullable promo left join), the web
    # rollup-rank (q86), and the count-min bounds gate (a full sketch
    # build + broadcast-probe estimate pass)
    "sql_tpcds_q72",
    "sql_tpcds_q86",
    "agg_count_min_bounds",
    # round-6 additions: PREV-navigation MATCH_RECOGNIZE (a Window(lag)
    # feeding the CEP kernel — prices the navigation lowering) and the
    # ALL-ROWS running-measures mode (one output row per matched input
    # row, the kernel's widest emit path)
    "sql_match_recognize_prev",
    "cep_all_rows_running",
    # round-7 additions: cross-symbol DEFINE (the NFA's per-transition
    # compiled predicates — prices the match-state-dependent path), the
    # MEASURES-completeness trio, and the planned Python data source
    # (Arrow-batched partition-parallel generation)
    "sql_match_recognize_cross",
    "cep_measures_complete",
    "io_python_datasource",
    # round-9 additions (the promoted devices' batch hot paths):
    # PageRank (iterative graph rounds), the hashed-ngram classifier
    # and unigram-Viterbi tokenizer (scan-side per-row throughput —
    # training-data prep's hot loops), the IVF-staged kNN label
    # transfer, and the three-signal quality-ensemble verdict (the
    # likeliest real daily job). Streaming devices stay out of the
    # headline (fixed drain machinery would swamp the batch signal).
    "doc_pagerank",
    "doc_hashngram_classify",
    "doc_unigram_viterbi",
    "emb_knn_classify",
    "doc_quality_ensemble",
    # round-10 additions (the promoted devices' batch hot paths):
    # incremental near-dup probe vs the persisted index (the per-ingest
    # dedup cost), the exact whitening moment matrix (one combined
    # Exchange), and the fact-to-fact q72 stand-in (sort-merge, neither
    # side broadcastable). Streaming devices stay out per the standing
    # policy. doc_html_extract is BANKED (unregistered until the r11
    # promotion) — the name-filter below skips it until then, when the
    # crawl-to-text hot path joins the headline automatically.
    "doc_minhash_incremental",
    "emb_second_moments",
    "sql_tpcds_q72_factfact",
    "doc_html_extract",
    # round-11 addition: the crawl-to-training-data funnel end to end
    # (extract -> near-dup -> quality -> FFD pack in one gate — the
    # composed daily job the LLM-data brief asks for; BANKED until the
    # r12 promotion, so the name-filter below skips it till then).
    # stream_ann_serving_et stays out per the streaming-drain policy.
    "doc_crawl_funnel",
]


def _scaled_docs(spark, sf_dir: str, k: int):
    """k deterministic variants of the documents table. Copy i rotates
    the alphabet (scan-side translate), so copies are NOT near-dups of
    each other — the dedup candidate structure scales linearly with the
    corpus instead of quadratically by construction."""
    from functools import reduce

    from pyspark.sql import DataFrame, functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = "abcdefghijklmnopqrstuvwxyz"
    copies = []
    for i in range(k):
        ci = d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i:
            rot = (i % 25) + 1
            ci = ci.withColumn("text", F.translate("text", src, src[rot:] + src[:rot]))
        copies.append(ci)
    return reduce(DataFrame.unionAll, copies)


def _minhash_pair_counters(spark, sf_dir: str, k: int, max_bucket: int = 1000) -> dict:
    """Band-bucket occupancy counters for the minhash scale op (VERDICT
    r10 'What's wrong' 3): ``candidate_pairs`` = sum over KEPT buckets of
    C(n,2) — exactly the band self-join's output size, the term that
    makes the wall exponent ~linear-plus at constant dup density;
    ``hot_buckets_dropped`` / ``averted_pairs`` show whether and how hard
    the max_bucket cap engaged. All computed from the same (band, key)
    structure the op shuffles, untimed."""
    from pyspark.sql import functions as F

    from incubator_beam_spark.dataops import dedup

    docs = _scaled_docs(spark, sf_dir, k)
    sig = docs.select(
        "doc_id", dedup.shingles(F.col("text")).alias("sh")
    ).withColumn("sig", dedup.minhash_signature(F.col("sh"), 8))
    bands = sig.select(
        "doc_id", F.explode(dedup.lsh_band_keys(F.col("sig"), 2)).alias("bk")
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    occ = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("c"))
    npairs = (F.col("c") * (F.col("c") - 1) / 2).cast("long")
    row = occ.agg(
        F.sum(F.when(F.col("c") <= max_bucket, npairs).otherwise(0)).alias("cand"),
        F.sum(F.when(F.col("c") > max_bucket, 1).otherwise(0)).alias("hot"),
        F.sum(F.when(F.col("c") > max_bucket, npairs).otherwise(0)).alias("averted"),
        F.max("c").alias("max_occ"),
    ).collect()[0]
    return {
        "candidate_pairs": int(row["cand"] or 0),
        "hot_buckets_dropped": int(row["hot"] or 0),
        "averted_pairs": int(row["averted"] or 0),
        "max_bucket_occupancy": int(row["max_occ"] or 0),
    }


def _scaled_emb(spark, sf_dir: str, k: int):
    from functools import reduce

    from pyspark.sql import DataFrame, functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = []
    for i in range(k):
        ci = e.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i:
            off = float(i) * 0.0371
            ci = ci.withColumn(
                "embedding", F.transform("embedding", lambda x: x + F.lit(off))
            )
        copies.append(ci)
    return reduce(DataFrame.unionAll, copies)


def scale_lane(spark, sf_dir: str, scales=(1, 10), rounds: int = 3) -> dict:
    """Linear-scaling evidence for the dedup/ANN family (VERDICT r3 item
    9): run each op at 1x and 10x the sf corpus (deterministic synthetic
    variants) and report the wall-clock scaling exponent
    log(t_hi/t_lo) / log(rows_hi/rows_lo) — ~1.0 = linear, <1 =
    overhead-amortized, ~2 = quadratic blow-up.

    VERDICT r9 item 4: a SINGLE (1x, 10x) recording swings up to 2x
    run-to-run on shuffle-dominated ops (minhash read 0.54-1.02 across
    one day's recordings), so each op is now timed ``rounds`` times and
    the committed ``scaling_exponent`` is the MEDIAN, with the
    per-round values and min-max spread alongside — the JSON number
    carries the same integrity as the control band."""
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from incubator_beam_spark.dataops import dedup
    from incubator_beam_spark.dataops.pq import (
        ivfpq_index,
        pq_adc_lut,
        pq_adc_topk,
        pq_codebook,
        quantized,
    )

    def run_minhash(k):
        return dedup.minhash_lsh_pairs(_scaled_docs(spark, sf_dir, k))

    def run_clusters(k):
        d = _scaled_docs(spark, sf_dir, k).select("doc_id")
        w = W.partitionBy("block").orderBy("doc_id")
        edges = (
            d.withColumn("block", F.expr("doc_id div 100"))
            .withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev").isNotNull())
            .select(F.col("doc_id").alias("src"), F.col("prev").alias("dst"))
        )
        return dedup.connected_components(
            edges, nodes=d.select(F.col("doc_id").alias("node"))
        )

    def run_ivfpq(k):
        e = _scaled_emb(spark, sf_dir, k)
        seeds = e.filter(F.col("vec_id") < 16)
        cb = pq_codebook(e, n_centroids=16, m=8)
        idx = ivfpq_index(e, seeds, cb)
        qcell = idx.filter(F.col("vec_id") == 7).select("cell")
        cand = idx.join(F.broadcast(qcell), "cell").select("vec_id", "codes")
        qvec = (
            e.filter(F.col("vec_id") == 7)
            .select(quantized(F.col("embedding")).alias("q"))
            .collect()[0]
            .q
        )
        return pq_adc_topk(cand, pq_adc_lut(cb, list(qvec)), k=10)

    def run_line_dedup(k):
        return dedup.line_dedup(
            _scaled_docs(spark, sf_dir, k), line_tokens=3, max_count=3
        )

    def _scaled_rel(k):
        """k offset copies of (lineitem, orders): l_orderkey and
        o_orderkey shift together so the fact-fact join key space scales
        with the data, while dim keys (partkey/suppkey/custkey) stay
        in-domain so dim joins keep their selectivity."""
        from functools import reduce

        from pyspark.sql import DataFrame

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lcopies, ocopies = [], []
        for i in range(k):
            off = F.lit(i * 10_000_000)
            lcopies.append(li.withColumn("l_orderkey", F.col("l_orderkey") + off))
            ocopies.append(od.withColumn("o_orderkey", F.col("o_orderkey") + off))
        reduce(DataFrame.unionAll, lcopies).createOrReplaceTempView("lineitem")
        reduce(DataFrame.unionAll, ocopies).createOrReplaceTempView("orders")
        spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part")

    def run_sql_rollup_rank(k):
        from incubator_beam_spark.queries import tpcds

        _scaled_rel(k)
        return spark.sql(tpcds._Q67_BODY)

    def run_sql_agg_antijoin(k):
        from incubator_beam_spark.queries import tpcds

        _scaled_rel(k)
        return spark.sql(tpcds._Q78_BODY.replace("{IDIV}", "div"))

    # round-5 breadth (VERDICT r4 item 8): the three most expensive bench
    # queries that had no measured exponent.
    def run_bm25(k):
        from incubator_beam_spark.dataops.retrieval import bm25_topk
        from incubator_beam_spark.queries.dataops import _BM25_TERMS

        return bm25_topk(_scaled_docs(spark, sf_dir, k), list(_BM25_TERMS), k=25)

    def run_bigram(k):
        from incubator_beam_spark.dataops.curation import bigram_logprob

        return bigram_logprob(_scaled_docs(spark, sf_dir, k))

    def run_bloom_join(k):
        from functools import reduce

        from pyspark.sql import DataFrame

        from incubator_beam_spark.dataops.joins import bloom_prefilter_join

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        copies = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
            for i in range(k)
        ]
        fact = reduce(DataFrame.unionAll, copies).select(
            F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
        )
        sup = (
            spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .filter(F.col("s_nationkey") < 5)
            .select("s_suppkey", "s_nationkey")
        )
        joined = bloom_prefilter_join(fact, sup.hint("merge"), on="s_suppkey")
        return joined.groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )

    def run_cep(k):
        """MATCH_RECOGNIZE funnel over k user-offset copies of events:
        new user ids per copy, so the corpus (and the per-key kernel
        work) scales linearly while every key's sequence is unchanged."""
        from functools import reduce

        from pyspark.sql import DataFrame

        from incubator_beam_spark.plans.cep import match_recognize

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        copies = [
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            for i in range(k)
        ]
        matches = match_recognize(
            reduce(DataFrame.unionAll, copies),
            partition_by=["user_id"],
            order_by=["event_id"],
            define={
                "S": F.col("event_type") == "signup",
                "C": F.col("event_type") == "click",
                "P": F.col("event_type") == "purchase",
            },
            pattern="S C{2,4} P",
            measures={"n_rows": ("count", None)},
        )
        return matches.groupBy().agg(F.count(F.lit(1)).alias("n"))

    def run_cep_nav(k):
        """The PREV-navigation pipeline END TO END (verdict r6 item 5):
        run_sql lowers PREV() to a lag Window BEFORE the kernel behind
        one REPARTITION_BY_NUM exchange. This lane structurally catches
        any regression of the r6 AQE-collapse fix (the Window's
        ENSURE_REQUIREMENTS exchange coalescing to 1-2 tasks and
        serializing the Python stage — a ~4x wall hit that shows up
        here as a jump in t_1x AND the exponent)."""
        from functools import reduce

        from pyspark.sql import DataFrame

        from incubator_beam_spark.plans.sqlfront import run_sql

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        copies = [
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            for i in range(k)
        ]
        reduce(DataFrame.unionAll, copies).createOrReplaceTempView(
            "__scale_events"
        )
        out = run_sql(
            spark,
            """
            SELECT user_id, match_number, bottom_event, top_event, n_down, n_up
            FROM __scale_events MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY event_id
              MEASURES LAST(DOWN.event_id) AS bottom_event,
                       LAST(UP.event_id) AS top_event,
                       COUNT(DOWN.*) AS n_down,
                       COUNT(UP.*) AS n_up
              ONE ROW PER MATCH
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (DOWN+ UP+)
              DEFINE DOWN AS value < PREV(value),
                     UP AS value > PREV(value)
            )
            """,
        )
        return out.groupBy().agg(F.count(F.lit(1)).alias("n"))

    def run_cep_cross(k):
        """The cross-symbol compiled-DEFINE path END TO END (verdict r7
        item 5): the sql_match_recognize_cross pipeline — callable
        defines compiled by plans/cepdefine.py into the NFA kernel —
        at ADVERSARIAL anchor density. The fixture's 'signup' rows are
        a sparse (~1/n_event_types) anchor set, exactly the 100-TB
        shape the NFA first-set anchor pruning targets (non-anchor scan
        positions skipped via the codegen'd anchor bool array); a
        pruning regression shows up here as a jump in t_1x AND the
        exponent, not just in a microbenchmark."""
        from functools import reduce

        from pyspark.sql import DataFrame

        from incubator_beam_spark.plans.sqlfront import run_sql

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        copies = [
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            for i in range(k)
        ]
        reduce(DataFrame.unionAll, copies).createOrReplaceTempView(
            "__scale_events_x"
        )
        out = run_sql(
            spark,
            """
            SELECT user_id, match_number, start_event, end_event, n_clicks
            FROM __scale_events_x MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY event_id
              MEASURES FIRST(S.event_id) AS start_event,
                       LAST(R.event_id) AS end_event,
                       COUNT(D.*) AS n_clicks
              ONE ROW PER MATCH
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (S D{1,8} R)
              DEFINE S AS event_type = 'signup',
                     D AS event_type = 'click' AND D.value < LAST(S.value),
                     R AS event_type = 'purchase' AND R.value > LAST(S.value)
            )
            """,
        )
        return out.groupBy().agg(F.count(F.lit(1)).alias("n"))

    # The quality-ensemble verdict is the likeliest real 100-TB daily
    # job in the repo (one shared rules+classifier scan, one tier join)
    # — priced here so its TB-shape cost model is measured, not claimed.
    def run_ensemble(k):
        from incubator_beam_spark.dataops.curation import perplexity_buckets
        from incubator_beam_spark.dataops.inference import hash_ngram_classify
        from incubator_beam_spark.dataops.text import gopher_rules

        docs = _scaled_docs(spark, sf_dir, k)
        with_rules = docs.withColumn(
            "gopher_ok", gopher_rules(F.col("text"))["keep"]
        )
        scan = hash_ngram_classify(with_rules, passthrough=("gopher_ok",)).select(
            "doc_id", "gopher_ok", "pred_class"
        )
        tiers = perplexity_buckets(docs).select("doc_id", "tier")
        keep = (
            F.col("gopher_ok")
            & (F.col("pred_class") != 2)
            & F.coalesce(F.col("tier") != "tail", F.lit(False))
        )
        return scan.join(tiers, "doc_id", "left").select(
            "doc_id", keep.alias("keep")
        )

    # Incremental-minhash PROBE cost vs INDEX size (verdict r9 item 8:
    # the number a 100-TB operator budgets per ingest batch). The index
    # build is the amortized per-retrain artifact, so both indexes are
    # built OUTSIDE the timed region; the timed op is a FIXED incoming
    # batch (the base corpus re-crawled with ' rev') probing the 1x vs
    # 10x band-bucket index — band keys for the batch only, bucket
    # equi-join, exact-Jaccard verify against candidate corpus rows.
    import shutil as _sh
    import tempfile as _tf

    # dirs registered BEFORE the build so the finally below cleans up
    # even when a build fails halfway (ADVICE r10: no orphaned trees)
    _mh_idx: dict[int, str] = {
        _k: _tf.mkdtemp(prefix=f"bench_mh_idx_{_k}_") for _k in scales
    }
    try:
        for _k in scales:
            dedup.minhash_index(_scaled_docs(spark, sf_dir, _k)).write.mode(
                "overwrite"
            ).partitionBy("band").parquet(_mh_idx[_k])
    except BaseException:
        for _p in _mh_idx.values():
            _sh.rmtree(_p, ignore_errors=True)
        raise

    def run_minhash_probe(k):
        idx = spark.read.parquet(_mh_idx[k])
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        incoming = base.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rev")).alias("text"),
        )
        return dedup.minhash_lsh_incremental(
            incoming, idx, _scaled_docs(spark, sf_dir, k)
        )

    # Packing family (VERDICT r10 item 8: the one LLM-data family with
    # no fresh-JVM exponent): FFD sequence packing and the two-level
    # prefix-sum chunk-span map — the latter's no-global-window scaling
    # claim is measured here, not just stated.
    def run_pack(k):
        from incubator_beam_spark.dataops.packing import pack_sequences
        from incubator_beam_spark.dataops.text import token_count

        d = _scaled_docs(spark, sf_dir, k).select(
            "doc_id", token_count(F.col("text")).alias("n_tokens")
        )
        return pack_sequences(d, budget=512, n_partitions=32)

    def run_chunk_spans(k):
        from incubator_beam_spark.dataops.packing import concat_chunk_spans

        return concat_chunk_spans(_scaled_docs(spark, sf_dir, k))

    ops = {
        "doc_minhash_lsh_pairs": run_minhash,
        "doc_minhash_incremental_probe": run_minhash_probe,
        "doc_pack_sequences": run_pack,
        "doc_chunk_spans": run_chunk_spans,
        "doc_neardup_clusters": run_clusters,
        "emb_ivfpq_topk": run_ivfpq,
        "doc_line_dedup": run_line_dedup,
        "sql_tpcds_q67": run_sql_rollup_rank,
        "sql_tpcds_q78": run_sql_agg_antijoin,
        "doc_bm25_topk": run_bm25,
        "doc_bigram_logprob": run_bigram,
        "join_bloom_prefilter": run_bloom_join,
        "cep_match_recognize": run_cep,
        "cep_prev_navigation": run_cep_nav,
        "cep_cross_symbol": run_cep_cross,
        "doc_quality_ensemble": run_ensemble,
    }
    base_rows = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    emb_rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    ev_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out = {}
    try:
        for name, fn in ops.items():
            rows0 = (
                emb_rows if name.startswith("emb_")
                else li_rows if name.startswith(("sql_", "join_"))
                else ev_rows if name.startswith("cep_")
                else base_rows
            )
            lo, hi = scales[0], scales[-1]
            fn(lo).count()  # warmup: codegen + IO cache, untimed
            t_lo, t_hi, exps = [], [], []
            res_rows = {}
            # Spill-pressure pin (VERDICT r11 item 6): for the two ops
            # whose materialize_once artifact is ~1x corpus tokens, read
            # the stored-block footprint (mem vs disk = spilled) of the
            # RDDs each round created — driver-side, OUTSIDE the timed
            # region, attributed by RDD-id delta.
            probe_storage = name in ("doc_bigram_logprob", "doc_line_dedup")
            stored = {}
            for _ in range(max(rounds, 1)):
                times = {}
                for k in scales:
                    pre_ids = (
                        {
                            i.id()
                            for i in spark.sparkContext._jsc.sc()
                            .getRDDStorageInfo()
                        }
                        if probe_storage
                        else None
                    )
                    t0 = time.perf_counter()
                    res_rows[k] = fn(k).count()
                    times[k] = time.perf_counter() - t0
                    if probe_storage:
                        mem = disk = 0
                        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo():
                            if i.id() not in pre_ids:
                                mem += i.memSize()
                                disk += i.diskSize()
                        prev = stored.get(str(k), {"mem_bytes": 0, "disk_bytes": 0})
                        stored[str(k)] = {
                            "mem_bytes": max(prev["mem_bytes"], mem),
                            "disk_bytes": max(prev["disk_bytes"], disk),
                        }
                t_lo.append(times[lo])
                t_hi.append(times[hi])
                exps.append(math.log(times[hi] / times[lo]) / math.log(hi / lo))
            # The reported (t_1x, t_10x, exponent) triple comes from ONE
            # round — the round whose exponent is closest to the median —
            # so log(t_10x/t_1x)/log(10) == scaling_exponent holds for
            # every emitted triple (ADVICE r10: three independent medians
            # could be mutually inconsistent). Per-round exponents +
            # spread still carry the cross-round variance.
            med_exp = statistics.median(exps)
            mi = min(range(len(exps)), key=lambda i: abs(exps[i] - med_exp))
            out[name] = {
                "rows_1x": rows0 * lo,
                "rows_10x": rows0 * hi,
                "result_rows_1x": res_rows[lo],
                "result_rows_10x": res_rows[hi],
                "t_1x_sec": round(t_lo[mi], 3),
                "t_10x_sec": round(t_hi[mi], 3),
                "scaling_exponent": round(exps[mi], 3),
                "triple_from_round": mi,
                "scaling_exponent_rounds": [round(e, 3) for e in exps],
                "scaling_exponent_spread": [
                    round(min(exps), 3), round(max(exps), 3),
                ],
            }
            if stored:
                out[name]["materialized_bytes"] = stored
            if name == "doc_minhash_lsh_pairs":
                # Decompose the ~linear-plus wall exponent (VERDICT r10
                # 'What's wrong' 3): candidate-pair growth inside band
                # buckets vs scan growth. Counted untimed from the same
                # banded structure the op shuffles.
                out[name]["pair_counters"] = {
                    str(k): _minhash_pair_counters(spark, sf_dir, k)
                    for k in (lo, hi)
                }
                c_lo = out[name]["pair_counters"][str(lo)]["candidate_pairs"]
                c_hi = out[name]["pair_counters"][str(hi)]["candidate_pairs"]
                if c_lo and c_hi:
                    out[name]["candidate_pair_exponent"] = round(
                        math.log(c_hi / c_lo) / math.log(hi / lo), 3
                    )
            print(
                f"# scale {name}: {t_lo[mi]:.2f}s @{lo}x -> {t_hi[mi]:.2f}s "
                f"@{hi}x (exp median {exps[mi]:.2f}, "
                f"spread {min(exps):.2f}-{max(exps):.2f} over {len(exps)})",
                file=sys.stderr,
            )
    finally:
        for _p in _mh_idx.values():
            _sh.rmtree(_p, ignore_errors=True)
    return out


def stress_lane(spark, n_events: int = 10_000_000, n_files: int = 20) -> dict:
    """NEXMark STRESS-scale streaming throughput (VERDICT r4 item 4;
    config anchor ``NexmarkSuite.java:73-81``): n_events synthetic bids
    through the STATEFUL streaming Q5 (hot items: chained windowed
    aggregations — count per (window, auction), then argmax per window
    via window_time, Spark 3.4+'s multi-stateful-operator pipeline) and
    Q7 (highest bid per window: one max(struct) aggregate, complete
    mode). Reports events/s over the drain wall-clock and the
    state-store peak (rows + bytes) from the query progress stream.

    The input is written once as an n_files parquet directory and
    streamed with maxFilesPerTrigger so the drain exercises real
    micro-batch state updates, not one giant batch."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    src_dir = tempfile.mkdtemp(prefix="stress_bids_")
    try:
        bids = (
            spark.range(n_events)
            .select(
                F.timestamp_seconds(
                    F.lit(1704067200) + (F.col("id") % 172800)
                ).alias("ts"),
                (F.col("id") % 1000).alias("auction"),
                F.pmod(F.xxhash64("id"), F.lit(10000)).alias("price"),
                F.col("id").alias("bid_id"),
            )
        )
        # Hash-repartition on a COLUMN (not round-robin): round-robin
        # repartition(n) assigns rows to files based on the input slice
        # layout, which follows the session's default parallelism — two
        # machines with different core counts write different file
        # contents from identical code, so micro-batch composition (and,
        # through the CEP buffer cap, matches_out) was env-dependent:
        # 8944 vs 9085 matches on identical code across two environments
        # (VERDICT r7 "what's wrong" #1). Hashing bid_id % n_files maps
        # every row to a file as a pure function of the DATA.
        bids.repartition(n_files, F.col("bid_id") % n_files).write.mode(
            "overwrite"
        ).parquet(src_dir)
        # pin ascending mtimes on the part files: FileStreamSource orders
        # batches by modification time, and a fresh write's mtime ties
        # break arbitrarily — which changes micro-batch composition and
        # (through the CEP buffer cap) matches_out run-to-run. Measured:
        # two writes of IDENTICAL data differed 124656 vs 124733 matches.
        # Deterministic order makes the lane comparable across rounds.
        import glob as _glob

        parts = sorted(_glob.glob(os.path.join(src_dir, "part-*")))
        for k, p in enumerate(parts):
            os.utime(p, (1704067200 + k, 1704067200 + k))
        schema = spark.read.parquet(src_dir).schema

        def drain(df, mode):
            name = f"stress_{abs(hash(mode + src_dir)) % 10**8}"
            q = (
                df.writeStream.outputMode(mode)
                .format("memory")
                .queryName(name)
                .start()
            )
            t0 = time.perf_counter()
            q.processAllAvailable()
            wall = time.perf_counter() - t0
            peak_rows = peak_bytes = 0
            for p in q.recentProgress:
                ops_ = p.get("stateOperators") or []
                peak_rows = max(peak_rows, sum(o["numRowsTotal"] for o in ops_))
                peak_bytes = max(
                    peak_bytes, sum(o["memoryUsedBytes"] for o in ops_)
                )
            rows_out = spark.table(name).count()
            q.stop()
            return wall, rows_out, peak_rows, peak_bytes

        def stream():
            return spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", max(n_files // 10, 1)
            ).parquet(src_dir)

        def run_suite(tag: str) -> dict:
            suite: dict = {}
            # Q7: highest bid per hour — one stateful agg, complete mode.
            q7 = (
                stream()
                .groupBy(F.window("ts", "1 hour"))
                .agg(F.max(F.struct("price", "bid_id")).alias("top"))
            )
            wall, rows_out, pr, pb = drain(q7, "complete")
            suite["q7_highest_value"] = {
                "wall_sec": round(wall, 2),
                "events_per_sec": int(n_events / wall),
                "windows_out": rows_out,
                "state_peak_rows": pr,
                "state_peak_bytes": pb,
            }
            print(
                f"# stress q7{tag}: {n_events} events in {wall:.1f}s = "
                f"{n_events / wall:,.0f} ev/s, state {pr} rows",
                file=sys.stderr,
            )

            # Q5: hot items — chained stateful aggs (watermark + window_time).
            counts = (
                stream()
                .withWatermark("ts", "1 second")
                .groupBy(F.window("ts", "1 hour"), "auction")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            hot = (
                counts.groupBy(F.window(F.window_time("window"), "1 hour"))
                .agg(F.max(F.struct("n", "auction")).alias("top"))
            )
            wall, rows_out, pr, pb = drain(hot, "append")
            suite["q5_hot_items"] = {
                "wall_sec": round(wall, 2),
                "events_per_sec": int(n_events / wall),
                "windows_out": rows_out,
                "state_peak_rows": pr,
                "state_peak_bytes": pb,
            }
            print(
                f"# stress q5{tag}: {n_events} events in {wall:.1f}s = "
                f"{n_events / wall:,.0f} ev/s, state {pr} rows",
                file=sys.stderr,
            )

            # CEP: streaming MATCH_RECOGNIZE — the Python-kernel path,
            # priced honestly at stress scale: three consecutive high bids
            # (p=0.1 each) per auction, hold-until-decided scan, ~1000
            # keys. The per-row cost is the pure-Python stable scan; this
            # lane records what that costs next to the pure-JVM Q5/Q7.
            from incubator_beam_spark.plans.cep import match_recognize_stream

            cep = match_recognize_stream(
                stream(),
                partition_by="auction",
                order_by="bid_id",
                define={"H": F.col("price") >= 9000},
                pattern="H H H",
                measures={
                    "n_rows": ("count", None),
                    "last_bid": ("last", None, "bid_id"),
                },
            )
            wall, rows_out, pr, pb = drain(cep, "append")
            suite["cep_hot_streaks"] = {
                "wall_sec": round(wall, 2),
                "events_per_sec": int(n_events / wall),
                "matches_out": rows_out,
                "state_peak_rows": pr,
                "state_peak_bytes": pb,
            }
            print(
                f"# stress cep{tag}: {n_events} events in {wall:.1f}s = "
                f"{n_events / wall:,.0f} ev/s, {rows_out} matches",
                file=sys.stderr,
            )
            return suite

        out = {"n_events": n_events}
        out.update(run_suite(""))

        # The same three paths on the RocksDB state store (VERDICT r5
        # item 5): at 100 TB the store IS RocksDB, so the default-store
        # numbers alone overstate deployable throughput if the native
        # store priced differently. Same data, same micro-batch cadence;
        # only the provider flips.
        rocks = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, rocks)
        try:
            out["rocksdb"] = run_suite(" [rocksdb]")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return out
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)


R1_COMMIT = "866ff95"


def control_lane(sf_dir: str, repeat: int, current: dict) -> dict | None:
    """Like-for-like drift control (VERDICT r4 'What's wrong' 4): bench
    the round-1 snapshot's own code in a cached git worktree on TODAY's
    machine, intersect its headline with the current run, and emit both
    totals + ratio. A recorded round-over-round slowdown that does NOT
    appear here is environment drift, not a code regression — this makes
    the BENCH JSON self-documenting instead of needing SCALE.md prose."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"spark_graft_r1_{R1_COMMIT}"
    )
    if not os.path.exists(os.path.join(wt, ".git")):
        r = subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", wt, R1_COMMIT],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            print(f"# control: worktree add failed: {r.stderr.strip()}",
                  file=sys.stderr)
            return None
    r = subprocess.run(
        [sys.executable, "bench.py", "--sf-dir", sf_dir, "--repeat", str(repeat)],
        cwd=wt, capture_output=True, text=True, timeout=1800,
    )
    line = next(
        (ln for ln in reversed(r.stdout.strip().splitlines())
         if ln.startswith("{")),
        None,
    )
    if line is None:
        print(f"# control: r1 bench produced no JSON: {r.stderr[-400:]}",
              file=sys.stderr)
        return None
    r1 = json.loads(line)
    common = sorted(set(r1["queries"]) & set(current))
    r1_total = round(sum(r1["queries"][n] for n in common), 4)
    cur_total = round(sum(current[n] for n in common), 4)
    ctl = {
        "r1_commit": R1_COMMIT,
        "n_common": len(common),
        "r1_today_sec": r1_total,
        "current_sec": cur_total,
        "ratio": round(cur_total / r1_total, 4) if r1_total else None,
    }
    print(
        f"# control: r1@today {r1_total}s vs current {cur_total}s over "
        f"{len(common)} common queries = {ctl['ratio']}x",
        file=sys.stderr,
    )
    return ctl


def isolated_scale_lane(sf_dir: str) -> dict | None:
    """Run scale_lane in a SUBPROCESS — a genuinely fresh JVM (VERDICT
    r8 'What's wrong' 1: ``spark.stop()`` + new session reuses the
    resident py4j JVM, whose accumulated code-cache/heap state inflates
    the 10x runs ~2x 'by construction'; the citable exponents were
    fresh-session-only prose in SCALE.md until now). Same isolation the
    control lane already gets. Returns the ops dict, or None on
    failure (caller falls back to the embedded lane, labeled)."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        r = subprocess.run(
            [sys.executable, "bench.py", "--scale-lane-only", "--sf-dir", sf_dir],
            cwd=repo, capture_output=True, text=True, timeout=1800,
        )
    except (subprocess.TimeoutExpired, OSError) as e:
        # a wedged subprocess must not abort the whole bench run after
        # the headline phase already completed — fall back, labeled
        print(f"# scale: isolated subprocess failed: {e!r}", file=sys.stderr)
        return None
    line = next(
        (ln for ln in reversed(r.stdout.strip().splitlines())
         if ln.startswith("{")),
        None,
    )
    if r.returncode != 0 or line is None:
        print(f"# scale: isolated subprocess failed: {r.stderr[-400:]}",
              file=sys.stderr)
        return None
    for ln in r.stderr.splitlines():  # relay per-op progress lines
        if ln.startswith("# scale"):
            print(ln, file=sys.stderr)
    try:
        return json.loads(line)
    except ValueError as e:
        # a stray '{'-prefixed log line is not a reason to abort the
        # bench after the headline phase — fall back, labeled
        print(f"# scale: isolated subprocess emitted non-JSON line: {e}",
              file=sys.stderr)
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1, help="untimed passes per query")
    ap.add_argument("--all", action="store_true", help="bench every registered query")
    ap.add_argument(
        "--scale-lane-only",
        action="store_true",
        help="run ONLY the 1x-vs-10x scaling lane and print its JSON "
        "(used by the parent bench process for a fresh-JVM measurement)",
    )
    ap.add_argument(
        "--no-scale-lane",
        action="store_true",
        help="skip the 1x-vs-10x dedup/ANN scaling lane",
    )
    ap.add_argument(
        "--no-stress-lane",
        action="store_true",
        help="skip the 10M-event NEXMark streaming throughput lane",
    )
    ap.add_argument(
        "--no-control",
        action="store_true",
        help="skip the r1-worktree like-for-like drift control",
    )
    ap.add_argument(
        "--stress-events",
        type=int,
        default=10_000_000,
        help="event count for the streaming stress lane",
    )
    ap.add_argument(
        "--reset-anchor",
        action="store_true",
        help="deliberately reset the mirror's r1-time anchor (use when "
        "the box or the workload legitimately changed; the control "
        "ratio guard still applies)",
    )
    args = ap.parse_args()

    if args.scale_lane_only:
        spark = get_spark("incubator_beam_spark-bench-scale")
        spark.range(1000).selectExpr("sum(id)").collect()
        print(json.dumps(scale_lane(spark, args.sf_dir)))
        return

    registry.load_all()
    names = sorted(registry.QUERIES) if args.all else [
        n for n in HEADLINE if n in registry.QUERIES
    ]

    spark = get_spark("incubator_beam_spark-bench")
    # JVM + codegen warmup on a trivial action so q1 isn't charged for startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    def cleanup() -> None:
        """Release state one query can leak into the next's timing: cached
        plans, localCheckpoint blocks (iterative ops), temp views, and
        python garbage — VERDICT r2 traced a 6x recorded-vs-isolated gap
        to exactly this cross-query interference."""
        import gc

        try:
            spark.catalog.clearCache()
            it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:
            pass
        gc.collect()

    per_query: dict[str, float] = {}
    for name in names:
        q = registry.QUERIES[name]
        for _ in range(max(args.warmup, 0)):
            q.fn(spark, args.sf_dir).count()  # JVM/codegen/IO warmup, untimed
        cleanup()
        best = None
        for _ in range(max(args.repeat, 1)):
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf_dir)
            n = df.count()  # materialize the full result
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_query[name] = round(best, 4)
        cleanup()
        print(f"# {name}: {best:.3f}s rows={n}", file=sys.stderr)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The stdout ONE-LINE JSON is now MINIMAL: metric/value/unit/sf +
    # the per-query map, nothing else (VERDICT r11 item 1: the r10
    # line, with lanes and control inlined, was too long to survive
    # the driver's snapshot — parsed: null — which killed the
    # round-over-round comparison twice). Lanes and control detail
    # live ONLY in the mirror file (BENCH_full_latest.json /
    # BENCH_full_outofband.json); no stdout consumer needs them.
    out = {
        "metric": "total_wall_sec_headline_queries",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else args.sf_dir,
    }
    if not args.no_scale_lane and not args.all:
        # Isolated fresh-JVM subprocess — the exponents the JSON records
        # are now the CITABLE ones (SCALE.md's fresh-session numbers),
        # not the resident-JVM-inflated embedded readings. The parent
        # session keeps running; the subprocess JVM is its own process.
        spark.stop()  # don't bench a 10x shuffle beside a loaded 48g heap
        iso = isolated_scale_lane(args.sf_dir)
        if iso is not None:
            out["scale_lane"] = {"lane": "isolated_fresh_jvm", **iso}
        spark = get_spark("incubator_beam_spark-bench-lanes")
        spark.range(1000).selectExpr("sum(id)").collect()
        if iso is None:
            # fallback: in-process lane, honestly labeled as inflated
            out["scale_lane"] = {
                "lane": "embedded_resident_jvm_fallback",
                **scale_lane(spark, args.sf_dir),
            }
    elif not args.no_stress_lane and not args.all:
        # stress lane still wants a clean session when the scale lane
        # didn't already provide one
        spark.stop()
        spark = get_spark("incubator_beam_spark-bench-lanes")
        spark.range(1000).selectExpr("sum(id)").collect()
    if not args.no_stress_lane and not args.all:
        cleanup()
        out["stress_lane"] = stress_lane(spark, n_events=args.stress_events)
    if not args.no_control and not args.all:
        # run LAST, sequentially, and with THIS session's JVM stopped: a
        # second Spark JVM benching against a resident 48g heap measures
        # memory pressure, not the r1 code (first control recording
        # showed r1 2.5x slower purely from running beside the loaded
        # JVM; stopping the session restored parity).
        spark.stop()
        ctl = control_lane(args.sf_dir, args.repeat, per_query)
        if ctl is not None:
            out["control"] = ctl
    out["queries"] = per_query
    # Mirror policy (VERDICT r10 'What's wrong' 1, in code not prose):
    # a recording whose own like-for-like control exceeds the 1.2
    # drift threshold is an OUT-OF-BAND recording — the machine was
    # measurably hotter than the r1 baseline re-run minutes apart on
    # identical code — so it must not replace the committed mirror.
    # It lands in BENCH_full_outofband.json instead (same schema),
    # keeping BENCH_full_latest.json's control always <= 1.2.
    # A recording with NO control at all (control_lane failed, or the
    # run skipped it via --no-control/--all/--scale-lane flags) is
    # UNVERIFIED and must not replace the committed mirror either —
    # the guard's whole point is that the mirror's control is always
    # present and <= 1.2 (round-11 review finding).
    # The ratio alone cannot catch a BOX-WIDE slowdown that inflates
    # both control arms equally (r11 close-out: a host-contention storm
    # read r1@today 65.5s where the committed mirror's control read
    # 12.8s on IDENTICAL r1 code — ratio 0.37, guard green, every
    # number 2-5x inflated). The r1 arm is a pure box-state anchor —
    # same code, same SF, every run — so a large deviation from the
    # committed mirror's r1 time proves the machine, not the code,
    # changed: refuse the mirror in either direction.
    ratio = (out.get("control") or {}).get("ratio")
    r1_now = (out.get("control") or {}).get("r1_today_sec")
    r1_anchor = None
    mirror = "BENCH_full_latest.json"
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), mirror)
        ) as f:
            prev_mirror = json.load(f)
        prev_ctl = prev_mirror.get("control") or {}
        # The anchor is only comparable when the committed mirror ran
        # the same workload: same sf and the same common-query count
        # (ADVICE r11 — an sf/headline-set change would otherwise make
        # every future run >1.5x off with no self-heal path).
        if prev_mirror.get("sf") == out.get("sf") and prev_ctl.get(
            "n_common"
        ) == (out.get("control") or {}).get("n_common"):
            r1_anchor = prev_ctl.get("r1_today_sec")
    except (OSError, ValueError):
        pass
    if args.reset_anchor:
        # deliberate anchor reset (box or workload legitimately changed):
        # skip the absolute-anchor comparison for THIS run only; the
        # control-ratio (<=1.2) guard still applies.
        r1_anchor = None
    anchor_off = (
        r1_anchor is not None
        and r1_now is not None
        and not (r1_anchor / 1.5 <= r1_now <= r1_anchor * 1.5)
    )
    if ratio is None or ratio > 1.2 or anchor_off:
        mirror = "BENCH_full_outofband.json"
        why = (
            "no control lane in this run"
            if ratio is None
            else f"control {ratio}x > 1.2"
            if ratio > 1.2
            else f"r1 anchor {r1_now}s vs committed {r1_anchor}s (>1.5x off: "
            "box state changed, recording not comparable)"
        )
        print(
            f"# {why}: out-of-band recording — mirror NOT overwritten, "
            f"full JSON written to {mirror}",
            file=sys.stderr,
        )
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), mirror),
            "w",
        ) as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    slim = {
        k: out[k] for k in ("metric", "value", "unit", "sf", "queries")
        if k in out
    }
    # Compact control anchor (~60 bytes — VERDICT r11 item 4): the r1
    # snapshot runs inside EVERY bench invocation, so emitting its two
    # totals lets the driver's separate 8-core and 32-core runs be
    # normalized against each other (ratio_current / ratio_r1 cancels
    # box-state drift between the two invocations). Lane/stress detail
    # stays mirror-only; the stdout line stays snapshot-safe.
    if out.get("control"):
        slim["control"] = {
            "r1": out["control"].get("r1_today_sec"),
            "cur": out["control"].get("current_sec"),
            "n": out["control"].get("n_common"),
        }
    print(json.dumps(slim, separators=(",", ":")))


if __name__ == "__main__":
    main()
