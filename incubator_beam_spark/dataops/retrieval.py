"""Full-text retrieval over a document corpus: BM25 scoring and
RAG-style overlapping token chunking.

Reference parity: the reference ships TF-IDF as a canonical example
pipeline (``sdks/python/apache_beam/examples/complete/tfidf.py``) built
from CoGroupByKey over (word, doc) pairs; BM25 is the modern drop-in for
the same inverted-index shape. Chunking mirrors the fixed-size
window-with-stride pre-processing used by RAG ingestion pipelines.

Scale design (100 TB corpus, short query):
- The ONLY per-token shuffle is (doc_id, term) counts for QUERY terms —
  the corpus token stream is filtered against the broadcast query-term
  literal BEFORE any aggregation, so a 3-term query shuffles ~3 rows per
  matching doc, never the full token stream.
- Document length and the corpus-wide (N, avgdl) scalars come from a
  scan-side projection + one tiny global aggregate that is cross-joined
  back (broadcast of a single row).
- Per-term document frequencies are |Q| rows — broadcast-joined.
- Final top-k lowers to TakeOrderedAndProject (per-partition heaps), no
  global sort of the scored corpus.
- Chunking is pure scan-side Catalyst (sequence + slice + explode):
  zero shuffles, and the output explodes ~n/stride rows per doc with no
  driver involvement.

Cross-engine determinism: scores use only +,*,/ and ln over small exact
integers, rounded to 4 decimals before comparison; ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def doc_lengths(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token count (scan-side, no shuffle)."""
    return df.select(id_col, F.size(tokens(F.col(text_col))).cast("long").alias("dl"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Sparck-Jones; Lucene's
    non-negative idf variant ``ln(1 + (N - df + .5)/(df + .5))``).

    Returns (doc_id, score) for the k highest-scoring documents;
    score rounded to 4 decimals, ties broken by doc_id ascending.
    """
    toks = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    # corpus scalars: one row, broadcast via cross join
    stats = doc_lengths(df, id_col, text_col).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # filter against the broadcast query literal BEFORE any shuffle:
    # only (doc, query-term) pairs reach the aggregation. The tf table
    # is materialized once (r11): the df_t count AND the scoring join
    # both consume it — before, each re-ran the scan+tokenize+explode
    # (ReuseExchange cannot dedupe HOF-lambda subtrees).
    from .dedup import materialize_once

    tf = materialize_once(
        toks.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def chunk_tokens(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into fixed-size windows that
    start every ``stride`` tokens (overlap = size - stride), the standard
    RAG-ingestion chunking shape. The final window may be shorter than
    ``size``; empty documents produce no chunks.

    Pure scan-side Catalyst: tokenize once, generate start offsets with
    ``sequence``, slice per offset, explode — no shuffle, no UDF.
    Returns (doc_id, chunk_idx, n_tok, chunk_text).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks"))
    return (
        toks.filter(F.col("n") > 0)
        .select(
            id_col,
            "toks",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias("start"),
        )
        .select(
            id_col,
            (F.col("start") / stride).cast("long").alias("chunk_idx"),
            F.least(F.lit(size), F.col("n") - F.col("start")).cast("long").alias("n_tok"),
            F.array_join(F.slice("toks", F.col("start") + 1, F.lit(size)), " ").alias("chunk_text"),
        )
    )


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    id_col: str = "doc_id",
    k_const: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, public) — the
    standard hybrid-retrieval merge RAG stacks run over a lexical
    (BM25) and a semantic (embedding) ranking:
    rrf(d) = sum over rankings of 1/(k + rank_d), absent side
    contributes 0. Inputs are (id, rank) tables; ties in the fused
    score break on id.

    Scale: both inputs are already top-k-sized candidate lists (the
    expensive corpus work happened inside each retriever), so the
    full-outer merge and the final global sort run over O(k) rows —
    a driver-trivial TakeOrderedAndProject, never a corpus shuffle.
    """
    from pyspark.sql.window import Window

    j = lex.select(F.col(id_col), F.col("rank").alias("lex_rank")).join(
        sem.select(F.col(id_col), F.col("rank").alias("sem_rank")),
        id_col,
        "full",
    )
    score = F.round(
        F.coalesce(F.lit(1.0) / (F.col("lex_rank") + F.lit(k_const)), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.col("sem_rank") + F.lit(k_const)), F.lit(0.0)),
        6,
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        j.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select(
            id_col,
            F.col("lex_rank").cast("long"),
            F.col("sem_rank").cast("long"),
            "rrf_score",
            "rank",
        )
    )
