"""Batched model inference over DataFrames (training-data pipelines:
quality classifiers, embedding models, reward scoring).

The reference (v2.32) predates a first-class inference transform; this is
the operation a 100-TB curation pipeline runs constantly, designed
Spark-first:

- ``mapInPandas`` => Arrow-batched columns in, no per-row Python overhead.
- The model loads ONCE PER PYTHON WORKER (module-level cache keyed by
  handler fingerprint), not per batch and never on the driver — the
  executor-side analog of a per-worker setup() lifecycle.
- Handlers declare the output schema up front, so Catalyst plans the
  full pipeline without running user code driver-side.
- Heavy frameworks (torch/sklearn) are absent in this environment; the
  built-in handlers are deterministic pure-numpy models with the REAL
  plumbing (batching, caching, schema, keyed passthrough). A framework
  handler only needs ``load()`` + ``predict_batch``.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# per-python-worker model cache: handler fingerprint -> loaded model
_MODEL_CACHE: dict[str, Any] = {}


class ModelHandler:
    """Contract for pluggable models.

    ``fingerprint()`` keys the per-worker cache (default: class name —
    override when the same handler class loads different weights).
    ``load()`` runs once per worker; ``predict_batch(model, pdf)``
    returns one output row per input row as a pandas DataFrame matching
    ``output_schema()``.
    """

    def fingerprint(self) -> str:
        return type(self).__name__

    def load(self) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def predict_batch(self, model: Any, pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        raise NotImplementedError

    def output_schema(self) -> T.StructType:  # pragma: no cover - abstract
        raise NotImplementedError


class LinearScoreHandler(ModelHandler):
    """Deterministic linear scorer over an embedding column: score =
    round(w . v, 6) with w_i = ((i % 7) - 3) / 4 — reproducible in plain
    SQL, so the gate query has an exact oracle."""

    def __init__(self, vec_col: str = "embedding", out_col: str = "score"):
        self.vec_col, self.out_col = vec_col, out_col

    def fingerprint(self) -> str:
        return f"LinearScoreHandler:{self.vec_col}"

    def load(self) -> Any:
        def weights(dim: int) -> np.ndarray:
            return (np.arange(dim) % 7 - 3) / 4.0

        return weights

    def predict_batch(self, model: Callable, pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[self.vec_col]])
        if len(vecs) == 0:
            return pd.DataFrame({self.out_col: pd.Series([], dtype="float64")})
        w = model(vecs.shape[1])
        return pd.DataFrame({self.out_col: np.round(vecs @ w, 6)})

    def output_schema(self) -> T.StructType:
        return T.StructType([T.StructField(self.out_col, T.DoubleType(), True)])


def run_inference(
    df: DataFrame,
    handler: ModelHandler,
    keep_cols: list[str] | None = None,
    num_inferences: Any = None,
) -> DataFrame:
    """Attach model predictions to every row. ``keep_cols`` (default: all
    input columns) pass through unchanged next to the prediction columns
    — the KeyedModelHandler pattern: keys ride along, never enter the
    model. Pass a ``Metrics.counter`` accumulator as ``num_inferences``
    to count scored rows executor-side."""
    keep = list(df.columns) if keep_cols is None else list(keep_cols)
    out_fields = [df.schema[c] for c in keep] + list(handler.output_schema().fields)
    out_schema = T.StructType(out_fields)
    fp = handler.fingerprint()

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _MODEL_CACHE.get(fp)
        if model is None:
            model = handler.load()
            _MODEL_CACHE[fp] = model
        for pdf in batches:
            preds = handler.predict_batch(model, pdf)
            preds.index = pdf.index
            if num_inferences is not None:
                num_inferences.add(len(pdf))
            yield pd.concat([pdf[keep], preds], axis=1)

    return df.mapInPandas(infer, out_schema)


class KeyedLinearScoreHandler(ModelHandler):
    """Per-group model dispatch WITHOUT a shuffle: rows carry a model key
    (e.g. language, domain), and each Arrow batch is scored group-wise
    against that key's model — the KeyedModelHandler pattern done the
    scalable way (a groupBy-per-model formulation would shuffle the
    corpus into as many tasks as models). Model g uses weights
    w_i = ((i + g) % 7 - 3) / 4, reproducible in SQL for the oracle."""

    def __init__(self, vec_col: str = "embedding", key_col: str = "model_key",
                 out_col: str = "score"):
        self.vec_col, self.key_col, self.out_col = vec_col, key_col, out_col

    def fingerprint(self) -> str:
        return f"KeyedLinearScoreHandler:{self.vec_col}:{self.key_col}"

    def load(self) -> Any:
        cache: dict[tuple[int, int], np.ndarray] = {}

        def weights(g: int, dim: int) -> np.ndarray:
            key = (g, dim)
            if key not in cache:
                cache[key] = ((np.arange(dim) + g) % 7 - 3) / 4.0
            return cache[key]

        return weights

    def predict_batch(self, model: Callable, pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(pdf), dtype=np.float64)
        if len(pdf) == 0:
            return pd.DataFrame({self.out_col: pd.Series([], dtype="float64")})
        groups = pdf.groupby(self.key_col, sort=False).indices
        vecs = [np.asarray(v, dtype=np.float64) for v in pdf[self.vec_col]]
        for g, idx in groups.items():
            w = model(int(g), len(vecs[idx[0]]))
            for i in idx:
                out[i] = vecs[i] @ w
        return pd.DataFrame({self.out_col: np.round(out, 6)})

    def output_schema(self) -> T.StructType:
        return T.StructType([T.StructField(self.out_col, T.DoubleType(), True)])


def hash_ngram_classify(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    n_classes: int = 3,
    salt: str = "ftx",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """fastText-shaped quality classifier inference entirely JVM-side:
    hashed bag of word uni+bigrams -> linear logits -> argmax. The
    hashing trick means the "model" is a formula, not a table — at
    100 TB there is NOTHING to broadcast and NOTHING to shuffle; the
    whole classifier is one whole-stage-codegen projection (the
    fast-path counterpart of the Pandas ``ModelHandler``s above, for
    the CCNet/fastText-style quality filters real curation runs apply
    to every document).

    Determinism contract (shared with the DuckDB oracle): features are
    lowercase ``[a-z0-9]+`` word tokens plus space-joined bigrams WITH
    multiplicity; bucket(f) = first-8-hex-chars of md5("{salt}|f") mod
    ``n_buckets``; W[b, c] = ((b*31 + c*57) % 101) - 50 micro-units;
    bias_c = 3c - 2; argmax ties break to the lowest class id.
    ``passthrough`` names extra input columns carried to the output
    (single-scan composition with other scan-side signals — no
    self-join needed).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _bucket(feat):
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.lit(salt), feat)), 1, 8),
                16,
                10,
            ).cast("long")
            % n_buckets
        )

    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.transform(F.concat(words, bigrams), _bucket).alias("bks"),
    )
    def _logit(c: int):
        return F.aggregate(
            F.col("bks"),
            F.lit(3 * c - 2).cast("long"),
            lambda acc, b: acc + ((b * 31 + F.lit(c) * 57) % 101 - 50),
        ).alias(f"logit_{c}")

    logits = [_logit(c) for c in range(n_classes)]
    scored = base.select(id_col, *passthrough, *logits)
    pred = F.lit(n_classes - 1)
    for c in range(n_classes - 2, -1, -1):
        cond = None
        for d in range(c + 1, n_classes):
            ge = F.col(f"logit_{c}") >= F.col(f"logit_{d}")
            cond = ge if cond is None else (cond & ge)
        pred = F.when(cond, F.lit(c)).otherwise(pred)
    return scored.withColumn("pred_class", pred.cast("int"))
