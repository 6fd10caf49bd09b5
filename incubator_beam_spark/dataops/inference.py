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
