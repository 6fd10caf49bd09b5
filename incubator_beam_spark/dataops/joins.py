"""Join strategies the planner doesn't apply automatically.

- ``salted_join``: manual key-salting for extreme skew. Spark's AQE
  splits skewed *partitions* of a sort-merge join, but only after a
  whole stage materializes the skew; salting rewrites the plan so no
  reducer ever owns a whole hot key. Beam users hand-write the same
  pattern with a sharded key + side-input rejoin (reference
  ``sdks/python/apache_beam/transforms/util.py`` Reshuffle docs discuss
  the hot-key variant); first-class here.
- ``cdc_apply``: materialize a CDC changelog (Debezium-shaped
  insert/update/delete stream, reference ``io/debezium.py``) into the
  current table state — latest-wins per key, deletes drop the key.

Scale design:
- ``salted_join`` replicates the SMALL side ``n_salts``× (explode of a
  literal sequence — no shuffle to build it) and appends a deterministic
  per-row salt on the big side, so each hot key spreads over ``n_salts``
  reducers. One shuffle each side on (key, salt); result is identical to
  the unsalted join because every big-side row meets exactly one replica.
- ``cdc_apply`` is one hash-shuffle on the key + a per-partition sort
  (window row_number), then a filter — the minimal materialization plan.
  A pathological single-key changelog is bounded by task spill, not
  memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salting pattern.

    ``small`` (the dimension side, small enough to replicate ``n_salts``×
    but too big / explicitly not broadcast) is exploded once per salt;
    ``big`` gets ``pmod(xxhash64(all columns), n_salts)`` — deterministic,
    uniformly spread, computed scan-side. The join key becomes
    (key..., salt), so a key carrying 20% of all traffic occupies
    ``n_salts`` reducers instead of one. Result == plain join (each big
    row matches exactly the one replica with its salt).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_big = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt_big)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, on=keys + ["_salt"], how=how)
    return out.drop("_salt")


def cdc_apply(
    changelog: DataFrame,
    keys: str | list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Materialize a CDC changelog into current table state.

    Latest-wins per key by ``seq_col`` (must be unique per key — a
    Debezium LSN/offset is); if the winning op is ``delete_op`` the key
    is absent from the result. Output drops the op column, keeps
    everything else including ``seq_col``.
    """
    kcols = [keys] if isinstance(keys, str) else list(keys)
    w = W.partitionBy(*kcols).orderBy(F.col(seq_col).desc())
    latest = (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)
