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


def _bloom_positions(key: Column, k: int, num_bits: int) -> list[Column]:
    """k probe positions via double hashing (Kirsch-Mitzenmacher 2006:
    pos_i = h1 + i*h2 mod m preserves the classic false-positive bound
    with TWO hash evaluations instead of k). All JVM-side xxhash64."""
    # reduce both hashes mod m up front: i*h2 on raw xxhash64 values
    # overflows 64-bit under ANSI mode; reduced, i*h2 <= k*m fits easily.
    # h2 in [1, m-1] so probes never degenerate to a single position.
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(num_bits - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(k)]


def bloom_build(
    df: DataFrame, key: str, num_bits: int = 1 << 20, k: int = 7
) -> bytes:
    """Build a Bloom-filter bitmap over ``df[key]`` distributedly and
    return it as ``num_bits/8`` packed bytes (little-endian bits within
    each byte).

    The aggregation is pure Catalyst: each key row emits its k probe
    positions (explode), positions roll up per 64-bit word with
    ``bit_or(shiftleft(1, pos % 64))`` — a partial-aggregated shuffle of
    at most ``num_bits/64`` groups — and only the non-zero words reach
    the driver (bounded by the bitmap size, NOT the key count; a 2^23-bit
    filter is 1 MiB however many billions of keys fed it). The returned
    bytes are a driver artifact of the same class as a broadcast
    variable."""
    probes = _bloom_positions(F.col(key), k, num_bits)
    words = (
        df.select(F.explode(F.array(*probes)).alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("pos") % 64
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = bytearray(num_bits >> 3)
    for r in words:
        word = r.word & 0xFFFFFFFFFFFFFFFF  # two's-complement view
        base = r.w * 8
        for b in range(8):
            dense[base + b] = (word >> (8 * b)) & 0xFF
    return bytes(dense)


def bloom_might_contain(
    bitmap: bytes, key: Column, num_bits: int, k: int = 7
) -> Column:
    """Scan-side membership test against a built bitmap: all k probe
    bits set. The bitmap rides the plan as ONE binary literal (the
    local-mode stand-in for ``sparkContext.broadcast`` — same
    executor-side residency either way); each probe is byte-indexed
    ``substring`` on the binary (O(1) — binary slicing is offset-based,
    unlike string substring whose UTF-8 char walk is O(position) and
    made an array-literal/`element_at` variant O(bitmap) per row), then
    hex->int and a bit shift — all codegen'd, no Python in the row
    path."""
    lit = F.lit(bytearray(bitmap))
    cond = None
    for pos in _bloom_positions(key, k, num_bits):
        byte = F.conv(
            F.hex(F.substring(lit, (F.shiftright(pos, 3) + 1).cast("int"), 1)),
            16,
            10,
        ).cast("int")
        hit = (
            F.call_function("shiftright", byte, (pos % 8).cast("int")).bitwiseAND(
                F.lit(1)
            )
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    num_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """Equi-join where the BIG side is pre-filtered by a Bloom filter
    built from the small side's keys — the classic 100-TB shuffle
    reducer for joins whose dimension is too large to broadcast-join
    (so Catalyst picks sort-merge) but whose KEY SET fits a megabyte
    bitmap: fact rows that cannot match are dropped AT THE SCAN, before
    the exchange, cutting shuffle volume to ~the matching fraction
    (plus the false-positive rate, num_bits/k-tunable).

    Result is EXACTLY the plain join — Bloom false positives survive
    the prefilter but are eliminated by the real join; no false
    negatives exist by construction. This is what Spark's own runtime
    row-group filtering (`spark.sql.optimizer.runtime.bloomFilter`)
    injects when statistics justify it; first-class here so the plan
    guarantees it regardless of stats. Only inner/semi (and right outer
    on the small side) joins can prefilter soundly; others keep
    unmatched big rows.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom prefilter is only sound for inner/semi joins, got {how!r}"
        )
    bitmap = bloom_build(small, on, num_bits=num_bits, k=k)
    pre = big.filter(bloom_might_contain(bitmap, F.col(on), num_bits, k=k))
    return pre.join(small, on=on, how=how)
