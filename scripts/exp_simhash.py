"""Experiment: decompose simhash64 cost and compare rewrites (r11 opt).

Not part of the product; run standalone:
    python scripts/exp_simhash.py [sf_dir]
"""
import collections
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
from incubator_beam_spark.session import get_spark  # noqa: E402
from incubator_beam_spark.dataops import dedup  # noqa: E402
from incubator_beam_spark.dataops.text import tokens  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BITS = 32


def _hashes(text):
    return F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
    )


def _hashes32(text):
    # low 32 bits, sign-extended so the ANSI bigint->int cast can't overflow
    return F.transform(
        tokens(text),
        lambda t: F.shiftright(
            F.shiftleft(F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"), 32),
            32,
        ).cast("int"),
    )


def opt_a_explode(docs: DataFrame, bits: int = BITS) -> DataFrame:
    """Codegen explode + hash-aggregate formulation."""
    base = docs.select(F.col("doc_id"), _hashes(F.col("text")).alias("hs")).select(
        "doc_id",
        F.col("hs").isNull().alias("hnull"),
        F.explode_outer("hs").alias("h"),
    )
    aggs = [F.first("hnull").alias("hnull"), F.count(F.col("h")).alias("n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
        for b in range(bits)
    ]
    cnt = base.groupBy("doc_id").agg(*aggs)
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out + F.when(
            F.coalesce(F.col(f"c{b}"), F.lit(0)) * 2 >= F.col("n"),
            F.lit(1 << b).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
    return cnt.select(
        "doc_id",
        F.when(F.col("hnull"), F.lit(None).cast("bigint")).otherwise(out).alias("simhash"),
    )


def _arrow_kernel(bits: int):
    def kern(batches):
        import numpy as np
        import pyarrow as pa

        shifts = np.arange(bits, dtype=np.int64)
        weights = (np.int64(1) << shifts).astype(np.int64)

        for batch in batches:
            ids = batch.column(0)
            col = batch.column(1)
            chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
            id_chunks = ids.chunks if isinstance(ids, pa.ChunkedArray) else [ids]
            for idc, ch in zip(id_chunks, chunks):
                n_rows = len(ch)
                if n_rows == 0:
                    continue
                offs = ch.offsets.to_numpy(zero_copy_only=False)[: n_rows + 1]
                vals = ch.values.to_numpy(zero_copy_only=False)
                seg = vals[offs[0]: offs[-1]]
                offs0 = (offs - offs[0]).astype(np.int64)
                lens = np.diff(offs0)
                csum = np.zeros((n_rows, bits), np.int64)
                if seg.size:
                    sh_loc = shifts.astype(seg.dtype)
                    bitm = ((seg[:, None] >> sh_loc) & 1).astype(np.int64)
                    nz = lens > 0
                    if nz.any():
                        # starts of nonzero segments are adjacent in vals
                        # (zero-length segments contribute no rows), so each
                        # reduceat slice covers exactly one doc's tokens
                        csum[nz] = np.add.reduceat(bitm, offs0[:-1][nz], axis=0)
                sh = ((2 * csum >= lens[:, None]) * weights).sum(axis=1)
                valid = np.asarray(ch.is_valid().to_numpy(zero_copy_only=False), dtype=bool)
                yield pa.RecordBatch.from_arrays(
                    [idc, pa.array(sh, pa.int64(), mask=~valid)],
                    ["doc_id", "simhash"],
                )

    return kern


def opt_b_arrow(docs: DataFrame, bits: int = BITS, narrow: bool = False) -> DataFrame:
    h = _hashes32(F.col("text")) if narrow else _hashes(F.col("text"))
    src = docs.select(F.col("doc_id"), h.alias("hs"))
    return src.mapInArrow(_arrow_kernel(bits), "doc_id long, simhash long")


def main():
    spark = get_spark("exp-simhash", cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    docs.count()
    variants = {
        "cur": docs.select("doc_id", dedup.simhash64(F.col("text"), bits=BITS).alias("simhash")),
        "A": opt_a_explode(docs),
        "B64": opt_b_arrow(docs),
        "B32": opt_b_arrow(docs, narrow=True),
    }
    for v in variants.values():  # warm all codegen paths untimed
        v.write.format("noop").mode("overwrite").save()
    times = collections.defaultdict(list)
    for _ in range(5):
        for name, v in variants.items():
            t0 = time.time()
            v.write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name:5s} min={min(ts):6.3f} med={sorted(ts)[len(ts)//2]:6.3f} "
              f"all={[round(t, 2) for t in ts]}")
    c = {r.doc_id: r.simhash for r in variants["cur"].collect()}
    for name in ("A", "B64", "B32"):
        got = {r.doc_id: r.simhash for r in variants[name].collect()}
        assert got == c, (
            f"{name} mismatch: {[(k, got[k], c[k]) for k in c if got.get(k) != c[k]][:5]}"
        )
    print(f"equality: {len(c)} docs, A/B64/B32 == cur EXACT")
    spark.stop()


if __name__ == "__main__":
    main()
