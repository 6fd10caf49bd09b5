"""Experiment: decompose the minhash signature pass (r11 opt candidate).

Variants at sf0.1, noop sink, interleaved:
  sh    shingles only (the stored-artifact base)
  pairs shingles + md5 + (h1,h2) extraction (the JVM side of a kernel)
  cur   shingles + minhash_signature HOF aggregate (current)
  vec   pairs -> mapInArrow numpy running-minima kernel -> sig

Not part of the product; run standalone:
    python scripts/exp_minhash.py [sf_dir]
"""
import collections
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
from incubator_beam_spark.session import get_spark  # noqa: E402
from incubator_beam_spark.dataops import dedup  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
P, A, B = dedup.MINHASH_P, dedup.MINHASH_A, dedup.MINHASH_B


def pairs_cols(sh):
    md5s = F.transform(sh, F.md5)
    return (
        F.transform(md5s, lambda m: F.conv(F.substring(m, 1, 11), 16, 10).cast("long")),
        F.transform(md5s, lambda m: F.conv(F.substring(m, 12, 11), 16, 10).cast("long")),
    )


def vec_kernel(batches):
    import numpy as np
    import pyarrow as pa

    a = np.array(A, dtype=np.int64)[:, None]
    b = np.array(B, dtype=np.int64)[:, None]
    for batch in batches:
        ids, c1, c2 = batch.column(0), batch.column(1), batch.column(2)
        n_rows = len(c1)
        if n_rows == 0:
            continue
        offs = c1.offsets.to_numpy(zero_copy_only=False)[: n_rows + 1]
        h1 = c1.values.to_numpy(zero_copy_only=False)
        h2 = c2.values.to_numpy(zero_copy_only=False)
        seg1 = h1[offs[0]: offs[-1]]
        seg2 = h2[offs[0]: offs[-1]]
        offs0 = (offs - offs[0]).astype(np.int64)
        lens = np.diff(offs0)
        out = np.full((n_rows, 8), P, dtype=np.int64)
        if seg1.size:
            v = (a * seg1[None, :] + b * seg2[None, :]) % P  # (8, S)
            nz = lens > 0
            if nz.any():
                out[nz] = np.minimum.reduceat(v, offs0[:-1][nz], axis=1).T
        valid = np.asarray(c1.is_valid().to_numpy(zero_copy_only=False), dtype=bool)
        sig = pa.ListArray.from_arrays(
            pa.array(np.arange(0, 8 * (n_rows + 1), 8, dtype=np.int32)),
            pa.array(out.reshape(-1), pa.int64()),
        )
        if not valid.all():
            # null signature rows for null shingle arrays
            import pyarrow.compute as pc
            sig = pc.if_else(pa.array(valid), sig, pa.nulls(n_rows, sig.type))
        yield pa.RecordBatch.from_arrays([ids, sig], ["doc_id", "sig"])


def main():
    spark = get_spark("exp-minhash", cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    docs.count()
    sh = dedup.shingles(F.col("text"))
    base = docs.select("doc_id", sh.alias("sh"))
    h1, h2 = pairs_cols(F.col("sh"))
    variants = {
        "sh": base,
        "pairs": base.select("doc_id", h1.alias("h1"), h2.alias("h2")),
        "cur": base.select("doc_id", dedup.minhash_signature(F.col("sh")).alias("sig")),
        "vec": base.select("doc_id", h1.alias("h1"), h2.alias("h2"))
                  .mapInArrow(vec_kernel, "doc_id long, sig array<bigint>"),
    }
    for v in variants.values():
        v.write.format("noop").mode("overwrite").save()
    times = collections.defaultdict(list)
    for _ in range(5):
        for name, v in variants.items():
            t0 = time.time()
            v.write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name:6s} min={min(ts):6.3f} med={sorted(ts)[len(ts)//2]:6.3f} "
              f"all={[round(t, 2) for t in ts]}")
    c = {r.doc_id: r.sig for r in variants["cur"].collect()}
    got = {r.doc_id: r.sig for r in variants["vec"].collect()}
    assert got == c, [(k, got[k], c[k]) for k in c if got.get(k) != c[k]][:3]
    print(f"equality: {len(c)} docs, vec == cur EXACT")
    spark.stop()


if __name__ == "__main__":
    main()
