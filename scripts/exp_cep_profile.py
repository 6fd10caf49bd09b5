"""Profile the CEP kernel's per-key Python closure on real sf0.1 data,
outside Spark: capture the `run` closure and the projected input frame
by monkeypatching GroupedData.applyInPandas, then cProfile run() over
the real per-key groups.

Not part of the product; run standalone:
    python scripts/exp_cep_profile.py [gate ...]
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")
from incubator_beam_spark.session import get_spark  # noqa: E402
from incubator_beam_spark import registry  # noqa: E402
import pyspark.sql.group as G  # noqa: E402

SF = "/root/testdata/sf0.1"
GATES = sys.argv[1:] or [
    "cep_measures_complete",
    "cep_all_rows_running",
    "sql_match_recognize_cross",
    "sql_match_recognize_prev",
    "cep_match_recognize",
]

captured = {}
orig_apply = G.GroupedData.applyInPandas


def main():
    spark = get_spark("exp-cep-profile", cpus=8)
    registry.load_all()

    def patched(self, func, schema):
        captured["fn"] = func
        captured["df"] = self._df
        captured["keys"] = [str(c) for c in getattr(self, "_grouping_cols", [])]
        return orig_apply(self, func, schema)

    G.GroupedData.applyInPandas = patched
    for gate in GATES:
        captured.clear()
        q = registry.QUERIES[gate]
        df = q.fn(spark, SF)
        if "fn" not in captured:
            print(f"{gate}: no applyInPandas captured, skipping")
            continue
        run = captured["fn"]
        pdf = captured["df"].toPandas()
        # partition columns = the gate's PARTITION BY; infer from closure
        import inspect

        clos = inspect.getclosurevars(run).nonlocals
        part = clos.get("partition_by")
        groups = [g for _, g in pdf.groupby(part, sort=False)]
        # warm
        for g in groups[:20]:
            run(g.copy())
        t0 = time.time()
        for g in groups:
            run(g)
        wall = time.time() - t0
        pr = cProfile.Profile()
        pr.enable()
        for g in groups:
            run(g)
        pr.disable()
        buf = io.StringIO()
        ps = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        ps.print_stats(14)
        print(f"=== {gate}: {len(groups)} keys, {len(pdf)} rows, "
              f"kernel wall {wall:.3f}s ===")
        print("\n".join(buf.getvalue().splitlines()[4:24]))
    spark.stop()


if __name__ == "__main__":
    main()
