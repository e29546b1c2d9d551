"""Extra benchmarks for optimization work (guide §1.4) — NOT the driver
contract; bench.py stays frozen. Times individual declared queries with
the noop sink, optionally dumps .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py [query ...]            # time listed queries (default: all headline)
  SMHKG_BENCH_TRIALS=3 python bench_extra.py jaccard_pairs
  SMHKG_EXPLAIN_DIR=plans/r06 SMHKG_EXPLAIN_SUFFIX=before python bench_extra.py jaccard_pairs
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SMHKG_BENCH_TRIALS", "3"))
    explain_dir = os.environ.get("SMHKG_EXPLAIN_DIR")
    suffix = os.environ.get("SMHKG_EXPLAIN_SUFFIX", "before")

    import __spark_entry__ as entrymod
    from smh_to_jsonld_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs.keys())

    timings = {}
    for name in names:
        fn = qs[name]
        if explain_dir:
            Path(explain_dir).mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (Path(explain_dir) / f"{name}_{suffix}.txt").write_text(plan)
        if os.environ.get("SMHKG_EXPLAIN_ONLY"):
            continue
        best = None
        samples = []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = {"best": round(best, 3), "samples": samples}
        print(json.dumps({name: timings[name]}), flush=True)

    print(json.dumps({"sf": sf_dir, "cpus": cpus, "timings": timings}))


if __name__ == "__main__":
    main()
