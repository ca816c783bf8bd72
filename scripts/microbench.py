#!/usr/bin/env python
"""Micro-bench named registry queries: median-of-3 noop-sink timings
with the bench.py session config. For fast optimize-measure loops on a
target subset; the committed BENCH numbers still come from bench.py.

Usage: python scripts/microbench.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1:]
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    from bench import SESSION_CONFS

    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("microbench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
    )
    # same session confs as bench.py so micro A/Bs predict the bench
    if os.environ.get("SPARK_GRAFT_NO_TUNING") != "1":
        for k, v in SESSION_CONFS.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()

    def _between() -> None:
        # same hygiene as bench.py: leaked localCheckpoint RDD blocks
        # (pagerank/CC/LPA) otherwise degrade later trials in-session
        import gc as _gc

        spark.catalog.clearCache()
        _gc.collect()
        it = (
            spark.sparkContext._jsc.sc()
            .getPersistentRDDs()
            .values()
            .iterator()
        )
        while it.hasNext():
            it.next().unpersist(False)
        spark.sparkContext._jvm.System.gc()

    # warm-up (codegen compile) at sf0.001
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"WARMUP FAIL {name}: {e}")
        _between()

    trials: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            trials[name].append(time.perf_counter() - t0)
            _between()
    meds = {k: round(sorted(v)[1], 3) for k, v in trials.items()}
    print(json.dumps({"median": meds, "trials": {k: [round(x, 3) for x in v] for k, v in trials.items()}}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
