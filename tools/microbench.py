"""Micro-bench a subset of registry queries: same protocol as bench.py
(noop write, sf0.001 codegen warmup, min of 2 timed passes) but only for
the names given on the command line — the per-query iteration loop.

Usage: python tools/microbench.py q_simhash q_lsh_band_candidates [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_analyze_data_stream_processing_spark.calibration import (
    CALIB_REF_SEC,
    calibration_probe,
)
from market_analyze_data_stream_processing_spark.operators.similarity import (
    invalidate_ivf_index,
)
from market_analyze_data_stream_processing_spark.plans import QUERIES
from market_analyze_data_stream_processing_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and os.path.isdir(args[-1]):
        sf_dir = args.pop()
    names = args or list(QUERIES)
    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as _pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def drop_persisted():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(m.keySet().toArray()):
            m.get(rid).unpersist()

    for name in names:
        try:
            QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass  # a warmup failure is the timed pass's error to report
        drop_persisted()
        invalidate_ivf_index()

    # Calibration stations (round-13, same thermometer as bench.py):
    # bracket the timed loop with the fixed synthetic probe so A/B
    # comparisons between microbench sessions can divide host drift
    # out instead of re-litigating it per run.
    c_pre = calibration_probe(spark)
    print(f"calib pre: {c_pre:.3f}s (ref {CALIB_REF_SEC}s)", flush=True)

    results: dict[str, float] = {}
    for name in names:
        best = None
        err = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # match bench.py: report, keep going
                err = f"{type(exc).__name__}: {exc}".splitlines()[0]
                break
            t = time.perf_counter() - t0
            drop_persisted()
            invalidate_ivf_index()
            best = t if best is None else min(best, t)
        if err is not None:
            print(f"{name}: ERROR {err}", flush=True)
        else:
            results[name] = best
            print(f"{name}: {best:.2f}s", flush=True)
    c_post = calibration_probe(spark)
    factor = (c_pre + c_post) / 2.0 / CALIB_REF_SEC
    print(f"calib post: {c_post:.3f}s  host factor: {factor:.3f}", flush=True)
    for name, best in results.items():
        print(f"{name} (norm): {best / factor:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
