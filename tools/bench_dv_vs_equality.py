"""Micro-bench: deletion-vector vs equality-tombstone read cost
(the SCALE.md "Deletion vectors vs equality tombstones" pair).

Appends sf0.1 orders as 4 range-clustered segments, deletes a key band
two ways — `commit_delete_mor` (equality) vs `commit_delete_dv`
(positional) — and times a warm agg-census read of each lake. The
band shapes:

  * scattered: every Nth key (victims in EVERY segment — dv_segs
    names all of them, the worst case for the DV tier)
  * clustered: a contiguous low-key band (victims in ONE segment —
    dv_segs scoping lets the other segments skip the (file,pos)
    anti-join outright, VERDICT r11 #6)

Usage: python tools/bench_dv_vs_equality.py [frac]
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from nba_pipeline_spark.sources import manifest as M
from nba_pipeline_spark.session import tune


def _census(spark, lake):
    df = M.read_snapshot(spark, lake)
    return df.agg(
        F.count("*"), F.sum("o_totalprice"), F.countDistinct("o_custkey")
    ).collect()[0]


def _timed(fn, warm=2, reps=5):
    for _ in range(warm):
        fn()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return statistics.median(out)


def main() -> None:
    frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = tune(
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
    ).getOrCreate()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    keys = [r[0] for r in orders.select("o_orderkey").collect()]
    keys.sort()
    results = {}
    for shape in ("scattered", "clustered"):
        if shape == "scattered":
            step = max(int(1 / frac), 1)
            victims = set(keys[::step])
        else:
            victims = set(keys[: int(n * frac)])
        for kind in ("equality", "dv"):
            base = tempfile.mkdtemp(prefix=f"dvbench-{shape}-{kind}-")
            lake = f"{base}/lake"
            # 4 range-clustered segments (the honest-measurement layout)
            q = orders.withColumn(
                "__b",
                F.ntile(4).over(
                    __import__(
                        "pyspark.sql.window", fromlist=["Window"]
                    ).Window.orderBy("o_orderkey")
                ),
            )
            for b in range(1, 5):
                M.commit_append(
                    spark,
                    lake,
                    q.filter(F.col("__b") == b).drop("__b").coalesce(1),
                    stats_cols=["o_orderkey"],
                )
            dels = spark.createDataFrame(
                [(k,) for k in sorted(victims)], "o_orderkey bigint"
            )
            if kind == "equality":
                M.commit_delete_mor(spark, lake, dels, ["o_orderkey"])
            else:
                M.commit_delete_dv(spark, lake, dels, ["o_orderkey"])
            m = M._read_manifest(spark, lake, M.current_version(spark, lake))
            tomb = m["deletes"][0]
            named = m["meta"][tomb].get("dv_segs")
            sec = _timed(lambda: _census(spark, lake))
            results[(shape, kind)] = (sec, len(victims), named and len(named))
            print(
                f"{shape:9s} {kind:8s} {sec:.3f} s  victims={len(victims)}"
                f"  dv_segs={named and len(named)}",
                flush=True,
            )
    print({f"{s}/{k}": round(v[0], 3) for (s, k), v in results.items()})


if __name__ == "__main__":
    main()
