"""Synthesize a ~10x replica of an sf dir (default sf0.1 -> ~sf1) for
the round-13 scaling datapoint (VERDICT r12 "do this" #9): the largest
committed testdata is sf0.1, where every headline query is
fixed-overhead-bound and 8-vs-32-core ratios say nothing about
parallelism. A 10x input gives the bench one datapoint where compute
dominates scheduling.

Replication is KEY-SHIFTED and TEXT-PERTURBED so the workload SHAPE
survives:

- id-like key columns are offset by replica * (max_key + 1) so joins
  and groupBys see 10x distinct keys, not 10x duplicates of one key;
- document text gets a per-replica vowel rotation (deterministic
  translate()) so cross-replica docs are NOT near-duplicates — without
  it, every LSH bucket would hold 10 copies of each doc and the pair
  stage would blow up quadratically into a different workload;
- embedding vectors get a tiny per-replica additive offset for the
  same reason (semdedup / kNN cell shapes stay near-dup-sized).

Timing evidence only — the replica is NOT oracle-checkable (the
oracles replay the original corpus).

Usage: python tools/make_ramp.py [src_sf_dir] [dst_dir] [n_replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

# (table, [key columns to shift]) — keys chosen so FK pairs shift
# together (orders.o_custkey shifts with customer.c_custkey, etc.)
KEYED = {
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

VOWELS = "aeiou"


def _rotate_vowels(col, k: int):
    """Deterministic per-replica text perturbation: rotate the vowel
    alphabet by k. Changes most tokens, so replicas are not near-dups."""
    rot = VOWELS[k % 5:] + VOWELS[: k % 5]
    return F.translate(col, VOWELS, rot)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ramp_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from nba_pipeline_spark.session import get_spark

    spark = get_spark("make_ramp")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for table, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table in ("region", "nation"):
            # dimension tables every replica shares — copy once
            out = df
        else:
            shifts = {}
            for kcol in keys:
                mx = df.agg(F.max(kcol)).collect()[0][0] or 0
                shifts[kcol] = int(mx) + 1
            parts = []
            for r in range(n):
                p = df
                for kcol, span in shifts.items():
                    dt = df.schema[kcol].dataType
                    if isinstance(dt, NumericType):
                        p = p.withColumn(
                            kcol, (F.col(kcol) + F.lit(r * span)).cast(dt)
                        )
                if table == "documents":
                    # perturb ONLY the text body (lang/source keep their
                    # shared low cardinality — same sources, more docs)
                    p = p.withColumn("text", _rotate_vowels(F.col("text"), r))
                if table == "embeddings":
                    dt = df.schema["embedding"].dataType
                    p = p.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"), lambda x: x + F.lit(r * 1e-3)
                        ).cast(dt),
                    )
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        # Directory table named <table>.parquet (spark.read.parquet
        # reads a directory transparently) with MULTIPLE part files:
        # a single ~100 MB file is one scan split under the 128 MB
        # default and would serialize every narrow pipeline — the
        # opposite of what a 10x corpus looks like on disk at scale
        # (many files; scans arrive already parallel).
        n_files = 1 if table in ("region", "nation") else 16
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        print(f"{table}: {df.count()} -> {out.count()} rows, {n_files} files")


if __name__ == "__main__":
    main()
