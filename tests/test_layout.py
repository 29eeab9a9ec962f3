"""Z-order layout: interleave correctness and the actual data-skipping
win, measured from parquet footer stats (no Spark feature involved —
plain min/max row-group pruning over a better row order)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from nba_pipeline_spark.sources.layout import compact, write_zordered, zvalue


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3), (0, 0), (255, 0), (0, 255)], "a long, b long")
    got = [r["z"] for r in df.select(zvalue(F.col("a"), F.col("b"), 8).alias("z")).collect()]
    # (5,3): a bits -> even positions (1+16), b bits -> odd (2+8)
    assert got[0] == 27
    assert got[1] == 0
    assert got[2] == sum(1 << (2 * i) for i in range(8))       # 0b0101...01
    assert got[3] == sum(1 << (2 * i + 1) for i in range(8))   # 0b1010...10


def _files_matching(path: str, col: str, value: int) -> tuple[int, int]:
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        if min(mins) <= value <= max(maxs):
            hit += 1
    return hit, len(files)


def test_zorder_skips_on_second_dimension(spark, tmp_path):
    """Linear sort on `a` leaves every file full-width in `b`; Z-order
    confines `b` too, so a b-only filter prunes most files by footer
    stats alone."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("a"), (F.col("id") / 256).cast("long").alias("b")
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (
        grid.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(grid, zord, "a", "b", n_files=16)

    lin_hit, lin_total = _files_matching(linear, "b", 5)
    z_hit, z_total = _files_matching(zord, "b", 5)
    assert lin_hit == lin_total  # every linear file spans all of b
    assert z_hit <= z_total // 2, (z_hit, z_total)  # z-order prunes most
    # and the a-dimension still prunes too (squares, not stripes)
    za_hit, _ = _files_matching(zord, "a", 5)
    assert za_hit <= z_total // 2, za_hit


def test_compact_reduces_file_count_preserving_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(10_000).select(F.col("id"), (F.col("id") % 7).alias("g"))
    df.repartition(50).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 50

    back = spark.read.parquet(src)
    compact(back, dst, target_files=4)
    assert len(glob.glob(f"{dst}/part-*.parquet")) <= 4
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
