"""Iterative-loop fan-in guard (r13, guide §1.2): tiny rounds run
non-adaptively on one shuffle partition; the guard must NOT fire above
the size threshold (the 100 TB path stays wide), and the session conf
must be restored on exit regardless of how the loop leaves the block.
"""

from pyspark.sql import functions as F

from nba_pipeline_spark.operators.partitioning import (
    _NARROW_ROWS_CONF,
    narrow_rounds,
    narrow_rows_max,
)

SF_DIR = "/root/testdata/sf0.001"


def _snapshot(spark):
    return (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )


def test_guard_fires_below_threshold_and_restores(spark):
    before = _snapshot(spark)
    with narrow_rounds(spark, 10) as ctx:
        assert ctx.active
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert _snapshot(spark) == before


def test_guard_does_not_fire_at_or_above_threshold(spark):
    # the at-scale contract: a big frame keeps AQE and full shuffle
    # width — the narrow path must be provably unreachable past the cap
    before = _snapshot(spark)
    thresh = narrow_rows_max(spark)
    for rows in (thresh, thresh + 1, 10**12):
        with narrow_rounds(spark, rows) as ctx:
            assert not ctx.active
            assert _snapshot(spark) == before
    assert _snapshot(spark) == before


def test_guard_threshold_is_conf_overridable(spark):
    before = _snapshot(spark)
    prev = spark.conf.get(_NARROW_ROWS_CONF, None)
    spark.conf.set(_NARROW_ROWS_CONF, "5")
    try:
        assert narrow_rows_max(spark) == 5
        with narrow_rounds(spark, 7) as ctx:
            assert not ctx.active  # 7 >= 5: stays wide
        with narrow_rounds(spark, 3) as ctx:
            assert ctx.active
    finally:
        if prev is None:
            spark.conf.unset(_NARROW_ROWS_CONF)
        else:
            spark.conf.set(_NARROW_ROWS_CONF, prev)
    assert _snapshot(spark) == before


def test_guard_restores_on_exception(spark):
    before = _snapshot(spark)
    try:
        with narrow_rounds(spark, 1):
            raise RuntimeError("loop blew up")
    except RuntimeError:
        pass
    assert _snapshot(spark) == before


def test_iterative_results_identical_wide_vs_narrow(spark):
    # the guard changes scheduling, never results: force both paths on
    # the same graph and compare exactly (CC labels are deterministic)
    from nba_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20), (30, 31), (31, 32), (32, 33)],
        "src bigint, dst bigint",
    )
    prev = spark.conf.get(_NARROW_ROWS_CONF, None)
    out = {}
    for label, thresh in (("narrow", str(10**9)), ("wide", "0")):
        spark.conf.set(_NARROW_ROWS_CONF, thresh)
        try:
            out[label] = {
                "cc": sorted(
                    map(tuple, connected_components(edges).collect())
                ),
                "star": sorted(
                    map(tuple, connected_components_star(edges).collect())
                ),
            }
        finally:
            if prev is None:
                spark.conf.unset(_NARROW_ROWS_CONF)
            else:
                spark.conf.set(_NARROW_ROWS_CONF, prev)
    assert out["narrow"] == out["wide"]
    assert out["narrow"]["cc"] == out["narrow"]["star"]


def test_bpe_train_results_identical_wide_vs_narrow(spark):
    from nba_pipeline_spark.operators.bpe import train_bpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "w string, freq bigint",
    )
    prev = spark.conf.get(_NARROW_ROWS_CONF, None)
    res = {}
    for label, thresh in (("narrow", str(10**9)), ("wide", "0")):
        spark.conf.set(_NARROW_ROWS_CONF, thresh)
        try:
            merges, final = train_bpe(words, 6)
            res[label] = (
                [(m.rank, m.left, m.right, m.count) for m in merges],
                sorted(map(tuple, final.collect())),
            )
        finally:
            if prev is None:
                spark.conf.unset(_NARROW_ROWS_CONF)
            else:
                spark.conf.set(_NARROW_ROWS_CONF, prev)
    assert res["narrow"] == res["wide"]
