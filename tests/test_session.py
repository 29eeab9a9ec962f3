"""tune() memoization (r12): repeat calls must not re-pay py4j."""

import pytest

from nba_pipeline_spark import session as S


@pytest.fixture()
def spark():
    from nba_pipeline_spark.session import get_spark

    return get_spark("test_session", cores=2)


def test_tune_applies_runtime_conf(spark):
    S.retune(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_tune_is_memoized_per_session(spark, monkeypatch):
    S.tune(spark)  # ensure memoized
    calls = []
    orig = spark.conf.set
    monkeypatch.setattr(
        spark.conf, "set", lambda *a, **k: (calls.append(a), orig(*a, **k))
    )
    S.tune(spark)
    assert calls == []  # memo hit: zero conf.set round-trips


def test_retune_reapplies_after_external_override(spark):
    S.tune(spark)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    S.tune(spark)  # memoized: deliberately does NOT undo the override
    assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    S.retune(spark)  # explicit escape hatch re-applies
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
