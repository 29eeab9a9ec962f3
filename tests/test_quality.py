"""Behavioral tests for the quality-scoring queries (unigram-LM
perplexity, linear classifier) on constructed corpora."""

from __future__ import annotations

import math

import pytest


def _stage_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.fixture()
def patched_load(monkeypatch):
    """Route quality_queries' documents load at a staged tmp dir."""
    import nba_pipeline_spark.plans.quality_queries as QQ
    import nba_pipeline_spark.sources as SRC

    real = SRC.load_table

    def apply(tmp_dir):
        monkeypatch.setattr(
            QQ, "load_table",
            lambda sp, sf, name: sp.read.parquet(f"{tmp_dir}/documents.parquet")
            if name == "documents" else real(sp, sf, name),
        )

    return apply


def test_unigram_ppl_rare_tokens_score_higher(spark, tmp_path, patched_load):
    import nba_pipeline_spark.plans.quality_queries as QQ

    common = "the cat sat on the mat " * 5
    rows = [(i, common, "en", "web", 10) for i in range(8)]
    rows.append((100, "zyzzyva qwertyuiop floccinaucinihilipilification", "en", "web", 10))
    sf = _stage_docs(spark, tmp_path, rows)
    patched_load(sf)
    got = {r["doc_id"]: r for r in QQ.q_unigram_ppl(spark, sf).collect()}
    # the rare-token doc has strictly higher cross-entropy than any
    # common-token doc, and identical docs share an identical score
    assert got[100]["ce"] > got[0]["ce"]
    assert len({got[i]["ce"] for i in range(8)}) == 1
    # CE of the common docs: every token count is large, so ce ~
    # log2(T) - mean log2(c) must be finite and positive
    assert got[0]["ce"] > 0


def test_quality_classifier_is_deterministic_and_bounded(spark, tmp_path, patched_load):
    import nba_pipeline_spark.plans.quality_queries as QQ

    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "web", 10),
        (1, "alpha beta gamma delta epsilon", "en", "web", 10),  # same text
        (2, "totally different words entirely here", "en", "web", 10),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    patched_load(sf)
    got = {r["doc_id"]: r for r in QQ.q_quality_classifier(spark, sf).collect()}
    assert got[0]["quality_score"] == got[1]["quality_score"]
    for r in got.values():
        assert 0.0 < r["quality_score"] < 1.0
        assert r["keep"] == (1 if r["quality_score"] >= 0.5 else 0)
    # score = sigmoid(bias + tf·w): replay doc 0 by hand through the
    # published weight vector to pin the semantics, not just stability
    import hashlib

    from nba_pipeline_spark.plans.quality_queries import (
        CLS_BIAS,
        CLS_BUCKETS,
        _cls_weights,
    )

    w = _cls_weights()
    toks = "alpha beta gamma delta epsilon".split()
    dot = 0.0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % CLS_BUCKETS
        dot += round(1 * w[b], 6)
    expect = round(1.0 / (1.0 + math.exp(-(CLS_BIAS + dot / len(toks)))), 4)
    assert abs(got[0]["quality_score"] - expect) < 1e-9


def test_tokenize_ids_vocab_rank_and_oov(spark, tmp_path, monkeypatch):
    import nba_pipeline_spark.plans.corpus_queries as CQ
    import nba_pipeline_spark.sources as SRC

    rows = [
        (0, "aa aa aa bb bb cc", "en", "web", 10),
        (1, "aa zz", "en", "web", 10),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    real = SRC.load_table
    monkeypatch.setattr(
        CQ, "load_table",
        lambda sp, s, name: sp.read.parquet(f"{sf}/documents.parquet")
        if name == "documents" else real(sp, s, name),
    )
    monkeypatch.setattr(CQ, "VOCAB_SIZE", 3)
    got = {(r["doc_id"], r["pos"]): r for r in CQ.q_tokenize_ids(spark, sf).collect()}
    # vocab by (count desc, token): aa(4)->1, bb(2)->2, cc(1)->3; zz OOV
    assert [got[(0, p)]["tid"] for p in range(6)] == [1, 1, 1, 2, 2, 3]
    assert got[(1, 1)]["tid"] == CQ.UNK_ID and got[(1, 1)]["is_oov"] == 1
    assert got[(1, 0)]["tid"] == 1 and got[(1, 0)]["is_oov"] == 0


def test_corpus_shuffle_is_a_permutation(spark, tmp_path, monkeypatch):
    import nba_pipeline_spark.plans.corpus_queries as CQ
    import nba_pipeline_spark.sources as SRC

    rows = [(i, f"doc {i}", "en", "web", 5) for i in range(50)]
    sf = _stage_docs(spark, tmp_path, rows)
    real = SRC.load_table
    monkeypatch.setattr(
        CQ, "load_table",
        lambda sp, s, name: sp.read.parquet(f"{sf}/documents.parquet")
        if name == "documents" else real(sp, s, name),
    )
    got = CQ.q_corpus_shuffle(spark, sf).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(50))  # every doc once
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense 1..n
    # deterministic across reruns
    again = CQ.q_corpus_shuffle(spark, sf).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in got
    }


def test_bm25_rewards_tf_and_idf(spark, tmp_path, monkeypatch):
    import nba_pipeline_spark.plans.similarity_queries as SQ
    import nba_pipeline_spark.sources as SRC

    # terms: table scan merge. doc0 saturates 'table'; doc1 has one
    # 'merge' (rare => high idf); doc2 has none; doc3 has all three.
    rows = [
        (0, "table table table table filler words here", "en", "web", 10),
        (1, "merge appears once in this document only", "en", "web", 10),
        (2, "nothing relevant in here at all", "en", "web", 10),
        (3, "table scan merge together in one doc", "en", "web", 10),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    real = SRC.load_table
    monkeypatch.setattr(
        SQ, "load_table",
        lambda sp, s, name: sp.read.parquet(f"{sf}/documents.parquet")
        if name == "documents" else real(sp, s, name),
        raising=False,
    )
    got = {r["doc_id"]: r["bm25"] for r in SQ.q_bm25_topk(spark, sf).collect()}
    assert 2 not in got                     # zero matched terms => no score
    assert got[3] == max(got.values())      # all three terms dominates
    assert all(v > 0 for v in got.values())


def test_bloom_decontaminate_equals_exact(spark):
    """The bloom-prefiltered plan must return exactly the rows of the
    exact join (false positives die in the verify phase)."""
    import nba_pipeline_spark.plans.quality_queries as QQ

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["doc_id"], r["n_shared_ngrams"], r["n_test_docs"])
        for r in QQ.q_decontaminate(spark, sf).collect()
    }
    bloom = {
        (r["doc_id"], r["n_shared_ngrams"], r["n_test_docs"])
        for r in QQ.q_decontaminate_bloom(spark, sf).collect()
    }
    assert bloom == exact and exact  # identical, and non-trivial


def test_recipe_constants_match_quality_module():
    """corpus_queries keeps local copies to break a circular import;
    they must never drift from quality_queries' definitions."""
    import nba_pipeline_spark.plans.corpus_queries as CQ
    import nba_pipeline_spark.plans.quality_queries as QQ

    assert CQ.RECIPE_TEST_SOURCE == QQ.TEST_SOURCE
    assert CQ._R_DUCK_SH5 == QQ._DUCK_SH5
    assert CQ._R_DUCK_SH3 == QQ._DUCK_SH3


def test_data_recipe_each_gate_drops_its_target(spark, tmp_path, monkeypatch):
    """Golden end-to-end: a corpus with one doc engineered per
    elimination reason — held-out, wrong language, too short,
    repetitive, exact duplicate, contaminated — plus two clean
    survivors. The recipe must drop exactly the engineered docs and
    shard the survivors."""
    import nba_pipeline_spark.plans.corpus_queries as CQ
    import nba_pipeline_spark.sources as SRC

    pad1 = ("the cat and dog is here of course to win in spring that was "
            "all it gave for today on monday are we as ready with them be kind")
    pad2 = ("the sun and moon is bright of late to see in autumn that was "
            "never it took for tuesday on rivers are birds as quiet with song be calm")
    clean1 = "the quick brown fox jumps over the lazy dog " + pad1
    clean2 = "a completely different clean document body here " + pad2
    contaminated = "the held out secret benchmark sentence appears verbatim " + pad1
    heldout = "the held out secret benchmark sentence appears verbatim too"
    rows = [
        (0, clean1, "en", "web", 10),                      # survivor
        (1, clean2, "en", "web", 10),                      # survivor
        (2, clean1, "en", "books", 10),                    # exact dup of 0 -> dropped (keep min id)
        (3, heldout, "en", "src0", 10),                    # held-out set itself
        (4, contaminated, "en", "web", 10),                # shares a 5-gram with src0
        (5, "der die das und ist nicht ein mit auch " * 6, "de", "web", 10),  # lang gate
        (6, "the tiny doc", "en", "web", 10),              # length gate
        (7, "spam spam spam spam " * 20, "en", "web", 10), # repetition gate
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    real = SRC.load_table
    monkeypatch.setattr(
        CQ, "load_table",
        lambda sp, s, name: sp.read.parquet(f"{sf}/documents.parquet")
        if name == "documents" else real(sp, s, name),
    )
    got = CQ.q_data_recipe(spark, sf).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1]
    for r in got:
        assert 0 <= r["shard"] < CQ.RECIPE_SHARDS and r["pos"] >= 1


def test_token_budget_allocator_invariants(spark, tmp_path):
    """Waterfill allocator contracts on a skewed corpus: total alloc
    never exceeds the budget, no source exceeds EPOCH_CAP epochs, a
    capped giant's surplus flows to the small sources, and the whole
    allocation is reproducible (integer arithmetic)."""
    from nba_pipeline_spark.plans import corpus_queries as CQ

    rows = []
    did = 0
    # source A: huge (gets capped share), B/C: small (receive spill)
    for src, n_docs, words in (("a", 60, 40), ("b", 6, 30), ("c", 3, 20)):
        for _ in range(n_docs):
            rows.append((did, "tok " * words, "en", src, 10))
            did += 1
    sf = _stage_docs(spark, tmp_path, rows)
    got = {r["source"]: r for r in CQ.q_token_budget(spark, sf).collect()}

    total_alloc = sum(r["alloc_tokens"] for r in got.values())
    assert total_alloc <= CQ.TOKEN_BUDGET
    for r in got.values():
        assert r["alloc_tokens"] <= CQ.EPOCH_CAP * r["n_tokens"]
        assert r["epochs_bp"] <= CQ.EPOCH_CAP * 10000
    # budget (100k) >> corpus (~2.8k tokens): every source caps out
    assert all(
        r["alloc_tokens"] == CQ.EPOCH_CAP * r["n_tokens"] for r in got.values()
    )

    # scarce-budget variant via a bigger corpus: proportional + spill
    rows2 = []
    did = 0
    for src, n_docs, words in (("a", 3000, 40), ("b", 300, 30), ("c", 150, 20)):
        for _ in range(n_docs):
            rows2.append((did, "tok " * words, "en", src, 10))
            did += 1
    sf2 = _stage_docs(spark, tmp_path / "v2", rows2)
    got2 = {r["source"]: r for r in CQ.q_token_budget(spark, sf2).collect()}
    total2 = sum(r["n_tokens"] for r in got2.values())
    assert total2 > CQ.TOKEN_BUDGET  # genuinely scarce
    alloc2 = sum(r["alloc_tokens"] for r in got2.values())
    assert alloc2 <= CQ.TOKEN_BUDGET
    # floor-div slack only: within n_sources of the full budget unless capped
    if all(r["alloc_tokens"] < CQ.EPOCH_CAP * r["n_tokens"] for r in got2.values()):
        assert alloc2 >= CQ.TOKEN_BUDGET - 2 * len(got2)
    # deterministic across re-evaluation
    again = {r["source"]: r["alloc_tokens"]
             for r in CQ.q_token_budget(spark, sf2).collect()}
    assert again == {s: r["alloc_tokens"] for s, r in got2.items()}


def test_publish_with_quarantine_dual_sink(spark, tmp_path):
    """One tagged scan feeds both sinks + the report: pass rows land in
    the lake untagged, fail rows land in quarantine with their rule
    tags, counts reconcile, and pass ∪ quarantine == input."""
    from pyspark.sql import functions as F

    from nba_pipeline_spark.operators.expectations import publish_with_quarantine

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (3, 20.0, "Z"), (4, -1.0, "Z"), (5, 7.0, "N")],
        "id int, qty double, flag string",
    )
    rules = {
        "qty_positive": F.col("qty") > 0,
        "flag_domain": F.col("flag").isin("A", "N", "R"),
    }
    lake = str(tmp_path / "lake")
    quar = str(tmp_path / "quarantine")
    report = publish_with_quarantine(df, rules, lake, quar)

    assert report == {
        "qty_positive": 2,
        "flag_domain": 2,
        "__quarantined": 3,
        "__passed": 2,
    }
    passed = spark.read.parquet(lake)
    assert set(passed.columns) == {"id", "qty", "flag"}
    assert {r["id"] for r in passed.collect()} == {1, 5}
    q = spark.read.parquet(quar)
    tags = {r["id"]: list(r["failed_rules"]) for r in q.collect()}
    assert tags == {
        2: ["qty_positive"],
        3: ["flag_domain"],
        4: ["qty_positive", "flag_domain"],  # rule-order deterministic
    }


def test_expectations_report_empty_input_passes(spark):
    """Empty table -> 0 violations / passed=1 (not NULL): the gate and
    the oracle agree on vacuously-true expectations."""
    from pyspark.sql import functions as F

    from nba_pipeline_spark.operators.expectations import expectations_report

    empty = spark.createDataFrame([], "id int, qty double")
    rows = expectations_report(empty, {"qty_positive": F.col("qty") > 0}).collect()
    assert len(rows) == 1
    assert rows[0]["n_violations"] == 0 and rows[0]["passed"] == 1


def test_publish_quarantine_accumulates_with_lake_writer(spark, tmp_path):
    """Repeated manifest-backed publishes ACCUMULATE on both channels:
    the pass side as lake commits, the fail side as per-run
    ``run=<version>`` subdirs — a later publish never destroys an
    earlier run's rejected rows (they stay auditable/replayable)."""
    from pyspark.sql import functions as F

    from nba_pipeline_spark.operators.expectations import publish_with_quarantine
    from nba_pipeline_spark.sources.manifest import commit_append, read_snapshot

    lake = str(tmp_path / "lake")
    quar = str(tmp_path / "quarantine")
    rules = {"qty_positive": F.col("qty") > 0}

    def writer(passed):
        return commit_append(spark, lake, passed)

    b1 = spark.createDataFrame([(1, 10.0), (2, -5.0)], "id int, qty double")
    b2 = spark.createDataFrame([(3, 7.0), (4, -1.0)], "id int, qty double")
    r1 = publish_with_quarantine(b1, rules, lake, quar, lake_writer=writer)
    r2 = publish_with_quarantine(b2, rules, lake, quar, lake_writer=writer)
    assert r1["__lake_version"] == 1 and r2["__lake_version"] == 2

    assert {r["id"] for r in read_snapshot(spark, lake).collect()} == {1, 3}
    q = spark.read.parquet(quar)  # run= discovered as a partition column
    got = {(r["id"], int(r["run"])) for r in q.collect()}
    assert got == {(2, 1), (4, 2)}  # run 1's reject survived run 2
