"""Unit tests for the LLM-data-pipeline operators (q92-q95 cover the
oracle parity; these pin edge semantics the synthetic corpus may not
hit)."""

from __future__ import annotations

from big_data_bowl_2026_analytics_spark.operators.packing import pack_sequences
from big_data_bowl_2026_analytics_spark.operators.textstats import (
    boilerplate_ngram_stats,
    word_entropy,
)


def _pack(spark, rows, capacity):
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = pack_sequences(df, capacity=capacity)
    return {r["doc_id"]: (r["bin_id"], r["bin_offset"], r["n_tokens"]) for r in out.collect()}


def test_pack_next_fit_rollover_and_exact_fit(spark):
    got = _pack(
        spark,
        [(1, "a", 50), (2, "a", 50), (3, "a", 28), (4, "a", 100), (5, "a", 1)],
        capacity=128,
    )
    # 50+50+28 = 128 fills bin 0 EXACTLY (no rollover at ==capacity)
    assert got[1] == (0, 0, 50)
    assert got[2] == (0, 50, 50)
    assert got[3] == (0, 100, 28)
    assert got[4] == (1, 0, 100)
    assert got[5] == (1, 100, 1)


def test_pack_truncates_oversized_doc(spark):
    got = _pack(spark, [(1, "a", 500), (2, "a", 10)], capacity=128)
    # oversized doc is truncated to capacity and fills bin 0 alone
    assert got[1] == (0, 0, 128)
    assert got[2] == (1, 0, 10)


def test_pack_streams_independent(spark):
    got = _pack(
        spark, [(1, "a", 100), (2, "b", 100), (3, "a", 100), (4, "b", 10)], capacity=128
    )
    # each source packs its own bins: ids restart per stream
    assert got[1] == (0, 0, 100) and got[3] == (1, 0, 100)
    assert got[2] == (0, 0, 100) and got[4] == (0, 100, 10)


def test_boilerplate_none_hot(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in boilerplate_ngram_stats(df, n=3, min_docs=2).collect()}
    assert out[1]["n_boilerplate"] == 0 and out[1]["boilerplate_frac"] == 0.0
    assert out[1]["n_shingles"] == 2


def test_boilerplate_shared_gram(spark):
    df = spark.createDataFrame(
        [(1, "x y z a"), (2, "x y z b"), (3, "q r s t")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in boilerplate_ngram_stats(df, n=3, min_docs=2).collect()}
    assert out[1]["n_boilerplate"] == 1 and out[2]["n_boilerplate"] == 1
    assert out[3]["n_boilerplate"] == 0
    assert out[1]["boilerplate_frac"] == 0.5  # 1 of 2 shingles


def test_word_entropy_extremes(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in word_entropy(df).collect()}
    assert out[1]["entropy_nats"] == 0.0  # degenerate: one word repeated
    assert abs(out[2]["entropy_nats"] - round(math.log(4), 6)) < 1e-6  # uniform
    assert out[2]["n_distinct_words"] == 4


def test_pack_invariants_hypothesis(spark):
    """Property check over randomized token-count streams: no bin
    overflows, offsets equal the running fill, bins are dense and
    monotone in doc order, and every doc keeps min(n, capacity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=40),
        capacity=st.integers(min_value=8, max_value=160),
    )
    def check(toks, capacity):
        rows = [(i, "s", t) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
        out = sorted(
            pack_sequences(df, capacity=capacity).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [r["doc_id"] for r in out] == list(range(len(toks)))
        fill_by_bin: dict[int, int] = {}
        prev = (0, -1)
        for r, t in zip(out, toks):
            assert r["n_tokens"] == min(t, capacity)
            # monotone placement in doc order
            assert (r["bin_id"], r["bin_offset"]) > prev or (
                r["bin_id"] > prev[0]
            )
            prev = (r["bin_id"], r["bin_offset"])
            assert r["bin_offset"] == fill_by_bin.get(r["bin_id"], 0)
            fill_by_bin[r["bin_id"]] = r["bin_offset"] + r["n_tokens"]
        assert all(f <= capacity for f in fill_by_bin.values())
        # bins are dense 0..max
        assert sorted(fill_by_bin) == list(range(len(fill_by_bin)))

    check()
