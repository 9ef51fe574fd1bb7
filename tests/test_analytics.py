"""Tests for the notebook-analytics queries over synthetic scores."""

from __future__ import annotations

from big_data_bowl_2026_analytics_spark.pipeline.analytics import (
    defender_quadrants,
    extreme_plays,
    receiver_rankings,
)


def _scores(spark):
    rows = []
    # defender 1: 12 plays, positive deception, positive recovery
    for i in range(12):
        rows.append((100, i, 1, 50, 0.3, 0.4))
    # defender 2: 11 plays, negative deception, negative recovery
    for i in range(11):
        rows.append((101, i, 2, 51, -0.2, -0.3))
    # defender 3: below the activity bar
    for i in range(3):
        rows.append((102, i, 3, 52, 0.9, 0.9))
    return spark.createDataFrame(
        rows,
        "game_id long, play_id long, defender_id long, receiver_id long,"
        " deception_score double, recovery_score double",
    )


def test_defender_quadrants(spark):
    out = {r["defender_id"]: r for r in defender_quadrants(_scores(spark)).collect()}
    assert set(out) == {1, 2}  # defender 3 filtered by min_plays
    assert out[1]["quadrant"] == "deceived_recovered"
    assert out[2]["quadrant"] == "unfazed_beaten"
    assert out[1]["mean_deception"] == 0.3


def test_receiver_rankings(spark):
    out = receiver_rankings(_scores(spark), min_plays=5, k=1).collect()
    buckets = {r["bucket"]: r["receiver_id"] for r in out}
    assert buckets["most_deceptive"] == 50
    assert buckets["least_deceptive"] == 51


def test_extreme_plays(spark):
    out = extreme_plays(_scores(spark), k=2).collect()
    assert len(out) == 6
    best_fakes = [r for r in out if r["bucket"] == "best_fakes"]
    assert all(r["deception_score"] == 0.9 for r in best_fakes)
