"""Medium-tier end-to-end: a generated 18-week season (FIXTURES.md
'medium tier') through the full pipeline — exercises multi-week
partitioning, the train/test week split with real data volume on both
sides, model training on hundreds of plays, and score production."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.pipeline.run import run_pipeline
from big_data_bowl_2026_analytics_spark.schemas import (
    PLAYS_SCHEMA,
    TRACKING_AFTER_SCHEMA,
    TRACKING_BEFORE_SCHEMA,
)

N_WEEKS = 18
PLAYS_PER_WEEK = 6
FRAMES = 12


def _season(spark):
    rng = np.random.RandomState(42)
    before, after, plays = [], [], []
    nfl_id = 1000
    for week in range(1, N_WEEKS + 1):
        for p in range(PLAYS_PER_WEEK):
            game_id = 2023_000_00 + week
            play_id = p + 1
            direction = "left" if (week + p) % 2 == 0 else "right"
            qb_id, rec_id, db_id = nfl_id, nfl_id + 1, nfl_id + 2
            nfl_id += 3
            rec_x0 = float(rng.uniform(30, 70))
            rec_y0 = float(rng.uniform(10, 40))
            ball = (round(rec_x0 + FRAMES * 0.9 + 0.5, 2), round(rec_y0, 2))
            roster = [
                (qb_id, "Passer", "Offense", "QB", 20.0, 26.6, 1.5),
                (rec_id, "Targeted Receiver", "Offense", "WR", rec_x0, rec_y0, 7.5),
                (db_id, "Defensive Coverage", "Defense", "CB", rec_x0 + 1.5, rec_y0 + 1.0, 6.5),
            ]
            for pid, role, side, pos, x0, y0, speed in roster:
                for f in range(1, FRAMES + 1):
                    vx = 0.9 if role != "Passer" else 0.0
                    before.append(
                        (game_id, play_id, pid, f, direction, side, role,
                         f"P{pid}", "6-1", 200.0, "1996-03-01", pos,
                         round(x0 + vx * (f - 1), 2), y0, speed, 0.4,
                         float(rng.uniform(0, 360)), float(rng.uniform(0, 360)),
                         50.0, ball[0], ball[1], week)
                    )
                if role != "Passer":
                    for f in range(1, 5):
                        after.append(
                            (game_id, play_id, pid, f,
                             round(x0 + FRAMES * 0.9 + 0.2 * f, 2), y0,
                             speed, 0.2, 45.0, 90.0, week)
                        )
            plays.append(
                (game_id, play_id, 2023, week, 2, "08:00", 1, "KC", "BUF",
                 "pass", 10, "KC", "BUF", 30, "N",
                 ["C", "I", "IN"][int(rng.randint(3))], 12.0, "SHOTGUN",
                 "2x2", ["IN", "OUT", "HITCH"][int(rng.randint(3))],
                 "False", "TRADITIONAL", 3.0, "MAN_COVERAGE", "COVER_1")
            )
    b = spark.createDataFrame(before, TRACKING_BEFORE_SCHEMA)
    a = spark.createDataFrame(after, TRACKING_AFTER_SCHEMA)
    p = spark.createDataFrame(plays, PLAYS_SCHEMA)
    return b, a, p


@pytest.fixture(scope="module")
def season_result(spark, tmp_path_factory):
    b, a, p = _season(spark)
    workdir = str(tmp_path_factory.mktemp("season"))
    return run_pipeline(spark, b, a, p, workdir, train_weeks=9)


def test_season_volume_and_split(season_result):
    res = season_result
    n_train, n_test = res.train.count(), res.test.count()
    # all 108 plays are valid 1v1 plays with the ball landing on the
    # receiver's path; every one must survive
    assert n_train == 9 * PLAYS_PER_WEEK
    assert n_test == 9 * PLAYS_PER_WEEK
    weeks_train = {
        r["week"]
        for r in res.before_clean.select("week").distinct().collect()
    }
    assert weeks_train == set(range(1, N_WEEKS + 1))


def test_season_scores_complete(season_result):
    res = season_result
    scores = res.scores
    assert scores.count() == 9 * PLAYS_PER_WEEK  # one per test play
    nulls = scores.where(
        F.col("deception_score").isNull() | F.col("recovery_score").isNull()
    ).count()
    assert nulls == 0
    # recovery stays in the piecewise range [-1, 1.2]
    bad = scores.where(
        (F.col("recovery_score") < -1.0) | (F.col("recovery_score") > 1.2)
    ).count()
    assert bad == 0


def test_season_model_learned_something(season_result):
    res = season_result
    assert res.model.weights.shape == (15,)
    assert float(np.abs(res.model.weights).sum()) > 0
