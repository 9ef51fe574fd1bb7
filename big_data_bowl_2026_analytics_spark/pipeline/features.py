"""Feature engineering (SURVEY §2.9 U1/U2) — wide join, no UDF.

The reference iterates plays in Python, picking the QB / targeted
receiver / defender rows and computing 14 geometric features per play
(/root/reference/src/data_processing/training/features.py:63-150).
Here the per-group loop becomes three role-filtered frames joined wide
on the play key (INNER, so plays missing a role drop exactly like the
reference's ``except IndexError: continue``), and the feature math is
the pure-Column library in ``functions/scalar.py`` — whole-stage
codegen, no Python worker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import (
    angle_diff,
    boundary_distance,
    closing_speed,
    euclidean_distance,
)

PLAY_KEY = ["game_id", "play_id"]


def last_frame_per_player(df: DataFrame) -> DataFrame:
    """A7 (create_datasets.py:16-25): the at-throw snapshot — last frame
    of each player in each play, ordered explicitly by frame_id
    (pandas ``tail(1)`` leans on file order; Spark must not)."""
    w = Window.partitionBy("game_id", "play_id", "nfl_id").orderBy(
        F.desc("frame_id")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_features(
    tracking: DataFrame,
    plays: DataFrame,
    per_frame: bool = False,
) -> DataFrame:
    """Engineered feature table: one row per play (training/test) or
    per play-frame (inference, ``per_frame=True``).

    Scale: three shuffles on the play(-frame) key replaced the per-play
    Python loop; all feature math is Column arithmetic. Targets:
    training gets binary is-non-completion (F9), inference keeps the
    raw pass_result (reference inference/create_dataset.py:73-103).
    """
    snap = tracking if per_frame else last_frame_per_player(tracking)
    key = [*PLAY_KEY, "frame_id"] if per_frame else PLAY_KEY

    def role_slice(cond, prefix: str) -> DataFrame:
        cols = [
            F.col("nfl_id").alias(f"{prefix}_nfl_id"),
            F.col("x").alias(f"{prefix}_x"),
            F.col("y").alias(f"{prefix}_y"),
            F.col("s").alias(f"{prefix}_s"),
            F.col("dir").alias(f"{prefix}_dir"),
            F.col("o").alias(f"{prefix}_o"),
        ]
        w = Window.partitionBy(*key).orderBy(F.asc("nfl_id"))
        return (
            snap.where(cond)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*key, *cols)
        )

    qb = role_slice(F.col("player_role") == "Passer", "qb")
    rec = role_slice(F.col("player_role") == "Targeted Receiver", "rec")
    deff = role_slice(F.col("player_side") == "Defense", "def")

    wide = qb.join(rec, key, "inner").join(deff, key, "inner")
    wide = wide.join(
        F.broadcast(plays.select(*PLAY_KEY, "pass_result")), PLAY_KEY, "left"
    )

    air_yards = F.col("rec_x") - F.col("qb_x")
    sep = euclidean_distance(
        F.col("def_x"), F.col("def_y"), F.col("rec_x"), F.col("rec_y")
    )
    qb_rec = euclidean_distance(
        F.col("qb_x"), F.col("qb_y"), F.col("rec_x"), F.col("rec_y")
    )
    def_qb = euclidean_distance(
        F.col("def_x"), F.col("def_y"), F.col("qb_x"), F.col("qb_y")
    )
    closing = closing_speed(
        F.col("def_x"),
        F.col("def_y"),
        F.col("def_s"),
        F.col("def_dir"),
        F.col("rec_x"),
        F.col("rec_y"),
    )
    bearing = F.degrees(
        F.atan2(F.col("rec_y") - F.col("def_y"), F.col("rec_x") - F.col("def_x"))
    )
    orient_error = angle_diff(F.col("def_o"), bearing)
    boundary = boundary_distance(F.col("rec_x"), F.col("rec_y"))

    target = (
        F.col("pass_result").alias("target")
        if per_frame
        else (F.col("pass_result") != "C").cast("int").alias("target")
    )

    out_cols = [
        *key,
        F.col("rec_nfl_id").alias("receiver_id"),
        F.col("def_nfl_id").alias("defender_id"),
        F.round(air_yards, 2).alias("air_yards"),
        F.round(sep, 2).alias("separation"),
        F.round(qb_rec, 2).alias("qb_to_rec_dist"),
        F.round(def_qb, 2).alias("pressure_dist"),
        F.round(F.col("rec_s"), 2).alias("rec_speed"),
        F.round(F.col("def_s"), 2).alias("def_speed"),
        F.round(F.col("qb_s"), 2).alias("qb_speed"),
        F.round(closing, 2).alias("closing_speed"),
        F.round(orient_error, 2).alias("def_orientation_error"),
        (orient_error > 120).cast("int").alias("def_back_to_rec"),
        F.round(boundary, 2).alias("rec_boundary_dist"),
        (F.col("rec_s") > 6).cast("int").alias("rec_running_away"),
        F.round(sep * sep, 2).alias("separation_sq"),
        F.round(sep / F.greatest(air_yards, F.lit(1.0)), 2).alias("sep_per_air_yard"),
        F.round(closing / F.greatest(air_yards, F.lit(1.0)), 2).alias(
            "closing_per_yard"
        ),
        target,
    ]
    return wide.select(*out_cols)


def train_test_split_by_week(
    features: DataFrame, plays: DataFrame, train_weeks: int = 9
) -> tuple[DataFrame, DataFrame]:
    """Partition-range split (reference create_datasets.py:102-103):
    weeks 1..train_weeks train, the rest test — a week predicate that
    prunes partitions on a week-partitioned layout."""
    with_week = features.join(
        F.broadcast(plays.select(*PLAY_KEY, "week")), PLAY_KEY, "left"
    )
    train = with_week.where(F.col("week") <= train_weeks).drop("week")
    test = with_week.where(F.col("week") > train_weeks).drop("week")
    return train, test
