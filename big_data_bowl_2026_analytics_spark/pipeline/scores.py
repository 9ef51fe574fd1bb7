"""Final scores stage (reference src/metrics/compute_scores.py:13-50):
deception ⟕ recovery on (game, play, last frame) -> the 6-column
scores table."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..metrics.deception import deception_scores
from ..metrics.recovery import recovery_scores


def compute_scores(inference_results: DataFrame) -> DataFrame:
    """Scores table from per-frame inference results.

    Input grain: (game_id, play_id, frame_id) with receiver_id,
    defender_id, pass_result, non_completion_probability.
    """
    w = Window.partitionBy("game_id", "play_id").orderBy(F.desc("frame_id"))
    ids = (
        inference_results.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("game_id", "play_id", "frame_id", "defender_id", "receiver_id")
    )
    deception = deception_scores(inference_results)
    recovery = recovery_scores(inference_results)
    combined = (
        ids.join(deception, ["game_id", "play_id", "frame_id"], "left")
        .join(recovery, ["game_id", "play_id", "frame_id"], "left")
    )
    return combined.select(
        "game_id",
        "play_id",
        "defender_id",
        "receiver_id",
        "deception_score",
        "recovery_score",
    )
