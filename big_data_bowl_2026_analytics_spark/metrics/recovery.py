"""Recovery metric (SURVEY §2.8 F15) — pure column math.

Piecewise score over the play's LAST frame probability: C -> -p,
I -> 1-p, IN -> 1.2*(1-p). The 1.2 interception multiplier follows the
reference *code* (/root/reference/src/metrics/recovery.py:49-57), not
its docstring's 2x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import piecewise_recovery_score


def recovery_scores(
    results: DataFrame, prob_col: str = "non_completion_probability"
) -> DataFrame:
    """One row per play: (game_id, play_id, frame_id, recovery_score)
    computed on the last frame (explicit frame order, reference
    recovery.py:21-30)."""
    w = Window.partitionBy("game_id", "play_id").orderBy(F.desc("frame_id"))
    last = (
        results.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return last.select(
        "game_id",
        "play_id",
        "frame_id",
        piecewise_recovery_score(F.col("pass_result"), F.col(prob_col)).alias(
            "recovery_score"
        ),
    )
