"""Play-timeline assembly — the query surface behind the reference's
play animation (SURVEY §2.11; /root/reference/src/visualization/
play.py:113-162): point-lookup a play, concatenate before/after-throw
tracking on one continuous frame axis, and synthesize the ball-flight
interpolation. Rendering (matplotlib) stays driver-side; the engine
serves the frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def play_timeline(
    before: DataFrame, after: DataFrame, game_id: int, play_id: int
) -> DataFrame:
    """One play's full player-frame timeline: after-throw frame ids are
    rebased past the before-throw maximum (reference play.py:130-132
    adds the collected max; here it's a broadcast join of a one-row
    aggregate — no driver round-trip), tagged by phase.
    """
    b = before.where(
        (F.col("game_id") == game_id) & (F.col("play_id") == play_id)
    )
    a = after.where(
        (F.col("game_id") == game_id) & (F.col("play_id") == play_id)
    )
    common = [c for c in b.columns if c in a.columns]
    b_sel = b.select(*common).withColumn("phase", F.lit("before"))
    max_frame = b.agg(F.max("frame_id").alias("_max_before"))
    a_sel = (
        a.select(*common)
        .crossJoin(F.broadcast(max_frame))
        .withColumn("frame_id", F.col("frame_id") + F.col("_max_before"))
        .drop("_max_before")
        .withColumn("phase", F.lit("after"))
    )
    return b_sel.unionByName(a_sel).orderBy("frame_id", "nfl_id")


def ball_flight(
    plays: DataFrame,
    before: DataFrame,
    game_id: int,
    play_id: int,
    n_steps: int = 10,
) -> DataFrame:
    """Ball trajectory frames: linear interpolation from the passer's
    release point to the landing spot (reference play.py:148-162
    np.linspace), as sequence+posexplode arithmetic."""
    release = (
        before.where(
            (F.col("game_id") == game_id)
            & (F.col("play_id") == play_id)
            & (F.col("player_role") == "Passer")
        )
        .orderBy(F.desc("frame_id"))
        .limit(1)
        .select(F.col("x").alias("x0"), F.col("y").alias("y0"))
    )
    land = plays.where(
        (F.col("game_id") == game_id) & (F.col("play_id") == play_id)
    ).select("ball_land_x", "ball_land_y")
    base = release.crossJoin(land).select(
        "*", F.posexplode(F.sequence(F.lit(0), F.lit(n_steps))).alias("pos", "step")
    )
    t = F.col("step") / n_steps
    return base.select(
        F.col("step").cast("int").alias("frame_offset"),
        F.round(F.col("x0") + (F.col("ball_land_x") - F.col("x0")) * t, 2).alias("ball_x"),
        F.round(F.col("y0") + (F.col("ball_land_y") - F.col("y0")) * t, 2).alias("ball_y"),
    )
