"""Post-scores analytics — the reference's notebook queries
(quadrant.ipynb, receivers.ipynb, good_fake/good_recovery/bad_recovery
.ipynb) as engine functions: minimum-activity filters (A10), per-entity
means (A11), global rankings and top-k (O3/O4), quadrant assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def defender_quadrants(
    scores: DataFrame, min_plays: int = 10, players: DataFrame | None = None
) -> DataFrame:
    """Quadrant table (reference quadrant.ipynb): defenders with at
    least ``min_plays`` scored plays, mean deception vs mean recovery,
    quadrant = sign pair. One groupBy; the activity bar is a HAVING,
    not a join back."""
    per_def = (
        scores.groupBy("defender_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            F.round(F.avg("deception_score") + 1e-9, 4).alias("mean_deception"),
            F.round(F.avg("recovery_score") + 1e-9, 4).alias("mean_recovery"),
        )
        .where(F.col("n_plays") >= min_plays)
    )
    out = per_def.withColumn(
        "quadrant",
        F.when((F.col("mean_deception") >= 0) & (F.col("mean_recovery") >= 0), "deceived_recovered")
        .when((F.col("mean_deception") >= 0) & (F.col("mean_recovery") < 0), "deceived_beaten")
        .when((F.col("mean_deception") < 0) & (F.col("mean_recovery") >= 0), "unfazed_recovered")
        .otherwise("unfazed_beaten"),
    )
    if players is not None:
        out = out.join(
            F.broadcast(players.select(F.col("nfl_id").alias("defender_id"), "player_name")),
            "defender_id",
            "left",
        )
    return out


def receiver_rankings(
    scores: DataFrame, min_plays: int = 5, k: int = 10
) -> DataFrame:
    """Top/bottom-k receivers by mean deception generated against them
    (reference receivers.ipynb cells 2-6), deterministic tie-break."""
    per_rec = (
        scores.groupBy("receiver_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            F.round(F.avg("deception_score") + 1e-9, 4).alias("mean_deception"),
        )
        .where(F.col("n_plays") >= min_plays)
    )
    top = per_rec.orderBy(F.desc("mean_deception"), F.asc("receiver_id")).limit(k)
    bottom = per_rec.orderBy(F.asc("mean_deception"), F.asc("receiver_id")).limit(k)
    return top.withColumn("bucket", F.lit("most_deceptive")).unionByName(
        bottom.withColumn("bucket", F.lit("least_deceptive"))
    )


def extreme_plays(scores: DataFrame, k: int = 10) -> DataFrame:
    """The good_fake / good_recovery / bad_recovery case-study queries:
    global top-k plays by each score dimension, tagged."""
    by = lambda col, desc, tag: (  # noqa: E731
        scores.orderBy(
            F.desc(col) if desc else F.asc(col), F.asc("game_id"), F.asc("play_id")
        )
        .limit(k)
        .withColumn("bucket", F.lit(tag))
    )
    return (
        by("deception_score", True, "best_fakes")
        .unionByName(by("recovery_score", True, "best_recoveries"))
        .unionByName(by("recovery_score", False, "worst_recoveries"))
    )
