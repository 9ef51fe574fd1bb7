"""Explicit StructTypes for the domain tables (SURVEY §1.2-§1.4).

The reference infers CSV dtypes and hand-checks required columns after
the fact (/root/reference/src/io/datasets.py:24,
/root/reference/src/data_processing/cleaning/plays.py:67-72). Explicit
schemas + FAILFAST reads replace both: a malformed or missing column
fails at the scan, not three joins later.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


#: Pre-throw player-frame tracking (reference TRACKING_COLS_BEFORE_THROW,
#: src/data_processing/cleaning/tracking.py:14-28 + bio/ball columns).
TRACKING_BEFORE_SCHEMA = _struct(
    [
        ("game_id", T.LongType()),
        ("play_id", T.LongType()),
        ("nfl_id", T.LongType()),
        ("frame_id", T.IntegerType()),
        ("play_direction", T.StringType()),
        ("player_side", T.StringType()),
        ("player_role", T.StringType()),
        ("player_name", T.StringType()),
        ("player_height", T.StringType()),
        ("player_weight", T.DoubleType()),
        ("player_birth_date", T.StringType()),
        ("player_position", T.StringType()),
        ("x", T.DoubleType()),
        ("y", T.DoubleType()),
        ("s", T.DoubleType()),
        ("a", T.DoubleType()),
        ("dir", T.DoubleType()),
        ("o", T.DoubleType()),
        ("absolute_yardline_number", T.DoubleType()),
        ("ball_land_x", T.DoubleType()),
        ("ball_land_y", T.DoubleType()),
        ("week", T.IntegerType()),
    ]
)

#: Post-throw player-frame tracking (frame_id restarts at 1).
TRACKING_AFTER_SCHEMA = _struct(
    [
        ("game_id", T.LongType()),
        ("play_id", T.LongType()),
        ("nfl_id", T.LongType()),
        ("frame_id", T.IntegerType()),
        ("x", T.DoubleType()),
        ("y", T.DoubleType()),
        ("s", T.DoubleType()),
        ("a", T.DoubleType()),
        ("dir", T.DoubleType()),
        ("o", T.DoubleType()),
        ("week", T.IntegerType()),
    ]
)

#: Play-level supplementary data (reference PLAY_COLS, plays.py:13-39).
PLAYS_SCHEMA = _struct(
    [
        ("game_id", T.LongType()),
        ("play_id", T.LongType()),
        ("season", T.IntegerType()),
        ("week", T.IntegerType()),
        ("quarter", T.IntegerType()),
        ("game_clock", T.StringType()),
        ("down", T.IntegerType()),
        ("home_team_abbr", T.StringType()),
        ("visitor_team_abbr", T.StringType()),
        ("play_description", T.StringType()),
        ("yards_to_go", T.IntegerType()),
        ("possession_team", T.StringType()),
        ("defensive_team", T.StringType()),
        ("yardline_number", T.IntegerType()),
        ("play_nullified_by_penalty", T.StringType()),
        ("pass_result", T.StringType()),
        ("pass_length", T.DoubleType()),
        ("offense_formation", T.StringType()),
        ("receiver_alignment", T.StringType()),
        ("route_of_targeted_receiver", T.StringType()),
        ("play_action", T.StringType()),
        ("dropback_type", T.StringType()),
        ("dropback_distance", T.DoubleType()),
        ("team_coverage_man_zone", T.StringType()),
        ("team_coverage_type", T.StringType()),
    ]
)

#: Player dimension derived from tracking (players.py:13-20).
PLAYERS_SCHEMA = _struct(
    [
        ("nfl_id", T.LongType()),
        ("player_name", T.StringType()),
        ("player_height", T.StringType()),
        ("player_weight", T.DoubleType()),
        ("player_birth_date", T.StringType()),
        ("player_position", T.StringType()),
    ]
)

#: Per-frame model output feeding the metrics stage
#: (reference src/inference.py:72-77).
INFERENCE_RESULTS_SCHEMA = _struct(
    [
        ("game_id", T.LongType()),
        ("play_id", T.LongType()),
        ("frame_id", T.IntegerType()),
        ("receiver_id", T.LongType()),
        ("defender_id", T.LongType()),
        ("pass_result", T.StringType()),
        ("non_completion_probability", T.DoubleType()),
    ]
)

#: Final scores table (reference data/scores.csv header,
#: src/metrics/compute_scores.py:38-47).
SCORES_SCHEMA = _struct(
    [
        ("game_id", T.LongType()),
        ("play_id", T.LongType()),
        ("defender_id", T.LongType()),
        ("receiver_id", T.LongType()),
        ("deception_score", T.DoubleType()),
        ("recovery_score", T.DoubleType()),
    ]
)

#: Defensive-back positions (reference src/core/settings.py:64).
DB_POSITIONS = ("CB", "DB", "FS", "SS")

#: Routes the pipeline keeps (reference plays.py:50).
KEPT_ROUTES = ("IN", "OUT", "HITCH")
