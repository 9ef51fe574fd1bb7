from .analytics import defender_quadrants, extreme_plays, receiver_rankings
from .cleaning import (
    clean_plays,
    clean_tracking,
    create_players_dim,
    filter_plays_with_tracking,
)
from .features import build_features, last_frame_per_player, train_test_split_by_week
from .multimodal import extract_features, sample_frames
from .run import PipelineResult, run_pipeline
from .scores import compute_scores

__all__ = [
    "PipelineResult",
    "build_features",
    "clean_plays",
    "clean_tracking",
    "compute_scores",
    "create_players_dim",
    "defender_quadrants",
    "extract_features",
    "extreme_plays",
    "filter_plays_with_tracking",
    "last_frame_per_player",
    "receiver_rankings",
    "run_pipeline",
    "sample_frames",
    "train_test_split_by_week",
]
