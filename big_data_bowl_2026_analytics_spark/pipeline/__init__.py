from .cleaning import (
    clean_plays,
    clean_tracking,
    create_players_dim,
    filter_plays_with_tracking,
)
from .features import build_features, last_frame_per_player
from .scores import compute_scores

__all__ = [
    "build_features",
    "clean_plays",
    "clean_tracking",
    "compute_scores",
    "create_players_dim",
    "filter_plays_with_tracking",
    "last_frame_per_player",
]
