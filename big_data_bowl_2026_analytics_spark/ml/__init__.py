from .evaluate import binary_metrics, calibration_bins
from .inference import score_dataframe
from .model import LogisticModel, train_logistic

__all__ = [
    "LogisticModel",
    "binary_metrics",
    "calibration_bins",
    "score_dataframe",
    "train_logistic",
]
