from .deception import deception_scores, pelt_l2
from .recovery import recovery_scores

__all__ = ["deception_scores", "pelt_l2", "recovery_scores"]
