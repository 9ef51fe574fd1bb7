from .session import get_spark, local_frame, stop_spark

__all__ = ["get_spark", "local_frame", "stop_spark"]
