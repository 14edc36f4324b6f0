from realtime_analytics_pipeline_spark.operators.event_metrics import event_metrics
from realtime_analytics_pipeline_spark.operators.performance_metrics import (
    performance_metrics,
)
from realtime_analytics_pipeline_spark.operators.session_metrics import session_metrics

__all__ = ["event_metrics", "performance_metrics", "session_metrics"]
