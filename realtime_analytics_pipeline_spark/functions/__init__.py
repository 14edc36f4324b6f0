from realtime_analytics_pipeline_spark.functions.device import categorize_device

__all__ = ["categorize_device"]
