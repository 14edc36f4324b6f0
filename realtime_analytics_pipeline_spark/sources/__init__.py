from realtime_analytics_pipeline_spark.sources.batch import load_events, load_table

__all__ = ["load_table", "load_events"]
