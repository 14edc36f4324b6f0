"""Serving facade: 1:1 method-per-endpoint parity with the reference
cache API.

The reference serves windowed metrics over FastAPI
(services/cache/src/api/endpoints/metrics.py:8-31 — /event/latest,
/event/windows?limit, /performance/windows?limit, /overview;
health.py:6-16 — /healthz, /readyz) backed by a Redis repository
(services/cache/src/services/cache_service.py:22-37). Here the same
surface is a thin class over the engine's serving operators (T1-T6)
reading any metrics store the sinks write (parquet dir, JDBC table,
or in-memory DataFrames) — wrap the methods with any HTTP framework
to restore the wire format; every response already matches the
reference's payload shape (window-pivoted rows).

At scale the facade only ever touches serving-sized data: the sinks
(streaming/sinks.py) maintain retention-trimmed materializations, so
``limit``-bounded reads never scan history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_analytics_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from realtime_analytics_pipeline_spark.operators import serving


class ServingApi:
    """Endpoint-parity facade over pivoted event/performance metrics.

    ``event_pivot`` / ``perf_pivot``: the T1/T2 wide tables (from the
    live sinks or batch jobs), one row per window.
    """

    def __init__(
        self,
        event_pivot: DataFrame,
        perf_pivot: DataFrame,
        config: EngineConfig = DEFAULT_CONFIG,
    ) -> None:
        self._event = event_pivot
        self._perf = perf_pivot
        self._config = config

    @classmethod
    def from_parquet(
        cls,
        spark: SparkSession,
        event_dir: str,
        perf_dir: str,
        config: EngineConfig = DEFAULT_CONFIG,
    ) -> "ServingApi":
        """Attach to the materialized serving store the streaming
        sinks maintain (the Redis analog)."""
        return cls(
            spark.read.parquet(event_dir),
            spark.read.parquet(perf_dir),
            config,
        )

    # -- endpoint parity -------------------------------------------------

    def event_latest(self) -> DataFrame:
        """GET /event/latest (metrics.py:8-10): newest event window."""
        return serving.top_n_windows(self._event, 1)

    def event_windows(self, limit: int = 20) -> DataFrame:
        """GET /event/windows?limit= (metrics.py:13-18; default 20)."""
        return serving.top_n_windows(self._event, limit)

    def performance_windows(self, limit: int = 20) -> DataFrame:
        """GET /performance/windows?limit= (metrics.py:21-26)."""
        return serving.top_n_windows(self._perf, limit)

    def overview(self) -> DataFrame:
        """GET /overview (metrics.py:29-31, cache_service.py:31-39):
        combined latest event + latest performance snapshot."""
        return serving.overview(self._event, self._perf)

    # -- health parity ---------------------------------------------------

    def healthz(self) -> dict:
        """GET /healthz (health.py:6-8): liveness — the session is up."""
        spark = self._event.sparkSession
        return {"status": "ok", "app": spark.sparkContext.appName}

    def readyz(self) -> dict:
        """GET /readyz (health.py:15-17): readiness — the serving
        store is reachable and non-empty-schema'd."""
        ready = bool(self._event.columns) and bool(self._perf.columns)
        return {"status": "ok" if ready else "unavailable"}
