"""Device categorization.

Reference: services/processing/src/transformations/device_categorizer.py:4-13 —
a chained CASE/WHEN over LIKE patterns. Precedence matters (Mobile wins
over Tablet wins over Bot; anything else — including null — is Desktop).

Pure Column-in/Column-out: stays inside Catalyst/whole-stage codegen,
no UDF (reference docs likewise recommend reuse as a shared
transformation, docs/modules/processing/adding-jobs.md:105-111).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def categorize_device(user_agent: Column | str) -> Column:
    ua = F.col(user_agent) if isinstance(user_agent, str) else user_agent
    return (
        F.when(ua.like("%Mobile%"), "Mobile")
        .when(ua.like("%Tablet%"), "Tablet")
        .when(ua.like("%Bot%"), "Bot")
        .otherwise("Desktop")
        .alias("device_category")
    )
