"""Traffic forecasting — makes the reference's dead schema real.

The reference DDL declares ``traffic_forecasts(endpoint, forecast_time,
predicted_requests, confidence_score, model_version)`` but no job ever
writes it (reference postgres/init.sql:71-77; SURVEY.md §1.1 "dead
schema"). This operator implements the table's evident intent as a
transparent baseline forecaster:

  predicted_requests(next hour) =
      0.5 * (events in trailing 24 h) / 24          (mean hourly rate)
    + 0.5 * (events at the same hour-of-day in the trailing 7 d) / 7
                                                    (seasonal naive)

Both signals are integer event counts divided by constants, so the
forecast is exactly reproducible (and DuckDB-oracle-checked); the
confidence score is the relative agreement of the two signals. One
grouped count over a partition-pruned trailing window — no shuffle beyond
the single key aggregation, scale-indifferent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.functions.rounding import half_up

MODEL_VERSION = "sma24+seasonal7-v1"


def traffic_forecast(
    df: DataFrame,
    key: str,
    ts: str,
    as_of: str,
    round6=None,
) -> DataFrame:
    """Next-hour per-key request forecast (see module docstring).

    ``as_of`` must be an on-the-hour timestamp string; the forecast targets
    the hour starting at ``as_of``. ``round6`` is the engine's portable
    rounding (registry_dataops.r6) injected to keep this module
    oracle-parity-clean.
    """
    hi = F.lit(as_of).cast("timestamp")
    lo24 = hi - F.expr("INTERVAL 24 HOURS")
    lo7d = hi - F.expr("INTERVAL 7 DAYS")
    target_hour = F.hour(hi)

    in24 = (F.col(ts) > lo24) & (F.col(ts) <= hi)
    seasonal = (
        (F.col(ts) > lo7d) & (F.col(ts) <= hi) & (F.hour(F.col(ts)) == target_hour)
    )
    counts = (
        df.filter((F.col(ts) > lo7d) & (F.col(ts) <= hi))
        .groupBy(key)
        .agg(
            F.sum(in24.cast("bigint")).alias("n_24h"),
            F.sum(seasonal.cast("bigint")).alias("n_seasonal"),
        )
    )
    sma = F.col("n_24h") / 24.0
    season = F.col("n_seasonal") / 7.0
    predicted = 0.5 * sma + 0.5 * season
    # agreement of the two signals in [0, 1]: 1 - |sma - season| / max
    conf = F.when(
        F.greatest(sma, season) > 0,
        1 - F.abs(sma - season) / F.greatest(sma, season),
    ).otherwise(F.lit(0.0))
    r = round6 if round6 is not None else half_up
    return counts.select(
        F.col(key).alias("endpoint"),
        hi.alias("forecast_time"),
        r(predicted).alias("predicted_requests"),
        r(conf).alias("confidence_score"),
        F.lit(MODEL_VERSION).alias("model_version"),
    )
