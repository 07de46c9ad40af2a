"""nginx_analytics_spark — a PySpark-native log-analytics engine.

A ground-up re-expression of the capabilities of the reference system
(kmrhemant21/nginx-analytics: Loki -> Kafka -> Spark -> Postgres -> Superset)
as a single-engine, Parquet-backed, Catalyst-optimized Spark application.

Design tenets (SURVEY.md §7):
  * One engine, one store: everything the reference pushed down to Postgres
    is native Spark SQL over partitioned Parquet.
  * Parse once: one canonical 38-field schema + parse_enrich transform.
  * Declarative first: DataFrame/SQL so Catalyst does pushdown, pruning,
    broadcast selection; Pandas UDFs only where built-ins can't express
    the semantics (multimodal decode, grouped custom state).
  * Scale-first: every operator is written for a 1000-executor cluster —
    no driver-side collects in the data path, broadcast hints for small
    dims, partial aggregation shapes, salting/AQE notes where keys skew.
"""

__version__ = "0.1.0"

from nginx_analytics_spark.session import get_spark  # noqa: F401
