from nginx_analytics_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    read_nginx_jsonl,
    register_views,
)
