from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from nginx_analytics_spark.session import get_spark

    s = get_spark(app_name="nginx_analytics_spark_tests")
    yield s
