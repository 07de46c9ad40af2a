"""Registry-wide driver-contract schema lint (r13 verdict item 1b).

The external driver canonicalizes EVERY registered query's result with
pandas — ``toPandas()`` → sort columns by name → sort rows →
``factorize`` each column for value hashing. ``factorize`` builds a hash
table over the cells, so any column whose pandas cells are unhashable
(``array<...>`` → ``np.ndarray``, ``map<...,...>`` → ``dict``,
``struct<...>`` → ``Row``/``dict``) crashes the driver's row — the
``bpe_tokens`` red row in CORRECTNESS_r13
(``TypeError: unhashable type: 'list'``).

The local verify tier only exercised queries WITH oracles (rows-only
entries were never canonicalized locally), which is exactly how the r13
red shipped. This test closes that gap at the structural level: every
entry in ``queries()`` — oracle-backed or rows-only — must present a
top-level schema of scalar (atomic) columns only. Nested data is fine
INSIDE an operator; a registered query must project it to a
driver-hashable shape (``array_join``, explode, checksum) before
returning.

Schema inspection needs the DataFrame object, not its rows, so the
lazy queries cost one plan build each; the handful of eager
streaming-roundtrip harnesses run at sf0.001 exactly as the driver
runs them.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from nginx_analytics_spark import registry

SF_SMALL = "/root/testdata/sf0.001"

QUERIES = registry.queries()

# Types whose pandas cells are unhashable under the driver's factorize.
_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_top_level_schema_is_driver_hashable(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, _NESTED)
    ]
    assert not bad, (
        f"{name} returns nested top-level column(s) {bad} — the driver's "
        "pandas canonicalizer cannot hash array/map/struct cells "
        "(CORRECTNESS_r13 bpe_tokens). Project to scalars "
        "(array_join / explode / checksum) before registering."
    )
