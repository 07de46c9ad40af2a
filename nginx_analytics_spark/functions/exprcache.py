"""Process-level memo for hot per-row expression COLUMNS (r16 wave 8).

Building a PySpark Column is driver-side work: every ``F.transform`` /
``F.filter`` Python lambda costs ~a dozen py4j socket round trips
(`_create_lambda` builds the JVM lambda tree call-by-call), measured at
~50 ms per higher-order function and ~0.3–0.9 s per BUILD of the
HOF-heavy operators (cProfile: >1,100 round trips per `curate_corpus`
build, 80% of build wall in ``socket.recv_into`` — guide §7.3, the
plan/build itself is the cost). The expression TREES, however, are
immutable and parameterized only by column NAME and constants — the
same tree is rebuilt identically on every query construction.

This cache builds each such Column once per process and reuses it.
It memoizes EXPRESSIONS ONLY — unresolved Catalyst trees, no data, no
plan fragments, no results — so it cannot interact with what any query
computes (the analyzer resolves the shared tree freshly inside every
plan that embeds it; Catalyst expressions are immutable). Keys must
fully determine the built tree: callers key on (builder-name, column
name, every constant parameter). Only column-NAME inputs are cacheable;
a caller passing a computed Column gets a fresh build (the tree would
capture that exact Column object).

The cache lives for the Python process — exactly the lifetime of the
py4j gateway whose objects the Columns reference. A fresh JVM (the
bench's fresh-JVM-per-group protocol, a new driver) starts empty.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column

_CACHE: dict[tuple, Column] = {}


def cached_column(key: tuple, builder: Callable[[], Column]) -> Column:
    """Return the memoized Column for ``key``, building it on first use.

    ``key`` must start with a unique builder name and include every
    parameter that shapes the tree."""
    col = _CACHE.get(key)
    if col is None:
        col = _CACHE[key] = builder()
    return col
