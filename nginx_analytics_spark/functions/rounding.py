"""Engine-portable float rounding.

Spark's ``round()`` rounds the shortest-decimal representation of a double
while DuckDB's rounds the binary value — they disagree on values like 1/640
whose decimal expansion terminates exactly at the tie digit. Every
oracle-compared float in this engine therefore rounds via
``floor(x * 10^n + 0.5) / 10^n`` (half-up in binary): the same IEEE op
sequence on both engines, so parity is structural, not probabilistic.

For negative inputs this is "half toward +inf" — also applied identically
on both sides. Stays inside whole-stage codegen (mul/add/floor/div).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(col: Column, places: int = 6) -> Column:
    """floor(x * 10^places + 0.5) / 10^places — see module docstring."""
    scale = float(10**places)
    return F.floor(col * scale + F.lit(0.5)) / scale


def half_up_sql(expr: str, places: int = 6) -> str:
    """The ANSI-SQL twin of :func:`half_up` (DuckDB-compatible)."""
    scale = 10**places
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
