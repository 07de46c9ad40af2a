"""Expression-memo lifetime (r16 verdict item: pin the gateway
assumption). ``functions/exprcache.py`` caches unresolved Columns for
the Python PROCESS, while a SparkSession can stop and restart within
one process. The cached Columns reference py4j gateway objects; the
gateway outlives ``spark.stop()`` in local mode today, but nothing
else pinned that — this test does. It runs in a SUBPROCESS because
stopping the shared session fixture would strand every sibling test
on a stale handle.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    from nginx_analytics_spark.functions import exprcache
    from nginx_analytics_spark.operators import dedup
    from nginx_analytics_spark.session import get_spark

    def shingle_sets(spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
        )
        rows = df.select(
            "doc_id", dedup.word_shingles("text").alias("sh")
        ).collect()
        return sorted((r.doc_id, tuple(sorted(r.sh))) for r in rows)

    s1 = get_spark(app_name="exprcache_lifetime", master="local[2]")
    first = shingle_sets(s1)
    assert exprcache._CACHE, "word_shingles('text') must populate the memo"
    cached_before = dict(exprcache._CACHE)
    s1.stop()

    # Same Python process, FRESH session: the memoized Columns must stay
    # usable (their JVM objects live on the process-lifetime gateway).
    s2 = get_spark(app_name="exprcache_lifetime_2", master="local[2]")
    second = shingle_sets(s2)
    assert first == second, f"{first} != {second}"
    # The second build must have HIT the memo, not repopulated it: every
    # pre-stop entry is still the same Column object.
    for k, v in cached_before.items():
        assert exprcache._CACHE.get(k) is v, f"memo entry {k} was rebuilt"
    s2.stop()
    print("EXPRCACHE_LIFETIME_OK")
    """
)


def test_cached_columns_survive_session_restart():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "EXPRCACHE_LIFETIME_OK" in out.stdout
