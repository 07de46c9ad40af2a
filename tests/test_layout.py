"""Z-order layout: pruning effectiveness measured from real Parquet
footers — row-group min/max stats must bound BOTH dimensions under the
Z layout, only one under a single-column sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from nginx_analytics_spark.operators import layout
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _row_group_overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] stats overlap [lo, hi] —
    the fraction a stats-pruning reader must actually scan."""
    total = hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i
               for i in range(meta.num_columns)}[col]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1
            elif not (st.max < lo or st.min > hi):
                hit += 1
    assert total > 0
    return hit / total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Granularity comes from FILE count at this fixture size (32 range
    partitions = 32 prunable units; at scale the same stats exist per
    row group inside each file)."""
    ev = load_table(spark, SF, "events").select("user_id", "value", "event_id")
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    layout.zorder_write(ev, zpath, "user_id", "value", n_files=32)
    (
        ev.repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    stats = spark.read.parquet(zpath).agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo, u_hi, v_lo, v_hi = stats
    u_band = (u_lo + (u_hi - u_lo) * 0.45, u_lo + (u_hi - u_lo) * 0.55)
    v_band = (v_lo + (v_hi - v_lo) * 0.45, v_lo + (v_hi - v_lo) * 0.55)

    z_u = _row_group_overlap_fraction(zpath, "user_id", *u_band)
    z_v = _row_group_overlap_fraction(zpath, "value", *v_band)
    s_u = _row_group_overlap_fraction(spath, "user_id", *u_band)
    s_v = _row_group_overlap_fraction(spath, "value", *v_band)

    # single-column sort: surgical on its key, blind on the other
    # (measured 0.07 / 1.0 at this fixture)
    assert s_u < 0.3
    assert s_v > 0.9
    # Z-order: BOTH dimensions prune substantially (measured 0.25 / 0.16)
    assert z_u < 0.5, (z_u, s_u)
    assert z_v < 0.5, (z_v, s_v)
    # and the content round-trips
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zvalue_interleave_is_monotone_in_quadrants(spark):
    """Quadrant ordering: z(0,0) < z of any point with a high bit set;
    interleave must keep the two keys' bits disjoint (a fills even bits,
    b odd bits)."""
    df = spark.range(1).select(
        layout.zvalue(F.lit(0).cast("bigint"), F.lit(0).cast("bigint")).alias("z00"),
        layout.zvalue(F.lit(1).cast("bigint"), F.lit(0).cast("bigint")).alias("z10"),
        layout.zvalue(F.lit(0).cast("bigint"), F.lit(1).cast("bigint")).alias("z01"),
        layout.zvalue(F.lit(65535).cast("bigint"), F.lit(0).cast("bigint")).alias("za"),
        layout.zvalue(F.lit(0).cast("bigint"), F.lit(65535).cast("bigint")).alias("zb"),
    ).first()
    assert df.z00 == 0
    assert df.z10 == 1  # a -> even bits
    assert df.z01 == 2  # b -> odd bits
    assert df.za == 0x55555555
    assert df.zb == 0xAAAAAAAA
    assert df.za & df.zb == 0  # disjoint bit lanes
