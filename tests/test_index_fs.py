"""The index-storage seam, proven over BOTH layouts (r8 verdict item
2): the same X79 append / X82 compaction / recovery / mutex battery
runs parameterized over ``LocalIndexFS`` (rename-swap directory tree)
and ``ManifestIndexFS`` (the documented S3 manifest-pointer port —
immutable unit dirs, one atomic manifest flip per visible change,
flip-last crash protocol). The porting table in ``index_fs.py`` stops
being untested prose: content, probe results, compaction invariants,
crash healing, and mutex exclusion are asserted identical across
layouts; only the planted crash state differs (detached ``.old`` band
vs orphan unit dir), because that IS the layout difference.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nginx_analytics_spark.operators import dedup
from nginx_analytics_spark.operators.index_fs import (
    LocalIndexFS,
    LockHeldError,
    ManifestIndexFS,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(params=["local", "manifest"])
def index_fs(request):
    return LocalIndexFS() if request.param == "local" else ManifestIndexFS()


def _rows(spark, idx, fs):
    return sorted(
        (r.doc_id, r.band_idx, r.band_hash)
        for r in dedup.read_lsh_index_rows(spark, idx, fs=fs).collect()
    )


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_write_append_content_invariant_across_layouts(spark, tmp_path, index_fs):
    """X79's property, per layout: write(A) then append(B) holds exactly
    the same (id, band_idx, band_hash) multiset as write(A ∪ B)."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    idx = str(tmp_path / "idx")
    dedup.write_lsh_index(a, idx, fs=index_fs)
    dedup.append_lsh_index(b, idx, fs=index_fs)
    whole = str(tmp_path / "whole")
    dedup.write_lsh_index(docs, whole, fs=index_fs)
    assert _rows(spark, idx, index_fs) == _rows(spark, whole, index_fs)


def test_probe_pairs_identical_across_layouts(spark, tmp_path):
    """The at-rest probe returns the SAME near-dup pairs through either
    layout — placement and commit protocol must not leak into results."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    pairs = {}
    for name, fs in (("local", LocalIndexFS()), ("manifest", ManifestIndexFS())):
        idx = str(tmp_path / f"idx_{name}")
        dedup.write_lsh_index(corpus, idx, fs=fs)
        pairs[name] = sorted(
            (r.new_id, r.old_id, r.jaccard)
            for r in dedup.incremental_near_dups(
                spark, batch, corpus, idx, threshold=0.5, fs=fs
            ).collect()
        )
    assert pairs["local"] == pairs["manifest"]
    assert pairs["local"]  # the fixture has cross-split near-dups


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path, index_fs):
    """X82 per layout: after appends push every band over the file
    threshold, compaction preserves the row multiset exactly, reduces
    the per-band file population, reports coherent stats, and leaves
    probes unchanged."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    dedup.write_lsh_index(docs.filter(F.col("doc_id") % 3 == 0), idx, fs=index_fs)
    dedup.append_lsh_index(docs.filter(F.col("doc_id") % 3 == 1), idx, fs=index_fs)
    dedup.append_lsh_index(docs.filter(F.col("doc_id") % 3 == 2), idx, fs=index_fs)
    before = _rows(spark, idx, index_fs)

    stats = dedup.compact_lsh_index(
        spark, idx, max_files_per_band=1, fs=index_fs
    )
    assert stats["bands_compacted"] == stats["bands_seen"] > 0
    assert stats["files_after"] < stats["files_before"]
    assert _rows(spark, idx, index_fs) == before

    # idempotent at the floor: a second pass finds nothing oversized
    # (every band is now at its target file count)
    again = dedup.compact_lsh_index(
        spark, idx, max_files_per_band=1, fs=index_fs
    )
    assert again["bands_compacted"] == 0
    assert again["files_before"] == again["files_after"] == stats["files_after"]


def _plant_crash(idx: str, fs) -> None:
    """Layout-specific crash state: local = a band detached to .old
    (between the two renames); manifest = a written-but-never-flipped
    orphan unit (the only mid-state its flip-last protocol can leave)."""
    if isinstance(fs, ManifestIndexFS):
        orphan = os.path.join(idx, "u999999")
        os.makedirs(os.path.join(orphan, "band_idx=0"), exist_ok=True)
        with open(os.path.join(orphan, "band_idx=0", "part-junk.parquet"), "wb") as f:
            f.write(b"not really parquet")
    else:
        bands = sorted(
            d for d in os.listdir(idx) if d.startswith("band_idx=")
        )
        os.rename(
            os.path.join(idx, bands[0]),
            os.path.join(idx, f".old-{bands[0]}-7-424242"),
        )


def test_recovery_heals_layout_specific_crash_state(spark, tmp_path, index_fs):
    """Recovery-on-entry (the X80 loop's first act under the mutex)
    restores the exact pre-crash row set for either layout and leaves
    no crash debris behind."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    dedup.write_lsh_index(docs, idx, fs=index_fs)
    before = _rows(spark, idx, index_fs)

    _plant_crash(idx, index_fs)
    assert dedup._recover_lsh_compaction(idx, fs=index_fs) is True
    assert _rows(spark, idx, index_fs) == before
    debris = [
        d
        for d in os.listdir(idx)
        if d.startswith(".old-") or d == "u999999"
    ]
    assert debris == []


def test_mutex_excludes_compaction_across_layouts(spark, tmp_path, index_fs):
    """The single-compactor mutex holds for either layout: a held lock
    refuses compact_lsh_index with the dedicated LockHeldError."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    dedup.write_lsh_index(docs, idx, fs=index_fs)
    with index_fs.exclusive_lock(
        dedup._lsh_compact_lock_path(idx), "test holder"
    ):
        with pytest.raises(LockHeldError, match="single-compactor"):
            dedup.compact_lsh_index(spark, idx, fs=index_fs)
    # released: compaction runs (no-op at default threshold)
    stats = dedup.compact_lsh_index(spark, idx, fs=index_fs)
    assert stats["bands_seen"] > 0


def test_x80_loop_runs_identically_over_manifest_layout(spark, tmp_path):
    """End to end: the streaming dedup-ingest loop admits exactly the
    same documents through the manifest layout as the local one — the
    layout seam is invisible to the pipeline's semantics (bootstrap,
    probe, append, in-loop compaction all dispatch through it)."""
    from nginx_analytics_spark.streaming.dedup_ingest import process_batch

    docs = _docs(spark)
    batches = [
        docs.filter(F.col("doc_id") % 3 == k).localCheckpoint(eager=True)
        for k in range(3)
    ]
    admitted = {}
    for name, fs in (("local", LocalIndexFS()), ("manifest", ManifestIndexFS())):
        corpus = str(tmp_path / f"corpus_{name}")
        idx = str(tmp_path / f"idx_{name}")
        counts = [
            process_batch(
                spark, b, i, corpus, idx, threshold=0.5,
                compact_every=2, max_files_per_band=1, fs=fs,
            )
            for i, b in enumerate(batches)
        ]
        admitted[name] = (
            counts,
            sorted(r.doc_id for r in spark.read.parquet(corpus).collect()),
        )
    assert admitted["local"] == admitted["manifest"]
    assert admitted["local"][0][0] > (0, 0)  # something actually ran


def test_concurrent_compaction_matches_sequential(spark, tmp_path):
    """X82 concurrency parity (r8 verdict item 3): compacting with
    max_concurrency=1 and with the default thread pool produce the
    identical row multiset, identical stats, and identical per-band
    file layout — concurrency changes wall time only. (Bands are
    disjoint directories and each band's swap is self-contained, so
    interleaving cannot change outcomes; this pins it.)"""
    docs = _docs(spark)
    layouts = {}
    for name, conc in (("seq", 1), ("conc", 4)):
        idx = str(tmp_path / f"idx_{name}")
        dedup.write_lsh_index(docs.filter(F.col("doc_id") % 2 == 0), idx)
        dedup.append_lsh_index(docs.filter(F.col("doc_id") % 2 == 1), idx)
        stats = dedup.compact_lsh_index(
            spark, idx, max_files_per_band=1, target_files=2,
            max_concurrency=conc,
        )
        files = {
            band: sorted(
                f
                for f in os.listdir(os.path.join(idx, band))
                if f.endswith(".parquet")
            )
            for band in os.listdir(idx)
            if band.startswith("band_idx=")
        }
        layouts[name] = (
            stats,
            {b: len(fs_) for b, fs_ in files.items()},
            _rows(spark, idx, LocalIndexFS()),
        )
    assert layouts["seq"] == layouts["conc"]
    assert layouts["seq"][0]["bands_compacted"] > 1  # pool actually fanned out
