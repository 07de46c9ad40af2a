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
Iceberg/Delta commit pattern, not a ``rename`` shim. This seam keeps
that decision in one replaceable object instead of scattered ``os``
calls.

Everything that moves row data (parquet read/write) already goes through
Spark's own Hadoop FileSystem machinery and needs nothing from here.
"""

from __future__ import annotations

import contextlib
import os
import shutil
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


#: Default seam used by operators/dedup.py when the caller passes no
#: ``fs``. A deployment whose index lives on HDFS swaps in its own
#: implementation per the table above.
LOCAL_FS = LocalIndexFS()
