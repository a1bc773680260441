"""Job locks: at most one driver runs a given lake at a time.

FileBasedJobLock analog (gobblin-runtime/.../locks/FileBasedJobLock.java —
one ``<job>.lock`` file per job; acquire = create, locked = file exists;
JobLockException on contention). Two CdcEngine drivers replaying the same
lake concurrently would race staged-file promotes and double-apply epochs,
so ``CdcEngine.run``/``run_forever`` take this lock by default.

Single-host semantics: the lock is an ``O_CREAT|O_EXCL`` file holding
``pid:start_ts``; a lock whose pid is dead is STALE and taken over
(a crashed driver must not wedge the lake — the reference delegates this
to lock-file cleanup / Zookeeper ephemerality). On a multi-node cluster
the lake lives on shared storage and the same create-exclusive protocol
holds wherever the filesystem gives atomic create (HDFS/NFS do; object
stores need a conditional-put — documented limitation, as in the
reference where ZookeeperBasedJobLock covers that gap).
"""

from __future__ import annotations

import os
import time


class JobLockError(RuntimeError):
    """Lock is held by a live process (JobLockException analog)."""


class FileJobLock:
    """Exclusive advisory lock via atomic create; context-manager friendly.

    >>> with FileJobLock(lake_dir):
    ...     engine.run()
    """

    def __init__(self, lock_dir: str, name: str = "job"):
        self.path = os.path.join(lock_dir, f"{name}.lock")

    # -- internals ---------------------------------------------------
    def _holder(self) -> int | None:
        """pid recorded in the lock file, or None if unreadable/gone."""
        try:
            with open(self.path) as f:
                return int(f.read().split(":", 1)[0])
        except (OSError, ValueError):
            return None

    @staticmethod
    def _alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else
        return True

    _TAKEOVER_STALE_SEC = 30.0  # a takeover guard older than this is from
    # a taker that died mid-takeover (the guarded section is tens of ms)

    def _remove_stale(self) -> None:
        """Remove the lock file iff it is STILL the stale instance we
        observed — serialized by a takeover guard file so no two processes
        are in here at once, and the content re-read inside the guard
        cannot race a fresh acquire (path exists, so O_EXCL creates fail;
        the recorded holder is dead, so it cannot release)."""
        try:
            with open(self.path) as f:
                observed = f.read()
        except OSError:
            return
        try:
            pid = int(observed.split(":", 1)[0])
        except ValueError:
            pid = None
        if pid is not None and (pid == os.getpid() or self._alive(pid)):
            return  # live (or our own) holder: nothing to take over
        guard = f"{self.path}.takeover"
        try:
            gfd = os.open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another taker is mid-takeover; break ONLY an abandoned guard
            try:
                if time.time() - os.path.getmtime(guard) > self._TAKEOVER_STALE_SEC:
                    os.remove(guard)
            except OSError:
                pass
            return
        try:
            # Re-verify UNDER the guard: remove only if the content is the
            # exact stale instance we first read — a fresh lock written by
            # a faster waiter has different content and survives. (A bare
            # remove-or-rename here was the TOCTOU the round-2 review
            # flagged: it could move a competitor's FRESH lock aside.)
            try:
                with open(self.path) as f:
                    current = f.read()
            except OSError:
                return
            if current == observed:
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass
        finally:
            os.close(gfd)
            try:
                os.remove(guard)
            except FileNotFoundError:
                pass

    # -- API ---------------------------------------------------------
    def try_acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        for _ in range(8):  # bounded: stale-removal then retry the create
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                pid = self._holder()
                if pid is None:
                    if not os.path.exists(self.path):
                        continue  # holder vanished between checks: retry
                    return False  # unreadable/corrupt: treat as locked
                if pid == os.getpid() or self._alive(pid):
                    # Live holder — including THIS process: the lock is
                    # deliberately non-reentrant, so a maintenance call
                    # (e.g. vacuum) inside a live run fails loudly instead
                    # of stealing and then releasing the run's own lock.
                    return False
                self._remove_stale()
                continue
            with os.fdopen(fd, "w") as f:
                f.write(f"{os.getpid()}:{time.time()}")
            return True
        return False

    def acquire(self) -> None:
        if not self.try_acquire():
            raise JobLockError(
                f"lake is locked by pid {self._holder()} ({self.path}); "
                "another driver is replaying this lake"
            )

    def release(self) -> None:
        if self._holder() == os.getpid():
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass

    def __enter__(self) -> "FileJobLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
