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

    # -- API ---------------------------------------------------------
    def try_acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                pid = self._holder()
                if pid is not None and (pid == os.getpid() or not self._alive(pid)):
                    # Stale (holder died) or re-entrant: take over. A bare
                    # os.remove is a TOCTOU race — two waiters can both read
                    # the dead pid, and the slower one would remove the
                    # faster one's FRESH lock. rename() is atomic: exactly
                    # one renamer moves the stale file aside; the loser gets
                    # FileNotFoundError and loops back to re-inspect.
                    stale = f"{self.path}.stale.{os.getpid()}.{time.monotonic_ns()}"
                    try:
                        os.rename(self.path, stale)
                        os.remove(stale)
                    except FileNotFoundError:
                        pass
                    continue
                return False
            with os.fdopen(fd, "w") as f:
                f.write(f"{os.getpid()}:{time.time()}")
            return True

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
