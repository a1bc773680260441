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

    @staticmethod
    def _proc_start(pid: int) -> int | None:
        """Kernel start time of ``pid`` (clock ticks since boot, field 22
        of /proc/<pid>/stat), or None when unavailable (non-Linux, pid
        gone, permission). The (pid, start-ticks) pair uniquely identifies
        a process incarnation — pid alone does not (pids are recycled)."""
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                data = f.read()
            # comm (field 2) can contain spaces/parens: split after ')'
            rest = data.rsplit(b")", 1)[1].split()
            return int(rest[19])  # field 22 (state is field 3 = rest[0])
        except (OSError, IndexError, ValueError):
            return None

    def _is_live(self, content: str) -> bool:
        """Is the lock CONTENT a live holder? pid liveness alone is not
        enough: a recycled pid would wedge the lake forever, so the lock
        records the holder's /proc start ticks and a mismatch means the
        original holder is dead (pid reuse). Two-field legacy locks fall
        back to pid liveness."""
        parts = content.split(":")
        try:
            pid = int(parts[0])
        except (ValueError, IndexError):
            return False
        if pid == os.getpid():
            return True
        if not self._alive(pid):
            return False
        try:
            recorded = int(parts[2]) if len(parts) > 2 and parts[2] else None
        except ValueError:
            recorded = None
        if recorded is None:
            return True  # legacy lock: pid liveness is all we have
        current = self._proc_start(pid)
        return current is None or current == recorded

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
            int(observed.split(":", 1)[0])
        except (ValueError, IndexError):
            return  # corrupt content: never steal
        if self._is_live(observed):
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
                try:
                    with open(self.path) as f:
                        content = f.read()
                except OSError:
                    if not os.path.exists(self.path):
                        continue  # holder vanished between checks: retry
                    return False  # unreadable: treat as locked
                try:
                    int(content.split(":", 1)[0])
                except (ValueError, IndexError):
                    return False  # corrupt: treat as locked, never steal
                if self._is_live(content):
                    # Live holder — including THIS process: the lock is
                    # deliberately non-reentrant, so a maintenance call
                    # (e.g. vacuum) inside a live run fails loudly instead
                    # of stealing and then releasing the run's own lock.
                    # Liveness = (pid, /proc start ticks) pair, so a
                    # RECYCLED pid no longer wedges the lake.
                    return False
                self._remove_stale()
                continue
            with os.fdopen(fd, "w") as f:
                start = self._proc_start(os.getpid())
                f.write(f"{os.getpid()}:{time.time()}:"
                        f"{'' if start is None else start}")
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
