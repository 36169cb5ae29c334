"""fcntl file locks.

Equivalent of ``/root/reference/VLA/data/filelock_rdt.py:4-24``: shared read
/ exclusive write flocks with a non-blocking option — kept for multi-process
coordination at the host-IO edge (the in-band producer/consumer dirty-bit
protocol itself is superseded by the native episode cache, which is
immutable after packing and needs no locking).
"""

from __future__ import annotations

import fcntl


class FileLock:
    def __init__(self, f):
        """``f``: an open file object (kept open for the lock lifetime)."""
        self._f = f

    def read_lock(self, blocking: bool = True) -> None:
        flags = fcntl.LOCK_SH | (0 if blocking else fcntl.LOCK_NB)
        fcntl.flock(self._f.fileno(), flags)

    def write_lock(self, blocking: bool = True) -> None:
        flags = fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB)
        fcntl.flock(self._f.fileno(), flags)

    def release(self) -> None:
        fcntl.flock(self._f.fileno(), fcntl.LOCK_UN)

    def __enter__(self):
        self.write_lock()
        return self

    def __exit__(self, *exc):
        self.release()
        return False
