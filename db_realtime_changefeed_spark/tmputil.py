"""Process-lifetime scratch directories (ADVICE r5 item 3).

Several operators materialize load-bearing intermediate state on
local disk — streaming checkpoints that scan_state_store reads BACK
as a batch source, changefeed MVCC roots, parquet spill/staging dirs.
These must outlive the call that created them (the returned DataFrame
reads them lazily, and session-memoized fixtures reuse them across
gradings), so they cannot be context-managed — but a bare
tempfile.mkdtemp leaked every one of them permanently into /tmp,
one per query run per sweep. scratch_dir() is the drop-in
replacement: same fresh directory, plus atexit cleanup when the
driver process exits — after every lazy read and re-grading is done,
before the sweep's tmp footprint can accumulate across processes.

Cleanup is best-effort (ignore_errors): a half-removed scratch dir at
interpreter teardown must never turn a green run red.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(prefix: str) -> str:
    """A fresh private directory removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d
