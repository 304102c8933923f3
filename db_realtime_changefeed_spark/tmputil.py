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
import os
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup)

#: resolved once per process (r13 optimization round): placement of
#: the ephemeral streaming state. Checkpoint WALs and MVCC state
#: commits are fsync-per-file workloads; on a VM-disk /tmp each
#: micro-batch pays tens of synchronous metadata flushes (measured at
#: sf0.1: stream_tumbling warm 2.9-3.8 s on ext4-/tmp vs 2.4 s on a
#: RAM-backed fs, with a 29 s cold-cache first-run mode on disk that
#: tmpfs removes entirely — OPTIMIZATION_r13.md). The cluster-scale
#: analog is putting state/WAL on the fastest local volume (NVMe)
#: rather than a network disk; the knob is SPARK_GRAFT_TMP.
_SCRATCH_BASE: list[str | None] = []


def scratch_base() -> str | None:
    """Base dir for scratch state: $SPARK_GRAFT_TMP if set, else a
    RAM-backed fs when one is mounted with generous headroom (>16 GiB
    free — sf0.1's whole scratch footprint is <1 GiB), else None
    (tempfile's default, the pre-r13 behavior)."""
    if _SCRATCH_BASE:
        return _SCRATCH_BASE[0]
    base = os.environ.get("SPARK_GRAFT_TMP")
    if not base:
        for cand in ("/dev/shm",):
            try:
                st = os.statvfs(cand)
                free = st.f_bavail * st.f_frsize
                if free > (16 << 30) and os.access(cand, os.W_OK):
                    base = os.path.join(cand, "dbrcf-scratch")
                    break
            except OSError:
                continue
    if base:
        try:
            os.makedirs(base, exist_ok=True)
        except OSError:
            base = None
    _SCRATCH_BASE.append(base)
    return base


def scratch_dir(prefix: str) -> str:
    """A fresh private directory removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix, dir=scratch_base())
    _SCRATCH_DIRS.append(d)
    return d
