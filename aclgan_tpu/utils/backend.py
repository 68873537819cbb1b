"""Backend-level host-memory hygiene for long-running processes.

Round-4 incident: the 20k-iteration hard-task train run was OOM-killed at
~iter 19,500 with 125 GB host RSS, growing ~6.3 MB/iteration — exactly the
x_a+x_b uint8 batch pair shipped to the device each step. The leak is not in
this package (a CPU-platform control run of the same loop is flat — see
tools/probe_hostmem.py): the remote-TPU client keeps a *journal of every op
since session start, including H2D transfer payloads*, so it can transparently
re-bind and replay the session if the backend connection drops. A training
loop that ships fresh batch bytes every iteration therefore grows host memory
without bound — the reference's 350k-iteration workload (its train.py loop,
reference train.py:65-104) would die ~17x before finishing.

`AXON_JOURNAL_COMPACT` makes the client filter the journal to executable ops
(compiles/loads), dropping transfer payloads: bounded memory, at the cost of
transparent replay — if the backend connection drops mid-run the process gets
a clear "cannot be replayed" error instead of a silent recovery, and recovery
is the checkpoint/--resume path (which training has every snapshot_save_iter).
That trade is right for every long-running surface here: an unbounded journal
kills the run with certainty; a dropped connection is rare and resumable.

Call `bound_transfer_journal()` before first device use (any jax client
creation). A user-set AXON_JOURNAL_COMPACT (even empty) is respected.
Verification: tools/probe_hostmem.py measures RSS slope per transfer mode
with/without the knob on the live backend.
"""

from __future__ import annotations

import os


#: values reported as "journal NOT bounded" when user-set (case-insensitive).
#: Kept in sync with common boolean-env conventions so the return value does
#: not misreport a user's intent (ADVICE r4) — the client lib itself only
#: distinguishes set/unset+"0", but our callers read the *return*.
_FALSY = ("", "0", "false", "no", "off")


def bound_transfer_journal() -> bool:
    """Default AXON_JOURNAL_COMPACT=1 (see module docstring). Returns True
    if the journal is bounded (by us or by the user), False if the user
    explicitly opted out (any of ''/'0'/'false'/'no'/'off', case-insensitive).
    No-op on non-axon backends (env var is simply ignored there)."""
    if "AXON_JOURNAL_COMPACT" in os.environ:
        return os.environ["AXON_JOURNAL_COMPACT"].strip().lower() not in _FALSY
    os.environ["AXON_JOURNAL_COMPACT"] = "1"
    return True
