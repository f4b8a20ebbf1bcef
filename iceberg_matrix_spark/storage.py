"""Injectable storage root for persisted intermediates (VERDICT r11 #2).

Operators that materialize intermediate datasets — shingle-set
projections, join-strategy frames, ANN/chunk index generations, report
state, IceLite scratch warehouses — allocate their directories here
instead of calling ``tempfile.mkdtemp`` directly. That fixes two things
the per-call mkdtemp pattern got wrong:

1. **Cluster readability.** A dataset written to a driver-local temp
   path is unreadable by executors on any other node. The root is now
   injectable (``IMX_STORAGE_ROOT`` env var or :func:`set_storage_root`)
   so a multi-node deployment points it at shared storage (NFS mount,
   fuse-mounted object store); the single-machine default stays the
   local temp directory, which keeps local mode and the bench byte-for-
   byte identical to the old behavior.
2. **Reaping.** Per-call dirs were never deleted within a session, so a
   long-lived ingest grew scratch space without bound. Scratch dirs are
   now generation-managed per prefix, and the whole session directory is
   removed at interpreter exit.

Two allocation flavors:

- :func:`scratch_dir` — GENERATION-MANAGED. Keeps the most recent
  ``IMX_SCRATCH_KEEP`` (default 2) directories per prefix and deletes
  older ones. Contract: a frame persisted under a scratch dir stays
  readable until the same prefix has been allocated ``keep`` more times
  — callers hold at most the current and the previous generation (the
  bench's min-of-N loop and incremental operators' old/new comparisons
  both fit; anything longer-lived belongs in ``state_dir``).
- :func:`state_dir` — caller-owned lifetime, no generation reaping.
  For incremental-operator STATE whose lifetime is tied to a
  content-keyed cache entry; reclaimed only by the session-exit sweep.

Everything lives under one session directory
``<root>/imx-session-<pid>-<rand>/`` (parallel sessions sharing an
injected root never collide), registered with ``atexit`` for removal.
An injected root itself is never deleted — the caller owns it.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile
import threading
import uuid

_LOCK = threading.Lock()
_SESSION_DIR: str | None = None
_INJECTED_ROOT: str | None = None
_GENERATIONS: dict[str, list[str]] = {}
_SEQ = itertools.count()


def set_storage_root(path: str | None) -> None:
    """Inject (or, with None, re-resolve from the environment) the root
    under which all subsequent session storage is allocated. Starts a
    fresh session directory; directories already handed out remain valid
    until their normal reaping."""
    global _INJECTED_ROOT, _SESSION_DIR
    with _LOCK:
        _INJECTED_ROOT = path
        _SESSION_DIR = None
        _GENERATIONS.clear()


def storage_root() -> str:
    """The session storage directory (created on first use)."""
    with _LOCK:
        return _session_dir_locked()


def _session_dir_locked() -> str:
    global _SESSION_DIR
    if _SESSION_DIR is None:
        base = (
            _INJECTED_ROOT
            or os.environ.get("IMX_STORAGE_ROOT")
            or tempfile.gettempdir()
        )
        os.makedirs(base, exist_ok=True)
        _SESSION_DIR = os.path.join(
            base, f"imx-session-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(_SESSION_DIR)
        atexit.register(shutil.rmtree, _SESSION_DIR, ignore_errors=True)
    return _SESSION_DIR


def scratch_dir(prefix: str, keep: int | None = None) -> str:
    """A fresh generation-managed directory ``<session>/<prefix><seq>``.

    Deletes generations of the same prefix older than the newest
    ``keep`` (default ``IMX_SCRATCH_KEEP`` or 2). Thread-safe: two
    concurrent allocations of one prefix (e.g. the incremental-ngram
    operator's overlapped batch+corpus persists) each get their own
    generation and neither reaps the other."""
    if keep is None:
        keep = int(os.environ.get("IMX_SCRATCH_KEEP", "2"))
    with _LOCK:
        d = os.path.join(_session_dir_locked(), f"{prefix}{next(_SEQ):06d}")
        os.makedirs(d)
        gens = _GENERATIONS.setdefault(prefix, [])
        gens.append(d)
        doomed = gens[: -keep] if keep > 0 else []
        del gens[: len(doomed)]
    for old in doomed:
        shutil.rmtree(old, ignore_errors=True)
    return d


def state_dir(prefix: str) -> str:
    """A fresh caller-owned directory ``<session>/<prefix><seq>`` with no
    generation reaping (lifetime = the owning cache entry / session)."""
    with _LOCK:
        d = os.path.join(_session_dir_locked(), f"{prefix}{next(_SEQ):06d}")
        os.makedirs(d)
    return d
