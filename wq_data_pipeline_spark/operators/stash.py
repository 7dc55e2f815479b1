"""Session-scoped construction stash for trained state.

Several catalog entries run an ITERATIVE trainer at construction time
(the k-means coarse quantizer, the BPE merge loop, the quality-
classifier GD rounds). Each trainer is deterministic in its inputs,
its output is tiny (a k-row centroid frame, a vocab table, a
128-row weight trajectory), and the same state is rebuilt every time
any consumer entry is constructed in the same session — the r10
quality-trainer stash measured ~10 s/session saved for one family.
This module is that stash generalized, so every trainer family shares
one build per (session, input-content, parameters).

Correctness rules (all inherited from the r10/r11 review passes):

- The cache key carries a CONTENT TOKEN of the input parquet (file
  names + mtimes): a fixture overwritten in place gets a fresh build,
  never stale state (Spark part-file names are UUIDs, so any rewrite
  changes the token). When the path isn't locally stat-able (an
  object-store URI on a real cluster) the stash is skipped outright —
  correctness over reuse.
- The key also carries the caller-supplied parameter tuple, which
  must include EVERYTHING the build depends on besides the input
  table (k, rounds, featurizer identity, ...) — the quality trainer
  derives its featurizer component from the function actually passed
  so a mislabeled call can never be served another model's weights.
- Entries from other applications are dropped on insert (dead-session
  handles must not be unpersisted — the suffix.py ADVICE r8 lesson —
  and checkpoint RDDs die with their context anyway); same-key
  entries with a different content token are dropped as overwritten.
- Builders must return MATERIALIZED state (driver lists, or frames
  that are localCheckpoint'ed / built from collected rows): stashing
  a lazy plan would just replay the trainer at first use.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable
from typing import Any, TypeVar

T = TypeVar("T")

_LOCK = threading.Lock()
_STASH: dict[tuple, Any] = {}
# per-PREFIX construction locks (ADVICE r11): two threads asking for
# the same not-yet-built entry must not both run the trainer — the
# loser's localCheckpoint'ed frames would be overwritten in the stash
# and never unpersisted (duplicate work + a bounded executor-storage
# leak). The second caller blocks on the first build instead. Keyed
# on the prefix (app, dir, table, params) WITHOUT the content token
# (r12 review): a token-keyed lock would let a stale-token build that
# finishes last evict a concurrent fresh-token build's entry and
# re-insert its stale one; under the prefix lock the fresh build
# necessarily runs after the stale one and its cleanup wins.
_BUILD_LOCKS: dict[tuple, threading.Lock] = {}


def content_token(parquet_path: str) -> str | None:
    """Cheap content fingerprint of a parquet file/directory (names +
    sizes + nanosecond mtimes), or None when it isn't a stat-able
    local path (-> don't cache). st_size + st_mtime_ns (ADVICE r11)
    close the same-names-within-mtime-granularity rewrite window that
    names + float mtimes left open."""

    def _stat(p: str) -> tuple[int, int]:
        st = os.stat(p)
        return (st.st_size, st.st_mtime_ns)

    try:
        if os.path.isdir(parquet_path):
            parts = sorted(
                (f, *_stat(os.path.join(parquet_path, f)))
                for f in os.listdir(parquet_path)
            )
            return repr(parts)
        return repr(_stat(parquet_path))
    except OSError:
        return None


def session_stash(
    spark,
    sf_dir: str,
    table: str,
    params: tuple,
    build: Callable[[], T],
) -> T:
    """Return the stashed build result for (this session, the current
    content of {sf_dir}/{table}.parquet, params), building it once.

    ``params`` must capture every non-input degree of freedom of the
    build (see module docstring). ``build`` must return materialized
    state."""
    token = content_token(os.path.join(str(sf_dir), f"{table}.parquet"))
    if token is None:
        return build()
    app = spark.sparkContext.applicationId
    prefix = (app, str(sf_dir), table, params)
    key = prefix + (token,)
    with _LOCK:
        if key in _STASH:
            return _STASH[key]
        build_lock = _BUILD_LOCKS.setdefault(prefix, threading.Lock())
    # serialize construction per key: the winner builds, losers wait
    # here and then read the stashed value (never re-run the trainer)
    with build_lock:
        with _LOCK:
            if key in _STASH:
                return _STASH[key]
        value = build()
        with _LOCK:
            for k in [
                k
                for k in _STASH
                if k[0] != app or (k[:-1] == prefix and k[-1] != token)
            ]:
                del _STASH[k]  # dead session, or overwritten fixture
            # _BUILD_LOCKS entries are retained: one lock per distinct
            # prefix per process (bounded by families x fixtures), and
            # popping one while a waiter is queued on it would let two
            # builds race again
            _STASH[key] = value
    return value
