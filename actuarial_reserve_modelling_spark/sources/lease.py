"""Single-writer lease for the persisted index tiers (r13).

Why this exists: every persisted tier (ANN hier, IVF-PQ, vecsig,
dedup fingerprint) is maintained by plain-parquet add/delete/compact/
vacuum paths whose crash contracts assume ONE mutation stream — the
reference's own failure class is the same shape (its single export
task races itself on FSx when run twice, SURVEY §3.3). Two concurrent
ingest gates pointed at one tier can interleave a ``stats/`` rewrite
and a dynamic-partition overwrite and silently lose counts or orphan
partitions; vacuum can reclaim a LIVE writer's in-flight
``_temporary`` task outputs. Nothing detected the second writer before
this module; now the second writer refuses loudly instead.

Mechanism: an ``_writer_lease`` file at the protected root, created
with ``O_CREAT|O_EXCL`` (atomic on local/NFSv4/FUSE filesystems), a
random per-acquisition token inside, and a daemon heartbeat thread
touching the file every ``ttl/10`` seconds while held. A lease whose
mtime is older than ``ttl`` belongs to a DEAD writer (a live one would
have heartbeat) and is broken via rename-then-retry; a fresh foreign
lease raises :class:`ConcurrentWriterError` with the holder's
identity. Leases are REENTRANT per process (a gate's batch step calls
add → compact → vacuum on nested roots), and exclusion is
HIERARCHICAL: acquiring a root refuses while any ANCESTOR directory
holds a fresh foreign lease (a vacuum of the work dir blocks an add to
``work/idx``), and vacuum additionally scans DESCENDANTS before
deleting (an add holding ``work/idx`` blocks a vacuum of ``work``).

The two-writer race has no miss window: each writer CREATES its lease
file before CHECKING for the other's, so for both checks to pass each
create would have to happen after the other's check — a cycle. At
worst both refuse (no livelock: callers retry on their own cadence).

Scope: local-path roots only. Object stores (s3://, ...) have no
atomic create; deployments there need an external lock service, so
:func:`writer_lease` degrades to a documented no-op for non-local
URIs rather than pretending to protect them.

Underscore-prefixed name keeps the lease invisible to Spark's file
listing, and ``vacuum_index`` never reclaims files — only whole
orphan directories — so the lease cannot be vacuumed out from under
its holder.
"""

from __future__ import annotations

import contextlib
import functools
import inspect
import json
import os
import socket
import threading
import time
import uuid
from urllib.parse import urlparse

LEASE_NAME = "_writer_lease"
DEFAULT_TTL_SEC = 600.0

# per-process reentrancy state: normalized root -> (depth, token, thread, stop)
_HELD: dict[str, dict] = {}
_HELD_LOCK = threading.Lock()


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted maintenance on a leased tier root."""


def _local_path(root: str) -> str | None:
    """Filesystem path for a local root, or None for object-store URIs
    (no atomic create there — leasing is skipped, documented above)."""
    p = urlparse(root)
    if p.scheme in ("", "file"):
        return os.path.normpath(p.path if p.scheme == "file" else root)
    return None


def _read_holder(lease_path: str) -> dict:
    try:
        with open(lease_path) as fh:
            return json.loads(fh.read() or "{}")
    except (OSError, ValueError):
        return {}


def _fresh(lease_path: str, ttl: float) -> bool:
    """A lease younger than ttl belongs to a live writer (the heartbeat
    thread touches it every ttl/10 seconds while held)."""
    try:
        return (time.time() - os.stat(lease_path).st_mtime) <= ttl
    except OSError:
        return False  # vanished — not held


def _held_by_us(norm: str) -> bool:
    with _HELD_LOCK:
        return norm in _HELD


def _check_ancestors(norm: str, ttl: float) -> None:
    """Refuse when any ancestor directory holds a fresh FOREIGN lease —
    e.g. a vacuum of the gate work dir excludes adds to work/idx."""
    cur = os.path.dirname(norm)
    while True:
        if _held_by_us(cur):
            cur2 = os.path.dirname(cur)
            if cur2 == cur:
                break
            cur = cur2
            continue
        lp = os.path.join(cur, LEASE_NAME)
        if os.path.exists(lp) and _fresh(lp, ttl):
            holder = _read_holder(lp)
            raise ConcurrentWriterError(
                f"writer lease held on ancestor {cur!r} by "
                f"{holder.get('writer_id')!r} (pid {holder.get('pid')}, "
                f"host {holder.get('host')!r}) — refusing concurrent "
                f"maintenance under it"
            )
        nxt = os.path.dirname(cur)
        if nxt == cur:
            break
        cur = nxt


def check_no_descendant_writers(
    root: str, ttl: float = DEFAULT_TTL_SEC, max_depth: int | None = None
) -> None:
    """Refuse when any descendant of ``root`` holds a fresh foreign
    lease — vacuum calls this (unbounded) before deleting anything, so
    it can never reclaim a live writer's in-flight ``_temporary`` task
    outputs; every acquire calls it depth-bounded (leases only ever
    live at maintenance roots — tier roots and their immediate
    datasets — so depth 1 from the acquired root covers every foreign
    sub-dataset lease without scandir-ing the partition directories,
    which number ~65k on a large tier)."""
    norm = _local_path(root)
    if norm is None:
        return
    base_depth = norm.rstrip(os.sep).count(os.sep)
    for dirpath, dirnames, filenames in os.walk(norm):
        if max_depth is not None and dirpath.count(os.sep) - base_depth >= max_depth:
            dirnames[:] = []
        if LEASE_NAME in filenames and dirpath != norm and not _held_by_us(dirpath):
            lp = os.path.join(dirpath, LEASE_NAME)
            if _fresh(lp, ttl):
                holder = _read_holder(lp)
                raise ConcurrentWriterError(
                    f"writer lease held on descendant {dirpath!r} by "
                    f"{holder.get('writer_id')!r} (pid {holder.get('pid')}, "
                    f"host {holder.get('host')!r}) — refusing to vacuum "
                    f"over a live writer"
                )


def _try_create(lease_path: str, payload: dict) -> bool:
    try:
        fd = os.open(lease_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as fh:
        fh.write(json.dumps(payload))
    return True


@contextlib.contextmanager
def writer_lease(
    root: str,
    ttl: float = DEFAULT_TTL_SEC,
    writer_id: str | None = None,
):
    """Hold the single-writer lease on ``root`` for the duration of a
    maintenance operation. Reentrant per process; loud
    :class:`ConcurrentWriterError` on a fresh foreign holder; breaks
    stale leases (dead writers) by rename-then-retry. A daemon thread
    heartbeats the file every ``ttl/10`` seconds, so arbitrarily long
    Spark jobs stay covered without cooperation from the job itself."""
    norm = _local_path(root)
    if norm is None:
        yield  # object-store root: no atomic create — documented no-op
        return
    with _HELD_LOCK:
        held = _HELD.get(norm)
        if held is not None:
            held["depth"] += 1
            try:
                os.utime(os.path.join(norm, LEASE_NAME))
            except OSError:
                pass
            reentered = True
        else:
            reentered = False
    if reentered:
        try:
            yield
        finally:
            with _HELD_LOCK:
                _HELD[norm]["depth"] -= 1
        return

    os.makedirs(norm, exist_ok=True)
    lease_path = os.path.join(norm, LEASE_NAME)
    token = uuid.uuid4().hex
    payload = {
        "writer_id": writer_id or f"pid-{os.getpid()}",
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "token": token,
        "acquired_at": time.time(),
    }
    for _attempt in range(3):
        if _try_create(lease_path, payload):
            break
        if _fresh(lease_path, ttl):
            holder = _read_holder(lease_path)
            age = None
            try:
                age = round(time.time() - os.stat(lease_path).st_mtime, 1)
            except OSError:
                pass
            raise ConcurrentWriterError(
                f"writer lease on {norm!r} held by "
                f"{holder.get('writer_id')!r} (pid {holder.get('pid')}, "
                f"host {holder.get('host')!r}, heartbeat {age}s ago, "
                f"ttl {ttl}s) — a second concurrent writer would corrupt "
                f"the tier's crash contracts; retry after the holder "
                f"finishes or raise ttl if its heartbeat thread died"
            )
        # stale: the holder stopped heartbeating ttl ago — break it.
        # rename-then-retry so two breakers can't both think they won.
        with contextlib.suppress(OSError):
            broken = lease_path + f".stale-{uuid.uuid4().hex[:8]}"
            os.rename(lease_path, broken)
            os.unlink(broken)
    else:
        raise ConcurrentWriterError(
            f"could not acquire writer lease on {norm!r} after 3 attempts "
            f"(persistent contention)"
        )

    # ancestor check runs AFTER our own create (create-then-check): for
    # an add(child) and a vacuum(parent) to both pass, each one's check
    # would have to precede the other's create, which its own create
    # already precedes — a cycle. Checked here, with our file already
    # visible, the worst interleaving is both refusing.
    try:
        _check_ancestors(norm, ttl)
        check_no_descendant_writers(norm, ttl, max_depth=1)
    except ConcurrentWriterError:
        with contextlib.suppress(OSError):
            os.unlink(lease_path)
        raise

    stop = threading.Event()
    interval = max(0.5, ttl / 10.0)

    def _beat() -> None:
        while not stop.wait(interval):
            try:
                os.utime(lease_path)
            except OSError:
                return  # lease vanished — release will raise loudly

    thread = threading.Thread(target=_beat, daemon=True, name=f"arm-lease-{norm}")
    with _HELD_LOCK:
        _HELD[norm] = {"depth": 1, "token": token, "stop": stop, "thread": thread}
    thread.start()
    try:
        yield
    finally:
        with _HELD_LOCK:
            entry = _HELD[norm]
            entry["depth"] -= 1
            done = entry["depth"] == 0
            if done:
                del _HELD[norm]
        if done:
            stop.set()
            thread.join(timeout=5.0)
            holder = _read_holder(lease_path)
            if holder.get("token") == token:
                with contextlib.suppress(OSError):
                    os.unlink(lease_path)
            else:
                # someone broke our lease mid-run (TTL expired under a
                # dead heartbeat, or clock skew): the single-writer
                # guarantee may have been violated — say so loudly
                # rather than return success.
                raise ConcurrentWriterError(
                    f"writer lease on {norm!r} was lost mid-operation "
                    f"(now held by {holder.get('writer_id')!r}); another "
                    f"writer may have interleaved — verify the tier and "
                    f"raise ttl / check heartbeat liveness"
                )


def leased(param: str = "path"):
    """Decorator: run the wrapped maintenance function under
    :func:`writer_lease` on its ``param`` argument. One decorator line
    per persist/add/delete/compact entry point keeps the lease
    impossible to forget when new maintenance paths are added."""

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            root = bound.arguments[param]
            with writer_lease(root):
                return fn(*args, **kwargs)

        return wrapper

    return deco
