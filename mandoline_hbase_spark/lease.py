"""Maintenance lease: single-maintainer mutual exclusion over the CAS seam.

The streaming index compactors (``streaming/search.compact_index``,
``streaming/ann.compact_ann_index``) fold batch directories and then
REMOVE the superseded sources — two compactors interleaving could each
delete batch dirs the other's consolidated output never folded in,
losing rows. The single-maintainer rule used to be by-convention; this
module enforces it with the primitive the engine already owns:
``put_if_absent`` through :func:`storage.cas_backend_for` — the same
check-and-put contract as the reference's ``write-index`` CAS
(hbase.clj:241-248) and the commit protocol's version claims. Locally
that is an ``O_CREAT|O_EXCL`` name claim; against a registered
:class:`objectstore.S3CasBackend` it is a conditional PUT, so "many
maintainers, one bucket" gets exactly one winner with no coordination
service.

Crash recovery: the lease is released in a ``finally``, so any raised
failure frees it. A hard process crash leaves the lease object behind;
``steal_stale_after_s`` lets the next maintainer break a lease older
than the threshold (choose it ≫ the longest plausible compaction). The
break is delete-then-reclaim: concurrent breakers race on the
conditional put and exactly one wins. The threshold must be honest —
an owner still running past it can be usurped, which is the standard
lease trade (a fencing token on the downstream writes is the full
fix; the compactors' staging-then-rename writes make a late loser's
damage a duplicate-visible window, never row loss, and dedup-reads
serve correctly through it).
"""

from __future__ import annotations

import json
import os
import socket
import time
from contextlib import contextmanager

from mandoline_hbase_spark import storage
from mandoline_hbase_spark.errors import LeaseHeldError

__all__ = ["maintenance_lease", "lease_holder"]


def _lease_path(dir_path: str, task: str) -> str:
    # dot-prefixed: invisible to the batch-* globs and parquet
    # discovery of the directories the lease protects
    return os.path.join(dir_path, f".{task}.lease")


def lease_holder(dir_path: str, task: str = "compaction") -> dict | None:
    """The current lease payload (owner, acquired_at_unix), or None."""
    path = _lease_path(dir_path, task)
    raw = storage.cas_backend_for(path).get(path)
    if raw is None:
        return None
    try:
        return json.loads(raw)
    except (ValueError, UnicodeDecodeError):
        return {"owner": "<unparseable>", "acquired_at_unix": None}


@contextmanager
def maintenance_lease(
    dir_path: str,
    task: str = "compaction",
    owner: str | None = None,
    steal_stale_after_s: float | None = None,
):
    """Hold the ``task`` lease for ``dir_path`` for the ``with`` body.

    Raises :class:`LeaseHeldError` if another maintainer holds it (and
    it is not stale past ``steal_stale_after_s``). Yields the owner id.
    """
    os.makedirs(dir_path, exist_ok=True)
    path = _lease_path(dir_path, task)
    backend = storage.cas_backend_for(path)
    owner = owner or f"{socket.gethostname()}:{os.getpid()}"
    data = json.dumps(
        {"owner": owner, "task": task, "acquired_at_unix": time.time()},
        sort_keys=True,
    ).encode()
    if not backend.put_if_absent(path, data):
        holder = lease_holder(dir_path, task) or {}
        acquired = holder.get("acquired_at_unix")
        stale = (
            steal_stale_after_s is not None
            and acquired is not None
            and time.time() - acquired > steal_stale_after_s
        )
        if not stale:
            raise LeaseHeldError(
                f"{task} lease on {dir_path} held by "
                f"{holder.get('owner', '<unknown>')} "
                f"(acquired_at_unix={acquired}); not proceeding"
            )
        # break the stale lease: delete, then RE-RACE the conditional
        # claim — concurrent breakers get exactly one winner
        backend.delete(path)
        if not backend.put_if_absent(path, data):
            raise LeaseHeldError(
                f"{task} lease on {dir_path}: lost the reclaim race after "
                "breaking a stale lease"
            )
    try:
        yield owner
    finally:
        backend.delete(path)
