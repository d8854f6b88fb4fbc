"""Maintenance lease: single-maintainer mutual exclusion over the CAS seam.

The streaming index maintainers (``streaming/search.compact_index``,
``streaming/ann.compact_ann_index``, ``streaming/ann.retrain_ann_index``,
``streaming/ann.gc_ann_generations``) fold, rewrite, or remove cells
roots — two maintainers interleaving could each delete directories the
other's output never folded in, losing rows. The single-maintainer rule
used to be by-convention; this module enforces it with the primitive the
engine already owns: ``put_if_absent`` through
:func:`storage.cas_backend_for` — the same check-and-put contract as the
reference's ``write-index`` CAS (hbase.clj:241-248) and the commit
protocol's version claims. Locally that is an ``O_CREAT|O_EXCL`` name
claim; against a registered :class:`objectstore.S3CasBackend` it is a
conditional PUT, so "many maintainers, one bucket" gets exactly one
winner with no coordination service.

Crash recovery and its limits:

- The lease is released in a ``finally``, so any raised failure frees
  it. Release is COMPARE-THEN-DELETE (only if the stored payload is
  still ours), so an owner that was usurped by a stale-break does not
  delete the usurper's lease on exit.
- A hard process crash leaves the lease object behind;
  ``steal_stale_after_s`` lets the next maintainer break a lease older
  than the threshold (choose it ≫ the longest plausible maintenance
  run). The break is compare-then-delete of the exact stale payload
  observed, then a re-raced conditional claim, then a read-back check
  that OUR payload is the one stored.
- A lease payload that cannot vouch for its own age — unparseable
  bytes, JSON that is not an object, or a missing/non-numeric
  ``acquired_at_unix`` — is treated as STALE when a steal threshold is
  set (it can never refresh itself, and treating it as forever-fresh
  would wedge maintenance permanently). With no threshold every such
  payload is respected (fail safe, raise ``LeaseHeldError``).
- HONEST LIMIT: with only put-if-absent/get/delete there remain
  unfenced get-then-delete windows in BOTH the steal path (a breaker
  can observe the stale payload, a rival can break-and-claim, and the
  first breaker's delete then hits the rival's fresh lease before its
  own claim) and the release path (a rival can steal between the
  release's compare and its delete). And a double-hold — however
  reached, including an honest owner simply running past
  ``steal_stale_after_s`` — is NOT harmless: the maintainers' pre-write
  cleanup (``rmtree`` of an existing target generation/compacted dir)
  can delete the rival's just-committed output, losing rows. The
  compare-then-delete and read-back checks shrink the accidental
  windows to microseconds, but the real protections are (a) a steal
  threshold chosen ≫ the longest plausible maintenance run, so an
  honest owner is never usurped, and (b) a fencing token or
  conditional DELETE (``If-Match`` — S3 supports it; the seam can grow
  a ``compare_and_delete``) for deployments that cannot guarantee (a).
"""

from __future__ import annotations

import json
import os
import socket
import time
from contextlib import contextmanager

from mandoline_hbase_spark import storage
from mandoline_hbase_spark.errors import LeaseHeldError, StorageError

__all__ = ["maintenance_lease", "lease_holder"]


def _lease_path(dir_path: str, task: str) -> str:
    # dot-prefixed: invisible to the batch-* globs and parquet
    # discovery of the directories the lease protects
    return os.path.join(dir_path, f".{task}.lease")


def _holder_age_basis(raw: bytes) -> tuple[dict, float | None]:
    """(holder payload, numeric acquired_at_unix or None). Every
    malformed shape — non-JSON bytes, JSON that is not an object, a
    missing or non-numeric timestamp — maps to ``acquired = None``
    rather than raising: the staleness decision, not an exception, is
    the contract for bad payloads."""
    try:
        holder = json.loads(raw)
    except (ValueError, UnicodeDecodeError):
        return {"owner": "<unparseable>", "acquired_at_unix": None}, None
    if not isinstance(holder, dict):
        return {"owner": "<unparseable>", "acquired_at_unix": None}, None
    acquired = holder.get("acquired_at_unix")
    if isinstance(acquired, (int, float)) and not isinstance(acquired, bool):
        return holder, float(acquired)
    return holder, None


def lease_holder(dir_path: str, task: str = "compaction") -> dict | None:
    """The current lease payload (owner, acquired_at_unix), or None."""
    path = _lease_path(dir_path, task)
    raw = storage.cas_backend_for(path).get(path)
    if raw is None:
        return None
    return _holder_age_basis(raw)[0]


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
    ``dir_path`` must already exist — the lease guards an index, it
    does not create one (a mistyped path must fail, not fabricate an
    empty index directory). The existence check applies to the default
    local-filesystem backend only: with a registered object-store
    backend (pure-bucket mode, no local mirror) the bucket is the only
    truth and there is no local directory to demand.
    """
    path = _lease_path(dir_path, task)
    backend = storage.cas_backend_for(path)
    if type(backend) is storage.LocalFSCasBackend and not os.path.isdir(dir_path):
        raise StorageError(
            f"cannot take a {task} lease on {dir_path!r}: directory does "
            "not exist (the lease guards an existing index, it never "
            "creates one)"
        )
    owner = owner or f"{socket.gethostname()}:{os.getpid()}"
    data = json.dumps(
        {"owner": owner, "task": task, "acquired_at_unix": time.time()},
        sort_keys=True,
    ).encode()
    if not backend.put_if_absent(path, data):
        observed = backend.get(path)
        if observed is None:
            # holder released between the failed claim and the read:
            # the lease is free — re-race the conditional claim once
            if not backend.put_if_absent(path, data):
                raise LeaseHeldError(
                    f"{task} lease on {dir_path}: lost the re-claim race "
                    "after observing a just-released lease"
                )
        else:
            holder, acquired = _holder_age_basis(observed)
            # a payload that cannot vouch for its age (unparseable, not
            # an object, missing/non-numeric timestamp) can never
            # refresh itself — stale by definition when stealing is
            # enabled, respected (raise) when it is not
            stale = steal_stale_after_s is not None and (
                acquired is None or time.time() - acquired > steal_stale_after_s
            )
            if not stale:
                raise LeaseHeldError(
                    f"{task} lease on {dir_path} held by "
                    f"{holder.get('owner', '<unknown>')} "
                    f"(acquired_at_unix={holder.get('acquired_at_unix')}); "
                    "not proceeding"
                )
            # break the stale lease: delete ONLY if the stored payload
            # is still the exact stale one observed (a rival's fresh
            # lease differs in acquired_at/owner and survives), then
            # RE-RACE the conditional claim
            if backend.get(path) == observed:
                backend.delete(path)
            if not backend.put_if_absent(path, data):
                raise LeaseHeldError(
                    f"{task} lease on {dir_path}: lost the reclaim race "
                    "after breaking a stale lease"
                )
            # read-back: confirm OUR payload is the one stored (a rival
            # interleaving its own break could have displaced us)
            if backend.get(path) != data:
                raise LeaseHeldError(
                    f"{task} lease on {dir_path}: displaced during the "
                    "stale-break reclaim; a rival maintainer holds it"
                )
    try:
        yield owner
    finally:
        # compare-then-delete: never remove a lease that is no longer
        # ours (we may have been usurped via steal_stale_after_s)
        if backend.get(path) == data:
            backend.delete(path)
