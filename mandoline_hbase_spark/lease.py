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
  it. Release is a CONDITIONAL DELETE (``compare_and_delete`` — the
  store removes the object only if the stored payload is still ours),
  so an owner that was usurped by a stale-break can never delete the
  usurper's lease on exit: the compare and the delete are one fenced
  store operation (``If-Match`` on S3, a locked compare on the local
  backends), not a get-then-delete with a window between them.
- A hard process crash leaves the lease object behind;
  ``steal_stale_after_s`` lets the next maintainer break a lease older
  than the threshold (choose it ≫ the longest plausible maintenance
  run). The break is ``compare_and_delete`` of the exact stale payload
  observed, then a re-raced conditional claim. Two breakers racing the
  same stale lease get exactly one winner: the loser's conditional
  delete answers false against the winner's fresh payload, and its
  conditional claim then fails — a fresh live lease can never be
  deleted by a breaker.
- STALENESS CLOCK: age derives from the STORE's last-modified time
  (``backend.mtime`` — local ``st_mtime``, S3 ``LastModified``), not
  the holder-written ``acquired_at_unix``, so a holder with a skewed
  wall clock cannot look artificially old (or forever fresh). One
  clock — the store's — judges every holder; the payload timestamp is
  only a fallback for backends without metadata. The residual skew is
  breaker-vs-store: fold the deployment's max expected clock skew into
  ``steal_stale_after_s`` (threshold ≥ longest run + max skew).
- A lease payload that cannot vouch for its own age — unparseable
  bytes, JSON that is not an object, or a missing/non-numeric
  ``acquired_at_unix`` — is treated as STALE when a steal threshold is
  set AND the backend has no modified-time metadata either (it can
  never refresh itself, and treating it as forever-fresh would wedge
  maintenance permanently). With no threshold every such payload is
  respected (fail safe, raise ``LeaseHeldError``).
- HONEST LIMIT: the conditional DELETE closes every
  accidental-interleaving window, but a double-hold is still REACHABLE
  by an honest owner simply running past ``steal_stale_after_s`` — the
  lease has no way to distinguish "crashed" from "slow". That
  double-hold is NOT harmless: the maintainers' pre-write cleanup
  (``rmtree`` of an existing target generation/compacted dir) can
  delete the rival's just-committed output, losing rows. The
  protection is the threshold choice (≫ longest plausible run + max
  breaker-vs-store clock skew); deployments that cannot bound run time
  need fencing tokens on the protected writes themselves, which a
  filesystem rename cannot check.
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


def _compare_and_delete(backend, path: str, expected: bytes) -> bool:
    """Conditional delete through the seam. Every shipped backend
    (local FS, in-memory, S3) implements ``compare_and_delete``; a
    third-party backend that predates the method falls back to
    compare-then-delete — unfenced, so the STEAL path pairs it with a
    post-claim read-back (see ``maintenance_lease``) that narrows (NOT
    closes — a rival delete after the read-back still double-holds)
    the two-winner window; the RELEASE path's residual window (deleting
    a usurper's lease) also remains until the backend is upgraded."""
    cad = getattr(backend, "compare_and_delete", None)
    if cad is not None:
        return bool(cad(path, expected))
    if backend.get(path) == expected:
        backend.delete(path)
        return True
    return False


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
            # age basis: the STORE's modified time where the backend has
            # one (one clock judges every holder — a skewed holder clock
            # cannot shrink or stretch the effective threshold); the
            # holder-written timestamp only as fallback. The mtime read
            # follows the get, so it can only be FRESHER than the
            # observed payload's write — the conservative direction
            # (never judges a fresh lease stale by pairing an old
            # payload with an older time).
            age_basis = getattr(backend, "mtime", lambda _p: None)(path)
            if age_basis is None:
                age_basis = acquired
            # a lease whose age nothing can vouch for (no store
            # metadata AND a payload that is unparseable / not an
            # object / missing a numeric timestamp) can never refresh
            # itself — stale by definition when stealing is enabled,
            # respected (raise) when it is not
            stale = steal_stale_after_s is not None and (
                age_basis is None or time.time() - age_basis > steal_stale_after_s
            )
            if not stale:
                raise LeaseHeldError(
                    f"{task} lease on {dir_path} held by "
                    f"{holder.get('owner', '<unknown>')} "
                    f"(acquired_at_unix={holder.get('acquired_at_unix')}); "
                    "not proceeding"
                )
            # break the stale lease with a CONDITIONAL delete: the store
            # removes the object only if it still holds the exact stale
            # payload observed (a rival breaker's fresh lease differs
            # and SURVIVES — the store answers false/412, there is no
            # observe-then-delete window), then re-race the conditional
            # claim; exactly one breaker wins
            fenced = getattr(backend, "compare_and_delete", None) is not None
            _compare_and_delete(backend, path, observed)
            if not backend.put_if_absent(path, data):
                raise LeaseHeldError(
                    f"{task} lease on {dir_path}: lost the reclaim race "
                    "after breaking a stale lease"
                )
            # ADVICE r7: with an UNFENCED fallback (third-party backend
            # lacking compare_and_delete) the break above is a bare
            # get-then-delete: a rival breaker's delete can land AFTER
            # our claim (removing OUR fresh lease before its own claim),
            # leaving two winners. Read the claim back and cede when the
            # store holds someone else's payload. HONEST LIMIT: this
            # NARROWS the window, it does not close it — a rival whose
            # delete lands after our read-back still double-holds (only
            # a fenced conditional delete closes that; upgrade the
            # backend). The shipped backends are all fenced; the
            # fallback exists for third-party ones.
            if not fenced and backend.get(path) != data:
                raise LeaseHeldError(
                    f"{task} lease on {dir_path}: a rival breaker claimed "
                    "it during the unfenced stale-break (backend lacks "
                    "compare_and_delete); ceding"
                )
    try:
        yield owner
    finally:
        # conditional delete: the store removes the lease only if the
        # payload is still ours (we may have been usurped via
        # steal_stale_after_s) — compare and delete are one fenced
        # operation, so a steal landing mid-release survives. A release
        # FAILURE (transient store error, unsupported conditional
        # delete) must not mask the body's result: a leftover lease is
        # recoverable via the staleness threshold, a swallowed body
        # exception is not.
        try:
            _compare_and_delete(backend, path, data)
        except Exception as exc:
            # the lease is left behind (steal_stale_after_s reclaims
            # it) — but the operator needs the breadcrumb, or every
            # later maintainer's LeaseHeldError looks like a live
            # holder instead of a failed release
            import warnings

            warnings.warn(
                f"lease release failed for {path!r} ({exc!r}); the lease "
                "object remains — later maintainers need "
                "steal_stale_after_s to reclaim it",
                RuntimeWarning,
                stacklevel=2,
            )
