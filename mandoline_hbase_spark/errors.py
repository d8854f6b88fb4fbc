"""Engine exceptions, mirroring the reference's error contracts.

The reference raises ``IllegalArgumentException`` for invalid arguments
(hbase.clj:98-100, 139-150, 303-306), ``Exception`` for missing chunks
(hbase.clj:118-120, 131-133), and wraps failed connects in
``RuntimeException`` (hbase.clj:335-343). We use typed Python exceptions.
"""

from __future__ import annotations


class MandolineError(Exception):
    """Base class for engine errors."""


class ChunkNotFoundError(MandolineError, KeyError):
    """No chunk stored under the requested hash (hbase.clj:131-133)."""


class ChunkRefNotFoundError(MandolineError, KeyError):
    """No ref-count stored under the requested hash (hbase.clj:118-120)."""


class DatasetNotFoundError(MandolineError, RuntimeError):
    """Connecting to a dataset whose tables do not exist (hbase.clj:335-343)."""


class DatasetExistsError(MandolineError):
    """Creating a dataset that already exists."""


class VersionNotFoundError(MandolineError, KeyError):
    """No version row under the requested version id."""


class CommitConflictError(MandolineError):
    """Optimistic-concurrency conflict surfaced to a caller that asked to raise."""


class InvalidArgumentError(MandolineError, ValueError):
    """Mirror of IllegalArgumentException validation (hbase.clj:98-100, 139-150)."""


class StorageError(MandolineError, RuntimeError):
    """Backend/storage-layer misconfiguration or I/O protocol failure."""


class LeaseHeldError(MandolineError, RuntimeError):
    """A maintenance lease (single-maintainer mutual exclusion over the
    CAS seam, the same check-and-put contract as hbase.clj:241-248) is
    held by another process; the caller must not proceed."""
