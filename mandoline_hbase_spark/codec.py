"""Chunk byte codec: numpy arrays <-> content-addressed byte payloads.

The reference treats chunk payloads as opaque ByteBuffers
(hbase.clj:124-133, 138-154) — serialization lives in mandoline-core. Here
the codec is explicit: a chunk is the C-order raw bytes of a fixed-shape
numpy block (padded to the chunk grid with the variable's fill value), and
its id is the SHA-1 hex digest of those bytes — matching the reference
benchmark's ``DigestUtils/shaHex`` ids (hbase_test.clj:177).

Content addressing ⇒ two chunks with identical bytes share one stored row;
fill-padding ⇒ every all-fill chunk of a variable dedups to a single blob.
"""

from __future__ import annotations

import hashlib
import math
from typing import Any

import numpy as np

SUPPORTED_DTYPES = {"float64", "float32", "int16", "int32", "int64", "uint8"}


def default_fill(dtype: str) -> Any:
    return float("nan") if dtype.startswith("float") else 0


def chunk_id_of(data: bytes) -> str:
    """SHA-1 hex of the payload (hbase_test.clj:177)."""
    return hashlib.sha1(data).hexdigest()


def encode_chunk(block: np.ndarray) -> bytes:
    """C-order raw bytes of the block."""
    return np.ascontiguousarray(block).tobytes()


def decode_chunk(data: bytes, dtype: str, shape: tuple[int, ...]) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.dtype(dtype))
    return arr.reshape(shape)


def grid_shape(shape: tuple[int, ...], chunk_shape: tuple[int, ...]) -> tuple[int, ...]:
    """Number of chunks along each dimension (ceil division)."""
    return tuple(math.ceil(s / c) for s, c in zip(shape, chunk_shape))


def iter_chunk_coords(shape: tuple[int, ...], chunk_shape: tuple[int, ...]):
    """Yield every chunk-grid coordinate for a variable of ``shape``.

    A 0-d (scalar) variable yields the single empty coordinate ``()``
    — the reference encodes it as ``"_"`` (hbase.clj:176-179).
    """
    if len(shape) == 0:
        yield ()
        return
    grid = grid_shape(shape, chunk_shape)
    idx = [0] * len(grid)
    while True:
        yield tuple(idx)
        for d in reversed(range(len(grid))):
            idx[d] += 1
            if idx[d] < grid[d]:
                break
            idx[d] = 0
        else:
            return


def chunk_slices(coord: tuple[int, ...], chunk_shape: tuple[int, ...], shape: tuple[int, ...]):
    """The slice of the full array covered by chunk ``coord`` (unpadded)."""
    return tuple(
        slice(c * cs, min((c + 1) * cs, s)) for c, cs, s in zip(coord, chunk_shape, shape)
    )


def extract_block(
    array: np.ndarray,
    coord: tuple[int, ...],
    chunk_shape: tuple[int, ...],
    fill: Any,
) -> np.ndarray:
    """Slice chunk ``coord`` out of ``array``, padding edges with ``fill``."""
    if array.ndim == 0:
        return array
    sl = chunk_slices(coord, chunk_shape, array.shape)
    block = array[sl]
    if block.shape == tuple(chunk_shape):
        return block
    padded = np.full(tuple(chunk_shape), fill, dtype=array.dtype)
    padded[tuple(slice(0, s) for s in block.shape)] = block
    return padded


def coordinate_to_id(coord: tuple[int, ...]) -> str:
    """Join coordinate ints with ``/``; empty (scalar) -> ``"_"``.

    Verbatim key semantics of ``coordinate->id`` (hbase.clj:176-179).
    """
    if len(coord) == 0:
        return "_"
    return "/".join(str(c) for c in coord)


def id_to_coordinate(coord_id: str) -> tuple[int, ...]:
    if coord_id == "_":
        return ()
    return tuple(int(c) for c in coord_id.split("/"))
