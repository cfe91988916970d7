"""Canonical wire serialization for bulletin-board messages.

The reference serializes every EC point as a 65-byte SEC1 uncompressed
octet string and every scalar as its big-endian byte string when metering
board traffic (`/root/reference/SEAL/bulletinBoard.cpp:275-288`).  This
module packs whole message pytrees (the protocol NamedTuples in
protocols/seal.py) into exactly that format, so the bytes the native hub
meters for a real multi-process auction are the reference's cost model
measured for real -- 65 B per point, 32 B per scalar (canonical width;
the reference's BN_num_bytes is value-dependent for ~0.4% of scalars).

Leaf convention: an array whose trailing dims are (3, LIMBS) is a batch
of projective points; trailing (LIMBS,) is a batch of scalars.  Infinity
encodes as 65 zero bytes (static shape, matching
`ops/ec.serialize_uncompressed`).
"""

from __future__ import annotations

import jax
import numpy as np

from ..curves import Curve
from ..ops import ec
from ..ops import field as F

LIMBS = F.LIMBS
POINT_BYTES = 65
SCALAR_BYTES = 32


def _is_point_leaf(shape) -> bool:
    return len(shape) >= 2 and shape[-2:] == (3, LIMBS)


def points_to_bytes(curve: Curve, P) -> np.ndarray:
    """(..., 3, L) projective -> (..., 65) uint8 SEC1 uncompressed."""
    return np.asarray(ec.serialize_uncompressed(curve, P))


def points_from_bytes(raw: np.ndarray) -> np.ndarray:
    """(..., 65) uint8 -> (..., 3, L) projective (Z = 1, or (0,1,0) inf)."""
    raw = np.asarray(raw, np.uint8)
    x = np.array(F.from_bytes_be(raw[..., 1:33]), np.uint32)
    y = np.array(F.from_bytes_be(raw[..., 33:65]), np.uint32)
    finite = (raw[..., 0] == 4)
    z = np.zeros_like(x)
    z[..., 0] = finite.astype(np.uint32)
    xo = np.where(finite[..., None], x, 0).astype(np.uint32)
    yo = np.where(finite[..., None], y, 0).astype(np.uint32)
    yo[..., 0] = np.where(finite, yo[..., 0], 1)  # infinity -> (0, 1, 0)
    return np.stack([xo, yo, z], axis=-2)


def scalars_to_bytes(v) -> np.ndarray:
    """(..., L) -> (..., 32) uint8 big-endian."""
    return np.asarray(F.to_bytes_be(v))


def scalars_from_bytes(raw: np.ndarray) -> np.ndarray:
    return np.asarray(F.from_bytes_be(np.asarray(raw, np.uint8)))


def wire_size(tree) -> int:
    """Exact serialized size in bytes of a message pytree."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        shape = np.shape(leaf)
        if _is_point_leaf(shape):
            total += int(np.prod(shape[:-2], dtype=np.int64)) * POINT_BYTES
        else:
            total += int(np.prod(shape[:-1], dtype=np.int64)) * SCALAR_BYTES
    return total


def pack(curve: Curve, tree) -> bytes:
    """Serialize a message pytree to canonical wire bytes (leaf order)."""
    parts = []
    for leaf in jax.tree.leaves(tree):
        if _is_point_leaf(np.shape(leaf)):
            parts.append(points_to_bytes(curve, leaf).tobytes())
        else:
            parts.append(scalars_to_bytes(leaf).tobytes())
    return b"".join(parts)


def unpack(curve: Curve, template, data: bytes):
    """Deserialize wire bytes into the shape of `template` (a pytree of
    arrays with the SAME shapes as the sender's message -- protocol
    messages have static shapes given (n, c))."""
    leaves, treedef = jax.tree.flatten(template)
    out = []
    off = 0
    for leaf in leaves:
        shape = np.shape(leaf)
        if _is_point_leaf(shape):
            cnt = int(np.prod(shape[:-2], dtype=np.int64))
            raw = np.frombuffer(
                data[off:off + cnt * POINT_BYTES], np.uint8
            ).reshape(shape[:-2] + (POINT_BYTES,))
            out.append(points_from_bytes(raw))
            off += cnt * POINT_BYTES
        else:
            cnt = int(np.prod(shape[:-1], dtype=np.int64))
            raw = np.frombuffer(
                data[off:off + cnt * SCALAR_BYTES], np.uint8
            ).reshape(shape[:-1] + (SCALAR_BYTES,))
            out.append(scalars_from_bytes(raw))
            off += cnt * SCALAR_BYTES
    if off != len(data):
        raise ValueError(f"wire message size mismatch: {off} != {len(data)}")
    return jax.tree.unflatten(treedef, out)
