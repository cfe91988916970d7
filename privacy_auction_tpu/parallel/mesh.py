"""Device mesh + sharding layer: the bulletin board as sharded arrays.

The reference's "network" is an in-process star-topology BulletinBoard
(`/root/reference/SEAL/bulletinBoard.cpp`, SURVEY.md section 2): parties
post messages, the board hands them back to everyone.  The TPU-native
equivalent (SURVEY.md section 7, layer 5):

  * the bidder axis is sharded over a 1-D `jax.sharding.Mesh`
    ("bidders"): each chip owns n/D bidders' secrets and proof lanes;
  * "posting to the board" is nothing (the data is already device-resident);
  * "reading the board" is whatever collective XLA inserts for the
    cross-bidder ops -- the AV-net prefix scan and the veto tree-sum
    lower to log-depth `ppermute` chains on ICI, everything else in a
    step is purely bidder-local and runs with zero communication.

Per-bidder proof verification of *other* bidders' proofs is restructured:
instead of replicating all n messages to every chip (the reference's n^2
fan-out), each published proof is verified once by the shard that owns its
lane; a boolean `all_ok` psum is the only cross-chip traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BIDDER_AXIS = "bidders"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the bidder axis.

    n_devices defaults to all local devices.  For multi-host deployments
    call `jax.distributed.initialize` first and pass `jax.devices()`.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} JAX devices are available "
                    f"(platform {devices[0].platform}); for CPU simulation "
                    "set jax.config.update('jax_platforms', 'cpu') and "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=N"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BIDDER_AXIS,))


def bidder_spec(leaf) -> P:
    """PartitionSpec sharding axis 0 (the bidder axis) of a leaf."""
    return P(BIDDER_AXIS, *([None] * (leaf.ndim - 1)))


def bidder_sharding(mesh: Mesh, leaf) -> NamedSharding:
    return NamedSharding(mesh, bidder_spec(leaf))


def shard_bidders(mesh: Mesh, tree):
    """device_put a pytree of (n, ...) arrays sharded over the mesh."""
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, bidder_sharding(mesh, leaf)), tree
    )


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh."""
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )


def pad_bidders(n: int, n_devices: int) -> int:
    """Smallest padded bidder count divisible by the mesh size."""
    return ((n + n_devices - 1) // n_devices) * n_devices
