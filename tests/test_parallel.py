"""Sharded-execution tests over the 8-device virtual CPU mesh (conftest).

The reference has no distributed tests (single process, SURVEY.md section
4); these validate that the bidder-sharded compute path produces the same
results as single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from privacy_auction_tpu.curves import SECP256K1 as CURVE
from privacy_auction_tpu.ops import ec as EC
from privacy_auction_tpu.ops import field as F
from privacy_auction_tpu.parallel import mesh as M


def test_mesh_devices():
    mesh = M.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_ec_ops_match_unsharded(rng):
    n = 16
    mesh = M.make_mesh()
    ks = [rng.randrange(1, CURVE.host.n) for _ in range(n)]
    scal = jnp.asarray(F.ints_to_limbs(ks))
    P_pts = EC.mul_base(CURVE, scal)

    want_sum = np.asarray(EC.ec_sum(CURVE, P_pts, 0))
    want_mul = np.asarray(EC.scalar_mul(CURVE, P_pts, scal))

    Ps = M.shard_bidders(mesh, P_pts)
    ss = M.shard_bidders(mesh, scal)
    got_sum = jax.jit(lambda p: EC.ec_sum(CURVE, p, 0))(Ps)
    got_mul = jax.jit(lambda p, s: EC.scalar_mul(CURVE, p, s))(Ps, ss)
    np.testing.assert_array_equal(np.asarray(got_sum), want_sum)
    np.testing.assert_array_equal(np.asarray(got_mul), want_mul)


def test_sharded_avnet_keys(rng):
    from privacy_auction_tpu.protocols.seal import avnet_keys

    n = 8
    mesh = M.make_mesh()
    ks = [rng.randrange(1, CURVE.host.n) for _ in range(n)]
    X = EC.mul_base(CURVE, jnp.asarray(F.ints_to_limbs(ks)))
    want = np.asarray(avnet_keys(CURVE, X))
    Xs = M.shard_bidders(mesh, X)
    got = jax.jit(lambda x: avnet_keys(CURVE, x))(Xs)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pad_bidders():
    assert M.pad_bidders(5, 8) == 8
    assert M.pad_bidders(8, 8) == 8
    assert M.pad_bidders(9, 8) == 16


def test_seal_auction_sharded_matches_unsharded():
    """Production run_auction over the mesh == single-device run, bit-exact
    (VERDICT r2 item 2: the mesh is the production path)."""
    from privacy_auction_tpu.protocols import seal

    mesh = M.make_mesh()
    bids = [5, 3, 7, 2, 7, 0, 1, 6]  # n=8 = mesh size
    key = jax.random.key(42)
    want = seal.run_auction(CURVE, key, bids, 3, verify=True)
    got = seal.run_auction(CURVE, key, bids, 3, verify=True, mesh=mesh)
    assert want.verified and got.verified
    assert got.max_bid == want.max_bid == 7
    np.testing.assert_array_equal(got.deciding_bits, want.deciding_bits)


def test_ccs22_auction_sharded_matches_unsharded():
    from privacy_auction_tpu.protocols import ccs22

    mesh = M.make_mesh()
    bids = [4, 9, 1, 11, 0, 3, 8, 2]
    key = jax.random.key(7)
    want = ccs22.run_auction(CURVE, key, bids, 4, eval_id=2)
    got = ccs22.run_auction(CURVE, key, bids, 4, eval_id=2, mesh=mesh)
    assert got.max_bid == want.max_bid == 11
    np.testing.assert_array_equal(got.deciding_bits, want.deciding_bits)


def test_seal_mesh_indivisible_pads():
    """n not divisible by the mesh size: the driver pads the bidder axis
    with zero-bid dummy lanes (honest, cannot change the max)."""
    from privacy_auction_tpu.protocols import seal

    mesh = M.make_mesh()
    res = seal.run_auction(
        CURVE, jax.random.key(0), [1, 2, 3], 2, verify=True, mesh=mesh
    )
    assert res.verified and res.max_bid == 3


def test_distributed_helpers_single_process():
    """jax.distributed bring-up helper degrades cleanly to one process."""
    from privacy_auction_tpu.parallel import distributed as D

    assert D.init() is False  # no coordinator configured
    mesh = D.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    info = D.process_info()
    assert info["process_count"] == 1 and info["process_index"] == 0
    assert info["global_devices"] >= info["local_devices"]
