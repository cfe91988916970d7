"""Native C++ runtime (bulletin board + trackers) binding tests."""

import pytest

from privacy_auction_tpu.runtime import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built and no toolchain"
)


def test_post_fetch_roundtrip():
    b = native.NativeBoard(4)
    payload = bytes(range(256))
    b.post(native.PHASE_ROUND1, 0, 2, payload, "bidder")
    assert b.fetch(native.PHASE_ROUND1, 0, 2, "verifier") == payload
    assert b.fetch(native.PHASE_ROUND1, 0, 3) is None
    assert b.n_parties == 4


def test_metering():
    b = native.NativeBoard(2)
    b.post(native.PHASE_COMMIT, 0, 0, b"x" * 100, "bidder")
    b.fetch(native.PHASE_COMMIT, 0, 0, "verifier")
    b.fetch(native.PHASE_COMMIT, 0, 0, "verifier")
    b.account("evaluator", 50)
    assert b.bytes("bidder") == 100
    assert b.bytes("verifier") == 200
    assert b.total_bytes() == 350
    b.reset()
    assert b.total_bytes() == 0


def test_timers():
    import time

    b = native.NativeBoard(1)
    b.timer_start("bidder")
    time.sleep(0.01)
    b.timer_stop("bidder")
    assert b.timer_seconds("bidder") >= 0.01
    assert b.timer_seconds("verifier") == 0.0


def test_overwrite_posts():
    b = native.NativeBoard(1)
    b.post(native.PHASE_ROUND2, 1, 0, b"first")
    b.post(native.PHASE_ROUND2, 1, 0, b"second")
    assert b.fetch(native.PHASE_ROUND2, 1, 0) == b"second"
