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


def _client_party(sock, pid, payload):
    cl = native.BoardClient(sock)
    cl.post(native.PHASE_COMMIT, 0, pid, payload)
    other = cl.fetch_wait(native.PHASE_COMMIT, 0, 1 - pid, timeout_s=120.0)
    cl.post(native.PHASE_ROUND1, 0, pid, other, "echo")
    cl.close()


def test_board_served_across_processes(tmp_path):
    """Two real OS processes exchange through the socket hub; meters count
    the actual cross-process transfers."""
    import multiprocessing as mp

    sock = str(tmp_path / "board.sock")
    board = native.NativeBoard(2)
    server = board.serve(sock)
    try:
        ctx = mp.get_context("spawn")
        payloads = [b"alpha" * 13, b"beta" * 17]
        procs = [
            ctx.Process(target=_client_party, args=(sock, i, payloads[i]))
            for i in range(2)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=180)  # generous: CI may heavily oversubscribe
            assert p.exitcode == 0
        # each party echoed the other's payload back under a new phase
        assert board.fetch(native.PHASE_ROUND1, 0, 0) == payloads[1]
        assert board.fetch(native.PHASE_ROUND1, 0, 1) == payloads[0]
        posted = sum(len(p) for p in payloads)
        assert board.bytes("bidder") >= 2 * posted  # posts + cross-fetches
        assert board.bytes("echo") == posted
    finally:
        server.stop()


def test_client_fetch_absent_and_reset(tmp_path):
    sock = str(tmp_path / "b.sock")
    board = native.NativeBoard(1)
    server = board.serve(sock)
    try:
        cl = native.BoardClient(sock)
        assert cl.fetch(native.PHASE_OT_S, 3, 0) is None
        cl.post(native.PHASE_OT_S, 3, 0, b"zz")
        assert cl.fetch(native.PHASE_OT_S, 3, 0) == b"zz"
        cl.account("evaluator", 77)
        assert cl.bytes("evaluator") == 77
        assert cl.total_bytes() == board.total_bytes()
        cl.reset()
        assert board.total_bytes() == 0
        cl.close()
    finally:
        server.stop()


def test_multiprocess_avnet_demo():
    """The full multi-process AV-net auction demo over the hub."""
    import importlib
    import pathlib
    import sys

    tools = pathlib.Path(__file__).resolve().parent.parent / "tools"
    sys.path.insert(0, str(tools))
    try:
        demo = importlib.import_module("demo_native_board")
        assert demo.main(3, 3, seed=5) == 0
    finally:
        sys.path.remove(str(tools))
