"""Tracker tests (`include/timeTracker.h`, `include/dataTracker.h` parity)."""

import time

from privacy_auction_tpu.utils import trackers as T


def test_time_tracker():
    t = T.TimeTracker()
    t.start("bidder")
    time.sleep(0.01)
    t.stop("bidder")
    assert t.get_category_time_seconds("bidder") >= 0.01
    assert t.get_category_time_seconds("verifier") == 0.0
    t.reset()
    assert t.get_category_time_seconds("bidder") == 0.0


def test_time_tracker_context():
    t = T.TimeTracker()
    with t.track("verifier"):
        time.sleep(0.005)
    assert t.get_category_time_seconds("verifier") >= 0.005


def test_data_tracker():
    d = T.DataTracker()
    d.add_data("bidder", 500_000)
    d.add_data("verifier", 1_500_000)
    assert d.get_category_data_mb("bidder") == 0.5
    assert d.get_total_data_mb() == 2.0
    d.reset()
    assert d.get_total_data_mb() == 0.0


def test_seal_comm_model():
    d = T.DataTracker()
    c = T.SealCommTracker(d)
    c.account_commit(n=4, c=8)
    c.account_step(n=4, stage2=False)
    # upload: 4 * 8 * (9 pts + 5 sc) + 4 * (4+9 pts, 2+5 sc) + 2*16 pts
    assert d.get_category_data_mb(T.CATEGORY_BIDDER) > 0
    # verifier downloads are n x the uploads of the metered phases
    assert (d.get_category_data_mb(T.CATEGORY_VERIFIER)
            > d.get_category_data_mb(T.CATEGORY_BIDDER))


def test_singletons():
    assert T.TimeTracker.get_instance() is T.TimeTracker.get_instance()
    assert T.DataTracker.get_instance() is T.DataTracker.get_instance()


def test_ccs22_crs_metered():
    d = T.DataTracker()
    c = T.Ccs22CommTracker(d)
    c.account_setup(n=4, c=8)
    # CRS download (group + g,g1,h + order) per party
    # (`CCS22/bulletinBoard.cpp:63-75`)
    assert d.get_category_data_mb(T.CATEGORY_BIDDER_AND_EVALUATOR) == (
        4 * T.CCS22_CRS_BYTES / 1e6
    )


def test_seal_run_auction_time_metering():
    """Per-role device time lands in the tracker (VERDICT r2 item 4)."""
    import jax

    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.protocols import seal

    times = T.TimeTracker()
    res = seal.run_auction(
        CURVE, jax.random.key(3), [2, 1, 3, 0], 2, verify=True, times=times
    )
    assert res.verified and res.max_bid == 3
    assert times.get_category_time_seconds(T.CATEGORY_BIDDER) > 0
    assert times.get_category_time_seconds(T.CATEGORY_VERIFIER) > 0


def test_ccs22_run_auction_time_metering():
    import jax

    from privacy_auction_tpu.curves import SECP256K1 as CURVE
    from privacy_auction_tpu.protocols import ccs22

    times = T.TimeTracker()
    res = ccs22.run_auction(
        CURVE, jax.random.key(4), [2, 1, 3, 0], 2, eval_id=0, times=times
    )
    assert res.max_bid == 3
    assert times.get_category_time_seconds(T.CATEGORY_BIDDER) > 0
    assert times.get_category_time_seconds(T.CATEGORY_EVALUATOR) > 0
