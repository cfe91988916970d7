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
