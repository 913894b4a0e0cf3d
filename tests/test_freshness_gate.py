"""H3 trigger-policy tests (reference: engine.py:32-36, :136-175) —
threshold x3 during warmup, cooldown 60s early / 300s late, force
bypass.  Pure driver logic, fake clock."""

from __future__ import annotations

from msg_vector_search_spark.plans.search import FreshnessGate


class Clock:
    def __init__(self, t=0.0):
        self.t = t

    def __call__(self):
        return self.t


def test_warmup_triples_threshold():
    clk = Clock()
    g = FreshnessGate(threshold=50, clock=clk)
    # first 5 searches need gap > 150
    assert not g.should_update(gap=100)
    assert g.should_update(gap=151)


def test_post_warmup_threshold_drops():
    clk = Clock()
    g = FreshnessGate(threshold=50, clock=clk)
    for _ in range(5):
        g.should_update(gap=0)
    clk.t += 1000  # past any cooldown
    assert g.should_update(gap=51)


def test_cooldown_blocks_refresh():
    clk = Clock()
    g = FreshnessGate(threshold=50, clock=clk)
    assert g.should_update(gap=200)
    clk.t += 30          # inside the 60s early cooldown
    assert not g.should_update(gap=200)
    clk.t += 31          # past it
    assert g.should_update(gap=200)


def test_late_cooldown_is_300s():
    clk = Clock(t=0.0)
    g = FreshnessGate(threshold=50, clock=clk)
    assert g.should_update(gap=200)
    clk.t = 700          # past the 600s early window
    assert g.should_update(gap=200)
    clk.t = 700 + 200    # 200s later: early cooldown would pass, late blocks
    assert not g.should_update(gap=200)
    clk.t = 700 + 301
    assert g.should_update(gap=200)


def test_force_bypasses_everything():
    clk = Clock()
    g = FreshnessGate(threshold=50, clock=clk)
    assert g.should_update(gap=0, force=True)
    assert not g.should_update(gap=0)
