"""Round-11 bench noise protocol: the harness must ACT on a noisy
sample (re-time, keep the lowest-spread triple) instead of merely
reporting spread — two of the last three rounds' official artifacts
were loaded-machine samples a judge had to adjudicate by hand."""

from __future__ import annotations

import bench


def test_stats_median_best_spread():
    med, best, spr = bench._stats([3.0, 1.0, 2.0])
    assert (med, best, spr) == (2.0, 1.0, 2.0)


def test_needs_retry_requires_both_floors():
    # large relative spread but under the absolute floor: scheduling
    # jitter on a micro-query, not load — no retry
    assert not bench._needs_retry([0.05, 0.06, 0.15])
    # large absolute spread but small relative to a slow query: the
    # query is just big; retrying buys nothing
    assert not bench._needs_retry([10.0, 10.1, 10.3])
    # both floors exceeded: the loaded-machine signature
    assert bench._needs_retry([1.0, 1.1, 2.0])


def test_retry_bounds_are_sane():
    assert 0 < bench.ACTIONABLE_SPREAD_FRAC_BOUND < 0.15
    assert bench.MAX_RETRY_PASSES >= 1
    # _stats takes r[len//2]: a true median only for ODD samples — an
    # even RUNS would silently record the upper-middle run
    assert bench.RUNS >= 3 and bench.RUNS % 2 == 1
