"""Capacity-bucket helpers: program shapes across the MSA engine key
off these (ops/library_pool.py), so their invariants are load-bearing —
a capacity below the input would silently truncate state, and
non-monotonic buckets would defeat cross-family executable reuse."""

import pytest

from ginfinity_tpu.ops.library_pool import (
    _ladder_capacity,
    _member_capacity,
    _slab_capacity,
)


class TestCapacityBuckets:
    @pytest.mark.parametrize("fn,min_cap", [
        (_member_capacity, 8),
        (_slab_capacity, 64),
        (_ladder_capacity, 64),
    ])
    def test_covers_input_and_monotonic(self, fn, min_cap):
        prev = 0
        for n in range(1, 3000):
            cap = fn(n)
            assert cap >= n
            assert cap >= min_cap
            assert cap >= prev  # monotonic -> stable bucket boundaries
            prev = cap

    def test_ladder_waste_bounded(self):
        """Quarter-step ladder: padding waste <= 1/4 of the input above
        the floor (the reason it exists — pow2 wasted 65% at the
        all-pairs 4950-pair scale and blew the memo budget)."""
        for n in range(64, 20000, 7):
            cap = _ladder_capacity(n)
            assert cap - n <= n / 4, (n, cap)
        assert _ladder_capacity(4950) == 5120

    def test_pow2_buckets_are_pow2(self):
        for n in (1, 7, 64, 100, 1470, 5000):
            for fn in (_member_capacity, _slab_capacity):
                cap = fn(n)
                assert cap & (cap - 1) == 0

    def test_bucket_counts_bounded(self):
        """Few distinct shapes over a realistic range — the whole point
        of bucketing (each distinct shape costs a compile)."""
        ladder = {_ladder_capacity(n) for n in range(1, 10000)}
        members = {_member_capacity(n) for n in range(1, 2000)}
        assert len(ladder) <= 40
        assert len(members) <= 12
