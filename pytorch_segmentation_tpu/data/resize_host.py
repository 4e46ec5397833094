"""Host-side helpers for multi-scale size selection
(reference utils/datasets.py:206-212: scale ~ U(0.7, 1.5), snap to /32)."""

from __future__ import annotations

import functools

__all__ = ["multi_scale_sizes"]


@functools.lru_cache(maxsize=64)
def multi_scale_sizes(base_hw, lo: float = 0.7, hi: float = 1.5,
                      snap: int = 32):
    """All (h, w) the reference's multi-scale resize can produce — a bounded
    static set, so XLA compiles each size once."""
    h, w = base_hw
    sizes = set()
    # one scale drives both axes (reference pairs h/w with a common scale);
    # sampling the scale range densely enumerates every reachable snapped pair
    scales = [lo + i * (hi - lo) / 256 for i in range(257)]
    for s in scales:
        hh = int(h * s / snap) * snap
        ww = int(w * s / snap) * snap
        if hh > 0 and ww > 0:
            sizes.add((hh, ww))
    return sorted(sizes)
