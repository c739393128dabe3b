"""Mergeable cardinality sketches — the map-side shape for DISTINCT counts
at crawl scale (HyperLogLog, Flajolet et al. 2007, with the standard
linear-counting small-range correction).

An exact distinct over 100 TB needs a full shuffle of every key; an HLL
partial is ``m`` one-byte registers per batch, merged with elementwise max —
commutative, idempotent, constant-size — so the combine is O(groups x m)
regardless of input rows. Hashing is md5-based (PYTHONHASHSEED-free), which
makes the whole estimate **deterministic across processes and partitionings**
— the property the golden oracle pins.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_P = 10  # m = 1024 registers, ~3.25% relative error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_build(values, p: int = DEFAULT_P) -> np.ndarray:
    """Registers (uint8[m]) for an iterable of values (stringified, md5'd)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:8], "big"
        )
        idx = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        rank = (64 - p) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise max — commutative/idempotent, so partials merge in any
    order and duplicated partials cannot inflate the estimate."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    est = _alpha(m) * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return int(round(est))
