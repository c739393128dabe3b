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


# ---------------------------------------------------------------- Count-Min --
# Cormode & Muthukrishnan's Count-Min sketch: depth x width counters; an
# item's estimate is the MIN over its depth cells. Merging is elementwise
# SUM — commutative/associative, so map-side partial sketches combine in any
# order (the same mergeability discipline as the HLL registers above). All
# hashing is md5-derived (deterministic across processes, like every sketch
# in this module). Guarantee: estimate >= true count always, and
# estimate <= true + (e/width) * N with probability 1 - exp(-depth).

CMS_DEPTH = 4
CMS_WIDTH = 4096


def cms_new(depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    if depth > 4:
        # _cms_cols derives rows from 4 independent 32-bit md5 slices; a
        # fifth row would hash every term to column 0 (int.from_bytes(b''))
        # and silently deliver depth-4 error bounds at depth-N memory
        raise ValueError(f"depth must be <= 4 (md5 gives 4 slices), got {depth}")
    return np.zeros((depth, width), dtype=np.int64)


def _cms_cols(term: str, depth: int, width: int) -> "list[int]":
    h = hashlib.md5(term.encode()).digest()
    # 4 independent 32-bit slices of one md5 — depth <= 4
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") % width for i in range(depth)
    ]


def cms_add(sketch: np.ndarray, term: str, count: int = 1) -> None:
    depth, width = sketch.shape
    for i, c in enumerate(_cms_cols(term, depth, width)):
        sketch[i, c] += count


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(sketch: np.ndarray, term: str) -> int:
    depth, width = sketch.shape
    return int(
        min(sketch[i, c] for i, c in enumerate(_cms_cols(term, depth, width)))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the semi-join pre-filter sketch
# ---------------------------------------------------------------------------
# The 100 TB join story: broadcasting the build side's EXACT key set costs
# 8+ bytes/key (unbounded); a Bloom filter is a FIXED-size bit array whose
# partials merge with bitwise OR (commutative + idempotent), so every
# map_batches block builds its own partial and the combine is O(blocks x m/8)
# bytes no matter how many keys flow in. Membership has false POSITIVES only
# — never false negatives — so bloom(pass) ⊇ matches, which makes it a safe
# pre-filter in front of an exact co-partitioned verify. md5-based hashing
# keeps it deterministic across processes and partitionings.

BLOOM_BITS = 1 << 17  # 16 KiB — fpr ~1e-8 at 300 keys, ~0.5% at 10k keys
BLOOM_K = 4


def bloom_new(m_bits: int = BLOOM_BITS) -> np.ndarray:
    return np.zeros(m_bits // 8, dtype=np.uint8)


def _bloom_positions(key, m_bits: int, k: int) -> "list[int]":
    """k probe positions via double hashing (Kirsch-Mitzenmacher: pos_i =
    h1 + i*h2) over the md5 of the stringified key — valid for ANY k, not
    just the 4 that fit md5's 16 bytes as independent slices."""
    h = hashlib.md5(str(key).encode()).digest()
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_add(bits: np.ndarray, key, k: int = BLOOM_K) -> None:
    m_bits = len(bits) * 8
    for pos in _bloom_positions(key, m_bits, k):
        bits[pos >> 3] |= 1 << (pos & 7)


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_contains(bits: np.ndarray, key, k: int = BLOOM_K) -> bool:
    m_bits = len(bits) * 8
    return all(
        bits[pos >> 3] & (1 << (pos & 7))
        for pos in _bloom_positions(key, m_bits, k)
    )


def bloom_contains_many(bits: np.ndarray, keys, k: int = BLOOM_K) -> np.ndarray:
    """Membership for a batch of arbitrary keys (bool[len(keys)]); for
    int64 key columns use the vectorized ``*_int64`` twins instead."""
    return np.fromiter(
        (bloom_contains(bits, key, k) for key in keys),
        dtype=bool,
        count=len(keys),
    )


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 -> uint64) — the same
    deterministic, PYTHONHASHSEED-free property as the md5 path, at numpy
    speed for integer key columns. Build and probe sides must use the SAME
    family, so the int64 add/contains twins pair with each other only."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _bloom_positions_int64(keys: np.ndarray, m_bits: int, k: int):
    h1 = _splitmix64_np(keys.astype(np.uint64))
    h2 = _splitmix64_np(h1) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(k):
        yield (h1 + np.uint64(i) * h2) % m


def bloom_add_many_int64(bits: np.ndarray, keys, k: int = BLOOM_K) -> None:
    """Vectorized insert of an int64 key array (the map-side partial for
    integer join keys — no per-row Python on the build side)."""
    keys = np.asarray(keys, dtype=np.int64)
    m_bits = len(bits) * 8
    with np.errstate(over="ignore"):
        for pos in _bloom_positions_int64(keys, m_bits, k):
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                ),
            )


def bloom_contains_many_int64(
    bits: np.ndarray, keys, k: int = BLOOM_K
) -> np.ndarray:
    """Vectorized membership for an int64 key array — the probe-side hot
    path stays numpy end-to-end (no per-row hashing)."""
    keys = np.asarray(keys, dtype=np.int64)
    m_bits = len(bits) * 8
    mask = np.ones(len(keys), dtype=bool)
    with np.errstate(over="ignore"):
        for pos in _bloom_positions_int64(keys, m_bits, k):
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            bit = np.left_shift(
                np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
            )
            mask &= (byte & bit) != 0
    return mask
