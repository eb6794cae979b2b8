"""Space-filling-curve keys: Z-order (Morton) and Hilbert, 15 bits per
dimension, up to 4 dims → key fits a signed 64-bit long.

Vectorized numpy throughout (BASELINE.json input_hint: no per-row
Python). The slow per-row oracle twin lives in refimpl.py.
"""

from __future__ import annotations

import numpy as np

BITS = 15
MAXC = (1 << BITS) - 1  # 32767


def normalize_to_grid(
    vals: np.ndarray, lo: float, hi: float
) -> np.ndarray:
    """Min/max-scale values onto the [0, 2^15-1] integer grid.

    Bounds come from manifest stats (min/max over file entries), so
    normalization needs no extra pass over the data — the Iceberg-style
    metadata pays for itself here.
    """
    v = vals.astype(np.float64)
    if hi <= lo:
        return np.zeros(len(v), dtype=np.uint64)
    g = np.floor((v - lo) / (hi - lo) * MAXC + 0.5)
    return np.clip(g, 0, MAXC).astype(np.uint64)


def string_to_u64(s: "np.ndarray | list[str]") -> np.ndarray:
    """First 8 bytes of a string, big-endian → uint64. Order-preserving
    on the first 8 chars — enough rank resolution for range clustering
    without a global sort (a percent_rank window would serialize on one
    reducer at 10^12 rows). Fully vectorized: fixed-width S8 cast +
    uint64 view + byteswap."""
    a = np.asarray(s, dtype="S8")  # truncate/NUL-pad to exactly 8 bytes
    u = np.frombuffer(a.tobytes(), dtype=">u8")
    return u.astype(np.uint64)


def _spread4(x: np.ndarray) -> np.ndarray:
    """Spread 16 bits so consecutive bits land 4 apart (Morton 4-D)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(24))) & np.uint64(0x000000FF000000FF)
    x = (x | (x << np.uint64(12))) & np.uint64(0x000F000F000F000F)
    x = (x | (x << np.uint64(6))) & np.uint64(0x0303030303030303)
    x = (x | (x << np.uint64(3))) & np.uint64(0x1111111111111111)
    return x


def morton4(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray, d3: np.ndarray) -> np.ndarray:
    """4-D Z-order key; d0 is the most significant dimension."""
    z = (
        (_spread4(d0) << np.uint64(3))
        | (_spread4(d1) << np.uint64(2))
        | (_spread4(d2) << np.uint64(1))
        | _spread4(d3)
    )
    return z.astype(np.int64)


def hilbert4(coords: np.ndarray, bits: int = BITS) -> np.ndarray:
    """4-D Hilbert index via Skilling's transpose algorithm (public
    domain, 'Programming the Hilbert curve', AIP 2004), vectorized over
    rows; the bit loop is O(bits), each step full-width numpy.

    coords: (n, 4) uint64 array with values < 2^bits.
    """
    X = coords.astype(np.uint64).copy()
    n = X.shape[1]
    M = np.uint64(1) << np.uint64(bits - 1)

    # inverse undo
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            hi = (X[:, i] & Q) != 0
            # where bit set: invert low bits of X[:,0]
            X[hi, 0] ^= P
            # else: exchange low bits of X[:,0] and X[:,i]
            lo = ~hi
            t = (X[lo, 0] ^ X[lo, i]) & P
            X[lo, 0] ^= t
            X[lo, i] ^= t
        Q >>= np.uint64(1)

    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), dtype=np.uint64)
    Q = M
    while Q > np.uint64(1):
        mask = (X[:, n - 1] & Q) != 0
        t[mask] ^= Q - np.uint64(1)
        Q >>= np.uint64(1)
    for i in range(n):
        X[:, i] ^= t

    # interleave transposed coords, dim 0 most significant
    out = np.zeros(len(X), dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            out = (out << np.uint64(1)) | ((X[:, i] >> np.uint64(b)) & np.uint64(1))
    return out.astype(np.int64)
