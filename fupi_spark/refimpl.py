"""Single-node pandas/pure-Python reference implementations — the
independent oracle for maintenance-state equivalence tests
(SURVEY.md §5.3). Deliberately slow and scalar where the engine is
vectorized, so a shared bug is unlikely.
"""

from __future__ import annotations

import pandas as pd

BITS = 15
MAXC = (1 << BITS) - 1


def norm_scalar(v: float, lo: float, hi: float) -> int:
    if hi <= lo:
        return 0
    g = int((v - lo) / (hi - lo) * MAXC + 0.5)
    return max(0, min(MAXC, g))


def str_u64_scalar(s: str) -> int:
    return int.from_bytes(s.encode()[:8].ljust(8, b"\0"), "big")


def morton4_scalar(d0: int, d1: int, d2: int, d3: int) -> int:
    """Bit-at-a-time Morton interleave; d0 most significant."""
    z = 0
    for b in range(BITS):
        z |= ((d3 >> b) & 1) << (4 * b)
        z |= ((d2 >> b) & 1) << (4 * b + 1)
        z |= ((d1 >> b) & 1) << (4 * b + 2)
        z |= ((d0 >> b) & 1) << (4 * b + 3)
    return z


def hilbert4_scalar(coords: list[int], bits: int = BITS) -> int:
    """Skilling's AxesToTranspose, scalar per-row version."""
    X = list(coords)
    n = len(X)
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    out = 0
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            out = (out << 1) | ((X[i] >> b) & 1)
    return out


def cluster_order(
    pdf: pd.DataFrame, bounds: dict, curve: str = "zorder"
) -> pd.DataFrame:
    """Expected global row order after a clustering rewrite: sort by
    (curve key, clip_id) — the engine's range-partition + in-partition
    sort must concatenate to exactly this."""
    import bisect

    codecs = bounds.get("codec_ranks") or sorted(bounds["codec_rank"])
    keys = []
    for _, r in pdf.iterrows():
        d0 = norm_scalar(str_u64_scalar(r["clip_id"]), bounds["clip_id_lo"], bounds["clip_id_hi"])
        d1 = norm_scalar(r["sr_hz"], bounds["sr_lo"], bounds["sr_hi"])
        d2 = norm_scalar(r["dur_ms"], bounds["dur_lo"], bounds["dur_hi"])
        # searchsorted rank — same semantics as cluster.codec_rank_array
        rk = min(bisect.bisect_left(codecs, r["codec"]), max(len(codecs) - 1, 0))
        d3 = norm_scalar(rk, 0, bounds["codec_hi"])
        if curve == "hilbert":
            keys.append(hilbert4_scalar([d0, d1, d2, d3]))
        else:
            keys.append(morton4_scalar(d0, d1, d2, d3))
    out = pdf.copy()
    out["_zval"] = keys
    return out.sort_values(["_zval", "clip_id"], kind="mergesort").reset_index(drop=True)


def merge_upsert(target: pd.DataFrame, source: pd.DataFrame) -> pd.DataFrame:
    """MERGE INTO oracle: source row wins on key match, source-only rows
    insert, target-only rows carry forward."""
    t = target.set_index("clip_id")
    s = source.set_index("clip_id")
    out = s.combine_first(t)  # source wins on overlap
    # combine_first is column-wise; enforce whole-row source wins:
    out.loc[s.index] = s
    return out.reset_index().sort_values("clip_id").reset_index(drop=True)


def ffd_pack_oracle(sizes: list[tuple[str, int]], target: int) -> list[list[str]]:
    """Independent first-fit-decreasing packer over (path, size)."""
    order = sorted(sizes, key=lambda x: (-x[1], x[0]))
    bins: list[tuple[int, list[str]]] = []
    out: list[list[str]] = []
    for path, size in order:
        for i, (used, members) in enumerate(bins):
            if used + size <= target:
                bins[i] = (used + size, members + [path])
                break
        else:
            bins.append((size, [path]))
    return [m for _, m in bins]
