"""Stable, vectorized hashing for shuffle keys.

Every bucket id that decides WHERE a row shuffles must be identical on
every worker of a (possibly mixed-version, multi-node) cluster. Library
hashes (polars' ahash, pandas' siphash) may change across versions, so a
heterogeneous fleet could route the same key to different buckets —
silently breaking joins and dedup. These kernels depend only on numpy's
wrapping uint64 arithmetic, which is fixed by the platform, and are
asserted against golden constants in tests/test_ops.py.

String hashing is a polynomial rolling hash evaluated with the prefix
trick over the Arrow string buffer — O(total bytes) fully vectorized, no
per-row Python:

    H(s[a:b]) = (S[b] - S[a]) · P^-a   where  S[i] = Σ_{j<i} (c_j+1)·P^j

(all mod 2^64; P odd ⇒ invertible), finished with a splitmix64 avalanche
mixed with the length and seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_P = np.uint64(0x9E3779B185EBCA87)  # odd ⇒ invertible mod 2^64
_PINV = np.uint64(pow(0x9E3779B185EBCA87, -1, 1 << 64))
_NULL_SALT = np.uint64(0x9AE16A3B2F90404F)
# row-chunk byte budget: the prefix arrays are ~5 uint64 temporaries of
# total-bytes length, so 1 MiB of string data peaks around 40 MiB
_CHUNK_BYTES = 1 << 20


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _seed_mix(seed: int) -> np.ndarray:
    return _splitmix64(np.full(1, seed, np.uint64) * _P)


def hash_int64(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 hash of an int64/uint64 array (bit-pattern, sign-safe)."""
    v = np.asarray(vals)
    if v.dtype != np.uint64:
        v = v.astype(np.int64, copy=False).view(np.uint64)
    return _splitmix64(v ^ _seed_mix(seed))


def _powers(n: int, base: np.uint64) -> np.ndarray:
    """[base^0 .. base^n] mod 2^64 by doubling-fill: each step multiplies a
    whole slice by a scalar (SIMD-vectorizable), unlike cumprod whose
    serial carry chain caps throughput."""
    pw = np.empty(n + 1, np.uint64)
    pw[0] = 1
    step, val = 1, int(base)
    while step <= n:
        end = min(2 * step, n + 1)
        np.multiply(pw[: end - step], np.uint64(val), out=pw[step:end])
        val = (val * val) & 0xFFFFFFFFFFFFFFFF
        step *= 2
    return pw


def _hash_string_block(
    off: np.ndarray, data: np.ndarray, seed: int, pw: np.ndarray, ipw: np.ndarray
) -> np.ndarray:
    """Polynomial prefix hash of the strings spanned by ``off`` (absolute
    offsets into ``data``). ``pw``/``ipw`` are shared power tables at
    least one longer than the block's byte span."""
    lo, hi = int(off[0]), int(off[-1])
    n = hi - lo
    seg = data[lo:hi].astype(np.uint64) + np.uint64(1)  # +1: NUL-byte ≠ end
    s = np.empty(n + 1, np.uint64)
    s[0] = 0
    if n:
        np.cumsum(seg * pw[:n], out=s[1:])
    starts = (off[:-1] - lo).astype(np.int64)
    ends = (off[1:] - lo).astype(np.int64)
    h = (s[ends] - s[starts]) * ipw[starts]
    lens = (ends - starts).view(np.uint64)
    return _splitmix64(h ^ _splitmix64(lens + _seed_mix(seed)))


def _hash_string_array(a: pa.Array, seed: int) -> np.ndarray:
    if len(a) == 0:
        return np.empty(0, np.uint64)
    if pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = a.buffers()
    off_all = np.frombuffer(bufs[1], off_dtype)
    off = off_all[a.offset : a.offset + len(a) + 1].astype(np.int64, copy=False)
    data = (
        np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    out = np.empty(len(a), np.uint64)
    # row-chunk so the O(bytes) temporaries stay bounded; block ends via
    # searchsorted (no per-row loop). Power tables are computed once for
    # the largest block and shared across blocks.
    n_rows = len(a)
    max_block = 0
    i = 0
    bounds = []
    while i < n_rows:
        j = int(np.searchsorted(off, off[i] + _CHUNK_BYTES, side="right")) - 1
        j = max(j, i + 1)  # a single over-budget string is its own block
        bounds.append((i, j))
        max_block = max(max_block, int(off[j] - off[i]))
        i = j
    pw = _powers(max_block, _P)
    ipw = _powers(max_block, _PINV)
    for i, j in bounds:
        out[i:j] = _hash_string_block(off[i : j + 1], data, seed, pw, ipw)
    if a.null_count:
        mask = np.asarray(a.is_null())
        out[mask] = _splitmix64(np.full(int(mask.sum()), _NULL_SALT) ^ _seed_mix(seed))
    return out


def hash_strings(arr, seed: int = 0) -> np.ndarray:
    """uint64 hash per element of a string Array/ChunkedArray/list.
    Nulls hash to a fixed (seeded) constant distinct from any string."""
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            return np.empty(0, np.uint64)
        return np.concatenate([_hash_string_array(c, seed) for c in arr.chunks])
    return _hash_string_array(arr, seed)


def combine_hashes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two hash columns."""
    return _splitmix64((a * _P) ^ b)


def _hash_column(col, seed: int) -> np.ndarray:
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return hash_strings(col, seed)
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        filled = pc.fill_null(pc.cast(col, pa.int64()), -(1 << 62) + 12345)
        return hash_int64(filled.to_numpy(zero_copy_only=False), seed)
    if pa.types.is_timestamp(t):
        filled = pc.fill_null(
            pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()), -(1 << 62) + 12345
        )
        return hash_int64(filled.to_numpy(zero_copy_only=False), seed)
    if pa.types.is_floating(t):
        # +0.0 canonicalizes -0.0; null and NaN collapse to the canonical
        # NaN bit pattern (acceptable for bucket assignment)
        v = pc.add(pc.cast(col, pa.float64()), pa.scalar(0.0))
        arr = np.array(v.to_numpy(zero_copy_only=False), dtype=np.float64)
        arr[np.isnan(arr)] = np.nan
        return hash_int64(arr.view(np.uint64), seed)
    # fallback: cast through string
    return hash_strings(pc.cast(col, pa.string()), seed)


def hash_columns(tbl: pa.Table, cols: list[str], seed: int = 0) -> np.ndarray:
    """uint64 hash per row over the named key columns — the stable
    replacement for polars ``hash_rows``. Integer widths and timestamp
    units are canonicalized so both sides of a join bucket identically."""
    h = None
    for c in cols:
        hc = _hash_column(tbl.column(c), seed)
        h = hc if h is None else combine_hashes(h, hc)
    assert h is not None, "hash_columns needs at least one column"
    return h


def bucket_ids(tbl: pa.Table, cols: list[str], num_buckets: int, seed: int = 0) -> pa.Array:
    """Int32 shuffle-bucket column from the key columns."""
    h = hash_columns(tbl, cols, seed)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))
