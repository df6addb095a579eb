"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes:

- exact:   hash-key → map-side pre-dedup (combiner) → ONE groupby shuffle
           on the compact hash → keep min-doc_id per group.
- minhash: shingle → minhash signature (numpy, vectorized per batch) →
           banding: emit (band, band_hash, doc_id) rows → groupby(bucket)
           → verify candidates with TRUE shingle Jaccard inside the group
           → duplicate = verified pair with a smaller doc_id (keep-min
           rule; avoids iterative connected components at corpus scale).
- simhash: 64-bit signature; pigeonhole banding on 4×16-bit chunks →
           groupby chunk → verify Hamming distance inside the group.

All signatures are deterministic (fixed seeds), so retried tasks reproduce
identical buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def _shingles(text: str, k: int) -> np.ndarray:
    words = (text or "").split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(np.array([_hash64(g) for g in grams], dtype=np.uint64))


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, shingle_k: int = 3, _params={}) -> np.ndarray:
    key = num_perm
    if key not in _params:
        _params[key] = _perm_params(num_perm)
    a, b = _params[key]
    sh = _shingles(text, shingle_k)
    # (num_perm, n_shingles) universal hashing, min over shingles
    vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def jaccard(text_a: str, text_b: str, shingle_k: int = 3) -> float:
    sa, sb = set(_shingles(text_a, shingle_k)), set(_shingles(text_b, shingle_k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct text. Returns the surviving rows."""

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.sha256((t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column("__key", pa.array(keys, pa.string()))

    def local_min(batch: pa.Table) -> pa.Table:
        # combiner: keep min-id row per key within the block before shuffling
        best: dict[str, int] = {}
        keys = batch.column("__key").to_pylist()
        ids = batch.column(id_col).to_pylist()
        for i, (k, d) in enumerate(zip(keys, ids)):
            if k not in best or ids[best[k]] > d:
                best[k] = i
        return batch.take(pa.array(sorted(best.values())))

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        return group.slice(ids.index(min(ids)), 1)

    return (
        ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__key")
        .map_groups(keep_min, batch_format="pyarrow")
        .drop_columns(["__key"])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------


def minhash_lsh_duplicates(
    ds,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """→ Dataset(doc_id, dup_of): docs judged near-duplicates of a
    smaller-id doc (verified shingle-Jaccard ≥ threshold).

    Stage 1 (map): signatures + band rows. Stage 2 (shuffle): groupby
    (band, band_hash); groups are candidate sets — verification runs
    inside the group (text travels with the band row to keep this a
    single shuffle; at very large scale swap for id-only bands + a
    second join-like lookup stage)."""
    rows_per_band = num_perm // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        out = {"band": [], "band_hash": [], id_col: [], text_col: []}
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for d, t in zip(ids, texts):
            sig = minhash_signature(t, num_perm, shingle_k)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["band"].append(b)
                out["band_hash"].append(h)
                out[id_col].append(d)
                out[text_col].append(t)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.string()),
                id_col: pa.array(out[id_col]),
                text_col: pa.array(out[text_col], pa.string()),
            }
        )

    def verify_group(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        if len(ids) < 2:
            return pa.table({id_col: pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())})
        order = np.argsort(ids)
        dup_ids, dup_of = [], []
        for i in range(1, len(order)):
            for j in range(i):
                a, b = order[j], order[i]
                if jaccard(texts[a], texts[b], shingle_k) >= threshold:
                    dup_ids.append(ids[b])
                    dup_of.append(ids[a])
                    break
        return pa.table({id_col: pa.array(dup_ids, pa.int64()), "dup_of": pa.array(dup_of, pa.int64())})

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_hash"])
        .map_groups(verify_group, batch_format="pyarrow")
    )

    # a doc may surface in several bands: keep one (min dup_of) per doc
    def min_per_doc(group: pa.Table) -> pa.Table:
        dups = group.column("dup_of").to_pylist()
        return group.slice(dups.index(min(dups)), 1)

    return pairs.groupby(id_col).map_groups(min_per_doc, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds,
    *,
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """All near-duplicate PAIRS with their true n-gram Jaccard scores.

    Candidate generation via MinHash banding (more bands than the dedup
    path → recall at lower thresholds), exact shingle-Jaccard verification
    inside each bucket. → Dataset(doc_a, doc_b, jaccard), doc_a < doc_b,
    deduplicated across buckets by keeping each pair's first bucket."""
    rows_per_band = num_perm // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        out = {"band": [], "band_hash": [], id_col: [], text_col: []}
        for d, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            sig = minhash_signature(t, num_perm, shingle_k)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out["band"].append(b)
                out["band_hash"].append(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                )
                out[id_col].append(d)
                out[text_col].append(t)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.string()),
                id_col: pa.array(out[id_col]),
                text_col: pa.array(out[text_col], pa.string()),
            }
        )

    def verify_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        a_out, b_out, j_out = [], [], []
        order = np.argsort(ids)
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                if ids[i] == ids[j]:
                    continue
                score = jaccard(texts[i], texts[j], shingle_k)
                if score >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(round(score, 6))
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_hash"])
        .map_groups(verify_pairs, batch_format="pyarrow")
    )

    def first_per_pair(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        first_per_pair, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for w in (text or "").split():
        h = _hash64(w)
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_duplicates(ds, *, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Pigeonhole banding: hamming ≤ k ⇒ at least one of k+1 chunks is
    bit-identical, so grouping by each chunk finds every candidate pair.
    → Dataset(doc_id, dup_of, hamming)."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks

    def chunk_bits(sig: int, c: int) -> int:
        lo = c * width
        hi = 64 if c == n_chunks - 1 else lo + width  # last chunk absorbs remainder
        return (sig >> lo) & ((1 << (hi - lo)) - 1)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        out = {"chunk": [], "chunk_val": [], id_col: [], "sig": []}
        for d, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            sig = simhash64(t)
            for c in range(n_chunks):
                out["chunk"].append(c)
                out["chunk_val"].append(chunk_bits(sig, c))
                out[id_col].append(d)
                out["sig"].append(sig)
        return pa.table(
            {
                "chunk": pa.array(out["chunk"], pa.int32()),
                "chunk_val": pa.array(out["chunk_val"], pa.int32()),
                id_col: pa.array(out[id_col]),
                "sig": pa.array(out["sig"], pa.uint64()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        sigs = group.column("sig").to_pylist()
        if len(ids) < 2:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64()), "hamming": pa.array([], pa.int32())}
            )
        order = np.argsort(ids)
        did, dof, ham = [], [], []
        for i in range(1, len(order)):
            for j in range(i):
                a, b = order[j], order[i]
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= max_hamming:
                    did.append(ids[b])
                    dof.append(ids[a])
                    ham.append(h)
                    break
        return pa.table(
            {id_col: pa.array(did, pa.int64()), "dup_of": pa.array(dof, pa.int64()), "hamming": pa.array(ham, pa.int32())}
        )

    pairs = (
        ds.map_batches(chunk_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["chunk", "chunk_val"])
        .map_groups(verify, batch_format="pyarrow")
    )

    def min_per_doc(group: pa.Table) -> pa.Table:
        dups = group.column("dup_of").to_pylist()
        return group.slice(dups.index(min(dups)), 1)

    return pairs.groupby(id_col).map_groups(min_per_doc, batch_format="pyarrow")
