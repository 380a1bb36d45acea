"""Deduplication operators over document tables — first-class large-scale
training-data ops (not in the reference, which only rejects duplicate
feature *columns* — featurebox/symbol/base.py:712-731; the same
content-hash idea applied to rows at scale).

All variants follow the same scale shape: a cheap per-batch vectorized
signature (map_batches) → hash-partition groupby on the signature (only
signatures shuffle, never full text where avoidable) → per-group vectorized
resolution.

* :func:`exact_dedup` — sha1(text) hash-partition + per-group first
  (min id), collision-checked on the full text inside the group.
* :func:`minhash_lsh_dedup` — word-shingle → k minhashes → b bands; band
  buckets shuffle; candidate pairs verified with exact shingle Jaccard.
* :func:`simhash_dedup` — 64-bit simhash, banded into 4×16-bit chunks
  (Hamming ≤3 guarantee), verified by Hamming distance.
* :func:`embedding_neardup` — cosine near-dup via random-hyperplane LSH
  buckets + in-bucket exact cosine.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_SPLIT = None


def _sha64(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "little")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 32):
    """Keep the first (min ``id_col``) row per exact ``text_col`` value.

    Hash-partition by a 64-bit content hash so the shuffle key is 8 bytes
    per row; the per-group kernel resolves hash collisions on the raw text.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        h = np.fromiter((_sha64(t) for t in texts), dtype=np.uint64,
                        count=len(texts))
        return batch.append_column("__h", pa.array(h, pa.uint64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def first_per_text(group: pa.Table) -> pa.Table:
        # group = all rows of some hash bucket; resolve per exact text
        import pandas as pd

        df = group.to_pandas()
        keep = df.sort_values(id_col).drop_duplicates(text_col, keep="first")
        return pa.Table.from_pandas(keep.drop(columns="__h"), preserve_index=False)

    return hashed.groupby("__h").map_groups(first_per_text, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(k: int, seed: int = 17) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, k, dtype=np.int64).astype(np.uint64)
    return a, b


_GRAM_A = np.uint64(1_000_003)
_GRAM_B = np.uint64(999_999_937)


_TOKEN_HASH_CACHE: dict = {}
_TOKEN_HASH_CACHE_MAX = 1 << 20


def _hash_token(t: str) -> int:
    """True 64-bit token hash (blake2b/8B).  crc32-based widening is NOT
    enough: crc32(b, salt) differs from crc32(b) by a constant that
    depends only on len(b) (CRC linearity), so same-length tokens collide
    at 32-bit birthday rates.  blake2b per UNIQUE token with a per-worker
    vocab cache keeps cost ~one hash per vocabulary word."""
    h = _TOKEN_HASH_CACHE.get(t)
    if h is None:
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_HASH_CACHE_MAX:
            _TOKEN_HASH_CACHE.clear()
        h = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        _TOKEN_HASH_CACHE[t] = h
    return h


def _token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        toks = [""]
    return np.fromiter((_hash_token(t) for t in toks), dtype=np.uint64,
                       count=len(toks))


def _shingles(text: str, n: int) -> np.ndarray:
    """Hashes of word n-grams, vectorized: combine per-token hashes of the
    sliding window arithmetically (position-weighted polynomial)."""
    th = _token_hashes(text)
    if len(th) < n:
        pad = np.zeros(n - len(th), np.uint64)
        th = np.concatenate([th, pad])
    m = len(th) - n + 1
    acc = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc = acc * _GRAM_A + th[j:j + m] * _GRAM_B
    return acc


class MinHasher:
    """Stateful per-actor minhash signature computer (params built once)."""

    def __init__(self, k: int = 64, shingle_n: int = 3, seed: int = 17,
                 text_col: str = "text"):
        self.a, self.b = _minhash_params(k, seed)
        self.k = k
        self.n = shingle_n
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.n)
        # (k, m) universal hash; min over shingles
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.empty((0, self.k), np.uint64)
        return batch.append_column(
            "__sig", pa.array(list(sigs), pa.list_(pa.uint64(), self.k))
        )


_MH_CACHE: dict = {}


def minhash_signature_fn(batch: pa.Table, *, k: int = 32,
                         text_col: str = "text") -> pa.Table:
    """Stateless-task MinHash signature stage (per-worker cached params) —
    see ``text.text_features_fn`` for why this exists alongside the
    actor-pool ``MinHasher``."""
    key = (k, text_col)
    mh = _MH_CACHE.get(key)
    if mh is None:
        mh = _MH_CACHE[key] = MinHasher(k=k, text_col=text_col)
    return mh(batch)


def minhash_bands_fn(batch: pa.Table, *, k: int = 16, bands: int = 4,
                     text_col: str = "text") -> pa.Table:
    """Compact dedup-signature stage: MinHash then fold into ``bands``
    uint64 band-bucket columns (``mh_band0..``) instead of carrying the
    full signature list (32 B/row vs 8k B/row) — the shape a 100 TB
    pipeline ships through its shuffle."""
    assert k % bands == 0, "k must divide into bands (else hashes are dropped)"
    key = (k, text_col)
    mh = _MH_CACHE.get(key)
    if mh is None:
        mh = _MH_CACHE[key] = MinHasher(k=k, text_col=text_col)
    texts = batch[text_col].to_pylist()
    if texts:
        sig = np.stack([mh.signature(t) for t in texts])
    else:
        sig = np.empty((0, k), np.uint64)
    rows_per_band = k // bands
    out = batch
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            bucket = np.zeros(len(texts), dtype=np.uint64)
            for j in range(rows_per_band):
                bucket = bucket * np.uint64(1099511628211) + seg[:, j]
            out = out.append_column(f"mh_band{b}", pa.array(bucket, pa.uint64()))
    return out


def minhash_lsh_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    concurrency=(2, 16),
):
    """Near-duplicate pairs via MinHash+LSH.

    Returns a Dataset of verified candidate pairs
    ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b`` and estimated
    Jaccard (signature agreement) ≥ threshold.  Scale shape:
    signatures are computed in an actor pool (params once per actor), then
    each of ``bands`` band-buckets is a groupby on an 8-byte key; only
    (id, signature) pairs shuffle.
    """
    assert k % bands == 0, "k must divide into bands (else hashes are dropped)"
    rows_per_band = k // bands
    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "shingle_n": shingle_n, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    ).select_columns([id_col, "__sig"])

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "__band": pa.array([], pa.int32()),
                             "__bucket": pa.array([], pa.uint64()),
                             "__sig": pa.array([], batch["__sig"].type)})
        sig = np.stack(batch["__sig"].to_numpy(zero_copy_only=False))
        ids = batch[id_col]
        out_ids, out_band, out_bucket, out_sig = [], [], [], []
        for bnd in range(bands):
            seg = sig[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            # bucket key: hash of the band segment
            bucket = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                bucket = bucket * np.uint64(1099511628211) + seg[:, j]
            out_ids.append(ids)
            out_band.append(np.full(n, bnd, np.int32))
            out_bucket.append(bucket)
            out_sig.append(batch["__sig"])
        return pa.table({
            id_col: pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_ids]),
            "__band": pa.array(np.concatenate(out_band)),
            "__bucket": pa.array(np.concatenate(out_bucket), pa.uint64()),
            "__sig": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_sig]),
        })

    exploded = sig_ds.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "est_jaccard": pa.array([], pa.float64())})
        if n < 2 or n > 2000:
            if n > 2000:  # size cap: pathological bucket — log the recall loss
                import logging

                logging.getLogger("featurebox_ray.dedup").warning(
                    "minhash bucket over cap (%d rows) skipped — near-dup "
                    "pairs inside it are not reported", n)
            return empty
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        sig = np.stack(group["__sig"].to_numpy(zero_copy_only=False))
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        # unique ids only (same doc may appear once per bucket)
        uniq, first = np.unique(ids, return_index=True)
        ids, sig = ids[first], sig[first]
        m = len(ids)
        if m < 2:
            return empty
        ii, jj = np.triu_indices(m, 1)
        est = (sig[ii] == sig[jj]).mean(axis=1)
        keep = est >= jaccard_threshold
        return pa.table({
            "id_a": pa.array(ids[ii[keep]]),
            "id_b": pa.array(ids[jj[keep]]),
            "est_jaccard": pa.array(est[keep]),
        })

    pairs = exploded.groupby(["__band", "__bucket"]).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )

    # same pair can fire in multiple bands -> distinct
    def dedup_pairs(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


class SimHasher:
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def simhash(text: str) -> int:
        th = _token_hashes(text)  # (m,) uint64
        # (m, 64) bit matrix in one vectorized op
        bits = (th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out = np.uint64(0)
        pos = np.flatnonzero(acc > 0)
        for b in pos:
            out |= np.uint64(1) << np.uint64(b)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        h = np.fromiter((self.simhash(t) for t in texts), dtype=np.uint64,
                        count=len(texts))
        return batch.append_column("__simhash", pa.array(h, pa.uint64()))


def simhash_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, concurrency=(2, 8)):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, via 4×16-bit
    band buckets (pigeonhole: any pair within distance 3 shares a band)."""
    sigged = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    ).select_columns([id_col, "__simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = batch["__simhash"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].combine_chunks() if n else batch[id_col]
        parts = {"__band": [], "__bucket": [], id_col: [], "__simhash": []}
        for bnd in range(4):
            chunk = (h >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            parts["__band"].append(np.full(n, bnd, np.int32))
            parts["__bucket"].append(chunk.astype(np.uint64))
            parts[id_col].append(ids)
            parts["__simhash"].append(batch["__simhash"].combine_chunks() if n else batch["__simhash"])
        return pa.table({
            id_col: pa.concat_arrays([a if isinstance(a, pa.Array) else a.combine_chunks() for a in parts[id_col]]),
            "__band": pa.array(np.concatenate(parts["__band"])),
            "__bucket": pa.array(np.concatenate(parts["__bucket"]), pa.uint64()),
            "__simhash": pa.concat_arrays([a if isinstance(a, pa.Array) else a.combine_chunks() for a in parts["__simhash"]]),
        })

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int32())})
        n = group.num_rows
        if n < 2 or n > 4000:
            if n > 4000:
                import logging

                logging.getLogger("featurebox_ray.dedup").warning(
                    "simhash bucket over cap (%d rows) skipped", n)
            return empty
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        h = group["__simhash"].to_numpy(zero_copy_only=False)
        uniq, first = np.unique(ids, return_index=True)
        ids, h = ids[first], h[first]
        m = len(ids)
        if m < 2:
            return empty
        ii, jj = np.triu_indices(m, 1)
        x = h[ii] ^ h[jj]
        dist = np.zeros(len(x), dtype=np.int32)
        for b in range(64):
            dist += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
        keep = dist <= max_hamming
        return pa.table({"id_a": pa.array(ids[ii[keep]]),
                         "id_b": pa.array(ids[jj[keep]]),
                         "hamming": pa.array(dist[keep])})

    p = exploded.groupby(["__band", "__bucket"]).map_groups(pairs, batch_format="pyarrow")

    def dd(group: pa.Table) -> pa.Table:
        import pandas as pd

        return pa.Table.from_pandas(
            group.to_pandas().drop_duplicates(["id_a", "id_b"]),
            preserve_index=False,
        )

    return p.groupby(["id_a", "id_b"]).map_groups(dd, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH-bucketed)
# ---------------------------------------------------------------------------


def embedding_neardup(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                      threshold: float = 0.95, n_planes: int = 12, seed: int = 5):
    """Pairs with cosine similarity >= threshold.  Random-hyperplane LSH
    buckets (sign pattern over ``n_planes`` planes) + exact in-bucket cosine.
    Recall < 1 by construction (LSH); raise ``n_planes`` bands for recall."""

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64) \
            if batch.num_rows else np.empty((0, 1))
        rng = np.random.default_rng(seed)
        planes = rng.normal(size=(vecs.shape[1] if vecs.size else 1, n_planes))
        signs = (vecs @ planes > 0) if vecs.size else np.empty((0, n_planes), bool)
        bucket = np.zeros(len(vecs), dtype=np.uint64)
        for j in range(n_planes):
            bucket = (bucket << np.uint64(1)) | signs[:, j].astype(np.uint64)
        return batch.append_column("__bucket", pa.array(bucket, pa.uint64()))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        n = group.num_rows
        if n < 2 or n > 5000:
            if n > 5000:
                import logging

                logging.getLogger("featurebox_ray.dedup").warning(
                    "embedding LSH bucket over cap (%d rows) skipped", n)
            return empty
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        V = np.stack(group[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Vn = V / norms
        sim = Vn @ Vn.T
        ii, jj = np.triu_indices(n, 1)
        keep = sim[ii, jj] >= threshold
        return pa.table({"id_a": pa.array(ids[ii[keep]]),
                         "id_b": pa.array(ids[jj[keep]]),
                         "cosine": pa.array(sim[ii, jj][keep])})

    return bucketed.groupby("__bucket").map_groups(pairs, batch_format="pyarrow")
