"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB): every variant pre-reduces inside ``map_batches``
before any shuffle — the ``groupby`` only ever sees (key, doc_id) pairs or
band buckets, never document text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------- exact
def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per exact content hash.

    hash-partition (groupby md5) + per-group first — the guide's canonical
    exact-dedup shape.  Returns (kept_ids_ds) with columns (content_hash,
    doc_id).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in batch[col].to_pylist()
        ]
        return pa.Table.from_pydict(
            {"content_hash": hashes, id_col: batch[id_col]}
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
    )


# ---------------------------------------------------------------- shingles
def _shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingle set, hashed to 64-bit ints."""
    words = (text or "").lower().split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = set()
    for g in grams:
        # 63-bit so signatures fit int64 cleanly
        out.add(
            int.from_bytes(
                hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
            )
            >> 1
        )
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------- minhash
# Mersenne prime 2^31-1: with a, x < p the product stays < 2^62, so the
# universal-hash family (a*x + b) mod p vectorizes in plain int64 numpy
# (the 2^61-1 variant needs object-dtype bigints — measured 10x slower)
_MERSENNE = (1 << 31) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(len(a), _MERSENNE, dtype=np.int64)
    # fold 63-bit shingle hashes into the 31-bit field
    x = np.fromiter(shingles, dtype=np.int64, count=len(shingles)) % _MERSENNE
    # (a*x + b) mod p per permutation; vectorized over shingles x perms
    vals = (x[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


class MinHasher:
    """Actor: permutation params generated once; emits LSH band rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "band": [], "bucket": []}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = minhash_signature(_shingles(text, self.ngram), self.a, self.b)
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bucket = int.from_bytes(
                    hashlib.blake2b(seg.tobytes(), digest_size=8).digest(), "big"
                ) >> 1
                out["doc_id"].append(doc_id)
                out["band"].append(band)
                out["bucket"].append(bucket)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "band": pa.array(out["band"], pa.int32()),
                "bucket": pa.array(out["bucket"], pa.int64()),
            }
        )


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16, ngram: int = 3,
                       concurrency=4):
    """Candidate near-dup pairs via banded MinHash LSH.

    shingle -> minhash -> band rows -> groupby(band, bucket) -> pairs.
    Returns a Dataset of (doc_a, doc_b) with doc_a < doc_b, deduplicated.
    """

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(v) for v in group["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64)})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"doc_a": list(a), "doc_b": list(b)})

    from ray.data.aggregate import Count, Min

    bandrows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, ngram=ngram),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    ).materialize()
    # per-group python only for ACTUAL collisions: count per bucket first
    # (a C-speed aggregate — almost all buckets are singletons and never
    # reach a pandas group), then broadcast the collision-bucket keys as a
    # filter.  The final dedup of pairs is a Min aggregate, not map_groups.
    counts = bandrows.groupby(["band", "bucket"]).count()
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater(b["count()"], 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    if not hot:
        import ray.data as rd

        return rd.from_items([]).limit(0)
    hot_keys = pa.array(
        sorted((int(r["band"]) << 34) | int(r["bucket"]) % (1 << 34) for r in hot),
        type=pa.int64(),
    )

    def keep_hot(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        key = (band << 34) | (bucket % (1 << 34))
        return batch.filter(pc.is_in(pa.array(key), value_set=hot_keys))

    cand = (
        bandrows.map_batches(keep_hot, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bucket"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["doc_a", "doc_b"])
    )
    return cand


def verify_jaccard_pairs(cand_ds, docs_by_id: dict, threshold: float,
                         ngram: int = 3):
    """Exact-verify candidate pairs against the broadcast doc-text lookup."""

    class Verifier:
        def __init__(self, docs, threshold, ngram):
            self.sh = {k: _shingles(v, ngram) for k, v in docs.items()}
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep_a, keep_b, sims = [], [], []
            for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
                s = jaccard(self.sh.get(a, set()), self.sh.get(b, set()))
                if s >= self.threshold:
                    keep_a.append(a)
                    keep_b.append(b)
                    sims.append(s)
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array(keep_a, pa.int64()),
                    "doc_b": pa.array(keep_b, pa.int64()),
                    "jaccard": pa.array(sims, pa.float64()),
                }
            )

    return cand_ds.map_batches(
        Verifier,
        fn_constructor_kwargs=dict(
            docs=docs_by_id, threshold=threshold, ngram=ngram
        ),
        batch_format="pyarrow",
        concurrency=2,
    )


# ---------------------------------------------------------------- simhash
def simhash64(text: str, ngram: int = 2) -> int:
    """Classic 64-bit SimHash over word n-grams (Charikar 2002)."""
    words = (text or "").lower().split()
    grams = (
        [" ".join(words[i : i + ngram]) for i in range(max(len(words) - ngram + 1, 0))]
        or ([" ".join(words)] if words else [])
    )
    if not grams:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for g in grams:
        h = np.frombuffer(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), dtype=np.uint64
        )[0]
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch[col].to_pylist()]
    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    return batch.append_column("simhash", pa.array(signed, pa.int64()))


# ---------------------------------------------------------------- embedding
def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    concurrency=4,
):
    """Near-dup pairs by cosine similarity >= threshold.

    Scale path: random-hyperplane LSH bucket (sign sketch) -> groupby(bucket)
    -> exact cosine within bucket.  A pair is found iff the two vectors
    share at least one of the two probe buckets (bucket + its complement
    probe on the weakest plane) — documented recall<1 tradeoff; the exact
    variant for tests is brute force within groups.
    """
    class Bucketer:
        def __init__(self, n_planes, seed):
            self.n_planes = n_planes
            self.seed = seed
            self.planes = None  # built on first batch (needs the dim)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
            if self.planes is None:
                self.planes = np.random.default_rng(self.seed).standard_normal(
                    (vecs.shape[1], self.n_planes)
                )
            proj = vecs @ self.planes
            bits = (proj > 0).astype(np.int64)
            bucket = (bits << np.arange(self.n_planes, dtype=np.int64)).sum(axis=1)
            # multiprobe: also emit the bucket with the weakest bit flipped
            weakest = np.abs(proj).argmin(axis=1)
            probe = bucket ^ (1 << weakest.astype(np.int64))
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.concat_arrays(
                        [batch["vec_id"].combine_chunks()] * 2
                    ),
                    "bucket": pa.array(
                        np.concatenate([bucket, probe]), pa.int64()
                    ),
                    "embedding": pa.concat_arrays(
                        [batch["embedding"].combine_chunks()] * 2
                    ),
                }
            )

    def exact_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        uniq, first_idx = np.unique(ids, return_index=True)
        vecs = np.asarray(group["embedding"].iloc[first_idx].to_list(),
                          dtype=np.float64)
        if len(uniq) < 2:
            return pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                                 "vec_b": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ (vecs / norms).T
        ia, ib = np.triu_indices(len(uniq), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": np.minimum(uniq[ia[keep]], uniq[ib[keep]]),
                "vec_b": np.maximum(uniq[ia[keep]], uniq[ib[keep]]),
                "cosine": sims[ia, ib][keep],
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(
            Bucketer,
            fn_constructor_kwargs=dict(n_planes=n_planes, seed=seed),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby("bucket")
        .map_groups(exact_pairs, batch_format="pandas")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Max("cosine", alias_name="cosine"))
    )
