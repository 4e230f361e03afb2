"""Distributed clustering over an embedding column — the corpus-curation
step after dedup/ANN (topic bucketing, diversity sampling, IVF training).

The gated algorithm is **k-medians with L1 distance over quantized
embeddings**, chosen so the whole iteration is integer-exact and a DuckDB
oracle can mirror it bit for bit:

- quantize ``w = 2 * floor(1000 * e)`` (int64).  The factor 2 makes every
  coordinate even, so the median of any member set (DuckDB's
  lower/upper-average rule == ``np.median``) is always an INTEGER — no
  float drift across iterations.
- assignment: ``argmin_j sum_d |w_d - c_jd|`` (integer L1), ties to the
  smallest cluster id (numpy ``argmin`` first-occurrence == SQL
  ``row_number() ORDER BY dist, c``).
- update: per-(cluster, dim) median of members; empty clusters keep their
  previous centroid.

100-TB shape: each assignment pass is a pure vectorized ``map_batches``
(broadcast k x d centroid matrix — tiny, shipped per task); the update is
ONE ``groupby(cluster).map_groups`` whose per-group payload is that
cluster's vectors (documented partition assumption: a cluster's members
fit one task; for pathological cluster sizes swap the median in for the
value-histogram fold of ``functions/sample.quantiles_disc``).  Only the
k x d centroid table crosses to the driver between iterations — the
standard synchronous-iteration shape of distributed Lloyd/k-medians.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _quantized_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) int64 matrix ``2 * floor(1000 * e)`` via zero-copy flatten.

    Null/ragged embeddings raise (same contract as functions/ann.py)."""
    emb = batch[col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if emb.null_count:
        raise ValueError("null embedding rows are not supported")
    flat = pc.list_flatten(emb)
    vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(emb)
    if n == 0:
        return np.zeros((0, 0), np.int64)
    mat = vals.reshape(n, -1)
    return (2 * np.floor(1000.0 * mat)).astype(np.int64)


def _assign(w: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer L1 argmin, ties to the smallest cluster id.  Chunked over
    rows so the (rows, k, d) broadcast never exceeds ~32 MB."""
    n, d = w.shape
    k = len(centroids)
    out = np.empty(n, np.int64)
    dist = np.empty(n, np.int64)
    step = max(1, (32 << 20) // max(1, 8 * k * d))
    for s in range(0, n, step):
        block = w[s : s + step]
        dd = np.abs(block[:, None, :] - centroids[None, :, :]).sum(axis=2)
        out[s : s + step] = dd.argmin(axis=1)
        dist[s : s + step] = dd.min(axis=1)
    return out, dist


def kmedians(
    ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
    keep_vectors: bool = False,
):
    """Run ``iters`` assignment passes (with ``iters - 1`` median updates
    in between) and return a Dataset of (id, cluster, l1_dist)
    (+ the original embedding column when ``keep_vectors`` — saves the
    assignment->vector join for consumers that need both, e.g.
    semantic_dedup_pairs: Arrow hash joins reject list payloads anyway).

    Initial centroids are the quantized vectors of the k smallest ids —
    deterministic and partitioning-independent, so the DuckDB oracle can
    reproduce the whole run.
    """
    # k smallest ids WITHOUT a global sort: each batch keeps its own k
    # smallest (a combiner — bounded k rows per block cross to the
    # driver), then the driver merges the partials.
    def k_smallest(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k=min(k, batch.num_rows), sort_keys=[(id_col, "ascending")]
        )
        return batch.select([id_col, col]).take(idx)

    parts = ds.map_batches(
        k_smallest, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    parts.sort(key=lambda r: r[id_col])
    seed_rows = parts[:k]
    centroids = np.stack(
        [
            _quantized_matrix(pa.table({col: pa.array([r[col]])}), col)[0]
            for r in seed_rows
        ]
    )

    def assign_stage(cents: np.ndarray, with_vec: bool,
                     with_embedding: bool = False):
        def fn(batch: pa.Table) -> pa.Table:
            w = _quantized_matrix(batch, col)
            a, dist = _assign(w, cents)
            out = {
                id_col: batch[id_col],
                "cluster": pa.array(a, pa.int64()),
                "l1_dist": pa.array(dist, pa.int64()),
            }
            if with_vec:
                out["w"] = pa.array(list(w), pa.list_(pa.int64()))
            if with_embedding:
                out[col] = batch[col]
            return pa.table(out)

        return fn

    for it in range(iters - 1):
        assigned = ds.map_batches(
            assign_stage(centroids, with_vec=True),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def group_median(g: pa.Table) -> pa.Table:
            wcol = g["w"]
            if isinstance(wcol, pa.ChunkedArray):
                wcol = wcol.combine_chunks()
            flat = pc.list_flatten(wcol).to_numpy(zero_copy_only=False)
            mat = flat.astype(np.int64, copy=False).reshape(len(wcol), -1)
            med = np.median(mat, axis=0)
            return pa.table(
                {
                    "cluster": pa.array([int(g["cluster"][0].as_py())]),
                    "centroid": pa.array([med.astype(np.int64).tolist()],
                                         pa.list_(pa.int64())),
                }
            )

        rows = (
            assigned.groupby("cluster")
            .map_groups(group_median, batch_format="pyarrow")
            .take_all()
        )
        new_c = centroids.copy()  # empty clusters keep previous centroids
        for r in rows:
            new_c[int(r["cluster"])] = np.asarray(r["centroid"], np.int64)
        centroids = new_c

    return ds.map_batches(
        assign_stage(centroids, with_vec=False,
                     with_embedding=keep_vectors),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def signed_projection_batch(
    batch: pa.Table,
    out_dim: int = 16,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """JL-style dimensionality-reduction sketch with a DETERMINISTIC ±1
    sign matrix ``S[i, j] = 1 - 2*((((i+1)*(j+1)*2654435761) % 1000000007)
    % 2)`` (a product hash — parities of linear-term hashes collapse to
    low-rank structure; this one is full-rank and balanced, checked in
    tests) over the same
    x2-quantized integer embeddings as :func:`kmedians` — so the sketch
    is integer-exact and a DuckDB oracle can recompute every output
    coordinate (``SUM(w * sign)``) bit for bit.

    The sign matrix is closed-form (no trained state to broadcast); the
    batch work is ONE int64 matmul.  Output is the unnested long form
    (id, out_dim, value) so the gate's sorted-hash compare is
    schema-stable.  Pure map_batches — no shuffle at any scale.
    """
    w = _quantized_matrix(batch, col)
    n, d = w.shape if w.size else (batch.num_rows, 0)
    i = np.arange(d, dtype=np.int64)[:, None]
    j = np.arange(out_dim, dtype=np.int64)[None, :]
    signs = 1 - 2 * ((((i + 1) * (j + 1) * 2654435761) % 1000000007) % 2)
    y = w @ signs if d else np.zeros((n, out_dim), np.int64)
    ids = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), out_dim
    )
    ods = np.tile(np.arange(out_dim, dtype=np.int64), n)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "out_dim": pa.array(ods, pa.int64()),
            "value": pa.array(y.reshape(-1), pa.int64()),
        }
    )


def semantic_dedup_pairs(
    ds,
    threshold: float,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
    num_partitions: int = 8,
):
    """SemDeDup-style semantic near-dup search (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space first, then search
    cosine>=threshold pairs ONLY within each cluster — the approximate
    scale path that collapses all-pairs O(n^2) to sum_c O(n_c^2).

    Pairs that straddle a cluster boundary are missed BY DESIGN (the
    SemDeDup trade); ``functions/ann.blocked_cosine_pairs`` is the exact
    sibling when the budget allows it.  With k=1 the two plans coincide
    (pytest-pinned equivalence).

    100-TB shape: k-medians assignment passes are vectorized
    map_batches with a tiny broadcast centroid matrix; the final
    assignment pass carries the embedding along (``keep_vectors`` —
    no join, one fewer shuffle); the pair search is ONE
    groupby(cluster).map_groups
    with the same normalize+matmul+triu kernel as the exact plans.
    Partition assumption (documented, same as kmedians' update): one
    cluster's members fit one task — at web scale, raise k until they
    do (SemDeDup runs k ~ sqrt(n)).
    """
    from .ann import _embedding_matrix, _normalize

    joined = kmedians(
        ds, k=k, iters=iters, id_col=id_col, col=col, keep_vectors=True
    ).drop_columns(["l1_dist"])

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = _normalize(
            _embedding_matrix(
                group.select([col]).take(pa.array(order, pa.int64())), col
            )
        )
        sims = vecs @ vecs.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "vec_a": pa.array(ids[ia[keep]], pa.int64()),
                "vec_b": pa.array(ids[ib[keep]], pa.int64()),
                "cluster": pa.array(
                    np.full(int(keep.sum()),
                            int(group["cluster"][0].as_py()), np.int64)
                ),
            }
        )

    return joined.groupby("cluster").map_groups(
        pairs, batch_format="pyarrow"
    )


def gram_matrix(ds, col: str = "embedding", id_col: str = "vec_id"):
    """Distributed Gram / scatter matrix of the quantized embedding
    matrix — the accumulation step of PCA / whitening / covariance
    estimation over a corpus too large to collect.

    Returns a Dataset of upper-triangle entries ``(i, j, s)`` with
    ``s = sum_rows w_i * w_j`` over the x2-quantized int64 coordinates
    (same quantization as kmedians — integer-exact, so a DuckDB oracle
    can replay every entry).  The d x d result is tiny; the driver-side
    eigendecomposition (``pca_components``) is legitimately local.

    100-TB shape: each batch contributes ONE ``w.T @ w`` partial
    (vectorized int64 matmul) emitted as d(d+1)/2 rows -> ONE
    groupby((i, j)) Sum; shuffle volume = triangle-size x batches,
    never vectors.  Overflow headroom: |w| <= 2e3 for unit-normalized
    embeddings => |w_i w_j| <= 4e6; int64 holds ~2.3e12 such rows.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        w = _quantized_matrix(batch, col)
        if w.size == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        g = w.T @ w
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64), pa.int64()),
                "j": pa.array(ju.astype(np.int64), pa.int64()),
                "s": pa.array(g[iu, ju], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(["i", "j"]).aggregate(Sum("s", alias_name="s"))


def pca_components(gram_rows, d: int, k: int):
    """Driver-side tail of distributed PCA: rebuild the symmetric d x d
    Gram matrix from ``gram_matrix`` rows (a list of dicts or a small
    Dataset) and return the top-k eigenvectors (columns) by eigenvalue.
    The d x d matrix is a few KB — this is the one legitimately local
    step of the pipeline."""
    if hasattr(gram_rows, "take_all"):
        gram_rows = gram_rows.take_all()
    g = np.zeros((d, d), np.float64)
    for r in gram_rows:
        g[r["i"], r["j"]] = r["s"]
        g[r["j"], r["i"]] = r["s"]
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    return vals[order], vecs[:, order]


def hyperplane_signature_batch(
    batch: pa.Table,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """64-bit hyperplane sign signature per vector — bit j = 1 iff the
    signed-projection coordinate j is >= 0 (the :func:`signed_projection_batch`
    sketch extended to 64 deterministic ±1 planes; integer projections, so
    the >= 0 decision is exact and SQL-replicable).  Cosine-similar
    vectors agree on most planes (Charikar 2002), so the signature feeds
    the same banded hamming-LSH plan as SimHash/aHash."""
    w = _quantized_matrix(batch, col)
    n, d = w.shape if w.size else (batch.num_rows, 0)
    i = np.arange(d, dtype=np.int64)[:, None]
    j = np.arange(64, dtype=np.int64)[None, :]
    signs = 1 - 2 * ((((i + 1) * (j + 1) * 2654435761) % 1000000007) % 2)
    y = w @ signs if d else np.zeros((n, 64), np.int64)
    bits = (y >= 0).astype(np.uint64)
    sig = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table(
        {
            id_col: pc.cast(batch[id_col], pa.int64()),
            "hsig": pa.array(sig.view(np.int64), pa.int64()),
        }
    )


def hyperplane_lsh_near_dup(
    ds,
    threshold: float,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
    num_partitions: int = 8,
):
    """Embedding near-dup via DETERMINISTIC hyperplane LSH — the
    bit-reproducible scale path for candidate generation:

    1. 64-bit hyperplane sign signature per vector (one int64 matmul per
       batch, payload never shuffles);
    2. banded hamming-LSH candidates (``dedup.banded_hamming_candidates``
       — the certified SimHash plan, factored generic over any 64-bit
       signature);
    3. exact cosine verify: candidate pairs re-join the embedding table
       twice (slim hash joins bounded by the candidate count), keep
       cosine >= threshold.

    vs ``dedup.embedding_near_dup`` (random-plane buckets, seeded RNG):
    this plan is closed-form end to end, so a DuckDB oracle replays the
    signature, the banding AND the verify bit for bit.  Recall < 1 by
    design (pairs hamming-far in signature space are never examined) —
    the exact blocked plan remains the recall-1 path.
    ``num_partitions`` sizes the verify joins — raise to ~2x cluster
    cores on real clusters.
    """
    from .dedup import banded_hamming_candidates

    sig = ds.map_batches(
        lambda b: hyperplane_signature_batch(b, id_col=id_col, col=col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand = banded_hamming_candidates(
        sig, id_col=id_col, hash_col="hsig",
        max_hamming=max_hamming, bands=bands,
    )

    def as_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_a": pc.cast(batch["doc_a"], pa.int64()),
                "vec_b": pc.cast(batch["doc_b"], pa.int64()),
            }
        )

    # repartition: groupby-emitted zero-column empty blocks poison hash
    # joins (see dedup.chunk_dedup); the sentinel row keeps the join
    # inputs non-empty (Ray's hash join errors on a fully-empty side —
    # vec ids are non-negative, so (-1, -1) can never inner-match)
    import ray.data as rd

    sentinel = rd.from_arrow(
        pa.table({"vec_a": pa.array([-1], pa.int64()),
                  "vec_b": pa.array([-1], pa.int64())})
    )
    pairs = cand.map_batches(
        as_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(sentinel).repartition(num_partitions)

    def side(name):
        # Ray's hash join rejects list<> non-key fields — the vectors
        # ride the join as little-endian float64 BINARY payloads.
        def ren(batch: pa.Table) -> pa.Table:
            from .ann import _embedding_matrix

            if batch.num_rows == 0:
                return pa.table(
                    {name: pa.array([], pa.int64()),
                     f"emb_{name}": pa.array([], pa.binary())}
                )
            m = _embedding_matrix(batch, col)
            ids = (batch[id_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            payloads = [row.astype("<f8").tobytes() for row in m]
            return pa.table(
                {
                    name: pa.array(ids, pa.int64()),
                    f"emb_{name}": pa.array(payloads, pa.binary()),
                }
            )

        return ren

    def _side_sentinel(name):
        # ONE id=-1 sentinel row per side (unioned once, NOT per batch:
        # a per-batch sentinel cross-joins into O(batches^2) rows in the
        # sentinel's hash partition at corpus scale).  Empty payload —
        # verify drops sentinel rows before any matrix reshape.
        return rd.from_arrow(
            pa.table({name: pa.array([-1], pa.int64()),
                      f"emb_{name}": pa.array([b""], pa.binary())})
        )

    ea = ds.map_batches(side("vec_a"), batch_format="pyarrow",
                        zero_copy_batch=True).union(
                            _side_sentinel("vec_a")
                        ).repartition(num_partitions)
    eb = ds.map_batches(side("vec_b"), batch_format="pyarrow",
                        zero_copy_batch=True).union(
                            _side_sentinel("vec_b")
                        ).repartition(num_partitions)
    # repartition between the joins: a join emits schema-less empty
    # partitions that poison the NEXT join's left side
    joined = (
        pairs.join(ea, "inner", num_partitions, on=("vec_a",))
        .repartition(num_partitions)
        .join(eb, "inner", num_partitions, on=("vec_b",))
    )

    def _mat(colv) -> np.ndarray:
        flat = np.frombuffer(
            b"".join(colv.to_pylist() or [b""]), dtype="<f8"
        )
        return flat.reshape(len(colv), -1) if len(colv) else flat.reshape(0, 1)

    def verify(batch: pa.Table) -> pa.Table:
        # drop the (-1, -1) sentinel BEFORE matrix reshape: its payload
        # is empty binary, not a d-float vector
        if batch.num_rows:
            real = pa.array(
                batch["vec_a"].to_numpy(zero_copy_only=False) >= 0
            )
            batch = batch.filter(real)
        if batch.num_rows == 0:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()),
                 "vec_b": pa.array([], pa.int64())}
            )
        from .ann import _normalize

        a = _normalize(_mat(batch["emb_vec_a"].combine_chunks()))
        b = _normalize(_mat(batch["emb_vec_b"].combine_chunks()))
        cos = np.einsum("ij,ij->i", a, b)
        keep = pa.array(cos >= threshold)
        return pa.table(
            {
                "vec_a": batch["vec_a"].filter(keep),
                "vec_b": batch["vec_b"].filter(keep),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow",
                              zero_copy_batch=True)
