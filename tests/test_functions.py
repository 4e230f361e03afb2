"""Unit + pipeline tests for the training-data operators (functions/)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet").materialize()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet").materialize()


def test_langid_on_stopword_laden_text(ray_session):
    """Heuristic language ID on texts that actually carry language signal.

    (The testdata ``lang`` column is a random label over one shared
    vocabulary — language is NOT inferable from those texts, so the
    accuracy oracle lives on constructed sentences instead.)
    """
    import ray.data as rd

    from rioxarray_ray.functions import text

    samples = [
        ("en", "the cat sat on the mat and it is a good day for the dog"),
        ("de", "der hund und die katze sind nicht mit dem kind zu hause"),
        ("fr", "le chat est dans la maison et les enfants sont pour une fete"),
        ("es", "el perro y la casa es que los ninos van por una fiesta"),
        ("und", ""),
        ("und", "zx qv wq jj kk"),
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t, "lang": l} for i, (l, t) in enumerate(samples)]
    )
    pred = ds.map_batches(
        text.LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    ).to_pandas()
    pred = pred.sort_values("doc_id")
    assert list(pred["lang_pred"]) == [l for l, _ in samples]


def test_token_count_matches_python_split(docs_ds):
    from rioxarray_ray.functions import text

    out = docs_ds.map_batches(
        text.token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    ref = docs_ds.to_pandas()
    ref["expected"] = ref["text"].map(lambda t: len(t.split()))
    merged = out.merge(ref[["doc_id", "expected"]], on="doc_id")
    assert (merged["n_tokens"] == merged["expected"]).all()


def test_minhash_lsh_finds_near_duplicates(ray_session):
    """Inject true near-dups; LSH must recover them and the verify stage
    must reject dissimilar candidate pairs."""
    import ray.data as rd

    from rioxarray_ray.functions import dedup

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(60):
        words = list(rng.choice(vocab, size=80))
        docs.append({"doc_id": i, "text": " ".join(words)})
    # 61/62: near-dups of 0 (small perturbation)
    base = docs[0]["text"].split()
    docs.append({"doc_id": 61, "text": " ".join(base[:76] + ["x1", "x2", "x3", "x4"])})
    docs.append({"doc_id": 62, "text": " ".join(base)})  # exact dup
    ds = rd.from_items(docs)
    cand = dedup.minhash_candidates(ds, num_perm=64, bands=16).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand}
    assert (0, 62) in pairs  # exact dup always collides
    assert (0, 61) in pairs  # high-jaccard near dup
    verified = dedup.verify_jaccard_pairs(
        rd.from_items([{"doc_a": a, "doc_b": b} for a, b in sorted(pairs)]),
        ds,
        threshold=0.5,
        num_partitions=2,  # 2 joins x partitions aggregator actors must fit
    ).take_all()
    vp = {(r["doc_a"], r["doc_b"]) for r in verified}
    assert (0, 62) in vp and (0, 61) in vp
    # all surviving pairs really exceed the threshold
    for r in verified:
        assert r["jaccard"] >= 0.5


def test_simhash_similar_docs_close_hamming():
    from rioxarray_ray.functions.dedup import simhash64

    import numpy as np

    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(300)]
    base = list(rng.choice(vocab, size=120))
    a = " ".join(base)
    b = " ".join(base + ["novel", "suffix"])  # tiny perturbation
    c = " ".join(rng.choice(vocab, size=120))  # unrelated
    ham_ab = bin(simhash64(a) ^ simhash64(b)).count("1")
    ham_ac = bin(simhash64(a) ^ simhash64(c)).count("1")
    assert ham_ab < 10, ham_ab
    assert ham_ac > 20, ham_ac


def test_ivf_topk_recall(emb_ds):
    from rioxarray_ray.functions import ann

    df = emb_ds.to_pandas()
    qids = df["vec_id"].to_numpy()[:5]
    qvecs = np.asarray(df["embedding"].to_list(), dtype=np.float64)[:5]
    queries_ds = emb_ds.limit(5).materialize()
    exact = ann.topk_cosine(emb_ds, qids, qvecs, k=10, concurrency=2).to_pandas()
    approx = ann.ivf_topk(
        emb_ds, queries_ds, k=10, n_centroids=8, nprobe=4
    ).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls  # nprobe=4/8 buckets


def test_ivf_topk_exhaustive_probe_is_exact(emb_ds):
    """nprobe == n_centroids => every (query, vector) pair meets in exactly
    one bucket group: IVF output is bit-identical to the exact plan."""
    from rioxarray_ray.functions import ann

    df = emb_ds.to_pandas()
    qids = df["vec_id"].to_numpy()[:5]
    qvecs = np.asarray(df["embedding"].to_list(), dtype=np.float64)[:5]
    queries_ds = emb_ds.limit(5).materialize()
    exact = (
        ann.topk_cosine(emb_ds, qids, qvecs, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ivf = (
        ann.ivf_topk(emb_ds, queries_ds, k=10, n_centroids=8, nprobe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    cols = ["query_id", "vec_id", "rank"]
    assert exact[cols].equals(ivf[cols])


def test_exact_topk_self_is_rank_one(emb_ds):
    from rioxarray_ray.functions import ann

    df = emb_ds.to_pandas()
    qids = df["vec_id"].to_numpy()[:3]
    qvecs = np.asarray(df["embedding"].to_list(), dtype=np.float64)[:3]
    out = ann.topk_cosine(emb_ds, qids, qvecs, k=5, concurrency=2).to_pandas()
    for q in qids:
        top1 = out[(out["query_id"] == q) & (out["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == q


def test_embedding_lsh_pairs_superset_sanity(emb_ds, ray_session):
    """LSH pairs are a SUBSET of brute-force pairs (the verify stage is
    exact); on TRUE near-duplicates (cosine >= 0.95) the bucket recall is
    high.  (The testdata has no real near-dups — max pair cosine ~0.51 —
    so recall there is structurally low; that's the documented hyperplane
    math, not a bug.)"""
    import ray.data as rd

    from rioxarray_ray.functions import ann, dedup

    df = emb_ds.to_pandas()
    ids = df["vec_id"].to_numpy()
    vecs = np.asarray(df["embedding"].to_list(), dtype=np.float64)
    tau = 0.35
    exact = ann.exact_cosine_pairs(emb_ds, ids, vecs, threshold=tau).take_all()
    exact_pairs = {(r["vec_a"], r["vec_b"]) for r in exact}
    lsh = dedup.embedding_near_dup(emb_ds, threshold=tau, n_planes=8).take_all()
    lsh_pairs = {(r["vec_a"], r["vec_b"]) for r in lsh}
    assert lsh_pairs <= exact_pairs  # exactness of the verify stage

    # planted true near-dups: v and v + small noise
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 64))
    rows = []
    truth = set()
    for i, v in enumerate(base):
        rows.append({"vec_id": 2 * i, "embedding": list(v)})
        dup = v + 0.05 * rng.standard_normal(64)
        rows.append({"vec_id": 2 * i + 1, "embedding": list(dup)})
        truth.add((2 * i, 2 * i + 1))
    planted = rd.from_items(rows)
    found = dedup.embedding_near_dup(
        planted, threshold=0.9, n_planes=8
    ).take_all()
    found_pairs = {(r["vec_a"], r["vec_b"]) for r in found}
    recall = len(found_pairs & truth) / len(truth)
    assert recall >= 0.6, recall


def test_simhash_banded_candidates_certified(ray_session):
    """Banded SimHash: near-dup texts (small hamming) are found; the
    candidate set contains EVERY pair with hamming <= bands-1 (pigeonhole
    certification), verified against a brute-force hamming scan."""
    import ray.data as rd

    from rioxarray_ray.functions import dedup

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    for i in range(50):
        docs.append(
            {"doc_id": i, "text": " ".join(rng.choice(vocab, size=90))}
        )
    base = docs[0]["text"].split()
    docs.append({"doc_id": 61, "text": " ".join(base)})  # exact dup
    docs.append(
        {"doc_id": 62, "text": " ".join(base[:88] + ["zq1", "zq2"])}
    )  # tiny perturbation
    ds = rd.from_items(docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_candidates(ds, max_hamming=3).take_all()
    }
    assert got.get((0, 61)) == 0  # exact dup: identical signature
    # brute-force certification: every hamming<=3 pair must be present
    sigs = {
        d["doc_id"]: dedup.simhash64(d["text"]) for d in docs
    }
    ids = sorted(sigs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = (sigs[ids[i]] ^ sigs[ids[j]]).bit_count()
            if ham <= 3:
                assert (ids[i], ids[j]) in got, (ids[i], ids[j], ham)
                assert got[(ids[i], ids[j])] == ham
    # and nothing over the threshold leaks through
    assert all(h <= 3 for h in got.values())


def test_sessionize_plans_agree_on_boundaries_and_ties(ray_session):
    """The single-pass and the two-phase (skew-safe) sessionize plans
    produce identical sessions on a corpus engineered with: sessions
    spanning a time-bucket boundary, gaps exactly AT the threshold (same
    session: the split is strictly >), and equal-timestamp ties."""
    import pandas as pd
    import ray.data as rd

    from rioxarray_ray.functions import events

    base = pd.Timestamp("2024-03-01 00:50:00")
    rows = []
    eid = 0

    def add(user, ts):
        nonlocal eid
        rows.append({"event_id": eid, "ts": ts, "user_id": user})
        eid += 1

    # user A: a session straddling the 01:00 bucket boundary (bucket_hours=1)
    for m in (0, 9, 18, 27):  # 00:50 .. 01:17, gaps 9 min
        add("A", base + pd.Timedelta(minutes=m))
    # then a gap of exactly 30 min (same session), then 31 min (new session)
    add("A", base + pd.Timedelta(minutes=57))
    add("A", base + pd.Timedelta(minutes=88))
    # user B: equal-timestamp ties
    t = pd.Timestamp("2024-03-02 12:00:00")
    add("B", t)
    add("B", t)
    add("B", t + pd.Timedelta(minutes=40))
    ds = rd.from_items(rows)

    def canon(out):
        return sorted(
            (r["user_id"], r["session_id"], r["n_events"],
             r["first_event"], r["last_event"])
            for r in out
        )

    single = canon(events.sessionize(ds, gap_minutes=30).take_all())
    scalable = canon(
        events.sessionize_scalable(
            ds, gap_minutes=30, bucket_hours=1
        ).take_all()
    )
    assert single == scalable
    # user A: 5 events in session 0 (30-min gap does NOT split), 1 in s1
    a = [s for s in single if s[0] == "A"]
    assert [(s[1], s[2]) for s in a] == [(0, 5), (1, 1)]
    b = [s for s in single if s[0] == "B"]
    assert [(s[1], s[2]) for s in b] == [(0, 2), (1, 1)]


def test_simhash_pair_hamming_is_unsigned(ray_session):
    """Bit-63 differences must not poison the hamming popcount (signed
    int64 storage): two texts whose signatures differ in the top bit still
    pair up when the true hamming is small."""
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions import dedup

    # find a text whose simhash has bit 63 set, then a near-dup of it
    rng = np.random.default_rng(29)
    vocab = [f"t{i}" for i in range(300)]
    base = None
    for _ in range(200):
        cand = " ".join(rng.choice(vocab, size=100))
        if dedup.simhash64(cand) >> 63:
            base = cand
            break
    assert base is not None
    near = " ".join(base.split()[:98] + ["xx1", "xx2"])
    true_ham = (dedup.simhash64(base) ^ dedup.simhash64(near)).bit_count()
    ds = rd.from_items(
        [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": near}]
    )
    # bands=16 keeps the pigeonhole certification valid for max_hamming=10
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_candidates(
            ds, max_hamming=10, bands=16
        ).take_all()
    }
    if true_ham <= 10:
        assert got.get((0, 1)) == true_ham

    # max_hamming beyond the certification bound is rejected loudly
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_candidates(ds, max_hamming=10, bands=4)


def test_md5_gram_twins_match_duckdb_oracles(ray_session):
    """Driver-gate rehearsal for the md5-gram oracle twins: run each
    ``q_dedup_*_md5`` Ray pipeline at sf0.001 and its ``oracle_sql()``
    DuckDB mirror on the same parquet — row sets must match exactly
    (signatures, LSH band buckets, candidate pairs are all replicated
    bit-for-bit by the SQL)."""
    import duckdb
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_test", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    oracles = mod.oracle_sql()
    qs = mod.queries()
    for name in ("dedup_minhash_md5", "dedup_simhash_md5",
                 "dedup_simhash_pairs_md5"):
        got = qs[name](SF).to_pandas()
        want = con.execute(oracles[name]).df()
        got_set = set(map(tuple, got[sorted(got.columns)].itertuples(index=False)))
        want_set = set(map(tuple, want[sorted(want.columns)].itertuples(index=False)))
        assert got_set == want_set, (
            f"{name}: ray={len(got_set)} oracle={len(want_set)} rows; "
            f"ray-only={sorted(got_set - want_set)[:3]} "
            f"oracle-only={sorted(want_set - got_set)[:3]}"
        )


def test_minhash_md5_mode_same_pipeline_recall(ray_session):
    """The md5 twin runs the SAME LSH pipeline as the fast mode — planted
    exact/near dups must be recovered identically."""
    import ray.data as rd

    from rioxarray_ray.functions import dedup

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(40):
        docs.append(
            {"doc_id": i, "text": " ".join(rng.choice(vocab, size=80))}
        )
    base = docs[0]["text"].split()
    docs.append({"doc_id": 41, "text": " ".join(base[:77] + ["x1", "x2", "x3"])})
    docs.append({"doc_id": 42, "text": " ".join(base)})
    ds = rd.from_items(docs)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(
            ds, num_perm=64, bands=16, gram_hash="md5"
        ).take_all()
    }
    assert (0, 42) in pairs and (0, 41) in pairs


def test_connected_components_chain_cycle_singleton(ray_session):
    """Label propagation must handle a chain (diameter > 1), a cycle, and
    isolated nodes; cluster id = min doc id in the component."""
    import ray.data as rd

    from rioxarray_ray.functions import dedup

    # components: {1,2,3,4} chain, {10,11,12} cycle, {20} and {21} singletons
    pairs = rd.from_items([
        {"doc_a": 3, "doc_b": 4}, {"doc_a": 2, "doc_b": 3},
        {"doc_a": 1, "doc_b": 2},
        {"doc_a": 10, "doc_b": 11}, {"doc_a": 11, "doc_b": 12},
        {"doc_a": 10, "doc_b": 12},
    ])
    nodes = rd.from_items(
        [{"doc_id": i} for i in (1, 2, 3, 4, 10, 11, 12, 20, 21)]
    )
    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in dedup.connected_components(pairs, nodes).take_all()}
    assert {k: v[0] for k, v in out.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 21
    }
    assert sorted(k for k, v in out.items() if v[1]) == [1, 10, 20, 21]


def test_connected_components_long_chain_pointer_jumping(ray_session):
    """A 200-link duplicate chain (diameter 200) must converge inside the
    50-round cap — only possible with the label <- label[label] pointer
    jump (O(log diameter) rounds); plain min propagation needs one round
    per link and would return WRONG labels here."""
    import ray.data as rd

    from rioxarray_ray.functions import dedup

    n = 200
    pairs = rd.from_items(
        [{"doc_a": i, "doc_b": i + 1} for i in range(n - 1)]
    )
    nodes = rd.from_items([{"doc_id": i} for i in range(n)])
    out = dedup.connected_components(
        pairs, nodes, num_partitions=4).take_all()
    assert len(out) == n
    assert all(r["cluster_id"] == 0 for r in out)
    assert sorted(r["doc_id"] for r in out if r["keep"]) == [0]


def test_md5_hex_column_zero_copy_equals_hashlib():
    """The buffer-sliced md5 path must equal per-row str-encode hashing on
    nulls, empties, non-ASCII, chunk boundaries, slices and large_string."""
    import hashlib

    import pyarrow as pa

    from rioxarray_ray.functions.dedup import _md5_hex_column

    vals = ["hello", None, "", "héllo wörld", "x" * 10000, "a", None]
    expect = [hashlib.md5((v or "").encode()).hexdigest() for v in vals]
    chunked = pa.chunked_array([vals[:3], vals[3:]])
    assert _md5_hex_column(chunked) == expect
    sliced = pa.array(vals).slice(1, 4)  # non-zero offset, includes a null
    assert _md5_hex_column(sliced) == expect[1:5]
    assert _md5_hex_column(pa.array(vals, pa.large_string())) == expect


def test_hash_sample_deterministic_across_partitioning(ray_session):
    """Sample membership depends only on (seed, key): identical kept sets
    across block counts, disjoint-ish across seeds, rate ~ requested."""
    import ray.data as rd

    from rioxarray_ray.functions.sample import hash_sample

    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(1000)]

    def kept(nblocks, seed=3):
        ds = rd.from_items(rows).repartition(nblocks)
        return sorted(
            r["doc_id"] for r in hash_sample(
                ds, rate_permille=300, seed=seed).take_all()
        )

    a, b = kept(1), kept(13)
    assert a == b
    assert 230 <= len(a) <= 370  # ~300 of 1000, loose binomial bounds
    other = kept(1, seed=4)
    assert other != a  # different seed -> different membership


def test_token_topk_counts_and_tiebreak(ray_session):
    import ray.data as rd

    from rioxarray_ray.functions.text import token_topk

    ds = rd.from_items(
        [
            {"text": "apple banana apple Cherry"},
            {"text": "banana! cherry; apple"},
            {"text": "date"},
        ]
    ).repartition(3)
    rows = token_topk(ds, k=3).take_all()
    got = [(r["token"], r["cnt"]) for r in rows]
    # apple x3; banana/cherry x2 tie -> banana first (token asc)
    assert got == [("apple", 3), ("banana", 2), ("cherry", 2)]


def test_asof_join_semantics_and_partition_invariance(ray_session):
    """Latest right row <= left ts per key; equal-ts ties -> max tie col;
    left rows with no prior right row drop; output is identical across
    block counts (the determinism contract)."""
    import numpy as np
    import ray.data as rd

    from rioxarray_ray.functions.asof import asof_join

    ev = [
        {"event_id": 1, "user_id": 10, "ts": np.datetime64("2024-01-05", "us")},
        {"event_id": 2, "user_id": 10, "ts": np.datetime64("2024-01-02", "us")},
        {"event_id": 3, "user_id": 20, "ts": np.datetime64("2024-01-01", "us")},
        {"event_id": 4, "user_id": 30, "ts": np.datetime64("2024-01-09", "us")},
        {"event_id": 5, "user_id": 10, "ts": np.datetime64("2024-01-04", "us")},
    ]
    od = [
        {"okey": 100, "custkey": 10, "odate": np.datetime64("2024-01-01", "us")},
        {"okey": 101, "custkey": 10, "odate": np.datetime64("2024-01-04", "us")},
        {"okey": 102, "custkey": 10, "odate": np.datetime64("2024-01-04", "us")},
        {"okey": 103, "custkey": 20, "odate": np.datetime64("2024-02-01", "us")},
    ]

    def run(nblocks):
        out = asof_join(
            rd.from_items(ev).repartition(nblocks),
            rd.from_items(od).repartition(nblocks),
            key=("user_id", "custkey"), left_ts="ts", right_ts="odate",
            left_cols=["event_id"], right_cols=["okey"], right_tie="okey",
        ).take_all()
        return sorted((r["event_id"], r["okey"]) for r in out)

    got = run(1)
    # ev1 Jan5 -> tie at Jan4 broken by max okey=102; ev2 Jan2 -> 100;
    # ev5 exactly ON Jan4 -> inclusive match, 102; ev3/ev4 drop
    assert got == [(1, 102), (2, 100), (5, 102)]
    assert run(5) == got


def test_quantiles_disc_matches_sorted_positions(ray_session):
    import math

    import ray.data as rd

    from rioxarray_ray.functions.sample import quantiles_disc

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # n=11, with duplicates
    ds = rd.from_items([{"v": v} for v in vals]).repartition(4)
    out = quantiles_disc(ds, "v", qs=(0.0, 0.5, 0.9, 1.0)).to_pylist()
    svals = sorted(vals)
    for r in out:
        pos = max(1, math.ceil(r["q"] * len(vals)))
        assert r["value"] == svals[pos - 1], r


def test_stratified_sample_partition_invariant(ray_session):
    """Same sample regardless of block layout; exactly n per group (or
    the whole group when smaller); combiner partials never exceed n per
    group per batch."""
    import ray.data as rd

    from rioxarray_ray.functions import sample

    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3]} for i in range(90)
    ] + [{"doc_id": 1000, "lang": "tiny"}]
    a = rd.from_items(rows, override_num_blocks=1)
    b = rd.from_items(rows[::-1], override_num_blocks=13)

    def key_set(ds):
        out = sample.stratified_sample(
            ds, group_col="lang", n_per_group=4, key_col="doc_id", seed=3
        ).take_all()
        got = {}
        for r in out:
            got.setdefault(r["lang"], set()).add(r["doc_id"])
        return got

    ga, gb = key_set(a), key_set(b)
    assert ga == gb
    assert all(len(v) == 4 for k, v in ga.items() if k != "tiny")
    assert ga["tiny"] == {1000}

    # membership matches the documented rule exactly
    from rioxarray_ray.functions.sample import rank_u64
    import pyarrow as pa

    for lang in ("en", "de", "fr"):
        ids = [r["doc_id"] for r in rows if r["lang"] == lang]
        u = rank_u64(pa.array(ids), seed=3)
        expect = {i for _, i in sorted(zip(u, ids))[:4]}
        assert ga[lang] == expect


def test_topk_per_group_partition_invariant_and_ties(ray_session):
    """Combiner top-k == brute force regardless of block layout; repeated
    order values break ties by the tiebreak column; NaN orders last."""
    import math

    import ray.data as rd

    from rioxarray_ray.functions import agg

    rows = []
    for i in range(60):
        rows.append({"g": i % 4, "id": i, "v": float(i % 7)})
    rows.append({"g": 0, "id": 999, "v": math.nan})
    a = rd.from_items(rows, override_num_blocks=1)
    b = rd.from_items(rows[::-1], override_num_blocks=11)

    def got(ds):
        out = agg.topk_per_group(
            ds, group_col="g", order_col="v", k=3,
            descending=True, tiebreak_col="id",
        ).take_all()
        res = {}
        for r in out:
            res.setdefault(r["g"], []).append((r["v"], r["id"]))
        return {k: sorted(v, key=lambda t: (-t[0], t[1])) for k, v in res.items()}

    ga, gb = got(a), got(b)
    assert ga == gb
    for g in range(4):
        members = sorted(
            ((r["v"], r["id"]) for r in rows
             if r["g"] == g and not math.isnan(r["v"])),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        assert ga[g] == members  # NaN row never displaces a real value


def test_repetition_batch_dup_lines_and_bigrams():
    """Hand-computed oracle on multi-line docs (the gate corpus is
    single-line, so duplicate-line semantics are pinned here)."""
    import pyarrow as pa

    from rioxarray_ray.functions.text import repetition_batch

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "aa\nbb\naa\ncc\nbb\naa",      # aa x3, bb x2, cc x1
                "",                             # one empty line
                None,                           # null -> like empty
                "x y x y x\nz",                 # bigram 'x y' x2
            ],
        }
    )
    out = repetition_batch(docs)
    assert out["n_lines"].to_pylist() == [6, 1, 1, 2]
    assert out["n_distinct_lines"].to_pylist() == [3, 1, 1, 2]
    # doc 1: 6 lines x 2 chars = 12 total; distinct chars = 6; dup = 6
    assert out["line_chars"].to_pylist() == [12, 0, 0, 10]
    assert out["dup_line_chars"].to_pylist() == [6, 0, 0, 0]
    # doc 1 bigrams (per line-agnostic token stream incl. '\n' as split):
    # aa bb / bb aa / aa cc / cc bb / bb aa -> 'bb aa' x2 top
    assert out["top_bigram_count"].to_pylist() == [2, 0, 0, 2]
    assert out["n_bigrams"].to_pylist() == [5, 0, 0, 5]


def test_repetition_batch_matches_duckdb_on_multiline():
    """Cross-check every column against the gate's SQL on a corpus WITH
    newlines (deterministic synthetic, seeds the dup-line branch)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from rioxarray_ray.functions.text import repetition_batch

    rng = np.random.default_rng(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = []
    for _ in range(60):
        lines = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 5)))
            for _ in range(rng.integers(1, 7))
        ]
        # force duplicates in ~half the docs
        if rng.random() < 0.5 and lines:
            lines += [lines[0]] * int(rng.integers(1, 3))
        texts.append("\n".join(lines))
    docs = pa.table({"doc_id": list(range(60)), "text": texts})

    got = repetition_batch(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    import __ray_entry__ as entrymod

    sql = entrymod.oracle_sql()["text_repetition"]
    want = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
    for col in ["n_lines", "n_distinct_lines", "line_chars",
                "dup_line_chars", "top_bigram_count", "n_bigrams"]:
        assert got[col].to_pylist() == want[col].tolist(), col


def test_doc_frequency_and_rarest_term(ray_session):
    """df counts distinct docs (not occurrences); rarest-term tie breaks
    lexicographically; both partition-invariant."""
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions.text import doc_frequency, rarest_term

    docs = pa.table(
        {
            "doc_id": [10, 20, 30],
            "text": [
                "apple apple banana",
                "banana cherry",
                "apple zebra zebra",
            ],
        }
    )
    for nblocks in (1, 3):
        ds = rd.from_arrow(docs).repartition(nblocks)
        dfres = {
            r["token"]: (r["tf"], r["df"])
            for r in doc_frequency(ds).take_all()
        }
        assert dfres == {
            "apple": (3, 2), "banana": (2, 2),
            "cherry": (1, 1), "zebra": (2, 1),
        }
        rare = {
            r["doc_id"]: (r["token"], r["df"])
            for r in rarest_term(ds, num_partitions=2).take_all()
        }
        # doc 10: apple/banana both df=2 -> lexicographic 'apple'
        assert rare == {
            10: ("apple", 2), 20: ("cherry", 1), 30: ("zebra", 1),
        }


def test_ahash64_integer_rule_and_locality():
    """Hash matches a scalar python mirror of the cross-multiplication
    rule; one flipped pixel moves at most a couple of bits."""
    import numpy as np

    from rioxarray_ray.functions.multimodal import ahash64

    i = np.arange(256, dtype=np.int64)
    v = (7 * 53 + i * i) % 256
    arr = v.reshape(1, 16, 16).astype(np.uint8)
    got = int(ahash64(arr))

    gray = arr[0].astype(int)
    total = gray.sum()
    bits = 0
    for br in range(8):
        for bc in range(8):
            bs = gray[2 * br:2 * br + 2, 2 * bc:2 * bc + 2].sum()
            if bs * 256 > total * 4:
                bits |= 1 << (br * 8 + bc)
    want = bits - (1 << 64) if bits >= (1 << 63) else bits
    assert got == want

    v2 = v.copy()
    v2[37] = (v2[37] + 128) % 256
    h2 = int(ahash64(v2.reshape(1, 16, 16).astype(np.uint8)))
    ham = bin((got ^ h2) & (2 ** 64 - 1)).count("1")
    assert ham <= 2  # single-pixel flips move at most a couple of bits

    with pytest.raises(ValueError):
        ahash64(np.zeros((1, 4, 4), np.uint8))


def test_image_near_dup_finds_planted_png_pairs(ray_session):
    """End-to-end: real PNG encode -> decode -> aHash -> banded hamming
    LSH catches every planted near-identical image pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions.multimodal import image_near_dup
    from rioxarray_ray.kernels.png import encode_png

    rng = np.random.default_rng(3)
    payloads, ids = [], []
    for base in range(6):
        img = rng.integers(0, 256, size=(1, 16, 16), dtype=np.uint8)
        twin = img.copy()
        twin[0, 0, 0] ^= 4  # tiny perturbation
        payloads += [encode_png(img), encode_png(twin)]
        ids += [base * 2, base * 2 + 1]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    ).repartition(3)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_near_dup(media, max_hamming=3, bands=4).take_all()
    }
    for base in range(6):
        assert (base * 2, base * 2 + 1) in pairs
        assert pairs[(base * 2, base * 2 + 1)] <= 3


def test_redact_batch_counts_and_rewrite():
    """PII rules fire in order (email -> ip -> phone) with exact counts;
    replacement text is verified literally on a hand case."""
    import pyarrow as pa

    from rioxarray_ray.functions.text import redact_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "mail bob.smith+x@corp-mail.co.uk call +1 (555) 123-4567",
                    "hosts 8.8.8.8 and 1.2.3.4 but not1.2.3.4x",
                    None,
                    "a@b.io c@d.com +44 20 7946 0958 10.0.0.1",
                ],
                pa.string(),
            ),
        }
    )
    out = redact_batch(t)
    assert out["n_email"].to_pylist() == [1, 0, 0, 2]
    assert out["n_ip"].to_pylist() == [0, 2, 0, 1]
    assert out["n_phone"].to_pylist() == [1, 0, 0, 1]
    assert out["clean"].to_pylist()[0] == "mail <EMAIL> call <PHONE>"
    assert out["clean"].to_pylist()[1] == "hosts <IP> and <IP> but not1.2.3.4x"
    assert (
        out["clean"].to_pylist()[3] == "<EMAIL> <EMAIL> <PHONE> <IP>"
    )


def test_decontaminator_flags_ngram_overlap():
    """5-gram overlap vs a benchmark doc: full self-hit, partial hit on a
    shared window, zero for unrelated/short/null docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from rioxarray_ray.functions.text import Decontaminator, _gram_windows

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a benchmark question about the quick brown fox jumps high",
        "totally unrelated content here with many words indeed",
        None,
        "short text",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    bg, _ = _gram_windows(pa.array([texts[0]], pa.string()), 5)
    res = Decontaminator(pc.unique(bg), n=5)(t)
    assert res["n_grams"].to_pylist() == [5, 6, 4, 0, 0]
    assert res["n_contaminated"].to_pylist() == [5, 1, 0, 0, 0]
    assert res["contaminated"].to_pylist() == [1, 1, 0, 0, 0]


def test_kmedians_partition_invariant_and_integer_exact(ray_session):
    """k-medians assignments are independent of input partitioning, and a
    tight hand case pins seeds, L1 tie-break and the median update."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions.cluster import kmedians

    rng = np.random.default_rng(11)
    n, d, k = 120, 6, 3
    centers = rng.normal(0, 5, size=(k, d))
    vecs = (centers[np.arange(n) % k] + rng.normal(0, 0.3, size=(n, d)))
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    res = {}
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        out = kmedians(ds, k=k, iters=2).take_all()
        res[parts] = {r["vec_id"]: (r["cluster"], r["l1_dist"]) for r in out}
    assert res[1] == res[7]
    # planted structure recovered: members of one planted center agree
    by_plant = {}
    for i in range(n):
        by_plant.setdefault(i % k, set()).add(res[1][i][0])
    assert all(len(s) == 1 for s in by_plant.values())
    # distances are integers in the doubled-quantized space (even coords)
    assert all(isinstance(v[1], int) for v in res[1].values())


def test_chunk_batch_geometry_and_content():
    """Chunk boundaries follow [i*stride, i*stride+size) with the final
    chunk clipped; every non-empty doc yields >= 1 chunk; md5 content is
    pinned on a hand case."""
    import hashlib

    import pyarrow as pa

    from rioxarray_ray.functions.text import chunk_batch

    # letter-only words: digits are separators under the [a-z']+ rule
    words = ["w" + chr(ord("a") + i // 26) + chr(ord("a") + i % 26)
             for i in range(50)]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([" ".join(words), "only three words", None,
                              "x"], pa.string()),
        }
    )
    out = chunk_batch(t, size=32, overlap=8)
    rows = out.to_pylist()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: m=50 -> ceil(max(42,1)/24)=2 chunks: [0,32) and [24,50)
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[0]] == [
        (0, 32), (24, 50)
    ]
    assert by_doc[0][1]["chunk_md5"] == hashlib.md5(
        " ".join(words[24:50]).encode()
    ).hexdigest()
    # doc 1: one clipped chunk covering all 3 tokens
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[1]] == [(0, 3)]
    # null doc -> no chunks; single-token doc -> one chunk
    assert 2 not in by_doc
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[3]] == [(0, 1)]


def test_signed_projection_full_rank_and_linear():
    """The product-hash sign matrix is full-rank and balanced (a linear
    parity would collapse to a checkerboard), and the sketch is linear in
    the quantized embedding."""
    import numpy as np
    import pyarrow as pa

    from rioxarray_ray.functions.cluster import signed_projection_batch

    d, r = 64, 16
    i = np.arange(d, dtype=np.int64)[:, None]
    j = np.arange(r, dtype=np.int64)[None, :]
    S = 1 - 2 * ((((i + 1) * (j + 1) * 2654435761) % 1000000007) % 2)
    assert np.linalg.matrix_rank(S.astype(float)) == r
    assert abs(S.mean()) < 0.1

    rng = np.random.default_rng(5)
    a = rng.normal(size=d).astype(np.float32)
    b = rng.normal(size=d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([a.tolist(), b.tolist()],
                                  pa.list_(pa.float32())),
        }
    )
    out = signed_projection_batch(t).to_pandas()
    wa = (2 * np.floor(1000.0 * a.astype(np.float64))).astype(np.int64)
    ya = out[out.vec_id == 0].sort_values("out_dim")["value"].to_numpy()
    np.testing.assert_array_equal(ya, wa @ S)


# ---------------------------------------------------------------------------
# audio frame features / video scene cut
# ---------------------------------------------------------------------------


def test_audio_features_known_waveform(ray_session):
    """Alternating +-A waveform: every 256-frame has energy 256*A^2,
    zc 255, peak A; frames index by hop 128; per-channel split honored."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import wav

    n = 1024
    a = 700
    x = np.tile([a, -a], n // 2).astype(np.int16)
    stereo = np.stack([x, -x])  # ch1 is the inverse — same features
    payload = wav.encode_wav(stereo, 8000)
    ds = rd.from_items([{"media_id": "m0", "payload": payload}])
    rows = multimodal.audio_features_stage(ds, frame=256, hop=128).take_all()
    # 2 channels x (1 + (1024-256)//128) = 2 x 7 frames
    assert len(rows) == 14
    for r in rows:
        assert r["energy"] == 256 * a * a
        assert r["zero_crossings"] == 255
        assert r["peak"] == a
    assert {r["channel"] for r in rows} == {0, 1}
    assert {r["frame_index"] for r in rows} == set(range(7))


def test_audio_features_zero_samples_never_cross(ray_session):
    """Zeros break sign runs: +A 0 -A has NO strict crossing."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import wav

    x = np.zeros(256, dtype=np.int16)
    x[0::3] = 100
    x[2::3] = -100  # pattern +,0,-,+,0,-,... no adjacent sign flip
    payload = wav.encode_wav(x[None, :], 8000)
    ds = rd.from_items([{"media_id": "m0", "payload": payload}])
    rows = multimodal.audio_features_stage(ds, frame=256, hop=256).take_all()
    assert len(rows) == 1
    # crossings only at (-100, +100) boundaries: x[2]=-100, x[3]=+100, ...
    neg_then_pos = sum(
        1 for i in range(255) if x[i] * x[i + 1] < 0
    )
    assert rows[0]["zero_crossings"] == neg_then_pos


def test_scene_cut_sad_and_threshold(ray_session):
    """Hand-built 3-frame video: SAD computed per consecutive pair, cut
    flag respects the threshold strictly (>)."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import avi

    f0 = np.zeros((3, 8, 8), dtype=np.uint8)
    f1 = f0 + 2          # SAD = 2*192 = 384
    f2 = f1.copy()
    f2[0, 0, 0] = 255    # SAD = 253
    frames = np.stack([f0, f1, f2])
    payload = avi.encode_avi(frames, fps=5.0)
    ds = rd.from_items([{"media_id": "v0", "payload": payload}])
    rows = sorted(
        multimodal.scene_cut_stage(ds, threshold=300).take_all(),
        key=lambda r: r["frame_index"],
    )
    assert [(r["frame_index"], r["sad"], r["is_cut"]) for r in rows] == [
        (1, 384, 1),
        (2, 253, 0),
    ]


def test_scene_cut_foreign_format_raises(ray_session):
    import ray.data as rd

    from rioxarray_ray.functions import multimodal

    ds = rd.from_items([{"media_id": "v0", "payload": b"\x00\x01notavi"}])
    with pytest.raises(Exception) as ei:
        multimodal.scene_cut_stage(ds).take_all()
    assert "NotImplementedError" in str(ei.typename) or "decoder" in str(
        ei.value
    )


def test_tfidf_search_scoring_and_ties(ray_session):
    """Integer tf-idf surrogate: hand-built corpus where rare-term docs
    outrank common-term docs; ties break to the smaller doc_id."""
    import ray.data as rd

    from rioxarray_ray.functions import text

    docs = [
        {"doc_id": 0, "text": "apple apple banana"},   # tf(a)=2, tf(b)=1
        {"doc_id": 1, "text": "apple cherry"},          # tf(a)=1
        {"doc_id": 2, "text": "banana banana banana"},  # tf(b)=3
        {"doc_id": 3, "text": "cherry only here"},      # no query terms
        {"doc_id": 4, "text": "apple cherry"},          # tie with doc 1
    ]
    ds = rd.from_items(docs)
    out = sorted(
        text.tfidf_search(ds, terms=("apple", "banana"), k=3).take_all(),
        key=lambda r: (-r["score"], r["doc_id"]),
    )
    # N=5; df(apple)=3 -> w=1666; df(banana)=2 -> w=2500
    # doc0: 2*1666 + 1*2500 = 5832; doc2: 3*2500 = 7500; doc1/4: 1666
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (2, 7500), (0, 5832), (1, 1666),
    ]
    # k larger than hits: doc 3 (score 0) never appears; tie 1-vs-4 -> 1 first
    all_rows = sorted(
        text.tfidf_search(ds, terms=("apple", "banana"), k=10).take_all(),
        key=lambda r: (-r["score"], r["doc_id"]),
    )
    assert [r["doc_id"] for r in all_rows] == [2, 0, 1, 4]


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------


def test_hll_registers_match_single_process_and_merge(ray_session):
    """Distributed register table == single-pass sketch over the same
    values regardless of partitioning (merge-by-max correctness), and
    the estimate lands within 5 sigma of the true cardinality."""
    import ray.data as rd

    from rioxarray_ray.functions import sketch

    n_distinct = 20000
    vals = np.arange(n_distinct, dtype=np.int64) * 7919  # distinct keys
    dup = np.concatenate([vals, vals[::3], vals[::7]])   # repeats
    ds = rd.from_arrow(pa.table({"k": pa.array(dup)})).repartition(16)
    rows = sketch.hll_registers(ds, "k", p=12).take_all()

    ref = sketch.hll_partial(pa.chunked_array(
        [pa.array(dup)]).combine_chunks(), 12)
    ref_map = dict(zip(ref["register"].to_pylist(), ref["rho"].to_pylist()))
    got_map = {r["register"]: r["rho"] for r in rows}
    assert got_map == ref_map

    est = sketch.hll_estimate(rows, p=12)
    sigma = 1.04 / np.sqrt(4096) * n_distinct
    assert abs(est - n_distinct) < 5 * sigma


def test_hll_rho_rule():
    """rho = leading zeros of the (64-p)-bit suffix + 1, pinned on
    hand-picked hashes via the md5 convention."""
    import hashlib

    from rioxarray_ray.functions import sketch

    t = sketch.hll_partial(pa.array(["123"]), 12)
    hv = int.from_bytes(hashlib.md5(b"123").digest()[:8], "little")
    assert t["register"][0].as_py() == hv % 4096
    w = hv >> 12
    assert t["rho"][0].as_py() == 52 - w.bit_length() + 1


def test_hll_estimate_small_range_correction():
    from rioxarray_ray.functions import sketch

    # 3 occupied registers out of 4096 -> linear counting regime
    rows = [{"register": i, "rho": 1} for i in (5, 99, 2000)]
    est = sketch.hll_estimate(rows, p=12)
    assert 2.5 < est < 3.5


def test_bloom_decontaminate_superset_of_exact(ray_session):
    """Bloom flags are a SUPERSET of exact gram-overlap flags (zero false
    negatives), and with a huge filter they coincide exactly."""
    import ray
    import ray.data as rd

    import pyarrow.compute as pc

    from rioxarray_ray.functions import text

    docs = [
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta eta"},
        {"doc_id": 1, "text": "one two three four five six seven"},
        {"doc_id": 2, "text": "alpha beta gamma delta epsilon other tail"},
        {"doc_id": 3, "text": "totally unrelated words in this document"},
    ]
    ds = rd.from_items(docs)
    bench = rd.from_items([docs[0]])

    def gpart(batch):
        grams, _ = text._gram_windows(batch["text"], 5)
        return pa.table({"g": pc.unique(grams)})

    grams_ds = bench.map_batches(gpart, batch_format="pyarrow")
    M, K = 1 << 16, 3
    bloom = text.bloom_build(grams_ds, m_bits=M, k=K)
    ref = ray.put(bloom)
    rows = {
        r["doc_id"]: r
        for r in text.decontaminate_bloom_stage(
            ds, ref, m_bits=M, k=K, n=5
        ).take_all()
    }
    # docs 0 and 2 share 5-grams with the benchmark; 1 and 3 do not
    # (false positives possible in principle, but 3 grams in a 64k-bit
    # filter make them vanishingly unlikely — and determinism means this
    # assertion can never flake)
    assert rows[0]["flagged"] == 1 and rows[0]["n_bloom_hits"] == 3
    assert rows[2]["flagged"] == 1 and rows[2]["n_bloom_hits"] == 1
    assert rows[1]["flagged"] == 0 and rows[3]["flagged"] == 0
    assert rows[1]["n_grams"] == 3 and rows[0]["n_grams"] == 3


def test_bloom_build_sets_all_bits_per_byte():
    """Regression: two positions in one byte must BOTH set (bitwise_or.at,
    not fancy-index |=)."""
    import ray.data as rd

    from rioxarray_ray.functions import text

    # find two strings whose single-hash (k=1) positions share a byte
    import numpy as np

    strs = [f"s{i}" for i in range(256)]
    pos = text.bloom_positions(pa.array(strs), 1 << 10, 1).ravel()
    byte = pos >> 3
    seen = {}
    pair = None
    for s, p, b in zip(strs, pos.tolist(), byte.tolist()):
        if b in seen and seen[b][1] != p:
            pair = (seen[b][0], s)
            break
        seen[b] = (s, p)
    assert pair, "no byte collision in sample — widen the sample"
    ds = rd.from_items([{"g": pair[0]}, {"g": pair[1]}])
    bloom = np.frombuffer(
        text.bloom_build(ds, m_bits=1 << 10, k=1), dtype=np.uint8
    )
    for s in pair:
        p = int(text.bloom_positions(pa.array([s]), 1 << 10, 1)[0, 0])
        assert (bloom[p >> 3] >> (p & 7)) & 1 == 1


def test_cms_upper_bound_and_partition_invariance(ray_session):
    """CMS estimates are exact-or-over (never under), partition-invariant,
    and exact when the sketch is wide enough to avoid collisions."""
    import ray.data as rd

    from rioxarray_ray.functions import sketch

    rng_vals = [f"k{i % 37}" for i in range(1000)]  # 37 keys, ~27 each
    exact = {}
    for v in rng_vals:
        exact[v] = exact.get(v, 0) + 1
    ds = rd.from_items([{"v": v} for v in rng_vals]).repartition(8)
    cells = sketch.cms_build(ds, "v", width=512, depth=3).take_all()
    ests = sketch.cms_query(cells, list(exact), width=512, depth=3)
    for v, n in exact.items():
        assert ests[v] >= n  # never undercounts
    # 37 keys in 512 columns x3 rows: min over rows is exact w.h.p.;
    # deterministic hash means this can't flake
    assert sum(ests[v] == exact[v] for v in exact) == len(exact)
    # total mass per row equals the input size
    per_row = {}
    for c in cells:
        per_row[c["row"]] = per_row.get(c["row"], 0) + c["n"]
    assert set(per_row.values()) == {1000}


def test_weighted_sample_rates_and_nesting(ray_session):
    """Per-group keep rates honored (+-tolerance), absent groups use the
    default, and a lower-rate sample is a SUBSET of a higher-rate one
    (same seed) — the property that makes mixtures re-tunable without
    reshuffling data."""
    import ray.data as rd

    from rioxarray_ray.functions import sample

    rows = [
        {"doc_id": i, "source": f"s{i % 3}" if i % 5 else "odd"}
        for i in range(3000)
    ]
    ds = rd.from_items(rows)
    hi = {"s0": 900, "s1": 500, "s2": 100}
    lo = {"s0": 450, "s1": 250, "s2": 50}
    kept_hi = sample.weighted_sample(ds, hi, key_col="doc_id", seed=3,
                                     default_permille=0).take_all()
    kept_lo = sample.weighted_sample(ds, lo, key_col="doc_id", seed=3,
                                     default_permille=0).take_all()
    ids_hi = {r["doc_id"] for r in kept_hi}
    ids_lo = {r["doc_id"] for r in kept_lo}
    assert ids_lo < ids_hi  # strict subset (nesting)
    assert not any(r["source"] == "odd" for r in kept_hi)  # default 0
    per = {}
    for r in kept_hi:
        per[r["source"]] = per.get(r["source"], 0) + 1
    n_per_src = 3000 * 4 // 5 // 3  # 800 per s0/s1/s2
    for src, rate in hi.items():
        assert abs(per.get(src, 0) / n_per_src - rate / 1000) < 0.08


def test_funnel_step_semantics(ray_session):
    """First-touch funnel: step times are MIN at/after the previous
    step; out-of-order steps don't count; all branch depths covered."""
    import datetime as dt

    import ray.data as rd

    from rioxarray_ray.functions import events

    def t(m):
        return dt.datetime(2026, 1, 1, 0, m)

    rows = [
        # u1: full funnel in order
        {"user_id": 1, "ts": t(0), "event_type": "signup"},
        {"user_id": 1, "ts": t(5), "event_type": "click"},
        {"user_id": 1, "ts": t(9), "event_type": "purchase"},
        # u2: purchase BEFORE click -> stops at step 2
        {"user_id": 2, "ts": t(0), "event_type": "signup"},
        {"user_id": 2, "ts": t(3), "event_type": "purchase"},
        {"user_id": 2, "ts": t(7), "event_type": "click"},
        # u3: click before signup doesn't count -> step 1 only
        {"user_id": 3, "ts": t(0), "event_type": "click"},
        {"user_id": 3, "ts": t(2), "event_type": "signup"},
        # u4: never signed up -> step 0
        {"user_id": 4, "ts": t(1), "event_type": "view"},
        # u5: same-timestamp signup+click both count (>= semantics)
        {"user_id": 5, "ts": t(4), "event_type": "signup"},
        {"user_id": 5, "ts": t(4), "event_type": "click"},
        {"user_id": 5, "ts": t(4), "event_type": "purchase"},
    ]
    got = {
        r["user_id"]: r
        for r in events.funnel(rd.from_items(rows)).take_all()
    }
    us = lambda m: int(t(m).timestamp() * 1_000_000)  # noqa: E731
    assert got[1]["step_reached"] == 3 and got[1]["t3"] == us(9)
    assert got[2]["step_reached"] == 2
    assert got[2]["t2"] == us(7) and got[2]["t3"] == -1
    assert got[3]["step_reached"] == 1 and got[3]["t2"] == -1
    assert got[4]["step_reached"] == 0 and got[4]["t1"] == -1
    assert got[5]["step_reached"] == 3
    assert got[5]["t1"] == got[5]["t2"] == got[5]["t3"] == us(4)


def test_quantize_embeddings_roundtrip_and_edge_cases(ray_session):
    """int8 codes: |q| <= 127, dequantized error <= scale/254 per
    coordinate, zero vectors -> scale 0 + zero codes, max coordinate
    hits exactly +-127."""
    import ray.data as rd

    from rioxarray_ray.functions import ann

    vecs = [
        {"vec_id": 0, "embedding": [0.5, -1.0, 0.25, 0.0]},
        {"vec_id": 1, "embedding": [0.0, 0.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [3.0, 1.5, -0.75, 2.9]},
    ]
    rows = {r["vec_id"]: r
            for r in ann.quantize_embeddings(
                rd.from_items(vecs)).take_all()}
    q0 = np.asarray(rows[0]["q"])
    assert rows[0]["scale"] == 1.0
    np.testing.assert_array_equal(q0, [64, -127, 32, 0])  # rint(.5*127)=64
    assert rows[1]["scale"] == 0.0
    np.testing.assert_array_equal(np.asarray(rows[1]["q"]), [0, 0, 0, 0])
    q2 = np.asarray(rows[2]["q"])
    assert q2.max() == 127 and rows[2]["scale"] == 3.0
    # dequantization error bound
    for r in vecs:
        got = rows[r["vec_id"]]
        sc = got["scale"]
        if sc == 0:
            continue
        deq = np.asarray(got["q"], dtype=np.float64) * sc / 127.0
        np.testing.assert_allclose(
            deq, np.asarray(r["embedding"]), atol=sc / 254 + 1e-12
        )


def test_augment_tile_permutation_rules():
    """Involution / cycle properties + the explicit rot90-cw index map
    (old (r, c) -> new (c, h-1-r))."""
    from rioxarray_ray.functions import multimodal

    rng = np.arange(2 * 3 * 4).reshape(2, 3, 4)
    h = multimodal.augment_tile
    np.testing.assert_array_equal(h(h(rng, "hflip"), "hflip"), rng)
    np.testing.assert_array_equal(h(h(rng, "vflip"), "vflip"), rng)
    r1 = h(rng, "rot90")
    assert r1.shape == (2, 4, 3)
    r4 = h(h(h(r1, "rot90"), "rot90"), "rot90")
    np.testing.assert_array_equal(r4, rng)
    for r in range(3):
        for c in range(4):
            assert r1[0, c, 3 - 1 - r] == rng[0, r, c]
    with pytest.raises(ValueError):
        h(rng, "transpose")


def test_augment_stage_moves_nodata_with_pixels(ray_session):
    """Augmented tiles keep dtype/nodata; the mask transforms with the
    data (valid count invariant per op)."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.sources import corpus
    from rioxarray_ray.stages import decode, tile
    from rioxarray_ray.stages.schema import pixel_views

    ds = rd.from_arrow(corpus.corpus_table([3]))
    tiles = tile.tile_stage(decode.decode_stage(ds), tile_size=64)
    aug = multimodal.augment_stage(tiles)
    import pyarrow as pa_
    batches = list(aug.iter_batches(batch_format="pyarrow",
                                    batch_size=None))
    n_by_op: dict = {}
    for batch in batches:
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, px in zip(meta, pixel_views(batch)):
            nod = row["nodata"]
            if nod != nod:
                nod = None if np.dtype(row["dtype"]).kind in "iu" else nod
            vm = valid_mask(px, nod)
            n_by_op[row["op"]] = n_by_op.get(row["op"], 0) + int(vm.sum())
    assert len(n_by_op) == 3
    assert len(set(n_by_op.values())) == 1  # same valid mass per op


def test_patchify_values_and_stats(ray_session):
    """Patch tokens and moment stats equal direct numpy slicing; the
    all-nodata patch is skipped; misaligned patch size raises."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.sources import corpus
    from rioxarray_ray.stages import decode, tile

    ds = rd.from_arrow(corpus.corpus_table([3]))
    tiles = tile.tile_stage(decode.decode_stage(ds), tile_size=64)
    rows = multimodal.patchify_stage(tiles, patch=8).take_all()
    assert rows

    ras = corpus.raster_for(3)
    vm = valid_mask(ras.pixels, ras.nodata)
    v = ras.pixels.astype(np.int64)
    seen = 0
    for r in rows:
        b = r["band"]
        r0 = r["tile_row"] * 64 + r["patch_row"] * 8
        c0 = r["tile_col"] * 64 + r["patch_col"] * 8
        blk = v[b, r0 : r0 + 8, c0 : c0 + 8]
        m = vm[b, r0 : r0 + 8, c0 : c0 + 8]
        assert r["n_valid"] == int(m.sum()) > 0
        assert r["psum"] == int(blk[m].sum())
        assert r["psumsq"] == int((blk[m] ** 2).sum())
        assert r["pmin"] == int(blk[m].min())
        assert r["pmax"] == int(blk[m].max())
        np.testing.assert_array_equal(
            np.asarray(r["values"]).reshape(8, 8), blk
        )
        seen += 1
    # every patch with >= 1 valid pixel appears exactly once
    n_expected = 0
    for b in range(v.shape[0]):
        for pr in range(v.shape[1] // 8):
            for pc_ in range(v.shape[2] // 8):
                if vm[b, pr * 8 : pr * 8 + 8, pc_ * 8 : pc_ * 8 + 8].any():
                    n_expected += 1
    assert seen == n_expected

    with pytest.raises(Exception) as ei:
        multimodal.patchify_stage(tiles, patch=48).take_all()
    assert "divide" in str(ei.value)


def test_retention_triangle_semantics(ray_session):
    """Hand-built cohorts: first-signup anchors, day-bucket activity,
    pre-anchor activity excluded; partition-invariant."""
    import datetime as dt

    import ray.data as rd

    from rioxarray_ray.functions import events

    def e(u, day, typ):
        return {"user_id": u,
                "ts": dt.datetime(2026, 1, 1 + day, 12, 0),
                "event_type": typ}

    rows = [
        e(1, 0, "signup"), e(1, 0, "click"), e(1, 2, "view"),
        e(2, 0, "signup"), e(2, 1, "click"),
        e(3, 1, "signup"), e(3, 1, "view"), e(3, 3, "click"),
        e(4, 2, "view"),                       # never signed up: excluded
        e(5, 3, "signup"), e(5, 1, "click"),   # pre-anchor activity: k<0 dropped
    ]
    got = {
        (r["cohort"], r["k"]): r["n_users"]
        for r in events.retention(rd.from_items(rows).repartition(5),
                                  bucket_hours=24).take_all()
    }
    d0 = int(dt.datetime(2026, 1, 1, 12).timestamp() * 1e6) // 86_400_000_000
    # cohort d0: users 1,2 -> k0: both, k1: user2, k2: user1
    assert got[(d0, 0)] == 2 and got[(d0, 1)] == 1 and got[(d0, 2)] == 1
    # cohort d0+1: user3 -> k0 and k2
    assert got[(d0 + 1, 0)] == 1 and got[(d0 + 1, 2)] == 1
    # user5 cohort d0+3, only k0 (pre-anchor click dropped)
    assert got[(d0 + 3, 0)] == 1
    assert sum(v for (c, k), v in got.items() if k < 0) == 0
    assert len(got) == 6


def test_topk_int8_recall_vs_exact(ray_session):
    """Quantized MIPS recall vs exact float cosine on unit-norm-ish
    vectors: >= 8/10 overlap per query (int8 on 64 dims loses little),
    and the dot scores equal direct integer math."""
    import ray.data as rd

    from rioxarray_ray.functions import ann

    rng = np.random.default_rng(11)
    n, d = 400, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    items = [{"vec_id": i, "embedding": x[i].tolist()} for i in range(n)]
    ds = rd.from_items(items).repartition(8)
    qsel = [0, 100, 250]
    qtab = ann.quantize_embeddings_table(
        __import__("pyarrow").Table.from_pylist(
            [items[i] for i in qsel]
        )
    )
    qcodes = np.asarray([np.asarray(v, np.int64)
                         for v in qtab["q"].to_pylist()])
    rows = ann.topk_int8_dot(ds, np.asarray(qsel), qcodes, k=10).take_all()

    # direct integer reference
    xs = np.abs(x.astype(np.float64)).max(axis=1)
    codes = np.rint(x.astype(np.float64) / xs[:, None] * 127).astype(np.int64)
    # the codes are max-abs-normalized, so the float reference metric
    # is the dot of x/scale vectors (not L2 cosine)
    xf = x.astype(np.float64) / xs[:, None]
    cos = xf @ xf.T
    for qi, q in enumerate(qsel):
        got = sorted([r for r in rows if r["query_id"] == q],
                     key=lambda r: r["rank"])
        assert len(got) == 10
        for r in got:
            assert r["dot"] == int(codes[q] @ codes[r["vec_id"]])
        exact10 = set(np.argsort(-cos[q])[:10].tolist())
        overlap = len(exact10 & {r["vec_id"] for r in got})
        assert overlap >= 9, (q, overlap)


def test_interval_join_multimatch_and_partition_invariance(ray_session):
    """Every (left, right) pair with start <= ts < end per key, multi-
    match; randomized brute-force oracle; identical across block counts."""
    import numpy as np
    import ray.data as rd

    from rioxarray_ray.functions.asof import interval_join

    rng = np.random.RandomState(7)
    base = np.datetime64("2024-01-01", "us").astype("int64")
    ev = [
        {
            "eid": i,
            "k": int(rng.randint(0, 5)),
            "ts": np.int64(base + rng.randint(0, 10_000)).astype(
                "datetime64[us]"
            ),
        }
        for i in range(80)
    ]
    iv = []
    for j in range(40):
        s = base + rng.randint(0, 10_000)
        iv.append(
            {
                "rid": j,
                "ck": int(rng.randint(0, 5)),
                "start": np.int64(s).astype("datetime64[us]"),
                "end": np.int64(s + rng.randint(1, 3_000)).astype(
                    "datetime64[us]"
                ),
            }
        )

    expect = sorted(
        (e["eid"], r["rid"])
        for e in ev
        for r in iv
        if e["k"] == r["ck"] and r["start"] <= e["ts"] < r["end"]
    )
    assert expect, "fixture must produce matches"
    multi = {}
    for eid, _ in expect:
        multi[eid] = multi.get(eid, 0) + 1
    assert max(multi.values()) > 1, "fixture must exercise multi-match"

    def run(nblocks):
        out = interval_join(
            rd.from_items(ev).repartition(nblocks),
            rd.from_items(iv).repartition(nblocks),
            key=("k", "ck"), left_ts="ts",
            right_start="start", right_end="end",
            left_cols=["eid"], right_cols=["rid"],
        ).take_all()
        return sorted((r["eid"], r["rid"]) for r in out)

    assert run(1) == expect
    assert run(6) == expect


def test_semantic_dedup_k1_equals_exact_pairs(ray_session):
    """With k=1 every vector lands in one cluster, so SemDeDup-style
    within-cluster search must equal the exact block-pair plan; with
    k>1 it returns a subset (the documented boundary-pair trade)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions.ann import blocked_cosine_pairs
    from rioxarray_ray.functions.cluster import semantic_dedup_pairs

    rng = np.random.RandomState(3)
    base = rng.randn(40, 16)
    rows = []
    for i in range(120):
        v = base[i % 40] + rng.randn(16) * (0.05 if i % 3 else 1.0)
        rows.append({"vec_id": i,
                     "embedding": v.astype(np.float32).tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(5)

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in blocked_cosine_pairs(ds, threshold=0.9,
                                      n_blocks=4).take_all()
    }
    sem1 = {
        (r["vec_a"], r["vec_b"])
        for r in semantic_dedup_pairs(ds, threshold=0.9, k=1,
                                      iters=2).take_all()
    }
    assert sem1 == exact and exact

    sem8 = {
        (r["vec_a"], r["vec_b"])
        for r in semantic_dedup_pairs(ds, threshold=0.9, k=8,
                                      iters=2).take_all()
    }
    assert sem8 <= exact
    assert sem8, "clustered search must still find same-cluster dups"


def test_gram_matrix_and_pca(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions.cluster import (
        _quantized_matrix, gram_matrix, pca_components,
    )

    rng = np.random.RandomState(11)
    rows = [{"vec_id": i,
             "embedding": rng.randn(12).astype(np.float32).tolist()}
            for i in range(200)]
    tbl = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(tbl).repartition(7)

    got = {(r["i"], r["j"]): r["s"]
           for r in gram_matrix(ds).take_all()}
    w = _quantized_matrix(tbl)
    g = w.T @ w
    iu, ju = np.triu_indices(12)
    assert got == {(int(i), int(j)): int(g[i, j])
                   for i, j in zip(iu, ju)}

    vals, vecs = pca_components(
        [{"i": int(i), "j": int(j), "s": int(g[i, j])}
         for i, j in zip(iu, ju)], d=12, k=3)
    evals, evecs = np.linalg.eigh(g.astype(np.float64))
    np.testing.assert_allclose(vals, evals[::-1][:3], rtol=1e-10)


def test_chunk_dedup_canonical_ownership_and_partition_invariance(ray_session):
    """A chunk md5 is kept only at its smallest (doc_id, chunk_id);
    per-doc (n_chunks, n_kept) match a brute-force reference and are
    invariant to input partitioning."""
    import ray.data as rd

    from rioxarray_ray.functions import dedup
    from rioxarray_ray.functions.text import chunk_batch

    words = [f"w{i}" for i in range(40)]
    base = " ".join(words)
    docs = [
        {"doc_id": 0, "text": base},                # owns everything
        {"doc_id": 1, "text": base},                # exact copy -> n_kept 0
        {"doc_id": 2, "text": base + " unique tail content here"},
        {"doc_id": 3, "text": "totally different words only"},
        {"doc_id": 4, "text": ""},                  # no chunks -> no row
    ]

    # brute force over the same chunk rule
    import pyarrow as pa

    tbl = pa.table(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "text": [d["text"] for d in docs],
        }
    )
    ch = chunk_batch(tbl, size=8, overlap=2).to_pylist()
    owner: dict = {}
    for r in ch:
        key = (r["doc_id"], r["chunk_id"])
        if r["chunk_md5"] not in owner or key < owner[r["chunk_md5"]]:
            owner[r["chunk_md5"]] = key
    expect: dict = {}
    for r in ch:
        e = expect.setdefault(r["doc_id"], [0, 0])
        e[0] += 1
        if owner[r["chunk_md5"]] == (r["doc_id"], r["chunk_id"]):
            e[1] += 1

    for nparts in (1, 3):
        got = {
            r["doc_id"]: [r["n_chunks"], r["n_kept"]]
            for r in dedup.chunk_dedup(
                rd.from_items(docs).repartition(nparts),
                size=8, overlap=2,
            ).take_all()
        }
        assert got == expect
    assert expect[1] == [expect[0][0], 0]  # exact copy keeps nothing
    assert expect[2][1] < expect[2][0]     # shared prefix partially owned
    assert 4 not in expect                 # empty doc emits no chunks


def test_bm25_search_scoring_and_length_normalization(ray_session):
    """BM25 scores match a per-doc integer reference; equal-tf docs rank
    by length (shorter wins — the normalization tfidf lacks); ties break
    to the smallest doc id."""
    import ray.data as rd

    from rioxarray_ray.functions import text

    filler = " ".join(f"pad{i}" for i in range(60))
    docs = [
        {"doc_id": 0, "text": "alpha beta " + filler},      # long, tf=1
        {"doc_id": 1, "text": "alpha beta"},                # short, tf=1
        {"doc_id": 2, "text": "alpha alpha alpha"},         # tf=3
        {"doc_id": 3, "text": "nothing relevant here"},     # score 0
        {"doc_id": 4, "text": "alpha beta"},                # tie with 1
    ]
    ds = rd.from_items(docs).repartition(3)
    got = text.bm25_search(ds, terms=("alpha", "beta"), k=10).take_all()
    # combiner top-k guarantees membership, not emitted row order
    got_ids = [r["doc_id"]
               for r in sorted(got, key=lambda r: (-r["score"], r["doc_id"]))]

    # integer reference
    import re

    toks = [re.findall(r"[a-z']+", d["text"].lower()) for d in docs]
    N, TT = len(docs), sum(len(t) for t in toks)
    terms = ["alpha", "beta"]
    df = {t: sum(1 for tk in toks if t in tk) for t in terms}
    exp = {}
    for d, tk in zip(docs, toks):
        dl, s = len(tk), 0
        for t in terms:
            tf = tk.count(t)
            if tf:
                idf = (N * 1000) // df[t]
                s += (idf * 22 * TT * tf) // (10 * TT * tf + 3 * TT
                                              + 9 * dl * N)
        if s > 0:
            exp[d["doc_id"]] = s
    order = sorted(exp, key=lambda i: (-exp[i], i))
    assert got_ids == order
    scores = {r["doc_id"]: r["score"] for r in got}
    assert scores == exp
    assert 3 not in got_ids                      # zero-score pushdown
    assert scores[1] > scores[0]                 # shorter doc outranks
    assert scores[1] == scores[4]                # same text, same score
    # k truncation keeps the top-k of (score desc, id asc)
    top2 = {r["doc_id"] for r in text.bm25_search(
        ds, terms=("alpha", "beta"), k=2).take_all()}
    assert top2 == set(order[:2])


def test_hyperplane_lsh_near_dup_planted_pairs(ray_session):
    """The deterministic hyperplane-LSH plan recovers planted
    near-identical twins, signatures match a brute-force replay, far
    vectors produce no pairs, and output is partition-invariant."""
    import pyarrow as pa
    import ray.data as rd

    from rioxarray_ray.functions import cluster

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.tolist()})
    for i in (0, 7, 21):  # planted twins, tiny nudge
        tw = base[i].copy()
        tw[0] += 0.0005
        rows.append({"vec_id": 1000 + i, "embedding": tw.tolist()})

    # brute-force signature replay (independent of the engine code path)
    def sig_of(v):
        w = 2 * np.floor(1000 * np.asarray(v, np.float64)).astype(np.int64)
        i = np.arange(64, dtype=np.int64)[:, None]
        j = np.arange(64, dtype=np.int64)[None, :]
        signs = 1 - 2 * ((((i + 1) * (j + 1) * 2654435761)
                          % 1000000007) % 2)
        y = w @ signs
        return int(((y >= 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))

    got_sig = {
        r["vec_id"]: np.int64(r["hsig"]).view(np.uint64)
        for r in rd.from_items(rows).map_batches(
            cluster.hyperplane_signature_batch, batch_format="pyarrow"
        ).take_all()
    }
    for r in rows:
        assert int(got_sig[r["vec_id"]]) == sig_of(r["embedding"])

    expect = {(i, 1000 + i) for i in (0, 7, 21)}
    for nparts in (1, 4):
        got = {
            (r["vec_a"], r["vec_b"])
            for r in cluster.hyperplane_lsh_near_dup(
                rd.from_items(rows).repartition(nparts), threshold=0.95
            ).take_all()
        }
        # planted twins are hamming-0 by construction here: assert exact
        assert got == expect

    # empty candidate set (all vectors far apart): no rows, no crash
    none = cluster.hyperplane_lsh_near_dup(
        rd.from_items(rows[:10]), threshold=0.95
    ).take_all()
    assert none == []


def test_deterministic_shuffle_reproducible_and_seeded(ray_session):
    """Same seed + any partitioning => identical order; different seed
    => different order; order matches a local md5-rank sort."""
    import hashlib

    import ray.data as rd

    from rioxarray_ray.functions import sample

    rows = [{"doc_id": i} for i in range(97)]

    def local_order(seed):
        def u(i):
            return int.from_bytes(
                hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "little"
            )

        return [i for i in sorted(range(97), key=lambda i: (u(i), i))]

    orders = []
    for nparts in (1, 5):
        got = [
            r["doc_id"]
            for r in sample.deterministic_shuffle(
                rd.from_items(rows).repartition(nparts), seed=3
            ).take_all()
        ]
        assert got == local_order(3)
        orders.append(got)
    assert orders[0] == orders[1]
    other = [
        r["doc_id"]
        for r in sample.deterministic_shuffle(
            rd.from_items(rows), seed=4
        ).take_all()
    ]
    assert other == local_order(4) and other != orders[0]


def test_collocations_pmi_surrogate(ray_session):
    """Collocation scores match a Counter reference (bigram PMI
    surrogate with floor division), min_count prunes rare pairs, ties
    break to the smaller bigram, and output is partition-invariant."""
    from collections import Counter

    import ray.data as rd

    from rioxarray_ray.functions import text

    docs = [
        {"doc_id": 0, "text": "new york is big and new york is far"},
        {"doc_id": 1, "text": "new york and york new and new things"},
        {"doc_id": 2, "text": "big apple big apple big apple"},
        {"doc_id": 3, "text": ""},
    ]
    import re

    uni, bi = Counter(), Counter()
    for d in docs:
        ts = re.findall(r"[a-z']+", d["text"].lower())
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    N = sum(bi.values())
    exp = {}
    for (a, b), c in bi.items():
        if c >= 2:
            exp[f"{a} {b}"] = (c, (c * N * 1000) // (uni[a] * uni[b]))
    want = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))

    for nparts in (1, 3):
        got = text.collocations(
            rd.from_items(docs).repartition(nparts), k=50, min_count=2
        ).take_all()
        got_sorted = sorted(
            [(r["bigram"], (r["c12"], r["score"])) for r in got],
            key=lambda kv: (-kv[1][1], kv[0]),
        )
        assert got_sorted == want
    # rare pairs (c12 < min_count) are pruned
    assert all(v[0] >= 2 for _, v in want)
    assert "york is" in dict(want)  # sanity: a real repeated bigram


def test_fluency_bigram_lm_reference(ray_session):
    """Per-doc fluency sums match a Counter bigram-LM reference with the
    same floor rule; repeated common transitions score higher than rare
    ones; 0/1-token docs emit no row; partition-invariant."""
    from collections import Counter

    import ray.data as rd

    from rioxarray_ray.functions import text

    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the cat sat on the mat"},
        {"doc_id": 2, "text": "zyx wvu tsr qpo"},       # unique bigrams
        {"doc_id": 3, "text": "single"},                # no bigrams
        {"doc_id": 4, "text": ""},
    ]
    import re

    uni, bi = Counter(), Counter()
    toks = {d["doc_id"]: re.findall(r"[a-z']+", d["text"].lower())
            for d in docs}
    for ts in toks.values():
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    exp = {}
    for did, ts in toks.items():
        grams = list(zip(ts, ts[1:]))
        if not grams:
            continue
        exp[did] = (
            len(grams),
            sum((bi[g] * 1000) // uni[g[0]] for g in grams),
        )

    for nparts in (1, 3):
        got = {
            r["doc_id"]: (r["n_bigrams"], r["fluency_sum"])
            for r in text.fluency(
                rd.from_items(docs).repartition(nparts)
            ).take_all()
        }
        assert got == exp
    assert 3 not in exp and 4 not in exp
    avg = {d: s / n for d, (n, s) in exp.items()}
    assert avg[0] == avg[1]          # identical docs, identical score
    assert avg[2] == 1000.0          # singleton vocab: P(w2|w1) = 1
    # 'the' continues two ways (cat/mat), so its transitions score 1/2
    assert exp[0][1] == 2 * 500 + 3 * 1000 and exp[0][0] == 5


def test_pack_sequences_prefix_scan(ray_session):
    """Token offsets equal a sequential reference regardless of
    partitioning or bucket size; seq spans use the concat-then-cut rule;
    empty docs emit no row."""
    import re

    import ray.data as rd

    from rioxarray_ray.functions import text

    rng = np.random.default_rng(9)
    docs = [
        {"doc_id": i,
         "text": " ".join(f"w{j}" for j in range(int(rng.integers(0, 9))))}
        for i in range(57)
    ]
    ref, off = {}, 0
    for d in docs:
        n = len(re.findall(r"[a-z']+", d["text"].lower()))
        if n == 0:
            continue
        ref[d["doc_id"]] = (n, off, off // 7, (off + n - 1) // 7)
        off += n

    for nparts, bs in ((1, 4096), (5, 8), (3, 1)):
        got = {
            r["doc_id"]: (r["n_tokens"], r["tok_offset"],
                          r["seq_first"], r["seq_last"])
            for r in text.pack_sequences(
                rd.from_items(docs).repartition(nparts),
                seq_len=7, bucket_size=bs,
            ).take_all()
        }
        assert got == ref


def test_phash64_locality_and_contract(ray_session):
    """pHash: one nudged pixel flips few bits, an unrelated image many;
    the integerized basis matches its closed form; non-16x16 raises."""
    from rioxarray_ray.functions.multimodal import (
        phash64, phash_dct_matrix, _PHASH_SCALE,
    )

    T = phash_dct_matrix()
    j = np.arange(16, dtype=np.float64)[None, :]
    u = np.arange(16, dtype=np.float64)[:, None]
    c = np.where(u == 0, np.sqrt(1 / 16), np.sqrt(2 / 16))
    np.testing.assert_array_equal(
        T, np.rint(_PHASH_SCALE * c
                   * np.cos(np.pi * (2 * j + 1) * u / 32)).astype(np.int64)
    )
    # orthogonality of the underlying basis survives quantization (~1e-3)
    Q = T.astype(np.float64) / _PHASH_SCALE
    np.testing.assert_allclose(Q @ Q.T, np.eye(16), atol=2e-3)

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (1, 16, 16))
    near = base.copy()
    near[0, 9, 4] = (near[0, 9, 4] + 96) % 256
    far = rng.integers(0, 256, (1, 16, 16))
    h = {k: int(np.uint64(np.int64(phash64(v))))
         for k, v in (("b", base), ("n", near), ("f", far))}
    d_near = bin(h["b"] ^ h["n"]).count("1")
    d_far = bin(h["b"] ^ h["f"]).count("1")
    assert d_near < 8 <= d_far

    with pytest.raises(ValueError, match="16x16"):
        phash64(np.zeros((1, 8, 8), np.uint8))


def test_verify_mse_pairs_exact(ray_session):
    """Pair MSE numerators equal the direct pixel diff; planted
    one-pixel variants verify tiny; sentinel/empty paths are clean."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels.png import encode_png

    rng = np.random.default_rng(13)
    imgs = {i: rng.integers(0, 256, (1, 12, 12)).astype(np.uint8)
            for i in range(4)}
    imgs[9] = imgs[0].copy()
    imgs[9][0, 5, 5] = (imgs[9][0, 5, 5] + 50) % 256
    media = rd.from_items([
        {"media_id": k, "payload": encode_png(v)} for k, v in imgs.items()
    ])
    pairs = rd.from_items([
        {"doc_a": 0, "doc_b": 9}, {"doc_a": 1, "doc_b": 2},
    ])
    got = {(r["doc_a"], r["doc_b"]): (r["mse_num"], r["n_px"])
           for r in multimodal.verify_mse_pairs(pairs, media).take_all()}
    for a, b in ((0, 9), (1, 2)):
        d = imgs[a].astype(np.int64).sum(0) - imgs[b].astype(np.int64).sum(0)
        assert got[(a, b)] == (int((d ** 2).sum()), 144)
    assert got[(0, 9)][0] < got[(1, 2)][0]  # planted variant is near

    none = multimodal.verify_mse_pairs(
        rd.from_items([{"doc_a": 1, "doc_b": 777}]), media  # b unmatched
    ).take_all()
    assert none == []
