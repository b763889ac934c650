"""Embedding similarity: brute-force exactness vs numpy; LSH recall."""

import numpy as np
import pandas as pd

from geoengine import similarity


def _vecs(spark, n, dim=32, seed=31):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, m))})
    return spark.createDataFrame(pdf), m


def test_brute_topk_matches_numpy(spark):
    df, m = _vecs(spark, 200)
    k = 5
    got = similarity.cosine_topk_brute(df, df, k).toPandas()
    md = m.astype(np.float64)
    sims = (md @ md.T) / (
        np.linalg.norm(md, axis=1)[:, None] * np.linalg.norm(md, axis=1)[None, :]
    )
    np.fill_diagonal(sims, -np.inf)
    for q in range(0, 200, 17):
        want = set(np.argsort(-sims[q])[:k].tolist())
        have = set(got[got["query_id"] == q]["neighbor_id"].tolist())
        assert have == want, f"query {q}"


def _clustered_vecs(spark, n, dim=32, n_clusters=20, seed=41):
    """Realistic embedding geometry: tight clusters (true neighbors have
    high cosine) — isotropic gaussian vectors have no meaningful neighbors
    and any LSH legitimately fails there."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    idx = rng.integers(0, n_clusters, n)
    m = centers[idx] + 0.05 * rng.standard_normal((n, dim))
    m = m.astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, m))})
    return spark.createDataFrame(pdf), m


def test_ivf_recall(spark):
    df, m = _clustered_vecs(spark, 400, n_clusters=10, seed=43)
    k = 3
    exact = similarity.cosine_topk_brute(df, df, k).toPandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))

    def recall(refine_iters):
        approx = similarity.cosine_topk_ivf(
            df, df, k, n_centroids=24, n_probe=4, refine_iters=refine_iters
        ).toPandas()
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        return len(e & a) / len(e)

    r0, r1 = recall(0), recall(1)
    assert r0 >= 0.7, r0
    # one Lloyd iteration tightens the codebook onto the true clusters
    assert r1 >= 0.9, (r0, r1)


def test_ivf_full_probe_is_exact(spark):
    df, m = _clustered_vecs(spark, 300, n_clusters=8, seed=47)
    k = 3
    exact = similarity.cosine_topk_brute(df, df, k).toPandas()
    full = similarity.cosine_topk_ivf(
        df, df, k, n_centroids=12, n_probe=12, refine_iters=1
    ).toPandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"], exact["sim_rank"]))
    f = set(zip(full["query_id"], full["neighbor_id"], full["sim_rank"]))
    assert e == f


def test_ivf_prebuilt_index_roundtrip(spark, tmp_path):
    # build-once/query-many: persist the indexed corpus, re-read it, and the
    # query batch must equal the one-shot cosine_topk_ivf result exactly
    df, m = _clustered_vecs(spark, 300, n_clusters=8, seed=49)
    one_shot = similarity.cosine_topk_ivf(
        df, df, 3, n_centroids=12, n_probe=4, refine_iters=1, n_assign=2
    ).toPandas()
    centroids, indexed = similarity.build_ivf_index(
        df, 12, refine_iters=1, n_assign=2
    )
    indexed.write.mode("overwrite").partitionBy("cell").parquet(
        str(tmp_path / "ivf")
    )
    reread = spark.read.parquet(str(tmp_path / "ivf"))
    again = similarity.cosine_topk_ivf_prebuilt(
        df, centroids, reread, 3, n_probe=4
    ).toPandas()
    key = lambda d: set(
        zip(d["query_id"], d["neighbor_id"], d["sim_rank"])
    )
    assert key(again) == key(one_shot) and len(one_shot) > 0


def test_cosine_near_dup_guarantees(spark):
    # LSH prefilter + exact verify: (a) NO false positives ever (the exact
    # cosine runs on every emitted pair), (b) exact-duplicate vectors are
    # always found (identical sign pattern -> same base bucket), (c) recall
    # on a clustered population is high (pairs straddling >2 hyperplanes
    # can be missed by design — the certified-recall-1.0 regime is measured
    # per-corpus, as the driver query does for documents).
    df, m = _clustered_vecs(spark, 300, n_clusters=40, seed=53)
    # append exact duplicates of the first 10 vectors
    import pandas as pd_

    dup = pd_.DataFrame(
        {"vec_id": range(1000, 1010), "embedding": list(map(list, m[:10]))}
    )
    df = df.unionByName(spark.createDataFrame(dup))
    md = np.vstack([m.astype(np.float64), m[:10].astype(np.float64)])
    ids = list(range(300)) + list(range(1000, 1010))
    n = np.linalg.norm(md, axis=1, keepdims=True)
    sims = (md @ md.T) / (n * n.T)
    iu = np.triu_indices(len(md), 1)
    want = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i, j in zip(*iu)
        if sims[i, j] >= 0.95
    }
    got = set(
        map(
            tuple,
            similarity.cosine_near_dup_pairs(df, 0.95, n_planes=12, probe_bits=2)
            .select("doc1", "doc2")
            .collect(),
        )
    )
    assert got <= want  # exact verify: no false positives
    for k in range(10):
        assert (k, 1000 + k) in got  # exact dups always collide
    assert len(got) / len(want) >= 0.9  # high recall on clusters


def test_cosine_near_dup_exact_equals_bruteforce(spark):
    # the inverted-index prefilter is COMPLETE by construction, so the
    # result must equal brute force exactly — including the boundary
    # cluster geometry that defeats the LSH variant
    # nonnegative TF-like clusters (the completeness proof assumes
    # nonnegative vectors): positive centers + small additive noise
    rng = np.random.default_rng(57)
    centers = rng.uniform(0.1, 1.0, (40, 32))
    idx = rng.integers(0, 40, 300)
    md = centers[idx] + 0.02 * rng.uniform(0.0, 1.0, (300, 32))
    import pandas as pd_

    df = spark.createDataFrame(
        pd_.DataFrame(
            {
                "vec_id": range(len(md)),
                "embedding": list(map(list, md.astype(np.float32))),
            }
        )
    )
    md32 = md.astype(np.float32).astype(np.float64)
    n = np.linalg.norm(md32, axis=1, keepdims=True)
    sims = (md32 @ md32.T) / (n * n.T)
    iu = np.triu_indices(len(md), 1)
    want = {
        (int(min(i, j)), int(max(i, j)))
        for i, j in zip(*iu)
        if sims[i, j] >= 0.999
    }
    got = set(
        map(
            tuple,
            similarity.cosine_near_dup_exact(df, 0.999, dim=32)
            .select("doc1", "doc2")
            .collect(),
        )
    )
    assert got == want
    assert len(want) > 50


def test_near_dup_prefix_prunes_dense_vectors(spark):
    # FULLY DENSE (every dim nonzero) Zipf-weighted vectors: the suffix-norm
    # prefix rule must (a) stay exact and (b) index only each vector's few
    # heavy dims, so the candidate-pair bound is far below all-pairs — the
    # round-2 flat cut t/(2*sqrt(dim)) kept essentially every (doc, dim)
    # here and degenerated to all-pairs.
    rng = np.random.default_rng(61)
    n, dim, n_clusters = 300, 96, 30
    zipf = 1.0 / np.arange(1, dim + 1)
    centers = np.stack([zipf[rng.permutation(dim)] for _ in range(n_clusters)])
    idx = rng.integers(0, n_clusters, n)
    md = centers[idx] * rng.uniform(0.95, 1.05, (n, dim))  # dense, no zeros
    assert (md > 0).all()
    import pandas as pd_

    df = spark.createDataFrame(
        pd_.DataFrame(
            {"vec_id": range(n), "embedding": list(map(list, md.astype(np.float32)))}
        )
    )
    t = 0.99
    md32 = md.astype(np.float32).astype(np.float64)
    nr = np.linalg.norm(md32, axis=1, keepdims=True)
    sims = (md32 @ md32.T) / (nr * nr.T)
    iu = np.triu_indices(n, 1)
    want = {(int(min(i, j)), int(max(i, j)))
            for i, j in zip(*iu) if sims[i, j] >= t}
    assert len(want) > 100  # the fixture has real near-dups
    got = set(
        map(tuple, similarity.cosine_near_dup_exact(df, t)
            .select("doc1", "doc2").collect())
    )
    assert got == want  # complete AND exact on dense input
    n_docs, bound = similarity.dense_candidate_bound(
        similarity.near_dup_prefix_index(df, t)
    )
    all_pairs = n_docs * (n_docs - 1) / 2
    assert bound < 0.25 * all_pairs, (bound, all_pairs)  # real pruning


def test_near_dup_exact_signed_vectors(spark):
    # the suffix-norm proof is sign-free (Cauchy-Schwarz) — signed clustered
    # vectors must come back complete too (the round-2 flat cut assumed
    # nonnegative weights)
    df, m = _clustered_vecs(spark, 250, dim=24, n_clusters=25, seed=67)
    md = m.astype(np.float64)
    nr = np.linalg.norm(md, axis=1, keepdims=True)
    sims = (md @ md.T) / (nr * nr.T)
    iu = np.triu_indices(len(md), 1)
    t = 0.97
    want = {(int(min(i, j)), int(max(i, j)))
            for i, j in zip(*iu) if sims[i, j] >= t}
    assert len(want) > 30
    got = set(
        map(tuple, similarity.cosine_near_dup_exact(df, t)
            .select("doc1", "doc2").collect())
    )
    assert got == want


def test_dense_guard_warns_on_flat_spectrum(spark):
    # all-equal weights (the adversarial flat spectrum): the guard must warn
    # that the prefilter degenerated, while the result stays exact
    import warnings

    import pandas as pd_

    md = np.ones((40, 16)) + 0.001 * np.random.default_rng(71).uniform(
        0, 1, (40, 16)
    )
    df = spark.createDataFrame(
        pd_.DataFrame(
            {"vec_id": range(40), "embedding": list(map(list, md))}
        )
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = similarity.cosine_near_dup_exact(df, 0.9, dense_guard=True)
        n = out.count()
    assert n == 40 * 39 // 2  # everything is a near-dup here
    assert any("non-selective" in str(w.message) for w in rec)


def test_hashed_tf_vectors_deterministic(spark):
    import hashlib

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b a", "a b a"]})
    )
    out = similarity.hashed_tf_vectors(docs).toPandas()
    v1, v2 = out.sort_values("doc")["embedding"].tolist()
    assert list(v1) == list(v2)
    assert sum(v1) == 3.0  # three tokens
    bucket_a = int(hashlib.md5(b"a").hexdigest()[:8], 16) % 64
    assert v1[bucket_a] == 2.0  # 'a' twice


def test_lsh_recall_reasonable(spark):
    df, m = _clustered_vecs(spark, 400)
    k = 3
    exact = similarity.cosine_topk_brute(df, df, k).toPandas()
    approx = similarity.cosine_topk_lsh(df, df, k, dim=32, n_planes=10).toPandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_auto_n_centroids_two_sizes(spark):
    """sqrt(n) sizing from plan stats on file-backed corpora (the intended
    use): both fixture sizes land within 2x of sqrt(n); a tiny corpus
    clamps to the 16 floor; 'auto' flows through build_ivf_index."""
    from geoengine.similarity import auto_n_centroids, build_ivf_index

    small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_s, n_b = small.count(), big.count()  # 500 / 2000
    a_s, a_b = auto_n_centroids(small), auto_n_centroids(big)
    for a, n in ((a_s, n_s), (a_b, n_b)):
        assert n ** 0.5 / 2 <= a <= n ** 0.5 * 2
    assert a_b > a_s  # monotone in corpus size
    # size-less in-memory source clamps to the floor (conservative:
    # too few cells means more exact work, never wrong results)
    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    assert auto_n_centroids(tiny) == 16
    cent, _ = build_ivf_index(tiny, n_centroids="auto", refine_iters=0)
    assert cent.shape[0] == 16
