"""ppmi_embeddings (operators/graph.py): distributed subspace iteration
over the sparse PPMI matrix vs a dense numpy eigensolve — Levy-Goldberg
SVD semantics (dominant-|λ| subspace, √|λ| scaling, signed λ reported),
orthogonality, rank-k reconstruction, determinism, and validation."""

import numpy as np
import pytest

from legal_ner_spark.operators import graph


def _planted(rng, n, rank, decay=4.0):
    """Dense symmetric PSD matrix with a clean spectral gap."""
    q, _ = np.linalg.qr(rng.standard_normal((n, rank)))
    lam = np.array([decay ** (rank - i) for i in range(rank)])
    return q @ np.diag(lam) @ q.T


def _svd_truth(a, k):
    """Top-k |λ| eigenpairs and the Q|Λ|Qᵀ reconstruction."""
    w, v = np.linalg.eigh(a)
    idx = np.argsort(-np.abs(w))[:k]
    return w[idx], v[:, idx] @ np.diag(np.abs(w[idx])) @ v[:, idx].T


def _to_ppmi_df(spark, a, names):
    rows = []
    n = a.shape[0]
    for i in range(n):
        for j in range(n):
            if abs(a[i, j]) > 1e-12:
                rows.append((names[i], names[j], float(a[i, j])))
    return spark.createDataFrame(
        rows, "center string, context string, ppmi double")


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    n, rank = 12, 3
    a = _planted(rng, n, rank)
    names = [f"n{i:02d}" for i in range(n)]
    df = _to_ppmi_df(spark, a, names).cache()
    df.count()
    yield a, names, df
    df.unpersist()


def _collect_emb(out, names, dim):
    rows = {r["node"]: (r["emb"], r["lam"]) for r in out.collect()}
    e = np.array([rows[nm][0] for nm in names])
    lam = np.array(rows[names[0]][1])
    return e, lam


def test_eigenvalues_match_numpy(planted, spark):
    a, names, df = planted
    out = graph.ppmi_embeddings(df, dim=3, n_iter=25)
    e, lam = _collect_emb(out, names, 3)
    want, _ = _svd_truth(a, 3)
    assert np.allclose(lam, want, rtol=1e-4, atol=1e-6)


def test_rank_k_reconstruction(planted, spark):
    a, names, df = planted
    out = graph.ppmi_embeddings(df, dim=3, n_iter=25)
    e, lam = _collect_emb(out, names, 3)
    # PSD planted matrix: E·Eᵀ = the best rank-3 approximation of A
    _, want = _svd_truth(a, 3)
    assert np.allclose(e @ e.T, want, atol=1e-3)


def test_embedding_columns_orthogonal_scaled(planted, spark):
    a, names, df = planted
    out = graph.ppmi_embeddings(df, dim=3, n_iter=25)
    e, lam = _collect_emb(out, names, 3)
    # EᵀE = diag(|λ|) since E = Q·V·√|λ| with orthonormal Q·V
    assert np.allclose(e.T @ e, np.diag(np.abs(lam)), atol=1e-3)


def test_deterministic_across_runs(planted, spark):
    a, names, df = planted
    e1, l1 = _collect_emb(
        graph.ppmi_embeddings(df, dim=2, n_iter=10), names, 2)
    e2, l2 = _collect_emb(
        graph.ppmi_embeddings(df, dim=2, n_iter=10), names, 2)
    assert np.allclose(e1, e2, atol=1e-9)
    assert np.allclose(l1, l2, atol=1e-9)


def test_asymmetric_input_is_symmetrized(spark):
    # A fed as an asymmetric half must behave as (A + Aᵀ)/2
    rows = [("a", "b", 2.0), ("b", "c", 4.0)]   # no reverse rows
    df = spark.createDataFrame(
        rows, "center string, context string, ppmi double")
    out = graph.ppmi_embeddings(df, dim=2, n_iter=25)
    names = ["a", "b", "c"]
    e, lam = _collect_emb(out, names, 2)
    a = np.array([[0, 1, 0], [1, 0, 2], [0, 2, 0.]])
    want_lam, want_rec = _svd_truth(a, 2)   # ±√5: signed, |λ|-ordered
    assert np.allclose(sorted(lam), sorted(want_lam), rtol=1e-4, atol=1e-6)
    assert np.allclose(e @ e.T, want_rec, atol=1e-3)


def test_dim_validation(planted, spark):
    _, _, df = planted
    with pytest.raises(ValueError, match="dim"):
        graph.ppmi_embeddings(df, dim=13)
    with pytest.raises(ValueError, match="dim"):
        graph.ppmi_embeddings(df, dim=0)


def test_signed_lambda_keeps_negative_directions(spark):
    # a 2-node seesaw: spectrum {+3, -3}; SVD semantics keep BOTH
    # directions at scale √3 and report the signed λ so callers can
    # drop the negative one for a PSD factorization
    df = spark.createDataFrame(
        [("a", "b", 3.0), ("b", "a", 3.0)],
        "center string, context string, ppmi double")
    out = graph.ppmi_embeddings(df, dim=2, n_iter=15)
    rows = {r["node"]: np.array(r["emb"]) for r in out.collect()}
    lam = np.array(out.select("lam").first()[0])
    assert np.allclose(np.sort(lam), [-3.0, 3.0], atol=1e-6)
    g = np.array([rows["a"], rows["b"]])
    # E·Eᵀ = Q|Λ|Qᵀ = 3·I for the seesaw
    assert np.allclose(g @ g.T, [[3.0, 0.0], [0.0, 3.0]], atol=1e-4)
