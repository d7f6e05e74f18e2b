"""Minimal UMAP: fuzzy-simplicial-set construction + SGD layout.

umap-learn is not installed in this image, and the reference's
CLS-embedding projection is a real UMAP
(/root/reference/src/umap_cls_token.py:141 — ``UMAP(n_neighbors=3,
min_dist=0.5, n_components=3, random_state=42, metric='l2',
n_epochs=500)``).  Rather than silently shipping a PCA projection under
the "umap" artifact name (round-1 gap), this module implements the UMAP
algorithm itself (McInnes et al., 2018) for the small embedding sets the
pipeline produces (hundreds of CLS vectors):

1. exact kNN graph under the given metric,
2. per-point fuzzy membership: ``exp(-(d - ρ)/σ)`` with ρ the nearest
   distance and σ binary-searched so the effective neighborhood size is
   ``log2(k)``,
3. probabilistic t-conorm symmetrization ``W + Wᵀ − W∘Wᵀ``,
4. spectral initialisation from the symmetric normalised Laplacian,
5. negative-sampling SGD on the low-dimensional layout with the standard
   ``1 / (1 + a·d^{2b})`` attractive kernel, a/b fitted from
   min_dist/spread.

Deterministic given ``random_state``.  Everything is NumPy; N² memory is
fine at this scale (the reference feeds it at most a few thousand rows).
"""

from __future__ import annotations

import numpy as np

__all__ = ["umap_project", "fuzzy_simplicial_set", "fit_ab"]

SMOOTH_TOL = 1e-5
SMOOTH_ITER = 64
MIN_K_DIST_SCALE = 1e-3


def _pairwise_l2(x: np.ndarray) -> np.ndarray:
    sq = np.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    np.maximum(d2, 0.0, out=d2)
    return np.sqrt(d2)


def _smooth_knn_dist(knn_d: np.ndarray, k: int):
    """(ρ, σ) per point: σ solves Σ exp(-(d-ρ)/σ) = log2(k)."""
    target = np.log2(k)
    n = knn_d.shape[0]
    rho = np.zeros(n)
    sigma = np.zeros(n)
    mean_all = knn_d.mean() if knn_d.size else 1.0
    for i in range(n):
        non_zero = knn_d[i][knn_d[i] > 0.0]
        rho[i] = non_zero[0] if non_zero.size else 0.0
        lo, hi, mid = 0.0, np.inf, 1.0
        for _ in range(SMOOTH_ITER):
            psum = np.sum(np.exp(-np.maximum(knn_d[i] - rho[i], 0.0) / mid))
            if abs(psum - target) < SMOOTH_TOL:
                break
            if psum > target:
                hi = mid
                mid = (lo + hi) / 2.0
            else:
                lo = mid
                mid = mid * 2.0 if hi == np.inf else (lo + hi) / 2.0
        sigma[i] = mid
        # umap-learn's lower bound keeps σ meaningful for duplicate rows
        mean_i = knn_d[i].mean() if knn_d[i].size else mean_all
        floor = MIN_K_DIST_SCALE * (mean_i if rho[i] > 0.0 else mean_all)
        sigma[i] = max(sigma[i], floor)
    return rho, sigma


def fuzzy_simplicial_set(
    x: np.ndarray, n_neighbors: int
) -> np.ndarray:
    """Symmetrized fuzzy graph weights (dense (N, N), zero diagonal)."""
    n = x.shape[0]
    k = min(n_neighbors, n - 1)
    dist = _pairwise_l2(x)
    order = np.argsort(dist, axis=1)
    # nearest k excluding self (column 0 after argsort)
    knn_idx = order[:, 1:k + 1]
    knn_d = np.take_along_axis(dist, knn_idx, axis=1)
    rho, sigma = _smooth_knn_dist(knn_d, k)

    w = np.zeros((n, n))
    rows = np.repeat(np.arange(n), k)
    cols = knn_idx.ravel()
    vals = np.exp(
        -np.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None]
    ).ravel()
    w[rows, cols] = vals
    return w + w.T - w * w.T


def fit_ab(min_dist: float, spread: float = 1.0) -> tuple[float, float]:
    """Fit the ``1/(1+a·d^{2b})`` kernel to the target offset-exponential
    (umap-learn's find_ab_params)."""
    from scipy.optimize import curve_fit

    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(
        xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread)
    )

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    (a, b), _ = curve_fit(curve, xv, yv, p0=(1.0, 1.0), maxfev=10000)
    return float(a), float(b)


def _spectral_init(w: np.ndarray, dim: int, rng) -> np.ndarray:
    deg = w.sum(axis=1)
    inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    lap = np.eye(w.shape[0]) - (inv_sqrt[:, None] * w * inv_sqrt[None, :])
    try:
        vals, vecs = np.linalg.eigh(lap)
        emb = vecs[:, 1:dim + 1]
        scale = 10.0 / max(np.abs(emb).max(), 1e-12)
        emb = emb * scale
    except np.linalg.LinAlgError:  # pragma: no cover - degenerate graph
        emb = rng.uniform(-10, 10, size=(w.shape[0], dim))
    return emb + rng.normal(scale=1e-4, size=emb.shape)


def umap_project(
    x: np.ndarray,
    n_components: int = 3,
    n_neighbors: int = 3,
    min_dist: float = 0.5,
    spread: float = 1.0,
    n_epochs: int = 500,
    learning_rate: float = 1.0,
    negative_sample_rate: int = 5,
    random_state: int = 42,
) -> np.ndarray:
    """UMAP layout of ``x`` (N, D) → (N, n_components).

    Defaults match the reference call (umap_cls_token.py:141).
    """
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    if n <= n_components:
        # fewer points than output dims: any isometric placement works
        out = np.zeros((n, n_components))
        out[:, 0] = np.arange(n)
        return out
    rng = np.random.default_rng(random_state)
    w = fuzzy_simplicial_set(x, n_neighbors)
    a, b = fit_ab(min_dist, spread)
    emb = _spectral_init(w, n_components, rng)

    # edge sampling schedule (umap-learn's epochs_per_sample)
    rows, cols = np.nonzero(w)
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    weights = w[rows, cols]
    if weights.size == 0:
        return emb
    eps = weights.max() / n_epochs
    rows, cols, weights = (
        rows[weights > eps], cols[weights > eps], weights[weights > eps]
    )
    epochs_per_sample = weights.max() / weights
    next_due = epochs_per_sample.copy()

    # Batched SGD: umap-learn applies edge updates asynchronously (numba
    # prange over edges); here each epoch's active edges are processed
    # as one vectorised batch (gradients at epoch-start positions for
    # the attractive phase, post-attractive positions for the negative
    # phase, scatter-accumulated with np.add.at).  Same stochastic
    # layout dynamics, deterministic given random_state, and ~1000×
    # faster than a per-edge Python loop at the module's stated scale.
    clip = 4.0
    for epoch in range(n_epochs):
        alpha = learning_rate * (1.0 - epoch / n_epochs)
        idx = np.nonzero(next_due <= epoch + 1)[0]
        if idx.size == 0:
            continue
        i, j = rows[idx], cols[idx]

        diff = emb[i] - emb[j]                       # (E, dim)
        d2 = np.einsum("ed,ed->e", diff, diff)
        with np.errstate(divide="ignore", invalid="ignore"):
            coef = np.where(
                d2 > 0.0,
                (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2 ** b),
                0.0,
            )
        g = np.clip(coef[:, None] * diff, -clip, clip)
        np.add.at(emb, i, alpha * g)
        np.add.at(emb, j, -alpha * g)

        # negative samples for each active edge's head
        j_neg = rng.integers(0, n, size=(idx.size, negative_sample_rate))
        diff_n = emb[i][:, None, :] - emb[j_neg]     # (E, R, dim)
        d2_n = np.sum(diff_n * diff_n, axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            coef_n = np.where(
                d2_n > 0.0,
                (2.0 * b) / ((0.001 + d2_n) * (1.0 + a * d2_n ** b)),
                0.0,
            )
        g_n = np.clip(coef_n[..., None] * diff_n, -clip, clip)
        g_n = np.where(d2_n[..., None] > 0.0, g_n, clip)   # coincident
        g_n = np.where((j_neg != i[:, None])[..., None], g_n, 0.0)
        np.add.at(emb, i, alpha * g_n.sum(axis=1))

        next_due[idx] += epochs_per_sample[idx]
    return emb
