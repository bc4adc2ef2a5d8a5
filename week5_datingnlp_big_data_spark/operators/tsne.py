"""Exact t-SNE in pure NumPy — the driver-side projection engine behind
``ml.tsne_driver`` (reference M7: Rtsne call, Week5_datingNLP.R:319).

t-SNE has no distributed formulation (every point's gradient needs every
other point), so this is inherently a bounded-collect driver-side
operator; the Spark side's job is only to produce a *small* projectable
frame (sample/aggregate first). Implementation follows the published
algorithm (van der Maaten & Hinton, "Visualizing Data using t-SNE",
JMLR 2008): per-point precision calibrated to a target perplexity by
binary search, symmetrized joint probabilities with early exaggeration,
and momentum gradient descent on the Student-t low-dimensional
affinities. O(N²) memory/step — capped by the caller.

Deterministic for a fixed seed (NumPy Generator; no global RNG state).
"""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(X: np.ndarray) -> np.ndarray:
    s = (X * X).sum(axis=1)
    D = s[:, None] + s[None, :] - 2.0 * (X @ X.T)
    np.fill_diagonal(D, 0.0)
    return np.maximum(D, 0.0)


def _hbeta(D_row: np.ndarray, beta: float) -> tuple[float, np.ndarray]:
    """Shannon entropy H and probability row P for precision beta."""
    P = np.exp(-D_row * beta)
    sumP = max(P.sum(), 1e-12)
    H = np.log(sumP) + beta * float(D_row @ P) / sumP
    return H, P / sumP


def _joint_probabilities(
    X: np.ndarray, perplexity: float, tol: float = 1e-5, max_tries: int = 50
) -> np.ndarray:
    n = X.shape[0]
    D = _pairwise_sq_dists(X)
    P = np.zeros((n, n))
    logU = np.log(perplexity)
    for i in range(n):
        idx = np.concatenate([np.arange(i), np.arange(i + 1, n)])
        Di = D[i, idx]
        beta, betamin, betamax = 1.0, -np.inf, np.inf
        H, thisP = _hbeta(Di, beta)
        for _ in range(max_tries):
            if abs(H - logU) < tol:
                break
            if H > logU:
                betamin = beta
                beta = beta * 2.0 if betamax == np.inf else (beta + betamax) / 2.0
            else:
                betamax = beta
                beta = beta / 2.0 if betamin == -np.inf else (beta + betamin) / 2.0
            H, thisP = _hbeta(Di, beta)
        P[i, idx] = thisP
    P = (P + P.T) / (2.0 * n)
    return np.maximum(P, 1e-12)


def tsne_exact(
    X: np.ndarray,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 400,
    learning_rate: float = 200.0,
    early_exaggeration: float = 4.0,
    seed: int = 42,
) -> np.ndarray:
    """Project X (n_samples × n_features, float) to ``n_components`` dims.

    Perplexity is clamped to (n-1)/3 so tiny inputs stay well-posed (the
    binary search needs enough neighbors to spend the entropy budget on).
    """
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n < 4:
        raise ValueError(f"t-SNE needs at least 4 rows; got {n}")
    perplexity = min(perplexity, max((n - 1) / 3.0, 1.01))

    P = _joint_probabilities(X, perplexity) * early_exaggeration

    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, n_components)) * 1e-4
    dY = np.zeros_like(Y)
    gains = np.ones_like(Y)
    momentum, final_momentum = 0.5, 0.8

    for it in range(n_iter):
        # Student-t affinities in the embedding
        num = 1.0 / (1.0 + _pairwise_sq_dists(Y))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)

        PQ = (P - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ Y)

        m = momentum if it < 20 else final_momentum
        gains = np.where(np.sign(grad) != np.sign(dY), gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        dY = m * dY - learning_rate * gains * grad
        Y += dY
        Y -= Y.mean(axis=0)

        # End early exaggeration a quarter of the way in (iteration 100 at
        # the default 400) — pinned to n_iter so short runs still optimize
        # the true objective for most of their iterations.
        if it == min(100, max(n_iter // 4, 1)):
            P /= early_exaggeration
    return Y
