"""Small dense NumPy oracle of the coherence-lattice math.

This is an independent, vectorized re-derivation of the reference semantics
(oscillink/core/{graph,solver,receipts}.py) kept deliberately dense and
simple.  The test suite checks the TPU-native k-sparse implementation against
this oracle at fixed seeds; it is NOT used on any production path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["DenseOracle"]


def mutual_knn_dense(
    Y: np.ndarray, k: int, deterministic: bool = False, seed: Optional[int] = None
) -> np.ndarray:
    """Dense mutual-kNN adjacency by cosine similarity (graph.py:8-66)."""
    n = Y.shape[0]
    if n <= 1:
        return np.zeros((n, n), dtype=np.float32)
    k = int(max(1, min(k, n - 1)))
    Yn = Y / (np.linalg.norm(Y, axis=1, keepdims=True) + 1e-12)
    S = Yn @ Yn.T
    np.fill_diagonal(S, -np.inf)
    if seed is not None and not deterministic:
        rng = np.random.default_rng(seed)
        S = S + rng.uniform(-1e-8, 1e-8, size=S.shape).astype(np.float32)
    # stable top-k: similarity desc, index asc — via argsort on (-S, idx)
    order = np.argsort(-S, axis=1, kind="stable")[:, :k]
    A = np.zeros((n, n), dtype=np.float32)
    rows = np.arange(n)[:, None]
    picked = S[rows, order].astype(np.float32)
    A[rows, order] = np.clip(picked, 0.0, None)
    M = ((A > 0) & (A.T > 0)).astype(np.float32)
    return np.maximum(A * M, (A * M).T)


def row_sum_cap_dense(A: np.ndarray, cap: float) -> np.ndarray:
    sums = A.sum(axis=1, keepdims=True) + 1e-12
    scale = np.minimum(1.0, cap / sums).astype(np.float32)
    return (A * np.sqrt(scale * scale.T)).astype(np.float32)


def laplacian_dense(A: np.ndarray):
    d = A.sum(axis=1)
    sqrt_deg = np.sqrt(np.maximum(d, 1e-12))
    inv = 1.0 / sqrt_deg
    W = A * inv[:, None] * inv[None, :]
    L = np.eye(A.shape[0], dtype=np.float32) - W.astype(np.float32)
    return L, sqrt_deg.astype(np.float32)


def cg_dense(A_mul, b, x0=None, M_diag=None, tol=1e-3, max_iters=100):
    if b.ndim == 1:
        b = b[:, None]
    x = np.zeros_like(b) if x0 is None else x0.copy()
    r = b - A_mul(x)
    z = r if M_diag is None else r / (M_diag[:, None] + 1e-12)
    p = z.copy()
    rz = (r * z).sum(axis=0)
    it, res = 0, np.inf
    for it in range(1, max_iters + 1):
        Ap = A_mul(p)
        alpha = rz / ((p * Ap).sum(axis=0) + 1e-18)
        x = x + p * alpha
        r = r - Ap * alpha
        res = float(np.linalg.norm(r, axis=0).max())
        if res <= tol:
            break
        z = r if M_diag is None else r / (M_diag[:, None] + 1e-12)
        rz_new = (r * z).sum(axis=0)
        p = z + p * (rz_new / (rz + 1e-18))
        rz = rz_new
    return x, it, res


class DenseOracle:
    """End-to-end dense lattice oracle: build, settle, U*, receipts."""

    def __init__(
        self,
        Y: np.ndarray,
        k: int = 6,
        row_cap: float = 1.0,
        lamG: float = 1.0,
        lamC: float = 0.5,
        lamQ: float = 4.0,
        deterministic_k: bool = False,
        seed: Optional[int] = None,
    ):
        self.Y = Y.astype(np.float32).copy()
        self.U = self.Y.copy()
        self.N, self.D = Y.shape
        self.lamG, self.lamC, self.lamQ, self.lamP = lamG, lamC, lamQ, 0.0
        A0 = mutual_knn_dense(self.Y, k, deterministic=deterministic_k, seed=seed)
        self.A = row_sum_cap_dense(A0, row_cap)
        self.L, self.sqrt_deg = laplacian_dense(self.A)
        self.L_path: Optional[np.ndarray] = None
        self.A_path: Optional[np.ndarray] = None
        self.B = np.ones(self.N, dtype=np.float32)
        self.psi = np.zeros(self.D, dtype=np.float32)

    def set_query(self, psi, gates=None):
        self.psi = psi.astype(np.float32)
        if gates is not None:
            self.B = gates.astype(np.float32)

    def add_chain(self, chain, lamP=0.2, weights=None):
        n = self.N
        if weights is None:
            weights = [1.0] * (len(chain) - 1)
        Ap = np.zeros((n, n), dtype=np.float32)
        for a in range(len(chain) - 1):
            i, j = int(chain[a]), int(chain[a + 1])
            if 0 <= i < n and 0 <= j < n:
                w = float(weights[a])
                Ap[i, j] = max(Ap[i, j], w)
                Ap[j, i] = max(Ap[j, i], w)
        self.L_path, _ = laplacian_dense(Ap)
        self.A_path = Ap
        self.lamP = float(lamP)

    def _M_mul(self, X):
        out = self.lamG * X + self.lamC * (self.L @ X) + self.lamQ * (self.B[:, None] * X)
        if self.L_path is not None and self.lamP > 0:
            out = out + self.lamP * (self.L_path @ X)
        return out

    def _rhs(self):
        return self.lamG * self.Y + self.lamQ * (self.B[:, None] * self.psi[None, :])

    def solve_ustar(self, tol=1e-4, max_iters=64):
        M_diag = self.lamG + self.lamQ * self.B + (
            self.lamP if self.L_path is not None else 0.0
        )
        x, it, res = cg_dense(
            self._M_mul, self._rhs(), x0=self.Y.copy(), M_diag=M_diag, tol=tol,
            max_iters=max_iters,
        )
        return x.astype(np.float32), it, res

    def settle(self, dt=1.0, max_iters=12, tol=1e-3):
        b = self.U + dt * self._rhs()

        def A_mul(X):
            return X + dt * self._M_mul(X)

        diag = 1.0 + dt * (
            self.lamG
            + self.lamQ * self.B
            + (self.lamP if self.L_path is not None else 0.0)
        )
        x, it, res = cg_dense(A_mul, b, x0=self.U.copy(), M_diag=diag, tol=tol,
                              max_iters=max_iters)
        self.U = x.astype(np.float32)
        return it, res

    def deltaH(self, U, Ustar):
        diff = (U - Ustar).astype(np.float32)
        return float(np.sum(diff * self._M_mul(diff)))

    def per_node(self, Ustar):
        di = self.sqrt_deg[:, None] + 1e-12
        Yn, Un = self.Y / di, Ustar / di
        dy2 = ((Yn[:, None, :] - Yn[None, :, :]) ** 2).sum(-1)
        du2 = ((Un[:, None, :] - Un[None, :, :]) ** 2).sum(-1)
        coh = (0.5 * self.lamC * self.A * (dy2 - du2)).sum(axis=1)
        anchor = self.lamG * ((Ustar - self.Y) ** 2).sum(axis=1)
        qp = Ustar - self.psi[None, :]
        query = self.lamQ * self.B * (qp * qp).sum(axis=1)
        return coh.astype(np.float32), anchor.astype(np.float32), query.astype(np.float32)

    def null_points(self, Ustar, z_th=3.0):
        di = self.sqrt_deg[:, None] + 1e-12
        Un = Ustar / di
        d2 = ((Un[:, None, :] - Un[None, :, :]) ** 2).sum(-1)
        R = self.lamC * self.A * d2.astype(np.float32)
        mu = R.mean(axis=1, keepdims=True)
        sigma = R.std(axis=1, keepdims=True) + 1e-12
        Z = (R - mu) / sigma
        out = []
        for i in range(self.N):
            j = int(np.argmax(Z[i]))
            if R[i, j] > 0 and Z[i, j] > z_th:
                out.append({"edge": [i, j], "z": float(Z[i, j]), "residual": float(R[i, j])})
        return out
