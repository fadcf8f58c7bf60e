r"""Banded (block-tridiagonal) leaf factorization: the structure-exploiting
direct solver for blocks whose condensed normal equations are sparse.

The reference factors each block's sparse augmented KKT with a multifrontal
sparse LDL^T (PardisoSchurSolver.C:84-252, symbolic analysis in
`firstSolveCall`, numeric factor + Schur per iteration).  A literal sparse
supernodal factorization maps poorly to the TPU (dynamic gather/scatter,
tiny irregular fronts).  The TPU-native equivalent implemented here keeps
the same separation:

  symbolic (host, once):  the sparsity pattern of Neq_i = M_i E^{-1} M_i'
      is the row-connectivity graph of M_i = [B_i; D_i] (rows adjacent iff
      they share a variable).  A reverse-Cuthill-McKee ordering per block
      bounds its profile; the max half-bandwidth h over blocks is rounded
      up to a panel size b.  (The role of PARDISO's fill-reducing METIS
      ordering.)
  numeric (device, per IPM iteration):  with bandwidth <= b the permuted
      Neq is *block tridiagonal* in [N, nb, b, b] panels.  One lax.scan of
      length nb runs the batched block-Cholesky recurrence

          G_k G_k' = A_kk - C_{k-1} C_{k-1}',    C_k = A_{k+1,k} G_k^{-T}

      entirely out of [N, b, b] MXU matmuls (all N blocks at once), storing
      the per-panel inverses G_k^{-1} so every subsequent solve is a scan
      of batched matmuls — no triangular sweeps over the full dimension.

Memory: O(N a b) for the factors instead of O(N a^2) for the dense
explicit inverse; forming the band costs O(nb b^2 n) instead of O(a^2 n).
For a 10^4-row block at bandwidth 256 that is a ~20x reduction — the
regime (power-grid / time-coupled dispatch rows with local support) where
the reference's sparse solver operates and a dense [a, a] factor cannot.

The backend plugs into ArrowBackend via the two leaf hooks
(`_leaf_factor` / `_apply_Ninv_multi`); condensation, borders, Schur
assembly, root, refinement, and the IPM above are all unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.lp import ArrowheadLP
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend


@dataclass(frozen=True)
class BandPlan:
    """Host-side symbolic analysis result (static under jit)."""
    perm: np.ndarray       # [N, a] original row index in permuted position
    iperm: np.ndarray      # [N, a] permuted position of original row
    half_bandwidth: int    # max over blocks, in the permuted order
    panel: int             # block-tridiagonal panel size b (>= half_bw)
    n_panels: int          # nb; nb * b >= a


def plan_banded(lp: ArrowheadLP, panel: Optional[int] = None,
                min_panel: int = 8, shared: bool = False) -> BandPlan:
    """Symbolic analysis: RCM-order each block's row-connectivity graph.

    `lp` must be concrete (host numpy); the returned plan is baked into
    the backend as static data, like PARDISO's reusable symbolic
    factorization (firstSolveCall, PardisoSchurSolver.C:84).

    `shared=True` computes ONE ordering from the union pattern of all
    blocks (perm/iperm are 1-D [a]).  Use it when blocks share the model
    structure (multi-scenario instances) and for the distributed path:
    inside shard_map each device holds a block shard and a per-block
    permutation table cannot be closed over, but a block-independent one
    can."""
    from scipy import sparse
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    B = np.asarray(lp.B)
    D = np.asarray(lp.D)
    N = B.shape[0]
    a = B.shape[1] + D.shape[1]

    def rcm_of(pattern):
        M = sparse.csr_matrix(pattern.astype(np.int8))
        S = (M @ M.T).tocsr()
        p = np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True),
                       np.int32)
        pos = np.empty(a, np.int64)
        pos[p] = np.arange(a)
        coo = S.tocoo()
        h = int(np.max(np.abs(pos[coo.row] - pos[coo.col]))) if coo.nnz \
            else 1
        return p, max(h, 1)

    if shared:
        union = (np.abs(B) > 0).any(axis=0)
        union = np.concatenate([union, (np.abs(D) > 0).any(axis=0)], axis=0)
        perms, h = rcm_of(union)
        iperms = np.argsort(perms).astype(np.int32)
    else:
        perms = np.empty((N, a), np.int32)
        h = 1
        for i in range(N):
            p, hi = rcm_of(np.concatenate([B[i], D[i]], axis=0) != 0.0)
            perms[i] = p
            h = max(h, hi)
        iperms = np.argsort(perms, axis=1).astype(np.int32)
    if panel is None:
        panel = max(min_panel, -(-h // min_panel) * min_panel)
    elif panel < h:
        raise ValueError(f"panel {panel} < half-bandwidth {h}")
    n_panels = -(-a // panel)
    return BandPlan(perm=perms, iperm=iperms, half_bandwidth=h,
                    panel=panel, n_panels=n_panels)


def _bmm(x, y, tb=False):
    dn = (((2,), (2 if tb else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(x, y, dimension_numbers=dn,
                               preferred_element_type=x.dtype)


def block_tridiag_factor(Adiag, Asub):
    """Batched block-tridiagonal Cholesky with explicit panel inverses.

    Adiag [nb, N, b, b] diagonal panels, Asub [nb, N, b, b] with Asub[k] =
    A_{k+1,k} (the last entry ignored).  Returns (Ginv, C, ok):
    Ginv[k] = G_k^{-1} (lower), C[k] = A_{k+1,k} G_k^{-T}."""
    nb, N, b, _ = Adiag.shape
    eye = jnp.broadcast_to(jnp.eye(b, dtype=Adiag.dtype), (N, b, b))

    def step(Cprev, inp):
        Akk, Ak1k = inp
        S = Akk - _bmm(Cprev, Cprev, tb=True)
        G = jnp.linalg.cholesky(S)
        Ginv = jax.lax.linalg.triangular_solve(
            G, eye, left_side=True, lower=True)
        Ck = _bmm(Ak1k, Ginv, tb=True)          # A_{k+1,k} G^{-T}
        return Ck, (Ginv, Ck)

    C0 = jnp.zeros((N, b, b), Adiag.dtype)
    _, (Ginv, C) = jax.lax.scan(step, C0, (Adiag, Asub))
    ok = jnp.all(jnp.isfinite(Ginv))
    return Ginv, C, ok


def block_tridiag_solve(Ginv, C, r):
    """Solve (L L') x = r with L from block_tridiag_factor.

    r [nb, N, b, c]; returns x of the same shape.  Two scans of batched
    [N, b, b] x [N, b, c] matmuls (forward then backward substitution)."""
    nb, N, b, c = r.shape
    z = jnp.zeros((N, b, c), r.dtype)

    def fwd(yprev, inp):
        Ginv_k, Cprev, rk = inp
        yk = _bmm(Ginv_k, rk - _bmm(Cprev, yprev))
        return yk, yk

    Cshift = jnp.concatenate([jnp.zeros_like(C[:1]), C[:-1]], axis=0)
    _, y = jax.lax.scan(fwd, z, (Ginv, Cshift, r))

    def bwd(xnext, inp):
        Ginv_k, Ck, yk = inp
        # x_k = G_k^{-T} (y_k - C_k' x_{k+1})
        t = yk - _bmm(jnp.swapaxes(Ck, 1, 2), xnext)
        xk = _bmm(jnp.swapaxes(Ginv_k, 1, 2), t)
        return xk, xk

    _, xrev = jax.lax.scan(bwd, z, (Ginv, C, y), reverse=True)
    return xrev


class BandArrowBackend(ArrowBackend):
    """ArrowBackend whose leaf factorization is banded (block tridiagonal).

    Construct with a `BandPlan` from `plan_banded` (static, host-side).
    All other machinery — condensation, border solves, Schur assembly,
    root, refinement, distribution — is inherited."""

    def __init__(self, lp: ArrowheadLP, plan: BandPlan, **kw):
        kw.setdefault("explicit_inverse", False)
        super().__init__(lp, **kw)
        # the band path owns the leaf; disable the dense leaf kernels
        self.ldl_kernel = False
        self.pallas_chol = False
        self.explicit_inverse = False
        self.plan = plan
        self._perm = jnp.asarray(plan.perm)
        self._iperm = jnp.asarray(plan.iperm)

    def _permute(self, arr, perm):
        """Gather rows (axis 1) by a [N, a] or shared [a] permutation."""
        if perm.ndim == 1:
            return jnp.take(arr, perm, axis=1)
        idx = perm if arr.ndim == 2 else perm[:, :, None]
        return jnp.take_along_axis(arr, idx, axis=1)

    # ---- leaf hooks ----
    def _leaf_factor(self, M, MEi, Fd):
        fd = self.factor_dtype
        b, nb = self.plan.panel, self.plan.n_panels
        N, a, n = M.shape
        ap = nb * b

        Mp = self._permute(M, self._perm)
        MEip = self._permute(MEi, self._perm)
        Fdp = self._permute(Fd, self._perm)
        if ap > a:
            # pad with identity rows (decoupled, unit pivot)
            zrow = jnp.zeros((N, ap - a, n), M.dtype)
            Mp = jnp.concatenate([Mp, zrow], axis=1)
            MEip = jnp.concatenate([MEip, zrow], axis=1)
            Fdp = jnp.concatenate(
                [Fdp, jnp.ones((N, ap - a), Fd.dtype)], axis=1)

        Mr = Mp.reshape(N, nb, b, n).astype(fd)
        Er = MEip.reshape(N, nb, b, n).astype(fd)
        # only the tridiagonal band of Neq is formed (entries outside are
        # structurally zero by the bandwidth bound): [nb, N, b, b]
        Adiag = (jnp.einsum("iKan,iKcn->Kiac", Er, Mr)
                 + jax.vmap(jax.vmap(jnp.diag))(
                     Fdp.reshape(N, nb, b).astype(fd)).transpose(1, 0, 2, 3))
        Asub = jnp.concatenate([
            jnp.einsum("iKan,iKcn->Kiac", Er[:, 1:], Mr[:, :-1]),
            jnp.zeros((1, N, b, b), fd)], axis=0)
        Ginv, C, ok = block_tridiag_factor(Adiag, Asub)
        return (Ginv, C), jnp.zeros((), fd), ok

    def _apply_Ninv_multi(self, L, Ninv, t):
        Ginv, C = L
        b, nb = self.plan.panel, self.plan.n_panels
        N, a, c = t.shape
        tp = self._permute(t, self._perm)
        if nb * b > a:
            tp = jnp.concatenate(
                [tp, jnp.zeros((N, nb * b - a, c), t.dtype)], axis=1)
        r = tp.reshape(N, nb, b, c).transpose(1, 0, 2, 3)
        x = block_tridiag_solve(Ginv, C, r)
        xp = x.transpose(1, 0, 2, 3).reshape(N, nb * b, c)[:, :a]
        return self._permute(xp, self._iperm)
