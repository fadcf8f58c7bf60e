"""Public facade — the equivalent of the reference's PIPSIPMppInterface
(Core/Interface/PIPSIPMppInterface.hpp:32-128): construct from problem data
+ options; run() -> TerminationStatus; getObjective(); gather* accessors.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.lp import ArrowheadLP, DenseLP
from pips_ipmpp_tpu.core.options import Options, PresolverType, ScalerType
from pips_ipmpp_tpu.core.status import TerminationStatus


def resolve_factor_dtype(opts: Options):
    """Mixed-precision policy: factorize in f32 on accelerators (MXU speed;
    f64 on TPU is software-emulated and ~90x slower), f64 on CPU; residuals
    and refinement always run in the working dtype (f64 when x64 is on).
    The role of the reference's iterative-refinement accuracy absorption
    (LinearSystem.C:877, SURVEY.md §7 'fp64 vs fp32')."""
    import jax
    import jax.numpy as jnp
    if opts.factor_dtype == "float32":
        return jnp.float32
    if opts.factor_dtype == "float64":
        return jnp.float64
    if not jax.config.jax_enable_x64:
        return jnp.float32
    return (jnp.float32 if jax.devices()[0].platform != "cpu"
            else jnp.float64)


def _auto_groups(N: int) -> int:
    """Largest divisor of N not exceeding sqrt(N) (reference
    mapChildrenToNSubTrees picks ~sqrt(N) sub-roots, DistributedTree.h:166)."""
    import math
    best = 1
    for g in range(1, int(math.isqrt(N)) + 1):
        if N % g == 0:
            best = g
    return best


class PIPSIPMppTPUInterface:
    """Facade wiring scaler -> solver -> postsolve (ctor order mirrors
    PIPSIPMppInterface.cpp:20-130)."""

    def __init__(self, lp, options: Optional[Options] = None):
        self.lp = lp
        self.options = options or Options()
        self.result = None
        self._scaler = None
        self._presolve_log = None
        self._hier_meta = None
        self._orig_link_dims = None

        from functools import partial

        from pips_ipmpp_tpu.ipm.solver import IPMSolver

        fd = resolve_factor_dtype(self.options)
        if isinstance(lp, DenseLP):
            from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend
            self._solver = IPMSolver(partial(DenseBackend, factor_dtype=fd),
                                     self.options)
        elif isinstance(lp, ArrowheadLP):
            from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
            self._solver = IPMSolver(
                partial(ArrowBackend, factor_dtype=fd,
                        blockwise_sc=self.options.sc_blockwise),
                self.options)
        else:
            raise TypeError(f"unsupported problem type {type(lp)}")

    # ------------------------------------------------------------------
    def run(self) -> TerminationStatus:
        lp = self.lp
        # presolve (ArrowheadLP only; reference presolves before scaling,
        # PIPSIPMppInterface.cpp:39-57,101-119)
        if (self.options.presolve == PresolverType.PRESOLVE
                and isinstance(lp, ArrowheadLP)):
            from pips_ipmpp_tpu.presolve import Presolver
            pres = Presolver(max_rounds=self.options.presolve_max_rounds)
            self._presolve_log = pres.presolve(lp)
            if self._presolve_log.infeasible:
                self.result = None
                self._status_override = TerminationStatus.INFEASIBLE
                return TerminationStatus.INFEASIBLE
            lp = self._presolve_log.lp
        if self.options.scaler != ScalerType.NONE:
            from pips_ipmpp_tpu.scale import make_scaler
            self._scaler = make_scaler(self.options.scaler)
            lp = self._scaler.scale(lp)
        # hierarchical two-level Schur (reference switchToHierarchicalData,
        # PIPSIPMppInterface.cpp:81-89): transform last so every other
        # stage sees the flat layout
        if self.options.hierarchical and isinstance(lp, ArrowheadLP):
            from functools import partial

            from pips_ipmpp_tpu.ipm.solver import IPMSolver
            from pips_ipmpp_tpu.linalg.hier_backend import (
                HierArrowBackend, build_hierarchical_lp)
            ng = self.options.hierarchical_num_groups or _auto_groups(lp.N)
            self._orig_link_dims = (lp.mEl, lp.mIl)
            lp, self._hier_meta = build_hierarchical_lp(lp, ng)
            fd = resolve_factor_dtype(self.options)
            self._solver = IPMSolver(
                partial(HierArrowBackend, meta=self._hier_meta,
                        factor_dtype=fd), self.options)
        self.result = self._solver.solve(lp)
        self._postsolved = None
        return self.result.status

    # ------------------------------------------------------------------
    def _require_result(self):
        if self.result is None:
            raise RuntimeError("call run() first")

    def _postsolve(self):
        """Reconstruct the original-space solution if presolve ran
        (reference postsolveComputedSolution, PIPSIPMppInterface.cpp:531)."""
        if self._presolve_log is None:
            return None
        if getattr(self, "_postsolved", None) is not None:
            return self._postsolved
        from pips_ipmpp_tpu.presolve.postsolve import Postsolver, Solution
        it = self.result.iterate
        x = self._unscale_x(it)

        def parts(vec, which, factors):
            # np.array (copy): postsolve mutates these in place
            first = np.array(vec.first, np.float64)
            blocks = np.array(vec.blocks, np.float64)
            link = self._unpermute_link(np.array(vec.link, np.float64),
                                        which)
            if factors is not None:
                first = first * np.asarray(factors.first)
                blocks = blocks * np.asarray(factors.blocks)
                link = link * np.asarray(factors.link)
            return first, blocks, link

        y0, yN, yl = parts(it.y, "E",
                           self._scaler.rE if self._scaler else None)
        z0, zN, zl = parts(it.z, "I",
                           self._scaler.rC if self._scaler else None)
        sol = Solution(
            x0=np.array(x.first, np.float64),
            xN=np.array(x.blocks, np.float64),
            y0=y0, yN=yN, yl=yl, z0=z0, zN=zN, zl=zl)
        self._postsolved = Postsolver(self.lp).postsolve(
            self._presolve_log.events, sol)
        return self._postsolved

    @property
    def n_iterations(self) -> int:
        self._require_result()
        return self.result.iterations

    def getObjective(self) -> float:
        """Objective of the (unscaled) solution (reference
        PIPSIPMppInterface::getObjective :193-211)."""
        self._require_result()
        x = self.gatherPrimalSolution()
        if isinstance(self.lp, DenseLP):
            return float(np.dot(np.asarray(self.lp.c), x))
        lp = self.lp
        return float(np.dot(np.asarray(lp.c0), x[:lp.n0])
                     + np.dot(np.asarray(lp.cN).reshape(-1), x[lp.n0:]))

    def _unscale_x(self, it):
        if self._scaler is not None:
            return self._scaler.unscale_x(it.x)
        return it.x

    def gatherPrimalSolution(self) -> np.ndarray:
        self._require_result()
        ps = self._postsolve()
        if ps is not None:
            return np.concatenate([ps.x0, ps.xN.reshape(-1)])
        x = self._unscale_x(self.result.iterate)
        if isinstance(self.lp, DenseLP):
            return np.asarray(x)
        return np.concatenate([np.asarray(x.first),
                               np.asarray(x.blocks).reshape(-1)])

    def gatherEqualityConsValues(self) -> np.ndarray:
        self._require_result()
        it = self.result.iterate
        if isinstance(self.lp, DenseLP):
            return np.asarray(self.lp.A @ it.x)
        raise NotImplementedError

    def _unpermute_link(self, vec: np.ndarray, which: str) -> np.ndarray:
        """Map hierarchical-layout link vectors back to user row order."""
        if self._hier_meta is None:
            return vec
        meta = self._hier_meta
        perm = meta.permE if which == "E" else meta.permI
        size = (self._orig_link_dims[0] if which == "E"
                else self._orig_link_dims[1])
        out = np.zeros(size, vec.dtype)
        sel = perm >= 0
        out[perm[sel]] = vec[np.nonzero(sel)[0]]
        return out

    def _gather_row_dual(self, vec, which: str, factors) -> np.ndarray:
        """Unpermute (hier layout -> flat), then unscale, then flatten."""
        first = np.asarray(vec.first, np.float64)
        blocks = np.asarray(vec.blocks, np.float64)
        link = self._unpermute_link(np.asarray(vec.link, np.float64), which)
        if factors is not None:
            first = first * np.asarray(factors.first)
            blocks = blocks * np.asarray(factors.blocks)
            link = link * np.asarray(factors.link)
        return np.concatenate([first, blocks.reshape(-1), link])

    def gatherDualSolutionEq(self) -> np.ndarray:
        self._require_result()
        ps = self._postsolve()
        if ps is not None:
            return np.concatenate([ps.y0, ps.yN.reshape(-1), ps.yl])
        y = self.result.iterate.y
        if isinstance(self.lp, DenseLP):
            if self._scaler is not None:
                y = self._scaler.unscale_y(y)
            return np.asarray(y)
        rE = self._scaler.rE if self._scaler is not None else None
        return self._gather_row_dual(y, "E", rE)

    def gatherDualSolutionIneq(self) -> np.ndarray:
        self._require_result()
        ps = self._postsolve()
        if ps is not None:
            return np.concatenate([ps.z0, ps.zN.reshape(-1), ps.zl])
        z = self.result.iterate.z
        if isinstance(self.lp, DenseLP):
            if self._scaler is not None:
                z = self._scaler.unscale_z(z)
            return np.asarray(z)
        rC = self._scaler.rC if self._scaler is not None else None
        return self._gather_row_dual(z, "I", rC)
