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


class PIPSIPMppTPUInterface:
    """Facade wiring scaler -> solver -> postsolve (ctor order mirrors
    PIPSIPMppInterface.cpp:20-130)."""

    def __init__(self, lp, options: Optional[Options] = None):
        self.lp = lp
        self.options = options or Options()
        self.result = None
        self._scaler = None
        self._presolve_log = None

        from pips_ipmpp_tpu.ipm.solver import IPMSolver

        if isinstance(lp, DenseLP):
            from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend
            self._solver = IPMSolver(DenseBackend, self.options)
        elif isinstance(lp, ArrowheadLP):
            from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
            self._solver = IPMSolver(ArrowBackend, self.options)
        else:
            raise TypeError(f"unsupported problem type {type(lp)}")

    # ------------------------------------------------------------------
    def run(self) -> TerminationStatus:
        lp = self.lp
        if self.options.scaler != ScalerType.NONE:
            from pips_ipmpp_tpu.scale import make_scaler
            self._scaler = make_scaler(self.options.scaler)
            lp = self._scaler.scale(lp)
        self.result = self._solver.solve(lp)
        return self.result.status

    # ------------------------------------------------------------------
    def _require_result(self):
        if self.result is None:
            raise RuntimeError("call run() first")

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

    def gatherDualSolutionEq(self) -> np.ndarray:
        self._require_result()
        y = self.result.iterate.y
        if self._scaler is not None:
            y = self._scaler.unscale_y(y)
        if isinstance(self.lp, DenseLP):
            return np.asarray(y)
        return np.concatenate([np.asarray(y.first),
                               np.asarray(y.blocks).reshape(-1),
                               np.asarray(y.link)])

    def gatherDualSolutionIneq(self) -> np.ndarray:
        self._require_result()
        z = self.result.iterate.z
        if self._scaler is not None:
            z = self._scaler.unscale_z(z)
        if isinstance(self.lp, DenseLP):
            return np.asarray(z)
        return np.concatenate([np.asarray(z.first),
                               np.asarray(z.blocks).reshape(-1),
                               np.asarray(z.link)])
