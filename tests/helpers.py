"""Shared test helpers: interior iterates, full-Newton oracle residuals,
structured<->flat mappings."""
import jax
import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.spaces import RVec, XVec
from pips_ipmpp_tpu.ipm import formulation as F

tmap = jax.tree.map


def interior_iterate(be, key):
    """Random strictly-interior iterate (not necessarily feasible)."""
    it = F.initial_iterate(be, 1.0)
    bd = be.bounds
    counter = [0]

    def rand_like(template, positive):
        leaves, treedef = jax.tree.flatten(template)
        out = []
        for leaf in leaves:
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            if positive:
                out.append(jax.random.uniform(k, np.shape(leaf),
                                              minval=0.2, maxval=2.0))
            else:
                out.append(jax.random.normal(k, np.shape(leaf)))
        return jax.tree.unflatten(treedef, out)

    def perturb(val, mask=None, positive=True):
        r = rand_like(val, positive)
        if mask is not None:
            r = tmap(lambda m, rr, v: jnp.where(m > 0, rr, v), mask, r, val)
        return r

    return F.Iterate(
        x=perturb(it.x, positive=False), s=perturb(it.s, positive=False),
        y=perturb(it.y, positive=False), z=perturb(it.z, positive=False),
        v=perturb(it.v, bd.ixlow), w=perturb(it.w, bd.ixupp),
        t=perturb(it.t, bd.iclow), u=perturb(it.u, bd.icupp),
        gamma=perturb(it.gamma, bd.ixlow), phi=perturb(it.phi, bd.ixupp),
        lam=perturb(it.lam, bd.iclow), pi=perturb(it.pi, bd.icupp),
    )


def newton_residuals(be, it, d, res, comp):
    """Residuals of the linearized 12-equation KKT system at step d
    (all should vanish when delta_p = delta_d = 0). Backend-generic."""
    bd = be.bounds
    out = {}
    out["stat"] = tmap(lambda a, c, g, p, r: -a - c - g + p + r,
                       be.ATy(d.y), be.CTz(d.z), d.gamma, d.phi, res.rL)
    out["eq"] = tmap(lambda a, r: a + r, be.Ax(d.x), res.rA)
    out["ineq"] = tmap(lambda c, s, r: c - s + r, be.Cx(d.x), d.s, res.rC)
    out["z"] = tmap(lambda z, l, p, r: z - l + p + r, d.z, d.lam, d.pi, res.rz)
    out["v"] = tmap(lambda m, dx, dv, r: m * (dx - dv) + r,
                    bd.ixlow, d.x, d.v, res.rv)
    out["w"] = tmap(lambda m, dx, dw, r: m * (-dx - dw) + r,
                    bd.ixupp, d.x, d.w, res.rw)
    out["t"] = tmap(lambda m, ds, dt, r: m * (ds - dt) + r,
                    bd.iclow, d.s, d.t, res.rt)
    out["u"] = tmap(lambda m, ds, du, r: m * (-ds - du) + r,
                    bd.icupp, d.s, d.u, res.ru)
    out["cG"] = tmap(lambda m, g, dv, v, dg, r: m * (g * dv + v * dg) + r,
                     bd.ixlow, it.gamma, d.v, it.v, d.gamma, comp.rG)
    out["cP"] = tmap(lambda m, p, dw, w, dp, r: m * (p * dw + w * dp) + r,
                     bd.ixupp, it.phi, d.w, it.w, d.phi, comp.rP)
    out["cL"] = tmap(lambda m, l, dt, t, dl, r: m * (l * dt + t * dl) + r,
                     bd.iclow, it.lam, d.t, it.t, d.lam, comp.rLam)
    out["cPi"] = tmap(lambda m, p, du, u, dp, r: m * (p * du + u * dp) + r,
                      bd.icupp, it.pi, d.u, it.u, d.pi, comp.rPi)
    return out


def max_newton_error(nres) -> float:
    errs = {}
    for name, r in nres.items():
        errs[name] = max(float(jnp.max(jnp.abs(leaf))) if leaf.size else 0.0
                         for leaf in jax.tree.leaves(r))
    return errs


def flatten_x(x: XVec) -> np.ndarray:
    return np.concatenate([np.asarray(x.first),
                           np.asarray(x.blocks).reshape(-1)])


def flatten_r(r: RVec) -> np.ndarray:
    return np.concatenate([np.asarray(r.first),
                           np.asarray(r.blocks).reshape(-1),
                           np.asarray(r.link)])
