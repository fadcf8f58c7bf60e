"""Oracle tests: the reduced/condensed KKT solve must satisfy the FULL
linearized 12-equation Newton system (checked residual-by-residual) — this
verifies the entire elimination/recovery chain in ipm/formulation.py against
first principles, independent of the reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.ipm import formulation as F
from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend, random_dense_lp

tmap = jax.tree.map


def interior_iterate(be, key):
    """Random strictly-interior iterate (not necessarily feasible)."""
    it = F.initial_iterate(be, 1.0)
    ks = jax.random.split(key, 12)
    bd = be.bounds

    def perturb(k, val, mask=None, positive=True):
        r = jax.random.uniform(k, np.shape(val), minval=0.2, maxval=2.0)
        out = val * 0 + r if positive else jax.random.normal(k, np.shape(val))
        if mask is not None:
            out = jnp.where(mask > 0, out, val)
        return out

    return F.Iterate(
        x=perturb(ks[0], it.x, positive=False),
        s=perturb(ks[1], it.s, positive=False),
        y=perturb(ks[2], it.y, positive=False),
        z=perturb(ks[3], it.z, positive=False),
        v=perturb(ks[4], it.v, bd.ixlow), w=perturb(ks[5], it.w, bd.ixupp),
        t=perturb(ks[6], it.t, bd.iclow), u=perturb(ks[7], it.u, bd.icupp),
        gamma=perturb(ks[8], it.gamma, bd.ixlow),
        phi=perturb(ks[9], it.phi, bd.ixupp),
        lam=perturb(ks[10], it.lam, bd.iclow),
        pi=perturb(ks[11], it.pi, bd.icupp),
    )


def newton_residuals(be, it, d, res, comp):
    """Residuals of the linearized 12-equation KKT system at step d.
    All should vanish (delta_p = delta_d = 0)."""
    bd = be.bounds
    out = {}
    # 1: -A'dy - C'dz - dgamma + dphi + rL = 0
    out["stat"] = tmap(lambda a, c, g, p, r: -a - c - g + p + r,
                       be.ATy(d.y), be.CTz(d.z), d.gamma, d.phi, res.rL)
    # 2: A dx + rA = 0
    out["eq"] = tmap(lambda a, r: a + r, be.Ax(d.x), res.rA)
    # 3: C dx - ds + rC = 0
    out["ineq"] = tmap(lambda c, s, r: c - s + r, be.Cx(d.x), d.s, res.rC)
    # 4: dz - dlam + dpi + rz = 0
    out["z"] = tmap(lambda z, l, p, r: z - l + p + r, d.z, d.lam, d.pi, res.rz)
    # 5-8 bound rows (masked)
    out["v"] = tmap(lambda m, dx, dv, r: m * (dx - dv) + r,
                    bd.ixlow, d.x, d.v, res.rv)
    out["w"] = tmap(lambda m, dx, dw, r: m * (-dx - dw) + r,
                    bd.ixupp, d.x, d.w, res.rw)
    out["t"] = tmap(lambda m, ds, dt, r: m * (ds - dt) + r,
                    bd.iclow, d.s, d.t, res.rt)
    out["u"] = tmap(lambda m, ds, du, r: m * (-ds - du) + r,
                    bd.icupp, d.s, d.u, res.ru)
    # 9-12 complementarity: Gamma dv + V dgamma + rG = 0 (masked)
    out["cG"] = tmap(lambda m, g, dv, v, dg, r: m * (g * dv + v * dg) + r,
                     bd.ixlow, it.gamma, d.v, it.v, d.gamma, comp.rG)
    out["cP"] = tmap(lambda m, p, dw, w, dp, r: m * (p * dw + w * dp) + r,
                     bd.ixupp, it.phi, d.w, it.w, d.phi, comp.rP)
    out["cL"] = tmap(lambda m, l, dt, t, dl, r: m * (l * dt + t * dl) + r,
                     bd.iclow, it.lam, d.t, it.t, d.lam, comp.rLam)
    out["cPi"] = tmap(lambda m, p, du, u, dp, r: m * (p * du + u * dp) + r,
                      bd.icupp, it.pi, d.u, it.u, d.pi, comp.rPi)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("comp_kind", ["affine", "corrector"])
def test_reduced_solve_matches_full_newton(seed, comp_kind):
    key = jax.random.PRNGKey(seed)
    lp = random_dense_lp(key, n=25, mE=7, mI=13)
    be = DenseBackend(lp)
    it = interior_iterate(be, jax.random.fold_in(key, 7))

    res = F.compute_residuals(be, it)
    Dx, Ominv = F.kkt_diagonals(be, it)
    fac = be.factorize(Dx, Ominv, 0.0, 0.0)
    assert bool(be.factorization_ok(fac))

    if comp_kind == "affine":
        comp = F.comp_rhs_affine(be, it)
    else:
        # use the affine direction as d_aff for the corrector rhs
        comp_a = F.comp_rhs_affine(be, it)
        rhs_a = F.assemble_reduced_rhs(be, it, res, comp_a, Ominv)
        dx, dy, dz = be.solve_reduced(fac, rhs_a, refinement_steps=2)
        d_aff = F.recover_step(be, it, res, comp_a, Ominv, rhs_a, dx, dy, dz)
        comp = F.comp_rhs_corrector(be, it, d_aff, 0.37)

    rhs = F.assemble_reduced_rhs(be, it, res, comp, Ominv)
    dx, dy, dz = be.solve_reduced(fac, rhs, refinement_steps=2)
    d = F.recover_step(be, it, res, comp, Ominv, rhs, dx, dy, dz)

    nres = newton_residuals(be, it, d, res, comp)
    for name, r in nres.items():
        err = max(float(jnp.max(jnp.abs(leaf))) if leaf.size else 0.0
                  for leaf in jax.tree.leaves(r))
        assert err < 1e-8, f"Newton residual {name} = {err}"


def test_step_bounds():
    key = jax.random.PRNGKey(3)
    lp = random_dense_lp(key, n=10, mE=3, mI=5)
    be = DenseBackend(lp)
    it = interior_iterate(be, key)
    d = jax.tree.map(lambda a: -0.5 * a, it)
    a_p, a_d = F.step_bounds_pd(be, it, d)
    # moving toward -0.5*val: max feasible alpha is 2, clipped to 1
    assert float(a_p) == 1.0 and float(a_d) == 1.0
    d2 = jax.tree.map(lambda a: -2.0 * a, it)
    a_p, a_d = F.step_bounds_pd(be, it, d2)
    assert abs(float(a_p) - 0.5) < 1e-12
    assert abs(float(a_d) - 0.5) < 1e-12


def test_mu_after_step_consistency():
    key = jax.random.PRNGKey(4)
    lp = random_dense_lp(key, n=12, mE=4, mI=6)
    be = DenseBackend(lp)
    it = interior_iterate(be, key)
    d = interior_iterate(be, jax.random.fold_in(key, 1))
    a_p, a_d = 0.3, 0.7
    mu_pred = F.mu_after_step(be, it, d, a_p, a_d)
    trial = F.take_step(it, d, a_p, a_d)
    mu_trial = F.mu(be, trial)
    np.testing.assert_allclose(float(mu_pred), float(mu_trial), rtol=1e-12)


def _np_blocking_oracle(be, it, d, primal):
    """Numpy argmin oracle for the exact blocking pair."""
    bd = be.bounds
    pairs = [
        (bd.ixlow, it.v, d.v, it.gamma, d.gamma),
        (bd.ixupp, it.w, d.w, it.phi, d.phi),
        (bd.iclow, it.t, d.t, it.lam, d.lam),
        (bd.icupp, it.u, d.u, it.pi, d.pi),
    ]
    if not primal:
        pairs = [(m, p, dp, v, dv) for (m, v, dv, p, dp) in pairs]
    best = (np.inf, 0.0, 0.0, 0.0, 0.0)
    for (m, v, dv, p, dp) in pairs:
        for ml, vl, dvl, pl, dpl in zip(*(map(np.asarray, jax.tree.leaves(t))
                                          for t in (m, v, dv, p, dp))):
            ml, vl, dvl, pl, dpl = (np.ravel(a)
                                    for a in (ml, vl, dvl, pl, dpl))
            r = np.where((ml > 0) & (dvl < 0), -vl / np.where(
                dvl < 0, dvl, -1.0), np.inf)
            if r.size and r.min() < best[0]:
                i = int(np.argmin(r))
                best = (r[i], vl[i], dvl[i], pl[i], dpl[i])
    a_max = min(1.0, best[0])
    return a_max, best[1], best[2], best[3], best[4], (best[0] < 1.0)


@pytest.mark.parametrize("seed", [0, 3, 7])
@pytest.mark.parametrize("primal", [True, False])
def test_find_blocking_matches_numpy_oracle(seed, primal):
    """Exact argmin blocking-pair extraction vs a numpy oracle (reference
    find_blocking_pd, DistributedVector.C:702-726) — VERDICT round-1
    item 8."""
    key = jax.random.PRNGKey(seed)
    lp = random_dense_lp(key, n=14, mE=5, mI=7)
    be = DenseBackend(lp)
    it = interior_iterate(be, key)
    leaves, treedef = jax.tree.flatten(it)
    ks = jax.random.split(jax.random.fold_in(key, 99), len(leaves))
    d = jax.tree.unflatten(treedef, [
        -jax.random.normal(k, np.shape(v)) for k, v in zip(ks, leaves)])
    got = F.find_blocking(be, it, d, primal)
    want = _np_blocking_oracle(be, it, d, primal)
    assert float(got[0]) == pytest.approx(want[0], rel=1e-12)
    assert bool(got[5]) == want[5]
    if want[5]:
        for g, w in zip(got[1:5], want[1:5]):
            assert float(g) == pytest.approx(w, rel=1e-10)
