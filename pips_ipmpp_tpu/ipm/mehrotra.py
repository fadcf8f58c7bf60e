"""Mehrotra predictor-corrector with Gondzio multiple centrality correctors.

Backend-generic, fully jittable: one call = one IPM iteration (factorize +
predictor solve + corrector solve + Gondzio loop + step).  This is the
TPU-native reimplementation of the reference's InteriorPointMethod
(Core/InteriorPointMethod/InteriorPointMethod.cpp): the predictor/corrector
logic at :68-178, the Gondzio loop at :236-358, the primal vs primal-dual
step rules (InteriorPointMethodType.hpp), and the fraction-to-boundary and
step-length heuristics at :696-816 — expressed as fused jnp ops and
`lax.while_loop` (no data-dependent Python control flow, per XLA semantics).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from pips_ipmpp_tpu.core.lp import _register
from pips_ipmpp_tpu.core.options import Options, StepMode
from pips_ipmpp_tpu.ipm import formulation as F


@_register
@dataclass
class StepStats:
    mu: Any
    sigma: Any
    alpha_primal: Any
    alpha_dual: Any
    n_gondzio: Any
    factor_ok: Any


def _solve_dir(be, it, res, comp, Ominv, fac, opts: Options,
               want_stats: bool = False):
    rhs = F.assemble_reduced_rhs(be, it, res, comp, Ominv)
    stats = None
    if opts.outer_bicgstab and hasattr(be, "solve_reduced_bicgstab"):
        # OUTER_SOLVE=2: BiCGStab on the full structured KKT, direct solve
        # as preconditioner (reference gmspips.cpp:79 forces this mode)
        dx, dy, dz, stats = be.solve_reduced_bicgstab(
            fac, rhs, max_iters=opts.outer_max_iters)
    else:
        dx, dy, dz = be.solve_reduced(fac, rhs, opts.refinement_steps)
    d = F.recover_step(be, it, res, comp, Ominv, rhs, dx, dy, dz)
    if want_stats:
        return d, stats
    return d


def _alphas(be, it, d, opts: Options):
    if opts.step_mode == StepMode.PRIMAL:
        return F.step_bound_single(be, it, d)
    return F.step_bounds_pd(be, it, d)


def ipm_step(be, it: F.Iterate, delta_p, delta_d, opts: Options):
    """One full IPM iteration. Returns (new_iterate, StepStats)."""
    res = F.compute_residuals(be, it)
    Dx, Ominv = F.kkt_diagonals(be, it)
    fac = be.factorize(Dx, Ominv, delta_p, delta_d)
    ok = be.factorization_ok(fac)

    mu = F.mu(be, it)

    # ---- predictor (affine scaling) ----
    comp_aff = F.comp_rhs_affine(be, it)
    d_aff = _solve_dir(be, it, res, comp_aff, Ominv, fac, opts)
    ap_aff, ad_aff = _alphas(be, it, d_aff, opts)
    mu_aff = F.mu_after_step(be, it, d_aff, ap_aff, ad_aff)

    # ---- centering parameter sigma = (mu_aff/mu)^3 (reference :154-168) ----
    sigma = (mu_aff / mu) ** 3
    sigma_mu = sigma * mu

    # ---- corrector (combined direction) ----
    comp_corr = F.comp_rhs_corrector(be, it, d_aff, sigma_mu)
    d, bicg = _solve_dir(be, it, res, comp_corr, Ominv, fac, opts,
                         want_stats=True)

    # ---- weighted predictor-corrector line search (reference :459-526) --
    if opts.n_linesearch_points > 1:
        d, a_p, a_d = _weighted_pc_search(be, it, d_aff, d, opts)
    else:
        a_p, a_d = _alphas(be, it, d, opts)

    # dynamic corrector budget: when the outer BiCGStab had to work hard,
    # skip extra correctors (reference :639-653 limits Gondzio correctors
    # by BiCGStab iteration count — the Observer feedback)
    allow_gondzio = jnp.asarray(True)
    if bicg is not None:
        allow_gondzio = (bicg["iterations"]
                         < max(opts.outer_max_iters - 1, 1)) \
            & bicg["converged"]

    # ---- Gondzio multiple centrality correctors (reference :236-358) ----
    zero_res = jax.tree.map(jnp.zeros_like, res)
    n_gondzio = jnp.zeros((), jnp.int32)

    if opts.max_gondzio_correctors > 0:
        def cond(carry):
            d_c, ap_c, ad_c, k, go = carry
            small = jnp.minimum(ap_c, ad_c) < 1.0
            return (go & small & allow_gondzio
                    & (k < opts.max_gondzio_correctors))

        def body(carry):
            d_c, ap_c, ad_c, k, _ = carry
            # enlarged trial steps (Gondzio's delta-alpha probing)
            ap_t = jnp.minimum(ap_c + 0.08, 1.0)
            ad_t = jnp.minimum(ad_c + 0.08, 1.0)
            comp_g = F.comp_rhs_gondzio(be, it, d_c, ap_t, ad_t, sigma_mu,
                                        opts.beta_min, opts.beta_max)
            corr = _solve_dir(be, it, zero_res, comp_g, Ominv, fac, opts)
            d_new = jax.tree.map(lambda a, b: a + b, d_c, corr)
            ap_n, ad_n = _alphas(be, it, d_new, opts)
            # accept if both step lengths improved enough (reference
            # acceptance test with acceptance_tolerance)
            tol = opts.acceptance_tolerance
            accept = (ap_n >= ap_c + tol * 0.08) & (ad_n >= ad_c + tol * 0.08)
            d_keep = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), d_new, d_c)
            return (d_keep,
                    jnp.where(accept, ap_n, ap_c),
                    jnp.where(accept, ad_n, ad_c),
                    k + 1, accept)

        d, a_p, a_d, n_gondzio, _ = jax.lax.while_loop(
            cond, body, (d, a_p, a_d, n_gondzio, jnp.asarray(True)))

    # ---- final step lengths ----
    a_p_f, a_d_f = _final_steplengths(be, it, d, a_p, a_d, mu, opts)

    # ---- numerical-troubles path (reference :528-627): when the combined
    # step collapses, retry with a PURE CENTERING direction (sigma = 1,
    # complementarity target mu) and a damped step to restore centrality
    # before attempting progress again ----
    if opts.centering_retry:
        trouble = (a_p_f + a_d_f) < opts.small_step_threshold

        def centered(_):
            comp_c = F.comp_rhs_corrector(
                be, it, jax.tree.map(jnp.zeros_like, d_aff), mu)
            d_c = _solve_dir(be, it, res, comp_c, Ominv, fac, opts)
            ap_c, ad_c = _alphas(be, it, d_c, opts)
            return d_c, 0.7 * ap_c, 0.7 * ad_c

        def normal(_):
            return d, a_p_f, a_d_f

        d, a_p_f, a_d_f = jax.lax.cond(trouble, centered, normal, None)

    new_it = F.take_step(it, d, a_p_f, a_d_f)

    stats = StepStats(mu=mu, sigma=sigma, alpha_primal=a_p_f,
                      alpha_dual=a_d_f, n_gondzio=n_gondzio, factor_ok=ok)
    return new_it, stats


def _final_steplengths(be, it, d, a_p_max, a_d_max, mu, opts: Options):
    """Mehrotra's step-length heuristic, blocking-pair form (reference
    mehrotra_step_length primal :696-744 / primal-dual :746-816).

    For each side, the step is chosen so that the BLOCKING pair's product
    after the step stays >= gamma_f * mu_+ : with blocking primal value
    v_b(alpha) = v_b + alpha dv_b (and dv_b = -v_b/alpha_max at blocking),
    solve v_b(alpha) * partner(alpha_max) = gamma_f * mu_+ for alpha.
    Falls back to gamma_f * alpha_max when the formula is degenerate."""
    gf = opts.steplength_factor
    mu_full = F.mu_after_step(be, it, d, a_p_max, a_d_max)

    def side(a_max, primal):
        val_b, partner = F.blocking_pair_info(be, it, d, a_max, primal)
        ok = (jnp.isfinite(val_b) & jnp.isfinite(partner)
              & (val_b > 0) & (partner > 1e-300) & (a_max > 1e-12))
        dval_b = -val_b / jnp.maximum(a_max, 1e-12)
        target = gf * mu_full / jnp.maximum(partner, 1e-300)
        alpha = (target - val_b) / jnp.where(dval_b < 0, dval_b, -1.0)
        alpha = jnp.where(ok, alpha, gf * a_max)
        # keep within [gamma_f * a_max, a_max] (reference clamps likewise)
        return jnp.clip(alpha, gf * a_max, jnp.minimum(a_max, gf))

    if opts.step_mode == StepMode.PRIMAL:
        a_max = jnp.minimum(a_p_max, a_d_max)
        # single step length: use the more conservative of the two sides
        a = jnp.minimum(side(a_max, True), side(a_max, False))
        return a, a
    return side(a_p_max, True), side(a_d_max, False)


def _weighted_pc_search(be, it, d_aff, d_corr, opts: Options):
    """Weighted predictor-corrector line search (reference
    InteriorPointMethod.cpp:459-526): evaluate n_linesearch_points
    interpolates d(w) = d_aff + w (d_corr - d_aff), w in (0, 1], and keep
    the weight maximizing the combined step length."""
    n = max(opts.n_linesearch_points, 1)
    ws = jnp.linspace(1.0 / n, 1.0, n)

    d_delta = jax.tree.map(lambda a, b: b - a, d_aff, d_corr)

    def eval_w(w):
        dw = jax.tree.map(lambda a, dd: a + w * dd, d_aff, d_delta)
        a_p, a_d = _alphas(be, it, dw, opts)
        return a_p + a_d, a_p, a_d

    scores, aps, ads = jax.vmap(eval_w)(ws)
    best = jnp.argmax(scores)
    w_best = ws[best]
    d = jax.tree.map(lambda a, dd: a + w_best * dd, d_aff, d_delta)
    return d, aps[best], ads[best]
