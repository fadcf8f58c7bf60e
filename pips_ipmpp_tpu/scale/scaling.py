r"""Problem scaling: geometric-mean, equilibrium (inf-norm), Curtis-Reid.

Reimplements the reference's scaler family (Core/Preprocessing/Scaler.cpp,
GeometricMeanScaler.C:21-171, EquilibriumScaler, CurtisReidScaler.cpp:318)
as structure-aware array passes.  Scaling runs once at setup (off the IPM
hot path, as in the reference) on the batched arrowhead arrays.

Transform (col scale s > 0, eq-row scale rE > 0, ineq-row scale rC > 0):

    A' = diag(rE) A diag(s)    b' = rE.b      x' = x / s
    C' = diag(rC) C diag(s)    clow' = rC.clow, cupp' = rC.cupp
    c' = s.c                   xlow' = xlow/s, xupp' = xupp/s

Unscale: x = s.x', y = rE.y', z = rC.z', s_slack = s'/rC,
gamma = gamma'/s, phi = phi'/s (bound duals divide by the col scale).

All final factors are rounded to powers of two so scaling/unscaling is
exact in floating point (the classic Curtis-Reid/MC30 trick; reference
rounds in CurtisReidScaler via log2 factors).
"""
from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.lp import ArrowheadLP, DenseLP
from pips_ipmpp_tpu.core.options import ScalerType
from pips_ipmpp_tpu.core.spaces import RVec, XVec

_INF = jnp.inf


def _pow2_round(v):
    """Round positive factors to the nearest power of two (exact scaling).

    ldexp, not exp2: XLA lowers exp2(x) as exp(x*ln2), which is off by an
    ulp for integer x and silently breaks the exact-unscaling guarantee."""
    return jnp.ldexp(jnp.ones_like(v),
                     jnp.round(jnp.log2(v)).astype(jnp.int32))


def _safe(v):
    """Replace 0/inf/nan factors by 1 (empty rows/cols are left unscaled)."""
    return jnp.where(jnp.isfinite(v) & (v > 0), v, 1.0)


# ======================================================================
# Row/col |entry| statistics with on-the-fly factors
# ======================================================================

def _mm(a):  # abs
    return jnp.abs(a)


_MIN_REL_FLOOR = 1e-8   # entries below this fraction of the row/col max are
# ignored by the min statistic: incidentally tiny coefficients must not
# drive geometric factors to extremes (the reference's scalers likewise
# work on meaningful magnitudes only)


def _rstat(S, op, floor=None):
    """Row reduce of a scaled abs matrix; op in (max, min-over-nonzeros).

    `floor` (row-shaped) lets callers exclude entries below a fraction of
    the FULL row's max when the row spans several matrix parts — a
    per-part floor would let an incidentally tiny coefficient in a
    low-magnitude part drive the min (and the geometric factor) to
    extremes."""
    if S.shape[-1] == 0:
        fill = 0.0 if op == "max" else _INF
        return jnp.full(S.shape[:-1], fill, S.dtype)
    if op == "max":
        return jnp.max(S, axis=-1)
    thr = (floor[..., None] if floor is not None
           else _MIN_REL_FLOOR * jnp.max(S, axis=-1, keepdims=True))
    return jnp.min(jnp.where(S > thr, S, _INF), axis=-1)


def _cstat(S, op, floor=None):
    if S.shape[-2] == 0:
        fill = 0.0 if op == "max" else _INF
        return jnp.full(S.shape[:-2] + S.shape[-1:], fill, S.dtype)
    if op == "max":
        return jnp.max(S, axis=-2)
    thr = (floor[..., None, :] if floor is not None
           else _MIN_REL_FLOOR * jnp.max(S, axis=-2, keepdims=True))
    return jnp.min(jnp.where(S > thr, S, _INF), axis=-2)


class _DenseView:
    """Stats/apply adapter for DenseLP."""

    def __init__(self, lp: DenseLP):
        self.lp = lp

    def ones(self):
        lp = self.lp
        one = jnp.ones_like
        return one(lp.c), one(lp.b), one(lp.clow)

    def row_stats(self, s, rE, rC, op):
        lp = self.lp
        SA = _mm(lp.A) * rE[:, None] * s[None, :]
        SC = _mm(lp.C) * rC[:, None] * s[None, :]
        return _rstat(SA, op), _rstat(SC, op)

    def col_stats(self, s, rE, rC, op):
        lp = self.lp
        SA = _mm(lp.A) * rE[:, None] * s[None, :]
        SC = _mm(lp.C) * rC[:, None] * s[None, :]
        if op == "max":
            return jnp.maximum(_cstat(SA, "max"), _cstat(SC, "max"))
        # min over the FULL column (A and C parts share variables):
        # floor from the combined column max
        fl = _MIN_REL_FLOOR * jnp.maximum(_cstat(SA, "max"),
                                          _cstat(SC, "max"))
        return jnp.minimum(_cstat(SA, "min", fl), _cstat(SC, "min", fl))

    def apply(self, s, rE, rC) -> DenseLP:
        lp = self.lp
        return DenseLP(
            c=lp.c * s,
            A=lp.A * rE[:, None] * s[None, :], b=lp.b * rE,
            C=lp.C * rC[:, None] * s[None, :],
            iclow=lp.iclow, clow=lp.clow * rC,
            icupp=lp.icupp, cupp=lp.cupp * rC,
            ixlow=lp.ixlow, xlow=lp.xlow / s,
            ixupp=lp.ixupp, xupp=lp.xupp / s,
        )


class _ArrowView:
    """Stats/apply adapter for ArrowheadLP (batched structure-aware)."""

    def __init__(self, lp: ArrowheadLP):
        self.lp = lp

    def ones(self):
        lp = self.lp
        s = XVec(jnp.ones_like(lp.c0), jnp.ones_like(lp.cN))
        rE = RVec(jnp.ones_like(lp.b0), jnp.ones_like(lp.bN),
                  jnp.ones_like(lp.bl))
        rC = RVec(jnp.ones_like(lp.clow0), jnp.ones_like(lp.clowN),
                  jnp.ones_like(lp.clowl))
        return s, rE, rC

    def row_stats(self, s, rE, rC, op):
        lp = self.lp
        red = jnp.maximum if op == "max" else jnp.minimum

        def rows(M0, Mb, Bb, Ml0, Mlb, r0, rb, rl):
            # block-0 rows, per-block rows (border+diag), linking rows.
            # Min stats use a floor from the FULL row's max across parts
            # (border+diag, block-0 strip + all block strips).
            S0 = _mm(M0) * r0[:, None] * s.first[None, :]
            first = _rstat(S0, op)
            Sb1 = _mm(Mb) * rb[:, :, None] * s.first[None, None, :]
            Sb2 = _mm(Bb) * rb[:, :, None] * s.blocks[:, None, :]
            Sl0 = _mm(Ml0) * rl[:, None] * s.first[None, :]
            Slb = _mm(Mlb) * rl[None, :, None] * s.blocks[:, None, :]
            if op == "max":
                blocks = red(_rstat(Sb1, "max"), _rstat(Sb2, "max"))
                stat_l0 = _rstat(Sl0, "max")
                stat_lb = _rstat(Slb, "max")
            else:
                fb = _MIN_REL_FLOOR * jnp.maximum(_rstat(Sb1, "max"),
                                                  _rstat(Sb2, "max"))
                blocks = red(_rstat(Sb1, "min", fb), _rstat(Sb2, "min", fb))
                l0max = _rstat(Sl0, "max")
                lbmax = _rstat(Slb, "max")
                gl = jnp.maximum(l0max, jnp.max(lbmax, 0)) \
                    if lbmax.shape[0] else l0max
                fl = _MIN_REL_FLOOR * gl
                stat_l0 = _rstat(Sl0, "min", fl)
                stat_lb = _rstat(Slb, "min", fl[None, :])
            if stat_lb.shape[0]:
                agg = (jnp.max(stat_lb, 0) if op == "max"
                       else jnp.min(stat_lb, 0))
            else:
                agg = jnp.full_like(stat_l0, 0.0 if op == "max" else _INF)
            link = red(stat_l0, agg)
            return RVec(first, blocks, link)

        sE = rows(lp.A0, lp.A, lp.B, lp.F0, lp.F, rE.first, rE.blocks,
                  rE.link)
        sC = rows(lp.C0, lp.C, lp.D, lp.G0, lp.G, rC.first, rC.blocks,
                  rC.link)
        return sE, sC

    def col_stats(self, s, rE, rC, op):
        lp = self.lp
        red = jnp.maximum if op == "max" else jnp.minimum

        # scaled abs parts.  First-stage columns span 6 matrices (the
        # batched border parts aggregate their block axis); block columns
        # span 4.  Min stats use a floor from the FULL column max so an
        # incidentally tiny coefficient in one part cannot drive the
        # geometric factor (see _rstat).
        first_parts = [
            (_mm(lp.A0) * rE.first[:, None] * s.first[None, :], False),
            (_mm(lp.C0) * rC.first[:, None] * s.first[None, :], False),
            (_mm(lp.F0) * rE.link[:, None] * s.first[None, :], False),
            (_mm(lp.G0) * rC.link[:, None] * s.first[None, :], False),
            (_mm(lp.A) * rE.blocks[:, :, None] * s.first[None, None, :],
             True),
            (_mm(lp.C) * rC.blocks[:, :, None] * s.first[None, None, :],
             True),
        ]
        block_parts = [
            _mm(lp.B) * rE.blocks[:, :, None] * s.blocks[:, None, :],
            _mm(lp.D) * rC.blocks[:, :, None] * s.blocks[:, None, :],
            _mm(lp.F) * rE.link[None, :, None] * s.blocks[:, None, :],
            _mm(lp.G) * rC.link[None, :, None] * s.blocks[:, None, :],
        ]

        def first_stat(statop, floor=None):
            out = None
            for S, batched in first_parts:
                fl = None if floor is None else (
                    floor[None, :] if batched else floor)
                st = _cstat(S, statop, fl)
                if batched and st.shape[0]:
                    st = (jnp.max(st, 0) if statop == "max"
                          else jnp.min(st, 0))
                elif batched:
                    st = jnp.full(st.shape[1:],
                                  0.0 if statop == "max" else _INF,
                                  st.dtype)
                out = st if out is None else (
                    jnp.maximum(out, st) if statop == "max"
                    else jnp.minimum(out, st))
            return out

        def block_stat(statop, floor=None):
            out = None
            for S in block_parts:
                st = _cstat(S, statop, floor)
                out = st if out is None else (
                    jnp.maximum(out, st) if statop == "max"
                    else jnp.minimum(out, st))
            return out

        if op == "max":
            return XVec(first_stat("max"), block_stat("max"))
        ffl = _MIN_REL_FLOOR * first_stat("max")
        bfl = _MIN_REL_FLOOR * block_stat("max")
        return XVec(first_stat("min", ffl), block_stat("min", bfl))

    def apply(self, s, rE, rC) -> ArrowheadLP:
        lp = self.lp
        kw = {}
        kw["c0"] = lp.c0 * s.first
        kw["cN"] = lp.cN * s.blocks
        kw["A0"] = lp.A0 * rE.first[:, None] * s.first[None, :]
        kw["b0"] = lp.b0 * rE.first
        kw["C0"] = lp.C0 * rC.first[:, None] * s.first[None, :]
        kw["A"] = lp.A * rE.blocks[:, :, None] * s.first[None, None, :]
        kw["B"] = lp.B * rE.blocks[:, :, None] * s.blocks[:, None, :]
        kw["bN"] = lp.bN * rE.blocks
        kw["C"] = lp.C * rC.blocks[:, :, None] * s.first[None, None, :]
        kw["D"] = lp.D * rC.blocks[:, :, None] * s.blocks[:, None, :]
        kw["F0"] = lp.F0 * rE.link[:, None] * s.first[None, :]
        kw["F"] = lp.F * rE.link[None, :, None] * s.blocks[:, None, :]
        kw["bl"] = lp.bl * rE.link
        kw["G0"] = lp.G0 * rC.link[:, None] * s.first[None, :]
        kw["G"] = lp.G * rC.link[None, :, None] * s.blocks[:, None, :]
        kw["clow0"] = lp.clow0 * rC.first
        kw["cupp0"] = lp.cupp0 * rC.first
        kw["clowN"] = lp.clowN * rC.blocks
        kw["cuppN"] = lp.cuppN * rC.blocks
        kw["clowl"] = lp.clowl * rC.link
        kw["cuppl"] = lp.cuppl * rC.link
        kw["xlow0"] = lp.xlow0 / s.first
        kw["xupp0"] = lp.xupp0 / s.first
        kw["xlowN"] = lp.xlowN / s.blocks
        kw["xuppN"] = lp.xuppN / s.blocks
        for f in dataclasses.fields(lp):
            if f.name not in kw:
                kw[f.name] = getattr(lp, f.name)
        return ArrowheadLP(**kw)


class _BucketedView:
    """Stats/apply adapter for BucketedArrowheadLP: per-bucket _ArrowViews
    with first-stage/link statistics aggregated across buckets.  The
    scale-factor pytrees carry `blocks` as a TUPLE of per-bucket arrays
    (matching the bucketed XVec/RVec layout), so all unscaling tree_maps
    work unchanged.

    Min-statistic floors are per-bucket (each bucket's own row/col max)
    rather than global across buckets — a conservative approximation that
    only affects factor QUALITY, never the exactness of the pow2 scaling.
    """

    def __init__(self, lp):
        self.lp = lp
        self.views = [_ArrowView(b) for b in lp.buckets]

    def _split(self, s, rE, rC, b):
        return (XVec(s.first, s.blocks[b]),
                RVec(rE.first, rE.blocks[b], rE.link),
                RVec(rC.first, rC.blocks[b], rC.link))

    def ones(self):
        per = [v.ones() for v in self.views]
        s0, rE0, rC0 = per[0]
        s = XVec(s0.first, tuple(p[0].blocks for p in per))
        rE = RVec(rE0.first, tuple(p[1].blocks for p in per), rE0.link)
        rC = RVec(rC0.first, tuple(p[2].blocks for p in per), rC0.link)
        return s, rE, rC

    def row_stats(self, s, rE, rC, op):
        red = jnp.maximum if op == "max" else jnp.minimum
        per = [v.row_stats(*self._split(s, rE, rC, b), op)
               for b, v in enumerate(self.views)]

        def combine(idx):
            stats = [p[idx] for p in per]
            first = stats[0].first          # shared A0/C0: identical
            link = stats[0].link
            for st in stats[1:]:
                link = red(link, st.link)   # every bucket's F/G strips
            return RVec(first, tuple(st.blocks for st in stats), link)

        return combine(0), combine(1)

    def col_stats(self, s, rE, rC, op):
        red = jnp.maximum if op == "max" else jnp.minimum
        per = [v.col_stats(*self._split(s, rE, rC, b), op)
               for b, v in enumerate(self.views)]
        first = per[0].first
        for st in per[1:]:                  # each bucket's A/C borders
            first = red(first, st.first)
        return XVec(first, tuple(st.blocks for st in per))

    def apply(self, s, rE, rC):
        from pips_ipmpp_tpu.core.bucketed import BucketedArrowheadLP
        subs = tuple(v.apply(*self._split(s, rE, rC, b))
                     for b, v in enumerate(self.views))
        return BucketedArrowheadLP(subs, self.lp.placement)


class _SparseEllView(_ArrowView):
    """Stats/apply adapter for SparseArrowheadLP: identical structure to
    _ArrowView except the diagonal blocks B/D live in ELL form — their
    row/col statistics and scaling act on the ELL value arrays directly
    (row factors index by the entry's row, column factors gather by the
    entry's column id)."""

    def _bd_scaled_abs(self, ell, r_rows, s_blocks):
        """|val| * r[row] * s[col] per ELL entry; padded entries stay 0."""
        sv = jnp.take_along_axis(
            s_blocks[:, None, :].repeat(ell.val.shape[1], 1),
            ell.col, axis=2)
        return jnp.abs(ell.val) * r_rows[:, :, None] * sv

    def row_stats(self, s, rE, rC, op):
        lp = self.lp
        red = jnp.maximum if op == "max" else jnp.minimum

        def rows(M0, border, ell, Ml0, Mlb, r0, rb, rl):
            S0 = _mm(M0) * r0[:, None] * s.first[None, :]
            first = _rstat(S0, op)
            Sb1 = _mm(border) * rb[:, :, None] * s.first[None, None, :]
            SbE = self._bd_scaled_abs(ell, rb, s.blocks)   # [N, m, K]
            Sl0 = _mm(Ml0) * rl[:, None] * s.first[None, :]
            Slb = _mm(Mlb) * rl[None, :, None] * s.blocks[:, None, :]
            if op == "max":
                blocks = red(_rstat(Sb1, "max"), jnp.max(SbE, -1))
                stat_l0 = _rstat(Sl0, "max")
                stat_lb = _rstat(Slb, "max")
            else:
                rowmax = jnp.maximum(_rstat(Sb1, "max"), jnp.max(SbE, -1))
                fb = _MIN_REL_FLOOR * rowmax
                ell_min = jnp.min(
                    jnp.where(SbE > fb[:, :, None], SbE, _INF), -1)
                blocks = red(_rstat(Sb1, "min", fb), ell_min)
                l0max = _rstat(Sl0, "max")
                lbmax = _rstat(Slb, "max")
                gl = jnp.maximum(l0max, jnp.max(lbmax, 0)) \
                    if lbmax.shape[0] else l0max
                fl = _MIN_REL_FLOOR * gl
                stat_l0 = _rstat(Sl0, "min", fl)
                stat_lb = _rstat(Slb, "min", fl[None, :])
            if stat_lb.shape[0]:
                agg = (jnp.max(stat_lb, 0) if op == "max"
                       else jnp.min(stat_lb, 0))
            else:
                agg = jnp.full_like(stat_l0, 0.0 if op == "max" else _INF)
            link = red(stat_l0, agg)
            return RVec(first, blocks, link)

        sE = rows(lp.A0, lp.A, lp.B, lp.F0, lp.F, rE.first, rE.blocks,
                  rE.link)
        sC = rows(lp.C0, lp.C, lp.D, lp.G0, lp.G, rC.first, rC.blocks,
                  rC.link)
        return sE, sC

    def col_stats(self, s, rE, rC, op):
        lp = self.lp
        red = jnp.maximum if op == "max" else jnp.minimum
        # first-stage columns: dense parts only (B/D never touch them)
        first_parts = [
            (_mm(lp.A0) * rE.first[:, None] * s.first[None, :], False),
            (_mm(lp.C0) * rC.first[:, None] * s.first[None, :], False),
            (_mm(lp.F0) * rE.link[:, None] * s.first[None, :], False),
            (_mm(lp.G0) * rC.link[:, None] * s.first[None, :], False),
            (_mm(lp.A) * rE.blocks[:, :, None] * s.first[None, None, :],
             True),
            (_mm(lp.C) * rC.blocks[:, :, None] * s.first[None, None, :],
             True),
        ]

        def first_stat(statop, floor=None):
            out = None
            for S, batched in first_parts:
                fl = None if floor is None else (
                    floor[None, :] if batched else floor)
                st = _cstat(S, statop, fl)
                if batched and st.shape[0]:
                    st = (jnp.max(st, 0) if statop == "max"
                          else jnp.min(st, 0))
                elif batched:
                    st = jnp.full(st.shape[1:],
                                  0.0 if statop == "max" else _INF,
                                  st.dtype)
                out = st if out is None else (
                    jnp.maximum(out, st) if statop == "max"
                    else jnp.minimum(out, st))
            return out

        # block columns: transposed ELL (Bt/Dt rows ARE columns) + F/G
        def block_stat(statop, floor=None):
            # transposed-ELL entries: row factor = the column's s,
            # gathered factor = the eq/ineq row's r
            SbE = jnp.abs(lp.Bt.val) * s.blocks[:, :, None] \
                * jnp.take_along_axis(
                    rE.blocks[:, None, :].repeat(lp.Bt.val.shape[1], 1),
                    lp.Bt.col, axis=2)
            SdE = jnp.abs(lp.Dt.val) * s.blocks[:, :, None] \
                * jnp.take_along_axis(
                    rC.blocks[:, None, :].repeat(lp.Dt.val.shape[1], 1),
                    lp.Dt.col, axis=2)
            SF = _mm(lp.F) * rE.link[None, :, None] * s.blocks[:, None, :]
            SG = _mm(lp.G) * rC.link[None, :, None] * s.blocks[:, None, :]
            if statop == "max":
                return jnp.maximum(
                    jnp.maximum(jnp.max(SbE, -1), jnp.max(SdE, -1)),
                    jnp.maximum(_cstat(SF, "max"), _cstat(SG, "max")))
            fl = floor[:, :, None]
            mn = jnp.minimum(
                jnp.min(jnp.where(SbE > fl, SbE, _INF), -1),
                jnp.min(jnp.where(SdE > fl, SdE, _INF), -1))
            return jnp.minimum(
                mn, jnp.minimum(_cstat(SF, "min", floor),
                                _cstat(SG, "min", floor)))

        if op == "max":
            return XVec(first_stat("max"), block_stat("max"))
        ffl = _MIN_REL_FLOOR * first_stat("max")
        bfl = _MIN_REL_FLOOR * block_stat("max")
        return XVec(first_stat("min", ffl), block_stat("min", bfl))

    def apply(self, s, rE, rC):
        from pips_ipmpp_tpu.core.sparse import Ell
        lp = self.lp
        sB = jnp.take_along_axis(
            s.blocks[:, None, :].repeat(lp.B.val.shape[1], 1),
            lp.B.col, axis=2)
        sD = jnp.take_along_axis(
            s.blocks[:, None, :].repeat(lp.D.val.shape[1], 1),
            lp.D.col, axis=2)
        rBt = jnp.take_along_axis(
            rE.blocks[:, None, :].repeat(lp.Bt.val.shape[1], 1),
            lp.Bt.col, axis=2)
        rDt = jnp.take_along_axis(
            rC.blocks[:, None, :].repeat(lp.Dt.val.shape[1], 1),
            lp.Dt.col, axis=2)
        kw = dict(
            c0=lp.c0 * s.first, cN=lp.cN * s.blocks,
            A0=lp.A0 * rE.first[:, None] * s.first[None, :],
            b0=lp.b0 * rE.first,
            C0=lp.C0 * rC.first[:, None] * s.first[None, :],
            A=lp.A * rE.blocks[:, :, None] * s.first[None, None, :],
            B=Ell(lp.B.val * rE.blocks[:, :, None] * sB, lp.B.col),
            Bt=Ell(lp.Bt.val * s.blocks[:, :, None] * rBt, lp.Bt.col),
            bN=lp.bN * rE.blocks,
            C=lp.C * rC.blocks[:, :, None] * s.first[None, None, :],
            D=Ell(lp.D.val * rC.blocks[:, :, None] * sD, lp.D.col),
            Dt=Ell(lp.Dt.val * s.blocks[:, :, None] * rDt, lp.Dt.col),
            F0=lp.F0 * rE.link[:, None] * s.first[None, :],
            F=lp.F * rE.link[None, :, None] * s.blocks[:, None, :],
            bl=lp.bl * rE.link,
            G0=lp.G0 * rC.link[:, None] * s.first[None, :],
            G=lp.G * rC.link[None, :, None] * s.blocks[:, None, :],
            clow0=lp.clow0 * rC.first, cupp0=lp.cupp0 * rC.first,
            clowN=lp.clowN * rC.blocks, cuppN=lp.cuppN * rC.blocks,
            clowl=lp.clowl * rC.link, cuppl=lp.cuppl * rC.link,
            xlow0=lp.xlow0 / s.first, xupp0=lp.xupp0 / s.first,
            xlowN=lp.xlowN / s.blocks, xuppN=lp.xuppN / s.blocks,
        )
        for f in dataclasses.fields(lp):
            if f.name not in kw:
                kw[f.name] = getattr(lp, f.name)
        return type(lp)(**kw)


def _view(lp):
    if isinstance(lp, DenseLP):
        return _DenseView(lp)
    if isinstance(lp, ArrowheadLP):
        return _ArrowView(lp)
    from pips_ipmpp_tpu.core.sparse import SparseArrowheadLP
    if isinstance(lp, SparseArrowheadLP):
        return _SparseEllView(lp)
    return _BucketedView(lp)


tmap = jax.tree.map


# ======================================================================
# Scalers
# ======================================================================

class _ScalerBase:
    """Holds factors after scale(); provides unscaling of all quantities."""

    def __init__(self):
        self.s = self.rE = self.rC = None

    def scale(self, lp):
        view = _view(lp)
        s, rE, rC = self._compute(view)
        self.s = tmap(lambda v: _safe(_pow2_round(_safe(v))), s)
        self.rE = tmap(lambda v: _safe(_pow2_round(_safe(v))), rE)
        self.rC = tmap(lambda v: _safe(_pow2_round(_safe(v))), rC)
        return view.apply(self.s, self.rE, self.rC)

    # solution unscaling (reference Scaler.hpp:38-53 unscale_variables) ---
    def unscale_x(self, x):
        return tmap(lambda sv, xv: sv * xv, self.s, x)

    def unscale_y(self, y):
        return tmap(lambda rv, yv: rv * yv, self.rE, y)

    def unscale_z(self, z):
        return tmap(lambda rv, zv: rv * zv, self.rC, z)

    def unscale_slack(self, sl):
        return tmap(lambda rv, v: v / rv, self.rC, sl)

    def unscale_bound_dual(self, g):
        return tmap(lambda sv, v: v / sv, self.s, g)


class EquilibriumScaler(_ScalerBase):
    """inf-norm scaling: rows by 1/rowmax, then cols by 1/colmax
    (reference EquilibriumScaler)."""

    def _compute(self, view):
        s, rE, rC = view.ones()
        inv = lambda f, m: jnp.where(m > 0, f / jnp.maximum(m, 1e-300), f)
        mE, mC = view.row_stats(s, rE, rC, "max")
        rE = tmap(inv, rE, mE)
        rC = tmap(inv, rC, mC)
        cm = view.col_stats(s, rE, rC, "max")
        s = tmap(inv, s, cm)
        return s, rE, rC


class GeometricMeanScaler(_ScalerBase):
    """sqrt(max*min) scaling iterated (reference GeometricMeanScaler.C:21-171),
    optionally followed by an equilibrium pass."""

    def __init__(self, max_iters: int = 10, with_equilibrium: bool = False):
        super().__init__()
        self.max_iters = max_iters
        self.with_equilibrium = with_equilibrium

    def _compute(self, view):
        s, rE, rC = view.ones()
        geo = lambda mx, mn: jnp.where(
            mx > 0,
            1.0 / jnp.sqrt(jnp.maximum(
                mx * jnp.where(jnp.isfinite(mn), mn, mx), 1e-300)),
            1.0)  # empty rows/cols stay unscaled
        for _ in range(self.max_iters):
            mxE, mxC = view.row_stats(s, rE, rC, "max")
            mnE, mnC = view.row_stats(s, rE, rC, "min")
            rE = tmap(lambda f, mx, mn: f * _safe(geo(mx, mn)), rE, mxE, mnE)
            rC = tmap(lambda f, mx, mn: f * _safe(geo(mx, mn)), rC, mxC, mnC)
            cmx = view.col_stats(s, rE, rC, "max")
            cmn = view.col_stats(s, rE, rC, "min")
            s = tmap(lambda f, mx, mn: f * _safe(geo(mx, mn)), s, cmx, cmn)
        if self.with_equilibrium:
            inv = lambda f, m: jnp.where(m > 0, f / jnp.maximum(m, 1e-300), f)
            mxE, mxC = view.row_stats(s, rE, rC, "max")
            rE = tmap(inv, rE, mxE)
            rC = tmap(inv, rC, mxC)
            cm = view.col_stats(s, rE, rC, "max")
            s = tmap(inv, s, cm)
        return s, rE, rC


class CurtisReidScaler(_ScalerBase):
    """Curtis-Reid least-squares scaling: minimize
    sum_{a_ij != 0} (log2|a_ij| + rho_i + gamma_j)^2 via CG on the normal
    equations over log2 factors (reference CurtisReidScaler.cpp:318)."""

    def __init__(self, cg_iters: int = 30):
        super().__init__()
        self.cg_iters = cg_iters

    def _compute(self, view):
        if isinstance(view, _SparseEllView):
            raise NotImplementedError(
                "Curtis-Reid scaling is not implemented for ELL sparse "
                "problems; use EQUILIBRIUM or GEOMETRIC_MEAN")
        s1, rE1, rC1 = view.ones()

        # pattern & log-magnitude row/col aggregates via the stats machinery
        # would lose signs; compute directly per view type.
        lp = view.lp

        def logabs(M):
            m = jnp.abs(M)
            return jnp.where(m > 0, jnp.log2(jnp.maximum(m, 1e-300)), 0.0), \
                (m > 0).astype(M.dtype)

        if isinstance(view, _BucketedView):
            # per-bucket log/pattern tables; first-stage (A0/C0/F0/G0) and
            # linking aggregates counted ONCE from the shared copies in
            # bucket 0, border/diag contributions summed across buckets
            tabs = []
            for bk in lp.buckets:
                LBb, PBb = {}, {}
                for name in ("A0", "C0", "A", "B", "C", "D", "F0", "F",
                             "G0", "G"):
                    LBb[name], PBb[name] = logabs(getattr(bk, name))
                tabs.append((LBb, PBb))

            def build(which, t_sel):
                p0, pb, pd, pl0, plb = (("A0", "A", "B", "F0", "F")
                                        if which == "E"
                                        else ("C0", "C", "D", "G0", "G"))
                tab0 = tabs[0][t_sel]
                first = jnp.sum(tab0[p0], -1)
                link = jnp.sum(tab0[pl0], -1)
                blocks = []
                for (Lb, Pb) in tabs:
                    tb = (Lb, Pb)[t_sel]
                    blocks.append(jnp.sum(tb[pb], -1)
                                  + jnp.sum(tb[pd], -1))
                    link = link + jnp.sum(tb[plb], (0, 2))
                return RVec(first, tuple(blocks), link)

            sigmaE, cntE = build("E", 0), build("E", 1)
            sigmaC, cntC = build("C", 0), build("C", 1)

            def cols_build(t_sel):
                tab0 = tabs[0][t_sel]
                first = (jnp.sum(tab0["A0"], 0) + jnp.sum(tab0["C0"], 0)
                         + jnp.sum(tab0["F0"], 0) + jnp.sum(tab0["G0"], 0))
                blocks = []
                for (Lb, Pb) in tabs:
                    tb = (Lb, Pb)[t_sel]
                    first = first + (jnp.sum(tb["A"], (0, 1))
                                     + jnp.sum(tb["C"], (0, 1)))
                    blocks.append(jnp.sum(tb["B"], 1) + jnp.sum(tb["D"], 1)
                                  + jnp.sum(tb["F"], 1)
                                  + jnp.sum(tb["G"], 1))
                return XVec(first, tuple(blocks))

            sigmacol, cntcol = cols_build(0), cols_build(1)

            def Pg(g: XVec):
                PB0 = tabs[0][1]
                firstE = PB0["A0"] @ g.first
                firstC = PB0["C0"] @ g.first
                linkE = PB0["F0"] @ g.first
                linkC = PB0["G0"] @ g.first
                blkE, blkC = [], []
                for b, (Lb, Pb) in enumerate(tabs):
                    gb = g.blocks[b]
                    blkE.append(jnp.einsum("imk,k->im", Pb["A"], g.first)
                                + jnp.einsum("imn,in->im", Pb["B"], gb))
                    blkC.append(jnp.einsum("imk,k->im", Pb["C"], g.first)
                                + jnp.einsum("imn,in->im", Pb["D"], gb))
                    linkE = linkE + jnp.einsum("iln,in->l", Pb["F"], gb)
                    linkC = linkC + jnp.einsum("iln,in->l", Pb["G"], gb)
                return (RVec(firstE, tuple(blkE), linkE),
                        RVec(firstC, tuple(blkC), linkC))

            def PTr(rE_: RVec, rC_: RVec):
                PB0 = tabs[0][1]
                first = (PB0["A0"].T @ rE_.first + PB0["C0"].T @ rC_.first
                         + PB0["F0"].T @ rE_.link + PB0["G0"].T @ rC_.link)
                blocks = []
                for b, (Lb, Pb) in enumerate(tabs):
                    first = first + (
                        jnp.einsum("imk,im->k", Pb["A"], rE_.blocks[b])
                        + jnp.einsum("imk,im->k", Pb["C"], rC_.blocks[b]))
                    blocks.append(
                        jnp.einsum("imn,im->in", Pb["B"], rE_.blocks[b])
                        + jnp.einsum("imn,im->in", Pb["D"], rC_.blocks[b])
                        + jnp.einsum("iln,l->in", Pb["F"], rE_.link)
                        + jnp.einsum("iln,l->in", Pb["G"], rC_.link))
                return XVec(first, tuple(blocks))
        elif isinstance(view, _DenseView):
            LA, PA = logabs(lp.A)
            LC, PC = logabs(lp.C)

            def rowsum(L_A, L_C):
                return jnp.sum(L_A, -1), jnp.sum(L_C, -1)

            def colsum(L_A, L_C):
                return jnp.sum(L_A, -2) + jnp.sum(L_C, -2)

            sigmaE, sigmaC = rowsum(LA, LC)
            sigmacol = colsum(LA, LC)
            cntE, cntC = jnp.sum(PA, -1), jnp.sum(PC, -1)
            cntcol = jnp.sum(PA, -2) + jnp.sum(PC, -2)

            def Pg(g):           # pattern @ gamma -> rows
                return PA @ g, PC @ g

            def PTr(rE_, rC_):   # pattern' @ rho -> cols
                return PA.T @ rE_ + PC.T @ rC_
        else:
            LB = {}
            PB = {}
            for name in ("A0", "C0", "A", "B", "C", "D", "F0", "F",
                         "G0", "G"):
                LB[name], PB[name] = logabs(getattr(lp, name))

            def rows_of(p0, pb, pd, pl0, plb):
                first = jnp.sum(p0, -1)
                blocks = jnp.sum(pb, -1) + jnp.sum(pd, -1)
                link = jnp.sum(pl0, -1) + jnp.sum(plb, (0, 2))
                return RVec(first, blocks, link)

            sigmaE = rows_of(LB["A0"], LB["A"], LB["B"], LB["F0"], LB["F"])
            sigmaC = rows_of(LB["C0"], LB["C"], LB["D"], LB["G0"], LB["G"])
            cntE = rows_of(PB["A0"], PB["A"], PB["B"], PB["F0"], PB["F"])
            cntC = rows_of(PB["C0"], PB["C"], PB["D"], PB["G0"], PB["G"])

            def cols_of(t):
                first = (jnp.sum(t["A0"], 0) + jnp.sum(t["C0"], 0)
                         + jnp.sum(t["F0"], 0) + jnp.sum(t["G0"], 0)
                         + jnp.sum(t["A"], (0, 1)) + jnp.sum(t["C"], (0, 1)))
                blocks = (jnp.sum(t["B"], 1) + jnp.sum(t["D"], 1)
                          + jnp.sum(t["F"], 1) + jnp.sum(t["G"], 1))
                return XVec(first, blocks)

            sigmacol = cols_of(LB)
            cntcol = cols_of(PB)

            def Pg(g: XVec):
                first = PB["A0"] @ g.first
                blocks = (jnp.einsum("imk,k->im", PB["A"], g.first)
                          + jnp.einsum("imn,in->im", PB["B"], g.blocks))
                link = PB["F0"] @ g.first + jnp.einsum(
                    "iln,in->l", PB["F"], g.blocks)
                firstC = PB["C0"] @ g.first
                blocksC = (jnp.einsum("imk,k->im", PB["C"], g.first)
                           + jnp.einsum("imn,in->im", PB["D"], g.blocks))
                linkC = PB["G0"] @ g.first + jnp.einsum(
                    "iln,in->l", PB["G"], g.blocks)
                return RVec(first, blocks, link), RVec(firstC, blocksC, linkC)

            def PTr(rE_: RVec, rC_: RVec):
                first = (PB["A0"].T @ rE_.first + PB["C0"].T @ rC_.first
                         + PB["F0"].T @ rE_.link + PB["G0"].T @ rC_.link
                         + jnp.einsum("imk,im->k", PB["A"], rE_.blocks)
                         + jnp.einsum("imk,im->k", PB["C"], rC_.blocks))
                blocks = (jnp.einsum("imn,im->in", PB["B"], rE_.blocks)
                          + jnp.einsum("imn,im->in", PB["D"], rC_.blocks)
                          + jnp.einsum("iln,l->in", PB["F"], rE_.link)
                          + jnp.einsum("iln,l->in", PB["G"], rC_.link))
                return XVec(first, blocks)

        # CG on K u = rhs, u = (rhoE, rhoC, gamma),
        # K = [[diag(cnt_rows), P], [P', diag(cnt_cols)]]
        rhs = (tmap(lambda v: -v, sigmaE), tmap(lambda v: -v, sigmaC),
               tmap(lambda v: -v, sigmacol))

        def Kmul(u):
            uE, uC, g = u
            PgE, PgC = Pg(g)
            outE = tmap(lambda c, r, p: c * r + p, cntE, uE, PgE)
            outC = tmap(lambda c, r, p: c * r + p, cntC, uC, PgC)
            outg = tmap(lambda c, gg, p: c * gg + p, cntcol, g, PTr(uE, uC))
            return outE, outC, outg

        def dot(a, b):
            return sum(jnp.vdot(x, y) for x, y in
                       zip(jax.tree.leaves(a), jax.tree.leaves(b)))

        # K is positive SEMI-definite (the constant row-shift/col-shift
        # direction is a null space), so CG iterates can drift along null
        # directions once rounding mixes them in: keep the iterate with
        # the BEST residual, and clamp the final log2 factors — a scaling
        # must never be able to destroy the problem (reference MC30/CR
        # implementations clamp the same way)
        u = tmap(jnp.zeros_like, rhs)
        r = rhs
        p = r
        rs = dot(r, r)
        best_u, best_rs = u, rs
        for _ in range(self.cg_iters):
            Kp = Kmul(p)
            denom = dot(p, Kp)
            alpha = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-300), 0.0)
            u = tmap(lambda uu, pp: uu + alpha * pp, u, p)
            r = tmap(lambda rr, kp: rr - alpha * kp, r, Kp)
            rs_new = dot(r, r)
            improved = rs_new < best_rs
            best_u = jax.tree.map(
                lambda b, c: jnp.where(improved, c, b), best_u, u)
            best_rs = jnp.where(improved, rs_new, best_rs)
            beta = rs_new / jnp.maximum(rs, 1e-300)
            p = tmap(lambda rr, pp: rr + beta * pp, r, p)
            rs = rs_new

        rhoE, rhoC, gamma = best_u
        CLAMP = 30.0   # factors within 2^+-30
        f = lambda v: jnp.ldexp(
            jnp.ones_like(v),
            jnp.clip(jnp.round(v), -CLAMP, CLAMP).astype(jnp.int32))
        rE = tmap(f, rhoE)
        rC = tmap(f, rhoC)
        s = tmap(f, gamma)
        return s, rE, rC


def make_scaler(kind: ScalerType) -> _ScalerBase:
    if kind == ScalerType.EQUILIBRIUM:
        return EquilibriumScaler()
    if kind == ScalerType.GEOMETRIC_MEAN:
        return GeometricMeanScaler()
    if kind == ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM:
        return GeometricMeanScaler(with_equilibrium=True)
    if kind == ScalerType.CURTIS_REID:
        return CurtisReidScaler()
    raise ValueError(f"no scaler for {kind}")
