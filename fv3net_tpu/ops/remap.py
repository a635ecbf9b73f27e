"""Conservative PPM vertical remapping (the mappm algorithm, TPU-native).

Re-implements the vertical-profile reconstruction and mass-flux-preserving
remap of FV3's ``fv_mapz`` family, whose exact semantics the reference
vendors as the f2py extension ``external/mappm/mappm/mappm.f90``:
``cs_profile`` (cubic-spline edge reconstruction, kord 8-16 limiter
variants, mappm.f90:132-509), ``cs_limiters`` (:535), ``ppm_profile``
(4th-order edge interpolation + Huynh constraint, :614), ``ppm_limiters``
(:854), and the interval-overlap integration of ``mappm`` itself (:10-124).

Design for TPU: everything is vectorized over an arbitrary batch of
columns.  The layer axis `k` is moved to the FRONT internally, so all the
k-shifted stencil terms are static slices and the two tridiagonal sweeps
are `lax.scan`s whose carried state is a full (batch...) array -- the VPU
processes every column of the cube in lockstep.  The remap integration
itself is reformulated as evaluation of the piecewise-parabolic cumulative
mass function at the target edges (a broadcasted interval search + analytic
partial integrals), which is algebraically identical to the Fortran per-
interval accumulation but has no data-dependent inner loops.

Only batch semantics differ from the Fortran; per-column results agree to
roundoff (see tests/test_remap.py, which checks against an independent
scalar-loop implementation of the algorithm).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _clamp(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def _mono_clamp(q, a, b):
    """Clamp q into [min(a,b), max(a,b)]."""
    return _clamp(q, jnp.minimum(a, b), jnp.maximum(a, b))


# ---------------------------------------------------------------------------
# limiters (elementwise on one layer's (a, al, ar, a6); vectorized)
# ---------------------------------------------------------------------------


def _standard_ppm_constraint(a, al, ar, a6):
    """The classic PPM overshoot constraint (non-extremum branch)."""
    da1 = ar - al
    da2 = da1 * da1
    a6da = a6 * da1
    # case 1: a6da < -da2 -> left-biased parabola
    a6_1 = 3.0 * (al - a)
    ar_1 = al - a6_1
    # case 2: a6da > da2 -> right-biased
    a6_2 = 3.0 * (ar - a)
    al_2 = ar - a6_2
    lo = a6da < -da2
    hi = a6da > da2
    al_new = jnp.where(hi, al_2, al)
    ar_new = jnp.where(lo, ar_1, ar)
    a6_new = jnp.where(lo, a6_1, jnp.where(hi, a6_2, a6))
    return al_new, ar_new, a6_new


def _flatten(a, al, ar, a6, cond):
    """Replace the parabola by the constant a where cond."""
    return (
        jnp.where(cond, a, al),
        jnp.where(cond, a, ar),
        jnp.where(cond, 0.0, a6),
    )


def cs_limiters(a, al, ar, a6, extm, mode: int):
    """cs_limiters (mappm.f90:535-612) vectorized.

    mode 0: positive-definite constraint
    mode 1: monotone wrt the cell mean (used for top/bottom layers)
    mode 2: standard PPM constraint gated on the extremum flag
    """
    if mode == 0:
        nonpos = a <= 0.0
        al0, ar0, a60 = _flatten(a, al, ar, a6, nonpos)
        # interior minimum check for the positive branch
        da1 = ar0 - al0
        has_min = jnp.abs(da1) < -a60
        safe_a6 = jnp.where(a60 == 0.0, 1.0, a60)
        fmin = a + 0.25 * da1 * da1 / safe_a6 + a60 * (1.0 / 12.0)
        neg_min = has_min & (fmin < 0.0) & (~nonpos)
        mid_low = (a < ar0) & (a < al0)
        right_up = ar0 > al0
        # flatten if the mean is below both edges
        alf, arf, a6f = _flatten(a, al0, ar0, a60, neg_min & mid_low)
        # else bias toward the lower edge
        a6_l = 3.0 * (al0 - a)
        ar_l = al0 - a6_l
        a6_r = 3.0 * (ar0 - a)
        al_r = ar0 - a6_r
        use_l = neg_min & (~mid_low) & right_up
        use_r = neg_min & (~mid_low) & (~right_up)
        al_new = jnp.where(use_r, al_r, alf)
        ar_new = jnp.where(use_l, ar_l, arf)
        a6_new = jnp.where(use_l, a6_l, jnp.where(use_r, a6_r, a6f))
        return al_new, ar_new, a6_new
    if mode == 1:
        is_ext = (a - al) * (a - ar) >= 0.0
        al0, ar0, a60 = _flatten(a, al, ar, a6, is_ext)
        al1, ar1, a61 = _standard_ppm_constraint(a, al0, ar0, a60)
        keep = is_ext
        return (
            jnp.where(keep, al0, al1),
            jnp.where(keep, ar0, ar1),
            jnp.where(keep, a60, a61),
        )
    if mode == 2:
        al0, ar0, a60 = _flatten(a, al, ar, a6, extm)
        al1, ar1, a61 = _standard_ppm_constraint(a, al0, ar0, a60)
        return (
            jnp.where(extm, al0, al1),
            jnp.where(extm, ar0, ar1),
            jnp.where(extm, a60, a61),
        )
    raise ValueError(f"unknown cs_limiters mode {mode}")


def ppm_limiters(dm, a, al, ar, a6, lmt: int):
    """ppm_limiters (mappm.f90:854-930) vectorized.

    lmt 0: standard PPM constraint (flatten where slope dm == 0)
    lmt 1: full monotonicity (Lin 2004)
    lmt 2: positive definite
    lmt 3: no-op
    """
    if lmt == 3:
        return al, ar, a6
    if lmt == 0:
        flat = dm == 0.0
        al0, ar0, a60 = _flatten(a, al, ar, a6, flat)
        al1, ar1, a61 = _standard_ppm_constraint(a, al0, ar0, a60)
        return (
            jnp.where(flat, al0, al1),
            jnp.where(flat, ar0, ar1),
            jnp.where(flat, a60, a61),
        )
    if lmt == 1:
        qmp = 2.0 * dm
        # Fortran sign(x, 0.) is +|x|, unlike jnp.sign(0) == 0
        szero = jnp.where(qmp == 0.0, 1.0, jnp.sign(qmp))
        al1 = a - szero * jnp.minimum(jnp.abs(qmp), jnp.abs(al - a))
        ar1 = a + szero * jnp.minimum(jnp.abs(qmp), jnp.abs(ar - a))
        a61 = 3.0 * (2.0 * a - (al1 + ar1))
        return al1, ar1, a61
    if lmt == 2:
        da1 = ar - al
        has_min = jnp.abs(da1) < -a6
        safe_a6 = jnp.where(a6 == 0.0, 1.0, a6)
        fmin = a + 0.25 * da1 * da1 / safe_a6 + a6 * (1.0 / 12.0)
        act = has_min & (fmin < 0.0)
        mid_low = (a < ar) & (a < al)
        right_up = ar > al
        alf, arf, a6f = _flatten(a, al, ar, a6, act & mid_low)
        a6_l = 3.0 * (al - a)
        ar_l = al - a6_l
        a6_r = 3.0 * (ar - a)
        al_r = ar - a6_r
        use_l = act & (~mid_low) & right_up
        use_r = act & (~mid_low) & (~right_up)
        return (
            jnp.where(use_r, al_r, alf),
            jnp.where(use_l, ar_l, arf),
            jnp.where(use_l, a6_l, jnp.where(use_r, a6_r, a6f)),
        )
    raise ValueError(f"unknown ppm_limiters lmt {lmt}")


# ---------------------------------------------------------------------------
# cs_profile: cubic-spline edge reconstruction
# ---------------------------------------------------------------------------


def _edge_spline(a, dp, iv, qs):
    """Tridiagonal cubic-spline solve for edge values qe[0..km].

    a, dp: [km, ...] (k leading); returns qe [km+1, ...].
    Two lax.scans: forward elimination and back substitution.
    """
    km = a.shape[0]
    if iv == -2:
        # w-wind variant with prescribed surface value qs
        qe0 = 1.5 * a[0]
        gam1 = jnp.full_like(a[0], 0.5)

        def fwd(carry, x):
            q_prev, gam_prev = carry
            a_m1, a_0, dp_m1, dp_0 = x
            grat = dp_m1 / dp_0
            bet = 2.0 + grat + grat - gam_prev
            q = (3.0 * (a_m1 + a_0) - q_prev) / bet
            gam_next = grat / bet
            return (q, gam_next), (q, gam_next)

        # forward: e = 1..km-2 via scan, then the qs-closed e = km-1
        xs = (a[: km - 2], a[1 : km - 1], dp[: km - 2], dp[1 : km - 1])
        (qlast, gamlast), (q_mid, gam_mid) = lax.scan(fwd, (qe0, gam1), xs)
        grat_b = dp[km - 2] / dp[km - 1]
        q_km1 = (
            3.0 * (a[km - 2] + a[km - 1]) - grat_b * qs - qlast
        ) / (2.0 + grat_b + grat_b - gamlast)
        # qe_fwd[e] for e = 0..km-1 (before back substitution)
        qe_fwd = jnp.concatenate([qe0[None], q_mid, q_km1[None]], axis=0)
        # gam_back[e] multiplies qe[e+1] when updating qe[e], e = 0..km-2
        gam_back = jnp.concatenate([gam1[None], gam_mid], axis=0)

        def back(q_next, x):
            q_e, g = x
            q = q_e - g * q_next
            return q, q

        _, q_rev = lax.scan(
            back, q_km1, (qe_fwd[: km - 1][::-1], gam_back[::-1])
        )
        qe = jnp.concatenate([q_rev[::-1], q_km1[None], qs[None]], axis=0)
        return qe

    # standard variant
    grat = dp[1] / dp[0]
    bet0 = grat * (grat + 0.5)
    qe0 = ((grat + grat) * (grat + 1.0) * a[0] + a[1]) / bet0
    gam0 = (1.0 + grat * (grat + 1.5)) / bet0

    def fwd(carry, x):
        q_prev, gam_prev = carry
        a_m1, a_0, dp_m1, dp_0 = x
        d4 = dp_m1 / dp_0
        bet = 2.0 + d4 + d4 - gam_prev
        q = (3.0 * (a_m1 + d4 * a_0) - q_prev) / bet
        gam = d4 / bet
        return (q, gam), (q, gam)

    xs = (a[:-1], a[1:], dp[:-1], dp[1:])  # e = 1..km-1
    (q_last, gam_last), (q_mid, gam_mid) = lax.scan(fwd, (qe0, gam0), xs)
    d4b = dp[km - 2] / dp[km - 1]
    a_bot = 1.0 + d4b * (d4b + 1.5)
    qe_km = (
        2.0 * d4b * (d4b + 1.0) * a[km - 1] + a[km - 2] - a_bot * q_last
    ) / (d4b * (d4b + 0.5) - a_bot * gam_last)
    qe_fwd = jnp.concatenate([qe0[None], q_mid], axis=0)  # e = 0..km-1
    gam = jnp.concatenate([gam0[None], gam_mid], axis=0)  # e = 0..km-1

    def back(q_next, x):
        q_e, gam_e = x
        q = q_e - gam_e * q_next
        return q, q

    _, q_rev = lax.scan(back, qe_km, (qe_fwd[::-1], gam[::-1]))
    qe = jnp.concatenate([q_rev[::-1], qe_km[None]], axis=0)
    return qe


def _huynh_edges(a, al, ar, dA, dA_p1, dA_p2, dA_m1):
    """Huynh-style pmp/lac clamping of both edges (kord<9 interior form)."""
    pmp_1 = a - 2.0 * dA_p1
    lac_1 = pmp_1 + 1.5 * dA_p2
    al2 = _clamp(
        al,
        jnp.minimum(jnp.minimum(a, pmp_1), lac_1),
        jnp.maximum(jnp.maximum(a, pmp_1), lac_1),
    )
    pmp_2 = a + 2.0 * dA
    lac_2 = pmp_2 - 1.5 * dA_m1
    ar2 = _clamp(
        ar,
        jnp.minimum(jnp.minimum(a, pmp_2), lac_2),
        jnp.maximum(jnp.maximum(a, pmp_2), lac_2),
    )
    return al2, ar2


def cs_profile(a, dp, iv: int, kord: int, qs=None):
    """Cubic-spline PPM reconstruction (cs_profile, mappm.f90:132-509).

    Args:
        a: layer means, shape [km, ...] (k leading)
        dp: layer thicknesses, same shape
        iv: -2 vertical velocity, -1 winds, 0 positive-definite scalars,
            1 others, 2 temperature
        kord: limiter variant; abs(kord) in 8..16 selects the interior
            constraint; abs(kord) > 16 is the unlimited linear scheme
        qs: surface value, required for iv == -2

    Returns:
        (al, ar, a6): left edge, right edge, curvature arrays [km, ...]
    """
    km = a.shape[0]
    if iv == -2 and qs is None:
        qs = jnp.zeros_like(a[0])
    qe = _edge_spline(a, dp, iv, qs)

    if abs(kord) > 16:
        al = qe[:-1]
        ar = qe[1:]
        a6 = 3.0 * (2.0 * a - (al + ar))
        return al, ar, a6

    # --- large-scale constraints on edge values -------------------------
    # dA[c] = a[c] - a[c-1], defined for c = 1..km-1 (index c)
    dA = jnp.concatenate([jnp.zeros_like(a[:1]), a[1:] - a[:-1]], axis=0)

    qe = qe.at[1].set(_mono_clamp(qe[1], a[0], a[1]))
    # interior edges e = 2..km-2
    e_idx = jnp.arange(km + 1).reshape((km + 1,) + (1,) * (a.ndim - 1))
    interior_e = (e_idx >= 2) & (e_idx <= km - 2)
    # per-edge neighbors: for edge e, cells e-1 and e
    a_lo = jnp.concatenate([a[:1], a], axis=0)  # a[e-1] at index e (e>=1)
    a_hi = jnp.concatenate([a, a[-1:]], axis=0)  # a[e] at index e (e<=km-1)
    ze = jnp.zeros_like(dA[:1])
    # dA_em1[e] = dA[e-1]; dA_ep1[e] = dA[e+1] (edge-indexed, len km+1)
    dA_em1 = jnp.concatenate([ze, dA], axis=0)
    dA_ep1 = jnp.concatenate([dA[1:], ze, ze], axis=0)
    both_pos = dA_em1 * dA_ep1 > 0.0
    clamped = _mono_clamp(qe, a_lo, a_hi)
    local_max = dA_em1 > 0.0
    qe_max = jnp.maximum(qe, jnp.minimum(a_lo, a_hi))
    qe_min = jnp.minimum(qe, jnp.maximum(a_lo, a_hi))
    if iv == 0:
        qe_min = jnp.maximum(qe_min, 0.0)
    qe_int = jnp.where(both_pos, clamped, jnp.where(local_max, qe_max,
                                                    qe_min))
    qe = jnp.where(interior_e, qe_int, qe)
    qe = qe.at[km - 1].set(_mono_clamp(qe[km - 1], a[km - 2], a[km - 1]))

    al = qe[:-1]
    ar = qe[1:]

    # --- extremum flags -------------------------------------------------
    c_idx = jnp.arange(km).reshape((km,) + (1,) * (a.ndim - 1))
    dA_c = dA  # dA[c]
    dA_cp1 = jnp.concatenate([dA[1:], jnp.zeros_like(dA[:1])], axis=0)
    extm_int = dA_c * dA_cp1 < 0.0
    extm_bnd = (al - a) * (ar - a) > 0.0
    extm = jnp.where((c_idx == 0) | (c_idx == km - 1), extm_bnd, extm_int)

    x0 = 2.0 * a - (al + ar)
    x1 = jnp.abs(al - ar)
    a6 = 3.0 * x0
    ext5 = jnp.abs(x0) > x1
    ext6 = jnp.abs(a6) > x1

    # --- top boundary ---------------------------------------------------
    if iv == 0:
        al = al.at[0].set(jnp.maximum(al[0], 0.0))
    elif iv == -1:
        al = al.at[0].set(jnp.where(al[0] * a[0] <= 0.0, 0.0, al[0]))
    elif iv == 2:
        al = al.at[0].set(a[0])
        ar = ar.at[0].set(a[0])
        a6 = a6.at[0].set(0.0)
    if iv != 2:
        a6 = a6.at[0].set(3.0 * (2.0 * a[0] - (al[0] + ar[0])))
        l0 = cs_limiters(a[0], al[0], ar[0], a6[0], extm[0], 1)
        al, ar, a6 = al.at[0].set(l0[0]), ar.at[0].set(l0[1]), a6.at[0].set(
            l0[2]
        )
    a6 = a6.at[1].set(3.0 * (2.0 * a[1] - (al[1] + ar[1])))
    l1 = cs_limiters(a[1], al[1], ar[1], a6[1], extm[1], 2)
    al, ar, a6 = al.at[1].set(l1[0]), ar.at[1].set(l1[1]), a6.at[1].set(l1[2])

    # --- interior cells c = 2..km-3: kord-variant constraints -----------
    inter = (c_idx >= 2) & (c_idx <= km - 3)
    shz = jnp.zeros_like(dA[:1])
    dA_m1 = jnp.roll(dA, 1, axis=0)  # dA[c-1]
    dA_p1 = jnp.concatenate([dA[1:], shz], axis=0)  # dA[c+1]
    dA_p2 = jnp.concatenate([dA[2:], shz, shz], axis=0)  # dA[c+2]
    extm_m1 = jnp.roll(extm, 1, axis=0)
    extm_p1 = jnp.concatenate([extm[1:], extm[-1:]], axis=0)
    ext5_m1 = jnp.roll(ext5, 1, axis=0)
    ext5_p1 = jnp.concatenate([ext5[1:], ext5[-1:]], axis=0)
    ext6_m1 = jnp.roll(ext6, 1, axis=0)
    ext6_p1 = jnp.concatenate([ext6[1:], ext6[-1:]], axis=0)

    ak = abs(kord)
    hal, har = _huynh_edges(a, al, ar, dA, dA_p1, dA_p2, dA_m1)
    flat_al, flat_ar = a, a  # 2-delta-z flattening values

    if ak < 9:
        al_n, ar_n = hal, har
        a6_n = 3.0 * (2.0 * a - (al_n + ar_n))
    elif ak == 9:
        wave = (extm & extm_m1) | (extm & extm_p1)
        a6_g = 6.0 * a - 3.0 * (al + ar)
        nonmono = jnp.abs(a6_g) > jnp.abs(al - ar)
        al_s = jnp.where(nonmono, hal, al)
        ar_s = jnp.where(nonmono, har, ar)
        a6_s = 6.0 * a - 3.0 * (al_s + ar_s)
        al_n = jnp.where(wave, flat_al, al_s)
        ar_n = jnp.where(wave, flat_ar, ar_s)
        a6_n = jnp.where(wave, 0.0, a6_s)
    elif ak == 10:
        nb5 = ext5_m1 | ext5_p1
        nb6 = ext6_m1 | ext6_p1
        al_n = jnp.where(
            ext5 & nb5, a,
            jnp.where((ext5 & nb6) | (ext6 & nb5), hal, al),
        )
        ar_n = jnp.where(
            ext5 & nb5, a,
            jnp.where((ext5 & nb6) | (ext6 & nb5), har, ar),
        )
        a6_n = 3.0 * (2.0 * a - (al_n + ar_n))
    elif ak == 12:
        a6_g = 6.0 * a - 3.0 * (al + ar)
        nonmono = jnp.abs(a6_g) > jnp.abs(al - ar)
        al_s = jnp.where(nonmono, hal, al)
        ar_s = jnp.where(nonmono, har, ar)
        a6_s = 6.0 * a - 3.0 * (al_s + ar_s)
        al_n = jnp.where(extm, a, al_s)
        ar_n = jnp.where(extm, a, ar_s)
        a6_n = jnp.where(extm, 0.0, a6_s)
    elif ak == 13:
        wave = ext6 & ext6_m1 & ext6_p1
        al_n = jnp.where(wave, a, al)
        ar_n = jnp.where(wave, a, ar)
        a6_n = 3.0 * (2.0 * a - (al_n + ar_n))
    elif ak == 14:
        al_n, ar_n = al, ar
        a6_n = 3.0 * (2.0 * a - (al + ar))
    elif ak == 15:
        al_n = jnp.where(ext5 & (ext5_m1 | ext5_p1), a,
                         jnp.where(~ext5 & ext6, hal, al))
        ar_n = jnp.where(ext5 & (ext5_m1 | ext5_p1), a,
                         jnp.where(~ext5 & ext6, har, ar))
        a6_n = 3.0 * (2.0 * a - (al_n + ar_n))
    elif ak == 16:
        nb5 = ext5_m1 | ext5_p1
        nb6 = ext6_m1 | ext6_p1
        al_n = jnp.where(ext5 & nb5, a,
                         jnp.where(ext5 & ~nb5 & nb6, hal, al))
        ar_n = jnp.where(ext5 & nb5, a,
                         jnp.where(ext5 & ~nb5 & nb6, har, ar))
        a6_n = 3.0 * (2.0 * a - (al_n + ar_n))
    else:  # kord 11
        noisy = ext5 & (ext5_m1 | ext5_p1)
        al_n = jnp.where(noisy, a, al)
        ar_n = jnp.where(noisy, a, ar)
        a6_n = jnp.where(noisy, 0.0, 3.0 * (2.0 * a - (al + ar)))

    al = jnp.where(inter, al_n, al)
    ar = jnp.where(inter, ar_n, ar)
    a6 = jnp.where(inter, a6_n, a6)

    if iv == 0:
        lp = cs_limiters(a, al, ar, a6, extm, 0)
        al = jnp.where(inter, lp[0], al)
        ar = jnp.where(inter, lp[1], ar)
        a6 = jnp.where(inter, lp[2], a6)

    # --- bottom boundary ------------------------------------------------
    if iv == 0:
        ar = ar.at[km - 1].set(jnp.maximum(ar[km - 1], 0.0))
    elif iv == -1:
        ar = ar.at[km - 1].set(
            jnp.where(ar[km - 1] * a[km - 1] <= 0.0, 0.0, ar[km - 1])
        )
    for c, mode in ((km - 2, 2), (km - 1, 1)):
        a6 = a6.at[c].set(3.0 * (2.0 * a[c] - (al[c] + ar[c])))
        lc = cs_limiters(a[c], al[c], ar[c], a6[c], extm[c], mode)
        al, ar, a6 = (
            al.at[c].set(lc[0]),
            ar.at[c].set(lc[1]),
            a6.at[c].set(lc[2]),
        )
    return al, ar, a6


# ---------------------------------------------------------------------------
# ppm_profile: the kord <= 7 reconstruction
# ---------------------------------------------------------------------------


def ppm_profile(a, dp, iv: int, kord: int):
    """4th-order PPM reconstruction (ppm_profile, mappm.f90:614-852).

    a, dp: [km, ...] (k leading).  Returns (al, ar, a6).
    """
    km = a.shape[0]
    zc = jnp.zeros_like(a[:1])
    delq = a[1:] - a[:-1]  # [km-1]: delq[c] = a[c+1]-a[c]
    d4 = dp[:-1] + dp[1:]  # [km-1]: d4[c-1] in cell terms -> index shift
    # pad to cell-indexed arrays: d4_c[c] = dp[c-1]+dp[c] for c>=1
    d4_c = jnp.concatenate([zc, d4], axis=0)
    delq_c = jnp.concatenate([delq, zc], axis=0)  # delq_c[c] = a[c+1]-a[c]
    delq_m1 = jnp.concatenate([zc, delq], axis=0)  # delq_m1[c]=a[c]-a[c-1]

    # monotone-limited slope dc for c = 1..km-2
    dp_m1 = jnp.roll(dp, 1, axis=0)
    dp_p1 = jnp.concatenate([dp[1:], dp[-1:]], axis=0)
    d4_p1 = jnp.concatenate([d4_c[1:], zc], axis=0)
    c1s = (dp_m1 + 0.5 * dp) / d4_p1.clip(1e-30)
    c2s = (dp_p1 + 0.5 * dp) / d4_c.clip(1e-30)
    df2 = dp * (c1s * delq_c + c2s * delq_m1) / (d4_c + dp_p1).clip(1e-30)
    a_m1 = jnp.roll(a, 1, axis=0)
    a_p1 = jnp.concatenate([a[1:], a[-1:]], axis=0)
    amax = jnp.maximum(jnp.maximum(a_m1, a), a_p1)
    amin = jnp.minimum(jnp.minimum(a_m1, a), a_p1)
    dc = jnp.sign(df2) * jnp.minimum(
        jnp.abs(df2), jnp.minimum(amax - a, a - amin)
    )
    c_idx = jnp.arange(km).reshape((km,) + (1,) * (a.ndim - 1))
    dc = jnp.where((c_idx >= 1) & (c_idx <= km - 2), dc, 0.0)

    # 4th-order left edges for c = 2..km-2
    dc_m1 = jnp.roll(dc, 1, axis=0)
    d4_m1 = jnp.roll(d4_c, 1, axis=0)
    c1e = delq_m1 * dp_m1 / d4_c.clip(1e-30)
    a1e = d4_m1 / (d4_c + dp_m1).clip(1e-30)
    a2e = d4_p1 / (d4_c + dp).clip(1e-30)
    al = a_m1 + c1e + 2.0 / (d4_m1 + d4_p1).clip(1e-30) * (
        dp * (c1e * (a1e - a2e) + a2e * dc_m1) - dp_m1 * a1e * dc
    )
    al = jnp.where((c_idx >= 2) & (c_idx <= km - 2), al, 0.0)

    # top boundary: area-preserving cubic with zero 2nd derivative
    d1, d2 = dp[0], dp[1]
    qm = (d2 * a[0] + d1 * a[1]) / (d1 + d2)
    dq = 2.0 * (a[1] - a[0]) / (d1 + d2)
    c1t = 4.0 * (al[2] - qm - d2 * dq) / (
        d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1))
    )
    c3t = dq - 0.5 * c1t * (d2 * (5.0 * d1 + d2) - 3.0 * d1 * d1)
    al1 = qm - 0.25 * c1t * d1 * d2 * (d2 + 3.0 * d1)
    al0 = d1 * (2.0 * c1t * d1 * d1 - c3t) + al1
    al1 = _mono_clamp(al1, a[0], a[1])
    al = al.at[1].set(al1)
    al = al.at[0].set(al0)
    dc = dc.at[0].set(0.5 * (al[1] - a[0]))

    ar_top = None
    if iv == 0:
        al = al.at[0].set(jnp.maximum(al[0], 0.0))
        al = al.at[1].set(jnp.maximum(al[1], 0.0))
    elif iv == -1:
        al = al.at[0].set(jnp.where(al[0] * a[0] <= 0.0, 0.0, al[0]))
    elif abs(iv) == 2:
        al = al.at[0].set(a[0])
        ar_top = a[0]

    # bottom boundary
    d1, d2 = dp[km - 1], dp[km - 2]
    qm = (d2 * a[km - 1] + d1 * a[km - 2]) / (d1 + d2)
    dq = 2.0 * (a[km - 2] - a[km - 1]) / (d1 + d2)
    c1b = (al[km - 1] - qm - d2 * dq) / (
        d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1))
    )
    c3b = dq - 2.0 * c1b * (d2 * (5.0 * d1 + d2) - 3.0 * d1 * d1)
    al_km1 = qm - c1b * d1 * d2 * (d2 + 3.0 * d1)
    ar_bot = d1 * (8.0 * c1b * d1 * d1 - c3b) + al_km1
    al_km1 = _mono_clamp(al_km1, a[km - 1], a[km - 2])
    al = al.at[km - 1].set(al_km1)
    dc = dc.at[km - 1].set(0.5 * (a[km - 1] - al[km - 1]))
    if iv == 0:
        al = al.at[km - 1].set(jnp.maximum(al[km - 1], 0.0))
        ar_bot = jnp.maximum(ar_bot, 0.0)
    elif iv < 0:
        ar_bot = jnp.where(a[km - 1] * ar_bot <= 0.0, 0.0, ar_bot)

    ar = jnp.concatenate([al[1:], ar_bot[None]], axis=0)
    if ar_top is not None:
        ar = ar.at[0].set(ar_top)

    a6 = 3.0 * (2.0 * a - (al + ar))

    # top 2 layers: standard constraint
    for c in (0, 1):
        a6 = a6.at[c].set(3.0 * (2.0 * a[c] - (al[c] + ar[c])))
        lc = ppm_limiters(dc[c], a[c], al[c], ar[c], a6[c], 0)
        al, ar, a6 = (
            al.at[c].set(lc[0]),
            ar.at[c].set(lc[1]),
            a6.at[c].set(lc[2]),
        )

    inter = (c_idx >= 2) & (c_idx <= km - 3)
    # boundary dc values were updated above; refresh the shifted views
    dc_m1 = jnp.roll(dc, 1, axis=0)
    if kord >= 7:
        # Huynh's 2nd constraint via the smoothness indicator h2
        h2 = (
            2.0
            * (
                jnp.concatenate([dc[1:], dc[-1:]], 0) / dp_p1.clip(1e-30)
                - dc_m1 / dp_m1.clip(1e-30)
            )
            / (dp + 0.5 * (dp_m1 + dp_p1)).clip(1e-30)
            * dp
            * dp
        )
        h2 = jnp.where((c_idx >= 1) & (c_idx <= km - 2), h2, 0.0)
        h2_m1 = jnp.roll(h2, 1, axis=0)
        h2_p1 = jnp.concatenate([h2[1:], h2[-1:]], axis=0)
        fac = 1.5
        pmp = 2.0 * dc
        qmp_r = a + pmp
        lac_r = a + fac * h2_m1 + dc
        ar_n = _clamp(
            ar,
            jnp.minimum(jnp.minimum(a, qmp_r), lac_r),
            jnp.maximum(jnp.maximum(a, qmp_r), lac_r),
        )
        qmp_l = a - pmp
        lac_l = a + fac * h2_p1 - dc
        al_n = _clamp(
            al,
            jnp.minimum(jnp.minimum(a, qmp_l), lac_l),
            jnp.maximum(jnp.maximum(a, qmp_l), lac_l),
        )
        a6_n = 3.0 * (2.0 * a - (al_n + ar_n))
        al = jnp.where(inter, al_n, al)
        ar = jnp.where(inter, ar_n, ar)
        a6 = jnp.where(inter, a6_n, a6)
        if iv == 0 and kord >= 6:
            lp = ppm_limiters(dc, a, al, ar, a6, 2)
            al = jnp.where(inter, lp[0], al)
            ar = jnp.where(inter, lp[1], ar)
            a6 = jnp.where(inter, lp[2], a6)
    else:
        lmt = max(0, kord - 3)
        if iv == 0:
            lmt = min(2, lmt)
        if kord != 4:
            a6 = jnp.where(inter, 3.0 * (2.0 * a - (al + ar)), a6)
        if kord != 6:
            lp = ppm_limiters(dc, a, al, ar, a6, lmt)
            al = jnp.where(inter, lp[0], al)
            ar = jnp.where(inter, lp[1], ar)
            a6 = jnp.where(inter, lp[2], a6)

    for c in (km - 2, km - 1):
        a6 = a6.at[c].set(3.0 * (2.0 * a[c] - (al[c] + ar[c])))
        lc = ppm_limiters(dc[c], a[c], al[c], ar[c], a6[c], 0)
        al, ar, a6 = (
            al.at[c].set(lc[0]),
            ar.at[c].set(lc[1]),
            a6.at[c].set(lc[2]),
        )
    return al, ar, a6


# ---------------------------------------------------------------------------
# the remap itself
# ---------------------------------------------------------------------------


def _reconstruct(q1, dp1, iv: int, kord: int, qs):
    if kord > 7:
        return cs_profile(q1, dp1, iv, kord, qs)
    return ppm_profile(q1, dp1, iv, kord)


@partial(jax.jit, static_argnames=("iv", "kord", "exact_boundaries"))
def ppm_remap(
    q1, pe1, pe2, iv: int = 1, kord: int = 1, qs=None,
    exact_boundaries: bool = False,
):
    """Mass-flux-preserving remap q1(pe1) -> q2(pe2) (mappm, mappm.f90:10).

    Args:
        q1: layer means on the source grid, [km, ...] (k leading)
        pe1: source layer-edge pressures, [km+1, ...], increasing in k
        pe2: target layer-edge pressures, [kn+1, ...]
        iv, kord: see cs_profile; `kord > 7` selects cs_profile,
            otherwise ppm_profile (signed, matching mappm's dispatch)
        qs: surface value for iv == -2

    Returns:
        q2: layer means on the target grid, [kn, ...]

    The Fortran accumulates overlap integrals interval by interval; here we
    evaluate the piecewise-parabolic cumulative mass function M(p) at every
    target edge and difference -- algebraically identical, fully batched.
    Out-of-range behavior matches mappm: a target layer whose top edge is
    at/above the source top takes q1[0]; one whose top edge is at/below
    the source bottom takes q1[km-1]; layers extending past the source
    bottom integrate a constant q1[km-1] extension.  NOTE mappm's
    top-layer rule fires even when pe2[0] == pe1[0] exactly, replacing
    that layer's true parabola average by q1[0] -- so the Fortran
    algorithm is NOT exactly conservative when grids share the top edge.
    The dycore's Lagrangian->Eulerian remap requires exact conservation:
    pass ``exact_boundaries=True`` to restrict the constant overrides to
    strictly out-of-range layers (conservation then holds to roundoff by
    telescoping of the cumulative integral).
    """
    km = q1.shape[0]
    kn = pe2.shape[0] - 1
    dp1 = pe1[1:] - pe1[:-1]
    al, ar, a6 = _reconstruct(q1, dp1, iv, kord, qs)

    def cum_mass(p):
        """M(p) with constant extension beyond the source column.

        p: [kn+1, ...] target edge pressures.  Gather-free form (TPU:
        take_along_axis lowers to per-element scalar gathers, ~2000x
        slower than this dense clipped-parabola reduction): every
        source layer contributes its parabola integral clipped to p,
            s_k(p) = clip((p - pe1[k]) / dp1[k], 0, 1)
            M(p)   = sum_k dp1[k] * [al s + (ar-al)/2 s^2
                                      + a6 (s^2/2 - s^3/3)](s_k(p));
        s=1 reduces to the layer mean a_k, so fully-covered layers
        telescope exactly (conservation to roundoff).
        """
        pc = jnp.clip(p, pe1[0], pe1[km])
        # [km, kn+1, ...] broadcast; XLA fuses the k-reduction.
        # zero-thickness layers contribute nothing (guard the 0/0).
        dp_safe = jnp.where(dp1 > 0, dp1, 1.0)
        s = (pc[None] - pe1[:-1, None]) / dp_safe[:, None]
        s = jnp.clip(s, 0.0, 1.0)
        dal = ar - al
        poly = (
            al[:, None] * s
            + 0.5 * dal[:, None] * s * s
            + a6[:, None] * (0.5 * s * s - s * s * s / 3.0)
        )
        m = jnp.sum(dp1[:, None] * poly, axis=0)
        # constant extensions
        m = m + q1[0] * jnp.minimum(p - pe1[0], 0.0)
        m = m + q1[km - 1] * jnp.maximum(p - pe1[km], 0.0)
        return m

    M = cum_mass(pe2)
    dp2 = pe2[1:] - pe2[:-1]
    q2 = (M[1:] - M[:-1]) / dp2

    if exact_boundaries:
        # the cumulative integral with constant extension is already the
        # conservative answer everywhere; fully-outside layers reduce to
        # q1[0] / q1[km-1] automatically.
        return q2
    # mappm's verbatim out-of-range layer rules
    top_edge = pe2[:-1]
    q2 = jnp.where(top_edge <= pe1[0], q1[0], q2)
    q2 = jnp.where(top_edge >= pe1[km], q1[km - 1], q2)
    return q2


def interpolate_columns(xp, x, y, fill_value=jnp.nan):
    """Columnwise linear interpolation (interpolate_2d.f90 semantics).

    Args:
        xp: target coordinates [n_out, ...] (leading axis = levels)
        x: source coordinates [n_in, ...], monotonically increasing in k
        y: source values [n_in, ...]
        fill_value: value outside [x[0], x[-1]]

    Returns: y interpolated at xp; out-of-range points get fill_value.
    Boundary semantics match the Fortran: xp == x[k] returns y[k] exactly,
    and xp == x[-1] (the last edge) is in range.
    """
    # gather-free (take_along_axis is per-element scalar gathers on
    # TPU): for monotone x the piecewise-linear interpolant telescopes,
    #   y(t) = y[0] + sum_k (y[k+1]-y[k]) clip((t-x[k])/(x[k+1]-x[k]),0,1)
    s = (xp[None] - x[:-1, None]) / (x[1:, None] - x[:-1, None])
    s = jnp.clip(s, 0.0, 1.0)
    out = y[0] + jnp.sum((y[1:, None] - y[:-1, None]) * s, axis=0)
    in_range = (xp >= x[0]) & (xp <= x[-1])
    return jnp.where(in_range, out, fill_value)
