"""Fused Pallas TPU kernel for the conservative PPM vertical remap.

The jnp `ops.remap.ppm_remap` (the mappm algorithm,
external/mappm/mappm/mappm.f90; see ops/remap.py) is called 7x per
dycore remap step through `moveaxis(.., 1, 0)` wrappers: each call
materializes two full-field transposes in HBM, runs the edge-spline
scans as 63-iteration XLA while loops, and evaluates the O(km*kn)
cumulative-mass reduction through HBM-resident broadcasts.

This kernel runs the whole remap NATIVELY on the dycore's
[F, nz, Y, X] layout (level axis 1 -- no transposes exist at all):
per (face, y-stripe) block the reconstruction (cs_profile kord-9
family + cs_limiters), the two tridiagonal edge-spline sweeps and the
clipped-parabola cumulative integration all run in VMEM; HBM traffic
is one read of (q, pe1, pe2) and one write of q2.

Scope: the dycore hot path -- cs_profile reconstruction (kord > 7),
iv in {1, 0, -1}, exact_boundaries=True semantics (conservative
cumulative form, ops/remap.py:735-739).  Everything else stays on the
jnp reference implementation, against which this kernel is
equivalence-gated (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Dispatch default for the in-dycore remap: OFF.  On the real chip the
# kernel is numerically equivalent and ~2x faster than the jnp remap in
# isolation, but the in-step gain is only ~15 ms at C192 (XLA already
# fuses most of the jnp remap) while the extra Mosaic compiles cost
# ~97 s per fresh process over the axon tunnel's server-side compiler.
# Enable explicitly for long-running production processes where compile
# time amortizes.
_USE_REMAP_KERNEL = False


def set_remap_kernel(flag: bool):
    global _USE_REMAP_KERNEL
    _USE_REMAP_KERNEL = flag


def remap_kernel_enabled() -> bool:
    if not _USE_REMAP_KERNEL:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _clamp(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def _mono_clamp(q, a, b):
    return _clamp(q, jnp.minimum(a, b), jnp.maximum(a, b))


def _row_mask(km, shape, lo, hi):
    """Boolean (km, BY, X) mask for rows lo..hi inclusive."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (idx >= lo) & (idx <= hi)


def _standard_ppm_constraint(a, al, ar, a6):
    # mirror of ops.remap._standard_ppm_constraint
    da1 = ar - al
    da2 = da1 * da1
    a6da = a6 * da1
    a6_1 = 3.0 * (al - a)
    ar_1 = al - a6_1
    a6_2 = 3.0 * (ar - a)
    al_2 = ar - a6_2
    lo = a6da < -da2
    hi = a6da > da2
    return (
        jnp.where(hi, al_2, al),
        jnp.where(lo, ar_1, ar),
        jnp.where(lo, a6_1, jnp.where(hi, a6_2, a6)),
    )


def _flatten(a, al, ar, a6, cond):
    return (
        jnp.where(cond, a, al),
        jnp.where(cond, a, ar),
        jnp.where(cond, 0.0, a6),
    )


def _cs_limiters(a, al, ar, a6, extm, mode: int):
    # mirror of ops.remap.cs_limiters (elementwise; full-block here)
    if mode == 0:
        nonpos = a <= 0.0
        al0, ar0, a60 = _flatten(a, al, ar, a6, nonpos)
        da1 = ar0 - al0
        has_min = jnp.abs(da1) < -a60
        safe_a6 = jnp.where(a60 == 0.0, 1.0, a60)
        fmin = a + 0.25 * da1 * da1 / safe_a6 + a60 * (1.0 / 12.0)
        neg_min = has_min & (fmin < 0.0) & (~nonpos)
        mid_low = (a < ar0) & (a < al0)
        right_up = ar0 > al0
        alf, arf, a6f = _flatten(a, al0, ar0, a60, neg_min & mid_low)
        a6_l = 3.0 * (al0 - a)
        ar_l = al0 - a6_l
        a6_r = 3.0 * (ar0 - a)
        al_r = ar0 - a6_r
        use_l = neg_min & (~mid_low) & right_up
        use_r = neg_min & (~mid_low) & (~right_up)
        return (
            jnp.where(use_r, al_r, alf),
            jnp.where(use_l, ar_l, arf),
            jnp.where(use_l, a6_l, jnp.where(use_r, a6_r, a6f)),
        )
    if mode == 1:
        is_ext = (a - al) * (a - ar) >= 0.0
        al0, ar0, a60 = _flatten(a, al, ar, a6, is_ext)
        al1, ar1, a61 = _standard_ppm_constraint(a, al0, ar0, a60)
        return (
            jnp.where(is_ext, al0, al1),
            jnp.where(is_ext, ar0, ar1),
            jnp.where(is_ext, a60, a61),
        )
    if mode == 2:
        al0, ar0, a60 = _flatten(a, al, ar, a6, extm)
        al1, ar1, a61 = _standard_ppm_constraint(a, al0, ar0, a60)
        return (
            jnp.where(extm, al0, al1),
            jnp.where(extm, ar0, ar1),
            jnp.where(extm, a60, a61),
        )
    raise ValueError(mode)


def _huynh_edges(a, al, ar, dA, dA_p1, dA_p2, dA_m1):
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


def _set_row(arr, i: int, val):
    """Replace row i (static) of a k-leading block value.  Built from
    non-empty concats only -- Mosaic rejects 0-sized vector types."""
    parts = []
    if i > 0:
        parts.append(arr[:i])
    parts.append(val[None])
    if i + 1 < arr.shape[0]:
        parts.append(arr[i + 1 :])
    return parts[0] if len(parts) == 1 else jnp.concatenate(
        parts, axis=0
    )


def _edge_spline_kernel(q_ref, dp_s, km, qe_s, gam_s):
    """Standard-variant cubic-spline edge solve; writes qe rows
    0..km into qe_s.  Loop-carried rows are read through REFS --
    Mosaic has no dynamic_slice on values, only on refs."""
    a0, a1 = q_ref[0, 0], q_ref[0, 1]
    grat = dp_s[1] / dp_s[0]
    bet0 = grat * (grat + 0.5)
    qe0 = ((grat + grat) * (grat + 1.0) * a0 + a1) / bet0
    gam0 = (1.0 + grat * (grat + 1.5)) / bet0
    qe_s[0] = qe0
    gam_s[0] = gam0

    def fwd(e, carry):
        q_prev, gam_prev = carry
        a_m1 = q_ref[0, e - 1]
        a_0 = q_ref[0, e]
        d4 = dp_s[e - 1] / dp_s[e]
        bet = 2.0 + d4 + d4 - gam_prev
        q = (3.0 * (a_m1 + d4 * a_0) - q_prev) / bet
        gam = d4 / bet
        qe_s[e] = q
        gam_s[e] = gam
        return (q, gam)

    q_last, gam_last = jax.lax.fori_loop(
        1, km, fwd, (qe0, gam0), unroll=False
    )
    d4b = dp_s[km - 2] / dp_s[km - 1]
    a_bot = 1.0 + d4b * (d4b + 1.5)
    qe_km = (
        2.0 * d4b * (d4b + 1.0) * q_ref[0, km - 1] + q_ref[0, km - 2]
        - a_bot * q_last
    ) / (d4b * (d4b + 0.5) - a_bot * gam_last)
    qe_s[km] = qe_km

    def back(i, q_next):
        e = km - 1 - i
        q = qe_s[e] - gam_s[e] * q_next
        qe_s[e] = q
        return q

    jax.lax.fori_loop(0, km, back, qe_km, unroll=False)


def _cs_profile_block(a, dp, qe, iv: int, kord: int):
    """cs_profile (ops/remap.py:282-475) on k-leading block values,
    with the per-row boundary updates expressed as row-masked
    composition (the row sets are disjoint, so order is preserved)."""
    km = a.shape[0]
    shp = a.shape
    z1 = jnp.zeros_like(a[:1])

    if abs(kord) > 16:
        al = qe[:-1]
        ar = qe[1:]
        a6 = 3.0 * (2.0 * a - (al + ar))
        return al, ar, a6

    dA = jnp.concatenate([z1, a[1:] - a[:-1]], axis=0)
    qe = _set_row(qe, 1, _mono_clamp(qe[1], a[0], a[1]))
    # interior edges e = 2..km-2 (edge-indexed arrays, len km+1)
    a_lo = jnp.concatenate([a[:1], a], axis=0)
    a_hi = jnp.concatenate([a, a[-1:]], axis=0)
    dA_em1 = jnp.concatenate([z1, dA], axis=0)
    dA_ep1 = jnp.concatenate([dA[1:], z1, z1], axis=0)
    both_pos = dA_em1 * dA_ep1 > 0.0
    clamped = _mono_clamp(qe, a_lo, a_hi)
    local_max = dA_em1 > 0.0
    qe_max = jnp.maximum(qe, jnp.minimum(a_lo, a_hi))
    qe_min = jnp.minimum(qe, jnp.maximum(a_lo, a_hi))
    if iv == 0:
        qe_min = jnp.maximum(qe_min, 0.0)
    qe_int = jnp.where(
        both_pos, clamped,
        jnp.where(local_max, qe_max, qe_min),
    )
    interior_e = _row_mask(km + 1, qe.shape, 2, km - 2)
    qe = jnp.where(interior_e, qe_int, qe)
    qe = _set_row(
        qe, km - 1, _mono_clamp(qe[km - 1], a[km - 2], a[km - 1])
    )

    al = qe[:-1]
    ar = qe[1:]

    dA_cp1 = jnp.concatenate([dA[1:], z1], axis=0)
    extm_int = dA * dA_cp1 < 0.0
    extm_bnd = (al - a) * (ar - a) > 0.0
    bnd_rows = _row_mask(km, shp, 0, 0) | _row_mask(
        km, shp, km - 1, km - 1
    )
    # logical composition, not where(): Mosaic cannot lower select_n
    # on i1 vectors (i8->i1 truncation unsupported)
    extm = (bnd_rows & extm_bnd) | (~bnd_rows & extm_int)

    x0 = 2.0 * a - (al + ar)
    x1 = jnp.abs(al - ar)
    a6 = 3.0 * x0
    ext5 = jnp.abs(x0) > x1
    ext6 = jnp.abs(a6) > x1

    # --- top boundary (rows 0, 1) -------------------------------------
    if iv == 0:
        al = _set_row(al, 0, jnp.maximum(al[0], 0.0))
    elif iv == -1:
        al = _set_row(
            al, 0, jnp.where(al[0] * a[0] <= 0.0, 0.0, al[0])
        )
    a6_0 = 3.0 * (2.0 * a[0] - (al[0] + ar[0]))
    l0 = _cs_limiters(a[0], al[0], ar[0], a6_0, extm[0], 1)
    al = _set_row(al, 0, l0[0])
    ar = _set_row(ar, 0, l0[1])
    a6 = _set_row(a6, 0, l0[2])
    a6_1 = 3.0 * (2.0 * a[1] - (al[1] + ar[1]))
    l1 = _cs_limiters(a[1], al[1], ar[1], a6_1, extm[1], 2)
    al = _set_row(al, 1, l1[0])
    ar = _set_row(ar, 1, l1[1])
    a6 = _set_row(a6, 1, l1[2])

    # --- interior rows 2..km-3: kord-variant constraint ---------------
    inter = _row_mask(km, shp, 2, km - 3)
    dA_m1 = jnp.concatenate([dA[-1:], dA[:-1]], axis=0)  # roll +1
    dA_p1 = jnp.concatenate([dA[1:], z1], axis=0)
    dA_p2 = jnp.concatenate([dA[2:], z1, z1], axis=0)
    extm_m1 = jnp.concatenate([extm[-1:], extm[:-1]], axis=0)
    extm_p1 = jnp.concatenate([extm[1:], extm[-1:]], axis=0)
    ext5_m1 = jnp.concatenate([ext5[-1:], ext5[:-1]], axis=0)
    ext5_p1 = jnp.concatenate([ext5[1:], ext5[-1:]], axis=0)
    ext6_m1 = jnp.concatenate([ext6[-1:], ext6[:-1]], axis=0)
    ext6_p1 = jnp.concatenate([ext6[1:], ext6[-1:]], axis=0)

    ak = abs(kord)
    hal, har = _huynh_edges(a, al, ar, dA, dA_p1, dA_p2, dA_m1)
    if ak == 9:
        wave = (extm & extm_m1) | (extm & extm_p1)
        a6_g = 6.0 * a - 3.0 * (al + ar)
        nonmono = jnp.abs(a6_g) > jnp.abs(al - ar)
        al_s = jnp.where(nonmono, hal, al)
        ar_s = jnp.where(nonmono, har, ar)
        a6_s = 6.0 * a - 3.0 * (al_s + ar_s)
        al_n = jnp.where(wave, a, al_s)
        ar_n = jnp.where(wave, a, ar_s)
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
    else:
        raise ValueError(f"kernel supports kord 9/10/|>16|, got {kord}")

    al = jnp.where(inter, al_n, al)
    ar = jnp.where(inter, ar_n, ar)
    a6 = jnp.where(inter, a6_n, a6)

    if iv == 0:
        lp = _cs_limiters(a, al, ar, a6, extm, 0)
        al = jnp.where(inter, lp[0], al)
        ar = jnp.where(inter, lp[1], ar)
        a6 = jnp.where(inter, lp[2], a6)

    # --- bottom boundary (rows km-2, km-1) ----------------------------
    if iv == 0:
        ar = _set_row(ar, km - 1, jnp.maximum(ar[km - 1], 0.0))
    elif iv == -1:
        ar = _set_row(
            ar, km - 1,
            jnp.where(ar[km - 1] * a[km - 1] <= 0.0, 0.0, ar[km - 1]),
        )
    for c, mode in ((km - 2, 2), (km - 1, 1)):
        a6_c = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        lc = _cs_limiters(a[c], al[c], ar[c], a6_c, extm[c], mode)
        al = _set_row(al, c, lc[0])
        ar = _set_row(ar, c, lc[1])
        a6 = _set_row(a6, c, lc[2])
    return al, ar, a6


def _remap_kernel(q_ref, pe1_ref, pe2_ref, q2_ref, qe_s, gam_s, m_s,
                  dp_s, *, iv: int, kord: int, km: int, kn: int):
    a = q_ref[0]
    pe1 = pe1_ref[0]
    pe2 = pe2_ref[0]
    dp1 = pe1[1:] - pe1[:-1]
    dp_s[:] = dp1  # ref copy: the spline loop indexes rows dynamically

    _edge_spline_kernel(q_ref, dp_s, km, qe_s, gam_s)
    al, ar, a6 = _cs_profile_block(a, dp1, qe_s[:], iv, kord)

    # cumulative clipped-parabola integration at every target edge
    # (exact_boundaries semantics, ops/remap.py:700-739)
    dp_safe = jnp.where(dp1 > 0, dp1, 1.0)
    dal = ar - al
    c_lin = al
    top = pe1[0]
    bot = pe1[km]
    q_top = a[0]
    q_bot = a[km - 1]

    def m_body(j, _):
        p = pe2_ref[0, j]  # ref read: j is a loop index
        pc = _clamp(p, top, bot)
        s = (pc[None] - pe1[:-1]) / dp_safe
        s = _clamp(s, 0.0, 1.0)
        s2 = s * s
        poly = (
            c_lin * s
            + 0.5 * dal * s2
            + a6 * (0.5 * s2 - s2 * s / 3.0)
        )
        m = jnp.sum(dp1 * poly, axis=0)
        m = m + q_top * jnp.minimum(p - top, 0.0)
        m = m + q_bot * jnp.maximum(p - bot, 0.0)
        m_s[j] = m
        return 0

    jax.lax.fori_loop(0, kn + 1, m_body, 0, unroll=False)
    M = m_s[:]
    q2_ref[0] = (M[1:] - M[:-1]) / (pe2[1:] - pe2[:-1])


@functools.partial(
    jax.jit, static_argnames=("iv", "kord", "interpret")
)
def ppm_remap_pallas(q1, pe1, pe2, iv: int = 1, kord: int = 9,
                     interpret: bool = False):
    """Fused remap on the dycore layout: q1 [F, km, Y, X],
    pe1 [F, km+1, Y, X], pe2 [F, kn+1, Y, X] -> q2 [F, kn, Y, X].

    Matches `ppm_remap(..., exact_boundaries=True)` applied per
    column (equivalence-gated in tests/test_pallas_kernels.py)."""
    F, km, Y, X = q1.shape
    kn = pe2.shape[1] - 1
    BY = 8
    pad = (-Y) % BY
    if pad:
        # edge-pad the row axis so BY divides it; padded columns carry
        # valid monotone pressures, results are cropped
        ep = lambda x: jnp.concatenate(  # noqa: E731
            [x] + [x[:, :, -1:]] * pad, axis=2
        )
        q1, pe1, pe2 = ep(q1), ep(pe1), ep(pe2)
        Yp = Y + pad
    else:
        Yp = Y
    grid = (F, Yp // BY)

    blk = lambda k: pl.BlockSpec(  # noqa: E731
        (1, k, BY, X), lambda f, y: (f, 0, y, 0),
        memory_space=pltpu.VMEM,
    )
    scr = lambda k: pltpu.VMEM((k, BY, X), q1.dtype)  # noqa: E731
    q2 = pl.pallas_call(
        functools.partial(
            _remap_kernel, iv=iv, kord=kord, km=km, kn=kn
        ),
        grid=grid,
        in_specs=[blk(km), blk(km + 1), blk(kn + 1)],
        out_specs=blk(kn),
        out_shape=jax.ShapeDtypeStruct((F, kn, Yp, X), q1.dtype),
        scratch_shapes=[scr(km + 1), scr(km), scr(kn + 1), scr(km)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                100 * 1024 * 1024 if X > 256 else 64 * 1024 * 1024
            )
        ),
    )(q1, pe1, pe2)
    return q2[:, :, :Y] if pad else q2
