"""Fused Pallas TPU kernel for the semi-implicit vertical solver.

The jnp `dycore.riemann.sim1_solver` (FV3's SIM1_solver role,
`a_imp: 1.0` in the reference namelist,
workflows/prognostic_c48_run/tests/test_regression.py:133-200) runs
four `lax.scan`s over the 63 levels; under XLA each scan iteration is a
separate tiny [6, n, n] HBM round trip, so the solver is latency-bound
(~3-4 ms/call at C192 despite touching only ~0.6 ms of HBM traffic).

This kernel keeps whole (BY, n) column slabs in VMEM: the level-
parallel algebra (gas-law pressure, row coefficients, stiffnesses,
final thickness update) runs as full-block vector ops and only the
three true recurrences (the bidiagonal pp sweep, the Thomas forward/
backward sweeps and the ppe prefix sum) iterate over levels -- each
iteration a (BY, n) VPU op on VMEM-resident rows.

Semantics are identical to `sim1_solver` (equivalence-gated in
tests/test_pallas_kernels.py, interpret mode + the jnp oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    CP_AIR,
    CV_AIR,
    RDGAS,
    REFERENCE_SURFACE_PRESSURE as P00,
)

GAMMA = CP_AIR / CV_AIR


def _sim1_kernel(dm_ref, pt_ref, dz_ref, w_ref, pem_ref, pm_ref,
                 ws_ref, w2_ref, dz2_ref, ppe_ref,
                 pp_s, gr_s, bb_s, dd_s, up_s, dn_s, rhs_s, gam_s,
                 *, dt: float, nz: int, p_fac: float):
    t1g = 2.0 * GAMMA * dt * dt
    rdt = 1.0 / dt
    dm = dm_ref[0]
    pt = pt_ref[0]
    dz = dz_ref[0]
    w = w_ref[0]
    pem = pem_ref[0]
    pm = pm_ref[0]
    ws = ws_ref[0]

    # --- level-parallel precompute (full-slab vector ops) -------------
    pe = (
        P00 * (-dm * RDGAS * pt / (dz * P00)) ** GAMMA - pm
    )  # layer pressure perturbation from the gas law
    g_rat = dm[:-1] / dm[1:]
    gr_s[:-1] = g_rat
    gr_s[nz - 1] = jnp.zeros_like(dm[0])
    bb_s[:-1] = 2.0 * (1.0 + g_rat)
    bb_s[nz - 1] = jnp.full_like(dm[0], 2.0)
    dd_s[:-1] = 3.0 * (pe[:-1] + g_rat * pe[1:])
    dd_s[nz - 1] = 3.0 * pe[nz - 1]

    # --- bidiagonal forward sweep for pp (interface perturbation) -----
    zero = jnp.zeros_like(dm[0])
    pp_s[0] = zero
    bet0 = bb_s[0]
    pp1 = dd_s[0] / bet0
    pp_s[1] = pp1

    def pp_body(k, carry):
        bet, pp_prev = carry
        gam = gr_s[k - 1] / bet
        bet = bb_s[k] - gam
        pp_k1 = (dd_s[k] - pp_prev) / bet
        pp_s[k + 1] = pp_k1
        return (bet, pp_k1)

    jax.lax.fori_loop(1, nz, pp_body, (bet0, pp1), unroll=False)

    # --- Thomas solve for w -------------------------------------------
    pp = pp_s[:]
    aa = t1g / (dz[:-1] + dz[1:]) * (pem[1:nz] + pp[1:nz])
    p1 = t1g / dz[nz - 1] * (pem[nz] + pp[nz])
    up_s[0] = zero
    up_s[1:] = aa
    dn_s[:-1] = aa
    dn_s[nz - 1] = p1
    rhs = dm * w + dt * (pp[1:] - pp[:-1])
    rhs_s[:-1] = rhs[:-1]
    rhs_s[nz - 1] = rhs[nz - 1] - p1 * ws

    bet = dm[0] - dn_s[0]
    wp0 = rhs_s[0] / bet
    gam_s[0] = zero
    w2_ref[0, 0] = wp0

    def fwd_body(k, carry):
        bet_prev, wp_prev = carry
        a_up = up_s[k]
        gam = a_up / bet_prev
        bet = dm_ref[0, k] - (a_up + dn_s[k] + a_up * gam)
        wp = (rhs_s[k] - a_up * wp_prev) / bet
        gam_s[k] = gam
        w2_ref[0, k] = wp
        return (bet, wp)

    jax.lax.fori_loop(1, nz, fwd_body, (bet, wp0), unroll=False)

    def back_body(i, w_next):
        k = nz - 1 - i
        w_k = w2_ref[0, k] - gam_s[k + 1] * w_next
        w2_ref[0, k] = w_k
        return w_k

    jax.lax.fori_loop(1, nz, back_body, w2_ref[0, nz - 1],
                      unroll=False)

    # --- updated interface perturbation (prefix sum) -------------------
    ppe_ref[0, 0] = zero

    def ppe_body(k, acc):
        acc = acc + dm_ref[0, k] * (w2_ref[0, k] - w_ref[0, k]) * rdt
        ppe_ref[0, k + 1] = acc
        return acc

    jax.lax.fori_loop(0, nz, ppe_body, zero, unroll=False)

    # --- new layer thickness from the gas law (level-parallel) ---------
    ppe = ppe_ref[0]
    p_lay = pm + (ppe[:-1] + 2.0 * ppe[1:]) / 3.0
    p_lay = jnp.maximum(p_lay, p_fac * pm)
    dz2_ref[0] = -(dm * RDGAS * pt / P00) * (
        p_lay / P00
    ) ** (-CV_AIR / CP_AIR)


def _pick_by(n: int) -> int:
    return 8 if n % 8 == 0 else (4 if n % 4 == 0 else 1)


@functools.partial(
    jax.jit, static_argnames=("dt", "p_fac", "interpret")
)
def sim1_solver_pallas(dt, dm, pt, dz, w, pem, pm, ws,
                       p_fac: float = 0.05, interpret: bool = False):
    """Drop-in fused replacement for dycore.riemann.sim1_solver.

    Arrays [F, nz, n, n] (pem [F, nz+1, n, n], ws [F, n, n]), level
    axis 1.  Returns (w2, dz2, ppe).
    """
    F, nz, ny, nx = dm.shape
    BY = _pick_by(ny)
    grid = (F, ny // BY)

    lay = pl.BlockSpec(
        (1, nz, BY, nx), lambda f, y: (f, 0, y, 0),
        memory_space=pltpu.VMEM,
    )
    iface = pl.BlockSpec(
        (1, nz + 1, BY, nx), lambda f, y: (f, 0, y, 0),
        memory_space=pltpu.VMEM,
    )
    sfc = pl.BlockSpec(
        (1, BY, nx), lambda f, y: (f, y, 0),
        memory_space=pltpu.VMEM,
    )
    scr = lambda k: pltpu.VMEM((k, BY, nx), dm.dtype)  # noqa: E731
    # 10 io blocks (double-buffered) + 8 column scratch arrays exceed
    # the 16 MB default scoped-VMEM budget from N=192 up; v5e carries
    # 128 MB of VMEM per core, so raise the Mosaic cap for all widths
    # the kernel dispatches at (>=128 lanes)
    params = {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=(
                100 * 1024 * 1024 if nx > 256 else 48 * 1024 * 1024
            )
        )
    }
    w2, dz2, ppe = pl.pallas_call(
        functools.partial(
            _sim1_kernel, dt=float(dt), nz=nz, p_fac=p_fac
        ),
        grid=grid,
        in_specs=[lay, lay, lay, lay, iface, lay, sfc],
        out_specs=(lay, lay, iface),
        out_shape=(
            jax.ShapeDtypeStruct(dm.shape, dm.dtype),
            jax.ShapeDtypeStruct(dm.shape, dm.dtype),
            jax.ShapeDtypeStruct(pem.shape, dm.dtype),
        ),
        scratch_shapes=[
            scr(nz + 1), scr(nz), scr(nz), scr(nz), scr(nz),
            scr(nz), scr(nz), scr(nz),
        ],
        interpret=interpret,
        **params,
    )(dm, pt, dz, w, pem, pm, ws)
    return w2, dz2, ppe
