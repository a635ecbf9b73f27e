"""Fused Pallas TPU kernel for the 2D Lin-Rood transport (fv_tp_2d).

The jnp form of ``ops.advection.fv_tp_2d`` materializes ~15 shifted
full-field intermediates in HBM; measured at C192 x 63 it runs at
~85 GB/s effective (14 ms/call) while a plain elementwise stream runs
at ~600 GB/s on the same chip — the cost is the materialization, not
the flops.  This kernel computes the whole operator (PPM edge
reconstruction + limiters + upwind face averages + the inner
transverse half-update + outer fluxes) in VMEM per (face, z-block)
slab: HBM traffic is exactly one read of the 6 inputs + one write of
the 2 outputs.

Semantics are identical to fv_tp_2d (same roll-based stencils, cropped
garbage near array ends); the equivalence is asserted per-hord against
the jnp implementation in tests/test_pallas_kernels.py (interpret mode
on CPU) and by the TPU parity check in tools/ (real chip).

Reference role: FV3's fv_tp_2d/xppm/yppm (tp_core.F90, submodule not
in tree; see ops/advection.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, k: int, axis: int):
    """jnp.roll semantics (any-sign k) via pltpu.roll."""
    if k == 0:
        return x
    size = x.shape[axis]
    return pltpu.roll(x, k % size, axis)


def _ppm_edges(q, axis: int, hord: int):
    """Vectorized PPM edge values/curvature; mirror of
    ops.advection._ppm_edges with in-VMEM rolls."""

    def sh(k):
        return _roll(q, -k, axis)

    qm2, qm1, q0, qp1 = sh(-2), sh(-1), q, sh(1)
    if hord == 1:
        return q0, q0, jnp.zeros_like(q0)

    al = (7.0 / 12.0) * (qm1 + q0) - (1.0 / 12.0) * (qm2 + qp1)
    ar = _roll(al, -1, axis)  # al of cell i+1 = right edge of cell i

    if hord == 5:
        a6 = 3.0 * (2.0 * q0 - (al + ar))
        return al, ar, a6

    df2 = 0.25 * (qp1 - qm1)
    dm = jnp.sign(df2) * jnp.minimum(
        jnp.abs(2.0 * df2),
        jnp.minimum(
            jnp.abs(jnp.maximum(jnp.maximum(qm1, q0), qp1) - q0),
            jnp.abs(q0 - jnp.minimum(jnp.minimum(qm1, q0), qp1)),
        ),
    )

    if hord == 8:
        bl = -jnp.sign(dm) * jnp.minimum(
            jnp.abs(2.0 * dm), jnp.abs(al - q0)
        )
        br = jnp.sign(dm) * jnp.minimum(
            jnp.abs(2.0 * dm), jnp.abs(ar - q0)
        )
        al8 = q0 + bl
        ar8 = q0 + br
        a6 = 3.0 * (2.0 * q0 - (al8 + ar8))
        return al8, ar8, a6

    if hord == 6:
        lo = jnp.minimum(jnp.minimum(qm1, q0), qp1)
        hi = jnp.maximum(jnp.maximum(qm1, q0), qp1)
        al6 = jnp.clip(al, lo, hi)
        ar6 = jnp.clip(ar, lo, hi)
        a6 = 3.0 * (2.0 * q0 - (al6 + ar6))
        return al6, ar6, a6

    raise ValueError(f"unsupported hord {hord}")


def _ppm_flux(q, cr, axis: int, hord: int):
    """Mirror of ops.advection.ppm_flux with in-VMEM rolls."""
    al, ar, a6 = _ppm_edges(q, axis, hord)
    c = cr
    arm = _roll(ar, 1, axis)
    alm = _roll(al, 1, axis)
    a6m = _roll(a6, 1, axis)
    qup = arm - 0.5 * c * (
        (arm - alm) - a6m * (1.0 - (2.0 / 3.0) * c)
    )
    b = -c
    qdn = al + 0.5 * b * ((ar - al) + a6 * (1.0 - (2.0 / 3.0) * b))
    return jnp.where(c > 0.0, qup, qdn)


def _tp2d_kernel(qx_ref, qy_ref, crx_ref, cry_ref, xfx_ref, yfx_ref,
                 apx_ref, apy_ref, fx_ref, fy_ref, *, hord: int,
                 area_is_3d: bool):
    AX, AY = 3, 2  # lane (x) / sublane (y) axes of the [1,zb,N,N] block
    qx = qx_ref[:]
    qy = qy_ref[:]
    crx = crx_ref[:]
    cry = cry_ref[:]
    xfx = xfx_ref[:]
    yfx = yfx_ref[:]
    if area_is_3d:
        apx = apx_ref[:][:, None]  # [1,1,N,N] broadcast over z-block
        apy = apy_ref[:][:, None]
    else:  # mass-weighted transports pass area*delp, [1,zb,N,N]
        apx = apx_ref[:]
        apy = apy_ref[:]

    fy2 = _ppm_flux(qy, cry, AY, hord) * yfx
    ra_y = apy + (yfx - _roll(yfx, -1, AY))
    q_y = 0.5 * (qy + (qy * apy + (fy2 - _roll(fy2, -1, AY))) / ra_y)

    fx2 = _ppm_flux(qx, crx, AX, hord) * xfx
    ra_x = apx + (xfx - _roll(xfx, -1, AX))
    q_x = 0.5 * (qx + (qx * apx + (fx2 - _roll(fx2, -1, AX))) / ra_x)

    fx_ref[:] = _ppm_flux(q_y, crx, AX, hord) * xfx
    fy_ref[:] = _ppm_flux(q_x, cry, AY, hord) * yfx


def _pick_zb(nz: int, n_lane: int, dtype_bytes: int = 4) -> int:
    """z-block size fitting the 16 MB scoped-VMEM limit.

    Mosaic pads each [N, N] slab to (8, 128) tiles and double-buffers
    the 10 io blocks for the grid pipeline; with ~8 live temporaries
    the budget is ~28 slab-sets.
    """
    pad_slab = (
        ((n_lane + 7) // 8 * 8)
        * ((n_lane + 127) // 128 * 128)
        * dtype_bytes
    )
    budget = 12 * 1024 * 1024
    zb = max(1, budget // (28 * pad_slab))
    return int(min(nz, zb))


def _tp2d_multi_kernel(
    dpx_ref, dpy_ref, ptx_ref, pty_ref, wx_ref, wy_ref, dzx_ref,
    dzy_ref, ox_ref, oy_ref, crx_ref, cry_ref, xfx_ref, yfx_ref,
    sfx_ref, sfy_ref, apx_ref, apy_ref,
    fxd_ref, fyd_ref, fxt_ref, fyt_ref, fxw_ref, fyw_ref, fxz_ref,
    fyz_ref, fxo_ref, fyo_ref, *, hord: int,
):
    """All five substep transports of one z-block in VMEM.

    The five fv_tp_2d calls of the D stage (delp, pt, w, delz with the
    accumulated-mass or area fluxes, and absolute vorticity with the
    displacement fluxes) share the Courant numbers and flux widths;
    run separately each re-reads them from HBM and the mass-weighted
    ones additionally materialize area*delp and re-read the delp
    fluxes.  Here the delp fluxes feed the pt/w transports directly in
    VMEM and the shared operands are read once.  (Stacking the fields
    along a z-like axis at the XLA level instead was measured SLOWER
    -- stencil fusions break across the stacked axis, r3 and r5 -- the
    win requires the fusion to happen inside one kernel.)
    """
    AX, AY = 3, 2
    crx = crx_ref[:]
    cry = cry_ref[:]
    xfx = xfx_ref[:]
    yfx = yfx_ref[:]
    apx = apx_ref[:][:, None]
    apy = apy_ref[:][:, None]

    def tp(qx, qy, mfx, mfy, ax, ay):
        fy2 = _ppm_flux(qy, cry, AY, hord) * mfy
        ra_y = ay + (mfy - _roll(mfy, -1, AY))
        q_y = 0.5 * (qy + (qy * ay + (fy2 - _roll(fy2, -1, AY))) / ra_y)
        fx2 = _ppm_flux(qx, crx, AX, hord) * mfx
        ra_x = ax + (mfx - _roll(mfx, -1, AX))
        q_x = 0.5 * (qx + (qx * ax + (fx2 - _roll(fx2, -1, AX))) / ra_x)
        return (
            _ppm_flux(q_y, crx, AX, hord) * mfx,
            _ppm_flux(q_x, cry, AY, hord) * mfy,
        )

    dpx = dpx_ref[:]
    dpy = dpy_ref[:]
    fxd, fyd = tp(dpx, dpy, xfx, yfx, apx, apy)
    fxd_ref[:] = fxd
    fyd_ref[:] = fyd
    adx = apx * dpx
    ady = apy * dpy
    fxt_ref[:], fyt_ref[:] = tp(
        ptx_ref[:], pty_ref[:], fxd, fyd, adx, ady
    )
    fxw_ref[:], fyw_ref[:] = tp(
        wx_ref[:], wy_ref[:], fxd, fyd, adx, ady
    )
    fxz_ref[:], fyz_ref[:] = tp(
        dzx_ref[:], dzy_ref[:], xfx, yfx, apx, apy
    )
    fxo_ref[:], fyo_ref[:] = tp(
        ox_ref[:], oy_ref[:], sfx_ref[:], sfy_ref[:], apx, apy
    )


@functools.partial(jax.jit, static_argnames=("hord", "interpret"))
def fv_tp_2d_multi5(
    dpx, dpy, ptx, pty, wx, wy, dzx, dzy, ox, oy,
    crx, cry, xfx, yfx, sfx, sfy, area_px, area_py,
    hord: int, interpret: bool = False,
):
    """Fused replacement for the D stage's five fv_tp_2d calls.

    Returns (fxd, fyd, fxt, fyt, fxw, fyw, fxz, fyz, fxo, fyo) --
    bit-equivalent to calling ops.advection.fv_tp_2d per field with
    (xfx, yfx, area) for delp/delz, (fxd, fyd, area*delp) for pt/w,
    and (sfx, sfy, area) for the vorticity.  Areas are [F, N, N] or
    [F, 1, N, N].
    """
    F, nz, N, _ = dpx.shape
    apx = area_px.reshape(F, N, N)
    apy = area_py.reshape(F, N, N)
    # 16 io slabs + ~10 live temporaries per z-block: size the block
    # against a raised VMEM budget (v5e has 128 MB per core)
    pad_slab = (
        ((N + 7) // 8 * 8) * ((N + 127) // 128 * 128) * 4
    )
    zb = int(min(nz, max(1, (40 * 1024 * 1024) // (60 * pad_slab))))
    grid = (F, pl.cdiv(nz, zb))
    field_spec = pl.BlockSpec(
        (1, zb, N, N), lambda f, z: (f, z, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    area_spec = pl.BlockSpec(
        (1, N, N), lambda f, z: (f, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(dpx.shape, dpx.dtype) for _ in range(10)
    )
    return pl.pallas_call(
        functools.partial(_tp2d_multi_kernel, hord=hord),
        grid=grid,
        in_specs=[field_spec] * 16 + [area_spec] * 2,
        out_specs=(field_spec,) * 10,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(dpx, dpy, ptx, pty, wx, wy, dzx, dzy, ox, oy,
      crx, cry, xfx, yfx, sfx, sfy, apx, apy)


@functools.partial(jax.jit, static_argnames=("hord", "interpret"))
def fv_tp_2d_pallas(qp_x, qp_y, crx, cry, xfx, yfx, area_px, area_py,
                    hord: int, interpret: bool = False):
    """Drop-in fused replacement for ops.advection.fv_tp_2d.

    Args match fv_tp_2d: padded [F, nz, N, N] fields (q with x/y corner
    fills, Courant numbers, mass fluxes) and [F, N, N] padded areas
    (accepts [F, 1, N, N] too).  Returns (fx, fy).
    """
    if qp_x.ndim == 3:  # single-layer (shallow-water) form
        fx, fy = fv_tp_2d_pallas(
            qp_x[:, None], qp_y[:, None], crx[:, None], cry[:, None],
            xfx[:, None], yfx[:, None], area_px, area_py, hord,
            interpret=interpret,
        )
        return fx[:, 0], fy[:, 0]
    F, nz, N, _ = qp_x.shape
    # mass-weighted transports pass area*delp with a full z extent;
    # pure-area calls pass [F, N, N] or [F, 1, N, N]
    area_is_3d = area_px.ndim == 3 or area_px.shape[1] == 1
    if area_is_3d:
        apx = area_px.reshape(F, N, N)
        apy = area_py.reshape(F, N, N)
    else:
        apx, apy = area_px, area_py
    zb = _pick_zb(nz, N)
    grid = (F, pl.cdiv(nz, zb))

    field_spec = pl.BlockSpec(
        (1, zb, N, N), lambda f, z: (f, z, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    area_spec = (
        pl.BlockSpec(
            (1, N, N), lambda f, z: (f, 0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        )
        if area_is_3d
        else field_spec
    )
    out_shape = jax.ShapeDtypeStruct(qp_x.shape, qp_x.dtype)
    # At C384 (N=390 -> 512-lane tiles, ~800 KB per slab) even zb=1
    # exceeds the default 16 MB scoped-VMEM budget; raise the Mosaic
    # limit for wide grids (v5e carries 128 MB of VMEM per core).
    params = None
    if N > 256:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    fx, fy = pl.pallas_call(
        functools.partial(
            _tp2d_kernel, hord=hord, area_is_3d=area_is_3d
        ),
        grid=grid,
        in_specs=[field_spec] * 6 + [area_spec] * 2,
        out_specs=(field_spec, field_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )(qp_x, qp_y, crx, cry, xfx, yfx, apx, apy)
    return fx, fy
