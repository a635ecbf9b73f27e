"""Fused Pallas kernel for the del-4 conservative mass filter.

``dycore.sw.scalar_filter`` computes q - (c/8) L(L(q)) with L the
flux-form Laplacian G^T(W G) (see its docstring for the stability
role).  The jnp form pays, per application of L, one x-fill and one
y-fill halo exchange plus ~5 HBM-resident stencil fusions -- and it
runs four times per substep (delp, pt*dp, w*dp, delz), i.e. 16
exchanges + ~40 fusions per substep.

This kernel computes BOTH Laplacian applications in VMEM from one
pre-exchanged (x-fill, y-fill) pair: the halo band values of L(q) are
computed locally instead of re-exchanged, which is exact because every
input the band stencil touches is canonical halo data -- the same
values the neighbor's own interior computation uses -- and the
boundary-face weight doubling is a per-PHYSICAL-face convention, so
the band applies it at the same shared face (asserted against the jnp
operator in tests/test_pallas_kernels.py).

HBM traffic per field: 2 reads + 1 write (vs ~8 reads + ~6 writes for
the fusion chain).  Face-level only; the within-face tiled path keeps
the vjp-routed jnp form (cross-tile adjoints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tp import _roll


def _filter_kernel(qx_ref, qy_ref, wfx_ref, wfy_ref, ra_ref, out_ref,
                   *, c8: float):
    AX, AY = 3, 2
    qx = qx_ref[:]
    qy = qy_ref[:]
    wfx = wfx_ref[:][:, None]  # [1, 1, N, N] broadcast over z-block
    wfy = wfy_ref[:][:, None]
    ra = ra_ref[:][:, None]

    def lap(ax, ay):
        tx = wfx * (ax - _roll(ax, 1, AX))
        ty = wfy * (ay - _roll(ay, 1, AY))
        return ra * (
            (tx - _roll(tx, -1, AX)) + (ty - _roll(ty, -1, AY))
        )

    l1 = lap(qx, qy)
    l2 = lap(l1, l1)
    out_ref[:] = qx - c8 * l2


@functools.partial(
    jax.jit, static_argnames=("c", "halo", "interpret")
)
def del4_filter_pallas(qx, qy, area_px, area_py, c: float, halo: int,
                       interpret: bool = False):
    """q - (c/8) L(L(q)) on the padded lattice, cropped to interior.

    qx/qy: the field with x-fill / y-fill halo exchanges applied
    [F, nz, N, N]; area_px/area_py the matching padded cell areas
    [F, N, N].  Returns the filtered interior [F, nz, n, n].
    """
    F, nz, N, _ = qx.shape
    h = halo
    n = N - 2 * h
    # face weights: mean adjacent cell area, with the inter-face
    # boundary faces (computed once per adjacent face) carrying
    # doubled weight -- the exact sw.scalar_filter L_local operator
    idx = jnp.arange(N)
    dbl = jnp.where(
        jnp.logical_or(idx == h, idx == h + n), 2.0, 1.0
    )
    wfx = 0.5 * (area_px + jnp.roll(area_px, 1, axis=-1)) * dbl
    wfy = 0.5 * (
        area_py + jnp.roll(area_py, 1, axis=-2)
    ) * dbl[:, None]
    ra = 1.0 / area_px

    pad_slab = ((N + 7) // 8 * 8) * ((N + 127) // 128 * 128) * 4
    zb = int(min(nz, max(1, (24 * 1024 * 1024) // (12 * pad_slab))))
    grid = (F, pl.cdiv(nz, zb))
    field_spec = pl.BlockSpec(
        (1, zb, N, N), lambda f, z: (f, z, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    area_spec = pl.BlockSpec(
        (1, N, N), lambda f, z: (f, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_filter_kernel, c8=float(c) / 8.0),
        grid=grid,
        in_specs=[field_spec, field_spec] + [area_spec] * 3,
        out_specs=field_spec,
        out_shape=jax.ShapeDtypeStruct(qx.shape, qx.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(qx, qy, wfx, wfy, ra)
    return out[:, :, h : h + n, h : h + n]
