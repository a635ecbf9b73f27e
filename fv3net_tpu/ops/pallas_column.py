"""Fused Pallas kernel for the columnar pressure/Exner chain.

Each acoustic substep rebuilds, from the transported layer
thicknesses, the interface pressures (a cumulative sum over levels),
the interface Exner function ((pe/p00)^kappa -- a transcendental over
the full 3D field), the hydrostatically consistent layer-mean Exner
function, and the log-mean layer pressure dp/dlnp (FV3's pm2) for the
nonhydrostatic solver (dycore/hydro.py:364-372, riemann.py:167-169).
Under XLA the cumsum lowers to a log-depth reduce_window and each
piece is its own HBM-resident fusion (~25 ms/step at C192, profile
tools/PROFILE_C192_r5.md); this kernel computes the whole chain per
(face, y-stripe) block in VMEM: one read of dp, one write each of
(pe, pi_lay, pm).

Equivalence-gated against the jnp chain in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import KAPPA, REFERENCE_SURFACE_PRESSURE as P00


def _column_kernel(dp_ref, pe_ref, pi_ref, pm_ref, *, nz: int,
                   ptop: float):
    dp = dp_ref[0]

    # interface pressures: sequential prefix over levels in VMEM
    zero = jnp.zeros_like(dp[0])
    pe_ref[0, 0] = zero + ptop

    def body(k, acc):
        acc = acc + dp_ref[0, k]
        pe_ref[0, k + 1] = acc + ptop
        return acc

    jax.lax.fori_loop(0, nz, body, zero, unroll=False)

    pe = pe_ref[0]
    pik = (pe * (1.0 / P00)) ** KAPPA
    # layer-mean Exner: (pik+ pe+ - pik- pe-)/((1+kappa) dp)
    pi_ref[0] = (
        pik[1:] * pe[1:] - pik[:-1] * pe[:-1]
    ) / ((1.0 + KAPPA) * dp)
    # log-mean layer pressure dp/dlnp (riemann.layer_mean_pressure)
    pm_ref[0] = dp / (jnp.log(pe[1:]) - jnp.log(pe[:-1]))


@functools.partial(jax.jit, static_argnames=("ptop", "interpret"))
def column_pressures_pallas(dp, ptop: float, interpret: bool = False):
    """(pe, pi_lay, pm) from layer thicknesses dp [F, nz, Y, X].

    pe [F, nz+1, Y, X] interface pressures (pe[0] = ptop), pi_lay the
    hydrostatically consistent layer-mean Exner function, pm = dp/dlnp.
    """
    F, nz, Y, X = dp.shape
    BY = 8
    pad = (-Y) % BY
    if pad:
        # Mosaic requires the sublane block divisible by 8: edge-pad
        # the row axis (halo-padded fields are 2h+n rows) and crop
        dp = jnp.concatenate(
            [dp] + [dp[:, :, -1:]] * pad, axis=2
        )
        Yp = Y + pad
    else:
        Yp = Y
    grid = (F, Yp // BY)
    lay = pl.BlockSpec(
        (1, nz, BY, X), lambda f, y: (f, 0, y, 0),
        memory_space=pltpu.VMEM,
    )
    iface = pl.BlockSpec(
        (1, nz + 1, BY, X), lambda f, y: (f, 0, y, 0),
        memory_space=pltpu.VMEM,
    )
    pe, pi_lay, pm = pl.pallas_call(
        functools.partial(_column_kernel, nz=nz, ptop=float(ptop)),
        grid=grid,
        in_specs=[lay],
        out_specs=(iface, lay, lay),
        out_shape=(
            jax.ShapeDtypeStruct((F, nz + 1, Yp, X), dp.dtype),
            jax.ShapeDtypeStruct((F, nz, Yp, X), dp.dtype),
            jax.ShapeDtypeStruct((F, nz, Yp, X), dp.dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                100 * 1024 * 1024 if X > 256 else 48 * 1024 * 1024
            )
        ),
    )(dp)
    if pad:
        pe, pi_lay, pm = (
            pe[:, :, :Y], pi_lay[:, :, :Y], pm[:, :, :Y]
        )
    return pe, pi_lay, pm
