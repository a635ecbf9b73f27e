"""Within-face tiled dycore: equivalence and HLO gates.

The reference's scaling axis is 6*x*y MPI ranks
(runtime/segmented_run/run.py:34-35); this framework's equivalent is
the (face, y, x) device mesh of parallel/tiling.py +
make_tiled_spmd_dycore_stepper.  Gates (on the virtual 24-device CPU
mesh from conftest):

- one full nonhydrostatic dt on a 6x2x2 mesh (24 devices, 4 tiles per
  face) matches the single-device result to 1e-12
- same on a 2x2x2 mesh (8 devices, THREE faces per device) -- the
  multi-face-per-device packing
- the compiled HLO moves halos with collective-permute and contains no
  all-gather
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.parallel.tiling import TileLayout

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 24, reason="needs >= 24 virtual devices"
)

N, NZ = 12, 8


def _mesh(F, Y, X):
    devs = np.array(jax.devices()[: F * Y * X]).reshape(F, Y, X)
    return Mesh(devs, ("face", "y", "x"))


def _state_and_grid():
    from fv3net_tpu.constants import KAPPA, REFERENCE_SURFACE_PRESSURE
    from fv3net_tpu.dycore.hydro import (
        DycoreState,
        add_nonhydrostatic_fields,
        hybrid_coefficients,
    )

    g = CubedSphereGrid.make(N, halo=3)
    ak, bk = hybrid_coefficients(NZ, 300.0)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * 1e5
    delp = np.broadcast_to(pe[1:] - pe[:-1], (6, NZ, N, N)).copy()
    pik = (pe / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    pt = np.broadcast_to(
        285.0 / (0.5 * (pik[1:] + pik[:-1])), (6, NZ, N, N)
    ).copy()
    rng = np.random.RandomState(0)
    st = DycoreState(
        jnp.asarray(delp),
        jnp.asarray(pt + rng.standard_normal(pt.shape)),
        jnp.asarray(rng.standard_normal((6, NZ, N + 1, N))),
        jnp.asarray(rng.standard_normal((6, NZ, N, N + 1))),
        jnp.asarray(
            np.abs(rng.standard_normal((1, 6, NZ, N, N))) * 1e-3
        ),
    )
    return g, add_nonhydrostatic_fields(st, 300.0)


def _single_device_want(g, st, phis):
    from fv3net_tpu.dycore.hydro import make_dycore_stepper

    run1, _, _ = make_dycore_stepper(
        g, NZ, dt_atmos=900.0, k_split=1, n_split=2, dtype=jnp.float64
    )
    return run1(st, phis, 1)


def test_block_unblock_roundtrip():
    from fv3net_tpu.parallel.spmd_dycore import (
        block_winds,
        unblock_winds,
    )

    lay = TileLayout(N, 3, F=6, Y=2, X=2)
    rng = np.random.RandomState(5)
    u = jnp.asarray(rng.randn(6, NZ, N + 1, N))
    v = jnp.asarray(rng.randn(6, NZ, N, N + 1))
    ub, vb = block_winds(u, v, lay)
    assert ub.shape == (6, 2, 2, NZ, lay.nl + 1, lay.nl)
    u2, v2 = unblock_winds(ub, vb, lay)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))


@pytest.mark.slow
@pytest.mark.parametrize("F,Y,X", [(6, 2, 2), (2, 2, 2)])
def test_tiled_dycore_step_matches_single_device(F, Y, X):
    from fv3net_tpu.parallel.spmd_dycore import (
        make_tiled_spmd_dycore_stepper,
    )

    g, st = _state_and_grid()
    phis = jnp.zeros((6, N, N))
    want = _single_device_want(g, st, phis)

    lay = TileLayout(N, 3, F=F, Y=Y, X=X)
    mesh = _mesh(F, Y, X)
    run, shard, gather = make_tiled_spmd_dycore_stepper(
        g, NZ, mesh, lay, dt_atmos=900.0, k_split=1, n_split=2,
        dtype=jnp.float64,
    )
    st_s, phis_s = shard(st, phis)
    got = gather(run(st_s, phis_s, 1))
    for k in ("delp", "pt", "u", "v", "q", "w", "delz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, k)),
            np.asarray(getattr(want, k)),
            rtol=1e-12, atol=1e-12, err_msg=k,
        )


@pytest.mark.slow
def test_tiled_dycore_hlo_has_no_all_gather():
    from fv3net_tpu.parallel.spmd_dycore import (
        make_tiled_spmd_dycore_stepper,
    )

    g, st = _state_and_grid()
    phis = jnp.zeros((6, N, N))
    lay = TileLayout(N, 3, F=6, Y=2, X=2)
    mesh = _mesh(6, 2, 2)
    run, shard, _ = make_tiled_spmd_dycore_stepper(
        g, NZ, mesh, lay, dt_atmos=900.0, k_split=1, n_split=1,
        dtype=jnp.float64,
    )
    st_s, phis_s = shard(st, phis)
    hlo = (
        jax.jit(lambda s, p: run(s, p, 1))
        .lower(st_s, phis_s)
        .compile()
        .as_text()
    )
    assert "collective-permute" in hlo, "no ppermute in compiled HLO"
    assert "all-gather" not in hlo, "cube all-gather leaked into HLO"
