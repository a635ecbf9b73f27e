"""Multi-chip (shard_map + ppermute) dycore: equivalence and HLO gates.

Runs on the virtual 8-device CPU mesh (conftest).  The SPMD path must
be numerically identical to the single-device gather path -- both are
generated from the same gather tables -- and its compiled HLO must
contain collective-permutes but NO all-gather of the cube (the failure
mode of running the gather path under the XLA SPMD partitioner, which
round 1 shipped).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.grid.halo import (
    average_dgrid_boundary,
    canonicalize_cgrid_boundary,
    halo_exchange,
    halo_exchange_cgrid,
    halo_exchange_dgrid,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 6, reason="needs >= 6 devices"
)


def _face_mesh():
    return Mesh(np.array(jax.devices()[:6]), ("face",))


def _shard_map(fn, mesh, n_in, n_out):
    from jax.sharding import PartitionSpec as P

    spec = P("face")
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(spec,) * n_in,
            out_specs=(spec,) * n_out if n_out > 1 else spec,
        )
    )


@pytest.mark.parametrize("fill", ["none", "x", "y"])
def test_scalar_exchange_matches(fill):
    from fv3net_tpu.parallel.halo_spmd import halo_exchange_local

    n, h = 12, 3
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(6, 4, n, n))
    mesh = _face_mesh()
    got = _shard_map(
        lambda x: halo_exchange_local(x, h, fill), mesh, 1, 1
    )(q)
    want = halo_exchange(q, h, fill=fill)
    if fill == "none":
        # corner slots are clipped placeholders in the gather path and
        # must not be consumed anyway; compare defined slots only
        from fv3net_tpu.grid import topology as topo

        _, _, _, mask = topo.halo_source_indices(n, h)
        g = np.asarray(got)
        w = np.asarray(want)
        sel = np.broadcast_to(~mask[:, None], g.shape)
        np.testing.assert_allclose(g[sel], w[sel])
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_dgrid_exchange_matches():
    from fv3net_tpu.parallel.halo_spmd import halo_exchange_dgrid_local

    n, h = 12, 3
    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.randn(6, n + 1, n))
    v = jnp.asarray(rng.randn(6, n, n + 1))
    mesh = _face_mesh()
    gu, gv = _shard_map(
        lambda a, b: halo_exchange_dgrid_local(a, b, h), mesh, 2, 2
    )(u, v)
    wu, wv = halo_exchange_dgrid(u, v, h)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv))


@pytest.mark.parametrize("fill", ["x", "y"])
def test_cgrid_exchange_matches(fill):
    from fv3net_tpu.parallel.halo_spmd import halo_exchange_cgrid_local

    n, h = 12, 3
    rng = np.random.RandomState(2)
    uc = jnp.asarray(rng.randn(6, n, n + 1))
    vc = jnp.asarray(rng.randn(6, n + 1, n))
    mesh = _face_mesh()
    gu, gv = _shard_map(
        lambda a, b: halo_exchange_cgrid_local(a, b, h, fill),
        mesh, 2, 2,
    )(uc, vc)
    wu, wv = halo_exchange_cgrid(uc, vc, h, fill=fill)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv))


def test_boundary_canonicalize_and_average_match():
    from fv3net_tpu.parallel.halo_spmd import (
        average_dgrid_boundary_local,
        canonicalize_cgrid_boundary_local,
    )

    n = 12
    rng = np.random.RandomState(3)
    uc = jnp.asarray(rng.randn(6, n, n + 1))
    vc = jnp.asarray(rng.randn(6, n + 1, n))
    mesh = _face_mesh()
    gu, gv = _shard_map(
        canonicalize_cgrid_boundary_local, mesh, 2, 2
    )(uc, vc)
    wu, wv = canonicalize_cgrid_boundary(uc, vc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv))

    u = jnp.asarray(rng.randn(6, n + 1, n))
    v = jnp.asarray(rng.randn(6, n, n + 1))
    gu, gv = _shard_map(
        average_dgrid_boundary_local, mesh, 2, 2
    )(u, v)
    wu, wv = average_dgrid_boundary(u, v)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv))


def _tiny_state(g, nz, dtype=jnp.float64):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_regression_trajectory import _initial_state

    return _initial_state(g)


@pytest.mark.slow
def test_spmd_dycore_step_matches_single_device():
    """One full nonhydrostatic dt on the face mesh == the single-device
    result (same gather tables, same arithmetic)."""
    from fv3net_tpu.dycore.hydro import make_dycore_stepper
    from fv3net_tpu.parallel.spmd_dycore import make_spmd_dycore_stepper

    n, nz = 12, 8
    g = CubedSphereGrid.make(n, halo=3)
    from fv3net_tpu.dycore.hydro import (
        DycoreState,
        add_nonhydrostatic_fields,
        hybrid_coefficients,
    )
    from fv3net_tpu.constants import KAPPA, REFERENCE_SURFACE_PRESSURE

    ak, bk = hybrid_coefficients(nz, 300.0)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * 1e5
    delp = np.broadcast_to(pe[1:] - pe[:-1], (6, nz, n, n)).copy()
    pik = (pe / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    pt = np.broadcast_to(
        285.0 / (0.5 * (pik[1:] + pik[:-1])), (6, nz, n, n)
    ).copy()
    rng = np.random.RandomState(0)
    st = DycoreState(
        jnp.asarray(delp),
        jnp.asarray(pt + rng.standard_normal(pt.shape)),
        jnp.asarray(rng.standard_normal((6, nz, n + 1, n))),
        jnp.asarray(rng.standard_normal((6, nz, n, n + 1))),
        jnp.asarray(np.abs(rng.standard_normal((1, 6, nz, n, n))) * 1e-3),
    )
    st = add_nonhydrostatic_fields(st, 300.0)
    phis = jnp.zeros((6, n, n))

    run1, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=900.0, k_split=1, n_split=2, dtype=jnp.float64
    )
    want = run1(st, phis, 1)

    mesh = _face_mesh()
    run6, shard, _ = make_spmd_dycore_stepper(
        g, nz, mesh, dt_atmos=900.0, k_split=1, n_split=2,
        dtype=jnp.float64,
    )
    st_s, phis_s = shard(st, phis)
    got = run6(st_s, phis_s, 1)
    for k in ("delp", "pt", "u", "v", "q", "w", "delz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, k)), np.asarray(getattr(want, k)),
            rtol=1e-12, atol=1e-12, err_msg=k,
        )


@pytest.mark.slow
def test_spmd_dycore_hlo_has_no_all_gather():
    """The compiled multi-chip step must move halos with
    collective-permute, never by all-gathering the cube."""
    from fv3net_tpu.parallel.spmd_dycore import make_spmd_dycore_stepper
    from fv3net_tpu.dycore.hydro import (
        DycoreState,
        add_nonhydrostatic_fields,
        hybrid_coefficients,
    )
    from functools import partial
    from jax.sharding import PartitionSpec as P

    n, nz = 12, 8
    g = CubedSphereGrid.make(n, halo=3)
    ak, bk = hybrid_coefficients(nz, 300.0)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * 1e5
    delp = np.broadcast_to(pe[1:] - pe[:-1], (6, nz, n, n)).copy()
    st = DycoreState(
        jnp.asarray(delp),
        jnp.full((6, nz, n, n), 285.0),
        jnp.zeros((6, nz, n + 1, n)),
        jnp.zeros((6, nz, n, n + 1)),
        jnp.zeros((1, 6, nz, n, n)),
    )
    st = add_nonhydrostatic_fields(st, 300.0)
    phis = jnp.zeros((6, n, n))
    mesh = _face_mesh()
    run6, shard, _ = make_spmd_dycore_stepper(
        g, nz, mesh, dt_atmos=900.0, k_split=1, n_split=1,
        dtype=jnp.float64,
    )
    st_s, phis_s = shard(st, phis)
    # lower the same jitted computation run() uses
    import fv3net_tpu.parallel.spmd_dycore as sd

    traced = jax.jit(
        lambda s, p: run6(s, p, 1)
    ).lower(st_s, phis_s).compile()
    hlo = traced.as_text()
    assert "collective-permute" in hlo, "no ppermute in compiled HLO"
    assert "all-gather" not in hlo, "cube all-gather leaked into HLO"
