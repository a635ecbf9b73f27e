"""The ppermute halo exchange must be bit-identical to the gather-based
single-device exchange (same topology tables, different transport) --
validated on the virtual 8-device CPU mesh (SURVEY 2.3: DummyComm-style
multi-rank testing without a cluster)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fv3net_tpu.grid.halo import halo_exchange
from fv3net_tpu.parallel.halo_spmd import halo_exchange_spmd

N, NZ, H = 12, 3, 3


@pytest.fixture(scope="module")
def face_mesh():
    devices = jax.devices()
    if len(devices) < 6:
        pytest.skip("needs >= 6 devices (virtual CPU mesh)")
    return Mesh(np.array(devices[:6]), ("face",))


def _field(seed=0, with_z=True):
    rng = np.random.RandomState(seed)
    shape = (6, NZ, N, N) if with_z else (6, N, N)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("fill", ["none", "x", "y"])
def test_spmd_matches_gather_exchange(face_mesh, fill):
    f = _field()
    sharded = jax.device_put(
        jnp.asarray(f),
        NamedSharding(face_mesh, P("face", None, None, None)),
    )
    out = halo_exchange_spmd(sharded, H, face_mesh, fill=fill)
    ref = halo_exchange(jnp.asarray(f), H, fill=fill)
    if fill == "none":
        # corner slots are clipped placeholders in the gather version;
        # compare only cells defined by the scalar exchange
        from fv3net_tpu.grid.topology import halo_source_indices

        _, _, _, corner = halo_source_indices(N, H)
        mask = ~corner[:, None]
        np.testing.assert_array_equal(
            np.asarray(out) * mask, np.asarray(ref) * mask
        )
    else:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spmd_under_jit(face_mesh):
    f = _field(1)
    sharded = jax.device_put(
        jnp.asarray(f),
        NamedSharding(face_mesh, P("face", None, None, None)),
    )
    fn = jax.jit(
        lambda x: halo_exchange_spmd(x, H, face_mesh, fill="x")
    )
    out = fn(sharded)
    ref = halo_exchange(jnp.asarray(f), H, fill="x")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_spmd_2d_field(face_mesh):
    f = _field(2, with_z=False)
    sharded = jax.device_put(
        jnp.asarray(f),
        NamedSharding(face_mesh, P("face", None, None)),
    )
    out = halo_exchange_spmd(sharded, H, face_mesh, fill="y")
    ref = halo_exchange(jnp.asarray(f), H, fill="y")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_smooth_field_continuity(face_mesh):
    """A function of position must be continuous across every face
    contact after the exchange (the /verify skill's acid test)."""
    from fv3net_tpu.grid import CubedSphereGrid

    g = CubedSphereGrid.make(N, halo=H)
    c = g.centers_xyz[:, H : H + N, H : H + N]
    f = jnp.asarray(
        (c[..., 0] * c[..., 1] + c[..., 2]).astype(np.float32)
    )
    sharded = jax.device_put(
        f, NamedSharding(face_mesh, P("face", None, None))
    )
    out = np.asarray(halo_exchange_spmd(sharded, H, face_mesh))
    cp = g.centers_xyz
    expected = (cp[..., 0] * cp[..., 1] + cp[..., 2]).astype(np.float32)
    from fv3net_tpu.grid.topology import halo_source_indices

    _, _, _, corner = halo_source_indices(N, H)
    sel = ~corner
    np.testing.assert_allclose(
        out[sel], expected[sel], rtol=0, atol=1e-6
    )
