"""Weak-scaling measurement of the tiled SPMD dycore on a virtual mesh.

SURVEY 6's north star includes >=90% weak-scaling 1 -> N hosts.  Real
multi-chip hardware is not reachable from this environment (one
tunneled v5e chip), so this tool produces the obtainable evidence: the
within-face tiled SPMD path (parallel/tiling.py, compressed ppermute
halo plans) run on a virtual CPU device mesh at 6 -> 24 -> 54 devices
with a CONSTANT per-device tile (weak scaling: the global cube grows
with the tile grid), reporting per-device throughput and relative
efficiency.

Honest caveat, printed with the table: virtual CPU devices share one
host's cores, so absolute per-device throughput DEGRADES with device
count by core oversubscription; what the virtual mesh legitimately
measures is that (a) the sharded program compiles and runs at every
layout, (b) the collective/halo overhead per step stays bounded as the
layout grows, and (c) the TOTAL throughput rises with devices even
when oversubscribed.  The per-chip ICI numbers require real hardware.

    XLA_FLAGS=--xla_force_host_platform_device_count=54 \
        JAX_PLATFORMS=cpu python tools/weak_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOCAL_TILE = 8  # cells per device edge (constant under weak scaling)
NZ = 6
N_SPLIT = 2


def measure(layout, jax, jnp):
    import numpy as np
    from jax.sharding import Mesh

    from fv3net_tpu.dycore.hydro import add_nonhydrostatic_fields
    from fv3net_tpu.grid import CubedSphereGrid
    from fv3net_tpu.parallel.spmd_dycore import (
        make_tiled_spmd_dycore_stepper,
    )
    from fv3net_tpu.parallel.tiling import TileLayout
    from __graft_entry__ import _rest_state

    F, Y, X = layout
    ndev = F * Y * X
    n = LOCAL_TILE * X
    g = CubedSphereGrid.make(n, halo=3)
    lay = TileLayout(n, 3, F=F, Y=Y, X=X)
    mesh = Mesh(
        np.array(jax.devices()[:ndev]).reshape(F, Y, X),
        ("face", "y", "x"),
    )
    t0 = time.perf_counter()
    run, shard, gather = make_tiled_spmd_dycore_stepper(
        g, NZ, mesh, lay, dt_atmos=900.0, k_split=1,
        n_split=N_SPLIT, dtype=jnp.float32,
    )
    state = add_nonhydrostatic_fields(
        jax.tree_util.tree_map(
            jnp.asarray, _rest_state(g, NZ, 300.0, jnp.float32)
        ),
        300.0,
    )
    phis = jnp.zeros((6, n, n), jnp.float32)
    st, ph = shard(state, phis)
    st1 = run(st, ph, 1)
    jax.block_until_ready(st1)
    compile_s = time.perf_counter() - t0
    # steady state over a few steps
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        st1 = run(st1, ph, 1)
    jax.block_until_ready(st1)
    step_s = (time.perf_counter() - t0) / iters
    out = gather(st1)
    assert bool(jnp.isfinite(out.delp).all()), "state blew up"
    updates = 6 * n * n * NZ * N_SPLIT
    return {
        "layout": f"{F}x{Y}x{X}",
        "devices": ndev,
        "global_c": n,
        "local_tile": LOCAL_TILE,
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_s * 1e3, 1),
        "updates_per_s_total": round(updates / step_s),
        "updates_per_s_per_device": round(updates / step_s / ndev),
    }


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    ndev = len(jax.devices())
    import jax.numpy as jnp

    rows = []
    for layout in ((6, 1, 1), (6, 2, 2), (6, 3, 3)):
        if layout[0] * layout[1] * layout[2] > ndev:
            print(f"skip {layout}: only {ndev} devices")
            continue
        r = measure(layout, jax, jnp)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if rows:
        base = rows[0]["updates_per_s_per_device"]
        for r in rows:
            r["efficiency_vs_6dev"] = round(
                r["updates_per_s_per_device"] / base, 3
            )
        print(json.dumps({"table": rows}, indent=1))


if __name__ == "__main__":
    main()
