"""Benchmark: prints one JSON line with the headline metric.

Current flagship kernel: one full 3D cube transport step at C48 x 63
levels (halo exchange with corner fills + 2D Lin-Rood PPM fluxes +
conservative update, per level) in float32 on the available device.
Metric: cell-updates per second (gridpoints x levels / step time).
Will be replaced by the full dycore step as it lands.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fv3net_tpu.grid import CubedSphereGrid
    from fv3net_tpu.grid.halo import halo_exchange, halo_exchange_cgrid
    from fv3net_tpu.ops.advection import fv_tp_2d
    from fv3net_tpu.constants import RADIUS

    n, h, nz = 48, 3, 63
    dtype = jnp.float32
    g = CubedSphereGrid.make(n, halo=h)
    N = n + 2 * h

    # rigid-rotation winds (setup in numpy, f64 -> cast)
    axis = np.array([0.3, -0.5, 0.81])
    axis /= np.linalg.norm(axis)
    cor = g.corners_xyz

    def vel(p):
        return np.cross(np.broadcast_to(axis, p.shape), p)

    t_ye = cor[:, 1:, :, :] - cor[:, :-1, :, :]
    mid_x = cor[:, :-1, :, :] + cor[:, 1:, :, :]
    mid_x /= np.linalg.norm(mid_x, axis=-1, keepdims=True)
    n_x = np.cross(t_ye, mid_x)
    n_x /= np.linalg.norm(n_x, axis=-1, keepdims=True)
    u_x = np.sum(vel(mid_x[:, :, 1:-1, :]) * n_x[:, :, 1:-1, :], axis=-1)
    t_xe = cor[:, :, 1:, :] - cor[:, :, :-1, :]
    mid_y = cor[:, :, :-1, :] + cor[:, :, 1:, :]
    mid_y /= np.linalg.norm(mid_y, axis=-1, keepdims=True)
    n_y = np.cross(mid_y, t_xe)
    n_y /= np.linalg.norm(n_y, axis=-1, keepdims=True)
    u_y = np.sum(vel(mid_y[:, 1:-1, :, :]) * n_y[:, 1:-1, :, :], axis=-1)

    umax = max(np.nanmax(np.abs(u_x)), np.nanmax(np.abs(u_y))) * RADIUS
    wdt = 0.5 * np.nanmin(g.dxa[g.interior]) / umax
    crx_full = u_x * RADIUS * wdt / g.dxc[:, :, 1:-1]
    mfx_full = u_x * RADIUS * wdt * g.dy[:, :, 1:N]
    cry_full = u_y * RADIUS * wdt / g.dyc[:, 1:-1, :]
    mfy_full = u_y * RADIUS * wdt * g.dx[:, 1:N, :]

    def int_x(a):
        return a[:, h : h + n, h - 1 : h + n]

    def int_y(a):
        return a[:, h - 1 : h + n, h : h + n]

    def pad_pair(fx_int, fy_int):
        ux_p, _ = halo_exchange_cgrid(
            jnp.asarray(fx_int), jnp.asarray(fy_int), h, fill="x"
        )
        _, vy_p = halo_exchange_cgrid(
            jnp.asarray(fx_int), jnp.asarray(fy_int), h, fill="y"
        )
        return (
            jnp.asarray(np.asarray(ux_p)[:, :, :N], dtype),
            jnp.asarray(np.asarray(vy_p)[:, :N, :], dtype),
        )

    crx, cry = pad_pair(int_x(crx_full), int_y(cry_full))
    mfx, mfy = pad_pair(int_x(mfx_full), int_y(mfy_full))
    area_int = jnp.asarray(g.area[g.interior], dtype)
    area_px = halo_exchange(area_int, h, fill="x")
    area_py = halo_exchange(area_int, h, fill="y")
    # broadcast 2D coefficient fields over the level axis
    crx, cry, mfx, mfy = (a[:, None] for a in (crx, cry, mfx, mfy))
    area_int, area_px, area_py = (
        a[:, None] for a in (area_int, area_px, area_py)
    )

    def shx(a, k):
        return jnp.roll(a, -k, axis=-1)

    def shy(a, k):
        return jnp.roll(a, -k, axis=-2)

    ra_new = (area_px + (mfx - shx(mfx, 1)) + (mfy - shy(mfy, 1)))[
        ..., h : h + n, h : h + n
    ]

    import jax

    @jax.jit
    def step(q):
        qp_x = halo_exchange(q, h, fill="x")
        qp_y = halo_exchange(q, h, fill="y")
        fx, fy = fv_tp_2d(qp_x, qp_y, crx, cry, mfx, mfy, area_px, area_py,
                          8)
        div = (fx - shx(fx, 1)) + (fy - shy(fy, 1))
        return (q * area_int + div[..., h : h + n, h : h + n]) / ra_new

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(6, nz, n, n), dtype)
    q = step(q)  # compile + one step
    q.block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        q = step(q)
    q.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    cells = 6 * n * n * nz
    value = cells / dt
    print(
        json.dumps(
            {
                "metric": "transport_cell_updates_per_s",
                "value": value,
                "unit": "cell-updates/s",
                "vs_baseline": None,
                "detail": {
                    "config": f"C{n} nz={nz} f32 hord=8",
                    "step_ms": dt * 1e3,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
