"""GFDL-style 6-category microphysics: conservation contracts and the
scheme-switch behavior check (VERDICT r3 item 7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fv3net_tpu.constants import (
    CP_AIR,
    GRAV,
    LATENT_HEAT_FUSION as LF,
    LATENT_HEAT_VAPORIZATION as LV,
)
from fv3net_tpu.physics.gfdl_mp import (
    GFDLMPConfig,
    gfdl_cloud_microphysics,
    liquid_fraction,
    saturation_adjustment,
    _sediment,
)

LS = LV + LF


def _column_state(seed=0, nz=20, n=3, moist=True):
    rng = np.random.RandomState(seed)
    shape = (6, nz, n, n)
    # pressure profile 50 -> 1000 hPa top to bottom
    p1d = np.linspace(5e3, 1.0e5, nz)
    p = np.broadcast_to(p1d[None, :, None, None], shape).copy()
    delp = np.gradient(p1d)[None, :, None, None]
    delp = np.broadcast_to(delp, shape).copy()
    t = 300.0 - 60.0 * (1.0 - p / 1.0e5) + rng.randn(*shape)
    qsat_scale = 0.02 * (p / 1.0e5) ** 2
    qv = (0.9 if moist else 0.3) * qsat_scale * (
        1.0 + 0.3 * rng.rand(*shape)
    )
    ql = 2e-3 * rng.rand(*shape) * (p > 4e4)
    qi = 5e-4 * rng.rand(*shape) * (t < 260.0)
    dz = 287.0 * t / GRAV * delp / p
    f32 = np.float32
    return tuple(
        jnp.asarray(a, f32)
        for a in (t, qv, ql, qi, np.zeros(shape), np.zeros(shape),
                  np.zeros(shape), p, delp, dz)
    )


def _water_path(qs, delp):
    return sum((np.asarray(q) * np.asarray(delp)).sum(1) for q in qs) / GRAV


def test_water_conservation():
    t, qv, ql, qi, qr, qs, qg, p, delp, dz = _column_state()
    st, dg = jax.jit(
        lambda *a: gfdl_cloud_microphysics(*a, 900.0)
    )(t, qv, ql, qi, qr, qs, qg, p, delp, dz)
    before = _water_path((qv, ql, qi, qr, qs, qg), delp)
    after = _water_path(
        (
            st["specific_humidity"],
            st["cloud_water_mixing_ratio"],
            st["cloud_ice_mixing_ratio"],
            st["rain_mixing_ratio"],
            st["snow_mixing_ratio"],
            st["graupel_mixing_ratio"],
        ),
        delp,
    )
    precip = np.asarray(dg["total_precipitation_mp"])
    np.testing.assert_allclose(
        after + precip, before, rtol=2e-5,
        err_msg="column water + surface precip must be conserved",
    )
    assert precip.min() >= 0.0


def test_energy_conservation():
    """cp*T + Lv*qv - Lf*(ice phases) column-integrated, accounting
    for the latent heat of frozen precipitation leaving the column."""
    t, qv, ql, qi, qr, qs, qg, p, delp, dz = _column_state(seed=1)
    st, dg = gfdl_cloud_microphysics(
        t, qv, ql, qi, qr, qs, qg, p, delp, dz, 900.0
    )

    def energy(tt, vv, ice_q):
        col = (
            (CP_AIR * np.asarray(tt) + LV * np.asarray(vv))
            * np.asarray(delp)
        ).sum(1) / GRAV
        ice = sum(
            (np.asarray(q) * np.asarray(delp)).sum(1) for q in ice_q
        ) / GRAV
        return col - LF * ice

    e0 = energy(t, qv, (qi, qs, qg))
    e1 = energy(
        st["air_temperature"], st["specific_humidity"],
        (
            st["cloud_ice_mixing_ratio"],
            st["snow_mixing_ratio"],
            st["graupel_mixing_ratio"],
        ),
    )
    frozen_out = np.asarray(
        dg["snow_precipitation"] + dg["graupel_precipitation"]
    )
    np.testing.assert_allclose(
        e1 - LF * frozen_out, e0, rtol=2e-6,
        err_msg="column moist energy must close against frozen precip",
    )


def test_saturation_adjustment_removes_supersaturation():
    t, qv, ql, qi, qr, qs, qg, p, delp, dz = _column_state(seed=2)
    qv2 = qv * 3.0  # strongly supersaturated
    t2, qv3, ql2, qi2 = saturation_adjustment(t, qv2, ql, qi, p, 4)
    from fv3net_tpu.physics.gfdl_mp import _qsat, esat_liquid

    qs_l = _qsat(esat_liquid(t2), p)
    # near-saturated or subsaturated everywhere after adjustment
    assert float((np.asarray(qv3) / np.asarray(qs_l)).max()) < 1.25
    # condensation heated the air
    assert float(np.asarray(t2 - t).mean()) > 0.0


def test_sedimentation_moves_mass_down_and_out():
    t, qv, ql, qi, qr, qs, qg, p, delp, dz = _column_state(seed=3)
    q = jnp.zeros_like(qr)
    q = q.at[:, 5].set(1e-3)  # a rain layer aloft
    q2, flux = _sediment(q, delp, dz, 6.0, 900.0)
    m0 = float((np.asarray(q) * np.asarray(delp)).sum() / GRAV)
    m1 = float((np.asarray(q2) * np.asarray(delp)).sum() / GRAV)
    np.testing.assert_allclose(
        m1 + float(np.asarray(flux).sum()), m0, rtol=1e-5
    )
    # center of mass moved down (level index increased)
    lev = np.arange(q.shape[1])[None, :, None, None]
    com0 = (np.asarray(q) * lev).sum() / np.asarray(q).sum()
    com1 = (np.asarray(q2) * lev).sum() / max(
        np.asarray(q2).sum(), 1e-30
    )
    assert com1 > com0 or np.asarray(q2).sum() < 1e-12


def test_mixed_phase_partition():
    assert liquid_fraction(jnp.asarray(280.0)) == 1.0
    assert liquid_fraction(jnp.asarray(220.0)) == 0.0
    mid = float(liquid_fraction(jnp.asarray(253.16)))
    assert 0.4 < mid < 0.6


def test_scheme_switch_changes_precip():
    """The suite-level switch must visibly change precipitation
    (VERDICT done-criterion)."""
    from fv3net_tpu.physics.gfs import (
        GFSPhysicsConfig,
        gfs_physics_step,
    )

    rng = np.random.RandomState(0)
    nz, n = 16, 4
    shape = (6, nz, n, n)
    f32 = np.float32
    p1d = np.linspace(2e3, 1e5, nz)
    t = jnp.asarray(
        300.0 - 55.0 * (1 - p1d / 1e5)[None, :, None, None]
        + rng.randn(*shape), f32,
    )
    qv = jnp.asarray(
        0.9 * 0.02 * (p1d / 1e5)[None, :, None, None] ** 2
        * np.ones(shape), f32,
    )
    qc = jnp.asarray(2e-3 * rng.rand(*shape), f32)
    delp = jnp.asarray(
        np.broadcast_to(
            np.gradient(p1d)[None, :, None, None], shape
        ), f32,
    )
    u = jnp.zeros((6, nz, n + 1, n), f32)
    v = jnp.zeros((6, nz, n, n + 1), f32)
    tsfc = jnp.full((6, n, n), 302.0, f32)
    out = {}
    for scheme in ("zhao_carr", "gfdl"):
        cfg = GFSPhysicsConfig(
            microphysics_scheme=scheme, do_convection=False,
            do_pbl=False, do_surface=False,
        )
        st, dg = gfs_physics_step(
            t, qv, qc, u, v, delp, tsfc, 100.0, 900.0, cfg=cfg
        )
        out[scheme] = np.asarray(dg["large_scale_precipitation"])
        assert np.isfinite(out[scheme]).all()
        assert out[scheme].sum() > 0.0
    # the schemes are different physics: precip fields must differ
    diff = np.abs(out["gfdl"] - out["zhao_carr"]).mean()
    scale = np.abs(out["zhao_carr"]).mean()
    assert diff > 0.05 * scale, (diff, scale)
