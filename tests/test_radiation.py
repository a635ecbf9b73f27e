"""Physics validation of the multi-band radiation scheme
(fv3net_tpu/physics/{radsw,radlw,radgases,radclouds}.py), modeled on
the reference's radiation-port validation strategy (SURVEY 4.7:
external/radiation/README.md — validate the port against physical
invariants / reference data)."""

import datetime

import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.physics import radgases, radlw, radsw
from fv3net_tpu.physics.radclouds import cloud_fraction_from_rh
from fv3net_tpu.physics.radiation import (
    MultibandRadiationDriver,
    Radiation,
    RadiationDriver,
)

STEFAN = 5.670374419e-8


def _column(nz=40, ncol=5, t_sfc=288.0, q0=0.01, seed=0):
    """A plausible tropical-ish atmosphere, level 0 at the top."""
    rng = np.random.RandomState(seed)
    pe = np.linspace(100.0, 101325.0, nz + 1)[:, None] * np.ones(
        (1, ncol)
    )
    delp = pe[1:] - pe[:-1]
    p_lay = 0.5 * (pe[1:] + pe[:-1])
    temp = t_sfc - 55.0 * np.log(101325.0 / p_lay) / np.log(
        101325.0 / 10000.0
    )
    temp = np.clip(temp, 190.0, 320.0)
    sphum = q0 * (p_lay / 101325.0) ** 3 + 1e-6
    return (
        jnp.asarray(p_lay), jnp.asarray(delp), jnp.asarray(temp),
        jnp.asarray(sphum),
    )


def test_planck_band_fractions_sum_to_one():
    t = jnp.asarray([200.0, 250.0, 288.0, 320.0])
    flux = radlw.planck_band_flux(t)
    total = np.asarray(flux.sum(axis=0))
    # bands cover 10..3250 cm^-1 — nearly all emission at these temps
    np.testing.assert_allclose(
        total, STEFAN * np.asarray(t) ** 4, rtol=0.06
    )


def test_lw_isothermal_blackbody_limit():
    """Optically thick isothermal atmosphere at T: OLR -> sigma T^4."""
    p_lay, delp, temp, _ = _column()
    t0 = 260.0
    temp = jnp.full_like(temp, t0)
    sphum = jnp.full_like(temp, 0.02)  # very moist -> thick
    zeros = jnp.zeros_like(temp)
    lw = radlw.RadLWClass()(
        p_lay, delp, temp, sphum, zeros + 1e-6, zeros, zeros, zeros,
        jnp.full(temp.shape[1:], t0), sfc_emissivity=1.0,
    )
    olr = np.asarray(lw["olr"])
    expected = STEFAN * t0 ** 4
    # window bands keep it slightly below the blackbody value
    assert np.all(olr < expected * 1.01)
    assert np.all(olr > expected * 0.75)


def test_lw_energy_conservation():
    """Column-integrated heating equals net flux convergence."""
    from fv3net_tpu.constants import CP_AIR, GRAV

    p_lay, delp, temp, sphum = _column()
    zeros = jnp.zeros_like(temp)
    lw = radlw.RadLWClass()(
        p_lay, delp, temp, sphum, zeros + 3e-8, zeros, zeros, zeros,
        jnp.full(temp.shape[1:], 288.0),
    )
    colheat = np.asarray(
        (lw["heating_rate"] * delp).sum(axis=0) * CP_AIR / GRAV
    )
    net = np.asarray(lw["flux_up"] - lw["flux_dn"])
    np.testing.assert_allclose(
        colheat, -(net[0] - net[-1]), rtol=1e-4, atol=1e-3
    )


def test_lw_cooling_rates_physical():
    """Clear-sky tropospheric LW cooling ~0.5-4 K/day."""
    p_lay, delp, temp, sphum = _column()
    zeros = jnp.zeros_like(temp)
    lw = radlw.RadLWClass()(
        p_lay, delp, temp, sphum, zeros + 3e-8, zeros, zeros, zeros,
        jnp.full(temp.shape[1:], 288.0),
    )
    hr_day = np.asarray(lw["heating_rate"]) * 86400.0
    trop = hr_day[25:]  # lower troposphere
    assert np.all(trop < 0.5), "troposphere should cool"
    assert np.all(trop > -15.0), "cooling unreasonably strong"


def test_sw_energy_conservation():
    """TOA net SW = column absorption + surface net."""
    from fv3net_tpu.constants import CP_AIR, GRAV

    p_lay, delp, temp, sphum = _column()
    zeros = jnp.zeros_like(temp)
    mu0 = jnp.asarray([1.0, 0.7, 0.4, 0.15, 0.02])
    alb = jnp.full(mu0.shape, 0.15)
    sw = radsw.RadSWClass()(
        mu0, p_lay, delp, sphum, zeros + 3e-8, zeros, zeros, zeros,
        alb,
    )
    colabs = np.asarray(
        (sw["heating_rate"] * delp).sum(axis=0) * CP_AIR / GRAV
    )
    toa_net = np.asarray(sw["toa_dn"] - sw["toa_up"])
    sfc_net = np.asarray(sw["sfc_net"])
    np.testing.assert_allclose(
        toa_net, colabs + sfc_net, rtol=2e-3, atol=0.5
    )
    assert np.all(colabs >= -1e-3)


def test_sw_clouds_brighten_albedo():
    p_lay, delp, temp, sphum = _column()
    zeros = jnp.zeros_like(temp)
    mu0 = jnp.full((5,), 0.6)
    alb = jnp.full((5,), 0.1)
    clear = radsw.RadSWClass()(
        mu0, p_lay, delp, sphum, zeros + 3e-8, zeros, zeros, zeros,
        alb,
    )
    ql = zeros.at[28:33].set(2e-4)
    cf = zeros.at[28:33].set(0.9)
    cloudy = radsw.RadSWClass()(
        mu0, p_lay, delp, sphum, zeros + 3e-8, ql, zeros, cf, alb
    )
    assert np.all(
        np.asarray(cloudy["toa_up"]) > np.asarray(clear["toa_up"]) * 1.5
    )
    assert np.all(
        np.asarray(cloudy["sfc_dn"]) < np.asarray(clear["sfc_dn"])
    )


def test_sw_night_is_dark():
    p_lay, delp, temp, sphum = _column()
    zeros = jnp.zeros_like(temp)
    mu0 = jnp.zeros((5,))
    sw = radsw.RadSWClass()(
        mu0, p_lay, delp, sphum, zeros + 3e-8, zeros, zeros, zeros,
        jnp.full((5,), 0.1),
    )
    assert float(jnp.abs(sw["flux_dn"]).max()) == 0.0
    assert float(jnp.abs(sw["heating_rate"]).max()) == 0.0


def test_lw_clouds_raise_surface_downwelling():
    # dry column so the cloud is radiatively visible from the surface
    p_lay, delp, temp, sphum = _column(q0=2e-4)
    zeros = jnp.zeros_like(temp)
    tsfc = jnp.full(temp.shape[1:], 288.0)
    clear = radlw.RadLWClass()(
        p_lay, delp, temp, sphum, zeros + 3e-8, zeros, zeros, zeros,
        tsfc,
    )
    ql = zeros.at[30:34].set(2e-4)
    cf = zeros.at[30:34].set(1.0)
    low = radlw.RadLWClass()(
        p_lay, delp, temp, sphum, zeros + 3e-8, ql, zeros, cf, tsfc
    )
    assert np.all(
        np.asarray(low["sfc_dn"]) > np.asarray(clear["sfc_dn"]) + 5.0
    )
    # cold high ice cloud cuts OLR strongly
    qi = zeros.at[8:12].set(5e-5)
    cfh = zeros.at[8:12].set(1.0)
    high = radlw.RadLWClass()(
        p_lay, delp, temp, sphum, zeros + 3e-8, zeros, qi, cfh, tsfc
    )
    assert np.all(
        np.asarray(high["olr"]) < np.asarray(clear["olr"]) - 5.0
    )


def test_co2_greenhouse_effect():
    """Doubling CO2 must reduce clear-sky OLR by a few W/m^2."""
    p_lay, delp, temp, sphum = _column()
    zeros = jnp.zeros_like(temp)
    tsfc = jnp.full(temp.shape[1:], 288.0)
    o3 = zeros + 3e-8

    def olr(ppmv):
        lw = radlw.RadLWClass(
            gases=radgases.GasConcentrations(co2_ppmv=ppmv)
        )(p_lay, delp, temp, sphum, o3, zeros, zeros, zeros, tsfc)
        return np.asarray(lw["olr"]).mean()

    d = olr(420.0) - olr(840.0)
    assert 0.3 < d < 20.0, f"2xCO2 OLR reduction {d} W/m^2"


def test_cloud_fraction_from_rh():
    rh = jnp.asarray([0.2, 0.85, 0.95, 1.0])
    cf = np.asarray(cloud_fraction_from_rh(rh))
    assert cf[0] == 0.0 and cf[-1] == 1.0
    assert np.all(np.diff(cf) >= 0)


def test_multiband_driver_full_cube():
    """End-to-end driver contract on [6, nz, n, n] cube state."""
    nz, n = 20, 6
    pe = np.linspace(100.0, 101325.0, nz + 1)
    delp = np.broadcast_to(
        (pe[1:] - pe[:-1])[None, :, None, None], (6, nz, n, n)
    ).copy()
    p_lay = np.broadcast_to(
        (0.5 * (pe[1:] + pe[:-1]))[None, :, None, None],
        (6, nz, n, n),
    ).copy()
    temp = 288.0 - 50.0 * (1.0 - p_lay / 101325.0)
    sphum = 0.008 * (p_lay / 101325.0) ** 3 + 1e-6
    tsfc = np.full((6, n, n), 290.0)
    lat = np.linspace(-80, 80, 6 * n * n).reshape(6, n, n)
    lon = np.linspace(0, 359, 6 * n * n).reshape(6, n, n)
    drv = MultibandRadiationDriver()
    t = datetime.datetime(2016, 8, 1, 12)
    drv.radupdate(t)
    out = drv.gfs_radiation_driver(
        t, lon, lat, p_lay, delp, temp, sphum, tsfc
    )
    assert out["shortwave_heating_rate"].shape == (6, nz, n, n)
    assert out["longwave_heating_rate"].shape == (6, nz, n, n)
    day = out[
        "total_sky_downward_shortwave_flux_at_top_of_atmosphere"
    ]
    assert day.max() > 600.0  # local noon somewhere
    olr = out["total_sky_upward_longwave_flux_at_top_of_atmosphere"]
    assert np.all(olr > 80.0) and np.all(olr < 400.0)
    assert np.all(np.isfinite(out["shortwave_heating_rate"]))


def test_gray_driver_still_works():
    """The gray fallback scheme keeps its contract."""
    nz, n = 8, 4
    delp = np.full((6, nz, n, n), 101325.0 / nz)
    temp = np.full((6, nz, n, n), 270.0)
    sphum = np.full((6, nz, n, n), 1e-3)
    tsfc = np.full((6, n, n), 288.0)
    lat = np.zeros((6, n, n))
    lon = np.zeros((6, n, n))
    drv = RadiationDriver()
    out = drv.gfs_radiation_driver(
        datetime.datetime(2016, 8, 1, 12), lon, lat, None, delp,
        temp, sphum, tsfc,
    )
    assert out["shortwave_heating_rate"].shape == (6, nz, n, n)


def test_ozone_climatology_structure():
    """Latitude/season structure of the gas climatology
    (radiation_gases.py getozn role; VERDICT r3 item 7)."""
    import jax.numpy as jnp

    from fv3net_tpu.physics.radgases import (
        co2_for_year,
        ozone_climatology,
    )

    nz = 40
    p1d = jnp.asarray(np.logspace(2, 5, nz), jnp.float32)
    p = jnp.broadcast_to(p1d[None, :, None, None], (6, nz, 2, 2))
    lat_eq = jnp.zeros((6, 2, 2))
    lat_60 = jnp.full((6, 2, 2), 60.0)

    o3_eq = np.asarray(ozone_climatology(p, lat_eq, 105.0))
    o3_60 = np.asarray(ozone_climatology(p, lat_60, 105.0))
    # stratospheric peak below 100 hPa pressure, above 1 hPa
    k_eq = o3_eq[0, :, 0, 0].argmax()
    assert 3e2 < float(p1d[k_eq]) < 1e4
    # peak descends (higher pressure) toward the pole
    k_60 = o3_60[0, :, 0, 0].argmax()
    assert float(p1d[k_60]) > float(p1d[k_eq])
    # column increases poleward
    col = lambda o3: (o3 * np.gradient(np.asarray(p1d))[
        None, :, None, None]).sum(1)
    assert col(o3_60).mean() > 1.1 * col(o3_eq).mean()
    # NH spring maximum vs fall minimum at 60N
    o3_spring = col(np.asarray(ozone_climatology(p, lat_60, 105.0)))
    o3_fall = col(np.asarray(ozone_climatology(p, lat_60, 288.0)))
    assert o3_spring.mean() > o3_fall.mean()
    # CO2 secular trend
    assert 350 < co2_for_year(1990) < 360
    assert 415 < co2_for_year(2020) < 425
    assert co2_for_year(2026) > co2_for_year(2020)


def test_multiband_driver_with_climatology_runs():
    import datetime

    from fv3net_tpu.physics.radiation import MultibandRadiationDriver

    nz, n = 10, 3
    rng = np.random.RandomState(0)
    p1d = np.linspace(3e3, 1e5, nz)
    shape = (6, nz, n, n)
    p_lay = np.broadcast_to(
        p1d[None, :, None, None], shape
    ).astype(np.float32)
    delp = np.broadcast_to(
        np.gradient(p1d)[None, :, None, None], shape
    ).astype(np.float32)
    temp = (
        300.0 - 50.0 * (1 - p_lay / 1e5)
    ).astype(np.float32)
    sphum = (0.01 * (p_lay / 1e5) ** 2).astype(np.float32)
    drv = MultibandRadiationDriver()
    drv.radupdate(datetime.datetime(2016, 8, 1))
    out = drv.gfs_radiation_driver(
        datetime.datetime(2016, 8, 1, 12),
        np.zeros((6, n, n)), np.zeros((6, n, n)) + 15.0,
        p_lay, delp, temp, sphum,
        np.full((6, n, n), 300.0, np.float32),
    )
    olr = np.asarray(
        out["total_sky_upward_longwave_flux_at_top_of_atmosphere"]
    )
    assert np.isfinite(olr).all() and 100 < olr.mean() < 350
