"""Vertical remap tests: vectorized JAX vs the scalar reference oracle,
plus the conservation/roundtrip properties the reference's own test suite
checks (external/vcm/tests/test_mappm.py:5-33)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fv3net_tpu.ops import cs_profile, ppm_profile, ppm_remap
from fv3net_tpu.ops.remap import interpolate_columns

from reference_mappm import (
    cs_profile_ref,
    mappm_ref,
    ppm_profile_ref,
)


def random_columns(ncol, km, seed=0, smooth=False):
    rng = np.random.RandomState(seed)
    if smooth:
        x = np.linspace(0, 1, km)
        q = np.stack(
            [
                np.sin(4 * x * (1 + 0.3 * rng.rand()))
                + 0.1 * rng.randn(km).cumsum() / km
                for _ in range(ncol)
            ]
        )
    else:
        q = rng.randn(ncol, km)
    dp = 0.5 + rng.rand(ncol, km)
    return q, dp


def _assert_profile_close(mine, oracle, tie, what, max_tie_frac=0.9):
    """Compare profiles outside limiter-branch tie cells.

    Strict comparisons in the limiters sit at exact equality for clamped
    profiles, so 1-ulp arithmetic differences legitimately flip branches
    there; everywhere else the implementations must agree to roundoff.
    """
    ok = ~tie
    assert tie.mean() <= max_tie_frac, f"{what}: too many tie cells"
    for m, o in zip(mine, oracle):
        np.testing.assert_allclose(
            m[ok], o[ok], rtol=1e-11, atol=1e-11, err_msg=what
        )


@pytest.mark.parametrize("kord", [8, 9, 10, 11, 12, 13, 14, 15, 16, 17])
@pytest.mark.parametrize("iv", [-1, 0, 1, 2])
def test_cs_profile_matches_reference(kord, iv):
    ncol, km = 12, 24
    q, dp = random_columns(ncol, km, seed=kord * 10 + iv)
    if iv == 0:
        q = np.abs(q)
    al, ar, a6 = cs_profile(
        jnp.asarray(q.T), jnp.asarray(dp.T), iv=iv, kord=kord
    )
    al, ar, a6 = np.asarray(al).T, np.asarray(ar).T, np.asarray(a6).T
    for i in range(ncol):
        al_r, ar_r, a6_r, tie = cs_profile_ref(
            q[i], dp[i], iv, kord, return_ties=True
        )
        _assert_profile_close(
            (al[i], ar[i], a6[i]), (al_r, ar_r, a6_r), tie,
            f"cs_profile kord={kord} iv={iv} col={i}",
        )


def test_cs_profile_smooth_data_few_ties():
    """On smooth (atmosphere-like) profiles the limiters rarely activate,
    so nearly all cells must match the oracle directly."""
    ncol, km = 8, 40
    q, dp = random_columns(ncol, km, seed=33, smooth=True)
    al, ar, a6 = cs_profile(
        jnp.asarray(q.T), jnp.asarray(dp.T), iv=1, kord=9
    )
    al, ar, a6 = np.asarray(al).T, np.asarray(ar).T, np.asarray(a6).T
    for i in range(ncol):
        al_r, ar_r, a6_r, tie = cs_profile_ref(
            q[i], dp[i], 1, 9, return_ties=True
        )
        assert tie.mean() < 0.45, f"col {i}: tie fraction {tie.mean()}"
        _assert_profile_close(
            (al[i], ar[i], a6[i]), (al_r, ar_r, a6_r), tie,
            f"smooth col={i}",
        )


def test_cs_profile_iv_minus2_matches_reference():
    ncol, km = 8, 16
    q, dp = random_columns(ncol, km, seed=5)
    qs = np.random.RandomState(6).randn(ncol)
    al, ar, a6 = cs_profile(
        jnp.asarray(q.T), jnp.asarray(dp.T), iv=-2, kord=9,
        qs=jnp.asarray(qs),
    )
    al, ar, a6 = np.asarray(al).T, np.asarray(ar).T, np.asarray(a6).T
    for i in range(ncol):
        al_r, ar_r, a6_r, tie = cs_profile_ref(
            q[i], dp[i], -2, 9, qs=qs[i], return_ties=True
        )
        _assert_profile_close(
            (al[i], ar[i]), (al_r, ar_r), tie, f"iv=-2 col={i}"
        )


@pytest.mark.parametrize("kord", [1, 4, 5, 6, 7, -10])
@pytest.mark.parametrize("iv", [-1, 0, 1])
def test_ppm_profile_matches_reference(kord, iv):
    ncol, km = 10, 20
    q, dp = random_columns(ncol, km, seed=100 + kord + iv)
    if iv == 0:
        q = np.abs(q)
    al, ar, a6 = ppm_profile(
        jnp.asarray(q.T), jnp.asarray(dp.T), iv=iv, kord=kord
    )
    al, ar, a6 = np.asarray(al).T, np.asarray(ar).T, np.asarray(a6).T
    for i in range(ncol):
        al_r, ar_r, a6_r, tie = ppm_profile_ref(
            q[i], dp[i], iv, kord, return_ties=True
        )
        _assert_profile_close(
            (al[i], ar[i], a6[i]), (al_r, ar_r, a6_r), tie,
            f"ppm_profile kord={kord} iv={iv} col={i}",
        )


def _edges(ncol, km, ptop, ps, seed):
    """Random monotone edge pressures from ptop to ps."""
    rng = np.random.RandomState(seed)
    w = 0.2 + rng.rand(ncol, km)
    w = w / w.sum(axis=1, keepdims=True)
    pe = np.concatenate(
        [np.full((ncol, 1), ptop), ptop + (ps - ptop) * np.cumsum(w, axis=1)],
        axis=1,
    )
    return pe


@pytest.mark.parametrize("kord", [1, 7, 9, 10])
@pytest.mark.parametrize("iv", [0, 1])
def test_remap_integration_matches_reference(kord, iv):
    """Validate the cumulative-integral remap against the oracle's
    interval-by-interval accumulation, with shared reconstruction
    coefficients (so limiter branch ties cannot flip the comparison)."""
    from fv3net_tpu.ops.remap import _reconstruct

    ncol, km, kn = 8, 20, 17
    q, _ = random_columns(ncol, km, seed=3, smooth=True)
    if iv == 0:
        q = np.abs(q)
    pe1 = _edges(ncol, km, 100.0, 1000.0, seed=4)
    pe2 = _edges(ncol, kn, 80.0, 1050.0, seed=5)  # extends past both ends
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q.T), jnp.asarray(pe1.T), jnp.asarray(pe2.T),
                  iv=iv, kord=kord)
    ).T
    dp1 = np.diff(pe1, axis=1)
    al, ar, a6 = _reconstruct(
        jnp.asarray(q.T), jnp.asarray(dp1.T), iv, kord, None
    )
    al, ar, a6 = np.asarray(al).T, np.asarray(ar).T, np.asarray(a6).T
    for i in range(ncol):
        q2_r = mappm_ref(
            q[i], pe1[i], pe2[i], iv, kord,
            profile=(al[i], ar[i], a6[i]),
        )
        np.testing.assert_allclose(q2[i], q2_r, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("kord", [9, -10])
def test_remap_end_to_end_close(kord):
    """Full remap (reconstruction + integration) vs oracle on smooth data,
    tolerance-gated: tie-flipped limiter branches may differ pointwise but
    both are valid limited profiles, so remapped values stay close."""
    ncol, km, kn = 8, 20, 17
    q, _ = random_columns(ncol, km, seed=21, smooth=True)
    pe1 = _edges(ncol, km, 100.0, 1000.0, seed=22)
    pe2 = _edges(ncol, kn, 100.0, 1000.0, seed=23)
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q.T), jnp.asarray(pe1.T), jnp.asarray(pe2.T),
                  iv=1, kord=kord)
    ).T
    for i in range(ncol):
        q2_r = mappm_ref(q[i], pe1[i], pe2[i], 1, kord)
        np.testing.assert_allclose(q2[i], q2_r, rtol=2e-2, atol=2e-2)


def test_remap_conserves_mass():
    """Total integral q dp is conserved when pe2 spans the same column."""
    ncol, km, kn = 16, 30, 21
    q, _ = random_columns(ncol, km, seed=7, smooth=True)
    pe1 = _edges(ncol, km, 100.0, 1000.0, seed=8)
    pe2 = _edges(ncol, kn, 100.0, 1000.0, seed=9)
    pe2[:, 0] = pe1[:, 0]
    pe2[:, -1] = pe1[:, -1]
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q.T), jnp.asarray(pe1.T), jnp.asarray(pe2.T),
                  iv=1, kord=9, exact_boundaries=True)
    ).T
    m1 = (q * np.diff(pe1, axis=1)).sum(axis=1)
    m2 = (q2 * np.diff(pe2, axis=1)).sum(axis=1)
    np.testing.assert_allclose(m1, m2, rtol=1e-11)


def test_mappm_top_layer_rule_is_not_conservative():
    """Documents mappm's quirk: with pe2[0] == pe1[0], the Fortran rule
    assigns q1[0] to the whole first target layer (mappm.f90:62-64),
    which generally breaks conservation; exact_boundaries=True fixes it."""
    km, kn = 10, 7
    q = np.linspace(1.0, 2.0, km)
    pe1 = np.linspace(100.0, 1000.0, km + 1)
    pe2 = np.linspace(100.0, 1000.0, kn + 1)
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q[:, None]), jnp.asarray(pe1[:, None]),
                  jnp.asarray(pe2[:, None]), iv=1, kord=9)
    )[:, 0]
    # first layer got the mappm constant rule
    np.testing.assert_allclose(q2[0], q[0])
    # and matches the oracle exactly in doing so
    q2_r = mappm_ref(q, pe1, pe2, 1, 9)
    np.testing.assert_allclose(q2, q2_r, rtol=1e-12)


def test_remap_identity_roundtrip():
    """Remap onto the same grid returns the input (cf. the reference's
    test_mappm.py round-trip check)."""
    ncol, km = 6, 25
    q, _ = random_columns(ncol, km, seed=11, smooth=True)
    pe = _edges(ncol, km, 50.0, 900.0, seed=12)
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q.T), jnp.asarray(pe.T), jnp.asarray(pe.T),
                  iv=1, kord=9)
    ).T
    np.testing.assert_allclose(q2, q, rtol=1e-10, atol=1e-12)


def test_remap_constant_preserved():
    ncol, km, kn = 4, 12, 33
    pe1 = _edges(ncol, km, 10.0, 1000.0, seed=13)
    pe2 = _edges(ncol, kn, 5.0, 1100.0, seed=14)
    q = np.full((ncol, km), 3.25)
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q.T), jnp.asarray(pe1.T), jnp.asarray(pe2.T),
                  iv=1, kord=10)
    ).T
    np.testing.assert_allclose(q2, 3.25, rtol=1e-12)


def test_remap_monotone_no_new_extrema():
    """kord=9 monotone remap must not overshoot the source range."""
    ncol, km, kn = 10, 40, 28
    q, _ = random_columns(ncol, km, seed=15, smooth=True)
    pe1 = _edges(ncol, km, 100.0, 1000.0, seed=16)
    pe2 = _edges(ncol, kn, 100.0, 1000.0, seed=17)
    pe2[:, 0] = pe1[:, 0]
    pe2[:, -1] = pe1[:, -1]
    q2 = np.asarray(
        ppm_remap(jnp.asarray(q.T), jnp.asarray(pe1.T), jnp.asarray(pe2.T),
                  iv=1, kord=9)
    ).T
    # kord 9 is quasi-monotone: tiny overshoots are part of the scheme
    rng_amp = (q.max(axis=1) - q.min(axis=1)).max()
    eps = 0.01 * rng_amp
    assert (q2 <= q.max(axis=1, keepdims=True) + eps).all()
    assert (q2 >= q.min(axis=1, keepdims=True) - eps).all()


def test_interpolate_columns():
    x = np.array([[0.0, 1.0, 2.0, 4.0]] * 3)
    y = np.array([[0.0, 10.0, 20.0, 40.0]] * 3)
    xp = np.array([[0.5, 2.0, 4.0, 5.0, -1.0]] * 3)
    out = np.asarray(
        interpolate_columns(
            jnp.asarray(xp.T), jnp.asarray(x.T), jnp.asarray(y.T),
            fill_value=-999.0,
        )
    ).T
    np.testing.assert_allclose(out[0], [5.0, 20.0, 40.0, -999.0, -999.0])
