"""Dominant-surface-type sfc_data coarsening + chgres-correction tests
(reference _coarse_grain_sfc_data_complex,
vcm/cubedsphere/coarsen_restarts.py:1032-1411)."""

import numpy as np
import pytest

from fv3net_tpu.utils.coarsen_restarts import (
    FREEZING_TEMPERATURE,
    STYPE_LAND_ICE,
    VTYPE_LAND_ICE,
    apply_surface_chgres_corrections,
    coarsen_sfc_data_complex,
)


def _checker(n, a, b):
    """n x n checkerboard-ish field: left half a, right half b."""
    f = np.full((1, n, n), a, float)
    f[..., n // 2 :] = b
    return f


def test_slmsk_mode_and_dominant_masking():
    n, factor = 4, 4
    # one coarse cell; 12 land cells, 4 sea cells -> dominant land
    slmsk = np.ones((1, n, n))
    slmsk[0, :2, :2] = 0.0
    tsea = np.where(slmsk == 1, 300.0, 280.0)
    tg3 = np.where(slmsk == 1, 285.0, 999.0)
    area = np.ones((1, n, n))
    out = coarsen_sfc_data_complex(
        {"slmsk": slmsk, "tsea": tsea, "tg3": tg3}, area, factor
    )
    assert out["slmsk"].shape == (1, 1, 1)
    assert out["slmsk"][0, 0, 0] == 1.0
    # tsea is a plain area-weighted mean (mixes both types)
    np.testing.assert_allclose(
        out["tsea"][0, 0, 0], (12 * 300.0 + 4 * 280.0) / 16
    )
    # tg3 averages only over the dominant (land) cells
    np.testing.assert_allclose(out["tg3"][0, 0, 0], 285.0)


def test_vtype_mode_over_dominant_and_canopy_vfrac_weighting():
    n, factor = 4, 4
    slmsk = np.ones((1, n, n))
    vtype = np.full((1, n, n), 7.0)
    vtype[0, 0, :] = 3.0  # minority vegetation type
    vfrac = np.full((1, n, n), 0.5)
    vfrac[0, 0, :] = 0.0
    canopy = np.full((1, n, n), 2.0)
    canopy[0, 0, :] = 99.0  # excluded: wrong vtype
    shdmin = np.full((1, n, n), 0.5)
    area = np.ones((1, n, n))
    out = coarsen_sfc_data_complex(
        {
            "slmsk": slmsk, "vtype": vtype, "vfrac": vfrac,
            "canopy": canopy, "shdmin": shdmin,
        },
        area, factor,
    )
    assert out["vtype"][0, 0, 0] == 7.0
    np.testing.assert_allclose(out["canopy"][0, 0, 0], 2.0)


def test_soil_columns_mask_by_stype():
    n, factor = 4, 4
    slmsk = np.ones((1, n, n))
    stype = np.full((1, n, n), 3.0)
    stype[0, :, 0] = 5.0
    smc = np.full((1, 2, n, n), 0.3)
    smc[0, :, :, 0] = 0.9  # off-dominant-stype cells
    area = np.ones((1, n, n))
    out = coarsen_sfc_data_complex(
        {"slmsk": slmsk, "stype": stype, "smc": smc}, area, factor
    )
    assert out["smc"].shape == (1, 2, 1, 1)
    np.testing.assert_allclose(out["smc"], 0.3)


def test_sheleg_snow_cover_weighting_and_minmax_rules():
    n, factor = 2, 2
    slmsk = np.ones((1, n, n))
    sncovr = np.array([[[1.0, 0.0], [0.0, 0.0]]])
    sheleg = np.array([[[10.0, 99.0], [99.0, 99.0]]])
    shdmin = np.array([[[0.2, 0.4], [0.6, 0.8]]])
    shdmax = np.array([[[0.2, 0.4], [0.6, 0.8]]])
    area = np.ones((1, n, n))
    out = coarsen_sfc_data_complex(
        {
            "slmsk": slmsk, "sncovr": sncovr, "sheleg": sheleg,
            "shdmin": shdmin, "shdmax": shdmax,
        },
        area, factor,
    )
    np.testing.assert_allclose(out["sheleg"][0, 0, 0], 10.0)
    np.testing.assert_allclose(out["shdmin"][0, 0, 0], 0.2)
    np.testing.assert_allclose(out["shdmax"][0, 0, 0], 0.8)


def test_tisfc_sea_ice_special_case():
    n, factor = 2, 2
    slmsk = np.full((1, n, n), 2.0)  # all sea ice
    fice = np.array([[[1.0, 0.0], [0.0, 0.0]]])
    tisfc = np.array([[[260.0, 300.0], [300.0, 300.0]]])
    area = np.ones((1, n, n))
    out = coarsen_sfc_data_complex(
        {"slmsk": slmsk, "fice": fice, "tisfc": tisfc}, area, factor
    )
    # ice-fraction weighting picks the icy cell's temperature
    np.testing.assert_allclose(out["tisfc"][0, 0, 0], 260.0)


def test_chgres_corrections():
    ds = {
        "vtype": np.array([[[VTYPE_LAND_ICE, 7.0]]]),
        "stype": np.array([[[3.0, 3.0]]]),
        "tsea": np.array([[[280.0, 280.0]]]),
        "tg3": np.array([[[280.0, 280.0]]]),
        "shdmin": np.array([[[0.5, 0.005]]]),
        "canopy": np.array([[[1.0, 1.0]]]),
    }
    out = apply_surface_chgres_corrections(ds)
    # land-ice cell: clipped at freezing, ice soil type, shdmin zeroed
    assert out["tsea"][0, 0, 0] == pytest.approx(FREEZING_TEMPERATURE)
    assert out["tg3"][0, 0, 0] == pytest.approx(FREEZING_TEMPERATURE)
    assert out["stype"][0, 0, 0] == STYPE_LAND_ICE
    assert out["shdmin"][0, 0, 0] == 0.0
    # non-ice cell untouched
    assert out["tsea"][0, 0, 1] == pytest.approx(280.0)
    assert out["stype"][0, 0, 1] == 3.0
    # bare land (shdmin < 0.011) zeroes canopy; the canopy rule uses the
    # PRE-correction shdmin (reference step 3 before step 4), so the
    # land-ice cell with original shdmin=0.5 keeps its canopy even though
    # its shdmin is zeroed afterwards
    assert out["canopy"][0, 0, 1] == 0.0
    assert out["canopy"][0, 0, 0] == 1.0


def test_srflag_mode_and_slope_dominant_mode():
    n, factor = 2, 2
    slmsk = np.array([[[1.0, 1.0], [1.0, 0.0]]])
    srflag = np.array([[[1.0, 1.0], [0.0, 0.0]]])
    slope = np.array([[[2.0, 2.0], [3.0, 9.0]]])
    area = np.ones((1, n, n))
    out = coarsen_sfc_data_complex(
        {"slmsk": slmsk, "srflag": srflag, "slope": slope}, area,
        factor,
    )
    assert out["srflag"][0, 0, 0] in (0.0, 1.0)
    assert out["slope"][0, 0, 0] == 2.0  # mode over land cells only
