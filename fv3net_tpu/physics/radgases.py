"""Band-wise gas optics for the multi-band radiation scheme.

Plays the role of the reference's `radiation_gases.py` (GasClass,
~700 LoC: global-mean CO2/rare-gas climatology + seasonal update) plus
the k-distribution tables baked into `radlw/radlw_main.py` and
`radsw/radsw_main.py` (reference external/radiation; see
radiation_driver.py:18).  TPU-native design: instead of 140/112
g-points with pentadecadal lookup tables, each band carries a small set
of mass-absorption coefficients (m^2/kg) for the active absorbers
(H2O, CO2, O3) plus a pressure-broadening exponent; optical depth is a
pure elementwise expression over [band, level, column] arrays, which
XLA fuses into the two-stream solvers.

The band structure below is a reduced (8 LW / 6 SW band) correlated-k
style model.  Band limits follow the RRTMG groupings (combined);
coefficients are tuned so clear-sky OLR, surface fluxes and heating
rates land in the physically expected range (validated in
tests/test_radiation.py: OLR vs sigma*T^4 bounds, energy conservation,
heating-rate magnitudes).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import GRAV

# --- LW band structure: wavenumber limits (cm^-1), 8 bands ------------
# (merged RRTMG bands: rotation band, window, 15um CO2, vibration bands)
LW_BAND_LIMITS = np.array(
    [
        [10.0, 350.0],    # H2O rotation
        [350.0, 630.0],   # H2O rotation wing
        [630.0, 700.0],   # CO2 15um core
        [700.0, 820.0],   # CO2 15um wing
        [820.0, 980.0],   # window
        [980.0, 1080.0],  # O3 9.6um
        [1080.0, 1390.0], # window / weak H2O
        [1390.0, 3250.0], # H2O vibration-rotation
    ]
)
NBANDS_LW = len(LW_BAND_LIMITS)

# mass absorption coefficients per band (m^2/kg of absorber)
# rows: band; columns implicit per absorber
LW_K_H2O = np.array([18.0, 4.5, 0.8, 0.45, 0.045, 0.09, 0.22, 2.8])
LW_K_CO2 = np.array([0.0, 0.12, 75.0, 9.0, 0.02, 0.0, 0.05, 0.4])
LW_K_O3 = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 28.0, 0.0, 0.0])
# water-vapor self-continuum (scaled by vapor path * vapor pressure)
LW_K_SELF = np.array([4.0, 2.2, 0.6, 0.7, 0.55, 0.30, 0.26, 0.65])

# --- SW band structure: 6 bands (UV/vis + near-IR groupings) ----------
# fraction of TOA solar irradiance per band (sums to 1)
SW_BAND_FRAC = np.array([0.118, 0.357, 0.252, 0.158, 0.082, 0.033])
SW_K_H2O = np.array([0.0, 0.0, 0.012, 0.45, 3.2, 22.0])
SW_K_O3 = np.array([160.0, 5.5, 0.0, 0.0, 0.0, 0.0])
SW_K_CO2 = np.array([0.0, 0.0, 0.0, 0.004, 0.04, 0.35])
# Rayleigh optical depth per unit (p/p0) of column, per band
SW_TAU_RAYLEIGH = np.array([0.30, 0.036, 0.006, 0.0015, 0.0004, 0.0001])
NBANDS_SW = len(SW_BAND_FRAC)


@dataclasses.dataclass
class GasConcentrations:
    """Well-mixed gas volume mixing ratios (GasClass role,
    radiation_gases.py): CO2 with a secular trend, fixed CH4/N2O folded
    into effective CO2."""

    co2_ppmv: float = 420.0

    def co2_mass_mixing_ratio(self) -> float:
        return self.co2_ppmv * 1e-6 * (44.01 / 28.964)


def default_o3_profile(p_lay):
    """Crude climatological ozone mass mixing ratio on pressure levels
    (stands in for the reference's ozone climatology files): peaked in
    the stratosphere around 10-30 hPa.  jnp-traceable."""
    import jax.numpy as jnp

    logp = jnp.log(jnp.maximum(p_lay, 1.0))
    peak = jnp.exp(-0.5 * ((logp - np.log(2.0e3)) / 0.9) ** 2)
    return 1.0e-5 * peak + 3.0e-8


def absorber_paths(delp, sphum, o3mmr, co2mmr):
    """Mass paths (kg/m^2) of each absorber per layer.

    delp [..., nz, ...] in Pa; sphum/o3mmr mass mixing ratios.
    Returns (u_h2o, u_co2, u_o3) with delp's shape.
    """
    air = delp / GRAV
    return sphum * air, co2mmr * air, o3mmr * air
