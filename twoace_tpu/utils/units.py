"""dB / power / amplitude conversion chains.

Implements the exact scaling chains of the reference so that RSS traces mean
the same thing in both stacks:
  - ``db2pow`` / ``pow2db`` (MATLAB built-ins used throughout)
  - the testbed RSSI -> dBm calibration ``0.0652*rssi - 74.3875``
    (ref: main/main.py:113)
  - the dBm -> amplitude chain ``sqrt(db2pow(rss)/1000) * rss_fct``
    (ref: main/channel_recovery_ADMM_v2_simulation_A2only.m:139)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DEFAULT_RSS_FCT

#: QCA6320 chip-specific RSSI calibration (ref: main/main.py:113)
RSSI_SLOPE = 0.0652
RSSI_OFFSET = -74.3875


def db2pow(x):
    """10^(x/10)."""
    return jnp.power(10.0, jnp.asarray(x) / 10.0)


def pow2db(x):
    """10*log10(x)."""
    return 10.0 * jnp.log10(jnp.asarray(x))


def rssi_to_dbm(rssi):
    """Raw firmware RSSI word -> dBm (ref: main/main.py:110-113).

    Values > 1000 are clipped to 0 before calibration in the reference
    (outlier handling); the caller is expected to have done the median/clip.
    """
    return jnp.asarray(rssi) * RSSI_SLOPE + RSSI_OFFSET


def dbm_to_amplitude(rss_dbm, rss_fct: float = DEFAULT_RSS_FCT):
    """dBm RSS -> linear field amplitude used as the ADMM "B" vector.

    ``sqrt(db2pow(rss)/1000) * rss_fct`` (ref: A2only.m:139).
    """
    return jnp.sqrt(db2pow(rss_dbm) / 1000.0) * rss_fct


def amplitude_to_dbm(amp, rss_fct: float = DEFAULT_RSS_FCT):
    """Inverse of :func:`dbm_to_amplitude`."""
    power_w = jnp.square(jnp.asarray(amp) / rss_fct) * 1000.0
    return pow2db(power_w)
