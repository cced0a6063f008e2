"""Measurement providers — the framework's hardware abstraction.

Replaces the reference's L1 hardware stack (SSH/scp codebook flashing, TCP
JSON RSS server, firmware reloads; ref: main/codebook_library.py:21-48,
:453-516, main/main.py:97-134) with a provider protocol:

  provider.measure(codebook) -> RSS dBm per codebook entry

Implementations:
  - :class:`SyntheticProvider`: holds a ground-truth channel; RSS =
    |cb rows @ vec(H)|^2 with noise, RSSI quantization, and the chip's
    calibration map, plus optional fault injection (the retry ladder's test
    harness).
  - :class:`ReplayProvider`: replays a recorded RSS trace (the
    ``Dataset/*.mat`` role).

Operational behaviors of the reference preserved at this layer:
  - retry ladder with escalation (ref: codebook_library.py:500-511)
  - thermal guard hook (ref: main.py:120-132)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Protocol

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ArrayConfig
from ..utils.units import RSSI_OFFSET, RSSI_SLOPE
from .codebooks import Codebook


class MeasurementProvider(Protocol):
    def measure(self, rows: jax.Array) -> np.ndarray:
        """Probe rows (m, n) -> RSS in dBm (m,)."""
        ...


@dataclasses.dataclass
class SyntheticProvider:
    """Synthetic RSS from a ground-truth channel.

    The forward chain mirrors the testbed: complex gain -> power ->
    firmware RSSI word (inverse calibration, integer-quantized) -> dBm
    (ref: main.py:110-113 median/clip/calibrate).
    """

    vec_h: jax.Array                    #: (n,) ground truth vec(H)
    noise_dbm_std: float = 0.5          #: per-dump RSS jitter (+-2 dB repeat.)
    n_dumps: int = 10                   #: dumps medianed per probe (ref :474)
    quantize_rssi: bool = True
    tx_power_dbm: float = 0.0
    key: jax.Array = dataclasses.field(
        default_factory=lambda: jax.random.PRNGKey(0))
    fail_rate: float = 0.0              #: fault injection probability

    _calls: int = dataclasses.field(default=0, init=False)

    def measure(self, rows) -> np.ndarray:
        self._calls += 1
        rows = jnp.asarray(rows)
        gain = rows @ jnp.asarray(self.vec_h, rows.dtype)
        power_dbm = self.tx_power_dbm + 10.0 * jnp.log10(
            jnp.maximum(jnp.abs(gain) ** 2, 1e-30))
        k = jax.random.fold_in(self.key, self._calls)
        if self.fail_rate > 0.0:
            if float(jax.random.uniform(jax.random.fold_in(k, 99), ())) \
                    < self.fail_rate:
                raise ConnectionError("synthetic RSS dump failure (injected)")
        dumps = power_dbm[None, :] + self.noise_dbm_std * jax.random.normal(
            k, (self.n_dumps, power_dbm.shape[0]))
        med = jnp.median(dumps, axis=0)
        if self.quantize_rssi:
            # invert the chip calibration to integer RSSI words and back
            # (ref: main.py:113 dBm = 0.0652*rssi - 74.3875)
            rssi = jnp.round((med - RSSI_OFFSET) / RSSI_SLOPE)
            rssi = jnp.clip(rssi, 0, 1000)          # clip>1000 -> 0 upstream
            med = rssi * RSSI_SLOPE + RSSI_OFFSET
        return np.asarray(med)


@dataclasses.dataclass
class ReplayProvider:
    """Replay a recorded RSS trace row-aligned with a codebook."""

    rss_dbm: np.ndarray
    _cursor: int = dataclasses.field(default=0, init=False)

    def measure(self, rows) -> np.ndarray:
        m = jnp.asarray(rows).shape[0]
        out = self.rss_dbm[self._cursor:self._cursor + m]
        self._cursor += m
        if len(out) < m:
            raise EOFError("replay trace exhausted")
        return np.asarray(out)


@dataclasses.dataclass
class RetryingProvider:
    """Retry ladder around any provider (ref: codebook_library.py:500-511):
    up to ``max_retries`` attempts with a reset hook between failures, then
    escalate."""

    inner: MeasurementProvider
    max_retries: int = 10
    reset_hook: Optional[Callable[[], None]] = None
    backoff_s: float = 0.0

    def measure(self, rows) -> np.ndarray:
        last: Optional[Exception] = None
        for attempt in range(self.max_retries):
            try:
                return self.inner.measure(rows)
            except Exception as exc:   # noqa: BLE001 — ladder catches all
                last = exc
                if self.reset_hook is not None:
                    self.reset_hook()
                if self.backoff_s:
                    time.sleep(self.backoff_s)
        raise RuntimeError(
            f"measurement failed after {self.max_retries} retries") from last


@dataclasses.dataclass
class ThermalGuard:
    """Thermal throttle (ref: main.py:120-132): sleep while a temperature
    readout exceeds thresholds.  ``read_temps`` returns (mac_C, radio_C)."""

    read_temps: Callable[[], tuple]
    mac_limit: float = 70.0
    radio_limit: float = 62.5
    sleep_s: float = 20.0
    max_waits: int = 30
    sleep_fn: Callable[[float], None] = time.sleep

    def wait_until_cool(self) -> int:
        waits = 0
        while waits < self.max_waits:
            mac, radio = self.read_temps()
            if mac <= self.mac_limit and radio <= self.radio_limit:
                break
            self.sleep_fn(self.sleep_s)
            waits += 1
        return waits
