"""Testbed campaign orchestration — the ``main.py`` driver as a library.

TPU-native rewrite of the reference's end-to-end testbed run
(ref: main/main.py:26-483): five probing campaigns (thetaNphi sweep, phi
sweep, directional, random, multires) against a measurement provider,
followed by repeated estimation over the probe-budget grid and a
beamforming comparison of the recovered channels.

Hardware specifics (SSH, firmware reloads, .brd flashing) live behind the
:class:`~twoace_tpu.sensing.provider.MeasurementProvider` protocol; campaign
mechanics preserved here: per-round incremental checkpointing, retry
ladder, thermal guard, multires tier shuffling.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ArrayConfig, MethodFlags
from ..sensing.codebooks import (
    Codebook,
    kron_probe_rows,
    multires_codebook,
    random_codebook,
    svd_beamformer_bits,
    sweep_codebook,
)
from ..sensing.provider import MeasurementProvider, ThermalGuard
from ..utils.checkpoint import CampaignStore
from ..models.steering import unvec_channel
from .recovery import (
    CampaignConfig,
    recover_a2nuclear,
    recover_a2only,
    recover_multiresolution,
)


@dataclasses.dataclass
class TestbedConfig:
    """Probe counts of the reference campaigns (ref: main.py:28-81)."""

    array: ArrayConfig = ArrayConfig()
    n_theta_phi: int = 36       #: elevation+azimuth sweep rounds
    n_phi: int = 32             #: azimuth sweep rounds
    n_directional: int = 32     #: directional rounds (x sectors)
    n_random_rounds: int = 64   #: random codebook rounds
    sectors_per_round: int = 62
    multires_rounds: Sequence[int] = (32, 64, 64)
    n_repeats: int = 2          #: estimation repeats (ref: 40)
    checkpoint_dir: Optional[str] = None


class TestbedRunner:
    def __init__(self, cfg: TestbedConfig, provider: MeasurementProvider,
                 key=None, guard: Optional[ThermalGuard] = None):
        self.cfg = cfg
        self.provider = provider
        self.key = jax.random.PRNGKey(0) if key is None else key
        self.guard = guard
        self.store = CampaignStore(cfg.checkpoint_dir) \
            if cfg.checkpoint_dir else None
        self.results: Dict[str, Dict[str, np.ndarray]] = {}

    # ------------------------------------------------------------- campaigns

    def _measure_rounds(self, name: str, tx_rows, rx_rows,
                        interleave: bool = False) -> Dict[str, np.ndarray]:
        """Measure all (round, sector) probes with per-round checkpointing
        and thermal guarding (ref: main.py:97-134 structure)."""
        rounds = rx_rows.shape[0]
        sectors = tx_rows.shape[1]
        done = set(self.store.completed_rounds(name)) if self.store else set()
        rss = np.zeros((rounds, sectors))
        for i in range(rounds):
            if i in done:                       # resume from checkpoint
                rss[i] = self.store.load(name, i)["rss"]
                continue
            rows = kron_probe_rows(tx_rows[i:i + 1], rx_rows[i:i + 1])
            rss[i] = self.provider.measure(rows)
            if self.guard is not None:
                self.guard.wait_until_cool()    # ref: main.py:120-132
            if self.store:
                self.store.save(name, {"rss": rss[i]}, i)
        rows_all = kron_probe_rows(tx_rows, rx_rows, interleave=interleave)
        if interleave:
            rss_flat = rss.T.reshape(-1)        # sector-major, matching rows
        else:
            rss_flat = rss.reshape(-1)
        out = {"rss_dbm": rss_flat, "rows": np.asarray(rows_all)}
        self.results[name] = out
        return out

    def run_sweep_campaigns(self):
        """Campaigns 1-2: elevation/azimuth sweeps (ref: main.py:97-177).

        Probes use one sweep beam per round on both sides (single sector)."""
        cfg = self.cfg.array
        for name, count in (("theta_phi", self.cfg.n_theta_phi),
                            ("phi", self.cfg.n_phi)):
            cb = sweep_codebook(cfg, count)
            rows_side = cb.rows()
            tx = rows_side[:, None, :]           # (rounds, 1, nt)
            rx = jnp.conj(rows_side)             # combiner side
            self._measure_rounds(name, tx, rx)
        return self

    def run_random_campaign(self):
        """Campaign 4: random probing, 64 rounds x 62 Tx sectors
        (ref: main.py:241-302, generate_rx_codebook_16ant_random.py)."""
        cfg = self.cfg.array
        k1, k2 = jax.random.split(jax.random.fold_in(self.key, 4))
        rounds, sectors = self.cfg.n_random_rounds, self.cfg.sectors_per_round
        tx_cb = random_codebook(k1, rounds * sectors, cfg.nt)
        rx_cb = random_codebook(k2, rounds, cfg.nr)
        tx = tx_cb.rows().reshape(rounds, sectors, cfg.nt)
        rx = rx_cb.rows()
        self._measure_rounds("random", tx, rx)
        return self

    def run_multires_campaign(self):
        """Campaign 5: three-tier multires probing with sector-major
        interleave (ref: main.py:317-394, processsing_codebook_multires.m:60)."""
        cfg = self.cfg.array
        k1, k2 = jax.random.split(jax.random.fold_in(self.key, 5))
        rounds = tuple(self.cfg.multires_rounds)
        total_rounds = sum(rounds)
        sectors = self.cfg.sectors_per_round
        rx_cb, _ = multires_codebook(k1, cfg.nr, rounds)
        tx_cb, _ = multires_codebook(
            k2, cfg.nt, tuple(r * sectors for r in rounds))
        tx = tx_cb.rows().reshape(total_rounds, sectors, cfg.nt)
        rx = rx_cb.rows()
        self._measure_rounds("multires", tx, rx, interleave=True)
        return self

    # ------------------------------------------------------------ estimation

    def estimate(self, campaign: str = "random", method: str = "a2only",
                 seed_id: int = 1, cc: Optional[CampaignConfig] = None):
        """Recover the channel from a measured campaign over the M grid
        (ref: main.py:426-440)."""
        data = self.results[campaign]
        recover = {"a2only": recover_a2only,
                   "a2nuclear": recover_a2nuclear,
                   "multiresolution": recover_multiresolution}[method]
        kwargs = {"cc": cc} if cc is not None else {}
        out = recover(jnp.asarray(data["rows"]), jnp.asarray(data["rss_dbm"]),
                      seed_id=seed_id, **kwargs)
        if self.store:
            self.store.save(f"estimate_{campaign}_{method}_{seed_id}", {
                "h_amp": out.h_amp, "h_angle": out.h_angle,
                "m_grid": np.asarray(out.m_grid)})
        return out

    def beamforming_comparison(self, h_estimates: Dict[str, np.ndarray]):
        """Flash each method's SVD beamformer and measure its RSS
        (ref: main.py:452-483).  ``h_estimates``: method -> (n,) vec(H)."""
        cfg = self.cfg.array
        rss_bf: Dict[str, float] = {}
        for name, vec_h in h_estimates.items():
            h = np.asarray(unvec_channel(jnp.asarray(vec_h), cfg.nr, cfg.nt))
            wt_bits, wr_bits = svd_beamformer_bits(jnp.asarray(h),
                                                   cfg.phase_bit)
            wt = jnp.exp(1j * wt_bits * (np.pi / 2))
            wr = jnp.exp(1j * wr_bits * (np.pi / 2))
            row = kron_probe_rows(wt[None, None, :], jnp.conj(wr)[None, :])
            rss_bf[name] = float(self.provider.measure(row)[0])
        if self.store:
            self.store.save("beamforming", {
                k: np.asarray(v) for k, v in rss_bf.items()})
        return rss_bf
