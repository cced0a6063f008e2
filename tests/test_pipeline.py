"""End-to-end pipeline tests: testbed campaigns, recovery entries, mobility,
simulation sweeps (SURVEY §2.5/§3.1/§3.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twoace_tpu.config import (
    AdmmConfig,
    ArrayConfig,
    ChannelConfig,
    MethodFlags,
)
from twoace_tpu.models import generate_channel
from twoace_tpu.pipeline import (
    CampaignConfig,
    MobilityConfig,
    SimulationConfig,
    TestbedConfig,
    TestbedRunner,
    recover_a2only,
    sweep_measurements,
    track,
)
from twoace_tpu.sensing.codebooks import random_codebook, kron_probe_rows
from twoace_tpu.sensing.provider import (
    RetryingProvider,
    SyntheticProvider,
    ThermalGuard,
)
from twoace_tpu.utils.checkpoint import CampaignStore
from twoace_tpu.utils.metrics import nmse_h_projection
from twoace_tpu.utils.units import dbm_to_amplitude


CFG = ArrayConfig(nt=4, nr=4)
FAST_ADMM = AdmmConfig(maxiter=150, n_restarts=1)


def _ground_truth(key, cfg=CFG):
    ch = generate_channel(key, cfg, ChannelConfig(n_paths=2, rician_k=0),
                          batch=1, dtype=jnp.complex128)
    return ch


def test_synthetic_provider_chain(key):
    ch = _ground_truth(key)
    prov = SyntheticProvider(vec_h=ch.vec_h[0] * 1e-2, noise_dbm_std=0.0)
    rows = jnp.eye(CFG.n, dtype=jnp.complex128)[:4]
    rss = prov.measure(rows)
    expect = 10 * np.log10(np.abs(np.asarray(ch.vec_h[0][:4]) * 1e-2) ** 2)
    # RSSI quantization limits agreement to the 0.0652 dB step
    np.testing.assert_allclose(rss, expect, atol=0.04)


def test_retry_ladder_recovers_and_escalates(key):
    ch = _ground_truth(key)
    flaky = SyntheticProvider(vec_h=ch.vec_h[0], fail_rate=1.0)
    resets = []
    prov = RetryingProvider(flaky, max_retries=3,
                            reset_hook=lambda: resets.append(1))
    with pytest.raises(RuntimeError):
        prov.measure(jnp.eye(CFG.n, dtype=jnp.complex128)[:2])
    assert len(resets) == 3


def test_thermal_guard_waits():
    temps = iter([(80.0, 60.0), (75.0, 60.0), (60.0, 50.0)])
    sleeps = []
    guard = ThermalGuard(read_temps=lambda: next(temps),
                         sleep_fn=lambda s: sleeps.append(s))
    waits = guard.wait_until_cool()
    assert waits == 2 and sleeps == [20.0, 20.0]


def test_testbed_campaign_and_recovery(key, tmp_path):
    """Full synthetic testbed flow: random campaign -> A2 recovery -> NMSE."""
    ch = _ground_truth(key)
    prov = SyntheticProvider(vec_h=ch.vec_h[0] * 3e-4, noise_dbm_std=0.0)
    tb_cfg = TestbedConfig(array=CFG, n_random_rounds=8, sectors_per_round=8,
                           checkpoint_dir=str(tmp_path))
    runner = TestbedRunner(tb_cfg, prov, key=key)
    runner.run_random_campaign()
    data = runner.results["random"]
    assert data["rows"].shape == (64, CFG.n)

    out = runner.estimate("random", "a2only", seed_id=1,
                          cc=CampaignConfig(array=CFG, admm=FAST_ADMM,
                                            n_paths=2))
    assert out.h_amp.shape[0] == len(out.m_grid)
    # best-M estimate should correlate with the ground truth
    h_est = out.h_amp[-1, 0] * np.exp(1j * out.h_angle[-1, 0])
    nmse = float(nmse_h_projection(jnp.asarray(h_est)[None],
                                   ch.vec_h * 3e-4)[0])
    assert nmse < 0.3, nmse
    # checkpoints were written and enable resume
    store = CampaignStore(str(tmp_path))
    assert len(store.completed_rounds("random")) == 8


def test_testbed_resume_skips_measured_rounds(key, tmp_path):
    ch = _ground_truth(key)
    prov = SyntheticProvider(vec_h=ch.vec_h[0], noise_dbm_std=0.0)
    tb_cfg = TestbedConfig(array=CFG, n_random_rounds=4, sectors_per_round=4,
                           checkpoint_dir=str(tmp_path))
    r1 = TestbedRunner(tb_cfg, prov, key=key)
    r1.run_random_campaign()
    calls_after_first = prov._calls
    # second runner resumes: no new provider calls
    r2 = TestbedRunner(tb_cfg, prov, key=key)
    r2.run_random_campaign()
    assert prov._calls == calls_after_first
    np.testing.assert_allclose(r2.results["random"]["rss_dbm"],
                               r1.results["random"]["rss_dbm"])


def test_beamforming_comparison_beats_noise(key):
    ch = _ground_truth(key)
    prov = SyntheticProvider(vec_h=ch.vec_h[0], noise_dbm_std=0.0)
    runner = TestbedRunner(TestbedConfig(array=CFG), prov, key=key)
    rss = runner.beamforming_comparison({
        "truth": np.asarray(ch.vec_h[0]),
        "garbage": np.ones(CFG.n, complex),
    })
    assert rss["truth"] >= rss["garbage"] - 1e-6


def test_mobility_tracking_adapts(key):
    """Static channel: once locked, rss error stays low; budget resets to 0."""
    ch = _ground_truth(key)
    t_size, n_windows = 16, 6
    cb = random_codebook(key, t_size * n_windows, CFG.n).rows(normalize=True)
    amps = jnp.abs(cb @ ch.vec_h[0])
    trace = track(key, cb, amps, CFG,
                  MobilityConfig(window_probes=t_size, max_window=48,
                                 admm=FAST_ADMM))
    assert trace.rss_error.shape == (n_windows,)
    # once the sliding window holds ~3n probes the estimate locks in and
    # predicts future RSS well; the budget then resets to zero
    assert trace.rss_error[3:].max() < 0.3
    assert trace.probe_budget[4:].max() == 0


def test_simulation_sweep_runs(key):
    sim = SimulationConfig(
        array=ArrayConfig(nt=4, nr=4),
        channel=ChannelConfig(n_paths=1, rician_k=0, on_grid=True),
        snr_db=20.0,
        methods=MethodFlags(admm_lowrank_v4=False, plomp=True, plgamp=False),
        n_trials=2)
    res = sweep_measurements(key, [4, 6], sim, searching_area=60.0)
    assert "plomp" in res.nmse
    assert res.nmse["plomp"].shape == (2,)
    assert np.isfinite(res.nmse["plomp"]).all()
    # perfect/noisy-phase CS baselines ride along (ref Vs_M method set)
    assert "perfect_phase_cs" in res.nmse
