"""Native RSS server + TCP provider tests (replaces wil6210_server +
fetch_rss, SURVEY §2.4 H1/H6)."""

import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from twoace_tpu.sensing.tcp_provider import ServerProcess, TcpProvider

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def test_server_roundtrip_noiseless():
    rng = np.random.default_rng(0)
    n = 16
    h = (rng.normal(size=n) + 1j * rng.normal(size=n)) * 1e-3
    rows = (rng.normal(size=(5, n)) + 1j * rng.normal(size=(5, n)))
    with ServerProcess() as srv:
        prov = TcpProvider(port=srv.port)
        prov.set_channel(h)
        prov.set_noise(0.0)
        rss = prov.measure(rows)
        prov.close()
    expect = 10 * np.log10(np.abs(rows @ h) ** 2)
    # RSSI word quantization limits agreement to one 0.0652 dB step
    np.testing.assert_allclose(rss, expect, atol=0.04)


def test_server_noise_and_median():
    rng = np.random.default_rng(1)
    n = 8
    h = (rng.normal(size=n) + 1j * rng.normal(size=n)) * 1e-3
    rows = rng.normal(size=(3, n)) + 0j
    with ServerProcess(n_dumps=11) as srv:
        prov = TcpProvider(port=srv.port)
        prov.set_channel(h)
        prov.set_noise(1.0, seed=7)
        r1 = prov.measure(rows)
        r2 = prov.measure(rows)
        prov.close()
    expect = 10 * np.log10(np.abs(rows @ h) ** 2)
    # median of 11 noisy dumps stays near truth; separate calls differ
    assert np.abs(r1 - expect).max() < 1.5
    assert not np.allclose(r1, r2)


def test_server_unknown_command_and_weak_signal():
    with ServerProcess() as srv:
        prov = TcpProvider(port=srv.port)
        prov.set_channel(np.zeros(4, complex))
        rss = prov.measure(np.ones((2, 4), complex))
        # zero channel -> floor RSSI word 0 -> calibration offset
        np.testing.assert_allclose(rss, -74.3875, atol=1e-6)
        # protocol error surfaces cleanly
        resp = prov._rpc({"cmd": "bogus"})
        assert "error" in resp
        prov.close()
