"""CLI entry-point tests (the framework-native replacement for the
reference's 11 MATLAB entry scripts + main.py driver, SURVEY §2.5)."""

import json

import numpy as np

from twoace_tpu.cli import build_parser, main


def _run(capsys, argv):
    main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


TINY = ["--nt", "4", "--nr", "4", "--trials", "1", "--maxiter", "20",
        "--restarts", "1", "--platform", "cpu"]


def test_parser_covers_reference_entry_points():
    ap = build_parser()
    subs = ap._subparsers._group_actions[0].choices
    # one subcommand per reference entry-point family (O1-O3)
    for cmd in ["vs-m", "vs-snr", "vs-sr", "mobility", "testbed", "recover"]:
        assert cmd in subs


def test_cli_vs_m_tiny(capsys, tmp_path):
    out = tmp_path / "vsm.npz"
    res = _run(capsys, ["vs-m", *TINY, "--m-grid", "40", "--paths", "1",
                        "--noiseless", "--out", str(out)])
    assert res["cmd"] == "vs-m"
    assert res["m_grid"] == [40]
    data = np.load(out)
    assert "m_grid" in data and any(k.startswith("nmse_") for k in data)
    # A2 on 4x4 with 40 noiseless probes recovers well even at 20 iters
    nmse_db = next(iter(res["nmse_db"].values()))[0]
    assert nmse_db < -3.0, nmse_db


def test_cli_mobility_tiny(capsys, tmp_path):
    out = tmp_path / "mob.mat"
    res = _run(capsys, ["mobility", *TINY, "--windows", "3",
                        "--window-probes", "30", "--out", str(out), "--mat"])
    assert res["cmd"] == "mobility"
    assert len(res["probe_budget"]) == 3
    import scipy.io as sio

    saved = sio.loadmat(out)
    assert "rss_error" in saved
