"""The `python -m beast_mcmc_tpu run` CLI (BeastMain role,
ref: BeastMain.java:370-460)."""

import os

import pytest

from beast_mcmc_tpu.__main__ import main

STRICT_CLOCK = "/root/reference/examples/TestXML/ClockModels/testStrictClock.xml"
YULE = "/root/reference/examples/TestXML/TreePriors/testYuleModel.xml"


def test_cli_testxml_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["run", YULE, "-testxml", "-scale", "0.02", "-seed", "2"])
    assert rc == 0


def test_cli_importer_mode_with_checkpoint(tmp_path, monkeypatch):
    if not os.path.exists(STRICT_CLOCK):
        pytest.skip("reference file missing")
    monkeypatch.chdir(tmp_path)
    rc = main([
        "run", STRICT_CLOCK, "-seed", "3", "-chain_length", "2000",
        "-log", "run.log", "-trees", "run.trees",
        "-save_state", "state.npz",
    ])
    assert rc == 0
    assert os.path.exists("run.log") and os.path.getsize("run.log") > 0
    assert os.path.exists("run.trees")
    # resume from the checkpoint (the -load_state surface)
    rc = main([
        "run", STRICT_CLOCK, "-seed", "3", "-chain_length", "1000",
        "-log", "run2.log", "-trees", "run2.trees",
        "-load_state", "state.npz",
    ])
    assert rc == 0


def test_cli_unknown_command():
    assert main(["frobnicate"]) == 2


def test_cli_mc3_flags(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["run", STRICT_CLOCK, "-seed", "3", "-chain_length", "600",
               "-mc3_chains", "3", "-mc3_delta", "0.5",
               "-mc3_swap", "50", "-log", "mc3.log", "-overwrite"])
    assert rc == 0
    lines = (tmp_path / "mc3.log").read_text().strip().splitlines()
    assert len(lines) > 3  # header + rounds
