"""Config/builder integration tests: the declarative spec layer must
reproduce the minimal XML slice (testStrictClock-style analysis) and run
relaxed-clock / skygrid / partitioned variants end-to-end."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.config import spec as S
from beast_mcmc_tpu.config.builder import build
from beast_mcmc_tpu.apps.runner import run_analysis
from beast_mcmc_tpu.data.alignment import SitePatterns
from beast_mcmc_tpu.inference.checkpoint import load_checkpoint, save_checkpoint
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain

from fixtures import PRIMATE_NEWICK, primate_alignment, primate_patterns


def strict_clock_spec(chain_length=2000, log_every=20):
    return S.AnalysisSpec(
        partitions=[S.Partition(patterns=primate_patterns(),
                                substitution=S.HKY())],
        tree=S.TreeSpec(newick=PRIMATE_NEWICK),
        clock=S.StrictClock(rate=S.Param(1.0, estimate=False)),
        tree_prior=S.ConstantCoalescent(
            pop_size=S.Param(0.05, prior=S.OneOnXPrior())),
        mcmc=S.MCMCSpec(chain_length=chain_length, log_every=log_every, seed=5),
    )


def test_build_strict_clock():
    analysis = build(strict_clock_spec())
    assert "p1.kappa" in analysis.params0
    assert "constant.popSize" in analysis.params0
    lp = float(analysis.log_posterior(analysis.params0, analysis.tree0))
    assert np.isfinite(lp)
    # likelihood at kappa=29.739445 must match the golden HKY oracle
    params = dict(analysis.params0)
    params["p1.kappa"] = jnp.asarray(29.739445)
    ll = float(analysis.log_likelihood(params, analysis.tree0))
    np.testing.assert_allclose(ll, -1825.21317, atol=2e-5)


def test_run_analysis_end_to_end(tmp_path):
    log_f = str(tmp_path / "run.log")
    tree_f = str(tmp_path / "run.trees")
    ckpt_f = str(tmp_path / "run.ckpt")
    res = run_analysis(strict_clock_spec(), log_file=log_f, tree_file=tree_f,
                       checkpoint_file=ckpt_f, verbose=False)
    assert np.isfinite(res.samples["posterior"]).all()
    assert res.ess["posterior"] > 0
    # log file is Tracer-compatible
    lines = open(log_f).read().splitlines()
    header = [l for l in lines if l.startswith("state")][0]
    assert "posterior" in header and "p1.kappa" in header
    # tree log is NEXUS with trees
    trees_txt = open(tree_f).read()
    assert trees_txt.startswith("#NEXUS")
    assert "tree STATE_" in trees_txt and trees_txt.rstrip().endswith("End;")
    assert os.path.exists(ckpt_f + ".npz")


def test_checkpoint_roundtrip(tmp_path):
    """Checkpoint round-trip with logL re-check (the reference's
    checkpoint CI job, SURVEY.md §4.4)."""
    analysis = build(strict_clock_spec(chain_length=300, log_every=50))
    import jax

    step = make_mcmc_step(analysis.log_posterior, analysis.operators)
    state = init_mcmc_state(analysis.params0, analysis.tree0,
                            jax.random.PRNGKey(0), analysis.operators,
                            analysis.log_posterior)
    state, _ = jax.jit(lambda s: run_chain(step, s, 300))(state)
    path = str(tmp_path / "chk")
    save_checkpoint(path, state)
    template = init_mcmc_state(analysis.params0, analysis.tree0,
                               jax.random.PRNGKey(9), analysis.operators,
                               analysis.log_posterior)
    restored = load_checkpoint(path, template, analysis.log_posterior,
                               tolerance=1e-6)
    assert int(restored.step) == 300
    np.testing.assert_allclose(np.asarray(restored.tree.heights),
                               np.asarray(state.tree.heights))
    np.testing.assert_allclose(float(restored.log_posterior),
                               float(state.log_posterior))
    # resumed chain continues fine
    restored, _ = jax.jit(lambda s: run_chain(step, s, 100))(restored)
    assert int(restored.step) == 400


def test_relaxed_clock_and_gamma_builds():
    spec = strict_clock_spec(chain_length=400, log_every=40)
    spec.partitions[0].site_model = S.SiteModel(
        categories=4, alpha=S.Param(0.5, prior=S.ExponentialPrior(0.5)))
    spec.clock = S.RelaxedClockLognormal(
        mean=S.Param(1.0, estimate=False),
        stdev=S.Param(0.3, prior=S.ExponentialPrior(1.0 / 3.0)))
    res = run_analysis(spec, verbose=False)
    assert np.isfinite(res.samples["posterior"]).all()
    assert "ucld.stdev" in res.samples


def test_skygrid_and_gtr_builds():
    spec = S.AnalysisSpec(
        partitions=[S.Partition(patterns=primate_patterns(),
                                substitution=S.GTR())],
        tree=S.TreeSpec(newick=PRIMATE_NEWICK),
        clock=S.StrictClock(rate=S.Param(1.0, estimate=False)),
        tree_prior=S.SkygridCoalescent(n_cells=8, cutoff=0.12),
        mcmc=S.MCMCSpec(chain_length=400, log_every=40, seed=3),
    )
    res = run_analysis(spec, verbose=False)
    assert np.isfinite(res.samples["posterior"]).all()


def test_partitioned_codon_positions():
    """benchmark1-style: 3 codon-position partitions sharing tree+clock
    (ref: examples/Benchmarks/benchmark1.xml)."""
    aln = primate_alignment()
    parts = [
        S.Partition(
            patterns=SitePatterns.from_alignment(aln, site_range=(i, -1), every=3),
            substitution=S.HKY(), name=f"cp{i + 1}")
        for i in range(3)
    ]
    spec = S.AnalysisSpec(
        partitions=parts,
        tree=S.TreeSpec(newick=PRIMATE_NEWICK),
        clock=S.StrictClock(rate=S.Param(1.0, estimate=False)),
        tree_prior=S.ConstantCoalescent(pop_size=S.Param(0.05)),
        mcmc=S.MCMCSpec(chain_length=300, log_every=30),
    )
    analysis = build(spec)
    assert {f"cp{i}.kappa" for i in (1, 2, 3)} <= set(analysis.params0)
    res = run_analysis(spec, verbose=False)
    assert np.isfinite(res.samples["posterior"]).all()


def test_bssvs_discrete_trait():
    """Discrete-trait CTMC with BSSVS indicators (phylogeography core,
    ref: SVSGeneralSubstitutionModel.java) over a 4-state trait."""
    from beast_mcmc_tpu.data.datatype import general_datatype
    from beast_mcmc_tpu.data.alignment import Alignment

    dt = general_datatype(["A", "B", "C", "D"])
    taxa = [f"t{i}" for i in range(6)]
    traits = ["A", "B", "C", "D", "A", "B"]
    aln = Alignment.from_sequences(taxa, traits, dt)
    pats = SitePatterns.from_alignment(aln)
    spec = S.AnalysisSpec(
        partitions=[S.Partition(
            patterns=pats,
            substitution=S.GeneralReversible(n_states=4, bssvs=True))],
        tree=S.TreeSpec(seed=2),
        clock=S.StrictClock(rate=S.Param(1.0, prior=S.CTMCScalePrior())),
        tree_prior=S.ConstantCoalescent(),
        mcmc=S.MCMCSpec(chain_length=400, log_every=40),
    )
    analysis = build(spec)
    assert "p1.indicators" in analysis.params0
    res = run_analysis(spec, verbose=False)
    assert np.isfinite(res.samples["posterior"]).all()
    ind = np.asarray(res.state.params["p1.indicators"])
    assert set(np.unique(ind)) <= {0, 1}
