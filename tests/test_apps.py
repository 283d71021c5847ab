"""Post-processing tool tests: loganalyser, logcombiner, treeannotator."""

import numpy as np

from beast_mcmc_tpu.apps.loganalyser import analyze_log, read_log, report
from beast_mcmc_tpu.apps.logcombiner import combine_logs
from beast_mcmc_tpu.apps.treeannotator import (
    TreeSample,
    annotated_newick,
    hpd_interval,
    read_trees_file,
    summarize_trees,
)
from beast_mcmc_tpu.tree.topology import parse_newick


def make_log(tmp_path, name, n=100, seed=0):
    rng = np.random.default_rng(seed)
    lines = ["state\tposterior\tkappa"]
    for i in range(n):
        lines.append(f"{i * 10}\t{-1000 + rng.normal():.6f}\t{2 + rng.normal() * 0.1:.6f}")
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_loganalyser(tmp_path):
    p = make_log(tmp_path, "a.log")
    states, cols = read_log(p)
    assert len(states) == 100 and "kappa" in cols
    stats = analyze_log(p, burnin_fraction=0.1)
    assert abs(stats["kappa"].mean - 2.0) < 0.05
    assert "ESS" in report(p)


def test_logcombiner(tmp_path):
    p1 = make_log(tmp_path, "a.log", seed=1)
    p2 = make_log(tmp_path, "b.log", seed=2)
    txt = combine_logs([p1, p2], burnin=200)
    lines = txt.strip().splitlines()
    # each log: 100 rows, states 0..990; burnin>=200 keeps 80 each
    assert len(lines) == 1 + 160
    states = [int(l.split("\t")[0]) for l in lines[1:]]
    assert states == sorted(states)  # renumbered contiguous
    assert states[1] - states[0] == 10


def test_hpd():
    x = np.random.default_rng(0).normal(size=20000)
    lo, hi = hpd_interval(x, 0.95)
    assert abs(lo + 1.96) < 0.08 and abs(hi - 1.96) < 0.08


def _sample(newick, taxa):
    parent, children, heights, root, t = parse_newick(newick, taxa=taxa)
    return TreeSample(parent, children, heights, int(root), list(t))


def test_treeannotator_mcc():
    taxa = ["a", "b", "c", "d"]
    # 7x topology ((a,b),(c,d)), 3x ((a,c),(b,d))
    t1 = "((a:1,b:1):1,(c:1,d:1):1);"
    t2 = "((a:1,c:1):1,(b:1,d:1):1);"
    trees = [_sample(t1, taxa)] * 7 + [_sample(t2, taxa)] * 3
    mcc, support, ann = summarize_trees(trees, burnin_fraction=0.0)
    # MCC must be the majority topology
    clade_ab = (1 << 0) | (1 << 1)
    assert support[clade_ab] == 0.7
    nwk = annotated_newick(mcc, ann)
    assert "posterior=" in nwk and "height_95%_HPD" in nwk
    # mcc contains clade (a,b)
    masks = set()
    for node in range(4, 7):
        c0, c1 = mcc.children[node]
        pass
    assert "((a" in nwk.replace(" ", "") or "(a" in nwk


def test_treeannotator_on_run_output(tmp_path):
    """Full pipeline: run a short analysis, annotate its tree log."""
    from beast_mcmc_tpu.apps.runner import run_analysis
    import test_config

    spec = test_config.strict_clock_spec(chain_length=600, log_every=30)
    tree_f = str(tmp_path / "x.trees")
    run_analysis(spec, tree_file=tree_f, verbose=False)
    trees = read_trees_file(tree_f)
    assert len(trees) == 20
    mcc, support, ann = summarize_trees(trees, burnin_fraction=0.2)
    nwk = annotated_newick(mcc, ann)
    assert nwk.count("posterior=") == 5  # 5 internal nodes for 6 taxa


def test_profiler_times_operators():
    """mcmcprof analog (ref: MarkovChain.java:255-275): per-operator
    timing rows + combined states/hour estimate."""
    import jax

    from beast_mcmc_tpu.apps.benchmarks import build_analysis
    from beast_mcmc_tpu.apps.profiler import profile_operators, profile_report

    log_post, operators, params0, tree0, _ = build_analysis(
        n_taxa=6, n_patterns=16, model="hky")
    prof = profile_operators(
        log_post, operators[:3], params0, tree0,
        key=jax.random.PRNGKey(1), n_steps=50)
    assert len(prof["rows"]) == 3
    assert all(r["steps_per_sec"] > 0 for r in prof["rows"])
    assert prof["states_per_hour"] > 0
    rep = profile_report(prof)
    assert "states/hour" in rep and "us/step" in rep
