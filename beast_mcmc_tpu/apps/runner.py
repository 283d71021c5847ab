"""Analysis runner: spec -> chain -> log files (the BeastMain + MCMC role,
ref: src/dr/app/beast/BeastMain.java:370, src/dr/inference/mcmc/MCMC.java:
143-202 — run the chain, write the tab log and NEXUS tree log, print the
operator analysis, save/load checkpoints)."""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.config.builder import Analysis, build
from beast_mcmc_tpu.config.spec import AnalysisSpec
from beast_mcmc_tpu.inference.checkpoint import load_checkpoint, save_checkpoint
from beast_mcmc_tpu.inference.loggers import NexusTreeLogger, TabLogger
from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    operator_report,
    run_chain,
)
from beast_mcmc_tpu.inference.trace import analyze


@dataclasses.dataclass
class RunResult:
    state: object
    samples: Dict[str, np.ndarray]
    states: np.ndarray
    ess: Dict[str, float]
    states_per_sec: float
    report: str


def run_analysis(
    spec_or_analysis,
    log_file: Optional[str] = None,
    tree_file: Optional[str] = None,
    checkpoint_file: Optional[str] = None,
    load_state: Optional[str] = None,
    verbose: bool = True,
    mc3_chains: int = 1,
    mc3_delta: Optional[float] = None,
    mc3_temperatures: Optional[list] = None,
    mc3_swap: int = 100,
) -> RunResult:
    analysis = (spec_or_analysis if isinstance(spec_or_analysis, Analysis)
                else build(spec_or_analysis))
    mcmc = analysis.spec.mcmc
    log_every = mcmc.log_every
    n_steps = mcmc.chain_length
    tree_every = mcmc.tree_log_every or log_every

    if mc3_chains > 1:
        return _run_analysis_mc3(
            analysis, mc3_chains, mc3_delta, mc3_temperatures, mc3_swap,
            log_file=log_file, verbose=verbose,
        )

    step = make_mcmc_step(
        analysis.log_posterior, analysis.operators,
        adaptation=mcmc.adaptation, adaptation_delay=mcmc.adaptation_delay,
    )
    state = init_mcmc_state(
        analysis.params0, analysis.tree0, jax.random.PRNGKey(mcmc.seed),
        analysis.operators, analysis.log_posterior,
    )
    if load_state:
        state = load_checkpoint(load_state, state, analysis.log_posterior)
        if verbose:
            print(f"resumed from {load_state} at state {int(state.step)}",
                  file=sys.stderr)

    scalar_cols = [k for k, v in analysis.params0.items() if jnp.ndim(v) == 0]

    def collector(s):
        out = {
            "posterior": s.log_posterior,
            "treeModel.rootHeight": s.tree.heights[s.tree.root],
        }
        for k in scalar_cols:
            out[k] = s.params[k]
        out["__tree.heights"] = s.tree.heights
        out["__tree.parent"] = s.tree.parent
        out["__tree.children"] = s.tree.children
        out["__tree.root"] = s.tree.root
        out["__step"] = s.step
        return out

    runner = jax.jit(
        lambda s: run_chain(step, s, n_steps, collect_every=log_every,
                            collector=collector)
    )
    t0 = time.perf_counter()
    state, out = runner(state)
    jax.block_until_ready(state.log_posterior)
    elapsed = time.perf_counter() - t0
    sps = n_steps / elapsed

    out = {k: np.asarray(v) for k, v in out.items()}
    states = out.pop("__step")
    tree_parent = out.pop("__tree.parent")
    tree_children = out.pop("__tree.children")
    tree_heights = out.pop("__tree.heights")
    tree_root = out.pop("__tree.root")

    columns = [c for c in out.keys()]
    if log_file:
        with open(log_file, "w") as f:
            TabLogger(columns, f, title="beast_mcmc_tpu").log_batch(states, out)
    if tree_file:
        with open(tree_file, "w") as f:
            tl = NexusTreeLogger(analysis.taxa, f)
            stride = max(1, tree_every // log_every)
            tl.log_batch(states[::stride], tree_parent[::stride],
                         tree_children[::stride], tree_heights[::stride],
                         tree_root[::stride])
            tl.close()
    if checkpoint_file:
        save_checkpoint(checkpoint_file, state)

    n_burn = max(1, len(states) // 10)
    ess = {c: analyze(out[c][n_burn:], step_size=log_every).ess
           for c in columns}
    report = operator_report(analysis.operators, state)
    if verbose:
        print(f"{n_steps} states in {elapsed:.1f}s = {sps:.1f} states/sec",
              file=sys.stderr)
        print(report, file=sys.stderr)
    return RunResult(
        state=state, samples=out, states=states, ess=ess,
        states_per_sec=sps, report=report,
    )


def _run_analysis_mc3(analysis, n_chains, delta, temperatures, swap_every,
                      log_file=None, verbose=True) -> RunResult:
    """Metropolis-coupled run — the BeastMain -mc3_* surface (ref:
    BeastMain.java:436-440 + MCMCMC.java). Chains are one vmapped batch;
    the cold chain (slot 0) is logged once per swap round."""
    from beast_mcmc_tpu.inference.mc3 import (
        make_mc3_runner,
        mc3_temperatures,
        replicate_state,
    )

    mcmc = analysis.spec.mcmc
    n_steps = mcmc.chain_length
    n_rounds = max(1, n_steps // swap_every)

    explicit = (None if temperatures is None
                else ([1.0] + list(temperatures))[:n_chains])
    run, temps = make_mc3_runner(
        analysis.log_posterior, analysis.operators, n_chains,
        swap_every=swap_every,
        delta=(delta if delta is not None else 1.0),
        adaptation=mcmc.adaptation,
        temperatures=explicit,
    )

    state0 = init_mcmc_state(
        analysis.params0, analysis.tree0, jax.random.PRNGKey(mcmc.seed),
        analysis.operators, analysis.log_posterior,
    )
    states = replicate_state(state0, n_chains,
                             jax.random.PRNGKey(mcmc.seed + 1))
    scalar_cols = [k for k, v in analysis.params0.items()
                   if jnp.ndim(v) == 0]

    def collector(cold):
        out = {"posterior": cold.log_posterior,
               "treeModel.rootHeight": cold.tree.heights[cold.tree.root]}
        for k in scalar_cols:
            out[k] = cold.params[k]
        return out

    t0 = time.perf_counter()
    states, outputs = jax.jit(
        lambda s, k: run(s, k, n_rounds, collector)
    )(states, jax.random.PRNGKey(mcmc.seed + 2))
    jax.block_until_ready(states.log_posterior)
    elapsed = time.perf_counter() - t0
    sps = n_rounds * swap_every * n_chains / elapsed

    out = {k: np.asarray(v) for k, v in outputs.items()
           if not k.startswith("swap")}
    swap_rate = float(np.mean(np.asarray(outputs["swap_accepted"])))
    steps_axis = np.arange(1, n_rounds + 1) * swap_every
    columns = list(out.keys())
    if log_file:
        with open(log_file, "w") as f:
            TabLogger(columns, f, title="beast_mcmc_tpu mc3 cold chain"
                      ).log_batch(steps_axis, out)
    n_burn = max(1, n_rounds // 10)
    ess = {c: analyze(out[c][n_burn:], step_size=swap_every).ess
           for c in columns}
    report = (f"MC3: {n_chains} chains, temperatures "
              f"{[round(float(t), 4) for t in np.asarray(temps)]}, "
              f"swap every {swap_every}, swap acceptance {swap_rate:.3f}")
    if verbose:
        print(f"{n_rounds * swap_every} states x {n_chains} chains in "
              f"{elapsed:.1f}s = {sps:.1f} aggregate states/sec",
              file=sys.stderr)
        print(report, file=sys.stderr)
    cold = jax.tree_util.tree_map(lambda x: x[0], states)
    return RunResult(
        state=cold, samples=out, states=steps_axis, ess=ess,
        states_per_sec=sps, report=report,
    )
