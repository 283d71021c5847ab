"""Per-operator timing profiler — the mcmcprof / `-Dmcmc.evaluation.count`
role (ref: src/dr/inference/markovchain/MarkovChain.java:255-275, which
accumulates per-operator evaluation wall time into the operator analysis;
and the standalone mcmcprof tool).

Design note: inside one fused jitted chain the per-operator cost cannot be
observed from the host, so each operator is profiled as its own jitted
single-operator chain segment (same posterior, same state) — warm-up
compile excluded, steps timed with block_until_ready. The combined
schedule estimate weighs each operator's measured rate by its schedule
probability, giving the states/hour column BEAST logs (MCLogger.java:60).
"""

from __future__ import annotations

import time
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)


def profile_operators(
    log_post,
    operators: Sequence,
    params0: Dict,
    tree0,
    key=None,
    n_steps: int = 200,
    derived=None,
) -> Dict:
    """Time each operator's full MH step (propose + posterior + accept).

    Returns {"rows": [{name, weight, steps_per_sec, us_per_step}, ...],
             "states_per_hour": combined-schedule estimate}.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    rows = []
    weights = [float(getattr(op, "weight", 1.0)) for op in operators]
    wsum = sum(weights) or 1.0
    inv_rate_weighted = 0.0
    for op, w in zip(operators, weights):
        step = make_mcmc_step(log_post, [op], derived=derived)
        state = init_mcmc_state(params0, tree0, key, [op], log_post)
        runner = jax.jit(lambda s: run_chain(step, s, n_steps))
        out, _ = runner(state)  # compile + warm
        jax.block_until_ready(out.log_posterior)
        t0 = time.perf_counter()
        out, _ = runner(state)
        jax.block_until_ready(out.log_posterior)
        dt = time.perf_counter() - t0
        rate = n_steps / dt
        rows.append({
            "name": f"{type(op).__name__}({getattr(op, 'parameter', '') or ''})",
            "weight": w,
            "steps_per_sec": rate,
            "us_per_step": 1e6 * dt / n_steps,
        })
        inv_rate_weighted += (w / wsum) / rate
    combined = 1.0 / inv_rate_weighted if inv_rate_weighted > 0 else 0.0
    return {"rows": rows, "states_per_hour": combined * 3600.0}


def profile_report(profile: Dict) -> str:
    """Render the timing table (the reference's operator analysis 'Time'
    column, OperatorAnalysisPrinter.java)."""
    lines = [
        "operator                          weight  steps/sec   us/step",
    ]
    for r in profile["rows"]:
        lines.append(
            f"{r['name']:<32}  {r['weight']:<6.1f}  "
            f"{r['steps_per_sec']:<10.1f}  {r['us_per_step']:<9.1f}"
        )
    lines.append(
        f"combined schedule estimate: "
        f"{profile['states_per_hour']:.0f} states/hour")
    return "\n".join(lines)
