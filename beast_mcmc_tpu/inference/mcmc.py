"""The Metropolis-Hastings chain kernel — fully inside jit.

Redesign of the reference's hot loop (ref: MarkovChain.runChain,
src/dr/inference/markovchain/MarkovChain.java:125-475; MCMC.java:143-202):

  reference                                  here
  ---------                                  ----
  weighted operator draw (SimpleOperator     categorical draw from the
    Schedule.java:96-126)                      static weight vector
  storeModelState / restoreModelState        functional state: reject =
    (AbstractModel.java:252-326)               keep the old pytree
  op.operate() + listener dirty propagation  lax.switch over operator fns
  acceptance logr = (new-old)*T + hastings   identical
    (MCMCCriterion.java:64-71)
  Robbins-Monro adaptation p += (acc-tgt)/   identical (log schedule,
    log(count+2) (MarkovChain.java:559-590,     acceptance capped at 1)
    OperatorSchedule DEFAULT_TRANSFORM=LOG)
  NaN score diagnosed then treated as -inf   jnp.isnan -> -inf
    (MarkovChain.java:305-334)

The whole chain (steps x {draw, propose, evaluate, accept, adapt}) is one
lax.scan; multi-chain / MC3 is a vmap of this kernel over state batches.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.operators import Operator
from beast_mcmc_tpu.inference.state import MCMCState, init_state
from beast_mcmc_tpu.tree.topology import TreeState

LogPosteriorFn = Callable[[Dict, TreeState], jnp.ndarray]


def _derive_isolated(fn, params):
    """Evaluate a derived-cache entry behind optimization barriers.

    The carried-vs-fresh full-evaluation self-check (ref tolerance 0.1,
    MarkovChain.java:55) requires the refreshed cache to be BITWISE
    reproducible wherever it is recomputed: a 1-ulp f32 reassociation in
    the eigendecomposition amplifies through |logL| ~ 3e6 to O(1) log
    units. Barriers on the inputs and outputs pin the derivation to an
    isolated subgraph that XLA compiles identically inside an operator's
    lax.switch branch, the jit seed, and the self-check's recompute."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    f_leaves = [x for x in leaves if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.inexact)]
    if f_leaves:
        barred = jax.lax.optimization_barrier(tuple(f_leaves))
        it = iter(barred)
        leaves = [next(it) if (hasattr(x, "dtype")
                               and jnp.issubdtype(x.dtype, jnp.inexact))
                  else x for x in leaves]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
    out = fn(params)
    return jax.tree_util.tree_map(jax.lax.optimization_barrier, out)


def apply_derived(derived, params: Dict) -> Dict:
    """Recompute every derived (cached) entry from the raw parameters.
    `derived`: {name: (fn(params) -> value, depends_on_param_names)}."""
    for name, (fn, _) in derived.items():
        params = {**params, name: _derive_isolated(fn, params)}
    return params


def make_mcmc_step(
    log_posterior: LogPosteriorFn,
    operators: Sequence[Operator],
    adaptation: bool = True,
    adaptation_delay: int = 0,
    derived: Optional[Dict] = None,
    post_update=None,
    components=None,
    op_tree_flags=None,
):
    """Build `step(state, temperature=1.0) -> state` (jit-safe).

    derived: optional {name: (fn(params) -> value, depends)} cache of
    expensive parameter-derived quantities (e.g. the substitution-model
    eigendecomposition). The functional analog of the reference's
    dirty-flag model graph (ref: AbstractModel listener DAG,
    SURVEY.md §7.1 "keep ONE incrementality trick"): each operator branch
    recomputes only the derived entries whose dependencies intersect the
    operator's `modified_params()` — a tree move never pays for the eigen
    rebuild. Entries must already be present in `params`
    (see `apply_derived` / `init_mcmc_state(derived=...)`), and may only
    depend on params, never on the tree. Operators that internally
    evaluate the bound log-posterior (HMC/NUTS) must not target params a
    derived entry depends on — the in-proposal evaluations would see the
    stale cache (the full_evaluation_check catches violations).

    post_update: optional params -> params hook applied to the
    POST-accept/reject state every step — the home of in-chain adaptation
    statistics such as the AVMVN running covariance
    (samplers.make_post_update; ref:
    AdaptableVarianceMultivariateNormalOperator.java:59).

    components: optional list of inference.component_cache.Component —
    the posterior as a SUM of cached component log-densities (the
    reference's CompoundLikelihood dirty-flag role). Each operator's
    branch recomputes only the components whose jaxpr-sliced input sets
    intersect the operator's targets (op_tree_flags[i] says whether
    operator i can move the tree); the step's acceptance uses the cached
    sum. params must be seeded with seed_components() first, and
    `log_posterior` should remain the cache-free posterior (HMC
    internals bind it).
    """
    for op in operators:
        if hasattr(op, "bind_log_posterior"):
            op.bind_log_posterior(log_posterior)
    weights = jnp.asarray([op.weight for op in operators])
    log_probs = jnp.log(weights / weights.sum())
    adaptable = jnp.asarray([op.adaptable for op in operators])
    targets = jnp.asarray([op.target_acceptance for op in operators])

    if components is not None:
        # component refresh runs as a SECOND switch over the DISTINCT
        # affected-index sets (not per operator) so each expensive
        # likelihood graph is compiled once per set, not once per
        # operator — 27-operator schedules compile in seconds instead
        # of tens of minutes
        from beast_mcmc_tpu.inference.component_cache import (
            COMP_KEY,
            affected_indices,
            refresh_components,
        )

        sets = []
        group_of_op = []
        for i, op in enumerate(operators):
            tree_flag = (op_tree_flags[i]
                         if op_tree_flags is not None else True)
            idxs = tuple(affected_indices(components, op, tree_flag))
            if idxs not in sets:
                sets.append(idxs)
            group_of_op.append(sets.index(idxs))
        group_of_op = jnp.asarray(group_of_op, jnp.int32)

        def _mk_comp_branch(idxs):
            def f(p, t):
                return refresh_components(p, t, components, list(idxs))

            return f

        comp_branches = [_mk_comp_branch(idxs) for idxs in sets]

    def make_branch(op: Operator, op_pos: int):
        if derived:
            mod = op.modified_params()
            stale = [
                name for name, (_, deps) in derived.items()
                if mod is None or (set(deps) & set(mod))
            ]
        else:
            stale = []
        def branch(params, tree, key, adapt_vec, op_idx):
            tuning = op.tuning(adapt_vec[op_idx])
            out = op.propose(params, tree, key, tuning)
            if len(out) == 3:
                # no internal acceptance statistic: adapt on the outer
                # Metropolis ratio (NaN sentinel)
                p, t, logh = out
                out = (p, t, logh, jnp.asarray(jnp.nan, tree.heights.dtype))
            if stale:
                p, t, logh, acc = out
                for name in stale:
                    p = {**p, name: _derive_isolated(derived[name][0], p)}
                out = (p, t, logh, acc)
            # dtype-preservation guarantee: proposals must not promote
            # state leaves (under x64 a Python-float constant inside an
            # operator would silently lift f32 params/heights to f64 and
            # break the switch/scan carry); no-op casts are elided by XLA
            p, t, logh, acc = out
            p = jax.tree_util.tree_map(
                lambda n, o: n.astype(o.dtype), p, params)
            t = jax.tree_util.tree_map(
                lambda n, o: n.astype(o.dtype), t, tree)
            dt = tree.heights.dtype
            return (p, t, jnp.asarray(logh, dt).astype(dt),
                    jnp.asarray(acc, dt).astype(dt))

        return branch

    branches = [make_branch(op, i) for i, op in enumerate(operators)]

    def step_given_op(state: MCMCState, op_idx, temperature=1.0
                      ) -> MCMCState:
        """One MH step with the OPERATOR INDEX supplied externally.

        Chain-batched runners draw ONE op_idx per step and vmap this
        function over the chain axis: with an unbatched switch index,
        vmap executes exactly one operator branch (vectorized over
        chains) instead of selecting across all of them — the 9-branch
        blowup that capped the round-3 multichain scaling."""
        key, k_prop, k_acc = jax.random.split(state.key, 3)
        return _step_core(state, op_idx, key, k_prop, k_acc, temperature)

    def step(state: MCMCState, temperature=1.0) -> MCMCState:
        key, k_op, k_prop, k_acc = jax.random.split(state.key, 4)
        op_idx = jax.random.categorical(k_op, log_probs)
        return _step_core(state, op_idx, key, k_prop, k_acc, temperature)

    def _step_core(state, op_idx, key, k_prop, k_acc, temperature):
        new_params, new_tree, log_hastings, acc_stat = jax.lax.switch(
            op_idx, branches, state.params, state.tree, k_prop,
            state.op_adapt, op_idx,
        )

        # carried in the accumulation dtype (f64 under x64) so the chain
        # scalar does not quantize at the f32 ulp of a large |logL|
        # (ref self-check contract: MarkovChain.java:55)
        from beast_mcmc_tpu.utils.accum import accum_dtype

        if components is not None:
            new_params = jax.lax.switch(
                group_of_op[op_idx], comp_branches, new_params, new_tree)
            new_lp = jnp.sum(new_params[COMP_KEY])
        else:
            new_lp = log_posterior(new_params, new_tree)
        new_lp = jnp.asarray(new_lp, accum_dtype())
        new_lp = jnp.where(jnp.isnan(new_lp), -jnp.inf, new_lp)

        # MCMCCriterion.java:64-71 (temperature = 1/(1+dT k) for MC3 chains)
        logr = (new_lp - state.log_posterior) * temperature + log_hastings
        # first evaluation: old lp is -inf -> always accept a finite proposal
        logr = jnp.where(
            jnp.isneginf(state.log_posterior) & jnp.isfinite(new_lp),
            jnp.inf,
            logr,
        )
        u = jax.random.uniform(k_acc, dtype=state.log_posterior.dtype)
        accept = jnp.log(u) < logr

        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(accept, x, y), a, b
        )
        params = sel(new_params, state.params)
        tree = sel(new_tree, state.tree)
        lp = jnp.where(accept, new_lp, state.log_posterior)
        if post_update is not None:
            params = post_update(params)

        # operator stats + Robbins-Monro adaptation. Gibbs-style operators
        # (NUTS) supply their own internal acceptance statistic via
        # acc_stat; NaN means "use the outer Metropolis ratio".
        acc_prob = jnp.exp(jnp.minimum(logr, 0.0))
        acc_prob = jnp.where(jnp.isnan(acc_prob), 0.0, acc_prob)
        acc_prob = jnp.where(jnp.isnan(acc_stat), acc_prob, acc_stat)
        op_accept = state.op_accept.at[op_idx].add(accept.astype(jnp.int32))
        op_reject = state.op_reject.at[op_idx].add(1 - accept.astype(jnp.int32))
        op_sum_accept = state.op_sum_accept.at[op_idx].add(
            acc_prob.astype(state.op_sum_accept.dtype))

        do_adapt = (
            adaptable[op_idx]
            & jnp.asarray(adaptation)
            & (state.step >= adaptation_delay)
        )
        count = state.op_adapt_count[op_idx]
        adt = state.op_adapt.dtype
        denom = jnp.log(count.astype(adt) + 2.0)
        delta = (acc_prob.astype(adt) - targets[op_idx].astype(adt)) / denom
        op_adapt = state.op_adapt.at[op_idx].add(
            jnp.where(do_adapt, delta, 0.0)
        )
        op_adapt_count = state.op_adapt_count.at[op_idx].add(
            do_adapt.astype(jnp.int32)
        )

        return state.replace(
            params=params,
            tree=tree,
            log_posterior=lp,
            key=key,
            step=state.step + 1,
            op_adapt=op_adapt,
            op_adapt_count=op_adapt_count,
            op_accept=op_accept,
            op_reject=op_reject,
            op_sum_accept=op_sum_accept,
        )

    step.given_op = step_given_op
    step.log_probs = log_probs
    return step


def make_multichain_step(log_posterior, operators, derived=None,
                         adaptation: bool = True):
    """Chain-batched MH step: ONE operator drawn per step for ALL chains
    (each chain keeps its own proposal/acceptance randomness).

    The composite kernel applies the same randomly-chosen operator
    component to every coordinate of the product state; each component
    kernel leaves the product distribution invariant, so the mixture
    does too — chains are correlated only through the schedule. The
    payoff on TPU: the operator switch stays SCALAR under vmap, so one
    branch executes, vectorized across the chain axis, and the
    per-step machinery cost (~0.25 ms on v5e at benchmark2 shape)
    amortizes across all chains instead of multiplying.

    Returns step(states, key, temperatures) over vmapped MCMCState."""
    step = make_mcmc_step(log_posterior, operators, derived=derived,
                          adaptation=adaptation)

    def mstep(states: MCMCState, key, temperatures=1.0) -> MCMCState:
        op_idx = jax.random.categorical(key, step.log_probs)
        in_t = 0 if jnp.ndim(temperatures) else None
        return jax.vmap(step.given_op, in_axes=(0, None, in_t))(
            states, op_idx, temperatures)

    return mstep


def init_mcmc_state(
    params: Dict,
    tree: TreeState,
    key,
    operators: Sequence[Operator],
    log_posterior: Optional[LogPosteriorFn] = None,
    dtype=None,
    derived: Optional[Dict] = None,
) -> MCMCState:
    import beast_mcmc_tpu.utils.dtypes as dtypes

    dtype = dtype or dtypes.default_float()
    for op in operators:
        if hasattr(op, "init_stats") and op.stats_key not in params:
            params = op.init_stats(params)
    if derived:
        # seed UNDER JIT: the compiled derivation is bitwise-reproducible
        # across fusion contexts (measured: step-branch refresh, the
        # full-evaluation recompute and this seed all agree exactly),
        # whereas an eager op-by-op seed differs at the f32 ulp — which
        # the |logL|-scale carried-vs-fresh self-check amplifies to O(1)
        params = jax.jit(lambda p: apply_derived(derived, p))(params)
    init_adapt = jnp.asarray([op.initial_adapt() for op in operators], dtype)
    state = init_state(params, tree, key, len(operators), init_adapt, dtype)
    if log_posterior is not None:
        from beast_mcmc_tpu.utils.accum import accum_dtype

        # anchored UNDER JIT: the chain's initial carried posterior must
        # be bitwise-identical to an in-graph recompute (an eager eval
        # differs at the f32 ulp, which |logL| amplifies past the 0.1
        # full-evaluation tolerance before the first accepted step)
        lp = jax.jit(log_posterior)(state.params, state.tree)
        state = state.replace(log_posterior=jnp.asarray(lp, accum_dtype()))
    return state


def run_chain(
    step_fn,
    state: MCMCState,
    n_steps: int,
    collect_every: int = 0,
    collector: Optional[Callable[[MCMCState], Dict]] = None,
    temperature=1.0,
):
    """Run the chain under one jit. With collect_every > 0, returns
    (final_state, stacked collector outputs) — the in-memory role of the
    reference's MCLogger columns (MCLogger.java:45-100)."""
    if collect_every and collector:
        n_blocks = n_steps // collect_every

        def block(state, _):
            def inner(_, s):
                return step_fn(s, temperature)

            state = jax.lax.fori_loop(0, collect_every, inner, state)
            return state, collector(state)

        return jax.lax.scan(block, state, None, length=n_blocks)

    def inner(_, s):
        return step_fn(s, temperature)

    return jax.lax.fori_loop(0, n_steps, inner, state), None


def full_evaluation_check(
    step_fn,
    log_posterior: LogPosteriorFn,
    state: MCMCState,
    n_steps: int = 100,
    temperature=1.0,
    derived: Optional[Dict] = None,
):
    """In-chain correctness sanitizer — the reference's full-evaluation
    self-test (ref: MarkovChain.java:336-373 post-accept, :408-440
    post-restore: for the first fullEvaluationCount states the posterior is
    recomputed from scratch and compared to the incrementally maintained
    value within evaluationTestThreshold=0.1).

    Here the carried `state.log_posterior` (threaded through accept/reject
    selects and any incremental likelihood path) is checked against a fresh
    evaluation after every step.  Returns (state, max_abs_deviation); the
    carried value is re-anchored to the fresh one each step, so a run
    started through this wrapper also cannot accumulate select-chain
    drift.  Jit-safe: callers wrap in jit and assert on the device scalar.
    """

    def body(s, _):
        s = step_fn(s, temperature)
        # a truly from-scratch evaluation also rebuilds any derived cache
        # (so a stale eigendecomposition etc. IS caught, not reused)
        p = apply_derived(derived, s.params) if derived else s.params
        fresh = jnp.asarray(
            log_posterior(p, s.tree), s.log_posterior.dtype)
        dev = jnp.abs(fresh - s.log_posterior)
        return s.replace(params=p, log_posterior=fresh), dev

    state, devs = jax.lax.scan(body, state, None, length=n_steps)
    return state, jnp.max(devs)


def operator_report(operators: Sequence[Operator], state: MCMCState) -> str:
    """End-of-run operator analysis table (ref:
    OperatorAnalysisPrinter.java, MCMC.java:274-281)."""
    lines = ["operator                          weight  accepted  rejected  acc%    tuning"]
    for i, op in enumerate(operators):
        acc = int(state.op_accept[i])
        rej = int(state.op_reject[i])
        total = max(acc + rej, 1)
        tuning = op.tuning(state.op_adapt[i])
        tstr = f"{float(tuning):.4f}" if tuning is not None else "-"
        name = f"{type(op).__name__}({getattr(op, 'parameter', '')})"
        lines.append(
            f"{name:<32}  {op.weight:<6.1f}  {acc:<8d}  {rej:<8d}  "
            f"{100.0 * acc / total:<5.1f}  {tstr}"
        )
    return "\n".join(lines)
