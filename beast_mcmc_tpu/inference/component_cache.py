"""Component-cached posterior evaluation — the dirty-flag model graph.

The reference tracks model-listener dirty flags (ref: AbstractModel /
CompoundLikelihood.java — only likelihoods downstream of a changed
parameter recompute). The TPU-native equivalent: the posterior is a SUM
of component log-densities carried in the chain state; each operator's
jitted branch recomputes only the components whose inputs it can touch
and reuses the cached values for the rest. Dependencies are extracted
EXACTLY by slicing each component's jaxpr — no hand-maintained listener
lists.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Set

import jax
import jax.numpy as jnp

COMP_KEY = "__comp_cache__"


@dataclasses.dataclass
class Component:
    """One posterior addend with its exact input set."""

    fn: Callable  # (params, tree) -> scalar log density
    name: str = ""
    deps: Optional[Set[str]] = None  # param keys used; None = unknown
    uses_tree: bool = True


def _used_invar_mask(closed_jaxpr):
    """Backward slice: which jaxpr invars can reach an output."""
    jaxpr = closed_jaxpr.jaxpr
    needed = set()
    for v in jaxpr.outvars:
        if not hasattr(v, "val"):  # skip Literals
            needed.add(v)
    for eqn in reversed(jaxpr.eqns):
        if any(ov in needed for ov in eqn.outvars):
            for iv in eqn.invars:
                if not hasattr(iv, "val"):
                    needed.add(iv)
    return [v in needed for v in jaxpr.invars]


def trace_deps(fn, params, tree):
    """(set of params keys used, uses_tree) for fn(params, tree).

    Exact at the jaxpr level (conservative through nested call eqns:
    a call that feeds an output is assumed to use all its operands)."""
    keys = sorted(params.keys())
    leaf_key = []  # top-level dict key per flattened leaf
    pvals = []
    for k in keys:
        leaves = jax.tree_util.tree_leaves(params[k])
        pvals.extend(leaves)
        leaf_key.extend([k] * len(leaves))
    tleaves, tdef = jax.tree_util.tree_flatten(tree)

    def wrapped(pv, tl):
        p = {}
        off = 0
        for k in keys:
            n = sum(1 for kk in leaf_key if kk == k)
            chunk = pv[off:off + n]
            off += n
            template = params[k]
            p[k] = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template), chunk)
        t = jax.tree_util.tree_unflatten(tdef, tl)
        return fn(p, t)

    cj = jax.make_jaxpr(wrapped)(pvals, tleaves)
    used = _used_invar_mask(cj)
    n_p = len(pvals)
    used_params = {k for k, u in zip(leaf_key, used[:n_p]) if u}
    uses_tree = any(used[n_p:])
    return used_params, uses_tree


def make_components(likelihood_fns, params, tree) -> list:
    """Trace each (fn, name) pair into a Component with exact deps."""
    out = []
    for fn, name in likelihood_fns:
        try:
            deps, uses_tree = trace_deps(fn, params, tree)
        except Exception:
            deps, uses_tree = None, True  # unknown: always recompute
        out.append(Component(fn, name, deps, uses_tree))
    return out


def decompose_likelihood(lik) -> list:
    """Flatten a compound LikelihoodFn (config.interpreter attaches
    `.parts` to posterior/prior/likelihood/joint sums) into leaves."""
    parts = getattr(lik, "parts", None)
    if not parts:
        return [lik]
    out = []
    for p in parts:
        out.extend(decompose_likelihood(p))
    return out


def seed_components(params, tree, components, dtype=None):
    """Add the [C] cached component-value vector to the params dict."""
    from beast_mcmc_tpu.utils.accum import accum_dtype

    dt = dtype or accum_dtype()
    # seeded UNDER JIT: compiled evaluation is bitwise-reproducible
    # against the in-graph branch refreshes, so the carried component sum
    # matches a fresh recompute exactly even in pure-f32 deployments
    # (same policy as init_mcmc_state's derived seeding)
    vals = jax.jit(lambda p, t: jnp.stack(
        [jnp.asarray(c.fn(p, t), dt) for c in components]))(params, tree)
    return {**params, COMP_KEY: vals}


def component_lp_fn(components):
    """log-posterior that TRUSTS the cache (branches refresh it)."""

    def lp(params, tree):
        return jnp.sum(params[COMP_KEY])

    return lp


def full_lp_fn(components):
    """The cache-free posterior (for HMC internals / self-checks)."""

    def lp(params, tree):
        tot = 0.0
        for c in components:
            tot = tot + c.fn(params, tree)
        return tot

    return lp


def affected_indices(components: Sequence[Component], op,
                     op_is_tree: bool) -> list:
    """Static component index list an operator's proposal can change."""
    mod = op.modified_params()
    if mod is None and not hasattr(op, "parameter"):
        pass
    if mod is None:
        return list(range(len(components)))
    mod = set(mod)
    out = []
    for i, c in enumerate(components):
        if c.deps is None or (c.deps & mod) or (c.uses_tree and op_is_tree):
            out.append(i)
    return out


def refresh_components(params, tree, components, idxs):
    """Recompute the given component indices into the cache vector."""
    if not idxs:
        return params
    cache = params[COMP_KEY]
    dt = cache.dtype
    new = [jnp.asarray(components[i].fn(params, tree), dt) for i in idxs]
    cache = cache.at[jnp.asarray(idxs)].set(jnp.stack(new))
    return {**params, COMP_KEY: cache}
