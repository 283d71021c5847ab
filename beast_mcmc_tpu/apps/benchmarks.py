"""Benchmark analysis builders.

Synthesizes analyses with the SHAPE of the reference's benchmark configs
(ref: examples/Benchmarks/benchmark1.xml — 1441 taxa, 593 patterns, HKY,
strict clock, constant coalescent; benchmark2.xml — 62 taxa, 5565
patterns, GTR+Gamma). Sequence content is random with a fixed seed —
throughput depends on shapes, not nucleotides; we do not copy reference
data files.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step
from beast_mcmc_tpu.inference.operators import (
    TREE_HEIGHTS,
    NarrowExchangeOperator,
    RootHeightScaleOperator,
    ScaleOperator,
    UniformNodeHeightOperator,
    UpDownOperator,
    WideExchangeOperator,
    WilsonBaldingOperator,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.priors import lognormal_logpdf, one_on_x_logpdf
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates, single_rate
from beast_mcmc_tpu.models.substitution import gtr_eigen, hky_eigen
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.ops.peeling import pad_patterns
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree


def synthetic_tips(n_taxa: int, n_patterns: int, seed: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random unambiguous nucleotide tip partials [N, 4, P] + weights [P]."""
    rng = np.random.default_rng(seed)
    states = rng.integers(0, 4, size=(n_taxa, n_patterns))
    tips = np.zeros((n_taxa, 4, n_patterns), dtype)
    for s in range(4):
        tips[:, s, :] = states == s
    weights = rng.integers(1, 10, size=n_patterns).astype(dtype)
    return jnp.asarray(tips), jnp.asarray(weights)


def build_analysis(
    n_taxa: int = 62,
    n_patterns: int = 5565,
    model: str = "gtr_gamma",
    seed: int = 0,
    dtype=None,
    pad_multiple: int = 128,
    use_pallas=None,
):
    """Returns (log_post, operators, params0, tree0, aux dict).
    use_pallas: None = backend auto; False forces the XLA scan peel
    (required under vmap — multi-chain batches vectorize the scan)."""
    import beast_mcmc_tpu.utils.dtypes as dtypes

    dtype = dtype or dtypes.default_float()
    tips, weights = synthetic_tips(n_taxa, n_patterns, seed, np.float32)
    tips = tips.astype(dtype)
    weights = weights.astype(dtype)
    tips, weights = pad_patterns(tips, weights, pad_multiple)
    freqs = jnp.asarray([0.3, 0.2, 0.2, 0.3], dtype)

    rng = np.random.default_rng(seed + 1)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n_taxa), pop_size=0.5
    )
    tree0 = make_tree_state(parent, children, heights, root, dtype)

    derived = {}
    if model == "gtr_gamma":
        # derived-parameter cache for the hot path: the eigendecomposition
        # and gamma-category rates rebuild only in operator branches that
        # touch gtr.rates / alpha. Opt-in: pass aux["derived"] to
        # make_mcmc_step AND use aux["log_post_cached"]; the plain
        # log_post below stays self-contained (always recomputes).
        derived = {
            "eig": (lambda p: gtr_eigen(p["gtr.rates"], freqs), ("gtr.rates",)),
            "site.rates": (
                lambda p: discrete_gamma_rates(p["alpha"], 4, dtype=dtype),
                ("alpha",),
            ),
        }

        def log_lik(params, tree, cached: bool = False):
            if cached:
                eig = params["eig"]
                rates, cat_w = params["site.rates"]
            else:
                eig = gtr_eigen(params["gtr.rates"], freqs)
                rates, cat_w = discrete_gamma_rates(
                    params["alpha"], 4, dtype=dtype
                )
            return tree_loglikelihood(
                tips, weights, tree.parent, tree.children, tree.heights,
                tree.root, eig, freqs, rates, cat_w, params["clock.rate"],
                use_pallas=use_pallas,
            )

        params0 = {
            "gtr.rates": jnp.ones(6, dtype),
            "alpha": jnp.asarray(0.5, dtype),
            "clock.rate": jnp.asarray(1.0, dtype),
            "pop.size": jnp.asarray(0.5, dtype),
        }
        extra_ops = [
            ScaleOperator(parameter="gtr.rates", weight=2.0),
            ScaleOperator(parameter="alpha", weight=1.0),
        ]
    elif model == "hky_codon3":
        # benchmark1 shape (ref: examples/Benchmarks/benchmark1.xml —
        # HKY x 3 codon-position partitions, per-partition kappa + relative
        # rate, strict clock, constant coalescent). n_patterns is the
        # per-partition pattern count; partitions share the tree and clock.
        from beast_mcmc_tpu.models.treelikelihood import (
            multipartition_loglikelihood,
        )
        from beast_mcmc_tpu.inference.operators import DeltaExchangeOperator

        k_parts = 3
        tips3, weights3 = [], []
        for k in range(k_parts):
            tp, w = synthetic_tips(n_taxa, n_patterns, seed + 10 * k, np.float32)
            tp, w = pad_patterns(tp.astype(dtype), w.astype(dtype), pad_multiple)
            tips3.append(tp)
            weights3.append(w)
        tips = jnp.stack(tips3)  # [3, N, 4, P]
        weights = jnp.stack(weights3)  # [3, P]
        freqs3 = jnp.broadcast_to(freqs, (k_parts, 4))

        def log_lik(params, tree):
            eigs = jax.vmap(lambda kap, f: hky_eigen(kap, f))(
                params["kappa"], freqs3
            )
            base_rates, base_w = single_rate(dtype=dtype)
            cat_rates = params["mu"][:, None] * base_rates[None, :]
            cat_w = jnp.broadcast_to(base_w, (k_parts, 1))
            return multipartition_loglikelihood(
                tips, weights, tree.parent, tree.children, tree.heights,
                tree.root, eigs, freqs3, cat_rates, cat_w,
                params["clock.rate"], use_pallas=use_pallas,
            )

        params0 = {
            "kappa": jnp.full((k_parts,), 2.0, dtype),
            "mu": jnp.ones((k_parts,), dtype),
            "clock.rate": jnp.asarray(1.0, dtype),
            "pop.size": jnp.asarray(0.5, dtype),
        }
        extra_ops = [
            ScaleOperator(parameter="kappa", weight=3.0),
            DeltaExchangeOperator(parameter="mu", weight=3.0),
        ]
    elif model == "hky":
        def log_lik(params, tree):
            eig = hky_eigen(params["kappa"], freqs)
            rates, cat_w = single_rate(dtype=dtype)
            return tree_loglikelihood(
                tips, weights, tree.parent, tree.children, tree.heights,
                tree.root, eig, freqs, rates, cat_w, params["clock.rate"],
                use_pallas=use_pallas,
            )

        params0 = {
            "kappa": jnp.asarray(2.0, dtype),
            "clock.rate": jnp.asarray(1.0, dtype),
            "pop.size": jnp.asarray(0.5, dtype),
        }
        extra_ops = [ScaleOperator(parameter="kappa", weight=1.0)]
    else:
        raise ValueError(model)

    def log_prior(params, tree):
        return (
            one_on_x_logpdf(params["pop.size"])
            + lognormal_logpdf(params["clock.rate"], 0.0, 1.0)
            + constant_coalescent_loglik(tree.heights, n_taxa, params["pop.size"])
        )

    def log_post(params, tree):
        return log_lik(params, tree) + log_prior(params, tree)

    if derived:
        def log_post_cached(params, tree):
            return log_lik(params, tree, cached=True) + log_prior(params, tree)
    else:
        log_post_cached = log_post

    operators = [
        *extra_ops,
        ScaleOperator(parameter="pop.size", weight=3.0),
        UpDownOperator(up=("clock.rate",), down=(TREE_HEIGHTS,), weight=3.0),
        UniformNodeHeightOperator(weight=15.0),
        RootHeightScaleOperator(weight=3.0),
        NarrowExchangeOperator(weight=15.0),
        WideExchangeOperator(weight=3.0),
        WilsonBaldingOperator(weight=3.0),
    ]
    if derived:
        from beast_mcmc_tpu.inference.mcmc import apply_derived

        # jit-seeded: bitwise-identical to the in-graph branch refresh /
        # full-evaluation recompute (see init_mcmc_state)
        params0 = jax.jit(lambda p: apply_derived(derived, p))(params0)
    aux = {
        "tips": tips, "weights": weights, "freqs": freqs,
        "log_lik": log_lik, "derived": derived,
        "log_post_cached": log_post_cached,
    }
    return log_post, operators, params0, tree0, aux
