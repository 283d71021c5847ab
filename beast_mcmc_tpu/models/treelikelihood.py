"""Tree data likelihood: tree + substitution + site + clock -> logL.

Functional role of dr.evomodel.treedatalikelihood.TreeDataLikelihood +
BeagleDataLikelihoodDelegate (ref: TreeDataLikelihood.java:145-183,330-369):
no events, no dirty flags — one pure function. Incremental recomputation is
an optimization applied later at the peeling level; store/restore is free
(functional state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.ops.eigen import EigenSystem, transition_probs
from beast_mcmc_tpu.ops.peeling import (
    peel_loglikelihood,
    peel_order_from_heights,
    peel_site_loglik,
)


def branch_lengths(parent: jnp.ndarray, heights: jnp.ndarray) -> jnp.ndarray:
    """Time-lengths of the branch above each node; 0 for the root.

    (ref: TreeTraversal.java:107-124 — branchLength = h(parent) - h(node),
    scaled by the branch rate by the caller.)
    """
    pidx = jnp.maximum(parent, 0)
    bl = heights[pidx] - heights
    return jnp.where(parent >= 0, bl, 0.0)


def branch_transition_matrices(
    eig: EigenSystem,
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    branch_rates: jnp.ndarray,  # [M] or scalar
    category_rates: jnp.ndarray,  # [C]
) -> jnp.ndarray:
    """[M, C, S, S] matrices for every node's parent branch, one batched
    einsum (the whole updateTransitionMatrices pass of
    BeagleDataLikelihoodDelegate.java:838 as a single MXU launch)."""
    bl = branch_lengths(parent, heights) * branch_rates
    t = bl[:, None] * category_rates[None, :]
    return transition_probs(eig, t)


def _use_pallas_peeling() -> bool:
    """The fused Pallas kernel is the TPU hot path (2.7x the XLA scan on
    benchmark2 shapes); CPU/GPU and the virtual-device CI mesh use the
    scan. Trace-time static — safe under jit.

    Multi-device TPU runs keep the kernel: the chain parallelism layers
    (inference/mc3.py, parallel/distributed.py) enter per-device code via
    shard_map, where the kernel sees per-shard shapes. (Global-array pjit
    sharding of a single likelihood across chips would need the scan —
    pass use_pallas=False explicitly for that layout.)"""
    import jax

    return jax.default_backend() == "tpu"


def tree_loglikelihood(
    tip_partials: jnp.ndarray,  # [N, S, P]
    pattern_weights: jnp.ndarray,  # [P]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    eig: EigenSystem,
    freqs: jnp.ndarray,
    category_rates: jnp.ndarray,
    category_weights: jnp.ndarray,
    branch_rates,
    use_pallas: bool = None,
) -> jnp.ndarray:
    n_taxa = tip_partials.shape[0]
    p_mats = branch_transition_matrices(
        eig, parent, heights, branch_rates, category_rates
    )
    order = peel_order_from_heights(heights, n_taxa, parent)
    if use_pallas is None:
        use_pallas = _use_pallas_peeling()
    if use_pallas:
        from beast_mcmc_tpu.ops.pallas_peeling import (
            peel_loglikelihood_pallas_auto,
        )

        return peel_loglikelihood_pallas_auto(
            tip_partials, children, order, root, p_mats, freqs,
            category_weights, pattern_weights,
        )
    return peel_loglikelihood(
        tip_partials, children, order, root, p_mats, freqs,
        category_weights, pattern_weights,
    )


def tree_site_logliks(
    tip_partials,
    parent,
    children,
    heights,
    root,
    eig,
    freqs,
    category_rates,
    category_weights,
    branch_rates,
):
    """Per-pattern log-likelihoods (the getSiteLogLikelihoods surface,
    ref: BeagleDataLikelihoodDelegate.java:1020-1030)."""
    n_taxa = tip_partials.shape[0]
    p_mats = branch_transition_matrices(
        eig, parent, heights, branch_rates, category_rates
    )
    order = peel_order_from_heights(heights, n_taxa, parent)
    return peel_site_loglik(
        tip_partials, children, order, root, p_mats, freqs, category_weights
    )


def tree_loglikelihood_q(
    tip_partials: jnp.ndarray,
    pattern_weights: jnp.ndarray,
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    q: jnp.ndarray,  # [S,S] generator (may be non-reversible)
    freqs: jnp.ndarray,
    category_rates: jnp.ndarray,
    category_weights: jnp.ndarray,
    branch_rates,
) -> jnp.ndarray:
    """Tree likelihood via the expm transition path — the non-reversible /
    covarion route (ref: ComplexSubstitutionModel + BEAGLE complex-eigen
    setEigenDecomposition usage)."""
    from beast_mcmc_tpu.ops.expm import transition_probs_expm

    n_taxa = tip_partials.shape[0]
    bl = branch_lengths(parent, heights) * branch_rates
    t = bl[:, None] * category_rates[None, :]
    p_mats = transition_probs_expm(q, t)
    order = peel_order_from_heights(heights, n_taxa, parent)
    return peel_loglikelihood(
        tip_partials, children, order, root, p_mats, freqs,
        category_weights, pattern_weights,
    )


def tree_loglikelihood_q_approx_grad(
    tip_partials: jnp.ndarray,
    pattern_weights: jnp.ndarray,
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    q: jnp.ndarray,
    freqs: jnp.ndarray,
    category_rates: jnp.ndarray,
    category_weights: jnp.ndarray,
    branch_rates,
) -> jnp.ndarray:
    """Same VALUE as tree_loglikelihood_q, but gradients wrt the
    generator flow through the first-order surrogate dP = t * P * dQ —
    the reference's branch-infinitesimal approximation (ref:
    AbstractLogAdditiveSubstitutionModelGradient /
    DiscreteTraitBranchRateGradient with branchInfinitesimalDerivative;
    validated to 1e-10 against ci/TestXML/testParallelNumericGradient's
    embedded oracle)."""
    from beast_mcmc_tpu.ops.expm import transition_probs_expm

    n_taxa = tip_partials.shape[0]
    bl = branch_lengths(parent, heights) * branch_rates
    t = bl[:, None] * category_rates[None, :]
    p0 = jax.lax.stop_gradient(transition_probs_expm(q, t))
    q0 = jax.lax.stop_gradient(q)
    p_mats = p0 + t[..., None, None] * jnp.einsum(
        "ncij,jk->ncik", p0, q - q0)
    order = peel_order_from_heights(heights, n_taxa, parent)
    return peel_loglikelihood(
        tip_partials, children, order, root, p_mats, freqs,
        category_weights, pattern_weights,
    )


def multipartition_loglikelihood(
    tip_partials: jnp.ndarray,  # [K, N, S, P]
    pattern_weights: jnp.ndarray,  # [K, P]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    eigs: EigenSystem,  # batched over K (leading axis on every field)
    freqs: jnp.ndarray,  # [K, S]
    category_rates: jnp.ndarray,  # [K, C]
    category_weights: jnp.ndarray,  # [K, C]
    branch_rates,  # [M] or scalar, shared across partitions
    use_pallas: bool = None,
) -> jnp.ndarray:
    """All partitions against ONE shared tree in one evaluation — the role
    of MultiPartitionDataLikelihoodDelegate (ref: src/dr/evomodel/
    treedatalikelihood/MultiPartitionDataLikelihoodDelegate.java:64-251),
    TPU-style: partitions are a leading batch axis, the peel order is
    computed once, and the per-partition peels run as one vmapped program
    (or as an unrolled K-loop of the fused Pallas kernel on a real chip —
    partitions are independent so the loop bodies overlap).

    Per-partition relative rates (benchmark1's codon-position mu_k) fold
    into `category_rates[k] = mu_k * site_rates`.  Returns sum_k logL_k.
    """
    n_taxa = tip_partials.shape[1]
    order = peel_order_from_heights(heights, n_taxa, parent)
    p_mats = jax.vmap(
        lambda e, cr: branch_transition_matrices(
            e, parent, heights, branch_rates, cr
        )
    )(eigs, category_rates)  # [K, M, C, S, S]
    if use_pallas is None:
        use_pallas = _use_pallas_peeling()
    if use_pallas:
        from beast_mcmc_tpu.ops.pallas_peeling import (
            peel_loglikelihood_pallas_auto,
        )

        parts = [
            peel_loglikelihood_pallas_auto(
                tip_partials[k], children, order, root, p_mats[k], freqs[k],
                category_weights[k], pattern_weights[k],
            )
            for k in range(tip_partials.shape[0])
        ]
        return jnp.sum(jnp.stack(parts))
    per = jax.vmap(
        lambda tp, pm, f, cw, w: peel_loglikelihood(
            tp, children, order, root, pm, f, cw, w
        )
    )(tip_partials, p_mats, freqs, category_weights, pattern_weights)
    return jnp.sum(per)


def tree_loglikelihood_pmats(
    tip_partials: jnp.ndarray,
    pattern_weights: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    parent,
    p_mats: jnp.ndarray,  # [M,C,S,S] precomputed (e.g. epoch convolution)
    freqs: jnp.ndarray,
    category_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Tree likelihood from externally built branch matrices — the entry
    point for epoch/branch-specific models (ref: BranchModel +
    SubstitutionModelDelegate convolution)."""
    n_taxa = tip_partials.shape[0]
    order = peel_order_from_heights(heights, n_taxa, parent)
    return peel_loglikelihood(
        tip_partials, children, order, root, p_mats, freqs,
        category_weights, pattern_weights,
    )


# ---------------------------------------------------------------------------
# ascertainment correction (ref: AscertainedSitePatterns.java:47;
# AbstractTreeLikelihood getAscertainmentCorrectedLogLikelihood)
# ---------------------------------------------------------------------------


def ascertainment_correction(site_logl_excluded: jnp.ndarray) -> jnp.ndarray:
    """log(1 - sum_e P(excluded pattern e)) — the per-site normalizer when
    the excluded patterns can never be observed (e.g. constant sites
    removed from a SNP alignment)."""
    return jnp.log1p(-jnp.sum(jnp.exp(site_logl_excluded)))


def ascertained_loglik(
    site_logl_data: jnp.ndarray,  # [P] data-pattern log-likelihoods
    pattern_weights: jnp.ndarray,  # [P]
    site_logl_excluded: jnp.ndarray,  # [E] excluded-pattern logL
) -> jnp.ndarray:
    """Total ascertainment-corrected logL: each observed site is
    renormalized by the probability of being ascertainable
    (logP - log(1 - sum P_excluded); ref: AscertainedSitePatterns.java:47
    getAscertainmentCorrection)."""
    from beast_mcmc_tpu.utils.accum import stable_dot

    corr = ascertainment_correction(site_logl_excluded)
    return stable_dot(pattern_weights, site_logl_data - corr)
