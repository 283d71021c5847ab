"""Case-to-case transmission-tree inference (the casetocase subsystem).

Role of the reference's epidemiology/casetocase stack (ref:
src/dr/evomodel/epidemiology/casetocase/CaseToCaseTransmissionLikelihood
.java:475-560 — joint density of a phylogeny "painted" with cases, the
implied infection times and infectious periods, a transmission rate and
an optional spatial kernel; CaseToCaseTreeLikelihood.java:576-615 —
infection time = the painting change point on the branch above each
case's subtree root).

TPU-native redesign: the transmission tree is a per-node integer
PAINTING over the flat arrays (branchMap in the reference). Validity,
infection times, infectors, and every density term are vectorized
masks/segment reductions — no per-case host objects; the painting moves
under MCMC with a validity-preserving node-repaint operator and the
infection-branch positions are continuous (0,1) parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.operators import NEG_INF, Operator
from beast_mcmc_tpu.models.priors import gamma_logpdf


def painting_is_valid(children: jnp.ndarray, painting: jnp.ndarray,
                      n_taxa: int) -> jnp.ndarray:
    """A painting (node -> case, tips fixed to their own case) encodes a
    transmission tree iff every internal node carries the case of at
    least one of its children (the infector's lineage continues through
    the node; ref: the branchMap consistency rule of
    CaseToCaseTreeLikelihood / AbstractOutbreak 'partition connectedness')."""
    m = painting.shape[0]
    internal = jnp.arange(m) >= n_taxa
    l = children[:, 0]
    r = children[:, 1]
    ok = (painting == painting[jnp.maximum(l, 0)]) | (
        painting == painting[jnp.maximum(r, 0)]
    )
    return jnp.all(jnp.where(internal, ok, True))


def infection_events(parent: jnp.ndarray, painting: jnp.ndarray,
                     heights: jnp.ndarray, root, n_cases: int,
                     branch_fractions: jnp.ndarray):
    """Per-case (infection_time, infector) from the painting.

    A case's subtree root is its highest node; infection happens ON the
    branch above it at `fraction` of the way to the parent (ref:
    CaseToCaseTreeLikelihood.getInfectionTime(min,max,case):604-608 —
    a uniform draw within the branch becomes here an explicit (0,1)
    parameter per case, jit-friendly and sampled by MCMC). The index
    case (root painting) is infected above the root at fraction of the
    root branch-scale; its infector is -1.
    """
    m = parent.shape[0]
    pidx = jnp.maximum(parent, 0)
    # a node is its case's subtree root when its parent has a different
    # painting (or it is the tree root)
    is_case_root = (painting != painting[pidx]) | (jnp.arange(m) == root)
    # scatter: case -> its root node (unique for a valid painting)
    case_root = jnp.full((n_cases,), -1, jnp.int32)
    case_root = case_root.at[painting].max(
        jnp.where(is_case_root, jnp.arange(m, dtype=jnp.int32), -1)
    )
    node_h = heights[case_root]
    par_h = jnp.where(
        case_root == root,
        heights[root] + (heights[root] - jnp.min(heights)) * 0.5 + 1e-6,
        heights[jnp.maximum(parent[case_root], 0)],
    )
    t_inf = node_h + branch_fractions * (par_h - node_h)
    infector = jnp.where(
        case_root == root,
        -1,
        painting[jnp.maximum(parent[case_root], 0)],
    )
    return t_inf, infector, case_root


def case_to_case_loglik(
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    painting: jnp.ndarray,  # int[M] case per node
    n_taxa: int,
    sample_heights: jnp.ndarray,  # [n_cases] tip (sampling) heights
    branch_fractions: jnp.ndarray,  # [n_cases] in (0,1)
    inf_period_shape,
    inf_period_scale,
    transmission_rate,
    case_distances: Optional[jnp.ndarray] = None,  # [n_cases, n_cases]
    kernel_alpha=None,
) -> jnp.ndarray:
    """Joint epidemiological density (ref:
    CaseToCaseTransmissionLikelihood.java:475-520):

      sum_c log Gamma(t_inf_c - t_sample_c; shape, scale)   [infectious
        periods — heights run backwards, so period = t_inf - t_sample]
      + sum_{c != index} [log rate + log kernel(d_infector,c)]
      - inf for invalid paintings.
    """
    n_cases = sample_heights.shape[0]
    dt = heights.dtype
    valid = painting_is_valid(children, painting, n_taxa)
    t_inf, infector, _ = infection_events(
        parent, painting, heights, root, n_cases, branch_fractions
    )
    period = t_inf - sample_heights
    ll = jnp.sum(gamma_logpdf(jnp.maximum(period, 1e-12), inf_period_shape,
                              inf_period_scale))
    ll = ll + jnp.where(period.min() <= 0, NEG_INF, 0.0)

    n_trans = n_cases - 1
    ll = ll + n_trans * jnp.log(jnp.asarray(transmission_rate, dt))
    if case_distances is not None:
        inf_ok = jnp.maximum(infector, 0)
        d = case_distances[inf_ok, jnp.arange(n_cases)]
        # exponential spatial kernel (ref: SpatialKernel.Exponential)
        k = -jnp.asarray(kernel_alpha, dt) * d
        ll = ll + jnp.sum(jnp.where(infector >= 0, k, 0.0))
    return jnp.where(valid, ll, NEG_INF)


@dataclasses.dataclass
class PaintingRepaintOperator(Operator):
    """Repaint one random internal node with the case of one of its
    children — the elementary transmission-tree move (the role of the
    reference's infection-branch operators,
    casetocase/operators/InfectionBranchMovementOperator.java). Proposals
    breaking validity are rejected by the likelihood's validity mask;
    the move itself is symmetric (choose node uniformly, child
    uniformly)."""

    painting_param: str = "painting"
    modifies_params = None

    def modified_params(self):
        return (self.painting_param,)

    def propose(self, params, tree, key, tuning):
        painting = params[self.painting_param]
        m = painting.shape[0]
        n_taxa = (m + 1) // 2
        k1, k2 = jax.random.split(key)
        node = jax.random.randint(k1, (), n_taxa, m)
        side = jax.random.randint(k2, (), 0, 2)
        new_case = painting[tree.children[node, side]]
        new_painting = painting.at[node].set(new_case)
        return (
            {**params, self.painting_param: new_painting},
            tree,
            jnp.asarray(0.0, tree.heights.dtype),
        )


def initial_painting(parent: np.ndarray, children: np.ndarray,
                     root: int, n_taxa: int) -> np.ndarray:
    """A valid starting painting: every internal node takes its first
    child's case, bottom-up."""
    m = parent.shape[0]
    painting = np.arange(m, dtype=np.int32)
    order = []
    stack = [int(root)]
    while stack:
        n = stack.pop()
        order.append(n)
        for c in children[n]:
            if c >= 0:
                stack.append(int(c))
    for n in reversed(order):
        if n >= n_taxa:
            painting[n] = painting[int(children[n, 0])]
    return painting


# ---------------------------------------------------------------------------
# infectious-period priors (ref: casetocase/periodpriors/*)
# ---------------------------------------------------------------------------


def normal_period_prior_loglik(periods, mu0, lambda0, alpha0, beta0):
    """Marginal likelihood of iid Normal periods under a Normal-Gamma
    (mu, tau) hyperprior, both integrated out (ref:
    NormalPeriodPriorDistribution.java:158-199)."""
    from jax.scipy.special import gammaln

    x = jnp.ravel(periods)
    dt = x.dtype
    n = x.shape[0]
    lam_n = lambda0 + n
    alpha_n = alpha0 + n / 2
    mean = jnp.mean(x)
    ssd = jnp.sum((x - mean) ** 2)
    beta_n = (beta0 + 0.5 * ssd
              + lambda0 * n * (mean - mu0) ** 2 / (2.0 * (lambda0 + n)))
    return (gammaln(jnp.asarray(alpha_n, dt))
            - gammaln(jnp.asarray(alpha0, dt))
            + alpha0 * jnp.log(jnp.asarray(beta0, dt))
            - alpha_n * jnp.log(beta_n)
            + 0.5 * jnp.log(jnp.asarray(lambda0, dt))
            - 0.5 * jnp.log(jnp.asarray(lam_n, dt))
            - (n / 2) * jnp.log(2 * jnp.asarray(jnp.pi, dt)))


def known_variance_normal_period_prior_loglik(periods, sigma, mu0, sigma0):
    """Marginal likelihood of iid Normal(mu, sigma^2) periods with KNOWN
    sigma and a Normal(mu0, sigma0^2) prior on mu, mu integrated out
    (ref: KnownVarianceNormalPeriodPriorDistribution.java:114-142 —
    transcribed term-for-term; the reference's algebraic form is kept so
    parity runs agree to the last bit)."""
    x = jnp.ravel(periods)
    dt = x.dtype
    n = x.shape[0]
    var = sigma ** 2
    var0 = sigma0 ** 2
    s = jnp.sum(x)
    ss = jnp.sum(x * x)
    mean = s / n
    return (jnp.log(jnp.asarray(sigma, dt))
            - n * jnp.log(jnp.sqrt(2 * jnp.asarray(jnp.pi, dt)) * sigma)
            - jnp.log(jnp.sqrt(n * var0 + var))
            - ss / (2 * var) - mu0 ** 2 / (2 * var0)
            + ((sigma0 * n * mean / sigma) ** 2
               + (sigma * mu0 / sigma0) ** 2
               + 2 * n * mean * mu0) / (2 * (n * var0 + var)))


def one_over_stdev_period_prior_loglik(periods):
    """logL = -log sd(periods) (ref:
    OneOverStDevPeriodPriorDistribution.java:34-41; sample sd)."""
    x = jnp.ravel(periods)
    n = x.shape[0]
    sd = jnp.sqrt(jnp.sum((x - jnp.mean(x)) ** 2) / (n - 1))
    return -jnp.log(sd)


def individual_period_prior_loglik(periods, logpdf_fn):
    """Independent per-case period densities (ref: IndividualPrior.java)."""
    return jnp.sum(logpdf_fn(jnp.ravel(periods)))
