"""Bayesian nonparametric clustering: CRP / distance-dependent CRP /
hierarchical DP priors and Gibbs moves.

Roles of the reference's antigenic phylo-clustering and HDP machinery
(ref: src/dr/evomodel/antigenic/NPAntigenicLikelihood.java — Dirichlet-
process clustering of antigenic locations; DirichletProcessGibbsOperator
.java, ClusterSingleMoveOperator.java, DistanceDependentCRPGibbsOperator
.java; src/dr/evomodel/mixturemodels/HDPPolyaUrn.java — hierarchical DP
over group x category counts; AntigenicDriftPrior.java).

TPU-native form: partitions are fixed-capacity integer assignment vectors
(max K clusters), all cluster sums are masked segment reductions, and the
DP Gibbs sweep is a vmapped categorical draw over the K+1 candidate
seats."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def cluster_sizes(assignments: jnp.ndarray, max_k: int) -> jnp.ndarray:
    """int[K] occupancy of each cluster label."""
    return jnp.sum(
        jax.nn.one_hot(assignments, max_k, dtype=jnp.int32), axis=0
    )


def crp_log_prior(assignments: jnp.ndarray, concentration,
                  max_k: int) -> jnp.ndarray:
    """Chinese restaurant process partition probability (ref:
    NPAntigenicLikelihood.java getLogLikelihood's CRP term):
      log P = K log(alpha) + sum_k lgamma(n_k) - sum_{i=0}^{n-1}
              log(alpha + i)
    Invariant to label permutation (depends only on occupied sizes)."""
    n = assignments.shape[0]
    alpha = jnp.asarray(concentration)
    sizes = cluster_sizes(assignments, max_k).astype(alpha.dtype)
    occupied = sizes > 0
    k = jnp.sum(occupied)
    num = k * jnp.log(alpha) + jnp.sum(
        jnp.where(occupied, gammaln(jnp.maximum(sizes, 1.0)), 0.0)
    )
    i = jnp.arange(n, dtype=alpha.dtype)
    return num - jnp.sum(jnp.log(alpha + i))


def ddcrp_log_prior(links: jnp.ndarray, distances: jnp.ndarray,
                    concentration, decay) -> jnp.ndarray:
    """Distance-dependent CRP over customer links (ref:
    DistanceDependentCRPGibbsOperator.java): customer i links to j with
    probability proportional to exp(-d_ij / decay) (j != i) or alpha
    (self-link). The partition is the connected components of the link
    graph; this is the log prior of the LINK configuration."""
    n = links.shape[0]
    alpha = jnp.asarray(concentration)
    f = jnp.exp(-distances / jnp.asarray(decay))
    f = f * (1.0 - jnp.eye(n, dtype=f.dtype))  # zero self-affinity
    denom = alpha + jnp.sum(f, axis=1)
    is_self = links == jnp.arange(n)
    w = jnp.where(is_self, alpha, f[jnp.arange(n), links])
    return jnp.sum(jnp.log(w) - jnp.log(denom))


def hdp_log_prior(counts: jnp.ndarray, base_weights: jnp.ndarray,
                  group_concentration, base_concentration) -> jnp.ndarray:
    """Collapsed hierarchical-DP marginal of group x category counts given
    the truncated base measure (ref: HDPPolyaUrn.java role — groups draw
    category distributions from DP(alpha, beta), beta ~ GEM(gamma)).

    Collapsing the group-level DPs gives a Dirichlet-multinomial per
    group with base alpha*beta:
      log p(counts_g | beta) = lgamma(a) - lgamma(a + n_g)
        + sum_k [lgamma(a beta_k + n_gk) - lgamma(a beta_k)]
    plus the GEM(gamma) stick-breaking density of the truncated beta
    (Dirichlet(gamma/K,...,gamma/K) finite approximation)."""
    a = jnp.asarray(group_concentration)
    g = jnp.asarray(base_concentration)
    beta = jnp.asarray(base_weights)
    k = beta.shape[0]
    n_g = jnp.sum(counts, axis=1).astype(beta.dtype)
    base = a * beta
    per_group = (gammaln(a) - gammaln(a + n_g)
                 + jnp.sum(gammaln(base[None, :] + counts) - gammaln(base),
                           axis=1))
    # finite-K Dirichlet approximation of GEM(gamma)
    conc = g / k
    lp_beta = (gammaln(g) - k * gammaln(conc)
               + jnp.sum((conc - 1.0) * jnp.log(beta)))
    return jnp.sum(per_group) + lp_beta


def dp_gibbs_sweep(key, assignments: jnp.ndarray, item_loglik_fn,
                   concentration, max_k: int) -> jnp.ndarray:
    """One sequential Gibbs sweep of a collapsed DP mixture (ref:
    DirichletProcessGibbsOperator.java): each item is reseated at an
    existing cluster with probability prop. to n_{-i,k} * L(i|k) or a new
    cluster with prob. alpha * L(i|new).

    item_loglik_fn(i, k, assignments) -> log L of item i in cluster k
    given the other members (collapsed predictive); k == empty label
    means a new cluster. Sequential scan (exact Gibbs, not parallel)."""
    n = assignments.shape[0]
    alpha = jnp.asarray(concentration)

    def reseat(carry, xs):
        assignments, key = carry
        i = xs
        key, sub = jax.random.split(key)
        # remove i, count remaining members per label
        a_wo = assignments.at[i].set(-1)
        sizes = jnp.sum(
            jax.nn.one_hot(a_wo, max_k, dtype=jnp.int32)
            * (a_wo >= 0)[:, None], axis=0)
        # first empty label hosts the "new cluster" seat
        empty = sizes == 0
        first_empty = jnp.argmax(empty)
        ll = jax.vmap(lambda k: item_loglik_fn(i, k, a_wo))(jnp.arange(max_k))
        logw = jnp.where(
            sizes > 0, jnp.log(sizes.astype(ll.dtype)) + ll, -jnp.inf)
        logw = logw.at[first_empty].set(
            jnp.log(alpha) + ll[first_empty])
        choice = jax.random.categorical(sub, logw).astype(assignments.dtype)
        return (assignments.at[i].set(choice), key), None

    (assignments, _), _ = jax.lax.scan(
        reseat, (assignments, key), jnp.arange(n))
    return assignments


def antigenic_drift_prior(locations: jnp.ndarray, dates: jnp.ndarray,
                          drift, precision) -> jnp.ndarray:
    """Antigenic locations drift along the first MDS dimension with time
    (ref: src/dr/evomodel/antigenic/AntigenicDriftPrior.java): dim 0 of
    each location ~ N(drift * date, 1/precision); other dims ~ N(0, ...)."""
    tau = jnp.asarray(precision)
    mean0 = jnp.asarray(drift) * dates
    d0 = locations[:, 0] - mean0
    rest = locations[:, 1:]
    lp = 0.5 * jnp.log(tau / (2 * jnp.pi)) * locations.size
    lp = lp - 0.5 * tau * (jnp.sum(d0 * d0) + jnp.sum(rest * rest))
    return lp


def cluster_single_move(key, assignments: jnp.ndarray, max_k: int):
    """Move one random item to a uniform random label (ref:
    ClusterSingleMoveOperator.java); symmetric over the label space."""
    k1, k2 = jax.random.split(key)
    n = assignments.shape[0]
    i = jax.random.randint(k1, (), 0, n)
    new_label = jax.random.randint(k2, (), 0, max_k,
                                   dtype=assignments.dtype)
    return assignments.at[i].set(new_label), jnp.asarray(0.0)
