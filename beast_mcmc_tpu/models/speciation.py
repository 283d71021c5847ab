"""Speciation (birth-death) tree priors.

Functional port-free redesign of the Gernhard (2008) conditioned
reconstructed process as parameterized by the reference (ref:
src/dr/evomodel/speciation/Gernhard08BirthDeathModel.java:220-260
logTreeProbability/logNodeProbability; YuleModel.java):

  r   = lambda - mu        (birth diff rate)
  a   = mu / lambda        (relative death rate; 0 => Yule)
  rho = sampling probability

density over internal-node heights x (unconditioned on root):
  logL = (n-1) log(r rho) + n log(1-a)
       + sum_internal [ -2 log(rho + ((1-rho)-a) e^{-r h}) - r h ]
       + extra root term [ -r h_root - log(rho + ((1-rho)-a) e^{-r h_root}) ]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from beast_mcmc_tpu.utils.accum import prefix_sum
from jax.scipy.special import gammaln


def birth_death_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    root: jnp.ndarray,
    birth_diff_rate,
    relative_death_rate=0.0,
    sample_probability=1.0,
    labeled: bool = True,
) -> jnp.ndarray:
    """Gernhard08 birth-death density on an ultrametric tree's node heights.

    labeled=True applies the LABELED coefficient 2^(n-1)/(n-1)! used by the
    reference's default <birthDeathModel> (logCoeff, Gernhard08BirthDeathModel
    .java:logCoeff LABELED branch).
    """
    dt = heights.dtype
    r = jnp.asarray(birth_diff_rate, dt)
    a = jnp.asarray(relative_death_rate, dt)
    rho = jnp.asarray(sample_probability, dt)
    n = n_taxa
    m = heights.shape[0]

    internal = jnp.arange(m) >= n
    h = heights
    mrh = -r * h
    z = jnp.log(rho + ((1.0 - rho) - a) * jnp.exp(mrh))
    node_terms = jnp.where(internal, -2.0 * z + mrh, 0.0)
    root_term = mrh[root] - z[root]

    c1 = (n - 1) * jnp.log(r * rho) + n * jnp.log1p(-a)
    if labeled:
        c1 = c1 + (n - 1) * jnp.log(2.0) - gammaln(jnp.asarray(n, dt))
    return c1 + jnp.sum(node_terms) + root_term


def yule_loglik(heights, n_taxa: int, root, birth_rate, labeled: bool = True):
    """Pure-birth special case (ref: YuleModel.java; a=0, rho=1)."""
    return birth_death_loglik(
        heights, n_taxa, root, birth_rate, 0.0, 1.0, labeled=labeled
    )


# ---------------------------------------------------------------------------
# Serially-sampled birth-death (Stadler 2010; ref:
# src/dr/evomodel/birthdeath/BirthDeathSerialSamplingModel.java:192-365 —
# p0/logq closed forms, origin-conditioned tree density)
# ---------------------------------------------------------------------------


def _bdss_c1(b, d, psi):
    return jnp.sqrt((b - d - psi) ** 2 + 4.0 * b * psi)


def _bdss_c2(b, d, p, psi):
    return -(b - d - 2.0 * b * p - psi) / _bdss_c1(b, d, psi)


def bdss_log_q(b, d, p, psi, t):
    """log q(t) (the reference computes q directly in log space,
    BirthDeathSerialSamplingModel.java:202-206)."""
    c1 = _bdss_c1(b, d, psi)
    c2 = _bdss_c2(b, d, p, psi)
    return c1 * t + 2.0 * jnp.log(jnp.exp(-c1 * t) * (1.0 - c2) + (1.0 + c2))


def bdss_p0(b, d, p, psi, t):
    """Probability of no sampled descendants after time t
    (BirthDeathSerialSamplingModel.java:192-200)."""
    c1 = _bdss_c1(b, d, psi)
    c2 = _bdss_c2(b, d, p, psi)
    e = jnp.exp(-c1 * t) * (1.0 - c2)
    return (b + d + psi + c1 * (e - (1.0 + c2)) / (e + (1.0 + c2))) / (2.0 * b)


def serial_birth_death_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    birth_rate,
    death_rate,
    psi,
    origin,
    sampling_prob=0.0,
    has_final_sample: bool = False,
):
    """Origin-conditioned serially-sampled birth-death tree density
    (BirthDeathSerialSamplingModel.calculateTreeLogLikelihood:295-365):

      logL = -logq(x0) [+ n log(4p) if final sample]
             + sum_internal [log b - logq(x_i)]
             + sum_{psi-sampled tips} [log psi + logq(y_j)]

    Tips at height 0 count as final-sample tips when has_final_sample,
    otherwise they are psi-sampled like the rest. Returns -inf when the
    origin is below the root.
    """
    dt = heights.dtype
    b = jnp.asarray(birth_rate, dt)
    d = jnp.asarray(death_rate, dt)
    s = jnp.asarray(psi, dt)
    p = jnp.asarray(sampling_prob, dt) if has_final_sample else jnp.asarray(0.0, dt)
    x0 = jnp.asarray(origin, dt)

    tip_h = heights[:n_taxa]
    int_h = heights[n_taxa:]
    at_present = tip_h <= 1e-12

    logL = -bdss_log_q(b, d, p, s, x0)
    if has_final_sample:
        n_present = jnp.sum(at_present)
        logL = logL + n_present * jnp.log(4.0 * p)
    logL = logL + jnp.sum(jnp.log(b) - bdss_log_q(b, d, p, s, int_h))
    tip_term = jnp.log(s) + bdss_log_q(b, d, p, s, tip_h)
    if has_final_sample:
        logL = logL + jnp.sum(jnp.where(at_present, 0.0, tip_term))
    else:
        logL = logL + jnp.sum(tip_term)
    root_h = jnp.max(int_h)
    return jnp.where(x0 >= root_h, logL, -jnp.inf)


# ---------------------------------------------------------------------------
# Episodic (skyline) serially-sampled birth-death
# ---------------------------------------------------------------------------


def episodic_serial_birth_death_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    origin,
    birth_rates: jnp.ndarray,      # [K] (or scalar) lambda per grid interval
    death_rates: jnp.ndarray,      # [K] mu
    sampling_rates: jnp.ndarray,   # [K] psi
    treatment_probs=1.0,           # [K] r: P(removal on sampling)
    rho_present=0.0,               # intensive sampling probability at t=0
    grid_end=None,
    num_intervals: int = 1,
):
    """Episodic (piecewise-constant-rate) serially-sampled birth-death tree
    prior — the BDSKY family (ref:
    src/dr/evomodel/birthdeath/BirthDeathEpisodicSeriallySampledModel.java:
    Ai/Bi/p/logq :225-279, B recursion via p_{i-1}(t_{i-1}) :334-354,
    interval/coalescence/sampling event terms :400-444). The grid is K
    equal intervals of [0, grid_end] measured backward from the present
    (setupTimeline :213-223); rates are per-interval vectors.

    TPU-native form: the reference's per-event virtual dispatch
    (processInterval / processCoalescence / processSampling) becomes a
    cumulative log-q function — since q_i(t_i^start) = 1, the accumulated
    cumlogq(t) = prefix_sum(logq_j(t_j)) + logq_idx(t) turns every
    grid-boundary-splitting branch contribution into a single difference
    cumlogq(t_parent) - cumlogq(t_child); events then vectorise over
    nodes with a gather on the interval index.

    With K=1, r=1 this reduces exactly to serial_birth_death_loglik
    (Stadler 2010), which is the test oracle.
    """
    dt = heights.dtype
    k = num_intervals
    lam = jnp.broadcast_to(jnp.asarray(birth_rates, dt), (k,))
    mu = jnp.broadcast_to(jnp.asarray(death_rates, dt), (k,))
    psi = jnp.broadcast_to(jnp.asarray(sampling_rates, dt), (k,))
    r = jnp.broadcast_to(jnp.asarray(treatment_probs, dt), (k,))
    rho = jnp.zeros((k,), dt).at[0].set(jnp.asarray(rho_present, dt))
    x0 = jnp.asarray(origin, dt)
    width = jnp.asarray(grid_end, dt) / k

    a = jnp.sqrt((lam - mu - psi) ** 2 + 4.0 * lam * psi)

    def p_at(i_lam, i_mu, i_psi, i_a, i_b, t_rel):
        e = jnp.exp(i_a * t_rel)
        one_minus = e * (1.0 + i_b) - (1.0 - i_b)
        one_plus = e * (1.0 + i_b) + (1.0 - i_b)
        return (i_lam + i_mu + i_psi - i_a * one_minus / one_plus) / (2.0 * i_lam)

    # B_i recursion: B_i needs p_{i-1}(t_{i-1}) (ref :348-354)
    def scan_b(p_prev, xs):
        l_i, m_i, s_i, a_i, rho_i = xs
        b_i = ((1.0 - 2.0 * (1.0 - rho_i) * p_prev) * l_i + m_i + s_i) / a_i
        p_end = p_at(l_i, m_i, s_i, a_i, b_i, width)
        return p_end, b_i

    _, b = jax.lax.scan(scan_b, jnp.asarray(1.0, dt), (lam, mu, psi, a, rho))

    def logq(i, t):
        """logq_i(t) within interval i (ref logq :271-279)."""
        t_rel = t - i.astype(dt) * width
        at = a[i] * t_rel
        e = jnp.exp(at)
        denom = e * (1.0 + b[i]) + (1.0 - b[i])
        return at + jnp.log(4.0) - 2.0 * jnp.log(denom)

    # prefix sums of logq_j at interval ends -> cumulative logq
    logq_ends = jax.vmap(lambda i: logq(i, (i + 1).astype(dt) * width))(
        jnp.arange(k)
    )
    prefix = jnp.concatenate([jnp.zeros((1,), dt), prefix_sum(logq_ends)])

    def idx_of(t):
        return jnp.clip((t / width).astype(jnp.int32), 0, k - 1)

    def cumlogq(t):
        i = idx_of(t)
        return prefix[i] + logq(i, t)

    tip_h = heights[:n_taxa]
    int_h = heights[n_taxa:]
    root_h = jnp.max(int_h)

    # one net +cumlogq per internal node (2 child-branch tops - 1 own
    # bottom), +cumlogq(origin) for the stem, -cumlogq per tip
    ll = cumlogq(x0)
    ll = ll + jnp.sum(jax.vmap(cumlogq)(int_h))
    ll = ll - jnp.sum(jax.vmap(cumlogq)(tip_h))
    # coalescences: + log lambda at the node's interval
    ll = ll + jnp.sum(jnp.log(lam[idx_of(int_h)]))
    # psi-sampled tips: log psi + log(r + (1-r) p(t)); present tips with
    # rho-sampling: log rho (ref processSampling :420-444)
    i_tip = idx_of(tip_h)
    p_tip = p_at(lam[i_tip], mu[i_tip], psi[i_tip], a[i_tip], b[i_tip],
                 tip_h - i_tip.astype(dt) * width)
    serial_term = jnp.log(psi[i_tip]) + jnp.log(
        r[i_tip] + (1.0 - r[i_tip]) * p_tip
    )
    has_rho = jnp.asarray(rho_present, dt) > 0.0
    at_present = tip_h <= 1e-12
    tip_term = jnp.where(
        at_present & has_rho, jnp.log(jnp.maximum(rho_present, 1e-300)),
        serial_term,
    )
    ll = ll + jnp.sum(tip_term)
    # origin beyond the last grid point is fine: idx_of clips to the
    # last interval, whose rates extend to the origin (ref
    # setupTimeline — rates are constant past the final grid point)
    valid = x0 >= root_h
    return jnp.where(valid, ll, -jnp.inf)


# ---------------------------------------------------------------------------
# Calibrated speciation
# ---------------------------------------------------------------------------


def mrca_node(parent: jnp.ndarray, heights: jnp.ndarray,
              tip_set: jnp.ndarray) -> jnp.ndarray:
    """Index of the MRCA of a boolean tip set (ref:
    dr.evomodel.tree.TMRCAStatistic / TreeUtils.getCommonAncestorNode).
    Vectorised: ancestor-or-self reachability by pointer doubling, then
    the lowest node whose subtree covers the set."""
    m = parent.shape[0]
    eye = jnp.eye(m, dtype=bool)
    jump = jnp.where(parent < 0, jnp.arange(m), parent)
    anc = eye  # anc[i, j]: j is ancestor-or-self of i
    steps = 1
    while (1 << steps) < m:
        steps += 1
    for _ in range(steps):
        # propagate: i's ancestors include ancestors of jump[i]
        anc = anc | anc[jump]
        jump = jump[jump]
    covers = jnp.all(~tip_set[:, None] | anc, axis=0)  # node j covers set
    h = jnp.where(covers, heights, jnp.inf)
    return jnp.argmin(h).astype(jnp.int32)


def calibrated_speciation_loglik(
    speciation_loglik,
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    calibrations,
) -> jnp.ndarray:
    """Speciation prior plus calibration densities on clade MRCA ages
    (ref: src/dr/evomodel/speciation/CalibratedSpeciationLikelihood.java:94-100
    — lnL = speciation + sum of calibration distributions evaluated at
    each TMRCA). `calibrations` is a sequence of (tip_set[bool M],
    logpdf_fn: height -> scalar)."""
    ll = jnp.asarray(speciation_loglik)
    for tip_set, logpdf_fn in calibrations:
        node = mrca_node(parent, heights, jnp.asarray(tip_set))
        ll = ll + logpdf_fn(heights[node])
    return ll
