"""Ascertainment-corrected likelihood against the reference's oracles
(VERDICT r1 item 7; ref: AscertainmentCorrectedLikelihoodTest.java —
HKY kappa=29.739445, uniform frequencies, the fixed 6-taxon primate tree,
ALL 4^6 enumerated patterns):

  - sum_p P(pattern) over the complete pattern space == 1.0
  - excluding the first 10 lexicographic patterns: 0.78287044
  - corrected by those exclusions, the remainder renormalizes to 1.0
"""

import itertools

import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.sitemodel import single_rate
from beast_mcmc_tpu.models.substitution import hky_eigen
from beast_mcmc_tpu.models.treelikelihood import (
    ascertained_loglik,
    ascertainment_correction,
    tree_site_logliks,
)
from fixtures import PRIMATE_TAXA, primate_tree

N = 6


def _all_pattern_site_logliks():
    parent, children, heights, root, _ = primate_tree()
    pats = np.array(list(itertools.product(range(4), repeat=N)))  # [4096, 6]
    tips = np.zeros((N, 4, 4096))
    for t in range(N):
        tips[t, pats[:, t], np.arange(4096)] = 1.0
    eig = hky_eigen(jnp.asarray(29.739445), jnp.full((4,), 0.25))
    rates, weights = single_rate()
    sl = tree_site_logliks(
        jnp.asarray(tips), jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, eig, jnp.full((4,), 0.25),
        rates, weights, 1.0,
    )
    return np.asarray(sl)


def test_ascertainment_oracles():
    sl = _all_pattern_site_logliks()
    total = np.exp(sl).sum()
    assert abs(total - 1.0) < 1e-5, total  # testAllPatterns

    missing = np.exp(sl[10:]).sum()
    assert abs(missing - 0.78287044) < 1e-5, missing  # testMissingPatterns

    # testCorrectedPatterns: renormalized by the 10 excluded patterns
    corr = float(ascertainment_correction(jnp.asarray(sl[:10])))
    corrected_total = np.exp(sl[10:] - corr).sum()
    assert abs(corrected_total - 1.0) < 1e-5, corrected_total

    # the public ascertained_loglik surface agrees with the hand formula
    w = jnp.ones(4086)
    got = float(ascertained_loglik(jnp.asarray(sl[10:]), w,
                                   jnp.asarray(sl[:10])))
    want = float(np.sum(sl[10:] - corr))
    assert abs(got - want) < 1e-8
