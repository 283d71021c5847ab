"""Substitution models: parameter vectors -> eigen systems.

Functional redesign of src/dr/evomodel/substmodel (BaseSubstitutionModel,
nucleotide/HKY.java, nucleotide/GTR.java, nucleotide/TN93.java,
GeneralSubstitutionModel.java, aminoacid/*): each model is a pure function
from its parameters to an EigenSystem of the normalized generator. No
listener graph; recomputation policy is XLA's problem.

Conventions match the reference:
  - states A,C,G,T = 0,1,2,3
  - Q normalized so the expected substitution rate is 1
  - GTR parameterized by 6 symmetric exchange rates (AC,AG,AT,CG,CT,GT)
"""

from __future__ import annotations

import jax.numpy as jnp

from beast_mcmc_tpu.ops.eigen import EigenSystem, normalized_q, reversible_eigen

# index pairs for the 6 nucleotide exchangeabilities, reference order
# (ref: src/dr/oldevomodelxml/substmodel/GTRParser A_TO_C..G_TO_T)
_GTR_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def symmetric_rates_from_vector(rates: jnp.ndarray, state_count: int) -> jnp.ndarray:
    """Upper-triangle exchange-rate vector -> symmetric [S,S] matrix."""
    s = state_count
    iu = jnp.triu_indices(s, k=1)
    r = jnp.zeros((s, s), dtype=rates.dtype)
    r = r.at[iu].set(rates)
    return r + r.T


def jc_eigen(freqs=None, dtype=jnp.float64) -> EigenSystem:
    """JC69: equal rates, equal frequencies."""
    freqs = jnp.full(4, 0.25, dtype) if freqs is None else freqs
    return reversible_eigen(jnp.ones((4, 4), freqs.dtype), freqs)


def hky_eigen(kappa, freqs) -> EigenSystem:
    """HKY85 (ref: src/dr/evomodel/substmodel/nucleotide/HKY.java:53).

    kappa is the transition/transversion *rate* ratio. K80 is the
    freqs=1/4 special case.
    """
    kappa = jnp.asarray(kappa, freqs.dtype)
    r = jnp.array(
        [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]], freqs.dtype
    )
    rates = r + (1.0 - r) * kappa - jnp.eye(4, dtype=freqs.dtype) * kappa
    # rates: kappa on the two transition pairs (A<->G, C<->T), 1 elsewhere
    return reversible_eigen(rates, freqs)


def tn93_eigen(kappa1, kappa2, freqs) -> EigenSystem:
    """TN93: separate purine (A<->G, kappa1) and pyrimidine (C<->T, kappa2)
    transition rates (ref: nucleotide/TN93.java)."""
    k1 = jnp.asarray(kappa1, freqs.dtype)
    k2 = jnp.asarray(kappa2, freqs.dtype)
    r = jnp.ones((4, 4), freqs.dtype)
    r = r.at[0, 2].set(k1).at[2, 0].set(k1)
    r = r.at[1, 3].set(k2).at[3, 1].set(k2)
    return reversible_eigen(r, freqs)


def gtr_eigen(rates6: jnp.ndarray, freqs: jnp.ndarray) -> EigenSystem:
    """GTR with 6 exchangeabilities in reference order AC,AG,AT,CG,CT,GT
    (ref: nucleotide/GTR.java:50)."""
    return reversible_eigen(symmetric_rates_from_vector(rates6, 4), freqs)


def general_reversible_eigen(rates_vec: jnp.ndarray, freqs: jnp.ndarray) -> EigenSystem:
    """K-state reversible model from S(S-1)/2 exchangeabilities (ref:
    GeneralSubstitutionModel.java:45 — used for discrete traits /
    phylogeography)."""
    s = freqs.shape[-1]
    return reversible_eigen(symmetric_rates_from_vector(rates_vec, s), freqs)


def svs_masked_rates(rates_vec: jnp.ndarray, indicators: jnp.ndarray) -> jnp.ndarray:
    """BSSVS: elementwise indicator mask over exchangeabilities (ref:
    SVSGeneralSubstitutionModel.java:44). Masked-out rates become 0."""
    return rates_vec * indicators


def hky_q(kappa, freqs) -> jnp.ndarray:
    kappa = jnp.asarray(kappa, freqs.dtype)
    r = jnp.ones((4, 4), freqs.dtype)
    r = r.at[0, 2].set(kappa).at[2, 0].set(kappa)
    r = r.at[1, 3].set(kappa).at[3, 1].set(kappa)
    return normalized_q(r, freqs)


def empirical_aa_eigen(model_name: str, freqs=None, dtype=jnp.float64) -> EigenSystem:
    """Empirical amino-acid replacement model (ref: src/dr/evomodel/
    substmodel/aminoacid/* — Dayhoff/JTT/WAG/LG/mt*/cpREV/FLU/Blosum62).

    freqs=None uses the model's published frequencies; pass alignment
    frequencies for the +F variants.
    """
    from beast_mcmc_tpu.models.data.aa_matrices import AA_MODELS

    entry = AA_MODELS[model_name.upper()]
    rates = symmetric_rates_from_vector(
        jnp.asarray(entry["rates"], dtype), 20)
    if freqs is None:
        freqs = jnp.asarray(entry["frequencies"], dtype)
    return reversible_eigen(rates, freqs)


def gy94_eigen(kappa, omega, codon_freqs, code=None) -> EigenSystem:
    """Goldman-Yang 1994 codon model (ref: src/dr/evomodel/substmodel/
    codon/GY94CodonModel.java): single-nucleotide codon exchanges with
    rate kappa^[transition] * omega^[nonsynonymous]; reversible wrt the
    codon frequencies."""
    import numpy as _np

    from beast_mcmc_tpu.data.codons import UNIVERSAL_CODE, codon_structure

    single, is_ts, is_nonsyn = codon_structure(code or UNIVERSAL_CODE)
    single = jnp.asarray(single, codon_freqs.dtype)
    is_ts = jnp.asarray(is_ts, codon_freqs.dtype)
    is_nonsyn = jnp.asarray(is_nonsyn, codon_freqs.dtype)
    kappa = jnp.asarray(kappa, codon_freqs.dtype)
    omega = jnp.asarray(omega, codon_freqs.dtype)
    r = single * kappa ** is_ts * omega ** is_nonsyn
    return reversible_eigen(r, codon_freqs)


def mg94_eigen(alpha, beta, kappa, codon_freqs, code=None) -> EigenSystem:
    """Muse-Gaut 1994 codon model, HKY-parameterised (ref:
    src/dr/evomodel/substmodel/codon/MG94HKYCodonModel.java:173-198 —
    synonymous rate alpha (dS), non-synonymous beta (dN), each times
    kappa for transitions; multi-position changes 0). MG94+K80 is the
    uniform-codon-frequency special case (MG94K80CodonModel.java)."""
    from beast_mcmc_tpu.data.codons import UNIVERSAL_CODE, codon_structure

    single, is_ts, is_nonsyn = codon_structure(code or UNIVERSAL_CODE)
    single = jnp.asarray(single, codon_freqs.dtype)
    is_ts = jnp.asarray(is_ts, codon_freqs.dtype)
    is_nonsyn = jnp.asarray(is_nonsyn, codon_freqs.dtype)
    kappa = jnp.asarray(kappa, codon_freqs.dtype)
    alpha = jnp.asarray(alpha, codon_freqs.dtype)
    beta = jnp.asarray(beta, codon_freqs.dtype)
    r = single * kappa ** is_ts * jnp.where(is_nonsyn > 0, beta, alpha)
    return reversible_eigen(r, codon_freqs)


# ---------------------------------------------------------------------------
# Non-reversible / GLM / covarion generators (ref:
# ComplexSubstitutionModel.java, GlmSubstitutionModel.java,
# src/dr/evomodel/substmodel/TwoStateCovarionModel.java + covarion pkg).
# These return normalized Q matrices for the expm transition path
# (ops/expm.py) instead of EigenSystems.
# ---------------------------------------------------------------------------


def complex_q(rates_full: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Non-reversible generator from all S(S-1) off-diagonal rates
    (row-major, skipping the diagonal): Q_ij = r_ij * pi_j, rows sum to 0,
    normalized to unit expected rate (ref: ComplexSubstitutionModel.java
    setupMatrix; used for asymmetric discrete-trait phylogeography)."""
    import numpy as _np

    s = freqs.shape[-1]
    rows, cols = _np.where(~_np.eye(s, dtype=bool))
    r = jnp.zeros((s, s), freqs.dtype).at[rows, cols].set(rates_full)
    q = r * freqs[None, :]
    q = q - jnp.diag(jnp.sum(q, axis=1))
    norm = -jnp.sum(freqs * jnp.diag(q))
    return q / norm


def glm_rates(design: jnp.ndarray, coefficients: jnp.ndarray,
              indicators=None) -> jnp.ndarray:
    """GLM-parameterized log-linear rates (ref: GlmSubstitutionModel.java
    + inference/distribution/GeneralizedLinearModel): rate vector =
    exp(X @ (beta * delta)) with optional BSSVS indicators delta on the
    coefficients. design: [n_rates, n_covariates]."""
    beta = coefficients if indicators is None else coefficients * indicators
    return jnp.exp(design @ beta)


def covarion_q(
    base_rates_sym: jnp.ndarray,  # [S,S] symmetric exchangeabilities
    freqs: jnp.ndarray,  # [S] observed-state frequencies
    class_rates: jnp.ndarray,  # [H] rate multiplier of each hidden class
    class_freqs: jnp.ndarray,  # [H] equilibrium class frequencies
    switch_rate,  # scalar class-switching rate
):
    """Markov-modulated (covarion) generator on S*H product states
    (ref: covarion TwoStateCovarionModel / MarkovModulated*): within class
    h, substitution runs at class_rates[h] * base; classes switch (same
    observed state) at switch_rate * class_freqs[target]. Returns
    (q [SH,SH], product_freqs [SH]) normalized to unit expected
    substitution+switching rate, state layout (class-major) hs = h*S + s.
    """
    s = freqs.shape[-1]
    hclasses = class_rates.shape[-1]
    dt = freqs.dtype
    base_q = base_rates_sym * freqs[None, :]
    base_q = base_q - jnp.diag(jnp.sum(base_q, axis=1))
    sw = jnp.asarray(switch_rate, dt)
    eye_s = jnp.eye(s, dtype=dt)
    # class-block structure: diag blocks r_h * base_q + switching diagonal
    rate_diag = jnp.zeros((hclasses, hclasses), dt).at[
        jnp.arange(hclasses), jnp.arange(hclasses)].set(class_rates)
    q = jnp.kron(rate_diag, base_q)
    # switching: between (h, s) and (h', s) at sw * class_freqs[h']
    switch = sw * jnp.broadcast_to(class_freqs[None, :], (hclasses, hclasses))
    switch = switch * (1.0 - jnp.eye(hclasses, dtype=dt))
    q = q + jnp.kron(switch, eye_s)
    q = q - jnp.diag(jnp.sum(q, axis=1))
    pf = (class_freqs[:, None] * freqs[None, :]).reshape(-1)
    # normalize by the OBSERVED substitution flux only (class switches are
    # hidden events and must not dilute the substitution rate — otherwise
    # the identical-classes covarion would not reduce to the base model)
    subst_rate = -jnp.sum(freqs * jnp.diag(base_q))
    norm = jnp.sum(class_freqs * class_rates) * subst_rate
    return q / norm, pf


def expand_tip_partials_hidden(tip_partials: jnp.ndarray, h: int) -> jnp.ndarray:
    """Tile observed-state tip partials [N,S,P] across H hidden classes ->
    [N, H*S, P] (hidden classes are unobserved: partial 1 for each)."""
    n, s, p = tip_partials.shape
    return jnp.tile(tip_partials, (1, h, 1))
