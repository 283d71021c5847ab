"""Amino-acid and codon model tests."""

import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.data.codons import (
    UNIVERSAL_CODE,
    codon_datatype,
    codon_structure,
    encode_codon_alignment,
    sense_codons,
)
from beast_mcmc_tpu.data.datatype import AMINO_ACIDS
from beast_mcmc_tpu.models.data.aa_matrices import AA_MODELS
from beast_mcmc_tpu.models.substitution import empirical_aa_eigen, gy94_eigen
from beast_mcmc_tpu.ops.eigen import transition_probs
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.models.sitemodel import single_rate
from beast_mcmc_tpu.tree.topology import parse_newick


def test_aa_models_inventory():
    assert {"WAG", "LG", "JTT", "DAYHOFF", "BLOSUM62", "CPREV", "MTREV",
            "FLU"} <= set(AA_MODELS)
    for name, entry in AA_MODELS.items():
        assert len(entry["rates"]) == 190
        assert len(entry["frequencies"]) == 20
        np.testing.assert_allclose(sum(entry["frequencies"]), 1.0, atol=1e-12)


def test_aa_eigen_valid_generator():
    for name in ["WAG", "LG", "JTT", "DAYHOFF"]:
        eig = empirical_aa_eigen(name)
        p = np.asarray(transition_probs(eig, jnp.asarray([0.1, 2.0])))
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-9)
        assert (p >= 0).all()
        # stationary distribution = model frequencies
        freqs = np.asarray(AA_MODELS[name]["frequencies"])
        np.testing.assert_allclose(
            np.asarray(transition_probs(eig, jnp.asarray(2000.0)))[0],
            freqs, atol=1e-6)


def test_aa_tree_likelihood():
    """Tiny AA analysis end-to-end through the peeling kernel."""
    taxa = ["a", "b", "c"]
    seqs = ["ACDEF", "ACDEW", "ACDEY"]
    from beast_mcmc_tpu.data.alignment import Alignment, SitePatterns

    pats = SitePatterns.from_alignment(
        Alignment.from_sequences(taxa, seqs, AMINO_ACIDS))
    parent, children, heights, root, _ = parse_newick("((a:0.1,b:0.1):0.1,c:0.2);")
    tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    eig = empirical_aa_eigen("WAG")
    rates, w = single_rate()
    ll = tree_loglikelihood(
        tips, jnp.asarray(pats.weights), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root, eig,
        jnp.asarray(AA_MODELS["WAG"]["frequencies"]), rates, w, 1.0)
    assert np.isfinite(float(ll)) and float(ll) < 0


def test_codon_datatype_and_code():
    codons = sense_codons()
    assert len(codons) == 61  # universal code: 64 - 3 stops
    assert "ATG" in codons and "TAA" not in codons
    dt = codon_datatype()
    assert dt.state_count == 61
    single, is_ts, is_nonsyn = codon_structure()
    # classification sanity: TTT(F)->TTC(F) synonymous transition
    i, j = codons.index("TTT"), codons.index("TTC")
    assert single[i, j] == 1 and is_ts[i, j] == 1 and is_nonsyn[i, j] == 0
    # TTT(F)->TTA(L): nonsynonymous transversion
    k = codons.index("TTA")
    assert single[i, k] == 1 and is_ts[i, k] == 0 and is_nonsyn[i, k] == 1
    # two-position difference excluded
    m = codons.index("TCC")
    assert single[i, m] == 0
    # symmetric
    np.testing.assert_array_equal(single, single.T)


def test_codon_encoding():
    from beast_mcmc_tpu.data.alignment import Alignment

    aln = Alignment.from_sequences(["a", "b"], ["ATGTTT", "ATGT-T"])
    cods = encode_codon_alignment(aln.states)
    codons = sense_codons()
    assert cods[0, 0] == codons.index("ATG")
    assert cods[0, 1] == codons.index("TTT")
    assert cods[1, 1] == 61  # gap-containing triplet -> fully ambiguous


def test_gy94_transition_probs():
    codons = sense_codons()
    freqs = jnp.asarray(np.full(61, 1.0 / 61))
    eig = gy94_eigen(2.0, 0.5, freqs)
    p = np.asarray(transition_probs(eig, jnp.asarray([0.0, 0.1, 1.0])))
    np.testing.assert_allclose(p[0], np.eye(61), atol=1e-8)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-8)
    assert (p >= 0).all()
    # omega<1 suppresses nonsynonymous changes relative to omega=1
    eig1 = gy94_eigen(2.0, 1.0, freqs)
    p1 = np.asarray(transition_probs(eig1, jnp.asarray(0.1)))
    _, _, nonsyn = codon_structure()
    assert (p[1] * nonsyn).sum() < (p1 * nonsyn).sum()
