"""Native C++ data-layer tests (fastdata.cpp via ctypes) vs Python paths."""

import os

import numpy as np
import pytest

from beast_mcmc_tpu.native import (
    compress_patterns_native,
    get_lib,
    parse_fasta_native,
    parse_newick_native,
)
from beast_mcmc_tpu.tree.topology import _parse_newick_py, parse_newick

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def test_compress_patterns_matches_numpy():
    rng = np.random.default_rng(0)
    states = rng.integers(0, 5, size=(9, 500)).astype(np.uint8)
    states[:, 100:200] = states[:, 0:100]  # force duplicates
    pats, w = compress_patterns_native(states)
    uniq, counts = np.unique(states, axis=1, return_counts=True)
    assert pats.shape == uniq.shape
    assert w.sum() == 500
    # same multiset of (pattern, weight)
    native = sorted(zip(map(bytes, pats.T.copy()), w))
    ref = sorted(zip(map(bytes, uniq.T.copy()), counts.astype(float)))
    assert native == ref


def test_parse_newick_native_matches_python():
    s = "((A:1.0,B:2.0):0.5,(C:0.25,'D d':0.75):1.5);"
    pn, cn, hn, rn, tn = parse_newick(s)  # dispatches native
    pp, cp, hp, rp, tp = _parse_newick_py(s)
    assert tn == tp
    np.testing.assert_array_equal(pn, pp)
    np.testing.assert_array_equal(cn, cp)
    np.testing.assert_allclose(hn, hp)
    assert rn == rp


def test_parse_newick_taxa_reorder_and_dates():
    s = "((B:1.0,A:2.0):0.5,C:1.5);"
    taxa = ["A", "B", "C"]
    pn, cn, hn, rn, tn = parse_newick(s, taxa=taxa)
    pp, cp, hp, rp, tp = _parse_newick_py(s, taxa=taxa)
    np.testing.assert_array_equal(pn, pp)
    np.testing.assert_array_equal(cn, cp)
    np.testing.assert_allclose(hn, hp)
    # dated tips anchor
    dates = {"A": 0.0, "B": 1.0, "C": 0.5}
    pn2, cn2, hn2, rn2, tn2 = parse_newick(s, taxa=taxa, tip_heights=dates)
    pp2, cp2, hp2, rp2, tp2 = _parse_newick_py(s, taxa=taxa, tip_heights=dates)
    np.testing.assert_allclose(hn2, hp2)


def test_parse_newick_malformed_falls_back_cleanly():
    with pytest.raises(Exception):
        parse_newick("((A:1.0,B:2.0;")  # both paths must reject


def test_parse_fasta_native(tmp_path):
    path = tmp_path / "x.fa"
    path.write_text(">s1 desc\nAC-GT\nNNAC\n>s2\nttttccccg\n")
    table = np.full(256, 0xFF, np.uint8)
    for ch, code in zip("ACGTacgt-N?", [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4]):
        table[ord(ch)] = code
    states, names = parse_fasta_native(str(path), table)
    assert names == ["s1 desc", "s2"]
    np.testing.assert_array_equal(
        states[0], [0, 1, 4, 2, 3, 4, 4, 0, 1]
    )
    np.testing.assert_array_equal(
        states[1], [3, 3, 3, 3, 1, 1, 1, 1, 2]
    )


def test_sitepatterns_uses_native(monkeypatch):
    from beast_mcmc_tpu.data.alignment import Alignment, SitePatterns
    from beast_mcmc_tpu.data.datatype import NUCLEOTIDES

    aln = Alignment.from_sequences(
        ["a", "b", "c"], ["ACGTACGT", "ACGTACGA", "ACGTACGT"], NUCLEOTIDES
    )
    pats = SitePatterns.from_alignment(aln)
    assert pats.weights.sum() == 8
    # identical likelihood inputs regardless of backend
    monkeypatch.setenv("BEAST_MCMC_TPU_NO_NATIVE", "1")
    import beast_mcmc_tpu.native as nat
    old = nat._lib
    nat._lib = None
    try:
        pats2 = SitePatterns.from_alignment(aln)
    finally:
        nat._lib = old
    assert sorted(pats.weights.tolist()) == sorted(pats2.weights.tolist())
    a = sorted(map(bytes, pats.states.astype(np.uint8).T.copy()))
    b = sorted(map(bytes, pats2.states.astype(np.uint8).T.copy()))
    assert a == b
