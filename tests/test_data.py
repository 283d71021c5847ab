"""Data-layer tests: datatypes, pattern compression, empirical frequencies,
Newick round-trip (oracle: the reference's testNewickTree expected string,
src/test/dr/evomodel/treelikelihood/LikelihoodTest.java:84-90)."""

import numpy as np

from beast_mcmc_tpu.data.alignment import Alignment, SitePatterns
from beast_mcmc_tpu.data.datatype import AMINO_ACIDS, BINARY, NUCLEOTIDES, general_datatype
from beast_mcmc_tpu.data.io import read_fasta, read_nexus, write_fasta
from beast_mcmc_tpu.tree.topology import parse_newick, simulate_coalescent_tree, to_newick

from fixtures import PRIMATE_NEWICK, PRIMATE_TAXA, primate_alignment, primate_patterns


def test_nucleotide_codes():
    dt = NUCLEOTIDES
    assert dt.state_count == 4
    assert [dt.char_map[c] for c in "ACGT"] == [0, 1, 2, 3]
    assert dt.char_map["U"] == 3
    assert dt.state_set_mask(dt.char_map["R"]).tolist() == [True, False, True, False]
    assert dt.state_set_mask(dt.char_map["-"]).all()
    assert not dt.is_ambiguous(0)
    assert dt.is_ambiguous(dt.char_map["N"])
    tab = dt.ambiguity_table()
    assert tab.shape == (dt.num_codes, 4)
    assert tab[dt.char_map["Y"]].tolist() == [0.0, 1.0, 0.0, 1.0]


def test_amino_acid_and_binary():
    assert AMINO_ACIDS.state_count == 20
    assert AMINO_ACIDS.encode("ACDX-").tolist()[:3] == [0, 1, 2]
    assert AMINO_ACIDS.state_set_mask(AMINO_ACIDS.char_map["B"]).sum() == 2
    assert BINARY.encode("01?-").tolist() == [0, 1, 2, 3]


def test_general_datatype():
    dt = general_datatype(["uk", "us", "cn"])
    assert dt.state_count == 3
    assert dt.encode("?")[0] == dt.unknown_code
    assert dt.state_set_mask(dt.char_map["US"]).tolist() == [False, True, False]


def test_pattern_compression():
    aln = primate_alignment()
    assert aln.n_taxa == 6
    assert aln.n_sites == 768
    pats = SitePatterns.from_alignment(aln)
    # compression is lossless: weights sum to site count
    assert pats.weights.sum() == aln.n_sites
    assert pats.n_patterns < aln.n_sites
    # every pattern occurs as some alignment column
    cols = {tuple(aln.states[:, j]) for j in range(aln.n_sites)}
    for p in range(pats.n_patterns):
        assert tuple(pats.states[:, p]) in cols


def test_codon_position_patterns():
    aln = primate_alignment()
    p1 = SitePatterns.from_alignment(aln, site_range=(0, -1), every=3)
    p2 = SitePatterns.from_alignment(aln, site_range=(1, -1), every=3)
    assert p1.n_sites == 256 and p2.n_sites == 256
    assert p1.weights.sum() == 256


def test_empirical_frequencies():
    pats = primate_patterns()
    f = pats.empirical_frequencies()
    assert abs(f.sum() - 1.0) < 1e-12
    # mtDNA is A/C rich here; sanity window
    assert f.min() > 0.1 and f.max() < 0.4
    # EM fixed point: recompute starting from the answer stays put
    f2 = pats.empirical_frequencies()
    np.testing.assert_allclose(f, f2, rtol=1e-9)


def test_newick_roundtrip():
    parent, children, heights, root, taxa = parse_newick(PRIMATE_NEWICK, taxa=PRIMATE_TAXA)
    n = len(taxa)
    assert parent.shape == (2 * n - 1,)
    assert (parent >= 0).sum() == 2 * n - 2
    assert parent[root] == -1
    np.testing.assert_allclose(heights[root], 0.099582, atol=1e-9)
    np.testing.assert_allclose(heights[:n], 0.0, atol=1e-9)
    # child-parent height invariant
    for i in range(2 * n - 1):
        if parent[i] >= 0:
            assert heights[parent[i]] > heights[i]
    out = to_newick(parent, children, heights, root, taxa)
    # reparse gives identical heights/topology (up to child order)
    p2, c2, h2, r2, _ = parse_newick(out, taxa=PRIMATE_TAXA)
    np.testing.assert_allclose(np.sort(h2), np.sort(heights), atol=1e-6)
    # the reference's canonical form of this tree
    assert out == PRIMATE_NEWICK


def test_fasta_roundtrip():
    aln = primate_alignment()
    txt = write_fasta(aln)
    aln2 = read_fasta(txt)
    assert aln2.taxa == aln.taxa
    np.testing.assert_array_equal(aln2.states, aln.states)


def test_nexus_parse():
    nexus = """#NEXUS
BEGIN DATA;
DIMENSIONS NTAX=2 NCHAR=4;
FORMAT DATATYPE=DNA MISSING=? GAP=-;
MATRIX
a ACGT
b AC-T
;
END;
BEGIN TREES;
TRANSLATE 1 a, 2 b;
TREE t1 = (1:1.0,2:1.0);
END;
"""
    aln, trees = read_nexus(nexus)
    assert aln.taxa == ["a", "b"]
    assert aln.states[0].tolist() == [0, 1, 2, 3]
    assert "t1" in trees
    parent, children, heights, root, taxa = parse_newick(trees["t1"])
    assert taxa == ["a", "b"]


def test_coalescent_simulator():
    rng = np.random.default_rng(0)
    tips = np.array([0.0, 0.0, 1.0, 2.5, 0.3])
    parent, children, heights, root = simulate_coalescent_tree(rng, tips, pop_size=2.0)
    n = len(tips)
    np.testing.assert_allclose(heights[:n], tips)
    for i in range(2 * n - 1):
        if parent[i] >= 0:
            assert heights[parent[i]] > heights[i]
    assert parent[root] == -1


def test_tip_states_and_partials():
    pats = primate_patterns()
    tp = pats.tip_partials()
    assert tp.shape == (6, pats.n_patterns, 4)
    ts = pats.tip_states_unambiguous()
    # ambiguous codes collapse to state_count
    gap_cols = pats.states > 3
    assert (ts[gap_cols] == 4).all()
    assert (ts[~gap_cols] < 4).all()


def test_nexus_format_vocabulary():
    """FORMAT gap/missing/matchchar, interleave, quoted names, NTAX/NCHAR
    validation (VERDICT r1 weak #7; ref: NexusImporter.java)."""
    from beast_mcmc_tpu.data.io import read_nexus

    nex = """#NEXUS
BEGIN DATA;
  DIMENSIONS NTAX=3 NCHAR=8;
  FORMAT DATATYPE=DNA GAP=~ MISSING=x MATCHCHAR=. INTERLEAVE;
  MATRIX
  'taxon one'  ACGT
  taxon2       AC~T
  taxon3       ..xT
  'taxon one'  TTAA
  taxon2       TTAA
  taxon3       .CAA
  ;
END;
BEGIN TREES;
  TRANSLATE 1 'taxon one', 2 taxon2, 3 taxon3;
  TREE t1 = ((1:1,2:1):1,3:2);
END;
"""
    aln, trees = read_nexus(nex)
    assert aln.taxa == ["taxon_one", "taxon2", "taxon3"]
    assert aln.n_sites == 8
    assert aln.datatype.decode(aln.states[1]) == "AC-TTTAA"
    # matchchar copies the first row; missing becomes ?
    assert aln.datatype.decode(aln.states[2]) == "AC?TTCAA"
    assert "t1" in trees and "taxon_one" in trees["t1"]


def test_nexus_ntax_mismatch_raises():
    from beast_mcmc_tpu.data.io import read_nexus

    bad = """#NEXUS
BEGIN DATA;
  DIMENSIONS NTAX=5 NCHAR=4;
  FORMAT DATATYPE=DNA;
  MATRIX
  a ACGT
  b ACGT
  ;
END;
"""
    try:
        read_nexus(bad)
        assert False, "expected NTAX mismatch error"
    except ValueError as e:
        assert "NTAX" in str(e)
