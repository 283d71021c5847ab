"""Discrete phylogeography (BSSVS) end-to-end through the XML surface.

Oracles:
  - the discrete-location likelihood from <ancestralTreeLikelihood> over
    a generalDataType matches brute-force enumeration of internal states
    (numpy, all 2^internal assignments) on a fixed 4-taxon tree;
  - a joint sequence+location BSSVS chain runs and writes ancestral
    location annotations into the NEXUS tree log (ref:
    AncestralStateBeagleTreeLikelihood.java:274, TreeLogger.java).
"""

import os

import numpy as np
import pytest

from beast_mcmc_tpu.config.interpreter import XmlAnalysis
from beast_mcmc_tpu.config.xml_assert import initial_eval_state

XML = """<?xml version="1.0"?>
<beast>
  <taxa id="taxa">
    <taxon id="A"><attr name="loc">north</attr></taxon>
    <taxon id="B"><attr name="loc">north</attr></taxon>
    <taxon id="C"><attr name="loc">south</attr></taxon>
    <taxon id="D"><attr name="loc">south</attr></taxon>
  </taxa>
  <generalDataType id="geo">
    <state code="north"/>
    <state code="south"/>
  </generalDataType>
  <attributePatterns id="geoPatterns" attribute="loc">
    <generalDataType idref="geo"/>
    <taxa idref="taxa"/>
  </attributePatterns>
  <newick id="startingTree">
    ((A:1.0,B:1.0):1.0,(C:1.5,D:1.5):0.5)
  </newick>
  <treeModel id="treeModel">
    <newick idref="startingTree"/>
    <rootHeight><parameter id="treeModel.rootHeight"/></rootHeight>
    <nodeHeights internalNodes="true">
      <parameter id="treeModel.internalNodeHeights"/>
    </nodeHeights>
  </treeModel>
  <strictClockBranchRates id="clock">
    <rate><parameter id="clock.rate" value="1.0"/></rate>
  </strictClockBranchRates>
  <svsGeneralSubstitutionModel id="geoModel">
    <generalDataType idref="geo"/>
    <frequencies>
      <frequencyModel id="geoFreqs" normalize="true">
        <generalDataType idref="geo"/>
        <frequencies><parameter id="geo.frequencies" value="0.5 0.5"/></frequencies>
      </frequencyModel>
    </frequencies>
    <rates><parameter id="geo.rates" value="1.4 0.6"/></rates>
    <rateIndicator><parameter id="geo.indicators" value="1 1"/></rateIndicator>
  </svsGeneralSubstitutionModel>
  <siteModel id="geoSiteModel">
    <substitutionModel><svsGeneralSubstitutionModel idref="geoModel"/></substitutionModel>
  </siteModel>
  <ancestralTreeLikelihood id="geoLikelihood" tagName="loc">
    <attributePatterns idref="geoPatterns"/>
    <treeModel idref="treeModel"/>
    <siteModel idref="geoSiteModel"/>
    <strictClockBranchRates idref="clock"/>
  </ancestralTreeLikelihood>
  <operators id="operators">
    <scaleOperator scaleFactor="0.75" weight="1">
      <parameter idref="geo.rates"/>
    </scaleOperator>
    <bitFlipOperator weight="1">
      <parameter idref="geo.indicators"/>
    </bitFlipOperator>
  </operators>
  <mcmc id="mcmc" chainLength="200">
    <posterior id="posterior">
      <prior id="prior">
        <cachedPrior>
          <gammaPrior shape="1.0" scale="1.0" offset="0.0">
            <parameter idref="geo.rates"/>
          </gammaPrior>
          <parameter idref="geo.rates"/>
        </cachedPrior>
        <svsGeneralSubstitutionModel idref="geoModel"/>
      </prior>
      <likelihood id="likelihood">
        <ancestralTreeLikelihood idref="geoLikelihood"/>
      </likelihood>
    </posterior>
    <operators idref="operators"/>
    <log logEvery="20" fileName="bssvs_test.log">
      <posterior idref="posterior"/>
    </log>
    <logTree logEvery="20" nexusFormat="true" fileName="bssvs_test.trees">
      <treeModel idref="treeModel"/>
      <ancestralTreeLikelihood idref="geoLikelihood"/>
    </logTree>
  </mcmc>
</beast>
"""


def _brute_force_location_loglik(q, pi, tips, parent, children, heights,
                                 root, n):
    """Sum over all internal-state assignments of prod P(t)."""
    from scipy.linalg import expm

    m = parent.shape[0]
    internals = [i for i in range(m) if i >= n]
    total = 0.0
    for assign in range(2 ** len(internals)):
        states = list(tips) + [0] * len(internals)
        for j, node in enumerate(internals):
            states[node] = (assign >> j) & 1
        p = pi[states[root]]
        for i in range(m):
            if parent[i] >= 0:
                t = heights[parent[i]] - heights[i]
                pm = expm(q * t)
                p *= pm[states[parent[i]], states[i]]
        total += p
    return np.log(total)


@pytest.fixture
def bssvs_xml(tmp_path):
    path = tmp_path / "bssvs.xml"
    path.write_text(XML)
    return str(path)


def test_location_likelihood_matches_enumeration(bssvs_xml, tmp_path):
    ax = XmlAnalysis(bssvs_xml, workdir=str(tmp_path))
    lik = ax.build(ax._ids["geoLikelihood"])
    params0, tree0 = initial_eval_state(ax)
    got = float(lik.fn(params0, tree0))

    # reference semantics: Q[0,1] = r0*pi1, Q[1,0] = r1*pi0 (upper then
    # transposed lower, ComplexSubstitutionModel.setupQMatrix), then
    # normalized to mean rate 1 under pi
    pi = np.array([0.5, 0.5])
    q = np.array([[0.0, 1.4 * 0.5], [0.6 * 0.5, 0.0]])
    np.fill_diagonal(q, -q.sum(axis=1))
    q /= -(pi * np.diag(q)).sum()
    parent = np.asarray(tree0.parent)
    children = np.asarray(tree0.children)
    heights = np.asarray(tree0.heights)
    tips = [0, 0, 1, 1]  # north north south south
    want = _brute_force_location_loglik(
        q, pi, tips, parent, children, heights, int(tree0.root), 4)
    assert got == pytest.approx(want, abs=1e-9)


def test_bssvs_chain_writes_annotated_tree_log(bssvs_xml, tmp_path):
    ax = XmlAnalysis(bssvs_xml, workdir=str(tmp_path))
    ax.run()
    trees = (tmp_path / "bssvs_test.trees").read_text()
    assert "tree STATE_" in trees
    # every node of every sampled tree carries a location annotation
    assert 'loc="north"' in trees or 'loc="south"' in trees
    first = trees.split("tree STATE_")[1]
    assert first.count("[&loc=") == 7  # 4 tips + 2 internals + root
