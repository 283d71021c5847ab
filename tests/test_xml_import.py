"""BEAST XML importer tests.

A self-contained fixture XML (written here, in the reference vocabulary)
covers the parse->spec->build->run pipeline; when the reference repo is
mounted, its own testStrictClock.xml is parsed too (parity with the real
public API surface).
"""

import os

import jax
import numpy as np
import pytest

import beast_mcmc_tpu.config.spec as S
from beast_mcmc_tpu.config.builder import build
from beast_mcmc_tpu.config.xml_import import parse_beast_xml, parse_beast_xml_file

FIXTURE = """<?xml version="1.0"?>
<beast>
  <taxa id="taxa">
    <taxon id="A"><date value="2000.0" direction="forwards" units="years"/></taxon>
    <taxon id="B"><date value="2005.0" direction="forwards" units="years"/></taxon>
    <taxon id="C"><date value="2010.0" direction="forwards" units="years"/></taxon>
    <taxon id="D"><date value="2010.0" direction="forwards" units="years"/></taxon>
  </taxa>
  <alignment id="alignment" dataType="nucleotide">
    <sequence><taxon idref="A"/>ACGTACGTAAGGCCTT</sequence>
    <sequence><taxon idref="B"/>ACGTACGAAAGGCCTA</sequence>
    <sequence><taxon idref="C"/>ACTTACGTAAGGCTTT</sequence>
    <sequence><taxon idref="D"/>ACGTACGTAAGACCTT</sequence>
  </alignment>
  <patterns id="patterns" from="1">
    <alignment idref="alignment"/>
  </patterns>
  <constantSize id="constant" units="years">
    <populationSize><parameter id="constant.popSize" value="10.0" lower="0.0"/></populationSize>
  </constantSize>
  <coalescentSimulator id="startingTree">
    <taxa idref="taxa"/><constantSize idref="constant"/>
  </coalescentSimulator>
  <treeModel id="treeModel">
    <coalescentTree idref="startingTree"/>
    <rootHeight><parameter id="treeModel.rootHeight"/></rootHeight>
  </treeModel>
  <coalescentLikelihood id="coalescent">
    <model><constantSize idref="constant"/></model>
    <populationTree><treeModel idref="treeModel"/></populationTree>
  </coalescentLikelihood>
  <strictClockBranchRates id="branchRates">
    <rate><parameter id="clock.rate" value="0.01" lower="0.0"/></rate>
  </strictClockBranchRates>
  <gtrModel id="gtr">
    <frequencies>
      <frequencyModel dataType="nucleotide">
        <frequencies><parameter id="frequencies" value="0.3 0.2 0.2 0.3"/></frequencies>
      </frequencyModel>
    </frequencies>
    <rateAC><parameter id="gtr.ac" value="1.0"/></rateAC>
    <rateAG><parameter id="gtr.ag" value="2.0"/></rateAG>
    <rateAT><parameter id="gtr.at" value="1.0"/></rateAT>
    <rateCG><parameter id="gtr.cg" value="1.0"/></rateCG>
    <rateCT><parameter id="gtr.ct" value="2.0"/></rateCT>
    <rateGT><parameter id="gtr.gt" value="1.0"/></rateGT>
  </gtrModel>
  <siteModel id="siteModel">
    <substitutionModel><gtrModel idref="gtr"/></substitutionModel>
    <gammaShape gammaCategories="4">
      <parameter id="alpha" value="0.5" lower="0.0"/>
    </gammaShape>
  </siteModel>
  <treeLikelihood id="treeLikelihood" useAmbiguities="false">
    <patterns idref="patterns"/>
    <treeModel idref="treeModel"/>
    <siteModel idref="siteModel"/>
    <strictClockBranchRates idref="branchRates"/>
  </treeLikelihood>
  <operators id="operators">
    <scaleOperator scaleFactor="0.75" weight="1"><parameter idref="alpha"/></scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="1"><parameter idref="clock.rate"/></scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="3"><parameter idref="constant.popSize"/></scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="2"><parameter idref="gtr.ac"/></scaleOperator>
  </operators>
  <mcmc id="mcmc" chainLength="50000" autoOptimize="true">
    <posterior id="posterior">
      <prior id="prior">
        <logNormalPrior mean="1.0" stdev="1.25" offset="0.0" meanInRealSpace="false">
          <parameter idref="alpha"/>
        </logNormalPrior>
        <gammaPrior shape="0.05" scale="20.0">
          <parameter idref="gtr.ac"/>
        </gammaPrior>
        <ctmcScalePrior>
          <ctmcScale><parameter idref="clock.rate"/></ctmcScale>
          <treeModel idref="treeModel"/>
        </ctmcScalePrior>
        <oneOnXPrior><parameter idref="constant.popSize"/></oneOnXPrior>
        <coalescentLikelihood idref="coalescent"/>
      </prior>
      <likelihood id="likelihood"><treeLikelihood idref="treeLikelihood"/></likelihood>
    </posterior>
    <operators idref="operators"/>
    <log id="fileLog" logEvery="500" fileName="test.log"/>
  </mcmc>
</beast>
"""

REF_XML = "/root/reference/examples/TestXML/ClockModels/testStrictClock.xml"


def test_fixture_parses_to_spec():
    spec = parse_beast_xml(FIXTURE)
    assert len(spec.partitions) == 1
    part = spec.partitions[0]
    assert isinstance(part.substitution, S.GTR)
    np.testing.assert_allclose(
        part.substitution.rates.init, [1, 2, 1, 1, 2, 1])
    assert part.substitution.frequencies == [0.3, 0.2, 0.2, 0.3]
    assert part.site_model.categories == 4
    assert isinstance(part.site_model.alpha.prior, S.LogNormalPrior)
    assert part.site_model.alpha.estimate
    assert isinstance(spec.clock, S.StrictClock)
    assert isinstance(spec.clock.rate.prior, S.CTMCScalePrior)
    assert spec.clock.rate.init == 0.01
    assert isinstance(spec.tree_prior, S.ConstantCoalescent)
    assert spec.tree_prior.pop_size.init == 10.0
    assert spec.mcmc.chain_length == 50000
    assert spec.mcmc.log_every == 500
    # dated tips: forwards dates -> heights from most recent
    assert spec.tree.tip_heights == {"A": 10.0, "B": 5.0, "C": 0.0, "D": 0.0}
    # GTR rates param flagged estimable through its component operator
    assert part.substitution.rates.estimate


def test_fixture_builds_and_runs():
    from beast_mcmc_tpu.inference.mcmc import (
        init_mcmc_state, make_mcmc_step, run_chain)

    spec = parse_beast_xml(FIXTURE)
    spec.mcmc.chain_length = 500
    analysis = build(spec)
    step = make_mcmc_step(analysis.log_posterior, analysis.operators)
    state = init_mcmc_state(
        analysis.params0, analysis.tree0, jax.random.PRNGKey(0),
        analysis.operators, analysis.log_posterior)
    lp0 = float(state.log_posterior)
    assert np.isfinite(lp0)
    state, _ = jax.jit(lambda s: run_chain(step, s, 500))(state)
    assert np.isfinite(float(state.log_posterior))
    # dated tips respected in the built tree
    h = np.asarray(state.tree.heights[:4])
    np.testing.assert_allclose(h, [10.0, 5.0, 0.0, 0.0])


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference not mounted")
def test_reference_xml_parses():
    spec = parse_beast_xml_file(REF_XML)
    part = spec.partitions[0]
    assert part.patterns.n_taxa == 17
    assert part.patterns.n_patterns == 138  # the file's own npatterns
    assert isinstance(part.substitution, S.HKY)
    assert isinstance(spec.tree_prior, S.ConstantCoalescent)
    assert spec.tree_prior.pop_size.init == 380.0
    assert isinstance(spec.clock.rate.prior, S.CTMCScalePrior)
    # serial tips (1956..1994)
    th = spec.tree.tip_heights
    assert max(th.values()) == pytest.approx(38.0)


def test_unknown_prior_raises():
    bad = FIXTURE.replace("oneOnXPrior", "halfCauchyPrior")
    with pytest.raises(NotImplementedError):
        parse_beast_xml(bad)
