"""New parametric demographic XML tags driven end-to-end through the
TestXML interpreter (ref parser vocabularies:
src/dr/evomodelxml/coalescent/demographicmodel/*.java). Each case swaps a
demographic block into a small 4-taxon no-clock analysis (the
testCoalescentNoClock.xml shape) and must complete a short chain with the
full-evaluation self-check clean."""

import textwrap

import pytest

from beast_mcmc_tpu.config.interpreter import run_testxml

TEMPLATE = """<?xml version="1.0" standalone="yes"?>
<beast>
  <taxa id="taxa">
    <taxon id="a"/><taxon id="b"/><taxon id="c"/><taxon id="d"/>
  </taxa>
  <alignment id="alignment" dataType="nucleotide">
    <sequence><taxon idref="a"/>ACGTACGTACGTAAGG</sequence>
    <sequence><taxon idref="b"/>ACGTACGAACGTAAGG</sequence>
    <sequence><taxon idref="c"/>ACGAACGTACTTAAGG</sequence>
    <sequence><taxon idref="d"/>AGGTACGTACGTACGG</sequence>
  </alignment>
  <patterns id="patterns" from="1">
    <alignment idref="alignment"/>
  </patterns>
  {demographic}
  <coalescentTree id="startingTree" rootHeight="0.08">
    <taxa idref="taxa"/>
    <constantSize id="simconst" units="substitutions">
      <populationSize><parameter id="sim.pop" value="0.08"/></populationSize>
    </constantSize>
  </coalescentTree>
  <treeModel id="treeModel">
    <coalescentTree idref="startingTree"/>
    <rootHeight><parameter id="treeModel.rootHeight"/></rootHeight>
    <nodeHeights internalNodes="true">
      <parameter id="treeModel.internalNodeHeights"/>
    </nodeHeights>
    <nodeHeights internalNodes="true" rootNode="true">
      <parameter id="treeModel.allInternalNodeHeights"/>
    </nodeHeights>
  </treeModel>
  <coalescentLikelihood id="coalescent">
    <model>{modelref}</model>
    <populationTree><treeModel idref="treeModel"/></populationTree>
  </coalescentLikelihood>
  <HKYModel id="hky">
    <frequencies>
      <frequencyModel dataType="nucleotide">
        <frequencies><parameter id="frequencies" value="0.25 0.25 0.25 0.25"/></frequencies>
      </frequencyModel>
    </frequencies>
    <kappa><parameter id="kappa" value="2.0" lower="0.0"/></kappa>
  </HKYModel>
  <siteModel id="siteModel">
    <substitutionModel><HKYModel idref="hky"/></substitutionModel>
  </siteModel>
  <treeLikelihood id="treeLikelihood" useAmbiguities="false">
    <patterns idref="patterns"/>
    <treeModel idref="treeModel"/>
    <siteModel idref="siteModel"/>
  </treeLikelihood>
  <operators id="operators">
    <scaleOperator scaleFactor="0.75" weight="1">
      <parameter idref="kappa"/>
    </scaleOperator>
    <subtreeSlide size="0.008" gaussian="true" weight="15">
      <treeModel idref="treeModel"/>
    </subtreeSlide>
    <scaleOperator scaleFactor="0.75" weight="3">
      <parameter idref="treeModel.rootHeight"/>
    </scaleOperator>
    <uniformOperator weight="30">
      <parameter idref="treeModel.internalNodeHeights"/>
    </uniformOperator>
  </operators>
  <mcmc id="mcmc" chainLength="2000" autoOptimize="true">
    <posterior id="posterior">
      <prior id="prior">
        <logNormalPrior mean="1.0" stdev="1.25" offset="0.0" meanInRealSpace="false">
          <parameter idref="kappa"/>
        </logNormalPrior>
        <coalescentLikelihood idref="coalescent"/>
      </prior>
      <likelihood id="likelihood">
        <treeLikelihood idref="treeLikelihood"/>
      </likelihood>
    </posterior>
    <operators idref="operators"/>
    <log id="fileLog" logEvery="100" fileName="demo.log" overwrite="true">
      <posterior idref="posterior"/>
      <coalescentLikelihood idref="coalescent"/>
    </log>
  </mcmc>
</beast>
"""

DEMOGRAPHICS = {
    "constantExponential": (
        """<constantExponential id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <growthPhaseStartTime><parameter id="demo.time" value="0.05"/></growthPhaseStartTime>
             <growthRate><parameter id="demo.rate" value="2.0"/></growthRate>
           </constantExponential>""",
        '<constantExponential idref="demo"/>'),
    "exponentialConstant": (
        """<exponentialConstant id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <growthRate><parameter id="demo.rate" value="2.0"/></growthRate>
             <transitionTime><parameter id="demo.time" value="0.05"/></transitionTime>
           </exponentialConstant>""",
        '<exponentialConstant idref="demo"/>'),
    "constantLogistic": (
        """<constantLogistic id="demo" units="substitutions" alpha="0.5">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <ancestralPopulationSize><parameter id="demo.anc" value="0.02"/></ancestralPopulationSize>
             <growthRate><parameter id="demo.rate" value="3.0"/></growthRate>
             <shape><parameter id="demo.shape" value="0.5"/></shape>
           </constantLogistic>""",
        '<constantLogistic idref="demo"/>'),
    "exponentialExponential": (
        """<exponentialExponential id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <growthRate><parameter id="demo.rate" value="2.0"/></growthRate>
             <ancestralGrowthRate><parameter id="demo.anc" value="0.5"/></ancestralGrowthRate>
             <transitionTime><parameter id="demo.time" value="0.04"/></transitionTime>
           </exponentialExponential>""",
        '<exponentialExponential idref="demo"/>'),
    "multiEpochExponential": (
        """<multiEpochExponential id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <growthRate><parameter id="demo.rates" value="2.0 0.0 1.0"/></growthRate>
             <transitionTime><parameter id="demo.times" value="0.03 0.06"/></transitionTime>
           </multiEpochExponential>""",
        '<multiEpochExponential idref="demo"/>'),
    "exponentialSawtooth": (
        """<exponentialSawtooth id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <growthRate><parameter id="demo.rate" value="2.0"/></growthRate>
             <wavelength><parameter id="demo.wl" value="0.05"/></wavelength>
             <offset><parameter id="demo.off" value="0.2"/></offset>
           </exponentialSawtooth>""",
        '<exponentialSawtooth idref="demo"/>'),
    "exponentialLogistic": (
        """<exponentialLogistic id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.1"/></populationSize>
             <logisticGrowthRate><parameter id="demo.lr" value="3.0"/></logisticGrowthRate>
             <logisticShape><parameter id="demo.ls" value="0.3"/></logisticShape>
             <exponentialGrowthRate><parameter id="demo.er" value="0.5"/></exponentialGrowthRate>
             <transitionTime><parameter id="demo.tt" value="0.05"/></transitionTime>
           </exponentialLogistic>""",
        '<exponentialLogistic idref="demo"/>'),
    "powerLawGrowth": (
        """<powerLawGrowth id="demo" units="substitutions">
             <populationSize><parameter id="demo.pop" value="0.5"/></populationSize>
             <power><parameter id="demo.r" value="1.5"/></power>
           </powerLawGrowth>""",
        '<powerLawGrowth idref="demo"/>'),
    "linearGrowth": (
        """<linearGrowth id="demo" units="substitutions">
             <slope><parameter id="demo.slope" value="2.0"/></slope>
           </linearGrowth>""",
        '<linearGrowth idref="demo"/>'),
}


# linear/power-law growth have N(0) = 0 — the reference's negative-time
# convention requires serially-sampled tips (a lone youngest tip at the
# time origin); contemporaneous tips give a correctly infinite intensity
DATED = {"linearGrowth", "powerLawGrowth"}

DATED_TAXA = """<taxa id="taxa">
    <taxon id="a"><date value="0.00" direction="backwards" units="substitutions"/></taxon>
    <taxon id="b"><date value="0.02" direction="backwards" units="substitutions"/></taxon>
    <taxon id="c"><date value="0.04" direction="backwards" units="substitutions"/></taxon>
    <taxon id="d"><date value="0.06" direction="backwards" units="substitutions"/></taxon>
  </taxa>"""


@pytest.mark.parametrize("name", sorted(DEMOGRAPHICS))
def test_demographic_xml_tag_runs(name, tmp_path):
    block, ref = DEMOGRAPHICS[name]
    xml = TEMPLATE.format(demographic=textwrap.dedent(block), modelref=ref)
    if name in DATED:
        xml = xml.replace(
            """<taxa id="taxa">
    <taxon id="a"/><taxon id="b"/><taxon id="c"/><taxon id="d"/>
  </taxa>""", DATED_TAXA)
        assert "date value" in xml
    p = tmp_path / f"{name}.xml"
    p.write_text(xml)
    # completes a short chain with full-evaluation self-check clean
    run_testxml(str(p), scale=1.0, seed=7, max_states=2000,
                full_eval_steps=50)
