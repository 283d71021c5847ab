"""<distributionLikelihood> through the TestXML interpreter (ref:
src/dr/inferencexml/distribution/DistributionLikelihoodParser.java).

Conjugate oracle: data y = (1,2,3) fixed, likelihood y_i ~ N(m, 1) via a
normalDistributionModel whose mean parameter is ESTIMATED, prior
m ~ N(0, 10). Posterior mean of m is (n ybar / s^2) / (n / s^2 + 1/100)
= 6 / 3.01 = 1.9934 — asserted by the file's own embedded
<traceAnalysis><expectation>."""

from beast_mcmc_tpu.config.interpreter import run_testxml

XML = """<?xml version="1.0" standalone="yes"?>
<beast>
  <taxa id="taxa">
    <taxon id="a"/><taxon id="b"/><taxon id="c"/><taxon id="d"/>
  </taxa>
  <alignment id="alignment" dataType="nucleotide">
    <sequence><taxon idref="a"/>ACGTACGT</sequence>
    <sequence><taxon idref="b"/>ACGTACGA</sequence>
    <sequence><taxon idref="c"/>ACGAACGT</sequence>
    <sequence><taxon idref="d"/>AGGTACGT</sequence>
  </alignment>
  <patterns id="patterns" from="1"><alignment idref="alignment"/></patterns>
  <constantSize id="constant" units="substitutions">
    <populationSize><parameter id="constant.popSize" value="0.08"/></populationSize>
  </constantSize>
  <coalescentTree id="startingTree" rootHeight="0.08">
    <taxa idref="taxa"/><constantSize idref="constant"/>
  </coalescentTree>
  <treeModel id="treeModel">
    <coalescentTree idref="startingTree"/>
    <rootHeight><parameter id="treeModel.rootHeight"/></rootHeight>
    <nodeHeights internalNodes="true">
      <parameter id="treeModel.internalNodeHeights"/>
    </nodeHeights>
  </treeModel>
  <coalescentLikelihood id="coalescent">
    <model><constantSize idref="constant"/></model>
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

  <distributionLikelihood id="metaLik">
    <distribution>
      <normalDistributionModel>
        <mean><parameter id="m" value="0.0"/></mean>
        <stdev><parameter id="m.sd" value="1.0"/></stdev>
      </normalDistributionModel>
    </distribution>
    <data>
      <parameter id="y" value="1.0 2.0 3.0"/>
    </data>
  </distributionLikelihood>

  <operators id="operators">
    <subtreeSlide size="0.008" gaussian="true" weight="5">
      <treeModel idref="treeModel"/>
    </subtreeSlide>
    <scaleOperator scaleFactor="0.75" weight="2">
      <parameter idref="treeModel.rootHeight"/>
    </scaleOperator>
    <uniformOperator weight="10">
      <parameter idref="treeModel.internalNodeHeights"/>
    </uniformOperator>
    <randomWalkOperator windowSize="0.8" weight="20">
      <parameter idref="m"/>
    </randomWalkOperator>
  </operators>
  <mcmc id="mcmc" chainLength="60000" autoOptimize="true">
    <posterior id="posterior">
      <prior id="prior">
        <normalPrior mean="0.0" stdev="10.0">
          <parameter idref="m"/>
        </normalPrior>
        <coalescentLikelihood idref="coalescent"/>
      </prior>
      <likelihood id="likelihood">
        <treeLikelihood idref="treeLikelihood"/>
        <distributionLikelihood idref="metaLik"/>
      </likelihood>
    </posterior>
    <operators idref="operators"/>
    <log id="fileLog" logEvery="20" fileName="distlik.log" overwrite="true">
      <posterior idref="posterior"/>
      <parameter idref="m"/>
    </log>
  </mcmc>
  <traceAnalysis fileName="distlik.log" burnIn="500">
    <expectation name="m" value="1.9934"/>
  </traceAnalysis>
</beast>
"""


def test_distribution_likelihood_conjugate(tmp_path):
    p = tmp_path / "distlik.xml"
    p.write_text(XML)
    run_testxml(str(p), scale=1.0, seed=13, max_states=60000,
                full_eval_steps=50)
