"""Generate a Makona-1610-class joint phylogeography analysis XML.

The reference repository carries only a pointer to the Makona dataset
(Very_Large_Datasets/Makona_1610_joint_phylogeny_spatial/readme.txt — the
data live at doi:10.7488/ds/1711), so this synthesizes an analysis of the
SAME SHAPE: 1,610 taxa sampled over 2014-2015, ~18,996-site genomes
(simulated in-document by <beagleSequenceSimulator>), 56 sampling
locations, and the Makona model stack: GTR+Gamma sequence likelihood,
uncorrelated lognormal relaxed clock (discretizedBranchRates), skygrid
coalescent, asymmetric CTMC + BSSVS over locations, ancestral-location
reconstruction into the tree log.

Usage: python scripts/make_makona.py [out.xml] [--taxa N] [--sites S]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="examples/makona_joint.xml")
    ap.add_argument("--taxa", type=int, default=1610)
    ap.add_argument("--sites", type=int, default=18996)
    ap.add_argument("--locations", type=int, default=56)
    ap.add_argument("--chain", type=int, default=200_000_000)
    args = ap.parse_args()

    rng = np.random.default_rng(20140326)  # Makona outbreak start date
    n, k_loc = args.taxa, args.locations
    locations = [f"loc{i:02d}" for i in range(k_loc)]
    # sampling dates across the epidemic (2014.2 - 2015.8)
    dates = np.round(rng.uniform(2014.2, 2015.8, n), 3)
    locs = rng.choice(k_loc, n, p=_loc_weights(rng, k_loc))

    taxa = []
    for i in range(n):
        taxa.append(
            f'    <taxon id="EBOV_{i:04d}_{dates[i]}">\n'
            f'      <date value="{dates[i]}" direction="forwards" units="years"/>\n'
            f'      <attr name="location">{locations[locs[i]]}</attr>\n'
            f"    </taxon>"
        )
    states = "\n".join(f'    <state code="{c}"/>' for c in locations)

    n_rates = k_loc * (k_loc - 1)
    xml = f"""<?xml version="1.0"?>
<!-- Makona-1610-class joint phylogeny + discrete spatial diffusion
     (shape of Very_Large_Datasets/Makona_1610_joint_phylogeny_spatial;
     sequences simulated in-document, locations synthetic) -->
<beast>
  <taxa id="taxa">
{chr(10).join(taxa)}
  </taxa>

  <generalDataType id="geography">
{states}
  </generalDataType>

  <attributePatterns id="geoPatterns" attribute="location">
    <generalDataType idref="geography"/>
    <taxa idref="taxa"/>
  </attributePatterns>

  <constantSize id="initialDemo" units="years">
    <populationSize><parameter id="initialDemo.popSize" value="2.0"/></populationSize>
  </constantSize>
  <coalescentTree id="startingTree">
    <taxa idref="taxa"/>
    <constantSize idref="initialDemo"/>
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

  <!-- skygrid over the epidemic window -->
  <gmrfSkyGridLikelihood id="skygrid">
    <populationSizes>
      <parameter id="skygrid.logPopSize" dimension="50" value="1.0"/>
    </populationSizes>
    <precisionParameter>
      <parameter id="skygrid.precision" value="0.1" lower="0.0"/>
    </precisionParameter>
    <numGridPoints><parameter value="49"/></numGridPoints>
    <cutOff><parameter value="2.0"/></cutOff>
    <populationTree><treeModel idref="treeModel"/></populationTree>
  </gmrfSkyGridLikelihood>

  <!-- uncorrelated lognormal relaxed clock -->
  <discretizedBranchRates id="branchRates">
    <treeModel idref="treeModel"/>
    <distribution>
      <logNormalDistributionModel meanInRealSpace="true">
        <mean><parameter id="ucld.mean" value="0.0012" lower="0.0"/></mean>
        <stdev><parameter id="ucld.stdev" value="0.3" lower="0.0"/></stdev>
      </logNormalDistributionModel>
    </distribution>
    <rateCategories><parameter id="branchRates.categories"/></rateCategories>
  </discretizedBranchRates>

  <!-- GTR + Gamma sequence model -->
  <gtrModel id="gtr">
    <frequencies>
      <frequencyModel dataType="nucleotide">
        <frequencies>
          <parameter id="frequencies" value="0.32 0.21 0.19 0.28"/>
        </frequencies>
      </frequencyModel>
    </frequencies>
    <rateAC><parameter id="gtr.ac" value="1.0" lower="0.0"/></rateAC>
    <rateAG><parameter id="gtr.ag" value="4.0" lower="0.0"/></rateAG>
    <rateAT><parameter id="gtr.at" value="1.0" lower="0.0"/></rateAT>
    <rateCG><parameter id="gtr.cg" value="1.0" lower="0.0"/></rateCG>
    <rateGT><parameter id="gtr.gt" value="1.0" lower="0.0"/></rateGT>
  </gtrModel>
  <siteModel id="siteModel">
    <substitutionModel><gtrModel idref="gtr"/></substitutionModel>
    <gammaShape gammaCategories="4">
      <parameter id="siteModel.alpha" value="0.3" lower="0.0"/>
    </gammaShape>
  </siteModel>

  <!-- in-document sequence simulation at the Makona genome length -->
  <beagleSequenceSimulator id="simulator" output="XML">
    <partition from="1" to="{args.sites}" every="1">
      <treeModel idref="treeModel"/>
      <gtrModel idref="gtr"/>
      <siteModel idref="siteModel"/>
      <discretizedBranchRates idref="branchRates"/>
    </partition>
  </beagleSequenceSimulator>
  <patterns id="patterns" from="1" strip="false">
    <alignment idref="simulator"/>
  </patterns>

  <treeDataLikelihood id="treeLikelihood" useAmbiguities="false">
    <patterns idref="patterns"/>
    <treeModel idref="treeModel"/>
    <siteModel idref="siteModel"/>
    <discretizedBranchRates idref="branchRates"/>
  </treeDataLikelihood>

  <!-- asymmetric CTMC + BSSVS over locations -->
  <svsGeneralSubstitutionModel id="originModel">
    <generalDataType idref="geography"/>
    <frequencies>
      <frequencyModel id="geoFreqs" normalize="true">
        <generalDataType idref="geography"/>
        <frequencies><parameter id="geo.frequencies" dimension="{k_loc}"/></frequencies>
      </frequencyModel>
    </frequencies>
    <rates><parameter id="geo.rates" dimension="{n_rates}" value="1.0" lower="0.0"/></rates>
    <rateIndicator>
      <parameter id="geo.indicators" dimension="{n_rates}" value="1.0"/>
    </rateIndicator>
  </svsGeneralSubstitutionModel>
  <sumStatistic id="nonZeroRates" name="nonZeroRateCount" elementwise="true">
    <parameter idref="geo.indicators"/>
  </sumStatistic>
  <siteModel id="geoSiteModel">
    <substitutionModel>
      <svsGeneralSubstitutionModel idref="originModel"/>
    </substitutionModel>
  </siteModel>
  <ancestralTreeLikelihood id="geoLikelihood" tagName="location">
    <attributePatterns idref="geoPatterns"/>
    <treeModel idref="treeModel"/>
    <siteModel idref="geoSiteModel"/>
    <svsGeneralSubstitutionModel idref="originModel"/>
  </ancestralTreeLikelihood>

  <operators id="operators">
    <scaleOperator scaleFactor="0.75" weight="3">
      <parameter idref="ucld.mean"/>
    </scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="3">
      <parameter idref="ucld.stdev"/>
    </scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="1">
      <parameter idref="siteModel.alpha"/>
    </scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="1">
      <parameter idref="gtr.ag"/>
    </scaleOperator>
    <scaleOperator scaleFactor="0.75" weight="3">
      <parameter idref="skygrid.precision"/>
    </scaleOperator>
    <randomWalkOperator windowSize="0.5" weight="10">
      <parameter idref="skygrid.logPopSize"/>
    </randomWalkOperator>
    <subtreeSlide size="0.05" gaussian="true" weight="15">
      <treeModel idref="treeModel"/>
    </subtreeSlide>
    <narrowExchange weight="15"><treeModel idref="treeModel"/></narrowExchange>
    <wideExchange weight="3"><treeModel idref="treeModel"/></wideExchange>
    <wilsonBalding weight="3"><treeModel idref="treeModel"/></wilsonBalding>
    <scaleOperator scaleFactor="0.75" weight="3">
      <parameter idref="treeModel.rootHeight"/>
    </scaleOperator>
    <uniformOperator weight="30">
      <parameter idref="treeModel.internalNodeHeights"/>
    </uniformOperator>
    <scaleOperator scaleFactor="0.75" weight="15" scaleAllIndependently="true">
      <parameter idref="geo.rates"/>
    </scaleOperator>
    <bitFlipOperator weight="21">
      <parameter idref="geo.indicators"/>
    </bitFlipOperator>
  </operators>

  <mcmc id="mcmc" chainLength="{args.chain}" autoOptimize="true">
    <posterior id="posterior">
      <prior id="prior">
        <gammaPrior shape="0.001" scale="1000.0" offset="0.0">
          <parameter idref="skygrid.precision"/>
        </gammaPrior>
        <gmrfSkyGridLikelihood idref="skygrid"/>
        <cachedPrior>
          <gammaPrior shape="1.0" scale="1.0" offset="0.0">
            <parameter idref="geo.rates"/>
          </gammaPrior>
          <parameter idref="geo.rates"/>
        </cachedPrior>
        <poissonPrior mean="{np.log(2) * k_loc:.4f}" offset="{k_loc - 1}.0">
          <statistic idref="nonZeroRates"/>
        </poissonPrior>
        <svsGeneralSubstitutionModel idref="originModel"/>
        <exponentialPrior mean="0.001" offset="0">
          <parameter idref="ucld.mean"/>
        </exponentialPrior>
      </prior>
      <likelihood id="likelihood">
        <treeDataLikelihood idref="treeLikelihood"/>
        <ancestralTreeLikelihood idref="geoLikelihood"/>
      </likelihood>
    </posterior>
    <operators idref="operators"/>
    <log logEvery="1000" fileName="makona_joint.log">
      <posterior idref="posterior"/>
      <parameter idref="ucld.mean"/>
      <parameter idref="siteModel.alpha"/>
      <sumStatistic idref="nonZeroRates"/>
      <parameter idref="treeModel.rootHeight"/>
    </log>
    <logTree logEvery="10000" nexusFormat="true" fileName="makona_joint.trees">
      <treeModel idref="treeModel"/>
      <ancestralTreeLikelihood idref="geoLikelihood"/>
    </logTree>
  </mcmc>
</beast>
"""
    with open(args.out, "w") as fh:
        fh.write(xml)
    print(f"wrote {args.out}: {n} taxa, {args.sites} sites, "
          f"{k_loc} locations", file=sys.stderr)


def _loc_weights(rng, k):
    w = rng.dirichlet(np.full(k, 0.5))
    return w / w.sum()


if __name__ == "__main__":
    main()
