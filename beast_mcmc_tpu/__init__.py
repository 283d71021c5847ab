"""beast_mcmc_tpu — a TPU-native Bayesian phylodynamics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of BEAST X
(beast-dev/beast-mcmc): Bayesian inference of rooted, time-measured
phylogenies by MCMC. The reference's BEAGLE partial-likelihood engine
becomes a functional peeling kernel over site-pattern-major tensors; its
listener/dirty-flag model graph becomes a pure log-posterior function of a
single state pytree; its thread-based MC3 becomes vmapped chains over a
device mesh.

Layer map (mirrors SURVEY.md §1):
  data/       alignment, datatypes, site patterns, IO   (ref: src/dr/evolution)
  tree/       flat-array time trees, intervals           (ref: src/dr/evomodel/tree)
  ops/        compute kernels: eigen, transition, peeling (ref: BEAGLE / lib/beagle.jar)
  models/     substitution/site/clock models, tree priors (ref: src/dr/evomodel)
  inference/  MCMC kernel, operators, loggers, checkpoint (ref: src/dr/inference)
  parallel/   meshes, pattern sharding, multi-chain      (ref: §2.5 parallelism)
  config/     declarative analysis spec (the XML role)    (ref: src/dr/xml)
"""

__version__ = "0.1.0"
