from beast_mcmc_tpu.tree.topology import TreeState, parse_newick, to_newick, simulate_coalescent_tree
