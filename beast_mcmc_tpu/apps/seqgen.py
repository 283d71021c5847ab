"""Sequence simulator (role of dr.app.seqgen.SeqGen / dr.app.bss piBUSS,
ref: src/dr/app/seqgen/SeqGen.java:56): evolve states down a time tree
under a substitution/site/clock model and emit an alignment.

Also the engine for simulation-based calibration tests: simulate, infer,
check coverage.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.data.alignment import Alignment
from beast_mcmc_tpu.data.datatype import NUCLEOTIDES, DataType
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices
from beast_mcmc_tpu.ops.eigen import EigenSystem
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights


def simulate_states(
    key,
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    eig: EigenSystem,
    freqs: jnp.ndarray,
    category_rates: jnp.ndarray,
    category_weights: jnp.ndarray,
    branch_rates,
    n_sites: int,
) -> jnp.ndarray:
    """Sample states at every node: int32[M, n_sites] (pre-order scan)."""
    m = parent.shape[0]
    n_taxa = (m + 1) // 2
    p_mats = branch_transition_matrices(
        eig, parent, heights, branch_rates, category_rates)  # [M,C,S,S]
    order = peel_order_from_heights(heights, n_taxa)

    k_cat, k_root, k_scan = jax.random.split(key, 3)
    cats = jax.random.categorical(
        k_cat, jnp.log(category_weights)[None, :], shape=(n_sites,))
    root_state = jax.random.categorical(
        k_root, jnp.log(freqs)[None, :], shape=(n_sites,))

    states = jnp.full((m, n_sites), -1, jnp.int32)
    states = states.at[root].set(root_state.astype(jnp.int32))
    sites = jnp.arange(n_sites)

    def step(carry, node):
        states, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        ps = states[node]
        for which, kk in ((0, k1), (1, k2)):
            child = children[node, which]
            pm = p_mats[child]  # [C,S,S]
            probs = pm[cats, ps, :]  # [n_sites, S]
            st = jax.random.categorical(kk, jnp.log(probs + 1e-300), axis=-1)
            states = states.at[child].set(st.astype(jnp.int32))
        return (states, key), None

    (states, _), _ = jax.lax.scan(step, (states, k_scan), order[::-1])
    return states


def simulate_alignment(
    key,
    taxa,
    parent,
    children,
    heights,
    root,
    eig,
    freqs,
    category_rates,
    category_weights,
    branch_rates,
    n_sites: int,
    datatype: DataType = NUCLEOTIDES,
) -> Alignment:
    states = simulate_states(
        key, jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights),
        root, eig, freqs, jnp.asarray(category_rates),
        jnp.asarray(category_weights), branch_rates, n_sites)
    tip_states = np.asarray(states[: len(taxa)], np.int16)
    return Alignment(list(taxa), tip_states, datatype)


# ---------------------------------------------------------------------------
# piBUSS-style CLI (ref: dr.app.bss / BeagleSequenceSimulator app surface)
# ---------------------------------------------------------------------------


def _parse_partition(spec: str) -> dict:
    """'length=500,model=HKY,kappa=2,alpha=0.5,ncat=4,rate=1.0,
    freqs=0.25:0.25:0.25:0.25' -> options dict."""
    out = {"length": 500, "model": "HKY", "kappa": 2.0, "alpha": None,
           "ncat": 4, "rate": 1.0, "freqs": [0.25, 0.25, 0.25, 0.25]}
    for item in spec.split(","):
        if not item:
            continue
        k, _, v = item.partition("=")
        k = k.strip()
        if k == "freqs":
            out[k] = [float(x) for x in v.split(":")]
        elif k in ("length", "ncat"):
            out[k] = int(v)
        elif k == "model":
            out[k] = v.upper()
        else:
            out[k] = float(v)
    return out


def _partition_alignment(key, taxa, parent, children, heights, root, opt):
    from beast_mcmc_tpu.models.sitemodel import (
        discrete_gamma_rates,
        single_rate,
    )
    from beast_mcmc_tpu.models.substitution import gtr_eigen, hky_eigen

    freqs = jnp.asarray(opt["freqs"], jnp.float64)
    freqs = freqs / jnp.sum(freqs)
    if opt["model"] == "JC":
        freqs = jnp.full((4,), 0.25)
        eig = hky_eigen(jnp.asarray(1.0), freqs)
    elif opt["model"] == "GTR":
        rates = jnp.asarray(opt.get("gtr_rates",
                                    [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]))
        eig = gtr_eigen(rates, freqs)
    else:  # HKY
        eig = hky_eigen(jnp.asarray(opt["kappa"]), freqs)
    if opt["alpha"]:
        r, w = discrete_gamma_rates(opt["alpha"], opt["ncat"])
    else:
        r, w = single_rate()
    return simulate_alignment(
        key, taxa, parent, children, heights, root, eig, freqs, r, w,
        jnp.asarray(opt["rate"]), opt["length"])


def main(argv=None):
    """piBUSS-role CLI: simulate a (multi-partition) alignment down a
    newick tree (ref: dr.app.bss.BeagleSequenceSimulatorApp — partitions
    with per-partition substitution/site/clock models; FASTA or NEXUS
    out)."""
    import argparse
    import sys

    from beast_mcmc_tpu.tree.topology import parse_newick

    p = argparse.ArgumentParser(
        prog="beast_mcmc_tpu seqgen",
        description="Simulate sequence alignments down a tree "
                    "(SeqGen / piBUSS role)")
    p.add_argument("-tree", required=True,
                   help="newick tree file (branch lengths = time)")
    p.add_argument("-partition", action="append", default=None,
                   metavar="SPEC",
                   help="length=500,model=HKY,kappa=2,alpha=0.5,ncat=4,"
                        "rate=1.0,freqs=0.25:0.25:0.25:0.25 "
                        "(repeat for multiple partitions)")
    p.add_argument("-seed", type=int, default=42)
    p.add_argument("-format", choices=("fasta", "nexus"), default="fasta")
    p.add_argument("-output", default=None, help="output file (stdout)")
    args = p.parse_args(argv)

    with open(args.tree) as f:
        nwk = f.read().strip()
    parent, children, heights, root, taxa = parse_newick(nwk)
    specs = [_parse_partition(s) for s in (args.partition or ["length=500"])]

    key = jax.random.PRNGKey(args.seed)
    blocks = []
    for i, opt in enumerate(specs):
        key, k = jax.random.split(key)
        blocks.append(_partition_alignment(
            k, taxa, jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), int(root), opt))
    states = np.concatenate([b.states for b in blocks], axis=1)
    aln = Alignment(list(taxa), states.astype(np.int16), NUCLEOTIDES)

    chars = "".join(NUCLEOTIDES.code_chars[:4])
    seqs = {t: "".join(chars[s] for s in states[i])
            for i, t in enumerate(taxa)}
    if args.format == "fasta":
        text = "".join(f">{t}\n{seqs[t]}\n" for t in taxa)
    else:
        n, L = len(taxa), states.shape[1]
        body = "\n".join(f"{t}  {seqs[t]}" for t in taxa)
        text = ("#NEXUS\nbegin data;\n"
                f"dimensions ntax={n} nchar={L};\n"
                "format datatype=dna gap=-;\nmatrix\n"
                f"{body}\n;\nend;\n")
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    else:
        sys.stdout.write(text)
    return 0
