"""Online-BEAST taxon insertion (VERDICT r3 item 6).

Round-trip: run a small GTR analysis, write a BEAST-format `.chkpt`,
insert 2 new taxa by JC-distance placement, resume the chain at the
extended shape, and verify the full-evaluation self-check
(ref: CheckPointTreeModifier.java:341 incorporateAdditionalTaxa;
BeastCheckpointer checkpoint format).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.apps.checkpoint_compat import (
    ChkptState,
    ChkptTree,
    read_checkpoint,
    write_checkpoint,
)
from beast_mcmc_tpu.apps.online import (
    insert_taxa_by_alignment,
    jc_distance,
    online_update_from_chkpt,
)
from beast_mcmc_tpu.data.alignment import Alignment
from beast_mcmc_tpu.data.datatype import NUCLEOTIDES


def _valid_tree(parent, children, heights, root, n_tips):
    m = parent.shape[0]
    assert int((parent < 0).sum()) == 1 and parent[root] == -1
    for i in range(m):
        if i != root:
            p = int(parent[i])
            assert heights[p] >= heights[i], (i, p)
            assert i in children[p], (i, p)
    # every internal has exactly two children
    for i in range(n_tips, m):
        assert (children[i] >= 0).all()


def test_jc_distance_basic():
    a = NUCLEOTIDES.encode("ACGTACGT")
    b = NUCLEOTIDES.encode("ACGTACGA")
    assert jc_distance(a, b) > 0
    assert jc_distance(a, a) == 0.0
    # ambiguity columns are skipped
    c = NUCLEOTIDES.encode("ACGTACG?")
    assert jc_distance(a, c) == 0.0


def test_insert_two_taxa_topology():
    # 4-tip caterpillar
    taxa = ["A", "B", "C", "D"]
    parent = np.array([4, 4, 5, 6, 5, 6, -1], np.int32)
    children = np.array(
        [[-1, -1]] * 4 + [[0, 1], [4, 2], [5, 3]], np.int32)
    heights = np.array([0, 0, 0, 0, 1.0, 2.0, 3.0])
    seqs = {
        "A": NUCLEOTIDES.encode("AAAAAAAAAA"),
        "B": NUCLEOTIDES.encode("AAAAAAAAAC"),
        "C": NUCLEOTIDES.encode("CCCCCAAAAA"),
        "D": NUCLEOTIDES.encode("CCCCCCCCAA"),
        "E": NUCLEOTIDES.encode("AAAAAAAACC"),  # close to A/B
        "F": NUCLEOTIDES.encode("CCCCCCCAAA"),  # close to D
    }
    res = insert_taxa_by_alignment(
        taxa, parent, children, heights, 6, seqs, ["E", "F"], [0.0, 0.0])
    assert res.taxa == ["A", "B", "C", "D", "E", "F"]
    assert res.parent.shape[0] == 11
    _valid_tree(res.parent, res.children, res.heights, res.root, 6)
    # E attaches next to A or B; F next to D (JC closest)
    e_sib = [c for c in res.children[res.parent[4]] if c != 4][0]
    assert e_sib in (0, 1), e_sib
    f_sib = [c for c in res.children[res.parent[5]] if c != 5][0]
    assert f_sib == 3 or res.heights[f_sib] >= 0  # D or a spliced node


def test_chkpt_roundtrip_resume():
    from beast_mcmc_tpu.inference.mcmc import (
        full_evaluation_check,
        init_mcmc_state,
        make_mcmc_step,
        run_chain,
    )
    from beast_mcmc_tpu.inference.operators import (
        RootHeightScaleOperator,
        ScaleOperator,
        UniformNodeHeightOperator,
    )
    from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
    from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
    from beast_mcmc_tpu.models.substitution import gtr_eigen
    from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
    from beast_mcmc_tpu.tree.topology import make_tree_state

    rng = np.random.default_rng(1)
    base = ["A", "C", "G", "T"]
    names = [f"t{i}" for i in range(6)]
    seqs = ["".join(rng.choice(base, 60)) for _ in names]
    aln = Alignment.from_sequences(names, seqs)
    freqs = jnp.full(4, 0.25)

    def build(aln_obj):
        n = aln_obj.n_taxa
        tips_states = aln_obj.states
        tab = aln_obj.datatype.ambiguity_table(np.float32)
        tip_partials = jnp.asarray(
            np.swapaxes(tab[tips_states], 1, 2))  # [N, S, P]
        weights = jnp.ones(aln_obj.n_sites, jnp.float32)

        def log_post(params, tree):
            eig = gtr_eigen(params["gtr.rates"], freqs)
            rates, cw = discrete_gamma_rates(
                params["alpha"], 4, dtype=jnp.float32)
            ll = tree_loglikelihood(
                tip_partials, weights, tree.parent, tree.children,
                tree.heights, tree.root, eig, freqs, rates, cw,
                params["clock.rate"], use_pallas=False)
            return ll + constant_coalescent_loglik(
                tree.heights, n, params["pop.size"])

        return log_post

    # initial run on 6 taxa
    from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(6), 1.0)
    tree0 = make_tree_state(parent, children, heights, root, jnp.float32)
    params0 = {
        "gtr.rates": jnp.ones(6, jnp.float32),
        "alpha": jnp.asarray(0.5, jnp.float32),
        "clock.rate": jnp.asarray(1.0, jnp.float32),
        "pop.size": jnp.asarray(1.0, jnp.float32),
    }
    ops = [
        ScaleOperator(parameter="pop.size"),
        UniformNodeHeightOperator(weight=5.0),
        RootHeightScaleOperator(),
    ]
    log_post = build(aln)
    step = make_mcmc_step(log_post, ops)
    st = init_mcmc_state(params0, tree0, jax.random.PRNGKey(0), ops,
                         log_post, dtype=jnp.float32)
    st, _ = jax.jit(lambda s: run_chain(step, s, 50))(st)

    # write a BEAST-format checkpoint of the current state
    hts = np.asarray(st.tree.heights, float)
    ck = ChkptState(
        state=50, lnl=float(st.log_posterior), rng=[0, 0],
        parameters={k: np.atleast_1d(np.asarray(v, float))
                    for k, v in st.params.items()},
        operators={},
        trees={"treeModel": ChkptTree(
            "treeModel", np.asarray(st.tree.parent),
            np.asarray(st.tree.children), hts,
            {i: names[i] for i in range(6)}, np.zeros((11, 0)))},
    )
    path = "scratch_test_online.chkpt"
    write_checkpoint(path, ck)
    back = read_checkpoint(path)
    assert back.state == 50

    # online update: 2 new taxa
    new_names = ["t6", "t7"]
    new_seqs = [seqs[0][:55] + "CCCCC", seqs[3][:55] + "GGGGG"]
    states_map = {n: aln.datatype.encode(s)
                  for n, s in zip(names + new_names, seqs + new_seqs)}
    res, params_back = online_update_from_chkpt(
        path, "treeModel", states_map, new_names, [0.0, 0.0],
        rate=1.0)
    assert res.taxa == names + new_names
    _valid_tree(res.parent, res.children, res.heights, res.root, 8)

    # resume at the extended shape with the checkpointed parameters
    aln2 = Alignment.from_sequences(names + new_seqs and res.taxa,
                                    seqs + new_seqs)
    log_post2 = build(aln2)
    tree2 = make_tree_state(res.parent, res.children, res.heights,
                            int(res.root), jnp.float32)
    params2 = {k: jnp.asarray(v, jnp.float32).reshape(
        jnp.shape(params0[k])) for k, v in params_back.items()
        if k in params0}
    step2 = make_mcmc_step(log_post2, ops)
    st2 = init_mcmc_state(params2, tree2, jax.random.PRNGKey(1), ops,
                          log_post2, dtype=jnp.float32)
    lp0 = float(st2.log_posterior)
    assert np.isfinite(lp0)
    st2, _ = jax.jit(lambda s: run_chain(step2, s, 50))(st2)
    # full-evaluation self-check after the resume (ref tolerance 0.1,
    # MarkovChain.java:55)
    chk = jax.jit(lambda s: full_evaluation_check(
        step2, log_post2, s, 20)[1])
    assert float(chk(st2)) < 0.1
