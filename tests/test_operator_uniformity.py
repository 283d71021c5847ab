"""Adversarial topology-operator validation by exact enumeration.

Under the constant coalescent prior on 4 contemporaneous taxa the marginal
distribution over LABELED topologies is exact: every labeled history is
equally likely, a caterpillar labeled topology has 1 ranking and a
balanced one 2, so caterpillars get 1/18 and balanced trees 2/18. A
Hastings-ratio bias in any topology operator shifts these frequencies
(the reference's OperatorAssert method only checks irreducibility +
within-shape uniformity; ExchangeOperatorTest.java:91-96). Each operator
below runs with height operators (for irreducibility/mixing) against the
coalescent-only posterior, and the sampled topology distribution is
checked against the exact law. VERDICT r1 item 8 — SubtreeSlide/Leap's
masked re-wiring is the most bug-prone code in the repo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.inference.operators import (
    NarrowExchangeOperator,
    RootHeightScaleOperator,
    UniformNodeHeightOperator,
    WideExchangeOperator,
    WilsonBaldingOperator,
)
from beast_mcmc_tpu.inference.tree_operators import (
    FixedHeightSPROperator,
    FNPROperator,
    GibbsPruneAndRegraftOperator,
    NNIOperator,
    SubtreeJumpOperator,
    SubtreeLeapOperator,
    SubtreeSlideOperator,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree

N_TAXA = 4


def topology_id(tree):
    """Canonical labeled-topology id: internal-node descendant-tip
    bitmasks, sorted, packed base-16 (4 taxa -> 3 masks in 0..15)."""
    order = peel_order_from_heights(tree.heights, N_TAXA)
    m = tree.parent.shape[0]
    masks = jnp.where(
        jnp.arange(m) < N_TAXA, 2 ** jnp.arange(m), 0
    ).astype(jnp.int32)

    def step(masks, node):
        l = tree.children[node, 0]
        r = tree.children[node, 1]
        return masks.at[node].set(masks[l] | masks[r]), None

    masks, _ = jax.lax.scan(step, masks, order)
    internal = jnp.sort(masks[N_TAXA:])
    return internal[0] * 256 + internal[1] * 16 + internal[2]


def exact_topology_probs():
    """{topology_id: exact prob} for 4 contemporaneous taxa under the
    coalescent: uniform over the 18 labeled histories."""
    import itertools

    probs = {}
    # enumerate labeled histories: sequence of coalescences
    for perm in itertools.permutations(range(4)):
        pass
    # direct enumeration: all labeled topologies via pairing process
    from collections import Counter

    counts = Counter()
    # a labeled history = choose pair among 4 (6 ways), then pair among 3
    # (3 ways) -> 18 histories
    items = list(range(4))
    for i, j in itertools.combinations(range(4), 2):
        first = frozenset([i, j])
        rest = [x for x in items if x not in (i, j)] + ["c1"]
        for a, b in itertools.combinations(range(3), 2):
            pair2 = frozenset(
                [rest[a] if rest[a] != "c1" else first,
                 rest[b] if rest[b] != "c1" else first]
            )
            # clades: first, pair2-resolved, root(all)
            def mask(x):
                if isinstance(x, frozenset):
                    out = 0
                    for e in x:
                        out |= mask(e)
                    return out
                return 1 << x

            m1 = mask(first)
            m2 = mask(pair2)
            m3 = 15
            tid = tuple(sorted([m1, m2, m3]))
            counts[tid] += 1
    total = sum(counts.values())
    return {
        t[0] * 256 + t[1] * 16 + t[2]: c / total for t, c in counts.items()
    }


OPERATORS = {
    "subtree_slide": SubtreeSlideOperator(weight=10.0, size=1.0),
    "subtree_leap": SubtreeLeapOperator(weight=10.0, size=1.0),
    "narrow_exchange": NarrowExchangeOperator(weight=10.0),
    "wide_exchange": WideExchangeOperator(weight=10.0),
    "wilson_balding": WilsonBaldingOperator(weight=10.0),
    "fnpr": FNPROperator(weight=10.0),
    "nni": NNIOperator(weight=10.0),
    "fixed_height_spr": FixedHeightSPROperator(weight=10.0),
    "subtree_jump": SubtreeJumpOperator(weight=10.0, size=1.0),
    "subtree_jump_uniform": SubtreeJumpOperator(
        weight=10.0, uniform=True, adaptable=False
    ),
    "gibbs_prune_regraft": GibbsPruneAndRegraftOperator(weight=10.0),
}

from beast_mcmc_tpu.inference.tree_operators import (  # noqa: E402
    GibbsSubtreeSwapOperator,
    TipLeapOperator,
)

OPERATORS["gibbs_subtree_swap"] = GibbsSubtreeSwapOperator(weight=10.0)
OPERATORS["tip_leap"] = TipLeapOperator(weight=10.0, size=1.0,
                                        n_tips=N_TAXA)

from beast_mcmc_tpu.tree.constrained import ConstrainedUniformSPROperator

# unconstrained limit (all groups equal) of the thorney USPR — changes
# topology AND the pruned parent's height, so it must preserve the exact
# labeled-history law on its own too
OPERATORS["uniform_spr_measure"] = ConstrainedUniformSPROperator(
    weight=10.0, groups=np.zeros(2 * N_TAXA - 1, dtype=np.int32))


@pytest.mark.parametrize("name", sorted(OPERATORS))
def test_topology_operator_exact_distribution(name):
    rng = np.random.default_rng(1)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(N_TAXA), 1.0
    )
    tree0 = make_tree_state(parent, children, heights, root)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, N_TAXA, 1.0)

    ops = [
        OPERATORS[name],
        UniformNodeHeightOperator(weight=5.0),
        RootHeightScaleOperator(weight=2.0),
    ]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"dummy": jnp.asarray(0.0)}, tree0, jax.random.PRNGKey(7), ops,
        log_post,
    )
    n_steps, every = 120_000, 2
    state, trace = jax.jit(
        lambda s: run_chain(
            step, s, n_steps, every, lambda st: {"tid": topology_id(st.tree)}
        )
    )(state)
    tids = np.asarray(trace["tid"])[2000:]
    exact = exact_topology_probs()
    assert set(np.unique(tids)) <= set(exact)
    # irreducibility: every labeled topology reached
    assert len(np.unique(tids)) == 15, (
        f"{name}: only {len(np.unique(tids))}/15 topologies reached"
    )
    n = len(tids)
    # autocorrelation-discounted tolerance (samples every 2 steps are
    # heavily correlated; conservative n_eff)
    n_eff = n / 50.0
    for tid, p in exact.items():
        ap = float(np.mean(tids == tid))
        tol = 5.0 * np.sqrt(p * (1 - p) / n_eff) + 0.005
        assert abs(ap - p) < tol, (
            f"{name}: topology {tid:x} freq {ap:.4f} vs exact {p:.4f} "
            f"(tol {tol:.4f})"
        )
