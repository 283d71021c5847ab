"""MCMC proposal operators.

The reference's operator suite (~85 generic + 58 tree operators, ref:
src/dr/inference/operators/*, src/dr/evomodel/operators/*) redesigned as
pure functions usable inside lax.switch: every operator is

    propose(params, tree, key, tuning) -> (params', tree', log_hastings)

with static shapes and branchless control flow. Invalid proposals return
log_hastings = -inf (the reference throws / returns -inf, e.g.
WilsonBalding.java proposeTree; same acceptance semantics).

Selection-with-exclusion: where the reference resamples until it hits an
eligible node (uniform over a fixed-size eligible set, e.g.
ExchangeOperator.narrow's while loop), we draw an index in
[0, M - #excluded) and order-shift past the sorted excluded indices —
exactly uniform over the eligible set, no loops.

Proposal/Hastings conventions are cited per operator:
  scale:        ScaleOperator.java doOperation — s = sf + u(1/sf - sf),
                logq = -log s (single), (dim-2) log s (scale-all),
                adaptable parameter log(1/sf - 1) (:243-247)
  random walk:  RandomWalkOperator.java — symmetric window, reflection
  delta:        DeltaExchangeOperator.java — symmetric, bounds-checked
  up/down:      UpDownOperator.java — (nUp - nDown - 2) log s
  uniform h:    uniform in [max child height, parent height]
  narrow/wide:  ExchangeOperator.java narrow/wide — symmetric, validity
  Wilson-Balding: WilsonBalding.java proposeTree — q = newRange/oldRange
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.tree.topology import TreeState

Params = Dict[str, jnp.ndarray]
NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def sample_excluding(key, m: int, exclusions: jnp.ndarray) -> jnp.ndarray:
    """Uniform draw from [0, m) excluding the given (distinct) indices.

    exclusions must be a fixed-size int array; duplicates are NOT allowed.
    """
    k = exclusions.shape[0]
    r = jax.random.randint(key, (), 0, m - k, dtype=exclusions.dtype)
    ex = jnp.sort(exclusions)

    def body(r, e):
        return r + (r >= e).astype(r.dtype), None

    r, _ = jax.lax.scan(body, r, ex)
    return r


def replace_child(children: jnp.ndarray, node, old, new) -> jnp.ndarray:
    row = children[node]
    row = jnp.where(row == old, new, row)
    return children.at[node].set(row)


def other_child(children: jnp.ndarray, node, child) -> jnp.ndarray:
    c0 = children[node, 0]
    c1 = children[node, 1]
    return jnp.where(c0 == child, c1, c0)


def _scale_draw(key, scale_factor):
    """BEAST scale draw: uniform on [sf, 1/sf] (ScaleOperator.java)."""
    dt = jnp.result_type(scale_factor)
    dt = dt if jnp.issubdtype(dt, jnp.floating) else jnp.float_
    u = jax.random.uniform(key, dtype=dt)
    return scale_factor + u * (1.0 / scale_factor - scale_factor)


def _in_bounds(x, lower, upper):
    return jnp.all((x >= lower) & (x <= upper))


# ---------------------------------------------------------------------------
# operator specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Operator:
    """Base spec. weight: schedule weight (SimpleOperatorSchedule draws
    operators with probability proportional to weight)."""

    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = False
    # Names of `params` entries this operator can change; () = tree-only;
    # None = derive from parameter/up/down/parameters attrs (or, if those
    # are absent too, "unknown — assume anything". Used by the derived-
    # parameter cache (make_mcmc_step(derived=...)) — the functional
    # analog of the reference's dirty-flag model graph.
    modifies_params = None

    def modified_params(self):
        if self.modifies_params is not None:
            return tuple(self.modifies_params)
        names = []
        if getattr(self, "parameter", None):
            names.append(self.parameter)
        for attr in ("up", "down", "parameters"):
            v = getattr(self, attr, None)
            if v:
                names.extend(n for n in v if isinstance(n, str))
        names = [n for n in names if n != TREE_HEIGHTS]
        if names:
            return tuple(names)
        return None  # unknown: derived caches must be conservatively rebuilt

    def initial_adapt(self) -> float:
        return 0.0

    def tuning(self, adapt_value):
        return None

    def propose(self, params: Params, tree: TreeState, key, tuning):
        raise NotImplementedError


@dataclasses.dataclass
class ScaleOperator(Operator):
    """ref: ScaleOperator.java. modes: 'random' (one random dim),
    'all' (same factor on all dims), 'independent' (a factor per dim)."""

    parameter: str = ""
    scale_factor: float = 0.75
    mode: str = "random"
    lower: float = 0.0
    upper: float = jnp.inf
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log((1.0 / self.scale_factor - 1.0))

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        flat = jnp.atleast_1d(x)
        dim = flat.shape[0]
        tuning = jnp.asarray(tuning, flat.dtype)
        if self.mode == "independent":
            s = jax.vmap(_scale_draw, in_axes=(0, None))(
                jax.random.split(key, dim), tuning
            )
            new = flat * s
            logh = -jnp.sum(jnp.log(s))
        elif self.mode == "all":
            s = _scale_draw(key, tuning)
            new = flat * s
            logh = (dim - 2) * jnp.log(s)
        else:
            k1, k2 = jax.random.split(key)
            s = _scale_draw(k1, tuning)
            idx = jax.random.randint(k2, (), 0, dim)
            new = flat.at[idx].multiply(s)
            logh = -jnp.log(s)
        logh = jnp.where(_in_bounds(new, self.lower, self.upper), logh, NEG_INF)
        return {**params, self.parameter: new.reshape(x.shape)}, tree, logh


@dataclasses.dataclass
class RandomWalkOperator(Operator):
    """ref: RandomWalkOperator.java — x' = x + U(-w, w) on a random dim,
    with optional reflection at the bounds (keeps symmetry)."""

    parameter: str = ""
    window: float = 1.0
    lower: float = -jnp.inf
    upper: float = jnp.inf
    reflect: bool = False
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log((self.window))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        flat = jnp.atleast_1d(x)
        dim = flat.shape[0]
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, dim)
        delta = (jax.random.uniform(k2) * 2.0 - 1.0) * tuning
        v = flat[idx] + delta
        if self.reflect and jnp.isfinite(self.lower) and jnp.isfinite(self.upper):
            span = self.upper - self.lower
            v = jnp.abs((v - self.lower) % (2 * span) - span) + self.lower
        new = flat.at[idx].set(v)
        logh = jnp.where(_in_bounds(new, self.lower, self.upper), 0.0, NEG_INF)
        return {**params, self.parameter: new.reshape(x.shape)}, tree, logh


@dataclasses.dataclass
class DeltaExchangeOperator(Operator):
    """ref: DeltaExchangeOperator.java — move mass d~U(0,delta) between two
    random dims; preserves the sum (frequency/rate simplexes). With
    integer=True, d~U{1..delta} moves whole units (the skyline
    group-size move, <deltaExchange integer="true">); the reference
    rejects when any entry would drop below 1."""

    parameter: str = ""
    delta: float = 0.01
    lower: float = 0.0
    upper: float = jnp.inf
    integer: bool = False
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log((self.delta))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        flat = jnp.atleast_1d(x)
        dim = flat.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        i = jax.random.randint(k1, (), 0, dim)
        j = sample_excluding(k2, dim, i[None])
        if self.integer:
            hi = max(int(round(self.delta)), 1)
            d = jax.random.randint(k3, (), 1, hi + 1).astype(flat.dtype)
            new = flat.at[i].add(-d).at[j].add(d)
            lower = max(self.lower, 1.0)
            logh = jnp.where(_in_bounds(new, lower, self.upper), 0.0, NEG_INF)
        else:
            d = jax.random.uniform(k3) * tuning
            new = flat.at[i].add(-d).at[j].add(d)
            logh = jnp.where(
                _in_bounds(new, self.lower, self.upper), 0.0, NEG_INF
            )
        return {**params, self.parameter: new.reshape(x.shape)}, tree, logh


TREE_HEIGHTS = "__tree_heights__"  # sentinel target for up/down on the tree


@dataclasses.dataclass
class UpDownOperator(Operator):
    """ref: UpDownOperator.java — up-params *= s, down-params /= s,
    log-Hastings (nUp - nDown - 2) log s. The sentinel TREE_HEIGHTS in
    `down` (or `up`) scales all internal-node heights (the reference's
    <upDownOperator><down><parameter treeModel.allInternalNodeHeights>)."""

    up: Sequence[str] = ()
    down: Sequence[str] = ()
    scale_factor: float = 0.75
    bounds: Dict[str, Tuple[float, float]] = dataclasses.field(default_factory=dict)
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log((1.0 / self.scale_factor - 1.0))

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def _apply(self, params, tree, name, s):
        """Returns (params, tree, n_dims_scaled, valid)."""
        if name == TREE_HEIGHTS:
            m = tree.parent.shape[0]
            n_taxa = (m + 1) // 2
            internal = jnp.arange(m) >= n_taxa
            heights = jnp.where(internal, tree.heights * s, tree.heights)
            tree = tree.replace(heights=heights)
            # validity: parent above child everywhere (dated tips can break)
            pidx = jnp.maximum(tree.parent, 0)
            ok = jnp.all(
                jnp.where(tree.parent >= 0, heights[pidx] > heights, True)
            )
            return params, tree, n_taxa - 1, ok
        x = params[name]
        new = x * s
        lo, hi = self.bounds.get(name, (0.0, jnp.inf))
        ok = _in_bounds(jnp.atleast_1d(new), lo, hi)
        return {**params, name: new}, tree, int(jnp.size(x)), ok

    def propose(self, params, tree, key, tuning):
        s = _scale_draw(key, tuning)
        n_up = 0
        n_down = 0
        ok = jnp.asarray(True)
        for name in self.up:
            params, tree, n, o = self._apply(params, tree, name, s)
            n_up += n
            ok &= o
        for name in self.down:
            params, tree, n, o = self._apply(params, tree, name, 1.0 / s)
            n_down += n
            ok &= o
        logh = (n_up - n_down - 2) * jnp.log(s)
        return params, tree, jnp.where(ok, logh, NEG_INF)


# ---------------------------------------------------------------------------
# tree operators
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class UniformNodeHeightOperator(Operator):
    """Draw a non-root internal node's height uniformly between its oldest
    child and its parent (the reference's <uniformOperator> over
    treeModel.internalNodeHeights; bounds from the tree)."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        n_taxa = (m + 1) // 2
        k1, k2 = jax.random.split(key)
        # internal nodes are [n_taxa, m); exclude the root
        r = jax.random.randint(k1, (), 0, m - n_taxa - 1, dtype=tree.parent.dtype) + n_taxa
        node = r + (r >= tree.root).astype(r.dtype)
        lo = jnp.maximum(
            tree.heights[tree.children[node, 0]],
            tree.heights[tree.children[node, 1]],
        )
        hi = tree.heights[tree.parent[node]]
        new_h = lo + jax.random.uniform(k2, dtype=tree.heights.dtype) * (hi - lo)
        tree = tree.replace(heights=tree.heights.at[node].set(new_h))
        return params, tree, jnp.asarray(0.0, tree.heights.dtype)


@dataclasses.dataclass
class RootHeightScaleOperator(Operator):
    """Scale the root height (ref: <scaleOperator> on treeModel.rootHeight;
    lower bound = oldest child of the root)."""

    scale_factor: float = 0.75
    adaptable: bool = True

    modifies_params = ()  # tree-only proposal

    def initial_adapt(self) -> float:
        return math.log((1.0 / self.scale_factor - 1.0))

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def propose(self, params, tree, key, tuning):
        s = _scale_draw(key, tuning)
        root = tree.root
        new_h = tree.heights[root] * s
        lo = jnp.maximum(
            tree.heights[tree.children[root, 0]],
            tree.heights[tree.children[root, 1]],
        )
        ok = new_h > lo
        tree = tree.replace(heights=tree.heights.at[root].set(new_h))
        logh = jnp.where(ok, -jnp.log(s), NEG_INF)
        return params, tree, logh


@dataclasses.dataclass
class TransformedRandomWalkOperator(Operator):
    """Random walk on transform(x): u' = u + U(-w,w) on a random dim,
    x' = transform^{-1}(u'); Hastings = logdetJ_inv(u') - logdetJ_inv(u)
    (ref: TransformedParameterRandomWalkOperator.java — the walk happens
    on the transformed parameter's value space and the underlying
    parameter is updated through the inverse map)."""

    parameter: str = ""
    transform: object = None  # utils.transforms.Transform
    window: float = 1.0
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log(self.window)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        u = jnp.atleast_1d(self.transform.forward(x))
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, u.shape[0])
        delta = (jax.random.uniform(k2, dtype=u.dtype) * 2.0 - 1.0) * tuning
        u2 = u.at[idx].add(delta)
        x2 = jnp.reshape(self.transform.inverse(u2), jnp.shape(x))
        logh = (self.transform.log_det_jacobian_inverse(u2)
                - self.transform.log_det_jacobian_inverse(u))
        ok = jnp.all(jnp.isfinite(jnp.atleast_1d(x2)))
        logh = jnp.where(ok, logh, NEG_INF)
        return {**params, self.parameter: x2}, tree, logh


@dataclasses.dataclass
class StarRootHeightScaleOperator(Operator):
    """Scale the single tied height of a star tree: ALL internal nodes
    move with the root (ref: StarTreeModel.getNodeHeight — internal
    heights read as the root height, so the root is the only internal
    degree of freedom; one-dim scale Hastings -log s). Lower bound is
    the oldest tip."""

    n_taxa: int = 0
    scale_factor: float = 0.75
    adaptable: bool = True

    modifies_params = ()  # tree-only proposal

    def initial_adapt(self) -> float:
        return math.log((1.0 / self.scale_factor - 1.0))

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def propose(self, params, tree, key, tuning):
        s = _scale_draw(key, tuning)
        new_h = tree.heights[tree.root] * s
        idx = jnp.arange(tree.heights.shape[0])
        lo = jnp.max(jnp.where(idx < self.n_taxa, tree.heights, -jnp.inf))
        ok = new_h > lo
        heights = jnp.where(idx < self.n_taxa, tree.heights, new_h)
        tree = tree.replace(heights=heights)
        logh = jnp.where(ok, -jnp.log(s), NEG_INF)
        return params, tree, logh


@dataclasses.dataclass
class NarrowExchangeOperator(Operator):
    """ref: ExchangeOperator.java narrow — swap a node with its uncle when
    the uncle is younger than the node's parent. Symmetric (logq 0)."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        root = tree.root
        ex = jnp.stack([root, tree.children[root, 0], tree.children[root, 1]])
        i = sample_excluding(key, m, ex)
        ip = tree.parent[i]
        igp = tree.parent[ip]
        uncle = other_child(tree.children, igp, ip)
        valid = tree.heights[uncle] < tree.heights[ip]
        parent = tree.parent.at[i].set(igp).at[uncle].set(ip)
        children = replace_child(tree.children, ip, i, uncle)
        children = replace_child(children, igp, uncle, i)
        tree = tree.replace(parent=parent, children=children)
        return params, tree, jnp.where(valid, 0.0, NEG_INF)


@dataclasses.dataclass
class WideExchangeOperator(Operator):
    """ref: ExchangeOperator.java wide — swap two random subtrees when
    heights permit. Symmetric."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        root = tree.root
        k1, k2 = jax.random.split(key)
        i = sample_excluding(k1, m, root[None])
        j = sample_excluding(k2, m, jnp.stack([root, i]))
        ip = tree.parent[i]
        jp = tree.parent[j]
        h = tree.heights
        valid = (
            (ip != jp) & (i != jp) & (j != ip)
            & (h[j] < h[ip]) & (h[i] < h[jp])
        )
        parent = tree.parent.at[i].set(jp).at[j].set(ip)
        children = replace_child(tree.children, ip, i, j)
        children = replace_child(children, jp, j, i)
        tree = tree.replace(parent=parent, children=children)
        return params, tree, jnp.where(valid, 0.0, NEG_INF)


@dataclasses.dataclass
class WilsonBaldingOperator(Operator):
    """ref: WilsonBalding.java proposeTree — prune subtree i (with its
    parent iP), regraft iP onto a random branch <k,j> above height(i),
    drawing iP's new height uniformly in the branch window. Root-changing
    variants are disallowed (as in the reference's current code path);
    Hastings = newRange / oldRange."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        root = tree.root
        h = tree.heights
        k1, k2, k3 = jax.random.split(key, 3)
        i = sample_excluding(k1, m, root[None])
        j = jax.random.randint(k2, (), 0, m, dtype=tree.parent.dtype)
        ip = tree.parent[i]
        k = tree.parent[j]
        cip = other_child(tree.children, ip, i)
        pip = tree.parent[ip]
        valid = (
            (j != root) & (ip != root)
            & (j != i) & (k != ip) & (j != ip) & (k != i)
            & (h[jnp.maximum(k, 0)] > h[i])
        )
        new_min = jnp.maximum(h[i], h[j])
        new_range = h[jnp.maximum(k, 0)] - new_min
        new_age = new_min + jax.random.uniform(k3, dtype=h.dtype) * new_range
        old_min = jnp.maximum(h[i], h[cip])
        old_range = h[jnp.maximum(pip, 0)] - old_min
        logh = jnp.where(
            valid, jnp.log(new_range) - jnp.log(old_range), NEG_INF
        )
        # rewire (sequence valid for the k == pip case too)
        children = replace_child(tree.children, ip, cip, j)
        children = replace_child(children, pip, ip, cip)
        children = replace_child(children, k, j, ip)
        parent = tree.parent.at[ip].set(k).at[j].set(ip).at[cip].set(pip)
        heights = h.at[ip].set(new_age)
        tree = tree.replace(parent=parent, children=children, heights=heights)
        return params, tree, logh


@dataclasses.dataclass
class UniformIntegerOperator(Operator):
    """ref: UniformIntegerOperator.java — set a random dim of an integer
    parameter to U{lower..upper}; symmetric. Used for relaxed-clock rate
    categories (DiscretizedBranchRates)."""

    parameter: str = ""
    lower: int = 0
    upper: int = 1  # inclusive

    def propose(self, params, tree, key, tuning):
        x0 = params[self.parameter]
        x = jnp.atleast_1d(x0)
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, x.shape[0])
        v = jax.random.randint(k2, (), self.lower, self.upper + 1)
        new = x.at[idx].set(v.astype(x.dtype)).reshape(jnp.shape(x0))
        return ({**params, self.parameter: new}, tree,
                jnp.asarray(0.0, tree.heights.dtype))


@dataclasses.dataclass
class SwapOperator(Operator):
    """ref: SwapOperator.java — swap two random dims of a parameter;
    symmetric."""

    parameter: str = ""

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        dim = x.shape[0]
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (), 0, dim)
        j = sample_excluding(k2, dim, i[None])
        xi, xj = x[i], x[j]
        return (
            {**params, self.parameter: x.at[i].set(xj).at[j].set(xi)},
            tree,
            jnp.asarray(0.0, tree.heights.dtype),
        )


@dataclasses.dataclass
class BitFlipOperator(Operator):
    """ref: BitFlipOperator.java — flip one random bit of a 0/1 indicator
    vector (BSSVS). With the default usesPriorOnSum, the Hastings ratio
    makes the move symmetric on the number of ones:
      flip 0->1: logq = -log((dim - sum)/(sum + 1))
      flip 1->0: logq = -log(sum/(dim - sum + 1))
    """

    parameter: str = ""
    uses_prior_on_sum: bool = True

    def propose(self, params, tree, key, tuning):
        x0 = params[self.parameter]
        x = jnp.atleast_1d(x0)
        dim = x.shape[0]
        fdt = tree.heights.dtype
        pos = jax.random.randint(key, (), 0, dim)
        value = x[pos]
        flipped = x.at[pos].set(1 - value)
        if self.uses_prior_on_sum:
            s = jnp.sum(x).astype(fdt)
            d = jnp.asarray(dim, fdt)
            logq = jnp.where(
                value == 0,
                -jnp.log((d - s) / (s + 1.0)),
                -jnp.log(s / (d - s + 1.0)),
            )
        else:
            logq = jnp.asarray(0.0, fdt)
        return ({**params, self.parameter: flipped.reshape(jnp.shape(x0))},
                tree, logq)


@dataclasses.dataclass
class JointOperator(Operator):
    """Apply sub-operators in sequence on the same draw, summing their
    log-Hastings corrections (ref: src/dr/inference/operators/
    JointOperator.java — used to move correlated parameters together).
    Sub-operators use their own static tuning (not adapted)."""

    sub_operators: Sequence[Operator] = ()

    def propose(self, params, tree, key, tuning):
        logh = jnp.asarray(0.0, tree.heights.dtype)
        for i, op in enumerate(self.sub_operators):
            key, sub = jax.random.split(key)
            out = op.propose(params, tree, sub, op.tuning(op.initial_adapt()))
            params, tree, lh = out[0], out[1], out[2]
            logh = logh + lh
        return params, tree, logh


@dataclasses.dataclass
class NormalGammaPrecisionGibbsOperator(Operator):
    """Conjugate Gibbs draw of a normal precision given residuals (ref:
    src/dr/inference/operators/NormalGammaPrecisionGibbsOperator.java):
    tau | x ~ Gamma(shape + n/2, rate + sum((x-mu)^2)/2). Always accepted
    (Gibbs): log-Hastings = +inf, internal acceptance statistic 1.

    data_parameter: params key holding the observations; mean_parameter:
    params key for the (scalar) mean; precision_parameter: target.
    """

    data_parameter: str = ""
    mean_parameter: str = ""
    precision_parameter: str = ""
    prior_shape: float = 0.001
    prior_rate: float = 0.001

    def propose(self, params, tree, key, tuning):
        x = jnp.atleast_1d(params[self.data_parameter])
        mu = params[self.mean_parameter]
        n = x.shape[0]
        shape = self.prior_shape + 0.5 * n
        rate = self.prior_rate + 0.5 * jnp.sum((x - mu) ** 2)
        tau = jax.random.gamma(key, shape, dtype=x.dtype) / rate
        new = {**params, self.precision_parameter: tau}
        return new, tree, jnp.asarray(jnp.inf, tree.heights.dtype), jnp.asarray(1.0, tree.heights.dtype)


@dataclasses.dataclass
class NormalNormalMeanGibbsOperator(Operator):
    """Conjugate Gibbs draw of a normal mean given data and precision
    (ref: src/dr/inference/operators/NormalNormalMeanGibbsOperator.java):
    mu | x ~ N((p0 m0 + n tau xbar)/(p0 + n tau), 1/(p0 + n tau))."""

    data_parameter: str = ""
    mean_parameter: str = ""
    precision_parameter: str = ""
    prior_mean: float = 0.0
    prior_precision: float = 1e-4

    def propose(self, params, tree, key, tuning):
        x = jnp.atleast_1d(params[self.data_parameter])
        tau = params[self.precision_parameter]
        n = x.shape[0]
        post_prec = self.prior_precision + n * tau
        post_mean = (self.prior_precision * self.prior_mean
                     + tau * jnp.sum(x)) / post_prec
        mu = post_mean + jax.random.normal(key, dtype=x.dtype) / jnp.sqrt(post_prec)
        new = {**params, self.mean_parameter: mu}
        return new, tree, jnp.asarray(jnp.inf, tree.heights.dtype), jnp.asarray(1.0, tree.heights.dtype)


@dataclasses.dataclass
class UniformRealOperator(Operator):
    """ref: UniformOperator.java on a bounded real parameter — set one
    random dimension to U(lower, upper); symmetric."""

    parameter: str = ""
    lower: float = 0.0
    upper: float = 1.0

    def propose(self, params, tree, key, tuning):
        x = jnp.atleast_1d(params[self.parameter])
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, x.shape[0])
        v = jax.random.uniform(k2, (), x.dtype, self.lower, self.upper)
        x1 = x.at[idx].set(v).reshape(jnp.shape(params[self.parameter]))
        return (
            {**params, self.parameter: x1},
            tree,
            jnp.asarray(0.0, tree.heights.dtype),
        )


@dataclasses.dataclass
class CompoundWeightedDeltaOperator(Operator):
    """Weighted delta exchange across SEPARATE scalar parameters (the
    reference's <deltaExchange parameterWeights> on a compoundParameter,
    DeltaExchangeOperator.java weighted branch): picks two members i != j
    and moves x_i += d/w_i, x_j -= d/w_j, keeping sum w x constant;
    symmetric, rejected at the bound."""

    parameters: Sequence[str] = ()
    parameter_weights: Sequence[float] = ()
    delta: float = 0.02
    lower: float = 0.0
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log(self.delta)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        n = len(self.parameters)
        dt = tree.heights.dtype
        k1, k2, k3 = jax.random.split(key, 3)
        i = jax.random.randint(k1, (), 0, n)
        j_raw = jax.random.randint(k2, (), 0, n - 1)
        j = jnp.where(j_raw >= i, j_raw + 1, j_raw)
        d = jax.random.uniform(k3, (), dt, 0.0, tuning)
        w = jnp.asarray(self.parameter_weights or [1.0] * n, dt)
        vals = jnp.stack(
            [jnp.reshape(params[p], ()).astype(dt) for p in self.parameters]
        )
        delta_vec = (
            jnp.zeros(n, dt).at[i].add(d / w[i]).at[j].add(-d / w[j])
        )
        new_vals = vals + delta_vec
        ok = jnp.all(new_vals > self.lower)
        new_vals = jnp.where(ok, new_vals, vals)
        out = dict(params)
        for k_, p in enumerate(self.parameters):
            out[p] = new_vals[k_].astype(params[p].dtype).reshape(
                jnp.shape(params[p])
            )
        return out, tree, jnp.where(ok, 0.0, NEG_INF).astype(dt)


@dataclasses.dataclass
class MvnRandomWalkOperator(Operator):
    """MVN random walk with a fixed proposal Cholesky (ref:
    MVNOperator — scaleFactor * L z added to the whole vector;
    symmetric proposal)."""

    parameter: str = ""
    chol: object = None  # [D, D] host-side
    scale_factor: float = 1.0
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log(self.scale_factor)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        flat = jnp.ravel(x)
        l = jnp.asarray(self.chol, flat.dtype)
        z = jax.random.normal(key, flat.shape, flat.dtype)
        new = flat + tuning * (l @ z)
        return ({**params, self.parameter: new.reshape(jnp.shape(x))},
                tree, jnp.zeros((), tree.heights.dtype))


@dataclasses.dataclass
class SubsetRandomWalkOperator(Operator):
    """Random walk restricted to a fixed index subset of a vector
    parameter (ref: MaskedParameter + RandomWalkOperator — the mask==1
    entries are the operator's whole world; e.g. sampling NA-missing
    GLM covariates, MaskedParameterParser.java build="true")."""

    parameter: str = ""
    indices: Sequence[int] = ()
    window: float = 1.0
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return math.log(self.window)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        flat = jnp.ravel(x)
        idx = jnp.asarray(self.indices)
        k1, k2 = jax.random.split(key)
        j = idx[jax.random.randint(k1, (), 0, idx.shape[0])]
        delta = (jax.random.uniform(k2, dtype=flat.dtype) * 2.0 - 1.0) * tuning
        new = flat.at[j].add(delta)
        return ({**params, self.parameter: new.reshape(jnp.shape(x))},
                tree, jnp.zeros((), tree.heights.dtype))


@dataclasses.dataclass
class RateBitExchangeOperator(Operator):
    """ref: RateBitExchangeOperator.java:26-49 — the rate/indicator
    vectors split in half; swap the (bit, rate) pair at a random index
    between the two halves when at least one bit is set; symmetric."""

    bit_parameter: str = ""
    rate_parameter: str = ""

    @property
    def modifies_params(self):
        return (self.bit_parameter, self.rate_parameter)

    def propose(self, params, tree, key, tuning):
        bits = jnp.ravel(params[self.bit_parameter])
        rates = jnp.ravel(params[self.rate_parameter])
        dim = bits.shape[0] // 2
        idx = jax.random.randint(key, (), 0, dim)
        ok = (bits[idx] + bits[idx + dim]) >= 1
        b1, b2 = bits[idx], bits[idx + dim]
        r1, r2 = rates[idx], rates[idx + dim]
        bits2 = bits.at[idx].set(b2).at[idx + dim].set(b1)
        rates2 = rates.at[idx].set(r2).at[idx + dim].set(r1)
        logh = jnp.where(ok, 0.0, NEG_INF).astype(tree.heights.dtype)
        return ({**params,
                 self.bit_parameter: bits2.reshape(
                     jnp.shape(params[self.bit_parameter])),
                 self.rate_parameter: rates2.reshape(
                     jnp.shape(params[self.rate_parameter]))},
                tree, logh)


@dataclasses.dataclass
class TeamOperator(Operator):
    """ref: TeamOperator.java:115-128 — draw nPick of the N sub-
    operators (uniform, without replacement) and apply them in
    sequence, summing the log-Hastings corrections."""

    sub_operators: Sequence[Operator] = ()
    n_pick: int = 1

    def modified_params(self):
        out = []
        for op in self.sub_operators:
            mp = op.modified_params()
            if mp is None:
                return None
            out.extend(mp)
        return tuple(dict.fromkeys(out))

    def propose(self, params, tree, key, tuning):
        n = len(self.sub_operators)
        k_perm, key = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)
        logh = jnp.zeros((), tree.heights.dtype)
        branches = [
            (lambda p, t, k, op=op: op.propose(p, t, k, op.tuning(
                jnp.asarray(op.initial_adapt()))))
            for op in self.sub_operators
        ]
        for slot in range(self.n_pick):
            key, k_op = jax.random.split(key)
            sel = perm[slot]
            p2, t2, lh = jax.lax.switch(sel, branches, params, tree, k_op)
            out = (p2, t2, lh)
            params, tree = out[0], out[1]
            logh = logh + jnp.asarray(out[2], logh.dtype)
        return params, tree, logh
