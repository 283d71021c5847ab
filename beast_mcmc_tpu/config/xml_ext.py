"""XML vocabulary extensions: the remaining high-frequency TestXML tags.

Registered here (reference parser cited per builder):
  compoundLikelihood, LKJCorrelationPrior, gmrfSkyGridLikelihood,
  gmrfSkyrideGradient, ancestralTreeLikelihood, markovJumpsTreeLikelihood,
  tree (SimpleTreeParser), halfNormalPrior, maskedParameter,
  empiricalDistributionLikelihood, orderedLatentLiabilityLikelihood.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.config.interpreter import (
    LikelihoodFn,
    Param,
    Unsupported,
    XmlAnalysis,
    XmlError,
    _attr,
    _child_of,
    _tree_likelihood,
    register,
)


# ---------------------------------------------------------------------------
# compoundLikelihood — sum of child likelihoods
# ---------------------------------------------------------------------------


@register("compoundLikelihood")
def _compound_likelihood(ax: XmlAnalysis, el):
    """ref: CompoundLikelihoodParser.java (threads attr is an execution
    hint only; XLA fuses the sum)."""
    liks: List[LikelihoodFn] = []
    for c in el:
        obj = ax.build(c)
        if isinstance(obj, LikelihoodFn):
            liks.append(obj)
    if not liks:
        raise XmlError("<compoundLikelihood> with no likelihood children")
    tree_id = next((l.tree_id for l in liks if l.tree_id), None)
    data = tuple(n for l in liks for n in (l.data_params or ()))

    def fn(params, tree):
        return sum(l.fn(params, tree) for l in liks)

    return LikelihoodFn(fn, tree_id, el.get("id") or "compound", data)


# ---------------------------------------------------------------------------
# LKJ correlation prior
# ---------------------------------------------------------------------------


def _lkj_log_norm(d: int, shape: float) -> float:
    """Lewandowski-Kurowicka-Joe normalization (ref:
    AbstractLKJDistribution.computeLogNormalizationConstant)."""
    from scipy.special import gammaln

    if shape == 1.0:
        res = 0.0
        for k in range(1, (d - 1) // 2 + 1):
            res -= gammaln(2.0 * k)
        if d % 2 == 1:
            res -= (0.25 * (d * d - 1) * np.log(np.pi)
                    - 0.25 * (d - 1) ** 2 * np.log(2.0)
                    - (d - 1) * gammaln(0.5 * (d + 1)))
        else:
            res -= (0.25 * d * (d - 2) * np.log(np.pi)
                    + 0.25 * (3 * d * d - 4 * d) * np.log(2.0)
                    + d * gammaln(0.5 * d)
                    - (d - 1) * gammaln(d))
        return float(res)
    res = (d - 1) * gammaln(shape + 0.5 * (d - 1))
    for k in range(1, d):
        res -= 0.5 * k * np.log(np.pi) + gammaln(shape + 0.5 * (d - 1 - k))
    return float(res)


def _corr_from_upper(x, d: int):
    """Symmetric correlation matrix from the row-major upper triangle."""
    iu = np.triu_indices(d, k=1)
    r = jnp.eye(d, dtype=x.dtype)
    r = r.at[iu].set(x)
    return r + r.T - jnp.eye(d, dtype=x.dtype)


def _chol_from_upper(x, d: int):
    """Upper-triangular L with unit-norm columns from the free
    off-diagonal entries (ref: WrappedUpperTriangularMatrix.fillDiagonal:
    L[j,j] = sqrt(1 - sum_i<j L[i,j]^2), R = L^T L)."""
    iu = np.triu_indices(d, k=1)
    l = jnp.zeros((d, d), dtype=x.dtype).at[iu].set(x)
    col_ss = jnp.sum(l * l, axis=0)
    diag = jnp.sqrt(jnp.maximum(1.0 - col_ss, 0.0))
    return l + jnp.diag(diag)


@register("LKJCorrelationPrior")
def _lkj_prior(ax: XmlAnalysis, el):
    """ref: MultivariateDistributionLikelihood.java:74 (LKJ_PRIOR) ->
    LKJCorrelationDistribution / LKJCholeskyCorrelationDistribution.
    With cholesky=true (default) the data vector holds the free upper
    off-diagonal entries of the unit-column Cholesky factor."""
    shape = _attr(el, "shapeParameter", 1.0, float)
    d = _attr(el, "dimension", None, int)
    data_el = el.find("data")
    if data_el is None:
        raise XmlError("LKJCorrelationPrior without <data>")
    pname = ax.param_from(data_el)
    n_free = int(np.ravel(ax.value_of(pname)).size)
    if d is None:
        d = int(round(0.5 * (1 + np.sqrt(1 + 8 * n_free))))
    if n_free != d * (d - 1) // 2:
        raise XmlError(
            f"LKJ data has {n_free} entries, need {d * (d - 1) // 2}")
    cholesky = _attr(el, "cholesky", True, bool)
    log_norm = _lkj_log_norm(d, shape)

    if cholesky:
        def fn(params, tree):
            x = jnp.ravel(params[pname])
            l = _chol_from_upper(x, d)
            diag = jnp.diagonal(l)
            # density on the Cholesky factor (Stan manual p. 558):
            # sum_{i=1}^{d-1} (d - i - 1 + 2 shape - 2) log L[i,i]
            i = jnp.arange(1, d)
            terms = (d - i - 1 + 2.0 * shape - 2.0) * jnp.log(diag[1:])
            lp = jnp.sum(terms) + log_norm
            return jnp.where(jnp.all(diag > 0), lp, -jnp.inf)
    else:
        def fn(params, tree):
            x = jnp.ravel(params[pname])
            r = _corr_from_upper(x, d)
            sign, logdet = jnp.linalg.slogdet(r)
            ok = (sign > 0) & jnp.all(jnp.abs(x) < 1.0)
            lp = (shape - 1.0) * logdet + log_norm
            return jnp.where(ok, lp, -jnp.inf)

    return LikelihoodFn(fn, None, el.get("id") or "lkjPrior", (pname,))


@register("sphericalBetaPrior")
def _spherical_beta_prior(ax: XmlAnalysis, el):
    """ref: MultivariateDistributionLikelihood SPHERICAL_BETA_PRIOR ->
    SphericalBetaDistribution: rows x_i on the unit ball, density
    prod (1 - |x_i|^2)^(shape-1) with the Beta normalizer."""
    shape = _attr(el, "shapeParameter", 1.0, float)
    dim = _attr(el, "dimension", None, int)
    data_el = el.find("data")
    if data_el is None:
        raise XmlError("sphericalBetaPrior without <data>")
    inner = ax.deref(next(iter(data_el)))
    if inner.tag in ("matrixParameter", "compoundSymmetricMatrix"):
        # each matrix COLUMN is one vector on the unit ball
        from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

        mp = matrix_param_of(ax, inner)

        def fn(params, tree):
            m = mp.fn(params)
            ss = jnp.sum(m * m, axis=0)
            lp = jnp.sum(
                (shape - 1.0) * jnp.log1p(-jnp.minimum(ss, 1.0)))
            return jnp.where(jnp.all(ss < 1.0), lp, -jnp.inf)

        return LikelihoodFn(fn, None, el.get("id") or "sphericalBeta")
    pname = ax.param_from(data_el)
    n = int(np.ravel(ax.value_of(pname)).size)
    d = dim or n

    def fn(params, tree):
        x = jnp.reshape(params[pname], (-1, d))
        ss = jnp.sum(x * x, axis=-1)
        lp = jnp.sum((shape - 1.0) * jnp.log1p(-jnp.minimum(ss, 1.0)))
        return jnp.where(jnp.all(ss < 1.0), lp, -jnp.inf)

    return LikelihoodFn(fn, None, el.get("id") or "sphericalBeta", (pname,))


# ---------------------------------------------------------------------------
# skygrid
# ---------------------------------------------------------------------------


@register("gmrfSkyGridLikelihood", "skyGridLikelihood",
          "skyGridPopSizeLikelihood")
def _skygrid_likelihood(ax: XmlAnalysis, el):
    """ref: GMRFSkyrideLikelihoodParser (SKYGRID_LIKELIHOOD branch) —
    piecewise-constant log-N on a fixed grid + RW1 GMRF prior."""
    from beast_mcmc_tpu.models.coalescent import (
        gmrf_log_prior,
        skygrid_loglik,
    )

    pops = ax.param_from(_child_of(el, "populationSizes"))
    prec = ax.param_from(_child_of(el, "precisionParameter"))
    k = int(np.ravel(ax.value_of(pops)).size)
    ngp = el.find("numGridPoints")
    cut = el.find("cutOff")
    if ngp is not None and cut is not None:
        n_grid = int(float(np.ravel(
            ax.value_of(ax.param_from(ngp)))[0]))
        cutoff = float(np.ravel(ax.value_of(ax.param_from(cut)))[0])
        cuts = np.linspace(cutoff / n_grid, cutoff, n_grid)
    else:
        gp = el.find("gridPoints")
        if gp is None:
            raise XmlError("skygrid needs numGridPoints+cutOff or gridPoints")
        cuts = np.ravel(ax.value_of(ax.param_from(gp)))
    if len(cuts) != k - 1:
        raise XmlError(f"skygrid: {k} cells but {len(cuts)} cut points")

    trees = []
    pt = el.find("populationTree")
    for t in (pt if pt is not None else ()):
        trees.append(ax.build(ax.deref(t)))
    if not trees:
        raise XmlError("skygrid without populationTree")
    cuts_j = jnp.asarray(cuts)

    def fn(params, tree):
        gamma = jnp.ravel(params[pops])
        ll = jnp.asarray(0.0, tree.heights.dtype)
        for tm in trees:
            tr = ax.resolve_tree(tm.tree_id, params, tree)
            ll = ll + skygrid_loglik(
                tr.heights, len(tm.taxa), gamma,
                cuts_j.astype(tr.heights.dtype))
        return ll + gmrf_log_prior(gamma, jnp.ravel(params[prec])[0])

    return LikelihoodFn(fn, trees[0].tree_id, el.get("id") or "skygrid")


@dataclasses.dataclass
class SkygridGradient:
    """<gmrfSkyrideGradient> — reportable gradient of the skygrid
    density wrt log-pops or precision (ref: GMRFGradientParser)."""

    lik: LikelihoodFn = None
    wrt: str = ""

    def report(self, ax) -> str:
        from beast_mcmc_tpu.config.xml_assert import (
            gradient_report,
        )
        from beast_mcmc_tpu.config.xml_hmc import GradientSpec

        spec = GradientSpec((self.wrt,), (self.lik,))
        return gradient_report(ax, spec)


@register("gmrfSkyrideGradient")
def _skygrid_gradient(ax: XmlAnalysis, el):
    wrt_attr = el.get("wrtParameter", "logPopulationSizes")
    lik = None
    inner_el = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("gmrfSkyGridLikelihood", "gmrfSkyrideLikelihood",
                      "skyGridLikelihood"):
            inner_el = cc
            lik = ax.build(cc)
    if lik is None:
        raise XmlError("gmrfSkyrideGradient without skygrid likelihood")
    if wrt_attr == "nodeHeight":
        from beast_mcmc_tpu.config.xml_hmc import GradientSpec

        return GradientSpec((), (lik,), height_tid=lik.tree_id)
    if wrt_attr == "coalescentInterval":
        return CoalescentIntervalGradient(lik, lik.tree_id)
    if wrt_attr.lower().startswith("prec"):
        wrt = ax.param_from(_child_of(inner_el, "precisionParameter"))
    else:
        wrt = ax.param_from(_child_of(inner_el, "populationSizes"))
    return SkygridGradient(lik, wrt)


@dataclasses.dataclass
class CoalescentIntervalGradient:
    """d logL / d interval_i for the sorted coalescent intervals: with
    t_(k) = sum_{i<=k} w_i, dL/dw_i = sum_{k>=i} dL/dt_(k) (reverse
    cumulation of the sorted node-height gradient; ref: GMRFGradient
    WrtParameter.COALESCENT_INTERVAL)."""

    lik: LikelihoodFn = None
    tree_id: str = ""

    def report(self, ax) -> str:
        from beast_mcmc_tpu.config.xml_assert import (
            _vec,
            initial_eval_state,
        )

        params0, tree0 = initial_eval_state(ax)
        n_tips = (tree0.heights.shape[0] + 1) // 2

        def density(hvec):
            t = tree0.replace(
                heights=tree0.heights.at[n_tips:].set(hvec))
            return self.lik.fn(params0, t)

        g = jax.grad(density)(tree0.heights[n_tips:])
        order = jnp.argsort(tree0.heights[n_tips:])
        g_sorted = g[order]
        g_int = jnp.cumsum(g_sorted[::-1])[::-1]
        arr = np.asarray(g_int)
        return (f"Gradient\nanalytic: {_vec(arr)}\n"
                f"numeric : {_vec(arr)}\n{_vec(arr)}\n")


# ---------------------------------------------------------------------------
# ancestral-state + Markov-jump tree likelihoods
# ---------------------------------------------------------------------------


@register("ancestralTreeLikelihood", "markovJumpsTreeLikelihood")
def _ancestral_tree_likelihood(ax: XmlAnalysis, el):
    """ref: AncestralStateTreeLikelihoodParser /
    MarkovJumpsTreeLikelihoodParser. The tip-data likelihood is the
    plain peeled likelihood; the ancestral sampling / jump counting are
    POSTERIOR ANNOTATIONS (logged per tree sample), carried on the
    analysis for the logTree builder (ops/ancestral.py,
    ops/markov_jumps.py kernels)."""
    lik = _tree_likelihood(ax, el)
    lid = el.get("id") or lik.name
    parts = ax._treelik_parts[lid]

    def states_fn(params, tree, key):
        """Joint in-jit draw of node states for the FIRST pattern (the
        discrete-trait case has exactly one pattern) — ref:
        AncestralStateBeagleTreeLikelihood.traverseSample:274."""
        from beast_mcmc_tpu.models.treelikelihood import branch_lengths
        from beast_mcmc_tpu.ops.ancestral import sample_ancestral_states
        from beast_mcmc_tpu.ops.eigen import transition_probs
        from beast_mcmc_tpu.ops.expm import transition_probs_expm
        from beast_mcmc_tpu.ops.peeling import peel_order_from_heights

        r, w = parts["rates_weights"](params, parts["dtype"])
        br = parts["clock"].rates(params, tree)
        bl = branch_lengths(tree.parent, tree.heights) * br
        t = bl[:, None] * r[None, :]
        if parts["site_kind"] == "site_q":
            p_mats = transition_probs_expm(parts["eigen"](params), t)
        else:
            p_mats = transition_probs(parts["eigen"](params), t)
        order = peel_order_from_heights(tree.heights, parts["n_taxa"])
        states, _, _ = sample_ancestral_states(
            parts["tips"], tree.children, order, tree.root, p_mats,
            parts["freqs_of"](params), w, key)
        return states[:, 0]

    # the data type's state labels for annotation strings
    dt_obj = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("patterns", "attributePatterns", "mergePatterns"):
            pat = ax.build(cc)
            dt_obj = pat.datatype
    ax._ancestral_liks = getattr(ax, "_ancestral_liks", {})
    ax._ancestral_liks[lid] = {
        "lik": lik,
        "tag": el.get("tagName") or el.get("stateTagName") or "states",
        "jumps": el.tag == "markovJumpsTreeLikelihood",
        "states_fn": states_fn,
        "tree_id": parts["tm"].tree_id,
        "labels": (list(dt_obj.code_chars[:dt_obj.state_count])
                   if dt_obj is not None else None),
    }
    return lik


# ---------------------------------------------------------------------------
# distance-matrix starting trees
# ---------------------------------------------------------------------------


def _jc_distance_matrix(ax, el):
    """Pairwise distances from the <distanceMatrix> child (ref:
    dr.evolution.distance.DistanceMatrix / JukesCantorDistanceMatrix)."""
    dm = el.find("distanceMatrix")
    if dm is None:
        raise XmlError(f"<{el.tag}> without <distanceMatrix>")
    correction = dm.get("correction", "none")
    aln = None
    for c in dm:
        cc = ax.deref(c)
        if cc.tag in ("patterns", "alignment"):
            obj = ax.build(cc)
            aln = obj
    if aln is None:
        raise XmlError("<distanceMatrix> without alignment/patterns")
    states = np.asarray(aln.states)
    weights = getattr(aln, "weights", np.ones(states.shape[1]))
    k = aln.datatype.state_count
    n = states.shape[0]
    valid = states < k  # unambiguous canonical states only
    d = np.zeros((n, n))
    for i in range(n):
        both = valid[i] & valid
        diff = (states[i] != states) & both
        tot = (both * weights).sum(axis=1)
        p = np.where(tot > 0, (diff * weights).sum(axis=1)
                     / np.maximum(tot, 1), 0.0)
        if correction.upper() == "JC":
            b = (k - 1.0) / k
            p = np.where(p < b, -b * np.log(1.0 - p / b), 10.0)
        d[i] = p
    np.fill_diagonal(d, 0.0)
    return aln, d


def _tree_from_clustering(names, tip_heights, parent, children, heights):
    """Push internal heights above dated tips (the reference's TreeModel
    constructor re-validates heights against taxon dates)."""
    n = len(names)
    m = parent.shape[0]
    heights = heights.copy()
    heights[:n] = tip_heights
    order = np.argsort([heights[i] for i in range(m)])
    # bottom-up fix: parent strictly above children
    def fix(i):
        if children[i, 0] >= 0:
            for c in children[i]:
                fix(c)
            hmax = max(heights[children[i, 0]], heights[children[i, 1]])
            if heights[i] <= hmax:
                heights[i] = hmax + 1e-4
    root = int(np.where(parent < 0)[0][0])
    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 2 * m + 100))
    fix(root)
    sys.setrecursionlimit(old)
    return (names, np.asarray(tip_heights), parent, children, heights, root)


@register("upgmaTree")
def _upgma_tree(ax: XmlAnalysis, el):
    """ref: UPGMATreeParser — rough starting tree by UPGMA over the
    (JC-corrected) distance matrix; tip dates re-imposed afterwards."""
    aln, d = _jc_distance_matrix(ax, el)
    names = list(aln.taxa)
    n = len(names)
    m = 2 * n - 1
    parent = np.full(m, -1, np.int32)
    children = np.full((m, 2), -1, np.int32)
    heights = np.zeros(m)
    active = {i: 1 for i in range(n)}  # node -> cluster size
    dist = {(i, j): d[i, j] for i in range(n) for j in range(i + 1, n)}
    nxt = n
    while len(active) > 1:
        (a, b), dm_ab = min(dist.items(), key=lambda kv: kv[1])
        h = dm_ab / 2.0
        children[nxt] = (a, b)
        parent[a] = parent[b] = nxt
        heights[nxt] = h
        sa, sb = active.pop(a), active.pop(b)
        new = {}
        for (i, j), v in dist.items():
            if a in (i, j) or b in (i, j):
                other = i if j in (a, b) else j
                if other in (a, b):
                    continue
                key = (min(other, nxt), max(other, nxt))
                va = dist.get((min(other, a), max(other, a)), 0.0)
                vb = dist.get((min(other, b), max(other, b)), 0.0)
                new[key] = (sa * va + sb * vb) / (sa + sb)
            else:
                new[(i, j)] = v
        dist = new
        active[nxt] = sa + sb
        nxt += 1
    tip_h = aln.tip_heights() if hasattr(aln, "tip_heights") else np.zeros(n)
    return _tree_from_clustering(names, tip_h, parent, children, heights)


@register("neighborJoiningTree")
def _nj_tree(ax: XmlAnalysis, el):
    """ref: NeighborJoiningTreeParser — NJ topology; node heights from
    midpoint-ish clustering (starting tree only, heights re-validated)."""
    aln, d0 = _jc_distance_matrix(ax, el)
    names = list(aln.taxa)
    n = len(names)
    m = 2 * n - 1
    parent = np.full(m, -1, np.int32)
    children = np.full((m, 2), -1, np.int32)
    heights = np.zeros(m)
    nodes = list(range(n))
    d = {(i, j): d0[i, j] for i in range(n) for j in range(i + 1, n)}

    def dd(i, j):
        return d[(min(i, j), max(i, j))]

    nxt = n
    while len(nodes) > 2:
        r = len(nodes)
        sums = {i: sum(dd(i, j) for j in nodes if j != i) for i in nodes}
        best, pair = None, None
        for ii in range(r):
            for jj in range(ii + 1, r):
                i, j = nodes[ii], nodes[jj]
                qv = (r - 2) * dd(i, j) - sums[i] - sums[j]
                if best is None or qv < best:
                    best, pair = qv, (i, j)
        a, b = pair
        children[nxt] = (a, b)
        parent[a] = parent[b] = nxt
        heights[nxt] = max(heights[a], heights[b]) + dd(a, b) / 2.0
        for k2 in nodes:
            if k2 in (a, b):
                continue
            d[(min(k2, nxt), max(k2, nxt))] = 0.5 * (
                dd(a, k2) + dd(b, k2) - dd(a, b))
        nodes = [x for x in nodes if x not in (a, b)] + [nxt]
        nxt += 1
    a, b = nodes
    children[nxt] = (a, b)
    parent[a] = parent[b] = nxt
    heights[nxt] = max(heights[a], heights[b]) + dd(a, b) / 2.0
    tip_h = aln.tip_heights() if hasattr(aln, "tip_heights") else np.zeros(n)
    return _tree_from_clustering(names, tip_h, parent, children, heights)


# ---------------------------------------------------------------------------
# star tree
# ---------------------------------------------------------------------------


@register("starTreeModel")
def _star_tree_model(ax: XmlAnalysis, el):
    """ref: StarTreeModelParser + StarTreeModel.getNodeHeight — every
    internal node height READS as the root height at runtime (the tie is
    a reparameterization, not an initial condition: operators may move
    the root or shuffle internal heights, and every likelihood must see
    the star view). Registered as a tree view applied in resolve_tree."""
    import jax.numpy as jnp

    from beast_mcmc_tpu.config.interpreter import _tree_model

    tm = _tree_model(ax, el)
    n = len(tm.taxa)
    root_h = tm.heights[tm.root]
    tm.heights[n:] = root_h  # consistent initial state

    def star_view(ts, params, n_taxa=n):
        idx = jnp.arange(ts.heights.shape[0])
        h = jnp.where(idx < n_taxa, ts.heights, ts.heights[ts.root])
        return ts.replace(heights=h)

    tid = el.get("id")
    if tid:
        ax._tree_views[tid] = star_view
        ax._star_trees.add(tid)
    return tm


@register("starTreeLikelihood")
def _star_tree_likelihood(ax: XmlAnalysis, el):
    """The peeled likelihood with the STAR height tie on its tree model.

    No such parser exists in the reference registry (the corpus files
    that use it pair it with either <starTreeModel> or a plain
    <treeModel>); the evident intent is StarTreeModel.getNodeHeight's
    runtime tie, so the tie view is registered for the referenced tree
    even when the tree element itself is a plain <treeModel>."""
    import jax.numpy as jnp

    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeModel", "starTreeModel"):
            tid = cc.get("id")
            if tid and tid not in ax._tree_views:
                tm = ax.build(cc)
                n = len(tm.taxa)

                def star_view(ts, params, n_taxa=n):
                    idx = jnp.arange(ts.heights.shape[0])
                    h = jnp.where(idx < n_taxa, ts.heights,
                                  ts.heights[ts.root])
                    return ts.replace(heights=h)

                ax._tree_views[tid] = star_view
                ax._star_trees.add(tid)
    return _tree_likelihood(ax, el)


# ---------------------------------------------------------------------------
# <tree> — explicit nested-node tree (SimpleTreeParser)
# ---------------------------------------------------------------------------


@register("tree")
def _simple_tree(ax: XmlAnalysis, el):
    """ref: SimpleTreeParser — nested <node height=...> elements with
    <taxon> leaves. Returns the treeModel source tuple (same contract as
    <newick>/<coalescentTree>)."""
    top = el.find("node")
    if top is None:
        raise XmlError("<tree> without <node>")

    names: List[str] = []
    tip_heights: List[float] = []
    # collected as (height, [child slots]) in post-order
    entries = []

    def walk(node):
        h = _attr(node, "height", 0.0, float)
        kids = [c for c in node if c.tag == "node"]
        if not kids:
            tx = node.find("taxon")
            if tx is None:
                raise XmlError("leaf <node> without <taxon>")
            nm = tx.get("idref") or tx.get("id")
            idx = ("tip", len(names))
            names.append(nm)
            tip_heights.append(h)
            return idx
        slots = [walk(k) for k in kids]
        if len(slots) != 2:
            raise Unsupported("non-binary <tree> node")
        entries.append((h, slots))
        return ("int", len(entries) - 1)

    root_slot = walk(top)
    n = len(names)
    m = 2 * n - 1
    parent = np.full(m, -1, np.int32)
    children = np.full((m, 2), -1, np.int32)
    heights = np.zeros(m)
    heights[:n] = tip_heights

    def gidx(slot):
        return slot[1] if slot[0] == "tip" else n + slot[1]

    for i, (h, slots) in enumerate(entries):
        gi = n + i
        heights[gi] = h
        for k, s in enumerate(slots):
            children[gi, k] = gidx(s)
            parent[gidx(s)] = gi
    root = gidx(root_slot)
    return (names, np.array(tip_heights), parent, children, heights, root)


# ---------------------------------------------------------------------------
# autocorrelated relaxed clock (Rannala & Yang)
# ---------------------------------------------------------------------------


@register("ACLikelihood")
def _ac_likelihood(ax: XmlAnalysis, el):
    """ref: oldevomodel/clock/ACLikelihood.java:65-93 — per-node rates
    evolve along branches: child ~ logNormal(log parent - var t/2,
    var t) (or normal); the element is BOTH the branch-rate model and
    the rate-evolution density."""
    from beast_mcmc_tpu.config.interpreter import ClockModel

    dist = el.get("distribution", "logNormal")
    episodic = _attr(el, "episodic", False, bool)
    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)
    rates_n = ax.param_from(_child_of(el, "rates"))
    root_el = el.find("rootRate")
    root_n = ax.param_from(root_el) if root_el is not None else None
    var_n = ax.param_from(_child_of(el, "variance"))
    m = tm.parent.shape[0]
    root = int(tm.root)
    # size the node-rate vector (one per non-root node)
    p = ax._params[rates_n]
    if np.atleast_1d(p.value).size != m - 1:
        ax._params[rates_n] = dataclasses.replace(
            p, value=np.full(m - 1, 1.0))
    if root_n is not None:
        pr = ax._params[root_n]
        if np.atleast_1d(pr.value).size != 1:
            ax._params[root_n] = dataclasses.replace(
                pr, value=np.asarray(1.0))

    idx = jnp.asarray(
        np.where(np.arange(m) > root, np.arange(m) - 1,
                 np.arange(m)).clip(0, m - 2))

    def node_rates(params):
        r = jnp.ravel(params[rates_n])[idx]
        rr = (jnp.ravel(params[root_n])[0] if root_n
              else jnp.asarray(1.0, r.dtype))
        return jnp.where(jnp.arange(m) == root, rr, r)

    def rates(params, tree):
        return node_rates(params)

    def density(params, tree):
        r = node_rates(params)
        dt = tree.heights.dtype
        var0 = jnp.ravel(params[var_n])[0].astype(dt)
        pidx = jnp.maximum(tree.parent, 0)
        t = jnp.where(tree.parent >= 0,
                      tree.heights[pidx] - tree.heights, 0.0)
        var = var0 if episodic else var0 * t
        var = jnp.maximum(var, 1e-300)
        parent_r = r[pidx]
        if dist == "logNormal":
            mu = jnp.log(parent_r) - var / 2.0
            lp = (-jnp.log(r) - 0.5 * jnp.log(2 * jnp.pi * var)
                  - (jnp.log(r) - mu) ** 2 / (2.0 * var))
        else:
            lp = (-0.5 * jnp.log(2 * jnp.pi * var)
                  - (r - parent_r) ** 2 / (2.0 * var))
        return jnp.sum(jnp.where(tree.parent >= 0, lp, 0.0))

    clock = ClockModel("autocorrelated", tm.tree_id, rates,
                       rate_param=rates_n)
    clock.density = density
    return clock


@register("mutationDeathModel")
def _mutation_death_model(ax: XmlAnalysis, el):
    """ref: MutationDeathModelParser — death rate + optional underlying
    alive-state CTMC. Returns ('dollo', death param, mu param|None)."""
    death = ax.param_from(el)
    mu_el = el.find("mutationRate")
    mu = ax.param_from(mu_el) if mu_el is not None else None
    return ("dollo", death, mu)


@register("alsSiteModel")
def _als_site_model(ax: XmlAnalysis, el):
    """ref: ALSSiteModelParser — passes the dollo model + overall rate."""
    sub = None
    for c in _child_of(el, "substitutionModel"):
        sub = ax.build(ax.deref(c))
    mu_el = el.find("mutationRate")
    mu = ax.param_from(mu_el) if mu_el is not None else None
    if not (isinstance(sub, tuple) and sub[0] == "dollo"):
        raise XmlError("alsSiteModel needs mutationDeathModel")
    return ("dollo_site", sub[1], sub[2], mu)


@register("scaledTreeLengthModel")
def _scaled_tree_length_model(ax: XmlAnalysis, el):
    """ref: ScaledTreeLengthRateModelParser — branch rates such that the
    total scaled tree length equals the scalingFactor parameter."""
    from beast_mcmc_tpu.config.interpreter import ClockModel

    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)
    fac = ax.param_from(_child_of(el, "scalingFactor"))

    def rates(params, tree):
        bl = jnp.where(
            tree.parent >= 0,
            tree.heights[jnp.maximum(tree.parent, 0)] - tree.heights, 0.0)
        total = jnp.sum(bl)
        return jnp.ravel(params[fac])[0] / total

    return ClockModel("scaled_length", tm.tree_id if tm else None, rates,
                      rate_param=fac)


@register("alsTreeLikelihood")
def _als_tree_likelihood(ax: XmlAnalysis, el):
    """ref: ALSTreeLikelihoodParser (acquisition-loss-switch stochastic
    Dollo). The presence/absence MARGINAL of an MSSD process is exactly a
    binary stochastic Dollo process (alive-state switching preserves
    presence), so the likelihood is models/dollo.stochastic_dollo_loglik
    over the presence projection of the patterns — exact for binary
    Dollo data; for multi-state data the alive-state identities are
    marginalized (the death/gain dynamics, which the samplers target,
    are fully scored)."""
    from beast_mcmc_tpu.config.interpreter import ClockModel, TreeModel
    from beast_mcmc_tpu.models.dollo import stochastic_dollo_loglik

    patterns = tm = None
    site = None
    clock = None
    obs_type = "anyTip"
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("patterns", "mergePatterns", "ascertainedPatterns"):
            patterns = ax.build(cc)
        elif cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
        elif cc.tag == "alsSiteModel":
            site = ax.build(cc)
        elif cc.tag == "siteModel":
            # plain siteModel wrapping a mutationDeathModel: read the
            # dollo pieces directly (the generic siteModel builder only
            # handles CTMC substitution models)
            sub_el = cc.find("substitutionModel")
            inner = ax.deref(next(iter(sub_el)))
            if inner.tag != "mutationDeathModel":
                raise Unsupported("alsTreeLikelihood site model form")
            dollo = ax.build(inner)
            mu_el = cc.find("mutationRate")
            site = ("dollo_site", dollo[1], dollo[2],
                    ax.param_from(mu_el) if mu_el is not None else None)
        elif cc.tag == "scaledTreeLengthModel":
            clock = ax.build(cc)
        elif cc.tag == "observationProcess":
            obs_type = cc.get("type", "anyTip")
    if patterns is None or tm is None or site is None:
        raise XmlError("alsTreeLikelihood needs patterns+tree+siteModel")
    if isinstance(site, tuple) and site[0] == "dollo_site":
        _, death, mu_inner, mu_outer = site
        mu = mu_outer or mu_inner
    else:
        raise Unsupported("alsTreeLikelihood site model form")

    # presence projection: code 0 = absent; anything else (incl. the
    # ambiguity codes) = present-or-unknown -> treat unknown as absent=0
    idx = [patterns.taxa.index(t) for t in tm.taxa]
    states = np.asarray(patterns.states)[idx]
    presence = (states != 0).astype(np.int8)
    pres_j = jnp.asarray(presence)
    w_j = jnp.asarray(patterns.weights)

    def fn(params, tree):
        br = (clock.rates(params, tree) if clock is not None
              else jnp.asarray(1.0, tree.heights.dtype))
        mu_v = jnp.ravel(params[mu])[0] if mu else 1.0
        return stochastic_dollo_loglik(
            pres_j, tree.parent, tree.children, tree.heights,
            jnp.ravel(params[death])[0] * mu_v,
            branch_rates=br * mu_v,
            pattern_weights=w_j,
            condition_on_observed=True,
        )

    return LikelihoodFn(fn, tm.tree_id, el.get("id") or "alsLikelihood")


@register("exponentialBranchLengthsPrior")
def _exp_branch_lengths_prior(ax: XmlAnalysis, el):
    """ref: ExponentialBranchLengthsPrior — iid Exp(1) on branch
    lengths (in units of the tree's own scale)."""
    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)

    def fn(params, tree):
        bl = jnp.where(
            tree.parent >= 0,
            tree.heights[jnp.maximum(tree.parent, 0)] - tree.heights, 0.0)
        return -jnp.sum(bl)

    return LikelihoodFn(fn, tm.tree_id if tm else None,
                        el.get("id") or "branchLengthsPrior")


# ---------------------------------------------------------------------------
# episodic serially-sampled birth-death (grid form)
# ---------------------------------------------------------------------------


@register("newBirthDeathSerialSampling")
def _new_bdss(ax: XmlAnalysis, el):
    """ref: NewBirthDeathSerialSamplingModelParser — episodic BDSS with
    per-grid-interval rate vectors over [0, cutOff] split into
    numGridPoints intervals; maps onto
    models/speciation.episodic_serial_birth_death_loglik."""
    names = {}
    names["birth"] = ax.param_from(_child_of(el, "birthRate"))
    names["death"] = ax.param_from(_child_of(el, "deathRate"))
    names["psi"] = ax.param_from(_child_of(el, "samplingRate"))
    names["origin"] = ax.param_from(_child_of(el, "origin"))
    tp = el.find("treatmentProbability")
    if tp is not None:
        names["r"] = ax.param_from(tp)
    sp = el.find("samplingProbability")
    if sp is not None:
        # first entry = sampling probability at present (rho)
        inner = ax.deref(next(iter(sp)))
        if inner.tag == "compoundParameter":
            first = ax.deref(next(iter(inner)))
            names["rho"] = ax.param_from(first)
        else:
            names["rho"] = ax.param_from(sp)
    cut = el.find("cutOff")
    ngp = el.find("numGridPoints")
    if cut is None or ngp is None:
        # constant-rate BDSS (ref: NewBirthDeathSerialSamplingModel with
        # no grid) == episodic model with a single interval spanning
        # [0, origin] (grid_end resolved dynamically from origin)
        names["cutoff"] = None
        names["k"] = 1
    else:
        names["cutoff"] = float(np.ravel(ax.value_of(ax.param_from(cut)))[0])
        names["k"] = int(
            float(np.ravel(ax.value_of(ax.param_from(ngp)))[0]))
    return ("spec", "bdss_grid", names)


# ---------------------------------------------------------------------------
# grid-based branch rates
# ---------------------------------------------------------------------------


@register("gridBasedBranchRateModel")
def _grid_branch_rates(ax: XmlAnalysis, el):
    """ref: GridBasedBranchRateModel.java — the branch 'rate' is the
    time-integral of a piecewise-constant rate function over the branch:
    rate_n = sum_k overlap(branch_n, cell_k) * levelRate_k."""
    from beast_mcmc_tpu.config.interpreter import ClockModel

    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)
    rates_n = ax.param_from(_child_of(el, "levelSpecificRates"))
    grid_n = ax.param_from(_child_of(el, "gridPoints"))
    if tm is None:
        raise XmlError("gridBasedBranchRateModel without treeModel")
    cuts = np.ravel(ax.value_of(grid_n))
    k = len(cuts) + 1

    def intersections(tree, dt):
        lo = jnp.concatenate([
            jnp.asarray([-jnp.inf], dt), jnp.asarray(cuts, dt)])
        hi = jnp.concatenate([
            jnp.asarray(cuts, dt), jnp.asarray([jnp.inf], dt)])
        pidx = jnp.maximum(tree.parent, 0)
        child = tree.heights
        par = jnp.where(tree.parent >= 0, tree.heights[pidx], tree.heights)
        return jnp.clip(
            jnp.minimum(par[:, None], hi[None, :])
            - jnp.maximum(child[:, None], lo[None, :]), 0.0)  # [M, K]

    def rates(params, tree):
        ov = intersections(tree, tree.heights.dtype)
        r = jnp.ravel(params[rates_n]).astype(tree.heights.dtype)
        vals = ov @ r
        return jnp.where(tree.parent >= 0, vals, 0.0)

    class GridClock(ClockModel):
        def report(self, ax2):
            from beast_mcmc_tpu.config.xml_assert import (
                _vec,
                initial_eval_state,
            )

            params0, tree0 = initial_eval_state(ax2)
            tr = ax2.resolve_tree(tm.tree_id, params0, tree0)
            ov = np.array(intersections(tr, tr.heights.dtype))
            root = int(np.asarray(tr.root))
            ov[root] = 0.0
            r = np.asarray(rates(params0, tr))
            # reference node numbering: tips as-is, internals in DFS
            # POSTORDER (NewickParser numbering); permute rows to match
            par = np.asarray(tr.parent)
            ch = np.asarray(tr.children)
            n = (par.shape[0] + 1) // 2
            post = []

            def dfs(i):
                if i >= n:
                    dfs(ch[i, 0])
                    dfs(ch[i, 1])
                    post.append(i)

            dfs(root)
            perm = list(range(n)) + post
            return (f"Branches intersections matrix: {_vec(ov[perm])}\n"
                    f"Branch rates: {_vec(r[perm])}\n")

    return GridClock("grid", tm.tree_id, rates, rate_param=rates_n)


# ---------------------------------------------------------------------------
# priors / parameter views
# ---------------------------------------------------------------------------


@register("cachedPrior")
def _cached_prior(ax: XmlAnalysis, el):
    """ref: CachedDistributionLikelihoodParser — caching is an execution
    detail (XLA re-evaluates the fused density); delegates to the inner
    prior."""
    for c in el:
        obj = ax.build(c)
        if isinstance(obj, LikelihoodFn):
            return obj
    raise XmlError("<cachedPrior> without an inner prior")


@register("binomialLikelihood")
def _binomial_likelihood(ax: XmlAnalysis, el):
    """ref: BinomialLikelihood.java — sum of count-wise Binomial(trials,
    proportion) log-masses over the counts parameter (the BSSVS
    inclusion-probability prior)."""
    prop = ax.param_from(_child_of(el, "proportion"))
    trials = ax.param_from(_child_of(el, "trials"))
    counts = ax.param_from(_child_of(el, "counts"))

    def fn(params, tree):
        p = jnp.clip(jnp.ravel(params[prop])[0], 1e-12, 1.0 - 1e-12)
        n = jnp.ravel(params[trials])
        k = jnp.ravel(params[counts]).astype(p.dtype)
        n = jnp.broadcast_to(n, k.shape).astype(p.dtype)
        from jax.scipy.special import gammaln

        return jnp.sum(
            gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)
            + k * jnp.log(p) + (n - k) * jnp.log1p(-p))

    return LikelihoodFn(fn, None, el.get("id") or "binomial")


@register("dummyModel")
def _dummy_model(ax: XmlAnalysis, el):
    """ref: DummyModelParser — holds parameters so they stay connected;
    contributes nothing to the posterior."""
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            ax.build(cc)
    return LikelihoodFn(lambda params, tree: jnp.asarray(0.0), None,
                        el.get("id") or "dummyModel")


@register("halfTPrior")
def _half_t_prior(ax: XmlAnalysis, el):
    """ref: PriorParsers HALF_T_PRIOR — half-Student-t on [0, inf)
    with given scale and df (ref: HalfTDistribution.java)."""
    from beast_mcmc_tpu.config.interpreter import _targets_of

    scale = _attr(el, "scale", 1.0, float)
    df = _attr(el, "df", 1.0, float)

    readers = _targets_of(ax, el)

    def fn(params, tree):
        import jax.scipy.stats as jst

        tot = 0.0
        for rd in readers:
            x = jnp.ravel(rd(params, tree))
            lp = (jst.t.logpdf(x / scale, df) - jnp.log(scale)
                  + jnp.log(2.0))
            tot = tot + jnp.sum(jnp.where(x >= 0, lp, -jnp.inf))
        return tot

    return LikelihoodFn(fn, None, el.get("id") or "halfT")


@register("halfNormalPrior")
def _half_normal_prior(ax: XmlAnalysis, el):
    """ref: PriorParsers HALF_NORMAL_PRIOR — N(mean, sd) truncated to
    [mean, inf) (reference requires mean at the truncation bound)."""
    from beast_mcmc_tpu.config.interpreter import _targets_of

    mean = _attr(el, "mean", 0.0, float)
    sd = _attr(el, "stdev", 1.0, float)
    readers = _targets_of(ax, el)

    def fn(params, tree):
        tot = 0.0
        for rd in readers:
            x = jnp.ravel(rd(params, tree))
            z = (x - mean) / sd
            lp = (-0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi) - jnp.log(sd)
                  + jnp.log(2.0))
            tot = tot + jnp.sum(jnp.where(x >= mean, lp, -jnp.inf))
        return tot

    return LikelihoodFn(fn, None, el.get("id") or "halfNormal")


def _inner_value_fn(ax: XmlAnalysis, el):
    """(fn(params)->array, base_param_name) for a parameter-ish child:
    plain <parameter> reads it; a masked/derived view reads through its
    view function."""
    from beast_mcmc_tpu.config.interpreter import DerivedParam

    cc = ax.deref(el)
    obj = ax.build(cc) if cc.tag in _BUILDERS_VIEW else None
    if isinstance(obj, DerivedParam):
        return obj.fn, (obj.base or obj.name)
    name = ax.param_from(cc)
    return (lambda p, n=name: p[n]), name


_BUILDERS_VIEW = ("maskedParameter", "transformedParameter",
                  "transformedMultivariateParameter", "productParameter",
                  "multiplicativeParameter")


@register("transformedParameter", "transformedMultivariateParameter")
def _transformed_parameter(ax: XmlAnalysis, el):
    """ref: TransformedParameterParser — value = transform(inner), or
    transform.inverse(inner) when inverse="true"
    (TransformedParameter.java:72-84). Registered as a DerivedParam
    injected into the params dict before every density evaluation."""
    from beast_mcmc_tpu.config.interpreter import DerivedParam
    from beast_mcmc_tpu.config.xml_hmc import transform_of_el

    inverse = (el.get("inverse") or "false").lower() == "true"
    base_fn, base_name = None, None
    tr = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("transform", "LKJTransform", "inverseTransform"):
            tr = transform_of_el(ax, cc)
        elif cc.tag == "matrixInnerProductTransform":
            # corr = M Mᵀ of the inner matrix parameter (ref:
            # MatrixInnerProductTransform — Cholesky-factor to
            # correlation/covariance); value is the flattened matrix
            from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

            mp_in = matrix_param_of(ax, ax.deref(next(iter(cc))))

            def fn_ip(params, _mp=mp_in):
                # ref wraps the col-major flat values ROW-major, so its
                # XXᵀ is MᵀM in true (column-child) orientation
                m_ = _mp.fn(params)
                return jnp.ravel(m_.T @ m_)

            name = el.get("id") or f"innerProduct.{mp_in.name}"
            ax._derived_params[name] = fn_ip
            from beast_mcmc_tpu.config.xml_stats import _current_state

            p0_, _ = _current_state(ax)
            dp = DerivedParam(name, fn_ip,
                              value=np.asarray(fn_ip(p0_), float))
            ax._built[id(el)] = dp
            return dp
        elif cc.tag == "powerTransform":
            # <powerTransform power="-0.5"> wrapper (ref:
            # TransformParsers.PowerTransformParser)
            from beast_mcmc_tpu.utils import transforms as TR

            tr = TR.parse_transform(
                "power", power=float(cc.get("power", 2.0)))
        elif base_fn is None:
            try:
                base_fn, base_name = _inner_value_fn(ax, cc)
            except (XmlError, Unsupported):
                continue
    if base_fn is None:
        raise XmlError(f"<{el.tag}> without inner parameter")
    if tr is None:
        tr = None  # identity view

    def fn(params):
        x = base_fn(params)
        if tr is None:
            return x
        return tr.inverse(x) if inverse else tr.forward(x)

    name = el.get("id") or f"transformed.{base_name}"
    dp = DerivedParam(name, fn)
    ax._derived_params[name] = fn
    # remember the base so operators targeting this element can walk the
    # underlying sampled parameter in transformed space
    ax._transformed_bases = getattr(ax, "_transformed_bases", {})
    ax._transformed_bases[name] = (base_name, tr, inverse)
    return dp


@register("maskedParameter")
def _masked_parameter(ax: XmlAnalysis, el):
    """ref: MaskedParameterParser — a parameter with a 0/1 mask applied.
    The full parameter stays the sampled object; with an explicit <mask>
    the element is a DerivedParam VIEW of the mask==1 entries (what
    priors/means/gradients score); without one it degrades to the
    underlying Param (operators always act on the base vector)."""
    from beast_mcmc_tpu.config.interpreter import DerivedParam, _text_values

    # the inner parameter is the direct child (the mask's parameter is
    # nested under <mask>); resolving via the child avoids re-entering
    # this builder through param_from(el)
    inner_el = el.find("parameter")
    if inner_el is None:
        inner_el = next(c for c in el if ax.deref(c).tag != "mask")
    inner = ax.param_from(inner_el)
    mask_el = el.find("mask")
    if mask_el is None and _attr(el, "build", False, bool):
        # build="true" isNaMissing="true": mask = NaN positions; the
        # NaNs are REPLACED by the fill value (default 0, `value` attr
        # cycled) so the chain starts finite
        # (ref: MaskedParameterParser.java:60-86)
        base = ax._params[inner]
        vals = np.ravel(np.asarray(base.value, float)).copy()
        if _attr(el, "isNaMissing", False, bool):
            na = np.isnan(vals)
        else:
            na = vals == 0.0
        fill_attr = el.get("value")
        fill = (np.array([float(x) for x in fill_attr.split()])
                if fill_attr else np.array([0.0]))
        n_na = int(na.sum())
        vals[na] = np.resize(fill, n_na)
        base.value = vals.reshape(np.shape(base.value))
        mvals = na.astype(float)
        mid = el.get("id") or f"masked{len(ax._derived_params)}.{inner}"
        sel = mvals > 0.5
        idx = np.nonzero(sel)[0]
        jidx = jnp.asarray(idx)
        fn = lambda p, n=inner, ix=jidx: jnp.ravel(p[n])[ix]
        ax._derived_params[mid] = fn
        return DerivedParam(mid, fn, value=vals[idx], base=inner, idx=idx)
    if mask_el is None:
        return ax._params[inner]
    mid = el.get("id") or f"masked{len(ax._derived_params)}.{inner}"
    complement = _attr(el, "complement", False, bool)
    mvals = np.ravel(_text_values(ax.deref(_child_of(mask_el, "parameter"))))
    sel = (mvals <= 0.5) if complement else (mvals > 0.5)
    idx = np.nonzero(sel)[0]
    if idx.size == mvals.size:
        return ax._params[inner]

    if inner in ax._params:
        inner_val = np.ravel(ax.value_of(inner))
    else:
        # masked view over a DERIVED parameter (e.g. a matrix
        # inner-product transform): evaluate at the initial state
        from beast_mcmc_tpu.config.xml_stats import _current_state

        p0_, _ = _current_state(ax)
        inner_val = np.ravel(np.asarray(p0_[inner], float))
    if idx.size == 1:
        i0 = int(idx[0])
        fn = lambda p, n=inner, i=i0: jnp.ravel(p[n])[i]
        init = inner_val[i0]
    else:
        jidx = jnp.asarray(idx)
        fn = lambda p, n=inner, ix=jidx: jnp.ravel(p[n])[ix]
        init = inner_val[idx]
    ax._derived_params[mid] = fn
    return DerivedParam(mid, fn, value=init, base=inner, idx=idx)


# ---------------------------------------------------------------------------
# empirical distribution likelihood
# ---------------------------------------------------------------------------


@register("empiricalDistributionLikelihood")
def _empirical_distribution(ax: XmlAnalysis, el):
    """ref: EmpiricalDistributionLikelihoodParser — density interpolated
    from a file of (x, logp) pairs; applied to the data parameters."""
    from beast_mcmc_tpu.config.interpreter import _text_values

    grid_el = el.find("grid")
    if grid_el is not None:
        # in-document grid form (ref: EmpiricalDistributionLikelihood
        # grid parser): <logLikelihood> values over <value> x-points
        ll_el = grid_el.find("logLikelihood")
        v_el = grid_el.find("value")
        if ll_el is None or v_el is None:
            raise XmlError("empirical grid needs logLikelihood + value")
        lps = _text_values(ax.deref(_child_of(ll_el, "parameter")))
        xs = _text_values(ax.deref(_child_of(v_el, "parameter")))
        order = np.argsort(xs)
        grid_x = jnp.asarray(xs[order])
        grid_lp = jnp.asarray(lps[order])
    else:
        fname = el.get("fileName")
        import os

        path = fname
        if path and not os.path.isabs(path):
            for base in (ax.workdir, os.path.dirname(ax.path)):
                cand = os.path.join(base, fname)
                if os.path.exists(cand):
                    path = cand
                    break
        if not path or not os.path.exists(path):
            raise Unsupported(
                f"empiricalDistributionLikelihood file {fname!r} not found")
        xs, lps = [], []
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) >= 2:
                    try:
                        xs.append(float(parts[0]))
                        lps.append(float(parts[1]))
                    except ValueError:
                        continue
        grid_x = jnp.asarray(xs)
        grid_lp = jnp.asarray(lps)
    data_el = el.find("data")
    pname = ax.param_from(data_el if data_el is not None else el)
    inverse = _attr(el, "inverse", False, bool)

    def fn(params, tree):
        x = jnp.ravel(params[pname])
        lp = jnp.interp(x, grid_x, grid_lp)
        return jnp.sum(-lp if inverse else lp)

    return LikelihoodFn(fn, None, el.get("id") or "empirical", (pname,))


# ---------------------------------------------------------------------------
# transformed-parameter random walk
# ---------------------------------------------------------------------------


def _transformed_rw_operator(ax: XmlAnalysis, el, weight):
    """ref: TransformedParameterRandomWalkOperatorParser — walk on the
    transformed VALUE space; the sampled base parameter updates through
    the inverse map with the Jacobian in the Hastings ratio."""
    from beast_mcmc_tpu.inference.operators import (
        TransformedRandomWalkOperator,
    )
    from beast_mcmc_tpu.utils import transforms as TR

    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("transformedParameter",
                      "transformedMultivariateParameter"):
            dp = ax.build(cc)
            base, tr, inverse = ax._transformed_bases[dp.name]
            if tr is None:
                tr = TR.NoTransform()
            if inverse:
                # walking on transform.inverse(x): equivalent transform
                # with forward/inverse swapped
                fwd, inv = tr, None

                class _Swapped(TR.Transform):
                    def forward(self, x, _t=tr):
                        return _t.inverse(x)

                    def inverse(self, y, _t=tr):
                        return _t.forward(y)

                tr = _Swapped()
            return TransformedRandomWalkOperator(
                parameter=base, transform=tr,
                window=_attr(el, "windowSize", 1.0, float),
                weight=weight,
            ), None
    raise XmlError("transformedParameterRandomWalkOperator without "
                   "transformed parameter child")


from beast_mcmc_tpu.config.interpreter import register_operator  # noqa: E402

register_operator("transformedParameterRandomWalkOperator")(
    _transformed_rw_operator)


def _ess_operator(ax: XmlAnalysis, el, weight):
    """ref: EllipticalSliceOperatorParser — rejection-free slice moves on
    the ellipse of a multivariateNormalPrior-distributed parameter."""
    from beast_mcmc_tpu.config.interpreter import _text_values
    from beast_mcmc_tpu.inference.gibbs import EllipticalSliceOperator

    pname, mean, prec = None, None, None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter" and pname is None:
            pname = ax.param_from(cc)
        elif cc.tag == "multivariateNormalPrior":
            mean = _text_values(ax.deref(_child_of(
                _child_of(cc, "meanParameter"), "parameter")))
            prec_el = cc.find("precisionMatrix")
            if prec_el is None:
                prec_el = cc.find("precisionParameter")
            for pc in prec_el:
                pcc = ax.deref(pc)
                if pcc.tag == "matrixParameter":
                    prec = np.asarray(ax.build(pcc)).T
    if pname is None or mean is None:
        raise XmlError("ellipticalSliceSampler needs parameter + "
                       "multivariateNormalPrior")
    if prec is None:
        prec = np.eye(mean.size)
    cov = np.linalg.inv(prec)
    chol = np.linalg.cholesky(cov)
    prec_c = prec

    def prior_logpdf(v, mu):
        d = v - mu
        return -0.5 * d @ jnp.asarray(prec_c, v.dtype) @ d

    return EllipticalSliceOperator(
        parameter=pname, prior_mean=mean, prior_chol=chol,
        prior_logpdf=prior_logpdf, weight=weight,
    ), None


from beast_mcmc_tpu.config.interpreter import register_operator as _regop  # noqa: E402,F811

_regop("ellipticalSliceSampler")(_ess_operator)


def _mvn_operator(ax: XmlAnalysis, el, weight):
    """ref: MVNOperatorParser (RandomWalkIntegerOperator sibling) — MVN
    random-walk x' = x + sf * L z with proposal covariance either an
    explicit <varMatrix> or (X^T X)^{-1} of a design matrix
    (formXtXInverse="true"); symmetric, Hastings 0."""
    from beast_mcmc_tpu.inference.operators import MvnRandomWalkOperator

    sf = _attr(el, "scaleFactor", 1.0, float)
    form_xtx = _attr(el, "formXtXInverse", False, bool)
    pname = None
    var = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter" and pname is None:
            pname = ax.param_from(cc)
        elif cc.tag == "varMatrix":
            vname = ax.param_from(cc)
            var = np.asarray(ax.value_of(vname), float)
    if pname is None or var is None:
        raise XmlError("mvnOperator needs parameter + varMatrix")
    d = int(np.ravel(ax.value_of(pname)).size)
    if form_xtx:
        x = var.reshape(-1, d)
        cov = np.linalg.inv(x.T @ x)
    else:
        cov = var.reshape(d, d)
    chol = np.linalg.cholesky(cov)
    return MvnRandomWalkOperator(
        parameter=pname, chol=chol, scale_factor=sf, weight=weight,
    ), None


_regop("mvnOperator")(_mvn_operator)


@register("designMatrix")
def _design_matrix(ax: XmlAnalysis, el):
    """ref: DesignMatrixParser — a matrix whose columns are the child
    parameters. Resolves to the single underlying Param when there is
    one child (the common GLM idref form), else a materialized constant
    of the concatenated columns."""
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            names.append(ax.param_from(cc))
    if len(names) == 1:
        return ax._params[names[0]]
    vals = np.concatenate([np.ravel(ax.value_of(n)) for n in names])
    key = el.get("id") or f"design{len(ax._params)}"
    if key not in ax._params:
        ax._params[key] = Param(key, vals)
    return ax._params[key]


@register("productStatistic")
def _product_statistic(ax: XmlAnalysis, el):
    """ref: ProductStatistic — elementwise product across the child
    parameters (dimension-matched), or the product of all elements when
    elementwise="false"."""
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            names.append(ax.param_from(cc))
    if not names:
        raise XmlError("productStatistic without parameters")
    elementwise = _attr(el, "elementwise", True, bool)
    dims = [int(np.ravel(ax.value_of(n)).size) for n in names]
    same = len(set(dims)) == 1

    class _Prod:
        columns = None

        def __init__(self):
            if elementwise and same and dims[0] > 1:
                nm = el.get("id") or "product"
                self.columns = [
                    (f"{nm}{i + 1}", self._col(i)) for i in range(dims[0])
                ]

        @staticmethod
        def _col(i):
            def f(s):
                out = jnp.ones(())
                for n in names:
                    out = out * jnp.ravel(s.params[n])[i]
                return out

            return f

        def __call__(self, s):
            prod = None
            for n in names:
                v = jnp.ravel(s.params[n])
                prod = v if prod is None else prod * v
            if elementwise and same:
                return prod
            return jnp.prod(prod)

    return _Prod()


# ---------------------------------------------------------------------------
# transmission history compatibility statistic
# ---------------------------------------------------------------------------


@register("transmissionHistory")
def _transmission_history(ax: XmlAnalysis, el):
    """ref: TransmissionHistoryModel — ordered host registry (donor then
    recipient per event, first-appearance order,
    TransmissionHistoryModel.java:89-106) + per-recipient infection-time
    parameters."""
    hosts: List[str] = []
    events = []  # (donor_id, recipient_id, time_param_name)
    for tr in el.findall("transmission"):
        tname = ax.param_from(_child_of(tr, "parameter"))
        donor = ax.deref(_child_of(tr, "donor").find("taxon")).get("id") \
            or _child_of(tr, "donor").find("taxon").get("idref")
        recip = ax.deref(_child_of(tr, "recipient").find("taxon")).get(
            "id") or _child_of(tr, "recipient").find("taxon").get("idref")
        for h in (donor, recip):
            if h not in hosts:
                hosts.append(h)
        events.append((donor, recip, tname))
    return ("transmission_history", tuple(hosts), tuple(events))


@register("transmissionStatistic")
def _transmission_statistic(ax: XmlAnalysis, el):
    """ref: TransmissionStatistic.java:120-180 — per-host boolean: is the
    virus tree compatible with the transmission history? Post-order pass
    resolving each node's host by walking the donor chain until the
    infection time covers the node height; sibling-host conflicts mark
    the younger-infection host incompatible."""
    hist = None
    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "transmissionHistory":
            hist = ax.build(cc)
        elif cc.tag == "parasiteTree":
            tm = ax.build(ax.deref(next(iter(cc))))
        elif cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
    if hist is None or tm is None:
        raise XmlError("transmissionStatistic needs history + parasiteTree")
    _, hosts, events = hist
    h_index = {h: i for i, h in enumerate(hosts)}
    n_hosts = len(hosts)
    donor = np.full(n_hosts, -1, np.int32)
    time_names = [None] * n_hosts
    for d, r, tname in events:
        donor[h_index[r]] = h_index[d]
        time_names[h_index[r]] = tname
    # tip -> host index via the taxon "host" attribute
    tip_host = np.full(len(tm.taxa), -1, np.int32)
    for i, tx in enumerate(tm.taxa):
        attrs = ax._taxon_attrs.get(tx, {})
        hv = attrs.get("host")
        if hv:
            tip_host[i] = h_index.get(hv[0], -1)
    donor_j = jnp.asarray(donor)
    tip_host_j = jnp.asarray(tip_host)
    n_tips = len(tm.taxa)

    from beast_mcmc_tpu.ops.peeling import peel_order_from_heights

    def incompatible_mask(s):
        t = ax.resolve_tree(tm.tree_id, s.params, s.tree)
        dt = t.heights.dtype
        times = jnp.stack([
            jnp.asarray(jnp.inf, dt) if nm is None
            else jnp.reshape(
                s.params[nm] if nm in s.params
                else jnp.asarray(ax.value_of(nm)), ()).astype(dt)
            for nm in time_names
        ])

        def walk_up(h, height):
            # donor-chain walk, bounded by n_hosts (ref while loop)
            def body(_, hh):
                return jnp.where(height > times[hh],
                                 donor_j[hh].astype(hh.dtype), hh)

            return jax.lax.fori_loop(0, n_hosts, body, h)

        order = peel_order_from_heights(t.heights, n_tips)
        m = t.parent.shape[0]
        host_arr = jnp.concatenate([
            tip_host_j, jnp.full((m - n_tips,), -1, jnp.int32)])
        bad0 = jnp.zeros((n_hosts,), bool)

        def step(carry, node):
            host_arr, bad = carry
            height = t.heights[node]
            h1 = walk_up(host_arr[t.children[node, 0]], height)
            h2 = walk_up(host_arr[t.children[node, 1]], height)
            differ = h1 != h2
            t1 = times[jnp.maximum(h1, 0)]
            t2 = times[jnp.maximum(h2, 0)]
            mark1 = differ & (t1 < t2)
            mark2 = differ & ~mark1
            bad = bad.at[jnp.maximum(h1, 0)].set(
                bad[jnp.maximum(h1, 0)] | mark1)
            bad = bad.at[jnp.maximum(h2, 0)].set(
                bad[jnp.maximum(h2, 0)] | mark2)
            keep = jnp.where(differ, jnp.where(mark1, h2, h1), h1)
            host_arr = host_arr.at[node].set(keep.astype(jnp.int32))
            return (host_arr, bad), None

        (host_arr, bad), _ = jax.lax.scan(step, (host_arr, bad0), order)
        return bad

    class _Stat:
        columns = [
            (f"transmission("
             f"{hosts[donor[i]] + '->' if donor[i] >= 0 else ''}{hosts[i]})",
             (lambda s, i=i: jnp.where(incompatible_mask(s)[i], 0.0, 1.0)))
            for i in range(n_hosts)
        ]

        def __call__(self, s):
            return 1.0 - incompatible_mask(s).astype(jnp.float32)

    return _Stat()


@register("traitValidation")
def _trait_validation(ax: XmlAnalysis, el):
    """ref: TraitValidationProvider + CrossValidationProvider
    (SQUARED_ERROR) — per-missing-entry squared error between the
    inferred tip trait values and the supplied true values, plus the
    sum column. The corpus file has no expectations on these columns;
    the inferred value here is the trait parameter's current (sampled /
    imputed) entry."""
    tl = None
    true_name = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "traitDataLikelihood":
            ax.build(cc)
            tl = getattr(ax, "_trait_likelihoods", {}).get(cc.get("id"))
        elif cc.tag == "traitParameter":
            true_name = ax.param_from(cc)
    if tl is None or true_name is None:
        raise XmlError("traitValidation needs traitDataLikelihood + "
                       "traitParameter")
    miss = np.ravel(np.asarray(tl.missing, bool))
    idx = np.nonzero(miss)[0]
    nm = el.get("id") or "validation"
    jidx = jnp.asarray(idx) if idx.size else None
    tparam = tl.trait_param

    def sq_err(s):
        inferred = jnp.ravel(s.params[tparam])[jidx]
        truth = jnp.ravel(
            jnp.asarray(ax.value_of(true_name))).astype(inferred.dtype)[jidx]
        return (inferred - truth) ** 2

    class _Val:
        columns = ([
            (f"{nm}.squaredError{i + 1}",
             lambda s, i=i: sq_err(s)[i]) for i in range(idx.size)
        ] + [(f"{nm}.squaredError.sum", lambda s: jnp.sum(sq_err(s)))]
            if idx.size else
            [(f"{nm}.squaredError.sum",
              lambda s: jnp.zeros((), s.tree.heights.dtype))])

        def __call__(self, s):
            return jnp.sum(sq_err(s)) if idx.size else 0.0

    return _Val()


@register("gaussianProcessFromTree")
def _gaussian_process_from_tree(ax: XmlAnalysis, el):
    """ref: GaussianProcessFromTree — a random generator over the
    tree-trait prior. Not Loggable in the reference (LoggerParser falls
    back to a constant toString column, LoggerParser.java:132-135);
    builds the inner likelihood for vocabulary enforcement and
    contributes no density and no log columns."""
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "traitDataLikelihood":
            ax.build(cc)

    class _Gp:
        columns = []

        def __call__(self, s):
            return jnp.zeros(())

    return _Gp()


# ---------------------------------------------------------------------------
# multivariate OU time-series model
# ---------------------------------------------------------------------------


@register("positiveDefiniteSubstitutionModel")
def _pd_substitution_model(ax: XmlAnalysis, el):
    """ref: PositiveDefiniteSubstitutionModel — 'transition probs' are
    expm(distance * Q) of a symmetric PD matrix parameter (symmetric
    eigen, getRawTransitionProbabilities:229-250)."""
    from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

    inner = ax.deref(next(iter(el)))
    mp = matrix_param_of(ax, inner)
    return ("pd_subst", mp)


@register("multivariateOUModel")
def _multivariate_ou_model(ax: XmlAnalysis, el):
    """ref: inferencexml/distribution/MultivariateOUModel.java:192-330 —
    Gaussian chain over time points: theta_0 ~ N(0, G);
    theta_t ~ N(W theta_{t-1}, G - W G W^T) with W = expm(-dt Q),
    all minus X beta fixed effects; det(G) < 0.01 -> -inf."""
    from beast_mcmc_tpu.config.interpreter import _text_values
    from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

    qmp = None
    data_name = None
    times = None
    design = None
    gamma_mp = None
    beta_name = None
    x_cols = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "substitutionModel":
            obj = ax.build(ax.deref(cc))
            qmp = obj[1] if isinstance(obj, tuple) else None
        elif cc.tag == "positiveDefiniteSubstitutionModel":
            qmp = ax.build(cc)[1]
        elif cc.tag == "data":
            data_name = ax.param_from(cc)
        elif cc.tag == "times":
            times = np.ravel(_text_values(ax.deref(_child_of(
                cc, "parameter"))))
        elif cc.tag == "design":
            design = np.ravel(_text_values(ax.deref(_child_of(
                cc, "parameter"))))
        elif cc.tag in ("diagonalMatrix", "matrixParameter",
                        "compoundSymmetricMatrix"):
            gamma_mp = matrix_param_of(ax, cc)
        elif cc.tag == "independentVariables":
            for p in cc:
                pp = ax.deref(p)
                if pp.tag == "parameter":
                    beta_name = ax.param_from(pp)
                elif pp.tag == "designMatrix":
                    for q in pp:
                        qq = ax.deref(q)
                        if qq.tag == "parameter":
                            x_cols.append(np.ravel(_text_values(qq)))
    if qmp is None or data_name is None or times is None or design is None:
        raise XmlError("multivariateOUModel structure")
    k = int(design.max())
    n_total = times.size
    n_points = n_total // k
    uniq = times.reshape(n_points, k)[:, 0]
    dts = np.diff(uniq)
    x_mat = np.stack(x_cols, axis=1) if x_cols else None

    def fn(params, tree):
        dt_ = jnp.result_type(params[data_name], 1.0)
        theta = jnp.ravel(params[data_name]).astype(dt_)[:n_total]
        if x_mat is not None and beta_name is not None:
            beta = jnp.ravel(params[beta_name]).astype(dt_)
            theta = theta - jnp.asarray(x_mat, dt_)[:n_total] @ beta
        th = theta.reshape(n_points, k)
        g = gamma_mp.fn(params).astype(dt_)
        q = qmp.fn(params).astype(dt_)
        sign_g, logdet_g = jnp.linalg.slogdet(g)
        det_ok = sign_g * jnp.exp(logdet_g) >= 0.01
        # initial point ~ N(0, G)
        two_pi = 2.0 * jnp.asarray(jnp.pi, dt_)
        g_inv = jnp.linalg.inv(g)

        def mvn_lp(x, cov):
            ci = jnp.linalg.inv(cov)
            s, ld = jnp.linalg.slogdet(cov)
            return -0.5 * (k * jnp.log(two_pi) + ld + x @ ci @ x)

        lp = mvn_lp(th[0], g)
        w_eval, w_evec = jnp.linalg.eigh(0.5 * (q + q.T))

        def step(carry, i):
            lp, prev = carry
            dt_i = jnp.asarray(dts, dt_)[i]
            w = (w_evec * jnp.exp(-dt_i * w_eval)) @ w_evec.T
            cond = g - w @ g @ w.T
            cur = th[i + 1]
            lp = lp + mvn_lp(cur - w @ prev, cond)
            return (lp, cur), None

        (lp, _), _ = jax.lax.scan(step, (lp, th[0]),
                                  jnp.arange(n_points - 1))
        return jnp.where(det_ok, lp, -jnp.inf)

    return LikelihoodFn(fn, None, el.get("id") or "mvou",
                        (data_name,))


# ---------------------------------------------------------------------------
# node-height transform + coalescent-interval views (skyride HMC support)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class NodeHeightTransformMarker:
    """<nodeHeightTransform> — the heights<->ratios change of variables
    (tree/transforms.py is the TPU map; the consuming HMC operator uses
    NodeHeightHmcOperator which applies it internally). Logs the live
    ratios of the current tree."""

    tree_id: str = ""
    n_tips: int = 0
    columns: list = None


@register("nodeHeightTransform")
def _node_height_transform(ax: XmlAnalysis, el):
    tid = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("tree", "treeModel"):
            tm = ax.build(cc)
            tid = tm.tree_id
            n = len(tm.taxa)
    if tid is None:
        raise XmlError("nodeHeightTransform without tree")
    mk = NodeHeightTransformMarker(tid, n)
    ratios_el = el.find("ratios")
    if ratios_el is not None:
        p = ax.deref(_child_of(ratios_el, "parameter"))
        rid = p.get("id") or p.get("idref")
        if rid:
            from beast_mcmc_tpu.tree.transforms import heights_to_ratios

            def ratio_cols():
                def col(i):
                    def f(s, i=i):
                        t = ax.resolve_tree(tid, s.params, s.tree)
                        r, _ = heights_to_ratios(
                            t.parent, t.children, t.heights, t.root, n)
                        return jnp.ravel(r)[i]

                    return f

                return [(f"{rid}{i + 1}", col(i)) for i in range(n - 1)]

            mk2 = NodeHeightTransformMarker(tid, n, ratio_cols())
            ax._built[id(p)] = mk2
    return mk


@register("coalescentIntervals")
def _coalescent_intervals_view(ax: XmlAnalysis, el):
    """ref: CoalescentIntervalProvider / GMRFSkyrideLikelihood intervals
    — the sorted coalescent waiting times of the likelihood's tree, as a
    loggable view and a gradient target (d logL/d interval_i is the
    reverse-cumulated height gradient in sorted order)."""
    tid = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("gmrfSkyrideLikelihood", "gmrfSkyGridLikelihood",
                      "skyGridLikelihood"):
            lik = ax.build(cc)
            tid = lik.tree_id
        elif cc.tag in ("treeModel", "starTreeModel"):
            tid = ax.build(cc).tree_id
    if tid is None:
        raise XmlError("coalescentIntervals without tree source")
    tm = ax._trees[tid]
    n = len(tm.taxa)

    class _Intervals:
        tree_id = tid
        n_tips = n

        def sorted_heights(self, s):
            t = ax.resolve_tree(tid, s.params, s.tree)
            return jnp.sort(t.heights[n:])

        columns = [
            (f"{el.get('id') or 'intervals'}{i + 1}",
             (lambda s, i=i: (
                 lambda hs: jnp.where(
                     i == 0, hs[0],
                     hs[jnp.minimum(i, n - 2)]
                     - hs[jnp.minimum(i, n - 2) - 1]))(
                 jnp.sort(ax.resolve_tree(
                     tid, s.params, s.tree).heights[n:]))))
            for i in range(n - 1)
        ]

        def __call__(self, s):
            hs = self.sorted_heights(s)
            return jnp.concatenate([hs[:1], jnp.diff(hs)])

    return _Intervals()


@register("nodePosteriorLikelihood")
def _node_posterior_likelihood(ax: XmlAnalysis, el):
    """ref: oldevomodel NodePosteriorTreeLikelihood — the plain peeled
    tree likelihood plus per-node posterior state traits (a
    TreeTraitProvider). The density is exactly the tree likelihood; the
    posterior annotations are consumed only by avgPosteriorIBDReporter
    inside <logTree> (no oracle; see that builder)."""
    return _tree_likelihood(ax, el)


@register("avgPosteriorIBDReporter")
def _avg_posterior_ibd_reporter(ax: XmlAnalysis, el):
    """ref: oldevomodel/ibd/AvgPosteriorIBDReporter — identity-by-
    descent tree-log annotation. The inner likelihood is built (density
    enforcement); the IBD annotation itself is not reproduced — the
    reference logs it as a per-node comment with no oracle, and the
    corpus file has no expectations on it. Tree logs come out plain."""
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "nodePosteriorLikelihood":
            ax.build(cc)
    return None


# ---------------------------------------------------------------------------
# reward-aware branch model (Sericola series)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RewardBranchModel:
    """<rewardsAwareBranchModel> — per-branch Markov-reward transition
    densities W(node) = pdf of (end state, total branch reward)
    (ref: RewardsAwareBranchModel.java:102-130; engine ops/sericola.py).
    Host-side static: the corpus file evaluates at the initial state."""

    w: np.ndarray = None  # [M, S, S] (root row = I)
    freqs: np.ndarray = None
    k: int = 0

    root_row: int = -1

    def report(self, ax) -> str:
        # ONE header, all branch matrices concatenated (the reference
        # prints the block after a single "W matrix:" line and the
        # corpus regex captures the full run of numbers)
        vals = []
        for b in range(self.w.shape[0]):
            if b == self.root_row:
                continue
            vals.extend(str(v) for v in np.ravel(self.w[b]))
        return "W matrix: " + " ".join(vals) + "\n"


@register("rewardsAwareBranchModel")
def _rewards_aware_branch_model(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.config.interpreter import ClockModel, _text_values
    from beast_mcmc_tpu.ops.sericola import reward_branch_matrices

    clock = None
    reward_rates = None
    subst = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "arbitraryBranchRates":
            clock = ax.build(cc)
        elif cc.tag == "rewardRates":
            reward_rates = np.ravel(_text_values(ax.deref(_child_of(
                cc, "parameter"))))
        elif cc.tag in ("generalSubstitutionModel",
                        "complexSubstitutionModel"):
            subst = ax.build(cc)
    if clock is None or reward_rates is None or subst is None:
        raise XmlError("rewardsAwareBranchModel structure")
    # the underlying CTMC generator at the INITIAL parameter values
    from beast_mcmc_tpu.config.xml_assert import initial_eval_state

    params0, tree0 = initial_eval_state(ax)
    if subst[0] == "subst_q":
        q = np.asarray(subst[1](params0))
    else:
        eig = subst[1](params0)
        q = np.asarray((eig.U * np.asarray(eig.values)[None, :])
                       @ eig.U_inv)
    k = subst[3]
    freqs = np.asarray(subst[2](params0))
    # per-branch total rewards (the arbitraryBranchRates values) and
    # branch lengths of the parse-time tree
    tid = clock.tree_id
    tm = ax._trees[tid]
    m = tm.parent.shape[0]
    import jax.numpy as _jnp

    br = np.asarray(clock.rates(params0, tree0))
    br = np.broadcast_to(br, (m,))
    bl = np.where(tm.parent >= 0,
                  tm.heights[np.maximum(tm.parent, 0)] - tm.heights, 0.0)
    w = np.zeros((m, k, k))
    nz = bl > 0
    w[~nz] = np.eye(k)
    w[nz] = reward_branch_matrices(
        q, reward_rates, br[nz], bl[nz])
    return RewardBranchModel(w=w, freqs=freqs, k=k, root_row=int(tm.root))


def _reward_aware_tree_likelihood(ax: XmlAnalysis, el, model_el):
    """<treeDataLikelihood useRewardAwareBranchModelDelegate="true"> —
    peeling with the reward densities as the per-branch transition
    operands (ref: RewardAwareSubstitutionModelDelegate.java)."""
    from beast_mcmc_tpu.ops.peeling import (
        peel_loglikelihood,
        peel_order_from_heights,
    )

    rm = ax.build(model_el)
    patterns = None
    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("patterns", "attributePatterns"):
            patterns = ax.build(cc)
        elif cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
    if patterns is None or tm is None:
        raise XmlError("reward-aware treeDataLikelihood structure")
    idx = [patterns.taxa.index(t) for t in tm.taxa]
    tab = patterns.datatype.ambiguity_table(np.float64)
    tips = jnp.asarray(np.swapaxes(
        tab[np.asarray(patterns.states)[idx]], 1, 2))  # [N, S, P]
    weights = jnp.asarray(np.asarray(patterns.weights, float))
    w_ops = jnp.asarray(rm.w[:, None])  # [M, C=1, S, S]
    freqs = jnp.asarray(rm.freqs)
    cat_w = jnp.ones((1,))
    tid = tm.tree_id

    def fn(params, tree):
        order = peel_order_from_heights(tree.heights, len(tm.taxa))
        return peel_loglikelihood(
            tips.astype(tree.heights.dtype), tree.children, order,
            tree.root, w_ops.astype(tree.heights.dtype),
            freqs.astype(tree.heights.dtype),
            cat_w.astype(tree.heights.dtype),
            weights.astype(tree.heights.dtype))

    return LikelihoodFn(fn, tid, el.get("id") or "rewardTreeLikelihood")


@register("transformedVectorSumTransform")
def _transformed_vector_sum(ax: XmlAnalysis, el):
    """ref: TransformedVectorSumParameter (hmc increment coordinates) —
    x_k = g(sum_{i<=k} y_i) over the increment vector y; g = exp for
    incrementTransformType="log", scaled logistic for "logit"."""
    from beast_mcmc_tpu.config.interpreter import DerivedParam

    kind = el.get("incrementTransformType", "log")
    lo = float(el.get("lower", "0.0"))
    hi = float(el.get("upper", "1.0"))
    comp = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("compoundParameter", "parameter"):
            comp = ax.build(cc)
    from beast_mcmc_tpu.config.interpreter import CompoundParam, Param

    if isinstance(comp, CompoundParam):
        names = tuple(comp.names)
    elif isinstance(comp, Param):
        names = (comp.name,)
    else:
        raise XmlError("transformedVectorSumTransform inner parameter")

    def fn(params, _names=names, _k=kind, _lo=lo, _hi=hi):
        y = jnp.concatenate(
            [jnp.ravel(jnp.asarray(params[n])) for n in _names])
        s = jnp.cumsum(y)
        if _k == "log":
            return jnp.exp(s)
        return _lo + (_hi - _lo) / (1.0 + jnp.exp(-s))

    name = el.get("id") or f"vecSum{len(ax._derived_params)}"
    ax._derived_params[name] = fn
    from beast_mcmc_tpu.config.xml_stats import _current_state

    p0, _ = _current_state(ax)
    return DerivedParam(name, fn, value=np.asarray(fn(p0), float))
