"""XML vocabulary: statistics / report elements + debug operators from the
reference's tests/TestXML corpus (round 5).

  - <parameterValues> (ref: src/dr/xml/unittest/ParameterValuesReport.java)
  - <multiplicativeParameter> (ref: src/dr/util/
    MultiplicativeProcessTransform.java — cumulative-product view;
    setting the view inverts via successive ratios)
  - <fireParameterChanged value=...> (ref: src/dr/inferencexml/operators/
    FireParameterOperatorParser.java — debug operator that force-sets
    parameter values)
  - <svdStatistic> (ref: src/dr/inference/model/SVDStatistic.java)
  - <blombergsK> (ref: src/dr/evomodel/continuous/BlombergKStatistic.java)
  - <sequenceDistanceStatistic> (ref: src/dr/evomodel/treelikelihood/
    SequenceDistanceStatistic.java)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.config.interpreter import (
    DerivedParam,
    LikelihoodFn,
    Param,
    Unsupported,
    XmlAnalysis,
    XmlError,
    _attr,
    _text_values,
    register,
    register_operator,
)


def _current_state(ax: XmlAnalysis):
    from beast_mcmc_tpu.config.xml_assert import initial_eval_state

    params0, tree0 = initial_eval_state(ax)
    return ax.inject_derived(params0), tree0


# ---------------------------------------------------------------------------
# parameterValues / multiplicativeParameter / fireParameterChanged
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _ValuesReport:
    name: str

    def report(self, ax) -> str:
        params, _ = _current_state(ax)
        vals = np.ravel(np.asarray(params[self.name], float))
        return " ".join(repr(float(v)) for v in vals) + " "


@register("parameterValues")
def _parameter_values(ax: XmlAnalysis, el):
    cc = ax.deref(next(iter(el)))
    obj = ax.build(cc)
    if isinstance(obj, (Param, DerivedParam)):
        return _ValuesReport(obj.name)
    return _ValuesReport(ax.param_from(cc))


@register("multiplicativeParameter")
def _multiplicative_parameter(ax: XmlAnalysis, el):
    name = el.get("id") or f"mult{len(ax._derived_params)}"
    inner = ax.param_from(next(iter(el)))

    def fn(params, _n=inner):
        return jnp.cumprod(jnp.ravel(params[_n]))

    ax._derived_params[name] = fn
    dp = DerivedParam(
        name, fn, value=np.cumprod(np.ravel(ax.value_of(inner))),
        base=inner)
    ax._params_views = getattr(ax, "_params_views", {})

    def inv(vals):
        vals = jnp.ravel(vals)
        return jnp.concatenate([vals[:1], vals[1:] / vals[:-1]])

    ax._params_views[name] = (inner, inv)
    ax._built[id(el)] = dp
    return dp


@dataclasses.dataclass
class FireParameterOperator:
    """Force-sets parameter values (debug; always accepted)."""

    targets: Tuple[str, ...] = ()  # values split across these in order
    values: Tuple[float, ...] = ()
    copy_from: Optional[str] = None
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = False

    def modified_params(self):
        return tuple(self.targets)

    @property
    def modifies_params(self):
        return tuple(self.targets)

    def initial_adapt(self):
        return 0.0

    def tuning(self, adapt_value):
        return None

    def propose(self, params, tree, key, tuning):
        if self.copy_from is not None:
            v = jnp.ravel(params[self.copy_from])
        else:
            v = jnp.asarray(self.values)
        out = dict(params)
        off = 0
        for t in self.targets:
            old = params[t]
            n = int(np.prod(jnp.shape(old))) if jnp.shape(old) else 1
            out[t] = jnp.reshape(
                v[off:off + n].astype(old.dtype), jnp.shape(old))
            off += n
        return out, tree, jnp.inf


@register_operator("fireParameterChanged")
def _fire_parameter_changed(ax: XmlAnalysis, el, weight):
    values = None
    if el.get("value"):
        values = tuple(float(x) for x in el.get("value").split())
    copy_from = None
    cf = el.find("copyFrom")
    if cf is not None:
        inner_cf = ax.deref(next(iter(cf)))
        if inner_cf.tag in ("dataFromTreeTips", "dataAndMissingFromTreeTips"):
            copy_from = ax.build(inner_cf).trait_param
        else:
            copy_from = ax.param_from(inner_cf)
    targets = ()
    for c in el:
        cc = ax.deref(c)
        if c.tag == "copyFrom":
            continue
        if cc.tag in ("compoundParameter", "CompoundParameter"):
            obj = ax.build(cc)
            targets = tuple(obj.names)
            break
        if cc.tag in ("matrixParameter", "fastMatrixParameter",
                      "scaledMatrixParameter"):
            from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

            # flat values are col-major = one chunk per column param
            targets = tuple(matrix_param_of(ax, cc).names)
            break
        if cc.tag in ("parameter", "multiplicativeParameter"):
            obj = ax.build(cc)
            if isinstance(obj, DerivedParam):
                # firing on a transformed view sets the UNDERLYING via
                # the transform's inverse (ref:
                # TransformedMultivariateParameter.setParameterValue)
                views = getattr(ax, "_params_views", {})
                if obj.name in views:
                    base, inv = views[obj.name]
                    if values is not None:
                        values = tuple(
                            float(x) for x in
                            np.asarray(inv(jnp.asarray(values, jnp.float64))))
                    targets = (base,)
                else:
                    targets = (obj.base,)
            elif isinstance(obj, Param):
                targets = (obj.name,)
            break
    if not targets:
        raise XmlError("fireParameterChanged without a parameter")
    return FireParameterOperator(
        targets=targets, values=values or (), copy_from=copy_from,
        weight=weight), None


# ---------------------------------------------------------------------------
# svdStatistic
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _SvdReport:
    mp: object  # MatrixParam
    name: str

    def _compute(self, ax):
        params, _ = _current_state(ax)
        L = np.asarray(self.mp.fn(params), float)  # (p, k)
        p, k = L.shape
        u, s, _vt = np.linalg.svd(L, full_matrices=False)
        # constraints (ref: SVDStatistic.enforceConstraints — descending
        # singular values, first element of each V row non-negative)
        order = np.argsort(-s)
        s, u = s[order], u[:, order]
        V = u.T.copy()  # (k, p): rows are L's left singular vectors
        for i in range(k):
            if V[i, 0] < 0:
                V[i] = -V[i]
        return s, V, p, k

    def report(self, ax) -> str:
        s, V, p, k = self._compute(ax)
        names = [f"{self.name}.sv{i + 1}" for i in range(k)] + [
            f"{self.name}.V{r + 1}{c + 1}"
            for r in range(k) for c in range(p)]
        vals = np.concatenate([s, np.ravel(V)])
        return (f"svdStatistic Report\n\n"
                f"dimension names: {' '.join(names)}\n\n"
                f"values: [ {', '.join(repr(float(v)) for v in vals)} ]\n\n")


@register("svdStatistic")
def _svd_statistic(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

    mp = matrix_param_of(ax, next(iter(el)))
    return _SvdReport(mp, el.get("id") or "svd")


# ---------------------------------------------------------------------------
# blombergsK
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _BlombergK:
    """Blomberg's K phylogenetic-signal statistic (ref:
    src/dr/inference/model/BlombergKStatistic.java:82-153 — uses
    L from V = L Lᵀ, contrasts = L⁻ᵀ(x−μ), expectedRatio =
    (tr V − n/‖L⁻ᵀ1‖²)/(n−1), K = (Σ(x−μ)²/Σc²)/expectedRatio,
    with μ the post-order root mean = GLS mean under V)."""

    tid: str = ""
    trait_param: str = ""
    dim: int = 1
    name: str = "kstat"

    def _tree_variance(self, ax):
        tm = ax._trees[self.tid]
        parent = np.asarray(tm.parent)
        heights = np.asarray(tm.heights, float)
        root = int(tm.root)
        n_tips = (parent.shape[0] + 1) // 2
        root_h = heights[root]

        def path(i):
            out = []
            while i != root:
                out.append(i)
                i = int(parent[i])
            return set(out)

        paths = [path(i) for i in range(n_tips)]
        V = np.zeros((n_tips, n_tips))
        for i in range(n_tips):
            for j in range(i, n_tips):
                shared = paths[i] & paths[j]
                # shared path length from the root down to the MRCA
                s = sum(heights[int(parent[k])] - heights[k]
                        for k in shared)
                V[i, j] = V[j, i] = s
        return V, n_tips

    def values(self, ax):
        params, _ = _current_state(ax)
        V, n = self._tree_variance(ax)
        X = np.asarray(params[self.trait_param], float).reshape(
            (n, self.dim))
        L = np.linalg.cholesky(V)
        # ref :102 `L.inverse().transpose()` — colt's CholeskyDecomposition
        # getL is row-lower but Matrix.product left-multiplies the
        # TRANSPOSED storage; operationally contrasts = L⁻¹(x−μ)
        # (verified against both embedded oracles at 1e-6)
        Linv = np.linalg.inv(L)
        l_vec = Linv @ np.ones(n)
        sum_inverse = float(l_vec @ l_vec)
        expected_ratio = (np.trace(V) - n / sum_inverse) / (n - 1)
        Vinv = np.linalg.inv(V)
        ones = np.ones(n)
        ks = []
        for t in range(self.dim):
            x = X[:, t]
            mu = float(ones @ Vinv @ x) / float(ones @ Vinv @ ones)
            v = x - mu
            contrasts = Linv @ v
            ks.append(float(v @ v) / float(contrasts @ contrasts)
                      / expected_ratio)
        return ks

    def report(self, ax) -> str:
        return "".join(f"{self.name}{t + 1}:  {float(k)!r}\n"
                       for t, k in enumerate(self.values(ax)))


@register("blombergsK")
def _blombergs_k(ax: XmlAnalysis, el):
    lik_el = ax.deref(next(iter(el)))
    lik = ax.build(lik_el)
    tl = getattr(ax, "_trait_likelihoods", {}).get(lik_el.get("id"))
    if tl is None:
        raise Unsupported("blombergsK without a trait likelihood")
    return _BlombergK(tid=tl.tree_id, trait_param=tl.trait_param,
                      dim=tl.dim, name=el.get("id") or "kstat")


# ---------------------------------------------------------------------------
# sequenceDistanceStatistic
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _SequenceDistance:
    """ref: src/dr/evomodel/treedatalikelihood/discrete/
    SequenceDistanceStatistic.java — per-putative-taxon ML CTMC branch
    length between the taxon's sequence and the (MAP) reconstructed
    root states; reportDistance="likelihood" returns the optimized lnL
    instead. Root states use the marginal MAP reconstruction (the
    reference's joint draw concentrates on the same states in the
    corpus files, which assert the optimized distances at 1e-6)."""

    asr_id: str = ""
    tree_states: np.ndarray = None   # (n_tree_taxa, L) tip state codes
    put_states: np.ndarray = None    # (T, L) putative taxon codes
    put_names: Tuple[str, ...] = ()
    model: tuple = None              # ("subst"/"subst_q", fn, freqs_fn, k)
    kind: str = "distance"           # or "likelihood"
    name: str = "SDS"

    def _root_map_states(self, ax, params):
        from beast_mcmc_tpu.ops.eigen import transition_probs
        from beast_mcmc_tpu.ops.expm import transition_probs_expm
        from beast_mcmc_tpu.ops.peeling import (
            _peel_forward,
            peel_order_from_heights,
        )
        from beast_mcmc_tpu.models.treelikelihood import branch_lengths
        from beast_mcmc_tpu.tree.topology import make_tree_state

        parts = ax._treelik_parts[self.asr_id]
        tm = parts["tm"]
        tree = make_tree_state(tm.parent, tm.children, tm.heights,
                               tm.root, jnp.float64)
        r, w = parts["rates_weights"](params, parts["dtype"])
        br = parts["clock"].rates(params, tree)
        bl = branch_lengths(tree.parent, tree.heights) * br
        t = bl[:, None] * r[None, :]
        if parts["site_kind"] == "site_q":
            p_mats = transition_probs_expm(parts["eigen"](params), t)
        else:
            p_mats = transition_probs(parts["eigen"](params), t)
        s = self.tree_states.shape[1] and parts["tips"].shape[1]
        n, L = self.tree_states.shape
        k = p_mats.shape[-1]
        tips = np.zeros((n, k, L))
        for i in range(n):
            for j in range(L):
                st = self.tree_states[i, j]
                if st < k:
                    tips[i, st, j] = 1.0
                else:
                    tips[i, :, j] = 1.0
        order = peel_order_from_heights(tree.heights, n)
        freqs = parts["freqs_of"](params)
        _sl, post, _sk = _peel_forward(
            jnp.asarray(tips), tree.children, order, tree.root,
            p_mats, freqs, w)
        root_post = jnp.einsum("c,csp,s->sp", w,
                               post[int(tm.root)], freqs)
        return np.argmax(np.asarray(root_post), axis=0)  # (L,)

    def values(self, ax):
        from scipy.optimize import minimize_scalar

        from beast_mcmc_tpu.config.xml_stats import _current_state

        params, _t0 = _current_state(ax)
        node_states = self._root_map_states(ax, params)
        kind_tag, fn, freqs_fn, k = self.model

        def tpm_of(d):
            if kind_tag == "subst_q":
                from scipy.linalg import expm as _expm

                q = np.asarray(fn(params), float)
                return _expm(q * d)
            es = fn(params)
            u = np.asarray(es.U, float)
            vals = np.asarray(es.values, float)
            ui = np.asarray(es.U_inv, float)
            return (u * np.exp(vals * d)[None, :]) @ ui

        pi = np.asarray(freqs_fn(params), float)
        out = []
        for t_i in range(self.put_states.shape[0]):
            ts = self.put_states[t_i]

            def neg_lnl(d):
                tpm = np.maximum(tpm_of(max(d, 0.0)), 1e-300)
                lnl = 0.0
                for sidx in range(ts.shape[0]):
                    a = ts[sidx]
                    b2 = node_states[sidx]
                    if a < k:
                        lnl += np.log(tpm[a, b2])
                    else:
                        lnl += np.log(float(pi @ tpm[:, b2]))
                return -lnl

            res = minimize_scalar(neg_lnl, bounds=(0.0, 10.0),
                                  method="bounded",
                                  options={"xatol": 1e-10})
            out.append(-res.fun if self.kind == "likelihood"
                       else res.x)
        return out

    def report(self, ax) -> str:
        vals = self.values(ax)
        names = [f"{self.name}.{nm}" for nm in self.put_names]
        vs = ", ".join(repr(float(v)) for v in vals)
        return (f"sequenceDistanceStatistic Report\n\n"
                f"dimension names: {' '.join(names)}\n\n"
                f"values: [ {vs} ]\n\n")


@register("sequenceDistanceStatistic")
def _sequence_distance_statistic(ax: XmlAnalysis, el):
    asr_id = None
    model = None
    put = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("ancestralTreeLikelihood",
                      "markovJumpsTreeLikelihood"):
            ax.build(cc)
            asr_id = cc.get("id")
        elif cc.tag == "alignment":
            put = ax.build(cc)
        elif cc.tag.endswith("Model") or cc.tag in (
                "glmSubstitutionModel", "generalSubstitutionModel"):
            try:
                maybe = ax.build(cc)
            except (Unsupported, XmlError):
                continue
            if isinstance(maybe, tuple) and maybe[0] in ("subst",
                                                         "subst_q"):
                model = maybe
    if asr_id is None or model is None or put is None:
        raise Unsupported("sequenceDistanceStatistic structure")
    parts = ax._treelik_parts[asr_id]
    tm = parts["tm"]
    # tree-taxa state codes from the asr's ALIGNMENT (per site)
    tree_aln = None
    for el2 in ax.root.iter("alignment"):
        obj2 = ax.build(el2)
        if hasattr(obj2, "taxa") and set(tm.taxa) <= set(obj2.taxa):
            tree_aln = obj2
            break
    if tree_aln is None:
        raise Unsupported("sequenceDistanceStatistic: no tree alignment")
    idx = [tree_aln.taxa.index(nm) for nm in tm.taxa]
    tree_states = np.asarray(tree_aln.states)[idx]
    sds = _SequenceDistance(
        asr_id, tree_states, np.asarray(put.states),
        tuple(put.taxa), model,
        el.get("reportDistance", "distance"),
        el.get("id") or "SDS")
    sds.columns = _sds_chain_columns(ax, sds)
    return sds


def _sds_chain_columns(ax, sds: "_SequenceDistance"):
    """jit-safe logging columns for the distance statistic: vectorized
    grid search over branch length (the log column needs ~4 digits; the
    report path uses the exact Brent optimum)."""
    parts = ax._treelik_parts[sds.asr_id]
    n, L = sds.tree_states.shape

    tips = np.zeros((n, 4, L))
    k_guess = None

    def make_fn(t_i):
        def fn(s):
            from beast_mcmc_tpu.models.treelikelihood import branch_lengths
            from beast_mcmc_tpu.ops.eigen import transition_probs
            from beast_mcmc_tpu.ops.expm import transition_probs_expm
            from beast_mcmc_tpu.ops.peeling import (
                _peel_forward,
                peel_order_from_heights,
            )

            params = ax.inject_derived(s.params)
            tree = s.tree
            r, w = parts["rates_weights"](params, parts["dtype"])
            br = parts["clock"].rates(params, tree)
            bl = branch_lengths(tree.parent, tree.heights) * br
            t = bl[:, None] * r[None, :]
            es = parts["eigen"](params)
            if parts["site_kind"] == "site_q":
                p_mats = transition_probs_expm(es, t)
                k = p_mats.shape[-1]
            else:
                p_mats = transition_probs(es, t)
                k = p_mats.shape[-1]
            tps = np.zeros((n, k, L))
            for i in range(n):
                for j in range(L):
                    st = sds.tree_states[i, j]
                    if st < k:
                        tps[i, st, j] = 1.0
                    else:
                        tps[i, :, j] = 1.0
            order = peel_order_from_heights(tree.heights, n)
            freqs = parts["freqs_of"](params)
            _sl, post, _sk = _peel_forward(
                jnp.asarray(tps, p_mats.dtype), tree.children, order,
                tree.root, p_mats, freqs, w)
            root_post = jnp.einsum("c,csp,s->sp", w, post[tree.root],
                                   freqs)
            node_states = jnp.argmax(root_post, axis=0)  # [L]
            # model tpm over a branch-length grid
            kind_tag, fnm, freqs_fn, kk = sds.model
            grid = jnp.linspace(1e-6, 10.0, 1024)
            if kind_tag == "subst_q":
                q = fnm(params)
                pg = jax.vmap(
                    lambda d: jax.scipy.linalg.expm(q * d))(grid)
            else:
                es2 = fnm(params)
                pg = jax.vmap(lambda d: (es2.U * jnp.exp(
                    es2.values * d)[None, :]) @ es2.U_inv)(grid)
            pg = jnp.maximum(pg, 1e-300)
            pi = freqs_fn(params)
            ts = jnp.asarray(sds.put_states[t_i])
            amb = ts >= kk
            ts_c = jnp.minimum(ts, kk - 1)
            site_l = jnp.where(
                amb[None, :],
                jnp.log(jnp.einsum("s,gst->gt", pi, pg))[
                    :, node_states],
                jnp.log(pg[:, ts_c, node_states]))
            lnl = jnp.sum(site_l, axis=1)  # [G]
            best = jnp.argmax(lnl)
            if sds.kind == "likelihood":
                return lnl[best]
            return grid[best]

        return fn

    return [(f"{sds.name}.{nm}", make_fn(i))
            for i, nm in enumerate(sds.put_names)]


@register("ancestralTrait")
def _ancestral_trait(ax: XmlAnalysis, el):
    """ref: AncestralTraitParser — logs the reconstructed ancestral
    state at the root (or a clade MRCA). The jit log collector carries
    numerics, so the column logs the sampled root STATE CODE of each
    pattern's joint draw (first pattern; the reference logs the
    sequence string)."""
    rec = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("ancestralTreeLikelihood",
                      "markovJumpsTreeLikelihood"):
            ax.build(cc)
            rec = getattr(ax, "_ancestral_liks", {}).get(cc.get("id"))
    if rec is None:
        raise Unsupported("ancestralTrait without ancestral likelihood")
    name = el.get("name", "ancestralTrait")
    states_fn = rec["states_fn"]

    def col_fn(s):
        tr = ax.resolve_tree(rec["tree_id"], s.params, s.tree)
        k2 = jax.random.fold_in(s.key, 77)
        states = states_fn(ax.inject_derived(s.params), tr, k2)
        return states[tr.root].astype(jnp.float32)

    class _Col2:
        columns = [(name, col_fn)]

    return _Col2()


@register("property")
def _property_report(ax: XmlAnalysis, el):
    """ref: dr.xml.PropertyParser — reflective report of a named
    property of an object (used by the old-vs-new tester files:
    traceAnalysis column means, wishartStatistics matrices)."""
    name = el.get("name")
    index = _attr(el, "index", None, int)

    class _Prop:
        def _inner_val(self, ax_):
            inner = next(iter(el))
            if inner.tag == "object":
                return ax_.deref(inner)  # the raw target ELEMENT
            cc = ax_.deref(inner)
            if cc.tag == "property":
                # nested: resolve inner first (e.g. correlationStatistics
                # index=N of a traceAnalysis, then .mean)
                return ax_.build(cc).resolve(ax_)
            return ax_.build(cc)

        def report(self, ax_):
            return self._apply(ax_, self._inner_val(ax_))

        def resolve(self, ax_):
            return self._value(ax_, self._inner_val(ax_))

        def _value(self, ax_, val):
            import xml.etree.ElementTree as ET

            if name == "mean" and not isinstance(val, ET.Element):
                return float(np.mean(np.asarray(val, float)))
            if name == "correlationStatistics" and isinstance(
                    val, ET.Element) and val.tag == "traceAnalysis":
                from beast_mcmc_tpu.config.xml_mle import _read_log

                names, rows = _read_log(ax_, val.get("fileName"))
                data_cols = [i for i, nm in enumerate(names)
                             if nm.lower() not in ("state", "states")]
                return rows[:, data_cols[index or 0]]
            if name == "wishartStatistics":
                # an id-resolved wishartStatistics element
                if isinstance(val, ET.Element):
                    val = ax_.build(val)
                return np.ravel(val.scale_matrix(ax_))
            if name == "mean":
                return float(np.mean(np.asarray(val, float)))
            raise Unsupported(f"property {name!r}")

        def _apply(self, ax_, val):
            v = self._value(ax_, val)
            if np.ndim(v) == 0:
                return f"{float(v)!r}\n"
            arr = np.ravel(np.asarray(v, float))
            return "[" + ", ".join(str(float(x)) for x in arr) + "]\n"

    return _Prop()


@register("continuousDiffusionStatistic",
          "traitDataContinuousDiffusionStatistic")
def _continuous_diffusion_statistic(ax: XmlAnalysis, el):
    """ref: ContinuousDiffusionStatistic / TraitDataContinuous
    DiffusionStatistic — per-sample dispersal rate Σ dist_b / Σ t_b over
    branches of the (conditional-mean) node trait reconstruction;
    displacementScheme greatCircleDistance uses the haversine on
    (lat, lon) traits."""
    gcd = (el.get("greatCircleDistance", "false").lower() == "true"
           or el.get("displacementScheme", "linear")
           == "greatCircleDistance")
    tl = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("traitDataLikelihood", "multivariateTraitLikelihood"):
            ax.build(cc)
            tl = getattr(ax, "_trait_likelihoods", {}).get(cc.get("id"))
    if tl is None or tl.channels is None:
        raise Unsupported("continuousDiffusionStatistic without trait "
                          "likelihood")

    def col_fn(s):
        from beast_mcmc_tpu.models.continuous import (
            affine_gaussian_node_conditionals,
        )

        params = ax.inject_derived(s.params)
        tree = ax.resolve_tree(tl.tree_id, s.params, s.tree)
        qs, rs, sigs, mu0, v0 = tl.channels(params, tree)
        tips = jnp.reshape(params[tl.trait_param], (tl.n_tips, tl.dim))
        means, _ = affine_gaussian_node_conditionals(
            tips, jnp.asarray(tl.missing), tree.parent, tree.children,
            tree.heights, tree.root, qs, rs, sigs, mu0, v0)
        pidx = jnp.maximum(tree.parent, 0)
        dt = tree.heights.dtype
        t_b = jnp.where(tree.parent >= 0,
                        tree.heights[pidx] - tree.heights, 0.0)
        d = means - means[pidx]
        if gcd:
            # haversine over (lat, lon) degrees, Earth radius 6371 km
            rad = jnp.asarray(jnp.pi / 180.0, dt)
            la1, lo1 = means[:, 0] * rad, means[:, 1] * rad
            la2 = means[pidx, 0] * rad
            lo2 = means[pidx, 1] * rad
            a = (jnp.sin((la2 - la1) / 2) ** 2
                 + jnp.cos(la1) * jnp.cos(la2)
                 * jnp.sin((lo2 - lo1) / 2) ** 2)
            dist = 6371.0 * 2 * jnp.arcsin(
                jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
        else:
            dist = jnp.sqrt(jnp.sum(jnp.square(d), axis=1))
        mask = (tree.parent >= 0).astype(dt)
        return jnp.sum(dist * mask) / jnp.maximum(
            jnp.sum(t_b * mask), 1e-30)

    nm = el.get("id") or "diffusionRate"

    class _Col:
        columns = [(nm, col_fn)]

        def report(self, ax_):
            from beast_mcmc_tpu.config.xml_stats import _current_state

            class _S:
                pass

            params, tree0 = _current_state(ax_)
            s = _S()
            s.params = params
            s.tree = tree0
            return f"{float(col_fn(s))!r}\n"

    return _Col()


@register("cladeRelationshipStatistic")
def _clade_relationship_statistic(ax: XmlAnalysis, el):
    """ref: src/dr/evomodel/tree/CladeRelationshipStatistic.java:105-128
    — 1.0 iff taxaA's MRCA is sister to taxaB's MRCA ('sister'), or iff
    A's MRCA lies inside B's clade ('aInB')."""
    rel = el.get("relationshipType", "sister")
    tree_id = None
    sets = {}
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tree_id = ax.build(cc).tree_id
        elif cc.tag in ("taxaA", "taxaB"):
            names = []
            for t_el in cc.iter("taxon"):
                names.append(t_el.get("idref") or t_el.get("id"))
            sets[cc.tag] = names
    tm = ax._trees[tree_id]
    idxA = [tm.taxa.index(nm) for nm in sets["taxaA"]]
    idxB = [tm.taxa.index(nm) for nm in sets["taxaB"]]
    parent = np.asarray(tm.parent)
    heights = np.asarray(tm.heights, float)
    root = int(tm.root)

    def mrca(tips):
        cur = set(tips)
        # walk each tip's ancestor path; the lowest common node
        paths = []
        for t in tips:
            p = [t]
            while p[-1] != root:
                p.append(int(parent[p[-1]]))
            paths.append(p)
        common = set(paths[0])
        for p in paths[1:]:
            common &= set(p)
        return min(common, key=lambda nd: heights[nd])

    mA, mB = mrca(idxA), mrca(idxB)
    mT = mrca([mA, mB])
    sister = (mA != root and mB != root
              and int(parent[mA]) == int(parent[mB]))
    a_in_b = (not sister) and (mT == mB)
    val = 1.0 if (sister if rel == "sister" else a_in_b) else 0.0
    nm = el.get("id") or "cladeRelationship"

    class _R:
        def report(self, ax_):
            return f"{nm}: {val!r}\n"

        columns = [(nm, lambda s, v=val: jnp.asarray(v))]

    return _R()
