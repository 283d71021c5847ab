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
        if cc.tag == "compoundParameter":
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
