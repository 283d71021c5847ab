"""XML vocabulary: random fields, Gaussian-process priors, and the
non-parametric multilocus coalescent (the ci/TestXML corpus family).

Vocabulary (reference parsers cited per builder):
  randomField            (RandomFieldParser.java)
  gaussianMarkovRandomField / GaussianMarkovRandomField
                         (GaussianMarkovRandomFieldParser.java)
  weightProvider         (WeightsParser.java — tree-interval weights)
  gaussianProcessField   (gp/AdditiveGaussianProcessDistribution.java)
  randomFieldGradient    (RandomFieldGradientParser.java)
  gaussianProcessKernelGradient (gp/GaussianProcessKernelGradient.java)
  multiLocusNPCoalescentLikelihood (+Gradient)
                         (MultilocusNonparametricCoalescentLikelihood)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Tuple

import numpy as np

import jax.numpy as jnp

from beast_mcmc_tpu.config.interpreter import (
    LikelihoodFn,
    Unsupported,
    XmlAnalysis,
    XmlError,
    _attr,
    _child_of,
    register,
)


# ---------------------------------------------------------------------------
# GP kernels (ref: gp/GaussianProcessKernel.java — K = scale * k(x, y))
# ---------------------------------------------------------------------------


def _kernel_fn(ktype: str) -> Callable:
    """k_unscaled(d2, length) with d2 the squared distance."""
    kt = ktype.lower()
    if kt == "dotproduct":
        return None  # handled separately (needs raw x, y)
    if kt == "squaredexponential":
        return lambda d2, l: jnp.exp(-d2 / (2.0 * l * l))
    if kt == "ornsteinuhlenbeck":
        return lambda d2, l: jnp.exp(-jnp.sqrt(d2) / l)
    if kt in ("matern5/2", "maternfivehalves"):
        def m52(d2, l):
            a1 = jnp.sqrt(5.0 * d2) / l
            a2 = 5.0 * d2 / (3.0 * l * l)
            return (1.0 + a1 + a2) * jnp.exp(-a1)

        return m52
    if kt in ("matern3/2", "maternthreehalves"):
        def m32(d2, l):
            a = jnp.sqrt(3.0 * d2) / l
            return (1.0 + a) * jnp.exp(-a)

        return m32
    raise Unsupported(f"GP kernel type {ktype!r}")


def _weight_fn(el):
    """ref: gp/WeightFunction.java — per-point basis weights."""
    wt = el.get("type", "identity").lower()
    scale = _attr(el, "scale", 1.0, float)
    loc = _attr(el, "location", 0.0, float)
    slope = _attr(el, "slope", 1.0, float)
    intercept = _attr(el, "intercept", 0.0, float)
    if wt == "identity":
        return lambda x: jnp.ones_like(x)
    if wt == "sigmoid":
        return lambda x: 1.0 / (1.0 + jnp.exp(-scale * (x - loc)))
    if wt == "sigmoidcomplement":
        return lambda x: 1.0 - 1.0 / (1.0 + jnp.exp(-scale * (x - loc)))
    if wt == "linear":
        return lambda x: slope * x + intercept
    raise Unsupported(f"weight function {wt!r}")


@dataclasses.dataclass
class FieldDist:
    """A random-field distribution: logpdf(params, tree, x) -> scalar."""

    logpdf: Callable = None
    dim: int = 0
    hyper_names: Tuple[str, ...] = ()


@register("gaussianProcessField")
def _gp_field(ax: XmlAnalysis, el):
    """ref: AdditiveGaussianProcessDistribution — MVN with covariance
    K = sum_bases scale_b * k_b(x_i, x_j) + nugget I (order-1 additive
    GP; hyperparameters stay live so jax.grad reaches them)."""
    dim = _attr(el, "dim", None, int)
    nugget = None
    mean_name = None
    hyper: List[str] = []
    bases = []  # (design param name | array, kernel fn, scale, length)
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "gaussianNoise":
            nugget = ax.param_from(cc)
        elif cc.tag == "mean":
            mean_name = ax.param_from(cc)
        elif cc.tag == "basis":
            design = None
            kfn = scale_n = length_n = None
            ktype = None
            wfn = None
            for b in cc:
                bb = ax.deref(b)
                if bb.tag == "designMatrix":
                    design = ax.param_from(bb)
                elif bb.tag == "kernel":
                    ktype = bb.get("type", "SquaredExponential")
                    kfn = _kernel_fn(ktype)
                    sc = bb.find("scale")
                    ln = bb.find("length")
                    scale_n = ax.param_from(sc) if sc is not None else None
                    length_n = ax.param_from(ln) if ln is not None else None
                    if sc is None and ln is None:
                        # bare ordered <parameter> children: scale, length
                        ps = [ax.param_from(d) for d in bb
                              if ax.deref(d).tag == "parameter"]
                        if len(ps) >= 1:
                            scale_n = ps[0]
                        if len(ps) >= 2:
                            length_n = ps[1]
                elif bb.tag == "weightFunction":
                    wfn = _weight_fn(bb)
            if design is None or ktype is None:
                raise XmlError("<basis> needs designMatrix + kernel")
            ortho = (cc.get("orthogonalProjection") or "false"
                     ).lower() == "true"
            bases.append((design, kfn, scale_n, length_n, wfn, ortho))
            hyper.extend(n for n in (scale_n, length_n) if n)
    if dim is None:
        raise XmlError("gaussianProcessField without dim")
    if not bases:
        raise Unsupported("gaussianProcessField without basis")

    def logpdf(params, tree, x):
        dt = x.dtype
        k = jnp.zeros((dim, dim), dt)
        for design, kfn, scale_n, length_n, wfn, ortho in bases:
            xs = jnp.ravel(params[design]).astype(dt)[:dim]
            scale = (jnp.ravel(params[scale_n])[0].astype(dt)
                     if scale_n else jnp.asarray(1.0, dt))
            w = wfn(xs) if wfn is not None else None
            if kfn is None:  # DotProduct
                kb = jnp.outer(xs, xs)
            else:
                length = (jnp.ravel(params[length_n])[0].astype(dt)
                          if length_n else jnp.asarray(1.0, dt))
                d2 = (xs[:, None] - xs[None, :]) ** 2
                kb = kfn(d2, length)
            if w is not None:
                kb = kb * jnp.outer(w, w)
            if ortho:
                # ref: basis orthogonalProjection — K_b -> H K_b H with
                # H = I - x x^T / (x^T x)
                h = jnp.eye(dim, dtype=dt) - jnp.outer(xs, xs) / (xs @ xs)
                kb = h @ kb @ h
            k = k + scale * kb
        if nugget is not None:
            k = k + jnp.ravel(params[nugget])[0].astype(dt) * jnp.eye(
                dim, dtype=dt)
        mu = (jnp.ravel(params[mean_name]).astype(dt)
              if mean_name else jnp.zeros(dim, dt))
        diff = x - jnp.broadcast_to(mu, (dim,))
        l = jnp.linalg.cholesky(k)
        alpha = jax_solve_chol(l, diff)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))
        return -0.5 * (diff @ alpha + logdet
                       + dim * jnp.log(2.0 * jnp.asarray(jnp.pi, dt)))

    fd = FieldDist(logpdf, dim, tuple(hyper))
    fd.bases = tuple(bases)  # (design, kfn, scale_n, length_n, wfn)
    fd.nugget = nugget
    return fd


def jax_solve_chol(l, b):
    import jax.scipy.linalg as jsl

    return jsl.cho_solve((l, True), b)


@register("weightProvider")
def _weight_provider(ax: XmlAnalysis, el):
    """ref: WeightsParser/Weights.java — RW1 adjacency weights from the
    tree's inter-event intervals: w(i, i+1) = 2/(len_i + len_{i+1}) over
    DISTINCT event times. Computed from the parse-time tree (the corpus
    uses fixed trees for these priors; a moving tree would need the
    weights re-derived in-jit)."""
    if el.find("gridPoints") is not None:
        raise Unsupported("gridded weightProvider")
    tm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)
    if tm is None:
        raise XmlError("weightProvider without treeModel")
    rescale = _attr(el, "rescaleByRootHeight", False, bool)
    times = np.sort(np.asarray(tm.heights))
    times = np.unique(times)
    lens = np.diff(times)
    w = 2.0 / (lens[:-1] + lens[1:])
    if rescale:
        w = w * float(tm.heights[tm.root])
    return np.asarray(w)


@register("gaussianMarkovRandomField", "GaussianMarkovRandomField")
def _gmrf_field(ax: XmlAnalysis, el):
    """ref: GaussianMarkovRandomFieldParser + GaussianMarkovRandomField:
    RW1 increment prior, optionally weighted; improper when lambda
    absent/==1 (pseudo-determinant over dim-1 eigenvalues)."""
    dim = _attr(el, "dim", None, int)
    prec = ax.param_from(_child_of(el, "precision"))
    mean_el = el.find("mean")
    mean_name = ax.param_from(mean_el) if mean_el is not None else None
    lam_el = el.find("lambda")
    lam = (float(np.ravel(ax.value_of(ax.param_from(lam_el)))[0])
           if lam_el is not None else 1.0)
    match_pd = _attr(el, "matchPseudoDeterminant", False, bool)
    weights = None
    wp = el.find("weightProvider")
    if wp is not None:
        weights = ax.build(wp)
    improper = lam == 1.0

    if weights is not None:
        w = np.asarray(weights)[: dim - 1]
        diag = np.zeros(dim)
        diag[0] = w[0]
        diag[1:-1] = w[:-1] + w[1:]
        diag[-1] = w[-1]
        off = -w
    else:
        diag = np.full(dim, 2.0)
        diag[0] = diag[-1] = 1.0
        off = np.full(dim - 1, -1.0)
        if not improper:
            diag = diag * lam
            diag = diag + (1.0 - lam)  # Q = lam*RW1 + (1-lam) I structure
            off = off * lam

    # log (pseudo-)determinant of the UNIT-precision structure matrix
    q = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
    ev = np.linalg.eigvalsh(q)
    if improper:
        log_field_det = float(np.sum(np.log(ev[np.abs(ev) > 1e-6])))
        if not match_pd and weights is None:
            log_field_det = 0.0  # ref: logMatchTerm defaults off
    else:
        log_field_det = float(np.sum(np.log(ev)))
    eff_dim = dim - 1 if improper else dim
    diag_j = jnp.asarray(diag)
    off_j = jnp.asarray(off)

    def logpdf(params, tree, x):
        dt = x.dtype
        tau = jnp.ravel(params[prec])[0].astype(dt)
        mu = (jnp.broadcast_to(jnp.ravel(params[mean_name]).astype(dt),
                               (dim,))
              if mean_name else jnp.zeros(dim, dt))
        d = x - mu
        sse = (jnp.sum(diag_j.astype(dt) * d * d)
               + 2.0 * jnp.sum(off_j.astype(dt) * d[:-1] * d[1:]))
        logdet = eff_dim * jnp.log(tau) + log_field_det
        return (-0.5 * eff_dim * jnp.log(2.0 * jnp.asarray(jnp.pi, dt))
                + 0.5 * logdet - 0.5 * tau * sse)

    return FieldDist(logpdf, dim, (prec,))


@dataclasses.dataclass
class RandomFieldLik:
    lik: LikelihoodFn = None
    field_param: str = ""
    dist: FieldDist = None


@register("randomField")
def _random_field(ax: XmlAnalysis, el):
    """ref: RandomFieldParser — scores <data> under <distribution>."""
    data_el = el.find("data")
    dist_el = el.find("distribution")
    if data_el is None or dist_el is None:
        raise XmlError("randomField needs <data> + <distribution>")
    pname = ax.param_from(data_el)
    dist = None
    for c in dist_el:
        dist = ax.build(c)
    if not isinstance(dist, FieldDist):
        raise Unsupported("randomField distribution")
    n = int(np.ravel(ax.value_of(pname)).size)
    if n != dist.dim:
        # reference sizes the field from the distribution
        p = ax._params[pname]
        ax._params[pname] = dataclasses.replace(
            p, value=np.resize(np.atleast_1d(p.value), dist.dim))

    def fn(params, tree):
        return dist.logpdf(params, tree, jnp.ravel(params[pname]))

    lik = LikelihoodFn(fn, None, el.get("id") or "randomField", (pname,))
    rf = RandomFieldLik(lik, pname, dist)
    ax._random_fields = getattr(ax, "_random_fields", {})
    ax._random_fields[el.get("id") or lik.name] = rf
    return lik


def _field_of(ax, el) -> RandomFieldLik:
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "randomField":
            ax.build(cc)
            key = cc.get("id")
            rf = getattr(ax, "_random_fields", {}).get(key)
            if rf is not None:
                return rf
    raise XmlError(f"<{el.tag}> without randomField child")


@register("randomFieldGradient")
def _random_field_gradient(ax: XmlAnalysis, el):
    """ref: RandomFieldGradientParser — gradient wrt the field itself
    (or an explicit parameter child)."""
    from beast_mcmc_tpu.config.xml_hmc import GradientSpec

    rf = _field_of(ax, el)
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            if hasattr(obj, "name"):
                names.append(obj.name)
    return GradientSpec(tuple(names) or (rf.field_param,), (rf.lik,))


@register("gaussianProcessKernelGradient")
def _gp_kernel_gradient(ax: XmlAnalysis, el):
    """ref: gp/GaussianProcessKernelGradient — gradient of the GP
    density wrt kernel hyperparameters (scale/length)."""
    from beast_mcmc_tpu.config.xml_hmc import GradientSpec

    rf = _field_of(ax, el)
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            if hasattr(obj, "name"):
                names.append(obj.name)
    return GradientSpec(tuple(names) or rf.dist.hyper_names, (rf.lik,))


# ---------------------------------------------------------------------------
# GP conditional derivative (prediction of the derivative field)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GpConditionalDerivative:
    """ref: gp/GaussianProcessConditionalDerivative.java — posterior of
    f'(x) given the observed field: mean = K10 K00^-1 y,
    var = K11 - K10 K00^-1 K01 with SE-kernel derivative
    cross-covariances (getUnscaledFirst/SecondDerivative)."""

    field_param: str = ""
    design: np.ndarray = None
    scale_n: str = ""
    length_n: str = ""
    noise_n: str = ""

    def report(self, ax) -> str:
        from beast_mcmc_tpu.config.xml_assert import (
            _vec,
            initial_eval_state,
        )

        params0, _ = initial_eval_state(ax)
        y = np.ravel(np.asarray(params0[self.field_param]))
        x = self.design
        s = float(np.ravel(np.asarray(params0[self.scale_n]))[0]) \
            if self.scale_n else 1.0
        l = float(np.ravel(np.asarray(params0[self.length_n]))[0]) \
            if self.length_n else 1.0
        noise = float(np.ravel(np.asarray(params0[self.noise_n]))[0]) \
            if self.noise_n else 0.0
        d = x[:, None] - x[None, :]
        k = s * np.exp(-d * d / (2 * l * l))
        k00 = k + noise * np.eye(x.size)
        k10 = -d / (l * l) * k
        k11 = (1.0 / (l * l) - d * d / l**4) * k
        pinv = np.linalg.inv(k00)
        mean = k10 @ pinv @ y
        var = k11 - k10 @ pinv @ k10.T
        return f"mean: {_vec(mean)}\nvariance: {_vec(var)}\n"


@register("gaussianProcessConditionalDerivative")
def _gp_conditional_derivative(ax: XmlAnalysis, el):
    fname = None
    f_el = el.find("field")
    if f_el is not None:
        fname = ax.param_from(f_el)
    gp_el = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "gaussianProcessField":
            gp_el = cc
    if gp_el is None or fname is None:
        raise XmlError(
            "gaussianProcessConditionalDerivative needs field + GP")
    ax.build(gp_el)
    basis = gp_el.find("basis")
    kern = basis.find("kernel")
    if kern.get("type", "SquaredExponential") != "SquaredExponential":
        raise Unsupported("conditional derivative for non-SE kernel")
    from beast_mcmc_tpu.config.interpreter import _text_values

    design = None
    for p in basis.find("designMatrix"):
        pp = ax.deref(p)
        if pp.tag == "parameter":
            design = (_text_values(pp) if pp.get("value")
                      else np.ravel(ax.value_of(ax.param_from(pp))))
    noise_el = gp_el.find("gaussianNoise")
    return GpConditionalDerivative(
        field_param=fname,
        design=np.asarray(design, float),
        scale_n=ax.param_from(kern.find("scale"))
        if kern.find("scale") is not None else "",
        length_n=ax.param_from(kern.find("length"))
        if kern.find("length") is not None else "",
        noise_n=ax.param_from(noise_el) if noise_el is not None else "",
    )


# ---------------------------------------------------------------------------
# non-parametric multilocus coalescent
# ---------------------------------------------------------------------------


@register("multiLocusNPCoalescentLikelihood",
          "multilocusNPCoalescentLikelihood")
def _np_coalescent(ax: XmlAnalysis, el):
    """ref: MultilocusNonparametricCoalescentLikelihood — the skygrid
    data term (piecewise-constant log-N on explicit grid points) summed
    over loci, WITHOUT a smoothing prior (that arrives separately via
    <randomField>)."""
    from beast_mcmc_tpu.models.coalescent import skygrid_loglik

    pops = ax.param_from(_child_of(el, "populationSizes"))
    gp = el.find("gridPoints")
    if gp is None:
        raise XmlError("multiLocusNPCoalescentLikelihood without gridPoints")
    cuts = np.ravel(ax.value_of(ax.param_from(gp)))
    k = int(np.ravel(ax.value_of(pops)).size)
    if len(cuts) != k - 1:
        raise XmlError(
            f"NP coalescent: {k} cells but {len(cuts)} grid points")
    trees = []
    for pt in el.findall("populationTree"):
        for t in pt:
            trees.append(ax.build(ax.deref(t)))
    if not trees:
        raise XmlError("multiLocusNPCoalescentLikelihood without tree")
    cuts_j = jnp.asarray(cuts)

    def fn(params, tree):
        gamma = jnp.ravel(params[pops])
        ll = jnp.asarray(0.0, tree.heights.dtype)
        for tm in trees:
            tr = ax.resolve_tree(tm.tree_id, params, tree)
            ll = ll + skygrid_loglik(
                tr.heights, len(tm.taxa), gamma,
                cuts_j.astype(tr.heights.dtype))
        return ll

    return LikelihoodFn(fn, trees[0].tree_id,
                        el.get("id") or "npCoalescent", (pops,))


@register("multilocusNPCoalescentLikelihoodGradient")
def _np_coalescent_gradient(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.config.xml_hmc import GradientSpec

    lik = None
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("multiLocusNPCoalescentLikelihood",
                      "multilocusNPCoalescentLikelihood"):
            lik = ax.build(cc)
        elif cc.tag == "parameter":
            obj = ax.build(cc)
            if hasattr(obj, "name"):
                names.append(obj.name)
    if lik is None:
        raise XmlError("gradient without NP coalescent child")
    return GradientSpec(tuple(names), (lik,))


# ---------------------------------------------------------------------------
# GP prediction (posterior mean/variance at new design points)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GpPrediction:
    """ref: gp/GaussianProcessPrediction.java — predictive
    mean = K*o (Koo + noise I)^-1 y and
    cov = K** - K*o (Koo + noise I)^-1 Ko* summed over the additive
    bases, each prediction basis paired with the matching GP basis."""

    field_param: str = ""
    dist: object = None
    pred_designs: tuple = ()

    def _cross(self, kfn, a, b, length):
        if kfn is None:  # dotProduct
            return np.outer(a, b)
        d2 = (a[:, None] - b[None, :]) ** 2
        return np.asarray(kfn(jnp.asarray(d2), length))

    def report(self, ax) -> str:
        from beast_mcmc_tpu.config.xml_assert import (
            _vec,
            initial_eval_state,
        )

        params0, _ = initial_eval_state(ax)
        y = np.ravel(np.asarray(params0[self.field_param]))
        n = self.dist.dim
        m = len(np.ravel(self.pred_designs[0]))
        koo = np.zeros((n, n))
        kpo = np.zeros((m, n))
        kpp = np.zeros((m, m))
        for (basis, pred) in zip(self.dist.bases, self.pred_designs):
            design, kfn, scale_n, length_n, wfn, ortho = basis
            xs = np.ravel(np.asarray(params0[design]))[:n]
            ps = np.ravel(pred)
            s = (float(np.ravel(np.asarray(params0[scale_n]))[0])
                 if scale_n else 1.0)
            ln = (float(np.ravel(np.asarray(params0[length_n]))[0])
                  if length_n else 1.0)
            koo += s * self._cross(kfn, xs, xs, ln)
            kpo += s * self._cross(kfn, ps, xs, ln)
            kpp += s * self._cross(kfn, ps, ps, ln)
        if self.dist.nugget is not None:
            koo += float(np.ravel(
                np.asarray(params0[self.dist.nugget]))[0]) * np.eye(n)
        sol = np.linalg.solve(koo, y)
        mean = kpo @ sol
        cov = kpp - kpo @ np.linalg.solve(koo, kpo.T)
        return f"mean: {_vec(mean)}\nvariance: {_vec(cov)}\n"


@register("gaussianProcessPrediction")
def _gp_prediction(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.config.interpreter import _text_values

    fname, dist = None, None
    preds = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            fname = ax.param_from(cc)
        elif cc.tag in ("additiveGaussianProcessDistribution",
                        "gaussianProcessField"):
            dist = ax.build(cc)
        elif cc.tag == "bases":
            for d in cc:
                dd = ax.deref(d)
                if dd.tag == "designMatrix":
                    for p in dd:
                        pp = ax.deref(p)
                        if pp.tag == "parameter":
                            preds.append(
                                _text_values(pp) if pp.get("value")
                                else np.ravel(ax.value_of(
                                    ax.param_from(pp))))
    if fname is None or dist is None or not preds:
        raise XmlError("gaussianProcessPrediction structure")
    return GpPrediction(fname, dist, tuple(preds))


def _gp_field_report(ax, el):
    """precision report (ref: AdditiveGaussianProcessDistribution.
    getReport — inverse of the assembled covariance)."""
    from beast_mcmc_tpu.config.xml_assert import _vec, initial_eval_state

    dist = ax.build(el)
    params0, tree0 = initial_eval_state(ax)
    # reuse logpdf's covariance by differentiating is overkill: rebuild
    # through a probe — logpdf at unit vectors gives the quadratic form,
    # but the bases are stored, so assemble directly
    n = dist.dim
    import jax

    def neg2_logdens(x):
        return dist.logpdf(params0, tree0, x)

    # Hessian of the log-density is -Precision (exact for a Gaussian)
    hess = jax.hessian(neg2_logdens)(jnp.zeros(n, jnp.float64))
    prec = -np.asarray(hess)
    return f"precision: {_vec(prec)}\n"


from beast_mcmc_tpu.config.xml_hmc import OP_REPORTS as _OPR_FIELD  # noqa: E402

_OPR_FIELD["gaussianProcessField"] = _gp_field_report
