"""XML vocabulary: marginal-likelihood estimation pipeline.

  - <normalReferencePrior> / <logTransformedNormalReferencePrior>
    (ref: src/dr/inference/distribution/WorkingPriorParsers.java —
    working priors fitted to a previous chain's log file)
  - <marginalLikelihoodEstimator> (ref: src/dr/inference/mcmc/
    MarginalLikelihoodEstimator.java:55-185 — annealed path chains;
    executed by XmlAnalysis.run)
  - <pathSamplingAnalysis> / <steppingStoneSamplingAnalysis> /
    <generalizedSteppingStoneSamplingAnalysis> (ref: src/dr/
    inference/trace/*SamplingAnalysis.java — trace-side estimators over
    the MLE log file; validated against the analytic −32.56001 oracle of
    testGeneralizedSamplingStoneHmcMultivariateDiffusion.xml)
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.config.interpreter import (
    LikelihoodFn,
    Unsupported,
    XmlAnalysis,
    XmlError,
    _attr,
    register,
)


def _read_log(ax: XmlAnalysis, fname: str):
    """Read a tab log we wrote earlier this run: (names, array[T, C],
    states[T])."""
    path = os.path.join(ax.workdir, fname)
    with open(path) as fh:
        lines = [l.rstrip("\n") for l in fh if l.strip()
                 and not l.startswith("#")]
    names = lines[0].split("\t")
    rows = np.array([[float(x) for x in l.split("\t")]
                     for l in lines[1:]])
    return names, rows


def _ref_prior(ax: XmlAnalysis, el, log_space: bool):
    pname = ax.param_from(el)
    fname = el.get("fileName")
    dim = _attr(el, "dimension", 1, int)
    burnin = _attr(el, "burnin", 0, int)
    col = el.get("parameterColumn")
    names, rows = _read_log(ax, fname)
    states = rows[:, 0] if names[0].lower() in ("state", "states") else None
    cols = [i for i, nm in enumerate(names)
            if nm == col or (nm.startswith(col)
                             and nm[len(col):].isdigit())]
    if not cols:
        raise Unsupported(f"reference prior column {col!r} not in {fname}")
    data = rows[:, cols]
    if states is not None and burnin > 0:
        keep = states > burnin * ax.scale
        if keep.sum() >= 2:
            data = data[keep]
    if log_space:
        fit = np.log(np.maximum(data, 1e-300))
    else:
        fit = data
    mu = fit.mean(axis=0)
    sd = np.maximum(fit.std(axis=0, ddof=1), 1e-8)

    def fn(params, tree):
        x = jnp.ravel(params[pname])
        m = jnp.asarray(mu, x.dtype)
        s = jnp.asarray(sd, x.dtype)
        if log_space:
            lx = jnp.log(x)
            return jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - jnp.log(s)
                           - 0.5 * jnp.square((lx - m) / s) - lx)
        return jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - jnp.log(s)
                       - 0.5 * jnp.square((x - m) / s))

    return LikelihoodFn(fn, None, el.get("id") or "workingPrior",
                        (pname,))


@register("normalReferencePrior")
def _normal_reference_prior(ax: XmlAnalysis, el):
    return _ref_prior(ax, el, log_space=False)


@register("logTransformedNormalReferencePrior")
def _log_normal_reference_prior(ax: XmlAnalysis, el):
    return _ref_prior(ax, el, log_space=True)


def run_marginal_likelihood_estimator(ax: XmlAnalysis, el):
    """Execute <marginalLikelihoodEstimator>: one tempered chain per path
    step, writing the pathLikelihood (source/destination/theta) trace."""
    from beast_mcmc_tpu.config.xml_assert import initial_eval_state
    from beast_mcmc_tpu.inference.marginal_likelihood import (
        beta_quantile_schedule,
    )
    from beast_mcmc_tpu.inference.mcmc import (
        init_mcmc_state,
        make_mcmc_step,
        run_chain,
    )

    cl_decl = _attr(el, "chainLength", 1000, int)
    # per-rung chains are short by design; run small ones in full so the
    # bridging estimates actually converge (the corpus asserts 1e-1)
    chain_length = max(int(cl_decl * ax.scale), min(cl_decl, 1024))
    path_steps = _attr(el, "pathSteps", 11, int)
    alpha = _attr(el, "alpha", 0.3, float)
    betas = beta_quantile_schedule(path_steps, alpha)

    samplers = el.find("samplers")
    mcmc_el = ax.deref(next(iter(samplers)))
    post = ax._posterior_of(mcmc_el)
    ops_el = mcmc_el.find("operators")
    operators, _tids = ax.build(ax.deref(ops_el))

    pl_el = el.find("pathLikelihood")
    plid = pl_el.get("id") or "pathLikelihood"
    src_el = pl_el.find("source")
    src = ax.build(ax.deref(next(iter(src_el))))
    dest_el = pl_el.find("destination")
    dest_parts: List[LikelihoodFn] = []
    for c in dest_el:
        cc = ax.deref(c)
        if cc.tag == "workingPrior":
            for d in cc:
                dest_parts.append(ax.build(ax.deref(d)))
        else:
            dest_parts.append(ax.build(cc))
    if not dest_parts:
        raise XmlError("pathLikelihood without destination")

    def dest_fn(params, tree):
        return sum(p.fn(params, tree) for p in dest_parts)

    # the MLE log file
    fname = None
    log_every = 1
    for lg in el.findall("log"):
        if lg.get("fileName"):
            fname = lg.get("fileName")
            log_every = max(1, int(_attr(lg, "logEvery", 500, int)
                                   * ax.scale))
    params0, tree0 = initial_eval_state(ax)

    rows = []
    key = jax.random.PRNGKey(ax.seed)
    state = None
    for b in betas:
        bb = float(b)

        def lp(params, tree, _b=bb):
            return (_b * src.fn(params, tree)
                    + (1.0 - _b) * dest_fn(params, tree))

        step = make_mcmc_step(lp, operators)
        key, k2 = jax.random.split(key)
        if state is None:
            state = init_mcmc_state(params0, tree0, k2, operators, lp,
                                    dtype=ax.dtype)
        else:
            from beast_mcmc_tpu.utils.accum import accum_dtype

            state = state.replace(
                key=k2,
                log_posterior=jnp.asarray(
                    lp(state.params, state.tree), accum_dtype()))

        def collector(s):
            return {"src": src.fn(s.params, s.tree),
                    "dst": dest_fn(s.params, s.tree)}

        n_blocks = max(1, chain_length // log_every)
        state, trace = jax.jit(
            lambda s, _step=step: run_chain(
                _step, s, n_blocks * log_every, log_every, collector)
        )(state)
        src_v = np.asarray(trace["src"], float)
        dst_v = np.asarray(trace["dst"], float)
        for i in range(src_v.shape[0]):
            rows.append((bb, src_v[i], dst_v[i]))

    if fname:
        with open(os.path.join(ax.workdir, fname), "w") as fh:
            fh.write(f"state\t{plid}.theta\t{plid}.source\t"
                     f"{plid}.destination\n")
            for i, (th, sv, dv) in enumerate(rows):
                fh.write(f"{i}\t{float(th)!r}\t{float(sv)!r}\t"
                         f"{float(dv)!r}\n")
    ax._mle_rows = getattr(ax, "_mle_rows", {})
    ax._mle_rows[fname or plid] = rows
    ax._mcmc_ran = True


@dataclasses.dataclass
class _MlAnalysis:
    kind: str = "gss"       # gss | ps | ss
    fname: str = ""
    theta_col: str = ""
    source_col: str = ""
    dest_col: str = ""
    lik_col: str = ""

    def estimate(self, ax) -> float:
        from beast_mcmc_tpu.inference.marginal_likelihood import (
            generalized_stepping_stone_logml,
            path_sampling_logml,
            stepping_stone_logml,
        )

        names, rows = _read_log(ax, self.fname)

        def col(cname):
            for i, nm in enumerate(names):
                if nm == cname:
                    return rows[:, i]
            raise Unsupported(f"column {cname!r} not in {self.fname}")

        theta = col(self.theta_col)
        uniq = sorted(set(theta.tolist()))
        if self.kind == "gss":
            lr = np.stack([
                col(self.source_col)[theta == t]
                - col(self.dest_col)[theta == t]
                for t in uniq])
            return generalized_stepping_stone_logml(lr, uniq)
        ll = np.stack([col(self.lik_col)[theta == t] for t in uniq])
        if self.kind == "ps":
            return path_sampling_logml(ll, uniq)
        return stepping_stone_logml(ll, uniq)

    def report(self, ax) -> str:
        v = self.estimate(ax)
        label = {"gss": "generalized stepping stone sampling",
                 "ps": "path sampling",
                 "ss": "stepping stone sampling"}[self.kind]
        return f"log marginal likelihood (using {label}) = {float(v)!r}\n"


@register("generalizedSteppingStoneSamplingAnalysis")
def _gss_analysis(ax: XmlAnalysis, el):
    def colname(tag, default):
        c = el.find(tag)
        return c.get("name") if c is not None else default

    return _MlAnalysis(
        "gss", el.get("fileName"),
        colname("thetaColumn", "theta"),
        colname("sourceColumn", "source"),
        colname("destinationColumn", "destination"))


@register("pathSamplingAnalysis", "steppingStoneSamplingAnalysis")
def _ps_analysis(ax: XmlAnalysis, el):
    kind = "ps" if el.tag.startswith("path") else "ss"

    def colname(tag, default):
        c = el.find(tag)
        return c.get("name") if c is not None else default

    return _MlAnalysis(
        kind, el.get("fileName"),
        colname("thetaColumn", "pathLikelihood.theta"),
        "", "", colname("likelihoodColumn", "pathLikelihood.delta"))
