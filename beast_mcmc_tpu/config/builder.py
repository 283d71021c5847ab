"""Spec -> runnable analysis (the XMLParser.convert role).

build(spec) walks the AnalysisSpec, registers parameters, composes the
log-posterior as a pure function of (params, tree), and generates the
default operator schedule (the role BEAUti's generator plays for XML,
ref: src/dr/app/beauti/generator/OperatorsGenerator.java — weights and
operator kinds follow the reference's defaults).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.config import spec as S
from beast_mcmc_tpu.inference import operators as O
from beast_mcmc_tpu.models import clock as clock_models
from beast_mcmc_tpu.models import coalescent as coal
from beast_mcmc_tpu.models import priors as P
from beast_mcmc_tpu.models import sitemodel as sm
from beast_mcmc_tpu.models import speciation as spn
from beast_mcmc_tpu.models import substitution as subst
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.ops.peeling import pad_patterns
from beast_mcmc_tpu.tree.topology import (
    make_tree_state,
    parse_newick,
    simulate_coalescent_tree,
)


@dataclasses.dataclass
class Analysis:
    log_posterior: Callable
    log_likelihood: Callable
    log_prior: Callable
    operators: List[O.Operator]
    params0: Dict[str, jnp.ndarray]
    tree0: Any
    taxa: List[str]
    spec: S.AnalysisSpec
    n_taxa: int


def _prior_logpdf(prior, value, aux):
    if prior is None:
        return 0.0
    if isinstance(prior, S.LogNormalPrior):
        return P.lognormal_logpdf(value, prior.mu, prior.sigma)
    if isinstance(prior, S.NormalPrior):
        return P.normal_logpdf(value, prior.mean, prior.stdev)
    if isinstance(prior, S.GammaPrior):
        return P.gamma_logpdf(value, prior.shape, prior.scale)
    if isinstance(prior, S.ExponentialPrior):
        return P.exponential_logpdf(value, prior.mean)
    if isinstance(prior, S.UniformPrior):
        return P.uniform_logpdf(value, prior.lower, prior.upper)
    if isinstance(prior, S.OneOnXPrior):
        return P.one_on_x_logpdf(value)
    if isinstance(prior, S.DirichletPrior):
        alpha = jnp.broadcast_to(jnp.asarray(prior.alpha), jnp.shape(value))
        return P.dirichlet_logpdf(value, alpha)
    if isinstance(prior, S.CTMCScalePrior):
        return P.ctmc_scale_logpdf(value, aux["tree_length"])
    raise TypeError(f"unknown prior {prior!r}")


class _Registry:
    """Collects parameters, their priors, and default operators."""

    def __init__(self, dtype):
        self.params0: Dict[str, jnp.ndarray] = {}
        self.fixed: Dict[str, jnp.ndarray] = {}
        self.priors: List[Tuple[str, Any]] = []
        self.operators: List[O.Operator] = []
        self.dtype = dtype

    def add(self, name: str, p: S.Param, op: str = "scale") -> str:
        """Register a Param; returns its name. Fixed params are folded."""
        val = jnp.asarray(p.init, self.dtype)
        if not p.estimate:
            self.fixed[name] = val
            return name
        self.params0[name] = val
        if p.prior is not None:
            self.priors.append((name, p.prior))
        w = p.operator_weight
        if w > 0:
            if op == "scale":
                self.operators.append(
                    O.ScaleOperator(parameter=name, weight=w,
                                    lower=p.lower, upper=p.upper))
            elif op == "walk":
                self.operators.append(
                    O.RandomWalkOperator(parameter=name, weight=w,
                                         lower=p.lower, upper=p.upper))
            elif op == "delta":
                self.operators.append(
                    O.DeltaExchangeOperator(parameter=name, weight=w))
            elif op == "none":
                pass
        return name

    def get(self, params: Dict, name: str):
        if name in self.fixed:
            return self.fixed[name]
        return params[name]


def build(spec: S.AnalysisSpec) -> Analysis:
    import beast_mcmc_tpu.utils.dtypes as dtypes

    dtype = spec.dtype or dtypes.default_float()
    if not spec.partitions:
        raise ValueError("analysis needs at least one partition")
    taxa = spec.partitions[0].patterns.taxa
    for part in spec.partitions[1:]:
        if part.patterns.taxa != taxa:
            raise ValueError("all partitions must share the taxon set")
    n_taxa = len(taxa)

    reg = _Registry(dtype)

    # ---- starting tree -------------------------------------------------
    if spec.tree.tip_heights:
        tip_heights = np.asarray(
            [spec.tree.tip_heights.get(t, 0.0) for t in taxa])
    else:
        tip_heights = np.zeros(n_taxa)
    if spec.tree.newick:
        th = (dict(zip(taxa, tip_heights.tolist()))
              if spec.tree.tip_heights else None)
        parent, children, heights, root, t_order = parse_newick(
            spec.tree.newick, taxa=taxa, tip_heights=th)
    else:
        rng = np.random.default_rng(spec.tree.seed)
        parent, children, heights, root = simulate_coalescent_tree(
            rng, tip_heights, spec.tree.sim_pop_size)
    tree0 = make_tree_state(parent, children, heights, root, dtype)
    m = 2 * n_taxa - 1

    # ---- partitions: substitution + site models ------------------------
    partition_fns = []
    for pi, part in enumerate(spec.partitions):
        pname = part.name if part.name != "partition" else f"p{pi + 1}"
        pats = part.patterns
        if part.use_ambiguities:
            tips_np = np.swapaxes(pats.tip_partials(np.float64), 1, 2)
        else:
            # states path: ambiguity codes collapse to fully-missing
            table = np.concatenate(
                [np.eye(pats.datatype.state_count),
                 np.ones((1, pats.datatype.state_count))], axis=0)
            tips_np = np.swapaxes(
                table[pats.tip_states_unambiguous()], 1, 2)
        tips = jnp.asarray(tips_np, dtype)
        weights = jnp.asarray(pats.weights, dtype)
        tips, weights = pad_patterns(tips, weights, 128)

        sub = part.substitution
        if isinstance(sub, (S.HKY, S.TN93, S.GTR)):
            if isinstance(sub.frequencies, str):
                if sub.frequencies == "empirical":
                    freqs = jnp.asarray(pats.empirical_frequencies(), dtype)
                else:
                    k = pats.datatype.state_count
                    freqs = jnp.full((k,), 1.0 / k, dtype)
            else:
                freqs = jnp.asarray(sub.frequencies, dtype)
        elif isinstance(sub, S.JC69):
            freqs = jnp.full((4,), 0.25, dtype)
        elif isinstance(sub, S.GeneralReversible):
            k = sub.n_states
            freqs = (jnp.full((k,), 1.0 / k, dtype)
                     if isinstance(sub.frequencies, str)
                     else jnp.asarray(sub.frequencies, dtype))

        if isinstance(sub, S.HKY):
            kappa_name = reg.add(f"{pname}.kappa", sub.kappa)
            eig_fn = lambda prm, kn=kappa_name, f=freqs: subst.hky_eigen(
                reg.get(prm, kn), f)
        elif isinstance(sub, S.TN93):
            k1n = reg.add(f"{pname}.kappa1", sub.kappa1)
            k2n = reg.add(f"{pname}.kappa2", sub.kappa2)
            eig_fn = lambda prm, a=k1n, b=k2n, f=freqs: subst.tn93_eigen(
                reg.get(prm, a), reg.get(prm, b), f)
        elif isinstance(sub, S.GTR):
            rn = reg.add(f"{pname}.gtr.rates", sub.rates)
            eig_fn = lambda prm, rn=rn, f=freqs: subst.gtr_eigen(
                reg.get(prm, rn), f)
        elif isinstance(sub, S.JC69):
            eig0 = subst.jc_eigen(dtype=dtype)
            eig_fn = lambda prm, e=eig0: e
        elif isinstance(sub, S.GeneralReversible):
            k = sub.n_states
            n_r = k * (k - 1) // 2
            rp = sub.rates or S.Param(
                np.ones(n_r), prior=S.GammaPrior(1.0, 1.0), operator_weight=2.0)
            rn = reg.add(f"{pname}.rates", rp)
            if sub.bssvs:
                ind0 = jnp.ones((n_r,), jnp.int32)
                reg.params0[f"{pname}.indicators"] = ind0
                reg.operators.append(O.BitFlipOperator(
                    parameter=f"{pname}.indicators", weight=3.0))

                def eig_fn(prm, rn=rn, f=freqs, iname=f"{pname}.indicators"):
                    masked = subst.svs_masked_rates(
                        reg.get(prm, rn), prm[iname].astype(f.dtype))
                    return subst.general_reversible_eigen(masked, f)
            else:
                eig_fn = lambda prm, rn=rn, f=freqs: (
                    subst.general_reversible_eigen(reg.get(prm, rn), f))
        else:
            raise TypeError(f"unknown substitution model {sub!r}")

        # site model
        smod = part.site_model
        mu_name = None
        if smod.mu is not None:
            mu_name = reg.add(f"{pname}.mu", smod.mu)
        alpha_name = (reg.add(f"{pname}.alpha", smod.alpha)
                      if smod.alpha is not None else None)
        pinv_name = (reg.add(f"{pname}.pInv", smod.p_invariant, op="walk")
                     if smod.p_invariant is not None else None)
        n_cats = smod.categories

        def rates_fn(prm, an=alpha_name, pn=pinv_name, mn=mu_name, nc=n_cats):
            mu = reg.get(prm, mn) if mn else None
            if an is not None:
                return sm.discrete_gamma_rates(
                    reg.get(prm, an), nc,
                    p_invariant=reg.get(prm, pn) if pn else None,
                    mu=mu, dtype=dtype)
            if pn is not None:
                return sm.invariant_only_rates(reg.get(prm, pn), mu, dtype)
            return sm.single_rate(mu, dtype)

        partition_fns.append((tips, weights, freqs, eig_fn, rates_fn))

    # ---- clock ---------------------------------------------------------
    if isinstance(spec.clock, S.StrictClock):
        rate_name = reg.add("clock.rate", spec.clock.rate)

        def branch_rates_fn(prm, tree, rn=rate_name):
            return jnp.broadcast_to(jnp.asarray(reg.get(prm, rn), dtype), (m,))

        clock_estimated = spec.clock.rate.estimate
    elif isinstance(spec.clock, S.RelaxedClockLognormal):
        mean_name = reg.add("ucld.mean", spec.clock.mean)
        std_name = reg.add("ucld.stdev", spec.clock.stdev)
        n_cats_clock = m - 1  # one category per branch (reference default)
        cats0 = np.arange(m) % n_cats_clock
        reg.params0["branchRates.categories"] = jnp.asarray(cats0, jnp.int32)
        reg.operators.append(O.UniformIntegerOperator(
            parameter="branchRates.categories", weight=10.0,
            lower=0, upper=n_cats_clock - 1))
        reg.operators.append(O.SwapOperator(
            parameter="branchRates.categories", weight=10.0))

        def branch_rates_fn(prm, tree, mn=mean_name, sn=std_name, nc=n_cats_clock):
            return clock_models.discretized_lognormal_rates(
                prm["branchRates.categories"], reg.get(prm, mn),
                reg.get(prm, sn), n_categories=nc).astype(dtype)

        clock_estimated = spec.clock.mean.estimate
    else:
        raise TypeError(f"unknown clock {spec.clock!r}")

    # ---- tree prior ------------------------------------------------------
    tp = spec.tree_prior
    if isinstance(tp, S.ConstantCoalescent):
        ps_name = reg.add("constant.popSize", tp.pop_size)

        def tree_prior_fn(prm, tree):
            return coal.constant_coalescent_loglik(
                tree.heights, n_taxa, reg.get(prm, ps_name))
    elif isinstance(tp, S.ExponentialGrowthCoalescent):
        ps_name = reg.add("exponential.popSize", tp.pop_size)
        gr_name = reg.add("exponential.growthRate", tp.growth_rate, op="walk")

        def tree_prior_fn(prm, tree):
            return coal.exponential_growth_loglik(
                tree.heights, n_taxa, reg.get(prm, ps_name), reg.get(prm, gr_name))
    elif isinstance(tp, S.SkygridCoalescent):
        cells = tp.n_cells
        cuts = jnp.asarray(
            np.linspace(0, tp.cutoff, cells)[1:], dtype)
        reg.params0["skygrid.logPopSizes"] = jnp.full(
            (cells,), tp.log_pop_init, dtype)
        reg.operators.append(O.RandomWalkOperator(
            parameter="skygrid.logPopSizes", weight=10.0,
            lower=-float("inf"), upper=float("inf"), window=0.5))
        prec_name = reg.add("skygrid.precision", tp.precision)

        def tree_prior_fn(prm, tree):
            g = prm["skygrid.logPopSizes"]
            return (coal.skygrid_loglik(tree.heights, n_taxa, g, cuts)
                    + coal.gmrf_log_prior(g, reg.get(prm, prec_name)))
    elif isinstance(tp, S.YulePrior):
        br_name = reg.add("yule.birthRate", tp.birth_rate)

        def tree_prior_fn(prm, tree):
            return spn.yule_loglik(
                tree.heights, n_taxa, tree.root, reg.get(prm, br_name))
    elif isinstance(tp, S.BirthDeathPrior):
        bd_name = reg.add("birthDeath.meanGrowthRate", tp.birth_diff_rate)
        dr_name = reg.add("birthDeath.relativeDeathRate", tp.relative_death_rate)

        def tree_prior_fn(prm, tree):
            return spn.birth_death_loglik(
                tree.heights, n_taxa, tree.root,
                reg.get(prm, bd_name), reg.get(prm, dr_name))
    else:
        raise TypeError(f"unknown tree prior {tp!r}")

    # ---- default tree operators (BEAUti-style weights) -------------------
    reg.operators.extend([
        O.UniformNodeHeightOperator(weight=max(3.0, n_taxa / 2)),
        O.RootHeightScaleOperator(weight=3.0),
        O.NarrowExchangeOperator(weight=max(3.0, n_taxa / 2)),
        O.WideExchangeOperator(weight=3.0),
        O.WilsonBaldingOperator(weight=3.0),
    ])
    if clock_estimated:
        reg.operators.append(O.UpDownOperator(
            up=("clock.rate" if isinstance(spec.clock, S.StrictClock)
                else "ucld.mean",),
            down=(O.TREE_HEIGHTS,), weight=3.0))
    reg.operators.extend(spec.extra_operators)

    # ---- compose the posterior ------------------------------------------
    def log_likelihood(params, tree):
        branch_rates = branch_rates_fn(params, tree)
        total = jnp.asarray(0.0, dtype)
        for tips, weights, freqs, eig_fn, rates_fn in partition_fns:
            eig = eig_fn(params)
            rates, cat_w = rates_fn(params)
            total = total + tree_loglikelihood(
                tips, weights, tree.parent, tree.children, tree.heights,
                tree.root, eig, freqs, rates.astype(dtype),
                cat_w.astype(dtype), branch_rates)
        return total

    def log_prior(params, tree):
        aux = {"tree_length": _tree_length(tree)}
        total = tree_prior_fn(params, tree)
        for name, prior in reg.priors:
            total = total + _prior_logpdf(prior, params[name], aux)
        return total

    def log_posterior(params, tree):
        return log_likelihood(params, tree) + log_prior(params, tree)

    return Analysis(
        log_posterior=log_posterior,
        log_likelihood=log_likelihood,
        log_prior=log_prior,
        operators=reg.operators,
        params0=dict(reg.params0),
        tree0=tree0,
        taxa=list(taxa),
        spec=spec,
        n_taxa=n_taxa,
    )


def _tree_length(tree):
    pidx = jnp.maximum(tree.parent, 0)
    bl = jnp.where(tree.parent >= 0, tree.heights[pidx] - tree.heights, 0.0)
    return jnp.sum(bl)
