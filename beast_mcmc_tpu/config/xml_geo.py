"""XML vocabulary: general data types, general/log-rate substitution
models, attribute patterns, and sequence simulation — the discrete
phylogeography (BSSVS / Makona-class) surface.

Vocabulary (reference parsers cited per builder):
  generalDataType           (dr.evoxml.GeneralDataTypeParser:45)
  attributePatterns         (dr.evoxml.AttributePatternsParser)
  generalSubstitutionModel  (GeneralSubstitutionModelParser.java:47)
  svsGeneralSubstitutionModel (same parser, BSSVS branch)
  complexSubstitutionModel  (ComplexSubstitutionModelParser)
  logRateSubstitutionModel  (LogRateSubstitutionModelParser)
  beagleSequenceSimulator   (dr.app.beagle.tools.parsers.
                             BeagleSequenceSimulatorParser)
"""

from __future__ import annotations

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
    register,
)


# ---------------------------------------------------------------------------
# general data type
# ---------------------------------------------------------------------------


@register("generalDataType")
def _general_data_type(ax: XmlAnalysis, el):
    """ref: GeneralDataTypeParser — explicit state alphabet with
    optional ambiguities and aliases."""
    from beast_mcmc_tpu.data.datatype import DataType

    codes: List[str] = []
    ambiguities = []  # (code char, tuple of member chars)
    aliases = []  # (alias char, state char)
    for c in el:
        if c.tag == "state":
            codes.append(c.get("code"))
        elif c.tag == "ambiguity":
            states = c.get("states") or ""
            ambiguities.append((c.get("code"), tuple(states)))
        elif c.tag == "alias":
            aliases.append((c.get("code"), c.get("state")))
    if not codes:
        raise XmlError("generalDataType without states")
    k = len(codes)
    char_map = {ch.upper(): i for i, ch in enumerate(codes)}
    state_sets = [(i,) for i in range(k)]
    code_chars = list(codes)
    for ch, st in aliases:
        char_map[ch.upper()] = char_map[st.upper()]
    for ch, members in ambiguities:
        ss = tuple(sorted(char_map[m.upper()] for m in members)) if members \
            else tuple(range(k))
        char_map[ch.upper()] = len(state_sets)
        state_sets.append(ss)
        code_chars.append(ch)
    # the fully-ambiguous code for '?' / '-'
    full = tuple(range(k))
    for ch in ("?", "-"):
        if ch not in char_map:
            char_map[ch] = len(state_sets)
            state_sets.append(full)
            code_chars.append(ch)
    return DataType(
        name=el.get("id") or "general",
        state_count=k,
        char_map=char_map,
        state_sets=tuple(state_sets),
        code_chars=tuple(code_chars),
    )


@register("attributePatterns")
def _attribute_patterns(ax: XmlAnalysis, el):
    """ref: AttributePatternsParser — one-column patterns from a taxon
    attribute (the discrete-trait data path: location, host, ...)."""
    from beast_mcmc_tpu.data.alignment import SitePatterns

    attr = el.get("attribute")
    dt = None
    taxa = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "generalDataType":
            dt = ax.build(cc)
        elif cc.tag == "taxa":
            taxa = ax.build(cc)
    if dt is None or taxa is None or attr is None:
        raise XmlError("attributePatterns needs attribute + taxa + dataType")
    names = [n for n, _ in taxa]
    states = np.zeros((len(names), 1), np.int16)
    for i, nm in enumerate(names):
        vals = ax._taxon_attrs.get(nm, {}).get(attr)
        if vals is None:
            raise XmlError(f"taxon {nm!r} has no attribute {attr!r}")
        states[i, 0] = dt.encode(" ".join(vals).strip())[0] if len(
            " ".join(vals).strip()) == 1 else dt.char_map.get(
            " ".join(vals).strip().upper(), dt.unknown_code)
    return SitePatterns(
        taxa=names, states=states, weights=np.ones(1), datatype=dt,
        n_sites=1,
    )


# ---------------------------------------------------------------------------
# general substitution models
# ---------------------------------------------------------------------------


def _freq_model_of(ax, el, tag="frequencies"):
    """Frequency param name from a <frequencies>/<rootFrequencies> child
    wrapping a frequencyModel (or a bare parameter)."""
    fq = el.find(tag)
    if fq is None:
        return None
    for c in fq:
        cc = ax.deref(c)
        if cc.tag == "frequencyModel":
            return ax.build(cc)
    return ax.param_from(fq)


def _complex_q_fn(ax, rates_of, fname, k, normalize=True,
                  scale_by_freqs=True):
    """(params -> Q [k,k]) with the reference's complex ordering: first
    the upper triangle row-major, then the lower triangle in transposed
    (column-major) order (ref: ComplexSubstitutionModel.setupQMatrix:211-
    230); normalized to mean rate 1 under pi."""
    iu = np.triu_indices(k, 1)
    il_t = (iu[1], iu[0])  # transposed order for the lower block

    def q_fn(params):
        r = rates_of(params)
        dt = r.dtype
        pi = params[fname]
        pi = pi / jnp.sum(pi)
        n_half = k * (k - 1) // 2
        q = jnp.zeros((k, k), dt)
        col = pi if scale_by_freqs else jnp.ones(k, dt)
        q = q.at[iu].set(r[:n_half] * col[iu[1]])
        if r.shape[0] == k * (k - 1):
            q = q.at[il_t].set(r[n_half:] * col[il_t[1]])
        else:
            q = q.at[il_t].set(r[:n_half] * col[il_t[1]])
        q = q - jnp.diag(jnp.sum(q, axis=1))
        if normalize:
            norm = -jnp.sum(pi * jnp.diagonal(q))
            q = q / norm
        return q

    return q_fn


@register("generalSubstitutionModel", "svsGeneralSubstitutionModel")
def _general_substitution_model(ax: XmlAnalysis, el):
    """ref: GeneralSubstitutionModelParser.java:47 — reversible
    (K(K-1)/2 rates) or non-reversible (K(K-1)) general CTMC, with the
    BSSVS rateIndicator mask (ref: SVSGeneralSubstitutionModel)."""
    dt_obj = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "generalDataType":
            dt_obj = ax.build(cc)
    fname = _freq_model_of(ax, el)
    if fname is None:
        fname = _freq_model_of(ax, el, "rootFrequencies")
    if fname is None:
        raise XmlError("generalSubstitutionModel without frequencies")
    k = dt_obj.state_count if dt_obj is not None else int(
        np.ravel(ax.value_of(fname)).size)
    rates_el = el.find("rates")
    if rates_el is None:
        raise XmlError("generalSubstitutionModel without rates")
    if rates_el.get("relativeTo"):
        raise Unsupported("generalSubstitutionModel relativeTo rates")
    rname = ax.param_from(rates_el)
    n_rates = int(np.ravel(ax.value_of(rname)).size)
    n_half = k * (k - 1) // 2
    if n_rates not in (n_half, 2 * n_half):
        raise XmlError(
            f"rates dimension {n_rates}, need {n_half} or {2 * n_half}")
    ind_el = el.find("rateIndicator")
    iname = ax.param_from(ind_el) if ind_el is not None else None

    def rates_of(params):
        r = jnp.ravel(params[rname])
        if iname is not None:
            r = r * jnp.ravel(params[iname])
        return r

    reversible = n_rates == n_half and iname is None

    def freqs(params):
        f = params[fname]
        return f / jnp.sum(f)

    if iname is not None:
        # BSSVS bookkeeping for the connectivity prior + rate statistics
        ax._svs_models = getattr(ax, "_svs_models", {})
        ax._svs_models[el.get("id") or "svs"] = (rname, iname, k, n_rates)
    if reversible:
        from beast_mcmc_tpu.models.substitution import (
            general_reversible_eigen,
        )

        def eigen(params):
            return general_reversible_eigen(rates_of(params), freqs(params))

        return ("subst", eigen, freqs, k)
    q_fn = _complex_q_fn(ax, rates_of, fname, k)
    return ("subst_q", q_fn, freqs, k)


def svs_connectivity_prior(ax, el_id: str):
    """ref: SVSGeneralSubstitutionModel.getLogLikelihood():111-115 — the
    BSSVS indicator configuration must keep the rate graph connected
    (else -inf). Reachability via log2(K) boolean matrix squarings."""
    from beast_mcmc_tpu.config.interpreter import LikelihoodFn

    rname, iname, k, n_rates = ax._svs_models[el_id]
    iu = np.triu_indices(k, 1)
    n_half = k * (k - 1) // 2

    def fn(params, tree):
        ind = jnp.ravel(params[iname]) > 0.5
        adj = jnp.eye(k, dtype=bool)
        adj = adj.at[iu].set(ind[:n_half])
        adj = adj.at[(iu[1], iu[0])].set(
            ind[n_half:] if n_rates == 2 * n_half else ind[:n_half])
        if n_rates != 2 * n_half:
            # reversible case: the graph is undirected by construction
            adj = adj | adj.T
        # non-reversible: require all-pairs DIRECTED reachability (strong
        # connectivity), matching connectedAndWellConditioned's rejection
        # of weakly-connected indicator configurations
        steps = int(np.ceil(np.log2(max(k, 2))))
        for _ in range(steps):
            adj = jnp.einsum("ij,jk->ik", adj.astype(jnp.int32),
                             adj.astype(jnp.int32)) > 0
        ok = jnp.all(adj)
        return jnp.where(ok, 0.0, -jnp.inf)

    return LikelihoodFn(fn, None, f"{el_id}.connectivity")


@register("complexSubstitutionModel")
def _complex_substitution_model(ax: XmlAnalysis, el):
    """ref: ComplexSubstitutionModelParser — non-reversible K(K-1)-rate
    CTMC via the expm path."""
    return _general_substitution_model(ax, el)


@register("logRateSubstitutionModel")
def _log_rate_substitution_model(ax: XmlAnalysis, el):
    """ref: LogRateSubstitutionModelParser — rates = exp(logRates) in
    complex ordering; normalize + scaleRatesByFrequencies attrs."""
    fname = _freq_model_of(ax, el, "rootFrequencies")
    if fname is None:
        fname = _freq_model_of(ax, el)
    if fname is None:
        raise XmlError("logRateSubstitutionModel without rootFrequencies")
    k = int(np.ravel(ax.value_of(fname)).size)
    lr = el.find("logRates")
    if lr is None:
        # <rateProvider> form: rates come from a LogAdditiveCtmcRate
        # provider in REAL space (ref: LogRateSubstitutionModel.
        # setupRelativeRates :69-71 copies lrm.getRates() directly)
        rp = el.find("rateProvider")
        if rp is not None:
            provider = ax.build(ax.deref(next(iter(rp))))
            normalize = _attr(el, "normalize", True, bool)
            scale_by = _attr(el, "scaleRatesByFrequencies", True, bool)

            def freqs_p(params):
                f = params[fname]
                return f / jnp.sum(f)

            q_fn = _complex_q_fn(ax, provider.rates, fname, k,
                                 normalize, scale_by)
            return ("subst_q", q_fn, freqs_p, k)
        raise XmlError("logRateSubstitutionModel without logRates")
    lname = ax.param_from(lr)
    n = int(np.ravel(ax.value_of(lname)).size)
    if n != k * (k - 1):
        # reference sizes the parameter from the data type
        p = ax._params[lname]
        ax._params[lname] = Param(
            lname, np.resize(np.atleast_1d(p.value), k * (k - 1)),
            p.lower, p.upper)
    normalize = _attr(el, "normalize", True, bool)
    scale_by = _attr(el, "scaleRatesByFrequencies", True, bool)

    def rates_of(params):
        return jnp.exp(jnp.ravel(params[lname]))

    def freqs(params):
        f = params[fname]
        return f / jnp.sum(f)

    q_fn = _complex_q_fn(ax, rates_of, fname, k, normalize, scale_by)
    return ("subst_q", q_fn, freqs, k)


# ---------------------------------------------------------------------------
# GLM substitution models
# ---------------------------------------------------------------------------


@register("glmModel")
def _glm_model(ax: XmlAnalysis, el):
    """ref: GeneralizedLinearModelParser. family=logLinear (default):
    returns the rate-builder tuple for substitution models. family=
    logNormal: a regression LIKELIHOOD — dependent y ~ logNormal with
    log-mean X beta (indicator-masked) and the scaleVariables precision
    (models/regression.glm_loglik)."""
    from beast_mcmc_tpu.config.interpreter import (
        CompoundParam,
        _text_values,
    )

    family = el.get("family") or "logLinear"
    if family not in ("logLinear", "logNormal"):
        raise Unsupported(f"glmModel family {family!r}")
    design_cols = []
    ind = None
    blocks = el.findall("independentVariables")
    if not blocks:
        raise XmlError("glmModel without independentVariables")
    design_names = []
    coefs = []  # one coefficient vector per <independentVariables> block
    for iv in blocks:
        block_start = len(design_cols)
        coef = None
        for c in iv:
            cc = ax.deref(c)
            if cc.tag == "parameter":
                obj = ax.build(cc)
                coef = obj.name if hasattr(obj, "name") else coef
            elif cc.tag == "designMatrix":
                for p in cc:
                    pp = ax.deref(p)
                    if pp.tag == "parameter":
                        # LIVE column: missing (NA) covariates are
                        # filled + SAMPLED through a build="true"
                        # maskedParameter (ref:
                        # MaskedParameterParser.java:60-86), so the
                        # design must read from params at eval time
                        design_names.append(ax.param_from(pp))
                        design_cols.append(_text_values(pp))
            elif cc.tag in ("aminoAcidMixtureModel",
                            "substitutionRateMatrixMixtureModel"):
                # ref: AminoAcidMixture.java:50-66 /
                # SubstitutionRateMatrixMixture.java:50-84 — STATIC
                # design columns snapshotted at construction: one column
                # per component model, [log q_ij - log f_j]_{i<j}
                # followed by [log q_ji - log f_i]_{i<j} (for symmetric
                # empirical AA exchangeabilities both halves are log r,
                # ref uses the rates vector directly without frequency
                # weighting)
                for sm in cc:
                    ss = ax.deref(sm)
                    if ss.tag in ("aminoAcidModel",
                                  "empiricalAminoAcidModel"):
                        from beast_mcmc_tpu.models.data.aa_matrices import (
                            AA_MODELS,
                        )

                        r = np.asarray(
                            AA_MODELS[ss.get("type").upper()]["rates"],
                            float)
                        col = np.log(r)
                        design_cols.append(np.concatenate([col, col]))
                        design_names.append(None)
                        continue
                    obj = ax.build(ss)
                    if not (isinstance(obj, tuple)
                            and obj[0] == "subst"):
                        raise Unsupported(
                            f"mixture component <{ss.tag}>")
                    _, eigen_fn, freqs_fn, k_m = obj
                    p0 = {p.name: jnp.asarray(p.value)
                          for p in ax._params.values()}
                    es = eigen_fn(p0)
                    q0 = np.asarray(
                        es.U @ (es.values[..., None] * es.U_inv), float)
                    f0 = np.asarray(freqs_fn(p0), float)
                    iu = np.triu_indices(k_m, 1)
                    design_cols.append(np.concatenate([
                        np.log(q0[iu]) - np.log(f0[iu[1]]),
                        np.log(q0[(iu[1], iu[0])]) - np.log(f0[iu[0]]),
                    ]))
                    design_names.append(None)
            elif cc.tag == "indicator":
                ind = ax.param_from(cc)
        n_b = len(design_cols) - block_start
        if coef is None or n_b == 0:
            raise XmlError("glmModel needs coefficients + designMatrix")
        # ref: GeneralizedLinearModel.addIndependentParameter — a
        # scalar coefficient auto-expands to its block's column count
        if coef in ax._params:
            pv = np.ravel(ax._params[coef].value)
            if pv.size == 1 and n_b > 1:
                ax._params[coef].value = np.full(n_b, pv[0])
        coefs.append(coef)
    coef = coefs
    design = np.stack(design_cols, axis=1)  # [R, P]
    if family == "logLinear":
        return ("glm", (design, tuple(design_names)), tuple(coefs), ind)
    # logNormal regression likelihood
    dv = el.find("dependentVariables")
    if dv is None:
        raise XmlError("glmModel logNormal without dependentVariables")
    dep_obj = ax.build(ax.deref(next(iter(dv))))
    dep_names = (tuple(dep_obj.names) if isinstance(dep_obj, CompoundParam)
                 else (dep_obj.name,))
    sv = el.find("scaleVariables")
    prec_name = ax.param_from(sv) if sv is not None else None
    design_j = jnp.asarray(design)

    def fn(params, tree):
        y = jnp.concatenate(
            [jnp.ravel(params[n]) for n in dep_names])
        beta = jnp.concatenate(
            [jnp.ravel(params[c]) for c in coefs])
        if ind is not None:
            beta = beta * jnp.ravel(params[ind])
        mu = design_j.astype(y.dtype) @ beta
        tau = (jnp.ravel(params[prec_name])[0] if prec_name
               else jnp.asarray(1.0, y.dtype))
        ly = jnp.log(y)
        return jnp.sum(
            0.5 * jnp.log(tau) - 0.5 * jnp.log(2 * jnp.pi)
            - ly - 0.5 * tau * (ly - mu) ** 2)

    return LikelihoodFn(fn, None, el.get("id") or "glmModel",
                        dep_names)


@register("instantaneousMixtureSubstitutionModel")
def _instantaneous_mixture_subst(ax: XmlAnalysis, el):
    """ref: InstantaneousMixtureSubstitutionModel.java:90-192 — CTMC
    whose relative rates are the GEOMETRIC mixture of the component
    models' relative rates, exp(sum_m w_m log r_m) (upper then
    transposed lower ordering); a scalar weight means (p, 1-p). Raw
    component rates differ from q_ij/f_j only by a per-component global
    scale, which cancels under the final normalization."""
    w_name = None
    comps = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "mixtureWeights":
            w_name = ax.param_from(cc)
        elif cc.tag == "rootFrequencies":
            continue
        else:
            try:
                obj = ax.build(cc)
            except (Unsupported, XmlError):
                continue
            if isinstance(obj, tuple) and obj[0] in ("subst", "subst_q"):
                comps.append(obj)
    fname = _freq_model_of(ax, el, "rootFrequencies")
    if w_name is None or not comps or fname is None:
        raise XmlError("instantaneousMixtureSubstitutionModel structure")
    k = int(np.ravel(ax.value_of(fname)).size)
    iu = np.triu_indices(k, 1)

    def comp_log_rates(obj, params):
        if obj[0] == "subst":
            _, eigen_fn, freqs_fn, _k = obj
            es = eigen_fn(params)
            q = es.U @ (es.values[..., None] * es.U_inv)
        else:
            _, q_fn, freqs_fn, _k = obj
            q = q_fn(params)
        f = freqs_fn(params)
        upper = q[iu] / f[iu[1]]
        lower = q[(iu[1], iu[0])] / f[iu[0]]
        return jnp.log(jnp.concatenate([upper, lower]))

    def rates_of(params):
        w = jnp.ravel(params[w_name])
        if w.shape[0] == 1 and len(comps) == 2:
            w = jnp.concatenate([w, 1.0 - w])
        logr = jnp.stack(
            [comp_log_rates(o, params) for o in comps], axis=0)
        return jnp.exp(jnp.einsum("m,mr->r", w.astype(logr.dtype), logr))

    def freqs(params):
        f = params[fname]
        return f / jnp.sum(f)

    q_fn = _complex_q_fn(ax, rates_of, fname, k, True, True)
    return ("subst_q", q_fn, freqs, k)


@register("glmSubstitutionModel", "oldGLMSubstitutionModel")
def _glm_substitution_model(ax: XmlAnalysis, el):
    """ref: GLMSubstitutionModelParser — CTMC whose off-diagonal rates
    are exp(X beta) in the complex ordering (upper then transposed
    lower), root frequencies from the frequencyModel."""
    dt_obj = None
    glm = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "generalDataType":
            dt_obj = ax.build(cc)
        elif cc.tag == "glmModel":
            glm = ax.build(cc)
    fname = _freq_model_of(ax, el, "rootFrequencies")
    if fname is None:
        fname = _freq_model_of(ax, el)
    if fname is None or glm is None:
        raise XmlError("glmSubstitutionModel needs rootFrequencies+glmModel")
    k = dt_obj.state_count if dt_obj is not None else int(
        np.ravel(ax.value_of(fname)).size)
    _, design_pack, coefs, ind = glm
    design, design_names = design_pack
    normalize = _attr(el, "normalize", True, bool)
    n_rates = design.shape[0]

    design0 = jnp.asarray(design)

    def rates_of(params):
        beta = jnp.concatenate(
            [jnp.ravel(params[c]) for c in coefs])
        if ind is not None:
            beta = beta * jnp.ravel(params[ind])
        # name=None marks a STATIC column (mixture-model designs,
        # snapshotted at parse like the reference's DesignMatrix)
        cols = [jnp.ravel(params[n])[:n_rates].astype(beta.dtype)
                if n is not None else design0[:, i].astype(beta.dtype)
                for i, n in enumerate(design_names)]
        design_j = jnp.stack(cols, axis=1)
        return jnp.exp(design_j @ beta)

    def freqs(params):
        f = params[fname]
        return f / jnp.sum(f)

    q_fn = _complex_q_fn(ax, rates_of, fname, k, normalize, True)
    out = ("subst_q", q_fn, freqs, k)
    ax._glm_subst = getattr(ax, "_glm_subst", {})
    ax._glm_subst[el.get("id") or "glm"] = (out, coefs)
    return out


@register("glmSubstitutionModelGradient",
          "substitutionGeneratorGradient")
def _glm_substitution_gradient(ax: XmlAnalysis, el):
    """ref: GlmSubstitutionModelGradientParser — gradient of the tree
    data likelihood wrt the GLM fixed-effect coefficients (jax.grad
    differentiates through the expm transition path exactly)."""
    from beast_mcmc_tpu.config.xml_hmc import GradientSpec

    lik = None
    coef = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeDataLikelihood", "treeLikelihood"):
            lik = ax.build(cc)
            # the reference provider reports the FIRST-ORDER approximate
            # generator gradient; use the surrogate-gradient likelihood
            sur = getattr(ax, "_surrogate_liks", {}).get(cc.get("id"))
            if sur is not None:
                lik = sur
        elif cc.tag == "glmSubstitutionModel":
            ax.build(cc)
            _, coef = getattr(ax, "_glm_subst", {}).get(
                cc.get("id") or "glm", (None, None))
    if lik is None or coef is None:
        raise XmlError(
            "glmSubstitutionModelGradient needs likelihood + glm model")
    return GradientSpec(tuple(coef), (lik,))


# ---------------------------------------------------------------------------
# sequence simulation
# ---------------------------------------------------------------------------


@register("beagleSequenceSimulator", "sequenceSimulator")
def _sequence_simulator(ax: XmlAnalysis, el):
    """ref: BeagleSequenceSimulatorParser / SequenceSimulatorParser —
    simulate an alignment down the tree under the partition's
    substitution + site + clock models (host-side, parse-time; uses the
    analysis RNG). Returns an Alignment usable by <patterns>."""
    from scipy.linalg import expm

    from beast_mcmc_tpu.config.xml_assert import initial_eval_state
    from beast_mcmc_tpu.data.alignment import Alignment
    from beast_mcmc_tpu.data.datatype import NUCLEOTIDES

    parts = el.findall("partition")
    if not parts:
        # legacy form (ref: SequenceSimulatorParser): the element itself
        # is one partition with `replications` sites
        parts = [el]
    cols = []  # simulated site columns
    taxa_names = None
    datatype = None
    for part in parts:
        tm = site = clock = None
        sub = None
        root_freq_name = None
        for c in part:
            cc = ax.deref(c)
            if cc.tag in ("treeModel", "starTreeModel"):
                tm = ax.build(cc)
            elif cc.tag in ("tree", "newick", "upgmaTree",
                            "neighborJoiningTree"):
                # bare starting-tree source: wrap as a fixed TreeModel
                from beast_mcmc_tpu.config.interpreter import TreeModel

                tid = cc.get("id") or "simtree"
                if tid in ax._trees:
                    tm = ax._trees[tid]
                else:
                    names, tips, par, ch, hts, root = ax.build(cc)
                    tm = TreeModel(tid, names, tips, par, ch, hts, root)
                    ax._trees[tid] = tm
            elif cc.tag == "siteModel":
                site = ax.build(cc)
            elif cc.tag == "frequencyModel":
                root_freq_name = ax.build(cc)
            elif cc.tag in ("strictClockBranchRates",
                            "discretizedBranchRates",
                            "arbitraryBranchRates"):
                clock = ax.build(cc)
            elif cc.tag.endswith("Model") or cc.tag.endswith("model"):
                try:
                    maybe = ax.build(cc)
                    if isinstance(maybe, tuple) and maybe[0] in (
                            "subst", "subst_q"):
                        sub = maybe
                except Unsupported:
                    pass
        if site is None or tm is None:
            raise XmlError("simulator partition needs treeModel + siteModel")
        # snapshot AFTER the partition models built (they may register
        # parameters)
        params0, tree0 = initial_eval_state(ax)
        _, eig_or_q, freqs_of, s, rates_weights = site
        kind = site[0]
        reps = _attr(part, "replications", None, int)
        if reps is not None:
            n_sites = reps
        else:
            frm = _attr(part, "from", 1, int)
            to = _attr(part, "to", frm, int)
            every = _attr(part, "every", 1, int)
            n_sites = max(1, (to - frm + 1) // every)

        tr = ax.resolve_tree(tm.tree_id, params0, tree0)
        heights = np.asarray(tr.heights)
        parent = np.asarray(tr.parent)
        children = np.asarray(tr.children)
        root = int(np.asarray(tr.root))
        m = parent.shape[0]
        n_tips = (m + 1) // 2

        # host-side Q at the initial state: eigen-form reconstructs
        # Q = U diag(v) U^-1; q-form evaluates directly
        if kind == "site_q":
            q = np.asarray(eig_or_q(params0))
        else:
            eig = eig_or_q(params0)
            q = (np.asarray(eig.U)
                 @ np.diag(np.asarray(eig.values))
                 @ np.asarray(eig.U_inv))
        r, w = rates_weights(params0, np.float64)
        r = np.asarray(r, np.float64)
        w = np.asarray(w, np.float64)
        pi0 = (np.ravel(np.asarray(params0[root_freq_name]))
               if root_freq_name else np.asarray(freqs_of(params0)))
        pi0 = pi0 / pi0.sum()
        br = (np.broadcast_to(
            np.ravel(np.asarray(clock.rates(params0, tr))), (m,))
            if clock is not None else np.ones(m))

        rng = ax._rng
        cats = rng.choice(len(r), size=n_sites, p=w / w.sum())
        states = np.zeros((m, n_sites), np.int16)
        states[root] = rng.choice(len(pi0), size=n_sites, p=pi0)
        # preorder: parents before children
        order = np.argsort(-heights)
        s_count = q.shape[0]
        for node in order:
            if node == root:
                continue
            t = heights[parent[node]] - heights[node]
            p_cat = [expm(q * max(t * br[node], 0.0) * rc) for rc in r]
            for ci, pmat in enumerate(p_cat):
                pmat = np.clip(pmat, 0.0, None)
                pmat /= pmat.sum(axis=1, keepdims=True)
                sel = np.where(cats == ci)[0]
                if sel.size == 0:
                    continue
                parent_states = states[parent[node], sel]
                u = rng.random(sel.size)
                cdf = np.cumsum(pmat[parent_states], axis=1)
                states[node, sel] = (u[:, None] > cdf).sum(axis=1)
        cols.append(states[:n_tips])
        taxa_names = tm.taxa
        datatype = (sub[3] if False else None) or None
        # recover a DataType for the alignment: prefer one declared in
        # the document matching the state count
        from beast_mcmc_tpu.data.datatype import AMINO_ACIDS

        datatype = None
        for d_el in ax.root.iter("generalDataType"):
            cand = ax.build(d_el)
            if cand.state_count == s_count:
                datatype = cand
                break
        if datatype is None:
            datatype = {4: NUCLEOTIDES, 20: AMINO_ACIDS}.get(s_count)
        if datatype is None:
            raise Unsupported(
                f"simulator output alphabet ({s_count} states)")
    all_states = np.concatenate(cols, axis=1)
    return Alignment(list(taxa_names), all_states.astype(np.int16),
                     datatype)


# ---------------------------------------------------------------------------
# structured coalescent (BASTA) XML surface
# ---------------------------------------------------------------------------


@register("structuredCoalescent")
def _structured_coalescent(ax: XmlAnalysis, el):
    """ref: beagle/basta StructuredCoalescentLikelihood(type="BASTA") —
    approximate structured-coalescent density of tree + tip demes under
    a migration matrix (the substitution model's Q scaled by the strict
    clock rate) and per-deme population sizes (models/basta.py engine).

    One tip's deme may be SAMPLED (<timeVaryingFrequencies> +
    <tipStateOperator>): the closure reads ax._sampled_tip_state lazily
    so registration order against the prior block does not matter."""
    from beast_mcmc_tpu.models.basta import basta_loglikelihood

    patterns = None
    tm = None
    subst = None
    clock = None
    pops = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("attributePatterns", "patterns"):
            patterns = ax.build(cc)
        elif cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
        elif cc.tag in ("generalSubstitutionModel", "glmSubstitutionModel",
                        "complexSubstitutionModel", "svsGeneralSubstitutionModel"):
            subst = ax.build(cc)
        elif cc.tag == "strictClockBranchRates":
            clock = ax.build(cc)
        elif cc.tag == "parameter":
            pops = ax.param_from(cc)
    if patterns is None or tm is None or subst is None or pops is None:
        raise XmlError("structuredCoalescent needs patterns + treeModel + "
                       "substitutionModel + popSizes")
    k = subst[3]
    # static tip deme probability rows (ambiguity codes spread mass)
    amb = patterns.datatype.ambiguity_table()
    tip_rows = amb[np.ravel(np.asarray(patterns.states))[:len(tm.taxa)]]
    tip_rows = tip_rows / tip_rows.sum(axis=1, keepdims=True)
    lid = el.get("id") or "structuredCoalescent"
    rate_param = getattr(clock, "rate_param", None) if clock else None
    tid = tm.tree_id

    def q_of(params):
        if subst[0] == "subst_q":
            return subst[1](params)
        eig = subst[1](params)
        return (eig.U * eig.values[..., None, :]) @ eig.U_inv

    def fn(params, tree):
        dt = tree.heights.dtype
        q = q_of(params).astype(dt)
        if rate_param is not None:
            q = q * jnp.reshape(params[rate_param], ()).astype(dt)
        tip_p = jnp.asarray(tip_rows, dt)
        sts = getattr(ax, "_sampled_tip_state", {}).get(lid)
        if sts is not None:
            tip_idx, pname, _k = sts
            state = jnp.clip(jnp.round(jnp.reshape(
                params[pname], ())), 0, k - 1).astype(jnp.int32)
            tip_p = tip_p.at[tip_idx].set(
                jax.nn.one_hot(state, k, dtype=dt))
        return basta_loglikelihood(
            tip_p, tree.parent, tree.children, tree.heights, q,
            jnp.ravel(params[pops]).astype(dt))

    return LikelihoodFn(fn, tid, lid, (pops,))


@register("timeVaryingFrequencies", "timeVaryingFrequences")
def _time_varying_frequencies(ax: XmlAnalysis, el):
    """ref: tipstatesmodel/TimeVaryingFrequenciesModel:116-150 — a prior
    on ONE taxon's sampled tip state: log p_epoch(height)[state]. The
    sampled state parameter is registered here and consumed by the
    structuredCoalescent closure + <tipStateOperator>."""
    taxon = None
    lik_id = None
    dt_obj = None
    probs_name = None
    tid = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "taxon":
            taxon = cc.get("id") or cc.get("idref")
        elif cc.tag == "structuredCoalescent":
            lik_id = cc.get("id") or "structuredCoalescent"
        elif cc.tag == "generalDataType":
            dt_obj = ax.build(cc)
        elif cc.tag == "parameter":
            probs_name = ax.param_from(cc)
        elif cc.tag in ("treeModel", "starTreeModel"):
            tid = ax.build(cc).tree_id
    if taxon is None or lik_id is None or probs_name is None:
        raise XmlError("timeVaryingFrequencies structure")
    k = dt_obj.state_count if dt_obj else int(
        np.ravel(ax.value_of(probs_name)).size)
    tm = ax._trees[tid] if tid else None
    tip_idx = tm.taxa.index(taxon) if tm else 0
    sname = f"tipState.{taxon}"
    if sname not in ax._params:
        ax._params[sname] = Param(sname, np.asarray(0.0))
    ax._sampled_tip_state = getattr(ax, "_sampled_tip_state", {})
    ax._sampled_tip_state[lik_id] = (tip_idx, sname, k)
    ax._tip_state_params = getattr(ax, "_tip_state_params", {})
    ax._tip_state_params[el.get("id") or "tvf"] = (sname, k)

    def fn(params, tree):
        dt = tree.heights.dtype
        p = jnp.ravel(params[probs_name]).astype(dt)
        p = p / jnp.sum(p)
        state = jnp.clip(jnp.round(jnp.reshape(
            params[sname], ())), 0, k - 1).astype(jnp.int32)
        return jnp.log(p[state])

    return LikelihoodFn(fn, tid, el.get("id") or "tvf",
                        (sname, probs_name))


def _tip_state_operator(ax: XmlAnalysis, el, weight):
    """ref: TipStateOperator — uniform redraw of the sampled tip state
    (symmetric; the timeVaryingFrequencies prior and the structured
    coalescent weigh the acceptance)."""
    from beast_mcmc_tpu.inference.operators import UniformIntegerOperator

    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("timeVaryingFrequencies", "timeVaryingFrequences"):
            ax.build(cc)
            sname, k = ax._tip_state_params[cc.get("id") or "tvf"]
            return UniformIntegerOperator(
                parameter=sname, lower=0, upper=k - 1, weight=weight,
            ), None
    raise XmlError("tipStateOperator without timeVaryingFrequencies")


from beast_mcmc_tpu.config.interpreter import register_operator as _rgo  # noqa: E402

_rgo("tipStateOperator")(_tip_state_operator)


@register("structuredCoalescentLikelihoodGradient")
def _structured_coalescent_gradient(ax: XmlAnalysis, el):
    """ref: BastaLikelihoodGradient — gradient of the BASTA density wrt
    migration rates or population sizes (jax.grad of the same closure)."""
    from beast_mcmc_tpu.config.xml_hmc import GradientSpec

    wrt = el.get("wrtParameter", "migrationRate")
    lik = None
    subst_el = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "structuredCoalescent":
            lik = ax.build(cc)
            sc_el = cc
        elif cc.tag in ("glmSubstitutionModel", "generalSubstitutionModel"):
            subst_el = cc
    if lik is None:
        raise XmlError("structuredCoalescentLikelihoodGradient structure")
    if wrt == "populationSize":
        return GradientSpec(tuple(lik.data_params), (lik,))
    # migration rates: the substitution model's rate / GLM coefficient
    names = []
    if subst_el is not None:
        glm = getattr(ax, "_glm_subst", {}).get(subst_el.get("id") or "glm")
        if glm is not None:
            names.extend(glm[1])
        else:
            r_el = subst_el.find("rates")
            if r_el is not None:
                names.append(ax.param_from(r_el))
    if not names:
        return GradientSpec(tuple(lik.data_params), (lik,))
    return GradientSpec(tuple(names), (lik,))


# ---------------------------------------------------------------------------
# strongly-lumpable CTMC rates (ref: StronglyLumpableCtmcRates.java)
# ---------------------------------------------------------------------------


def _lump_build_map(n: int) -> np.ndarray:
    """ref: StronglyLumpableCtmcRates.buildMap — upper triangle row-major
    numbered first, then lower triangle column-major; -1 on diagonal."""
    m = -np.ones((n, n), int)
    off = 0
    for i in range(n):
        for j in range(i + 1, n):
            m[i, j] = off
            off += 1
    for j in range(n):
        for i in range(j + 1, n):
            m[i, j] = off
            off += 1
    return m


@register("stateSet")
def _state_set(ax: XmlAnalysis, el):
    """ref: StateSetParser — a named subset of a generalDataType's
    states."""
    dt_obj, states = None, []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "generalDataType":
            dt_obj = ax.build(cc)
        elif cc.tag == "state":
            states.append(dt_obj.char_map[cc.get("code").upper()])
    return ("stateSet", tuple(states))


class _LumpableRates:
    """ref: StronglyLumpableCtmcRates — a rate PROVIDER whose K(K-1)
    rates (complex order: upper row-major then lower column-major) are
    gathered from within-lump rate parameters and across-lump
    rate×proportion products (SuperInfo.getRate :419-430)."""

    def __init__(self, specs, k):
        self.specs = specs
        self.k = k

    def rates(self, params):
        vals = []
        for s in self.specs:
            if s[0] == "within":
                _, name, idx = s
                vals.append(jnp.ravel(params[name])[idx])
            else:
                _, pname, pidx, aname, aidx = s
                vals.append(jnp.ravel(params[pname])[pidx]
                            * jnp.ravel(params[aname])[aidx])
        return jnp.stack(vals)

    def report(self, ax) -> str:
        from beast_mcmc_tpu.config.xml_assert import _vec
        from beast_mcmc_tpu.config.xml_stats import _current_state

        p0, _ = _current_state(ax)
        return _vec(np.asarray(self.rates(p0))) + "\n"


@register("stronglyLumpableCtmcRates")
def _strongly_lumpable_rates(ax: XmlAnalysis, el):
    dt_obj, across_name = None, None
    lumps = []  # (declared_states, within_rates_name, [(src,dest,pname)])
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "generalDataType":
            dt_obj = ax.build(cc)
        elif cc.tag == "rates":
            across_name = ax.param_from(cc)
        elif cc.tag == "lump":
            states, wr, props = None, None, []
            for d in cc:
                dd = ax.deref(d)
                if dd.tag == "stateSet":
                    states = ax.build(dd)[1]
                elif dd.tag == "rates":
                    wr = ax.param_from(dd)
                elif dd.tag == "proportions":
                    src, pn = None, None
                    for e in dd:
                        ee = ax.deref(e)
                        if ee.tag == "state":
                            src = dt_obj.char_map[ee.get("code").upper()]
                        elif ee.tag == "parameter":
                            pn = ax.param_from(ee)
                    props.append((src, pn))
            lumps.append((tuple(states), wr, props))
    if dt_obj is None or across_name is None:
        raise XmlError("stronglyLumpableCtmcRates structure")
    k = dt_obj.state_count
    n_lumps = len(lumps)
    lump_map = _lump_build_map(n_lumps)

    # LumpIndex per state: (lump, index-in-sorted, original index, count)
    def lump_index(state):
        for a, (declared, _, _) in enumerate(lumps):
            if state in declared:
                srt = sorted(declared)
                return (a, srt.index(state), declared.index(state),
                        len(declared))
        raise XmlError(f"state {state} in no lump")

    def super_spec(i, j):
        a, ii, io, ca = lump_index(i)
        b, jj, jo, cb = lump_index(j)
        if a == b:
            wmap = _lump_build_map(ca)
            return ("within", lumps[a][1], int(wmap[ii, jj]))
        prop_index = b if a < b else b + 1
        pname = lumps[a][2][io * (n_lumps - 1) + prop_index - 1][1]
        return ("across", pname, jj, across_name, int(lump_map[a, b]))

    specs = []
    for i in range(k):
        for j in range(i + 1, k):
            specs.append(super_spec(i, j))
    for j in range(k):
        for i in range(j + 1, k):
            specs.append(super_spec(i, j))
    return _LumpableRates(tuple(specs), k)


@register("approximateLogCtmcRateGradient", "logCtmcRateGradient")
def _approx_log_ctmc_rate_gradient(ax: XmlAnalysis, el):
    """ref: ApproximateLogCtmcRateGradientParser /
    LumpableCtmcRateGradient — dlogL/d(rate parameters) of a discrete
    trait likelihood whose Q comes from a lumpable/log-additive rate
    provider; jax.grad through the expm path is exact (the reference's
    'approximate' linear-in-time form is its CPU shortcut)."""
    from beast_mcmc_tpu.config.interpreter import CompoundParam
    from beast_mcmc_tpu.config.xml_hmc import GradientSpec

    lik, names = None, []
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeDataLikelihood", "treeLikelihood",
                      "ancestralTreeLikelihood"):
            lik = ax.build(cc)
        elif cc.tag in ("compoundParameter", "parameter"):
            obj = ax.build(cc)
            if isinstance(obj, CompoundParam):
                names.extend(obj.names)
            else:
                names.append(obj.name)
    if lik is None or not names:
        raise XmlError("approximateLogCtmcRateGradient structure")
    return GradientSpec(tuple(names), (lik,))


def _log_rate_subst_report(ax, el):
    """Q-matrix report (ref: LogRateSubstitutionModel extends
    ComplexSubstitutionModel.getReport — infinitesimal matrix print)."""
    from beast_mcmc_tpu.config.xml_stats import _current_state

    kind = ax.build(el)
    p0, _ = _current_state(ax)
    q = np.asarray(kind[1](p0))
    rows = "\n".join(" ".join(str(v) for v in r) for r in q)
    return f"Infinitesimal rate matrix:\n{rows}\n"


from beast_mcmc_tpu.config.xml_hmc import OP_REPORTS as _OPR_GEO  # noqa: E402

_OPR_GEO["logRateSubstitutionModel"] = _log_rate_subst_report
