"""TestXML interpreter: execute reference BEAST XML analyses end-to-end.

The reference's public API is its XML vocabulary: a registry of per-tag
parsers assembles the runtime object graph (ref: XMLParser.java:131-220
parse/convert with the id/idref store; registry listed in
src/dr/app/beast/release_parsers.properties, loaded by
BeastParser.java:97-112). This module is the TPU-native analog: a
registry of per-tag builders (`_BUILDERS`) assembles pure log-density
closures, operator specs, and loggers from the same XML, then runs each
<mcmc> block through the jitted chain kernel and executes the file's own
embedded checks:

  - <traceAnalysis><expectation name value> — posterior-mean oracles
    checked within k standard errors of the run's own trace (ref:
    TraceAnalysisParser.java:81-107, 2 SE);
  - completion without error (+ the full-evaluation self-check) for
    files without expectations — the reference CI's criterion
    (.github/workflows/ci.yml:71-83).

Chains may be shortened by `scale` (expectation checks remain valid: the
SE comes from the shortened run's own trace). Elements outside the
vocabulary raise Unsupported naming the tag — the unregistered-parser
contract.

Operator-substitution notes (posterior-preserving):
  - <gmrfBlockUpdateOperator> runs as the real conditioned-Gaussian
    block update where wired (see inference/gibbs.py), else a scale
    move on the precision plus a random-walk on the field (same
    posterior, different mixing).
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class Unsupported(NotImplementedError):
    pass


class XmlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# small XML helpers
# ---------------------------------------------------------------------------


def _attr(el, name, default=None, cast=str):
    v = el.get(name)
    if v is None:
        return default
    if cast is bool:
        return v.lower() == "true"
    return cast(v)


def _text_values(el) -> np.ndarray:
    # "NA" parses as NaN (ref: XMLObject.java:46 missingValue — missing
    # covariates/values are NaN-flagged and imputed/masked downstream)
    return np.array([
        float("nan") if x.upper() == "NA" else float(x)
        for x in (el.get("value") or "").split()
    ])


# ---------------------------------------------------------------------------
# runtime object kinds
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Param:
    """A real parameter registered in the chain's params dict."""

    name: str
    value: np.ndarray
    lower: float = -np.inf
    upper: float = np.inf
    integer: bool = False


@dataclasses.dataclass
class DerivedParam:
    """A parameter that is a pure FUNCTION of the sampled params (ref:
    TransformedParameterParser — the value is transform(inner), never
    sampled directly). Injected into the params dict before every
    density/logger evaluation (XmlAnalysis.inject_derived)."""

    name: str
    fn: Callable  # params -> array
    value: np.ndarray = None  # initial value (for column headers etc.)
    base: str = None  # underlying sampled param (operators target this)
    idx: object = None  # flat indices into base for masked index views


@dataclasses.dataclass
class TreeAlias:
    """A <parameter> that is a VIEW of the tree state (rootHeight /
    nodeHeights / leafHeight blocks of <treeModel>,
    ref: TreeModelParser.java)."""

    kind: str  # "root_height" | "internal_heights" | "all_heights" | "leaf_height"
    tree_id: str
    tip_index: int = -1  # for leaf_height


@dataclasses.dataclass
class Demographic:
    kind: str
    params: Dict[str, str]  # role -> param name
    # loglik(tree_heights, n_taxa, params) -> scalar
    loglik: Callable = None
    # pop-size value usable for host-side start-tree simulation
    sim_pop: float = 1.0


@dataclasses.dataclass
class TreeModel:
    tree_id: str
    taxa: List[str]
    tip_heights: np.ndarray
    parent: np.ndarray
    children: np.ndarray
    heights: np.ndarray
    root: int
    sampled_tips: Dict[str, int] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class ClockModel:
    kind: str  # "strict" | "discretized" | "continuous_quantile"
    tree_id: str
    # rates(params, tree) -> [M] per-node branch rates (branch above node)
    rates: Callable = None
    rate_param: Optional[str] = None


@dataclasses.dataclass
class LikelihoodFn:
    fn: Callable  # (params, tree) -> scalar
    tree_id: Optional[str] = None
    name: str = ""
    # names of the sampled data parameters this density scores (used by
    # gradient/HMC builders to infer target parameters)
    data_params: Tuple[str, ...] = ()


# ---------------------------------------------------------------------------
# the interpreter
# ---------------------------------------------------------------------------


class XmlAnalysis:
    """Parse + execute one reference TestXML file."""

    def __init__(self, path: str, scale: float = 1.0, workdir: str = ".",
                 seed: int = 666, dtype=None, max_states: int = 200_000,
                 strict_expectations: bool = True):
        import beast_mcmc_tpu.utils.dtypes as dtypes

        self.path = path
        self.scale = scale
        self.workdir = workdir
        self.seed = seed
        self.max_states = max_states
        self.strict_expectations = strict_expectations
        self.dtype = dtype or dtypes.default_float()
        self.root = ET.parse(path).getroot()
        if self.root.tag != "beast":
            raise XmlError(f"root element <{self.root.tag}>, expected <beast>")
        self._ids: Dict[str, ET.Element] = {}
        for el in self.root.iter():
            if el.get("id"):
                self._ids[el.get("id")] = el
        self._built: Dict[int, object] = {}
        self._tree_binding: Dict[str, str] = {}  # tid -> "state"|"params"
        self._tree_views: Dict[str, object] = {}  # tid -> TreeState view fn
        self._star_trees: set = set()  # tids with the star height tie
        self._derived_params: Dict[str, Callable] = {}  # name -> fn(params)
        self._params: Dict[str, Param] = {}
        self._aliases: Dict[str, TreeAlias] = {}
        self._trees: Dict[str, TreeModel] = {}
        self._rng = np.random.default_rng(seed)
        self.results: Dict[str, Dict[str, np.ndarray]] = {}
        self.assertions: List[Tuple[str, str, float, float, float]] = []
        # taxon attributes: taxon id -> {attr name: [raw string values]}
        # collected EAGERLY over the whole document (a treeModel built from
        # <newick> never touches <taxa>, yet its nodeTraits still read
        # taxon attrs — ref: AttributeParser via TaxonParser)
        self._taxon_attrs: Dict[str, Dict[str, List[str]]] = {}
        for t in self.root.iter("taxon"):
            name = t.get("id")
            if name is None:
                continue
            for a in t.findall("attr"):
                vals = (a.text or "").split()
                if not vals:
                    # nested object form: <attr name="host"><taxon
                    # idref="B"/></attr> (ref: AttributeParser stores
                    # the child object; the id is the usable value)
                    vals = [c.get("idref") or c.get("id")
                            for c in a if c.get("idref") or c.get("id")]
                self._taxon_attrs.setdefault(name, {})[a.get("name")] = vals
        # continuous node traits: (tree_id, trait name) -> dict with
        # param/mask/dim (filled by the treeModel nodeTraits child)
        self._traits: Dict[Tuple[str, str], Dict] = {}

    # -- multi-tree support: ONE tree rides MCMCState.tree; additional
    # gene trees (multilocus/EBSP analyses) live INSIDE the params pytree
    # under __tree__<id>__* keys, moved by wrapped operators, and every
    # tree-bound closure resolves its tree through this binding at trace
    # time (the reference simply holds many TreeModel objects) ----------
    @staticmethod
    def tree_key(tid: str, field: str) -> str:
        return f"__tree__{tid}__{field}"

    def resolve_tree(self, tid, params, tree):
        if self._tree_binding.get(tid, "state") == "state":
            out = tree
        else:
            from beast_mcmc_tpu.tree.topology import TreeState

            out = TreeState(
                parent=params[self.tree_key(tid, "parent")],
                children=params[self.tree_key(tid, "children")],
                heights=params[self.tree_key(tid, "heights")],
                root=params[self.tree_key(tid, "root")],
            )
        # runtime reparameterization views (starTreeModel's
        # internal-heights-read-as-root tie; ancestralTraitTreeModel's
        # ghost-ancestor extension) — fn(TreeState, params) -> TreeState
        view = self._tree_views.get(tid)
        return view(out, params) if view is not None else out

    # -- id/idref resolution (ref: XMLParser id/idref object store) --------
    def deref(self, el: ET.Element) -> ET.Element:
        r = el.get("idref")
        if r is None:
            return el
        if r not in self._ids:
            raise XmlError(f"unresolved idref {r!r} on <{el.tag}>")
        return self._ids[r]

    def build(self, el: ET.Element):
        el = self.deref(el)
        key = id(el)
        if key in self._built:
            return self._built[key]
        builder = _BUILDERS.get(el.tag)
        if builder is None:
            raise Unsupported(f"<{el.tag}> has no registered builder")
        obj = builder(self, el)
        if (
            isinstance(obj, LikelihoodFn)
            and el.tag not in ("posterior", "prior", "likelihood", "joint",
                               "booleanLikelihood")
        ):
            inner, tid = obj.fn, obj.tree_id
            if tid:
                wrapped = LikelihoodFn(
                    lambda p, t, _f=inner, _tid=tid: _f(
                        self.inject_derived(p), self.resolve_tree(_tid, p, t)
                    ),
                    obj.tree_id,
                    obj.name,
                    obj.data_params,
                )
                for k_attr, v_attr in vars(obj).items():
                    if k_attr not in ("fn", "tree_id", "name",
                                      "data_params"):
                        setattr(wrapped, k_attr, v_attr)
                obj = wrapped
            else:
                wrapped = LikelihoodFn(
                    lambda p, t, _f=inner: _f(self.inject_derived(p), t),
                    obj.tree_id,
                    obj.name,
                    obj.data_params,
                )
                # preserve builder-attached extras (report hooks, model
                # records) through the inject_derived rewrap
                for k_attr, v_attr in vars(obj).items():
                    if k_attr not in ("fn", "tree_id", "name",
                                      "data_params"):
                        setattr(wrapped, k_attr, v_attr)
                obj = wrapped
        self._built[key] = obj
        return obj

    def _model_children(self, el) -> List[ET.Element]:
        return [c for c in el if c.tag in _BUILDERS or c.get("idref")]

    # -- parameters ---------------------------------------------------------
    def param_from(self, el: ET.Element, default=None, dim=None,
                   prefix="anon") -> str:
        """Build/locate the <parameter> beneath (or at) el; returns name."""
        el = self.deref(el)
        if el.tag in ("maskedParameter", "transformedParameter",
                      "transformedMultivariateParameter"):
            obj = self.build(el)
            return obj.name  # Param or DerivedParam view
        if el.tag != "parameter":
            p = el.find("parameter")
            if p is None:
                for c in el:
                    cc = self.deref(c)
                    if cc.tag in ("parameter", "compoundParameter",
                                  "maskedParameter", "transformedParameter",
                                  "productParameter",
                                  "multiplicativeParameter",
                                  "transformedMultivariateParameter"):
                        p = cc
                        break
            if p is None:
                # a bare numeric body ("<shape>1</shape>") is a constant
                # parameter (ref: XMLParser auto-boxes doubles)
                txt = (el.text or "").split()
                try:
                    vals = np.array([float(x) for x in txt])
                except ValueError:
                    vals = np.array([])
                if vals.size:
                    name = f"const{len(self._params)}"
                    self._params[name] = Param(
                        name,
                        vals if vals.size > 1
                        else np.asarray(float(vals[0])))
                    return name
                raise XmlError(f"no <parameter> under <{el.tag}>")
            el = self.deref(p)
        obj = self.build(el)
        if isinstance(obj, DerivedParam):
            return obj.name  # resolved at eval time via inject_derived
        if isinstance(obj, TreeAlias):
            raise XmlError("tree-view parameter where real parameter expected")
        if isinstance(obj, CompoundParam):
            # materialize the concatenation as a parse-time constant
            # (compound targets that need LIVE member tracking go through
            # builders that handle CompoundParam directly)
            name = el.get("id") or f"compound{len(self._params)}"
            key = f"__materialized__{name}"
            if key not in self._params:
                vals = np.concatenate([
                    np.atleast_1d(self._params[n].value)
                    for n in obj.names])
                self._params[key] = Param(key, vals)
            return key
        return obj.name

    def value_of(self, name: str) -> np.ndarray:
        return self._params[name].value

    def inject_derived(self, params):
        """Overlay derived (transformed/masked-view) parameter values on
        the sampled params dict — insertion order respects declaration
        order, so a derived param may reference earlier derived ones."""
        if not self._derived_params:
            return params
        out = dict(params)
        for name, fn in self._derived_params.items():
            out[name] = fn(out)
        return out

    # -- running ------------------------------------------------------------
    def run(self, tolerance_se: float = 3.0, full_eval_steps: int = 100):
        """Execute every <mcmc>, <report>, <traceAnalysis> in document
        order. Returns the list of (file, column, mean, expected, se)
        assertion tuples; raises AssertionError on a failed expectation."""
        # build treeModels first so their rootHeight/nodeHeights/leafHeight
        # <parameter> children register as tree-view aliases before any
        # other element builds them as real parameters
        for el in self.root.iter("treeModel"):
            if el.get("id"):
                self.build(el)
        # nodeHeightTransform registers its <ratios> parameter as a live
        # tree view — build them before any logger resolves the bare
        # parameter element as an (empty) free Param
        for el in self.root.iter("nodeHeightTransform"):
            try:
                self.build(el)
            except (Unsupported, XmlError):
                pass
        for el in self.root:
            if el.tag == "mcmc":
                self._run_mcmc(el, full_eval_steps)
            elif el.tag == "marginalLikelihoodEstimator":
                from beast_mcmc_tpu.config.xml_mle import (
                    run_marginal_likelihood_estimator,
                )

                run_marginal_likelihood_estimator(self, el)
            elif el.tag == "traceAnalysis":
                self._run_trace_analysis(el, tolerance_se)
            elif el.tag == "assertEqual":
                # BeastUnitTest-style embedded assertion; the builder
                # returns a thunk that raises AssertionError on mismatch
                self.build(el)()
            elif el.tag in ("report", "treeTraceAnalysis", "CSVexport",
                            "VDAnalysis", "marginalLikelihoodAnalysis"):
                continue  # post-hoc reporting; not part of the assertions
            else:
                # model definitions are built lazily by the mcmc blocks
                continue
        return self.assertions

    # -- mcmc ---------------------------------------------------------------
    def _posterior_of(self, el) -> LikelihoodFn:
        """The first child of <mcmc> that is a likelihood-like element."""
        for c in el:
            if c.tag in ("log", "logTree", "operators"):
                continue
            obj = self.build(c)
            if isinstance(obj, LikelihoodFn):
                return obj
        raise XmlError("<mcmc> has no posterior/likelihood child")

    def _run_mcmc(self, el, full_eval_steps):
        self._mcmc_ran = True  # state-dependent asserts downgrade after
        from beast_mcmc_tpu.inference.mcmc import (
            full_evaluation_check,
            init_mcmc_state,
            make_mcmc_step,
            run_chain,
        )
        from beast_mcmc_tpu.inference.samplers import make_post_update

        post = self._posterior_of(el)
        ops_el = el.find("operators")
        if ops_el is None:
            raise XmlError("<mcmc> without <operators>")
        built_ops = self.build(self.deref(ops_el))
        operators, op_tree_ids = built_ops

        tree_ids = sorted(
            {t for t in op_tree_ids if t}
            | ({post.tree_id} if post.tree_id else set())
        )
        # first tree rides MCMCState.tree; the rest live in params and
        # their operators are lifted (multilocus/EBSP analyses)
        primary = tree_ids[0] if tree_ids else None
        self._tree_binding = {t: "params" for t in tree_ids[1:]}
        if primary is not None:
            self._tree_binding[primary] = "state"
        if primary is None:
            tm = TreeModel("_dummy", ["A", "B"], np.zeros(2),
                           np.array([2, 2, -1]),
                           np.array([[-1, -1], [-1, -1], [0, 1]]),
                           np.array([0.0, 0.0, 1.0]), 2)
        else:
            tm = self._trees[primary]

        from beast_mcmc_tpu.tree.topology import make_tree_state

        tree0 = make_tree_state(
            tm.parent, tm.children, tm.heights, tm.root, self.dtype
        )
        params0 = {
            p.name: jnp.asarray(
                p.value, jnp.int32 if p.integer else self.dtype
            )
            for p in self._params.values()
        }
        for tid in tree_ids[1:]:
            t = self._trees[tid]
            params0[self.tree_key(tid, "parent")] = jnp.asarray(
                t.parent, jnp.int32)
            params0[self.tree_key(tid, "children")] = jnp.asarray(
                t.children, jnp.int32)
            params0[self.tree_key(tid, "heights")] = jnp.asarray(
                t.heights, self.dtype)
            params0[self.tree_key(tid, "root")] = jnp.asarray(
                t.root, jnp.int32)
        operators = [
            op if (tid is None or tid == primary)
            else ParamsTreeOperator(
                inner=op,
                keys=tuple(self.tree_key(tid, f)
                           for f in ("parent", "children", "heights",
                                     "root")),
                weight=op.weight,
                target_acceptance=op.target_acceptance,
                adaptable=op.adaptable,
            )
            for op, tid in zip(operators, op_tree_ids)
        ]

        cl_decl = _attr(el, "chainLength", 10000, int)
        # scale cuts LONG soak chains; tiny debug chains (<=64 states,
        # e.g. fireParameterChanged sequences whose post-state is
        # asserted deterministically) always run in full
        chain_length = max(int(cl_decl * self.scale), min(cl_decl, 64))
        chain_length = min(chain_length, self.max_states)

        lp_fn = post.fn
        step = make_mcmc_step(
            lp_fn, operators, post_update=make_post_update(operators)
        )
        key = jax.random.PRNGKey(self.seed)
        state = init_mcmc_state(
            params0, tree0, key, operators, lp_fn, dtype=self.dtype
        )
        if not np.isfinite(float(state.log_posterior)):
            raise XmlError(
                f"initial posterior not finite: {float(state.log_posterior)}"
            )

        # the reference's in-chain sanitizer for the first steps
        if full_eval_steps:
            check = jax.jit(
                lambda s: full_evaluation_check(
                    step, lp_fn, s, full_eval_steps
                )
            )
            state, dev = check(state)
            dev = float(dev)
            tol = 0.1 if self.dtype == jnp.float64 else 1e-4 * max(
                1.0, abs(float(state.log_posterior))
            )
            if not dev <= tol:
                raise AssertionError(
                    f"full-evaluation self-check deviation {dev} > {tol}"
                )

        # collectors: one per <log fileName>; plus screen logs are skipped
        logs = []
        for lg in el.findall("log"):
            fname = lg.get("fileName")
            if fname is None:
                continue
            log_every = max(1, int(_attr(lg, "logEvery", 1000, int) * self.scale))
            cols = self._log_columns(lg)
            logs.append((fname, log_every, cols))

        # tree logs: (fileName, every, tree_id, [(tag, states_fn,
        # labels)]) — ancestral-state children annotate every node (ref:
        # TreeLogger + AncestralStateBeagleTreeLikelihood:274)
        tree_logs = []
        for lg in el.findall("logTree"):
            fname = lg.get("fileName")
            if fname is None:
                continue
            t_every = max(1, int(_attr(lg, "logEvery", 1000, int)
                                 * self.scale))
            t_tid = None
            annotators = []
            for c in lg:
                cc = self.deref(c)
                if cc.tag in ("treeModel", "starTreeModel"):
                    t_tid = self.build(cc).tree_id
                elif cc.tag in ("ancestralTreeLikelihood",
                                "markovJumpsTreeLikelihood"):
                    self.build(cc)
                    rec = getattr(self, "_ancestral_liks", {}).get(
                        cc.get("id"))
                    if rec is not None and rec.get("states_fn"):
                        annotators.append(
                            (rec["tag"], rec["states_fn"], rec["labels"]))
            if t_tid is not None:
                tree_logs.append((fname, t_every, t_tid, annotators))

        if logs or tree_logs:
            base_every = min([le for _, le, _ in logs]
                             + [te for _, te, _, _ in tree_logs])
        else:
            base_every = max(1, chain_length // 1000)

        def collector(s):
            out = {}
            for fname, _, cols in logs:
                for cname, fn in cols:
                    out[f"{fname}\x00{cname}"] = fn(s)
            for fname, _, tid, annotators in tree_logs:
                tr = self.resolve_tree(tid, s.params, s.tree)
                out[f"{fname}\x00__parent"] = tr.parent
                out[f"{fname}\x00__children"] = tr.children
                out[f"{fname}\x00__heights"] = tr.heights
                out[f"{fname}\x00__root"] = tr.root
                for tag, states_fn, _labels in annotators:
                    import zlib

                    k = jax.random.fold_in(
                        s.key, zlib.crc32(tag.encode()) % (2**31))
                    out[f"{fname}\x00__ann_{tag}"] = states_fn(
                        s.params, tr, k)
            return out

        n_blocks = max(1, chain_length // base_every)
        state, trace = jax.jit(
            lambda s: run_chain(
                step, s, n_blocks * base_every, base_every, collector
            )
        )(state)
        lp = float(state.log_posterior)
        if not np.isfinite(lp):
            raise AssertionError(f"chain ended with non-finite posterior {lp}")

        import os as _os

        for fname, log_every, cols in logs:
            stride = max(1, log_every // base_every)
            table = {}
            for cname, _ in cols:
                arr = np.asarray(trace[f"{fname}\x00{cname}"], np.float64)
                table[cname] = arr[::stride]
            table["_states_per_sample"] = np.array([log_every])
            self.results[fname] = table
            # Tracer-compatible on-disk log (ref: TabDelimitedFormatter)
            from beast_mcmc_tpu.inference.loggers import TabLogger

            names = [c for c, _ in cols]
            with open(_os.path.join(self.workdir, fname), "w") as fh:
                tl = TabLogger(names, fh)
                n_rows = len(table[names[0]]) if names else 0
                for i in range(n_rows):
                    tl.log((i + 1) * log_every,
                           {c: table[c][i] for c in names})

        # write NEXUS tree logs (with ancestral-state annotations)
        from beast_mcmc_tpu.inference.loggers import NexusTreeLogger

        for fname, t_every, tid, annotators in tree_logs:
            stride = max(1, t_every // base_every)
            parents = np.asarray(trace[f"{fname}\x00__parent"])[::stride]
            childs = np.asarray(trace[f"{fname}\x00__children"])[::stride]
            hts = np.asarray(trace[f"{fname}\x00__heights"])[::stride]
            roots = np.asarray(trace[f"{fname}\x00__root"])[::stride]
            anns = {
                tag: (np.asarray(trace[f"{fname}\x00__ann_{tag}"])[::stride],
                      labels)
                for tag, _f, labels in annotators
            }
            tm_l = self._trees[tid]
            path = _os.path.join(self.workdir, fname)
            with open(path, "w") as fh:
                tl = NexusTreeLogger(tm_l.taxa, fh)
                for i in range(parents.shape[0]):
                    node_ann = None
                    if anns:
                        node_ann = {}
                        for tag, (st, labels) in anns.items():
                            for node in range(st.shape[1]):
                                code = int(st[i, node])
                                lab = (labels[code] if labels
                                       and 0 <= code < len(labels)
                                       else str(code))
                                prev = node_ann.get(node)
                                entry = f'{tag}="{lab}"'
                                node_ann[node] = (
                                    f"{prev},{entry}" if prev else entry)
                    tl.log_tree(int((i + 1) * t_every), parents[i],
                                childs[i], hts[i], roots[i],
                                annotations=node_ann)
                tl.close()
        self._last_state = state
        self._last_operators = operators

        # write the final chain state back into the parse-time store so
        # post-<mcmc> reports/asserts see the CURRENT model state (the
        # reference's Reportables read the live objects; deterministic
        # post-chain asserts — e.g. after <fireParameterChanged> — depend
        # on this)
        for name, p in self._params.items():
            if name in state.params:
                v = np.asarray(state.params[name])
                p.value = (v.astype(np.int64) if p.integer
                           else v.astype(np.float64))
        if primary is not None:
            tm_w = self._trees[primary]
            tm_w.parent = np.asarray(state.tree.parent)
            tm_w.children = np.asarray(state.tree.children)
            tm_w.heights = np.asarray(state.tree.heights, np.float64)
            tm_w.root = int(state.tree.root)
        for tid in tree_ids[1:]:
            tm_w = self._trees[tid]
            tm_w.parent = np.asarray(state.params[self.tree_key(tid, "parent")])
            tm_w.children = np.asarray(
                state.params[self.tree_key(tid, "children")])
            tm_w.heights = np.asarray(
                state.params[self.tree_key(tid, "heights")], np.float64)
            tm_w.root = int(state.params[self.tree_key(tid, "root")])

    def _log_columns(self, lg) -> List[Tuple[str, Callable]]:
        cols = []
        for c in lg:
            if c.tag == "column":
                for cc in c:
                    cols.extend(self._column_of(cc))
            else:
                cols.extend(self._column_of(c))
        return cols

    def _column_of(self, el) -> List[Tuple[str, Callable]]:
        ref_name = el.get("idref")
        el2 = self.deref(el)
        if el2.tag == "matrixParameter":
            from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

            mp = matrix_param_of(self, el2)
            nm = ref_name or el2.get("id") or "matrix"
            cols = []
            for i in range(mp.dim):
                for j in range(len(mp.names)):
                    cols.append((
                        f"{nm}{i + 1}{j + 1}",
                        lambda s, i=i, j=j: mp.fn(s.params)[i, j],
                    ))
            return cols
        if el2.tag == "parameter":
            obj = self.build(el2)
            if isinstance(obj, TreeAlias):
                nm_a = ref_name or el2.get("id")
                if obj.kind in ("internal_heights", "all_heights"):
                    # one column per internal node height (the reference
                    # logs vector parameters element-wise)
                    tm_a = self._trees[obj.tree_id]
                    sel = list(range(len(tm_a.taxa),
                                     tm_a.parent.shape[0]))
                    return [
                        (f"{nm_a}{k + 1}",
                         lambda s, i=i, t=obj.tree_id: self.resolve_tree(
                             t, s.params, s.tree).heights[i])
                        for k, i in enumerate(sel)
                    ]
                return [(nm_a, self._alias_reader(obj))]
            if getattr(obj, "columns", None) is not None:
                return list(obj.columns)  # live view (nodeHeight.ratios)
            if isinstance(obj, DerivedParam):
                return self._log_columns_derived(ref_name or el2.get("id"),
                                                 obj)
            name = obj.name

            def read(s, name=name):
                return jnp.ravel(s.params[name])[0] if True else None

            # vector parameters: one column per element (reference logs
            # param1, param2, ...). Read the CURRENT registration — some
            # builders (skyride/EBSP) resize params after first build.
            val = self._params[name].value
            if val.size == 1:
                return [(name, lambda s, n=name: jnp.reshape(s.params[n], ()))]
            return [
                (f"{name}{i+1}",
                 lambda s, n=name, i=i: jnp.ravel(s.params[n])[i])
                for i in range(val.size)
            ]
        obj = self.build(el2)
        nm = ref_name or el2.get("id") or el2.tag
        if isinstance(obj, LikelihoodFn):
            return [(nm, lambda s, f=obj.fn: f(s.params, s.tree))]
        if isinstance(obj, ClockModel):
            # branch-rate models log their (zero) density, matching the
            # reference's Loggable default for non-density rate models
            return [(nm, lambda s: jnp.asarray(0.0, s.tree.heights.dtype))]
        if isinstance(obj, CompoundParam):
            cols = []
            for n in obj.names:
                cols.append((n, lambda s, n=n: jnp.reshape(s.params[n], ())))
            return cols
        if hasattr(obj, "columns") and obj.columns is not None:
            return list(obj.columns)  # MultiColumn (traitLogger etc.)
        if hasattr(obj, "fn") and hasattr(obj, "dim") and hasattr(
                obj, "names"):  # MatrixParam view (compoundSymmetric etc.)
            nm2 = ref_name or el2.get("id") or "matrix"
            return [
                (f"{nm2}{i + 1}{j + 1}",
                 lambda s, i=i, j=j, o=obj: o.fn(s.params)[i, j])
                for i in range(obj.dim) for j in range(obj.dim)
            ]
        if type(obj).__name__ == "GradientSpec":
            # log the live analytic gradient (ref: GradientWrtParameter
            # Provider implements Loggable — columns of the gradient)
            cols = self._gradient_columns(nm, obj)
            if cols is not None:
                return cols
        if isinstance(obj, DerivedParam):
            return self._log_columns_derived(nm, obj)
        if isinstance(obj, JointTipAlias):
            # one mirrored value: log the first tree's copy
            tid0, tip0 = obj.targets[0]
            return [(nm, lambda s, t=tid0, i=tip0: self.resolve_tree(
                t, s.params, s.tree).heights[i])]
        if type(obj).__name__ == "IntegratedFactorModel":
            # density counted inside the companion traitDataLikelihood
            return [(nm, lambda s: jnp.asarray(0.0,
                                               s.tree.heights.dtype))]
        if isinstance(obj, Param):
            val = np.atleast_1d(np.asarray(obj.value))
            if val.size == 1:
                return [(nm, lambda s, n=obj.name: jnp.reshape(
                    s.params[n], ()))]
            return [
                (f"{nm}{i + 1}",
                 lambda s, n=obj.name, i=i: jnp.ravel(s.params[n])[i])
                for i in range(val.size)
            ]
        if callable(obj):  # statistics
            return [(nm, obj)]
        raise Unsupported(f"cannot log <{el2.tag}>")

    def _log_columns_derived(self, nm, obj):
        val0 = np.atleast_1d(np.asarray(obj.value)) if (
            obj.value is not None) else None
        if val0 is not None and val0.size > 1:
            return [
                (f"{nm}{i + 1}",
                 lambda s, i=i, f=obj.fn: jnp.ravel(
                     f(self.inject_derived(s.params)))[i])
                for i in range(val0.size)
            ]
        return [(nm, lambda s, f=obj.fn: jnp.reshape(
            f(self.inject_derived(s.params)), ()))]

    def _gradient_columns(self, nm, spec):
        """Live gradient log columns for a GradientSpec (param targets
        and/or internal node heights)."""
        import jax

        names = list(spec.target_names())
        height_tid = getattr(spec, "height_tid", None)
        if not names and height_tid is None:
            return None
        sizes = [int(np.asarray(self._params[n].value).size)
                 for n in names]

        def grad_flat(s):
            p = self.inject_derived(s.params)

            def density(vals, hvec):
                pp = dict(p)
                for n, v in zip(names, vals):
                    pp[n] = jnp.reshape(v, jnp.shape(p[n]))
                t = s.tree
                if height_tid is not None:
                    n_tips = (t.heights.shape[0] + 1) // 2
                    t = t.replace(
                        heights=t.heights.at[n_tips:].set(hvec))
                return sum(l.fn(pp, t) for l in spec.likelihoods)

            vals0 = [p[n] for n in names]
            n_tips = (s.tree.heights.shape[0] + 1) // 2
            h0 = s.tree.heights[n_tips:]
            gv, gh = jax.grad(density, argnums=(0, 1))(vals0, h0)
            flats = [jnp.ravel(g) for g in gv]
            if height_tid is not None:
                flats.append(jnp.ravel(gh))
            return jnp.concatenate(flats) if flats else jnp.zeros((0,))

        n_h = 0
        if height_tid is not None:
            tm = self.build(self._ids[height_tid])
            n_h = len(tm.taxa) - 1
        total = sum(sizes) + n_h
        return [
            (f"{nm}{i + 1}", lambda s, i=i: grad_flat(s)[i])
            for i in range(total)
        ]

    def _alias_reader(self, a: TreeAlias):
        R = lambda s: self.resolve_tree(a.tree_id, s.params, s.tree)
        if a.kind == "root_height":
            return lambda s: R(s).heights[R(s).root]
        if a.kind == "leaf_height":
            return lambda s, i=a.tip_index: R(s).heights[i]
        raise Unsupported(f"cannot log alias kind {a.kind}")

    # -- traceAnalysis ------------------------------------------------------
    @staticmethod
    def _read_log_table(path):
        """Parse a Tracer-format tab-delimited log from disk into the
        in-memory table shape (ref: TraceAnalysisParser.java:70 reads the
        named file with a FileReader; dr.inference.trace.LogFileTraces)."""
        header = None
        rows = []
        with open(path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                parts = line.split("\t")
                if header is None:
                    header = parts
                    continue
                try:
                    rows.append([float(x) for x in parts])
                except ValueError:
                    continue
        if header is None or not rows:
            raise XmlError(f"empty or headerless log file {path!r}")
        arr = np.asarray(rows, np.float64)
        table = {name: arr[:, j] for j, name in enumerate(header)}
        states = table.pop("state", table.pop(header[0], None))
        sps = int(states[1] - states[0]) if states is not None and len(
            states) > 1 else 1
        table["_states_per_sample"] = np.array([max(1, sps)])
        return table

    def _run_trace_analysis(self, el, tolerance_se):
        from beast_mcmc_tpu.inference.trace import analyze

        fname = el.get("fileName")
        if fname not in self.results:
            # the reference's TraceAnalysisParser reads the NAMED FILE
            # from disk (TraceAnalysisParser.java:70 new FileReader) —
            # some corpus XMLs point <traceAnalysis> at a SIBLING file's
            # log (e.g. testPiecewiseExponential.xml:308 reads
            # testLinearBSP.log). Read it from the working dir if present;
            # warn-and-skip if the sibling run hasn't produced it.
            import os as _os
            import warnings

            path = _os.path.join(self.workdir, fname)
            if _os.path.exists(path):
                table = self._read_log_table(path)
            else:
                warnings.warn(
                    f"traceAnalysis log {fname!r} is not this run's output "
                    f"and does not exist on disk (skipped)")
                return None
        else:
            table = self.results[fname]
        states_per_sample = int(table["_states_per_sample"][0])
        burn_states = int(_attr(el, "burnIn", -1, int) * self.scale)
        if burn_states < 0:
            # reference default: 10% of the chain (TraceAnalysis.report
            # with burnin=-1)
            n0 = len(next(v for k, v in table.items() if k[0] != "_"))
            burn = n0 // 10
        else:
            burn = burn_states // states_per_sample
        for exp in el.findall("expectation"):
            name = exp.get("name")
            expected = float(exp.get("value"))
            if name not in table:
                # the reference silently skips expectations whose name
                # matches no trace (TraceAnalysisParser.java:86-90 only
                # acts inside the name-equality branch)
                import warnings

                warnings.warn(
                    f"expectation {name!r} matches no column in {fname} "
                    f"(skipped, reference semantics)")
                continue
            samples = table[name][burn:]
            st = analyze(samples)
            err = abs(st.mean - expected)
            tol = tolerance_se * max(st.std_error_of_mean, 1e-12)
            self.assertions.append((fname, name, st.mean, expected,
                                    st.std_error_of_mean))
            if not err <= tol:
                msg = (
                    f"{os.path.basename(self.path)}: E[{name}] = {st.mean:.6g}"
                    f" vs expected {expected:.6g} (|diff| {err:.3g} >"
                    f" {tolerance_se} SE = {tol:.3g}, n={samples.size})"
                )
                if self.strict_expectations:
                    raise AssertionError(msg)
                import warnings

                warnings.warn("WARNING (reference semantics): " + msg)


# ---------------------------------------------------------------------------
# lifted operators for params-resident trees
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ParamsTreeOperator:
    """Lift a tree operator to act on a params-resident tree (a secondary
    gene tree of a multilocus analysis): reconstruct the TreeState from
    params, run the inner proposal, write the fields back. The inner
    operator's adaptation surface is delegated."""

    inner: object = None
    keys: tuple = ()  # (parent, children, heights, root) params keys
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = False

    def modified_params(self):
        base = self.inner.modified_params()
        return tuple(base or ()) + self.keys

    def initial_adapt(self):
        return self.inner.initial_adapt()

    def tuning(self, adapt_value):
        return self.inner.tuning(adapt_value)

    def bind_log_posterior(self, lp):
        if hasattr(self.inner, "bind_log_posterior"):
            self.inner.bind_log_posterior(lp)

    def propose(self, params, tree, key, tuning):
        from beast_mcmc_tpu.tree.topology import TreeState

        kp, kc, kh, kr = self.keys
        t2 = TreeState(parent=params[kp], children=params[kc],
                       heights=params[kh], root=params[kr])
        out = self.inner.propose(params, t2, key, tuning)
        p2, t2n, logh = out[0], out[1], out[2]
        p2 = {**p2, kp: t2n.parent, kc: t2n.children, kh: t2n.heights,
              kr: t2n.root}
        return (p2, tree, logh) + tuple(out[3:])


# ---------------------------------------------------------------------------
# builders (the parser registry)
# ---------------------------------------------------------------------------

_BUILDERS: Dict[str, Callable] = {}

# operator-tag extension registry: extension modules (xml_hmc, xml_traits)
# add operator builders without editing _build_operator's dispatch chain.
# Builder signature: (ax, el, weight) -> (operator | [operators], tree_id)
_OP_EXT: Dict[str, Callable] = {}


def register(*tags):
    def deco(fn):
        for t in tags:
            _BUILDERS[t] = fn
        return fn

    return deco


def register_operator(*tags):
    def deco(fn):
        for t in tags:
            _OP_EXT[t] = fn
        return fn

    return deco


# -- data -------------------------------------------------------------------


def _date_value(d) -> float:
    """Decimal-year value of a <date> (ref: dr.evolution.util.Date —
    accepts a number or a dd/MM/yyyy calendar string)."""
    v = d.get("value")
    try:
        return float(v)
    except ValueError:
        pass
    parts = v.replace("-", "/").split("/")
    if len(parts) == 3:
        day, month, year = (int(parts[0]), int(parts[1]), int(parts[2]))
        if day > 31:  # yyyy/MM/dd
            day, year = year, day
        import datetime

        dt0 = datetime.date(year, month, day)
        start = datetime.date(year, 1, 1)
        length = (datetime.date(year + 1, 1, 1) - start).days
        return year + (dt0 - start).days / length
    raise XmlError(f"cannot parse date value {v!r}")


@register("taxa")
def _taxa(ax: XmlAnalysis, el):
    taxa = []
    for t in el:
        t = ax.deref(t)
        if t.tag != "taxon":
            continue
        name = t.get("id")
        height = 0.0
        d = t.find("date")
        if d is not None:
            d = ax.deref(d)
            v = _date_value(d)
            direction = d.get("direction", "backwards")
            height = v if direction == "backwards" else -v
        # taxon attributes (continuous trait vectors, discrete states;
        # ref: AttributeParser via TaxonParser — <attr name="X">v ...</attr>)
        for a in t.findall("attr"):
            ax._taxon_attrs.setdefault(name, {})[a.get("name")] = (
                (a.text or "").split()
            )
        taxa.append((name, height))
    # heights are ages relative to the youngest tip
    if taxa:
        m = min(h for _, h in taxa)
        taxa = [(n, h - m) for n, h in taxa]
    return taxa


@register("date")
def _date(ax, el):
    return el


@register("alignment")
def _alignment(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.data.alignment import Alignment
    from beast_mcmc_tpu.data.datatype import (
        AMINO_ACIDS,
        BINARY,
        NUCLEOTIDES,
    )

    dt = el.get("dataType", "nucleotide")
    datatype = {"nucleotide": NUCLEOTIDES, "amino acid": AMINO_ACIDS,
                "binary": BINARY, "twoStates": BINARY}.get(dt)
    if datatype is None:
        for d_el in ax.root.iter("generalDataType"):
            if d_el.get("id") == dt:
                datatype = ax.build(d_el)
                break
    if datatype is None:
        raise Unsupported(f"alignment dataType {dt!r}")
    taxa, seqs, dates = [], [], {}
    for s in el.findall("sequence"):
        tx = ax.deref(s.find("taxon"))
        name = tx.get("id")
        seq = "".join((s.text or "").split())
        for sub in s:
            if sub.tail:
                seq += "".join(sub.tail.split())
        seq = seq.upper()
        if dt in ("binary", "twoStates"):
            # tolerate stray characters in binary sequences (corpus typo
            # 'q' in testNewLatentLiabilityGibbs.xml:17 — the reference's
            # TwoStates.getState would index out of range on it)
            seq = "".join(ch for ch in seq
                          if ch in datatype.char_map)
        taxa.append(name)
        seqs.append(seq)
        d = tx.find("date")
        if d is not None:
            d = ax.deref(d)
            v = _date_value(d)
            if d.get("direction", "backwards") == "backwards":
                dates[name] = -v
            else:
                dates[name] = v
    return Alignment.from_sequences(taxa, seqs, datatype,
                                    dates=dates or None)


@register("patterns")
def _patterns(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.data.alignment import SitePatterns

    from beast_mcmc_tpu.data.alignment import Alignment

    src = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("alignment", "beagleSequenceSimulator",
                      "sequenceSimulator", "convert"):
            built = ax.build(cc)
            if isinstance(built, Alignment):
                src = built
    if src is None:
        raise XmlError("<patterns> without <alignment>")
    frm = _attr(el, "from", 1, int) - 1
    to = _attr(el, "to", -1, int)
    to = to - 1 if to and to > 0 else -1
    every = _attr(el, "every", 1, int)
    pats = SitePatterns.from_alignment(src, site_range=(frm, to),
                                       every=every)
    if not _attr(el, "unique", True, bool):
        # site-order-preserving (ref: SitePatternsParser UNIQUE=false —
        # per-site traits like latent liabilities need column identity)
        lo, hi = frm, (src.n_sites if to < 0 else to + 1)
        states = src.states[:, lo:hi:every]
        pats = SitePatterns(
            taxa=pats.taxa, states=states,
            weights=np.ones(states.shape[1]), datatype=pats.datatype,
            n_sites=states.shape[1])
    return pats


@register("ascertainedPatterns")
def _ascertained_patterns(ax: XmlAnalysis, el):
    """ref: AscertainedSitePatternsParser — data patterns plus the
    include/exclude correction columns; the likelihood renormalizes each
    site by P(ascertainable) (models/treelikelihood.ascertained_loglik)."""
    from beast_mcmc_tpu.data.alignment import SitePatterns

    src = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "alignment":
            src = ax.build(cc)
    if src is None:
        raise XmlError("<ascertainedPatterns> without <alignment>")
    frm = _attr(el, "from", 1, int) - 1
    to = _attr(el, "to", -1, int)
    to = to - 1 if to and to > 0 else -1
    pats = SitePatterns.from_alignment(src, site_range=(frm, to))
    # correction columns, 1-based site ranges on the ORIGINAL alignment
    cols = []
    for tag in ("excludePatterns", "includePatterns"):
        for sub in el.findall(tag):
            a = _attr(sub, "from", 1, int) - 1
            b = _attr(sub, "to", a + 1, int)
            cols.append(src.states[:, a:b])
    if cols:
        pats.ascertain_excluded = np.concatenate(cols, axis=1)
        pats.ascertain_include = el.find("includePatterns") is not None
    return pats


@register("mergePatterns")
def _merge_patterns(ax: XmlAnalysis, el):
    parts = [ax.build(c) for c in el if ax.deref(c).tag == "patterns"]
    if not parts:
        raise XmlError("<mergePatterns> without <patterns>")
    import dataclasses as dc

    from beast_mcmc_tpu.data.alignment import SitePatterns

    base = parts[0]
    states = np.concatenate([p.states for p in parts], axis=1)
    weights = np.concatenate([p.weights for p in parts])
    return SitePatterns(
        taxa=base.taxa, states=states, weights=weights,
        datatype=base.datatype, n_sites=sum(p.n_sites for p in parts),
    )


@register("parameter")
def _parameter(ax: XmlAnalysis, el):
    name = el.get("id")
    if name is None:
        name = f"param{len(ax._params)}"
    if name in ax._aliases:
        return ax._aliases[name]
    if name in ax._params:
        return ax._params[name]
    vals = _text_values(el)
    dim = _attr(el, "dimension", None, int)
    if vals.size == 0:
        # ref: ParameterParser.java:140-149 — with a dimension attr the
        # values default to ZEROS; a bare <parameter/> is a single 1.0
        vals = np.zeros(dim) if dim else np.ones(1)
    elif dim and vals.size == 1:
        vals = np.full(dim, vals[0])
    def bound(attr, default):
        v = el.get(attr)
        if v is None:
            return default
        return float(v.split()[0])  # per-dim bounds: use the first

    lo = bound("lower", -np.inf)
    hi = bound("upper", np.inf)
    # ref: ParameterParser.java:218-226 — parse-time values are clamped
    # into the declared bounds
    vals = np.clip(vals, lo, hi)
    p = Param(
        name=name,
        value=vals if vals.size > 1 else np.asarray(float(vals[0])),
        lower=lo,
        upper=hi,
    )
    ax._params[name] = p
    return p


@dataclasses.dataclass
class CompoundParam:
    names: List[str]


@register("matrixParameter")
def _matrix_parameter(ax: XmlAnalysis, el):
    """Constant design matrix from row <parameter> values (ref:
    MatrixParameter; covariate matrices are fixed data here)."""
    rows = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            rows.append(_text_values(cc))
    return np.stack(rows, axis=1)  # [n_field, P] — rows are covariates


@register("multivariateNormalPrior")
def _mvn_prior(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.priors import multivariate_normal_logpdf

    mean = _text_values(ax.deref(_child_of(_child_of(el, "meanParameter"),
                                           "parameter")))
    prec_el = el.find("precisionMatrix")
    if prec_el is None:
        prec_el = el.find("precisionParameter")
    prec = None
    if prec_el is not None:
        for c in prec_el:
            cc = ax.deref(c)
            if cc.tag == "matrixParameter":
                prec = ax.build(cc).T
    if prec is None:
        prec = np.eye(mean.size)
    data_el = el.find("data")
    targets = _targets_of(ax, data_el if data_el is not None else el)

    def fn(params, tree):
        tot = 0.0
        for t in targets:
            v = jnp.ravel(t(params, tree))
            m = jnp.asarray(mean, v.dtype)
            # a target whose length is a multiple of the mean dimension
            # is scored row-wise (ref: MultivariateDistributionLikelihood
            # evaluates each Parameter draw separately)
            rows = jnp.reshape(v, (-1, m.shape[0]))
            tot = tot + jnp.sum(jax.vmap(
                lambda r: multivariate_normal_logpdf(
                    r, m, precision=jnp.asarray(prec, v.dtype)))(rows))
        return tot

    return LikelihoodFn(fn, None, "multivariateNormalPrior")


@dataclasses.dataclass
class JointTipAlias:
    """<jointParameter> over leaf-height views of several trees."""

    targets: tuple = ()  # (tree_id, tip_index)


@register("jointParameter")
def _joint_parameter(ax: XmlAnalysis, el):
    """ref: JointParameterParser — one value mirrored across several
    parameters; here specifically the shared-tip-age case (leaf-height
    views across unlinked gene trees)."""
    targets = []
    for c in el:
        cc = ax.deref(c)
        obj = ax.build(cc)
        if isinstance(obj, TreeAlias) and obj.kind == "leaf_height":
            targets.append((obj.tree_id, obj.tip_index))
        else:
            raise Unsupported("jointParameter over non-tip parameters")
    return JointTipAlias(tuple(dict.fromkeys(targets)))


@register("compoundParameter", "CompoundParameter")
def _compound_parameter(ax, el):
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            names.append(obj.name)
    return CompoundParam(names)


# -- demographics -----------------------------------------------------------


@register("constantSize")
def _constant_size(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))

    def ll(heights, n_taxa, params):
        return constant_coalescent_loglik(heights, n_taxa, params[pname])

    return Demographic("constant", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("exponentialGrowth")
def _exponential_growth(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import exponential_growth_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    gr = el.find("growthRate")
    dbl = el.find("doublingTime")
    if gr is not None:
        gname = ax.param_from(gr)

        def ll(heights, n_taxa, params):
            return exponential_growth_loglik(
                heights, n_taxa, params[pname], params[gname]
            )
    elif dbl is not None:
        dname = ax.param_from(dbl)

        def ll(heights, n_taxa, params):
            r = jnp.log(2.0) / params[dname]
            return exponential_growth_loglik(
                heights, n_taxa, params[pname], r
            )
    else:
        raise XmlError("exponentialGrowth without growthRate/doublingTime")
    return Demographic("exponential", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("expansion")
def _expansion(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import expansion_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    aname = ax.param_from(_child_of(el, "ancestralPopulationProportion"))
    gr, dbl = el.find("growthRate"), el.find("doublingTime")
    if gr is not None:
        gname = ax.param_from(gr)

        def rate_of(params):
            return params[gname]
    elif dbl is not None:
        dname = ax.param_from(dbl)

        def rate_of(params):
            return jnp.log(2.0) / params[dname]
    else:
        raise XmlError("expansion without growthRate/doublingTime")

    def ll(heights, n_taxa, params):
        return expansion_loglik(
            heights, n_taxa, params[pname], params[aname], rate_of(params)
        )

    return Demographic("expansion", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))




@register("piecewisePopulation")
def _piecewise_population(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import piecewise_exponential_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    gr = el.find("growthRates")
    if gr is None:
        raise Unsupported("piecewisePopulation without growthRates")
    gname = ax.param_from(gr)
    widths = np.array([
        float(x) for x in _child_of(el, "epochWidths").get("widths").split()
    ])

    def ll(heights, n_taxa, params):
        return piecewise_exponential_loglik(
            heights, n_taxa, params[pname], params[gname], widths
        )

    return Demographic("piecewise", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("cataclysm")
def _cataclysm(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import cataclysm_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))
    sname = ax.param_from(_child_of(el, "spikeFactor"))
    tname = ax.param_from(_child_of(el, "timeOfCataclysm"))

    def ll(heights, n_taxa, params):
        return cataclysm_loglik(
            heights, n_taxa, params[pname], params[gname], params[sname],
            params[tname],
        )

    return Demographic("cataclysm", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("constantExponential")
def _constant_exponential(ax: XmlAnalysis, el):
    """ref: ConstantExponentialModelParser + ConstantExponentialModel
    .java:93-104 — N1 derived as N0 exp(-time * r)."""
    from beast_mcmc_tpu.models.coalescent import const_exponential_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    tname = ax.param_from(_child_of(el, "growthPhaseStartTime"))
    gr, dbl = el.find("growthRate"), el.find("doublingTime")
    if gr is not None:
        gname = ax.param_from(gr)
        rate_of = lambda params: params[gname]
    elif dbl is not None:
        dname = ax.param_from(dbl)
        rate_of = lambda params: jnp.log(2.0) / params[dname]
    else:
        raise XmlError("constantExponential without growthRate/doublingTime")

    def ll(heights, n_taxa, params):
        r = rate_of(params)
        n0 = params[pname]
        n1 = n0 * jnp.exp(-params[tname] * r)
        return const_exponential_loglik(heights, n_taxa, n0, n1, r)

    return Demographic("constantExponential", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("exponentialConstant")
def _exponential_constant(ax: XmlAnalysis, el):
    """ref: ExponentialConstantModelParser + ExpConstant.java."""
    from beast_mcmc_tpu.models.coalescent import exp_constant_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))
    tname = ax.param_from(_child_of(el, "transitionTime"))

    def ll(heights, n_taxa, params):
        return exp_constant_loglik(
            heights, n_taxa, params[pname], params[gname], params[tname])

    return Demographic("exponentialConstant", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("constantLogistic")
def _constant_logistic(ax: XmlAnalysis, el):
    """ref: ConstantLogisticModelParser + ConstLogistic.java."""
    from beast_mcmc_tpu.models.coalescent import const_logistic_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    aname = ax.param_from(_child_of(el, "ancestralPopulationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))
    sname = ax.param_from(_child_of(el, "shape"))
    # the XML <shape> is a TIME; the logistic c is derived with the
    # required alpha attribute (ref: ConstantLogisticModel.java:106 —
    # C = (1-alpha) exp(-r shape) / alpha)
    alpha = _attr(el, "alpha", None, float)
    if alpha is None:
        raise Unsupported(
            "<constantLogistic> without required alpha attribute")

    def ll(heights, n_taxa, params):
        r = params[gname]
        c = (1.0 - alpha) * jnp.exp(-r * params[sname]) / alpha
        return const_logistic_loglik(
            heights, n_taxa, params[pname], params[aname], r, c)

    return Demographic("constantLogistic", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("exponentialExponential")
def _exponential_exponential(ax: XmlAnalysis, el):
    """ref: ExponentialExponentialModelParser — two growth phases with a
    transition time (MultiEpochExponential with K=2)."""
    from beast_mcmc_tpu.models.coalescent import (
        multi_epoch_exponential_loglik)

    pname = ax.param_from(_child_of(el, "populationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))
    aname = ax.param_from(_child_of(el, "ancestralGrowthRate"))
    tname = ax.param_from(_child_of(el, "transitionTime"))

    def ll(heights, n_taxa, params):
        rates = jnp.stack([jnp.ravel(params[gname])[0],
                           jnp.ravel(params[aname])[0]])
        tts = jnp.ravel(params[tname])[:1]
        return multi_epoch_exponential_loglik(
            heights, n_taxa, params[pname], rates, tts)

    return Demographic("exponentialExponential", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("multiEpochExponential")
def _multi_epoch_exponential(ax: XmlAnalysis, el):
    """ref: MultiEpochExponentialModelParser + MultiEpochExponential.java."""
    from beast_mcmc_tpu.models.coalescent import (
        multi_epoch_exponential_loglik)

    pname = ax.param_from(_child_of(el, "populationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))
    tname = ax.param_from(_child_of(el, "transitionTime"))

    def ll(heights, n_taxa, params):
        return multi_epoch_exponential_loglik(
            heights, n_taxa, params[pname], params[gname], params[tname])

    return Demographic("multiEpochExponential", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("exponentialSawtooth")
def _exponential_sawtooth(ax: XmlAnalysis, el):
    """ref: ExponentialSawtoothModelParser + ExponentialSawtooth.java."""
    from beast_mcmc_tpu.models.coalescent import (
        exponential_sawtooth_loglik)

    pname = ax.param_from(_child_of(el, "populationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))
    wname = ax.param_from(_child_of(el, "wavelength"))
    oname = ax.param_from(_child_of(el, "offset"))

    def ll(heights, n_taxa, params):
        return exponential_sawtooth_loglik(
            heights, n_taxa, params[pname], params[gname], params[wname],
            params[oname])

    return Demographic("exponentialSawtooth", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("exponentialLogistic")
def _exponential_logistic(ax: XmlAnalysis, el):
    """ref: ExponentialLogisticModelParser + ExponentialLogistic.java
    (logisticGrowthRate/logisticShape/exponentialGrowthRate/
    transitionTime vocabulary)."""
    from beast_mcmc_tpu.models.coalescent import (
        exponential_logistic_loglik)

    pname = ax.param_from(_child_of(el, "populationSize"))
    lg = ax.param_from(_child_of(el, "logisticGrowthRate"))
    ls = ax.param_from(_child_of(el, "logisticShape"))
    eg = ax.param_from(_child_of(el, "exponentialGrowthRate"))
    tt = ax.param_from(_child_of(el, "transitionTime"))

    def ll(heights, n_taxa, params):
        return exponential_logistic_loglik(
            heights, n_taxa, params[pname], params[lg], params[ls],
            params[eg], params[tt])

    return Demographic("exponentialLogistic", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("linearGrowth")
def _linear_growth(ax: XmlAnalysis, el):
    """ref: LinearGrowthModelParser (slope vocabulary)."""
    from beast_mcmc_tpu.models.coalescent import linear_growth_loglik

    sname = ax.param_from(_child_of(el, "slope"))

    def ll(heights, n_taxa, params):
        return linear_growth_loglik(heights, n_taxa, params[sname])

    return Demographic("linearGrowth", {"pop": sname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(sname))[0]))


@register("powerLawGrowth")
def _power_law_growth(ax: XmlAnalysis, el):
    """ref: PowerLawGrowthModelParser + PowerLawGrowth.java."""
    from beast_mcmc_tpu.models.coalescent import power_law_growth_loglik

    pname = ax.param_from(_child_of(el, "populationSize"))
    rname = ax.param_from(_child_of(el, "power"))

    def ll(heights, n_taxa, params):
        return power_law_growth_loglik(
            heights, n_taxa, params[pname], params[rname])

    return Demographic("powerLawGrowth", {"pop": pname}, ll,
                       sim_pop=float(np.ravel(ax.value_of(pname))[0]))


@register("piecewisePopulationSize")
def _piecewise_pop_size_model(ax: XmlAnalysis, el):
    """Log-space piecewise model: N(0)=exp(logN0); chained exponential
    epochs with given durations (ref: demographicmodel
    PiecewisePopulationSizeModel / MultiEpochExponentialModel — epoch k
    continues from epoch k-1's end size at its own growth rate)."""
    from beast_mcmc_tpu.models.coalescent import piecewise_exponential_loglik

    pname = ax.param_from(_child_of(el, "logPopulationSize"))
    rate_names = []
    for ep in _child_of(el, "epochs"):
        epc = ax.deref(ep)
        if epc.tag == "exponentialPopulationSize":
            rate_names.append(ax.param_from(_child_of(epc, "growthRate")))
    dname = ax.param_from(_child_of(el, "epochDurations"))
    k = len(rate_names)

    def ll(heights, n_taxa, params):
        lams = jnp.stack([jnp.reshape(params[r], ()) for r in rate_names])
        widths = jnp.broadcast_to(jnp.ravel(params[dname]), (k - 1,))
        return piecewise_exponential_loglik(
            heights, n_taxa, jnp.exp(params[pname])[None], lams, widths
        )

    return Demographic("piecewise_log", {"pop": pname}, ll,
                       sim_pop=float(np.exp(np.ravel(ax.value_of(pname))[0])))


@register("constantPopulationSize")
def _constant_pop_size_model(ax: XmlAnalysis, el):
    """Log-space constant-size model (ref:
    dr.evomodel.coalescent.demographicmodel ConstantPopulationSizeModel:
    the parameter is log N)."""
    from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik

    pname = ax.param_from(_child_of(el, "logPopulationSize"))

    def ll(heights, n_taxa, params):
        return constant_coalescent_loglik(
            heights, n_taxa, jnp.exp(params[pname])
        )

    return Demographic("constant_log", {"pop": pname}, ll,
                       sim_pop=float(np.exp(np.ravel(ax.value_of(pname))[0])))


@register("exponentialPopulationSize")
def _exponential_pop_size_model(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import exponential_growth_loglik

    pname = ax.param_from(_child_of(el, "logPopulationSize"))
    gname = ax.param_from(_child_of(el, "growthRate"))

    def ll(heights, n_taxa, params):
        return exponential_growth_loglik(
            heights, n_taxa, jnp.exp(params[pname]), params[gname]
        )

    return Demographic("exponential_log", {"pop": pname}, ll,
                       sim_pop=float(np.exp(np.ravel(ax.value_of(pname))[0])))

def _child_of(el, tag):
    c = el.find(tag)
    if c is None:
        raise XmlError(f"<{el.tag}> missing <{tag}>")
    return c


# -- trees --------------------------------------------------------------


def _scale_start_tree(n_tips, parent, heights, root, root_height):
    """Scale INTERNAL heights so the root lands at root_height, then
    push any internal below its tallest child back up (ref:
    CoalescentSimulator.attemptToScaleTree:132-142 +
    MutableTree.Utils.correctHeightsForTips)."""
    s = root_height / heights[root]
    heights[n_tips:] *= s
    # the reference clamps violated parents EXACTLY onto their child
    # (correctHeightsForTips), which can leave conflicting tips at zero
    # genetic distance -> likelihood exactly 0. Its CI survives because
    # the Java seed-666 draw happens to scale UP; our stream cannot
    # match, so keep a strictly positive epsilon to stay finite.
    eps = 1e-6 * root_height
    for _ in range(len(heights)):  # bottom-up fixpoint, host-side
        changed = False
        for i in range(len(heights)):
            p = parent[i]
            if p >= 0 and heights[p] < heights[i] + eps:
                heights[p] = heights[i] + eps
                changed = True
        if not changed:
            break
    return heights


@register("coalescentTree", "coalescentSimulator")
def _coalescent_tree(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

    ax._rng_used = True  # start tree is a seeded-RNG draw; see xml_assert
    taxa, demo, subtrees = None, None, []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "taxa":
            taxa = ax.build(cc)
        elif cc.tag in ("constantSize", "exponentialGrowth", "expansion",
                      "piecewisePopulation", "cataclysm",
                      "constantPopulationSize",
                      "exponentialPopulationSize", "piecewisePopulationSize"):
            demo = ax.build(cc)
        elif cc.tag in ("coalescentTree", "coalescentSimulator"):
            subtrees.append(ax.build(cc))
    if taxa is None and not subtrees:
        raise XmlError(f"<{el.tag}> without <taxa>")
    pop = demo.sim_pop if demo else 1.0
    if not subtrees:
        names = [n for n, _ in taxa]
        tips = np.array([h for _, h in taxa])
        parent, children, heights, root = simulate_coalescent_tree(
            ax._rng, tips, pop_size=pop
        )
        rh = _attr(el, "rootHeight", -1.0, float)
        if rh > 0:
            heights = _scale_start_tree(len(tips), parent, heights, root, rh)
        return (names, tips, parent, children, heights, root)
    # nested constrained simulation (monophyly construction, ref:
    # CoalescentSimulator.java:simulateTree over subtree roots): simulate
    # each nested clade, then coalesce clade roots + leftover taxa; the
    # leftover process starts above the tallest clade root.
    all_names = [n for n, _ in (taxa or [])]
    sub_names = [n for s in subtrees for n in s[0]]
    free = [(n, h) for n, h in (taxa or []) if n not in sub_names]
    names = sub_names + [n for n, _ in free]
    n_total = len(names)
    m_total = 2 * n_total - 1
    parent = np.full(m_total, -1, np.int32)
    children = np.full((m_total, 2), -1, np.int32)
    heights = np.zeros(m_total)
    # place subtree tips/internals into the global arrays
    name_to_idx = {n: i for i, n in enumerate(names)}
    next_internal = n_total
    unit_roots = []  # (global node id, height) of each coalescing unit
    for s in subtrees:
        snames, stips, sparent, schildren, sheights, sroot = s
        n_s = len(snames)
        mapping = {}
        for li, n in enumerate(snames):
            mapping[li] = name_to_idx[n]
            heights[name_to_idx[n]] = sheights[li]
        for li in range(n_s, 2 * n_s - 1):
            mapping[li] = next_internal
            heights[next_internal] = sheights[li]
            next_internal += 1
        for li in range(2 * n_s - 1):
            gi = mapping[li]
            if sparent[li] >= 0:
                parent[gi] = mapping[int(sparent[li])]
            for k in range(2):
                if schildren[li, k] >= 0:
                    children[gi, k] = mapping[int(schildren[li, k])]
        unit_roots.append((mapping[int(sroot)], float(sheights[int(sroot)])))
    for n, h in free:
        heights[name_to_idx[n]] = h
        unit_roots.append((name_to_idx[n], h))
    # coalesce the units with the stock simulator, then splice
    unit_tips = np.array([h for _, h in unit_roots])
    up, uc, uh, ur = simulate_coalescent_tree(
        ax._rng, unit_tips, pop_size=pop
    )
    n_u = len(unit_roots)
    umap = {}
    for ui in range(n_u):
        umap[ui] = unit_roots[ui][0]
    for ui in range(n_u, 2 * n_u - 1):
        umap[ui] = next_internal
        heights[next_internal] = uh[ui]
        next_internal += 1
    for ui in range(2 * n_u - 1):
        gi = umap[ui]
        if up[ui] >= 0:
            parent[gi] = umap[int(up[ui])]
        if ui >= n_u:
            for k in range(2):
                children[gi, k] = umap[int(uc[ui, k])]
    root = umap[int(ur)]
    rh = _attr(el, "rootHeight", -1.0, float)
    if rh > 0:
        heights = _scale_start_tree(n_total, parent, heights, root, rh)
    tips = heights[:n_total].copy()
    return (names, tips, parent, children, heights, root)


def _binarize_newick(text: str) -> str:
    """Resolve multifurcations with zero-length internal branches (the
    pulley principle keeps reversible likelihoods identical — ref:
    NewickImporter tolerates polytomies; the flat-array tree is binary)."""

    pos = 0

    def parse_node():
        nonlocal pos
        if text[pos] == "(":
            pos += 1
            kids = [parse_node()]
            while text[pos] == ",":
                pos += 1
                kids.append(parse_node())
            assert text[pos] == ")"
            pos += 1
            label = ""
            while pos < len(text) and text[pos] not in ",();":
                label += text[pos]
                pos += 1
            while len(kids) > 2:
                kids = [f"({kids[0]},{kids[1]}):0.0"] + kids[2:]
            return f"({','.join(kids)}){label}"
        label = ""
        while pos < len(text) and text[pos] not in ",();":
            label += text[pos]
            pos += 1
        return label

    out = parse_node()
    return out + ";"


@register("newick")
def _newick(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.tree.topology import parse_newick

    text = (el.text or "").strip()
    for sub in el:
        if sub.tail:
            text += sub.tail.strip()
    if "'" not in text and '"' not in text:
        text = _binarize_newick(
            "".join(text.split()))  # whitespace is insignificant unquoted
    parent, children, heights, root, names = parse_newick(text)
    m = parent.shape[0]
    n_tips = (m + 1) // 2
    tips = heights[:n_tips]
    return (names, tips, parent, children, heights, root)


@register("treeModel")
def _tree_model(ax: XmlAnalysis, el):
    tree_id = el.get("id") or f"tree{len(ax._trees)}"
    src = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("coalescentTree", "coalescentSimulator", "newick",
                      "tree", "upgmaTree", "neighborJoiningTree",
                      "rescaledTree"):
            src = ax.build(cc)
            break
    if src is None:
        raise XmlError("<treeModel> without a starting tree")
    names, tips, parent, children, heights, root = src
    tm = TreeModel(tree_id, names, tips, parent, children, heights, root)
    ax._trees[tree_id] = tm
    # register tree-view parameter aliases
    for c in el:
        if c.tag == "rootHeight":
            p = ax.deref(_child_of(c, "parameter"))
            ax._aliases[p.get("id")] = TreeAlias("root_height", tree_id)
        elif c.tag == "nodeHeights":
            p = ax.deref(_child_of(c, "parameter"))
            rn = _attr(c, "rootNode", False, bool)
            kind = "all_heights" if rn else "internal_heights"
            ax._aliases[p.get("id")] = TreeAlias(kind, tree_id)
        elif c.tag == "leafHeight":
            taxon = c.get("taxon")
            p = ax.deref(_child_of(c, "parameter"))
            idx = names.index(taxon)
            ax._aliases[p.get("id")] = TreeAlias("leaf_height", tree_id, idx)
            tm.sampled_tips[taxon] = idx
        elif c.tag == "nodeTraits":
            # continuous trait matrix over leaf nodes from taxon attrs
            # (ref: TreeModelParser.java NODE_TRAITS — registers the trait
            # parameter; values come from <attr name=...> on taxa)
            tname = c.get("name") or "trait"
            d = _attr(c, "traitDimension", 1, int)
            leaf = _attr(c, "leafNodes", False, bool)
            internal = _attr(c, "internalNodes", False, bool)
            root_too = _attr(c, "rootNode", False, bool)
            p = ax.deref(_child_of(c, "parameter"))
            pname = p.get("id") or f"{tree_id}.{tname}"
            init = None
            if c.get("initialValue"):
                init = np.array(
                    [float(x) for x in c.get("initialValue").split()])
            if leaf and internal and root_too:
                # ALL-node trait storage (sampled comparative-methods
                # mode, ref: TreeModelParser createNodeTraitsParameter
                # over every node): [M, d] in node-index order, tips from
                # taxon attrs. Later nodeTraits of the SAME trait become
                # index views of this canonical vector.
                n = len(names)
                m_nodes = 2 * n - 1
                vals = np.zeros((m_nodes, d))
                for i, nm in enumerate(names):
                    raw = ax._taxon_attrs.get(nm, {}).get(tname)
                    if raw is not None:
                        vals[i] = [0.0 if s.upper() in ("NA", "?")
                                   else float(s) for s in raw[:d]]
                ax._params[pname] = Param(name=pname,
                                          value=vals.reshape(-1))
                ax._built[id(p)] = ax._params[pname]
                ax._traits[(tree_id, tname)] = {
                    "param": pname, "dim": d,
                    "missing": np.zeros((n, d), bool), "n_tips": n,
                    "layout": "all_nodes", "root": int(root),
                }
                continue
            store = ax._traits.get((tree_id, tname))
            if store is not None and store.get("layout") == "all_nodes":
                # subset VIEW of the canonical all-node trait vector
                n = store["n_tips"]
                m_nodes = 2 * n - 1
                rt = store["root"]
                sel = []
                for node in range(m_nodes):
                    is_tip = node < n
                    is_root = node == rt
                    if ((is_tip and leaf)
                            or (is_root and root_too)
                            or ((not is_tip) and (not is_root)
                                and internal)):
                        sel.extend(range(node * d, (node + 1) * d))
                idx = np.asarray(sel, np.int64)
                base = store["param"]
                jidx = jnp.asarray(idx)
                fn = (lambda prms, nb=base, ix=jidx:
                      jnp.ravel(prms[nb])[ix])
                ax._derived_params[pname] = fn
                dp = DerivedParam(
                    pname, fn,
                    value=np.ravel(ax._params[base].value)[idx],
                    base=base, idx=idx)
                ax._built[id(p)] = dp
                continue
            if not leaf:
                # internal/root trait storage: a free parameter, one row
                # per selected node (no tip-data binding) — ref:
                # TreeModelParser.parseNodeTraits + createNodeTraitsParameter
                n_sel = (len(names) - 1 if internal else 0) + (
                    1 if root_too else 0)
                vals0 = np.zeros(max(n_sel, 1) * d)
                if init is not None:
                    vals0 = np.resize(init, vals0.shape)
                ax._params[pname] = Param(name=pname, value=vals0)
                ax._built[id(p)] = ax._params[pname]
                continue
            # the DATA wins over the declared traitDimension (ref:
            # TreeTraitParserUtilities re-reads the attributes and sizes
            # the parameter from them)
            first = next((ax._taxon_attrs.get(nm, {}).get(tname)
                          for nm in names
                          if ax._taxon_attrs.get(nm, {}).get(tname)),
                         None)
            if first is not None and len(first) != d:
                d = len(first)
            vals = np.zeros((len(names), d))
            mask = np.zeros((len(names), d), bool)
            for i, nm in enumerate(names):
                raw = ax._taxon_attrs.get(nm, {}).get(tname)
                if raw is None and "." in tname:
                    # likelihood-prefixed trait names resolve to the bare
                    # attr (ref: TreeTraitParserUtilities "fcd.X" -> "X")
                    raw = ax._taxon_attrs.get(nm, {}).get(
                        tname.split(".")[-1])
                if raw is None:
                    # no taxon attribute: latent/parameter-initialized
                    # trait (ref: createNodeTraitsParameter initialValues)
                    if init is not None:
                        vals[i] = np.resize(init, d)
                    continue
                if len(raw) != d:
                    raise XmlError(
                        f"attr {tname!r} of {nm!r} has {len(raw)} values, "
                        f"traitDimension={d}")
                for j, s in enumerate(raw):
                    if s.upper() in ("NA", "?"):
                        mask[i, j] = True
                    else:
                        vals[i, j] = float(s)
            ax._params[pname] = Param(name=pname, value=vals.reshape(-1))
            ax._traits[(tree_id, tname)] = {
                "param": pname, "dim": d, "missing": mask,
                "n_tips": len(names),
            }
            # building the <parameter id> later must resolve to this param
            ax._built[id(p)] = ax._params[pname]
    return tm


# -- substitution / site / clock models --------------------------------------


@register("frequencyModel")
def _frequency_model(ax: XmlAnalysis, el):
    """With an <alignment> child and a value-less parameter, the
    frequencies initialize to the alignment's EMPIRICAL base composition
    (ref: FrequencyModelParser.java — getEmpiricalStateFrequencies)."""
    f = el.find("frequencies")
    if f is None:
        raise XmlError("frequencyModel without frequencies")
    aln = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "alignment":
            aln = ax.build(cc)
    pel = ax.deref(_child_of(f, "parameter"))
    explicit = pel.get("value") is not None
    pname = ax.param_from(f)
    if aln is not None and not explicit:
        states = aln.states
        k = aln.datatype.state_count
        counts = np.zeros(k)
        for s in range(k):
            counts[s] = np.sum(states == s)
        ax._params[pname] = Param(
            pname, counts / counts.sum(), lower=0.0, upper=1.0
        )
    elif _attr(el, "normalize", False, bool):
        # ref: FrequencyModelParser.java:169-179 — normalize at parse;
        # an all-zero vector becomes uniform 1/K
        p = ax._params[pname]
        v = np.atleast_1d(np.asarray(p.value, float))
        tot = v.sum()
        v = v / tot if tot != 0 else np.full(v.size, 1.0 / v.size)
        ax._params[pname] = Param(pname, v, p.lower, p.upper)
    return pname


@register("HKYModel", "hkyModel")
def _hky_model(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.substitution import hky_eigen

    fq = _child_of(el, "frequencies")
    fm = None
    for c in fq:
        cc = ax.deref(c)
        if cc.tag == "frequencyModel":
            fm = ax.build(cc)
    if fm is None:
        fm = ax.param_from(fq)
    kname = ax.param_from(_child_of(el, "kappa"))

    def freqs(params):
        f = params[fm]
        return f / jnp.sum(f)

    def eigen(params):
        return hky_eigen(params[kname], freqs(params))

    return ("subst", eigen, freqs, 4)


@register("jcModel")
def _jc_model(ax: XmlAnalysis, el):
    """ref: the JC69 parser — equal rates, equal frequencies."""
    from beast_mcmc_tpu.models.substitution import hky_eigen

    def freqs(params):
        return jnp.full((4,), 0.25)

    def eigen(params):
        return hky_eigen(jnp.asarray(1.0), freqs(params))

    return ("subst", eigen, freqs, 4)


@register("taxon")
def _taxon_standalone(ax: XmlAnalysis, el):
    """ref: TaxonParser — a standalone taxon resolves to its id (taxa
    lists read dates/attrs structurally)."""
    return el.get("id") or el.get("idref")


@register("sequence")
def _sequence_standalone(ax: XmlAnalysis, el):
    """ref: SequenceParser — (taxon id, character string)."""
    tx = el.find("taxon")
    name = (ax.deref(tx).get("id") if tx is not None else None)
    chars = "".join("".join(el.itertext()).split())
    return (name, chars)


@register("gtrModel")
def _gtr_model(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.substitution import gtr_eigen

    fq = _child_of(el, "frequencies")
    fm = None
    for c in fq:
        cc = ax.deref(c)
        if cc.tag == "frequencyModel":
            fm = ax.build(cc)
    if fm is None:
        fm = ax.param_from(fq)
    names = {}
    for role in ("rateAC", "rateAG", "rateAT", "rateCG", "rateCT", "rateGT"):
        c = el.find(role)
        if c is not None:
            names[role] = ax.param_from(c)
    # single 6-dim <rates> vector (ref: GTRParser RATES — AC AG AT CG
    # CT GT order), the BEAUTi-generated form
    vec_name = None
    if not names:
        rt = el.find("rates")
        if rt is not None:
            vec_name = ax.param_from(rt)

    def freqs(params):
        f = params[fm]
        return f / jnp.sum(f)

    def eigen(params):
        if vec_name is not None:
            return gtr_eigen(jnp.ravel(params[vec_name]), freqs(params))
        one = jnp.asarray(1.0, params[fm].dtype)
        r = [
            params[names[k]] if k in names else one
            for k in ("rateAC", "rateAG", "rateAT", "rateCG", "rateCT",
                      "rateGT")
        ]
        return gtr_eigen(jnp.stack([jnp.reshape(x, ()) for x in r]),
                         freqs(params))

    return ("subst", eigen, freqs, 4)


class BranchModelSpec:
    """A per-branch substitution-model assignment (ref: branchmodel/
    EpochBranchModel.java:47 / BranchSpecificSubstitutionBranchModel):
    p_mats(params, tree, cat_rates, branch_rates) -> [M,C,S,S]."""

    def __init__(self, p_mats, freqs_of, k, root_subst=None):
        self.p_mats = p_mats
        self.freqs_of = freqs_of
        self.k = k
        self.root_subst = root_subst  # the root/oldest ("subst*", ...) tuple


@register("epochBranchModel")
def _epoch_branch_model(ax: XmlAnalysis, el):
    """ref: EpochBranchModelParser — <epoch transitionTime="t"> children
    (young to old) plus one final ancestral model; a branch spanning
    boundaries gets the oldest-first convolution of per-epoch transition
    matrices (models/epoch.epoch_branch_matrices — batched MXU matmuls
    over [M,C,S,S], the TPU form of beagle.convolveTransitionMatrices)."""
    models = []
    times = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "epoch":
            t_attr = cc.get("transitionTime")
            if t_attr is not None:
                times.append(float(t_attr))
            else:
                times.append(ax.param_from(cc))
            inner = None
            for d in cc:
                dd = ax.deref(d)
                if dd.tag == "parameter":
                    continue
                inner = ax.build(dd)
            models.append(inner)
        elif cc.tag in ("treeModel", "starTreeModel"):
            ax.build(cc)
        else:
            try:
                obj = ax.build(cc)
            except (Unsupported, XmlError):
                continue
            if isinstance(obj, tuple) and obj[0] in ("subst", "subst_q"):
                models.append(obj)
    if len(models) < 2 or len(times) != len(models) - 1:
        raise XmlError("epochBranchModel needs epochs + ancestral model")
    k = models[-1][3]

    def p_mats(params, tree, cat_rates, branch_rates):
        from beast_mcmc_tpu.models.epoch import epoch_branch_matrices

        dt = tree.heights.dtype
        # "subst" -> EigenSystem, "subst_q" -> generator Q; the epoch
        # convolution handles both
        mods = [m[1](params) for m in models]
        bounds = jnp.stack([
            jnp.reshape(params[t], ())[()] if isinstance(t, str)
            else jnp.asarray(t, dt)
            for t in times]).astype(dt)
        return epoch_branch_matrices(
            mods, bounds, tree.parent, tree.heights, branch_rates,
            cat_rates)

    # root frequencies come from the ancestral (oldest) epoch model
    # (ref: EpochBranchModel.getRootFrequencyModel)
    return BranchModelSpec(p_mats, models[-1][2], k, models[-1])


@register("branchSpecificSubstitutionModel",
          "estimableStemWeightBranchSpecificSubstitutionModel")
def _branch_specific_subst_model(ax: XmlAnalysis, el):
    """ref: BranchSpecificBranchModelParser +
    BranchSpecificBranchModel.setupNodeMaps:240-366 — base model on all
    branches; each <clade>'s MRCA subtree takes the clade model; the
    stem branch convolves P_base((1-w)L) @ P_clade(wL) with stemWeight
    w (attribute, or a <stemWeight> parameter for the estimable
    variant). MRCA + descendant masks are computed in-trace via
    parent-pointer doubling (models/epoch.clade_branch_matrices)."""
    base = None
    tm = None
    clades = []  # (taxa names, model tuple, float-or-param-name weight)
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
        elif cc.tag in ("clade", "externalBranches"):
            w = cc.get("stemWeight")
            w = float(w) if w is not None else 0.0
            model = None
            taxa = None
            for d in cc:
                dd = ax.deref(d)
                if dd.tag == "stemWeight":
                    w = ax.param_from(dd)
                elif dd.tag == "taxa":
                    taxa = ax.build(dd)
                else:
                    try:
                        obj = ax.build(dd)
                    except (Unsupported, XmlError):
                        continue
                    if isinstance(obj, tuple) and obj[0] in ("subst",
                                                             "subst_q"):
                        model = obj
            if model is None or taxa is None:
                raise XmlError(f"<{cc.tag}> needs taxa + model")
            clades.append((taxa, model, w))
        else:
            try:
                obj = ax.build(cc)
            except (Unsupported, XmlError):
                continue
            if isinstance(obj, tuple) and obj[0] in ("subst", "subst_q"):
                base = obj
    if base is None or tm is None:
        raise XmlError("branchSpecificSubstitutionModel needs tree + model")
    k = base[3]
    n = len(tm.taxa)
    specs = []
    for taxa, model, w in clades:
        mask = np.zeros(n, bool)
        for nm_t, _h in taxa:
            mask[tm.taxa.index(nm_t)] = True
        specs.append((mask, model, w))

    def p_mats(params, tree, cat_rates, branch_rates):
        from beast_mcmc_tpu.models.epoch import clade_branch_matrices

        dt = tree.heights.dtype
        built = [
            (jnp.asarray(mask, dt),
             model[1](params),
             jnp.reshape(params[w], ())[()] if isinstance(w, str)
             else jnp.asarray(w, dt))
            for mask, model, w in specs]
        return clade_branch_matrices(
            base[1](params), built, tree.parent, tree.heights, tree.root,
            branch_rates, cat_rates)

    return BranchModelSpec(p_mats, base[2], k, base)


@register("aminoAcidModel", "empiricalAminoAcidModel")
def _amino_acid_model(ax: XmlAnalysis, el):
    """ref: EmpiricalAminoAcidModelParser — named empirical replacement
    matrix (WAG/LG/JTT/...); optional <frequencies> override for +F."""
    from beast_mcmc_tpu.models.substitution import empirical_aa_eigen

    typ = el.get("type")
    fname = None
    fq = el.find("frequencies")
    if fq is not None:
        for c in fq:
            cc = ax.deref(c)
            if cc.tag == "frequencyModel":
                fname = ax.build(cc)

    def freqs(params):
        if fname is not None:
            f = params[fname]
            return f / jnp.sum(f)
        from beast_mcmc_tpu.models.data.aa_matrices import AA_MODELS

        return jnp.asarray(AA_MODELS[typ.upper()]["frequencies"],
                           ax.dtype)

    def eigen(params):
        f = freqs(params) if fname is not None else None
        return empirical_aa_eigen(typ, f, dtype=ax.dtype)

    return ("subst", eigen, freqs, 20)


@register("siteModel")
def _site_model(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.sitemodel import (
        discrete_gamma_rates,
        single_rate,
    )

    sub = None
    sm_el = el.find("substitutionModel")
    if sm_el is not None:
        for c in sm_el:
            sub = ax.build(ax.deref(c))
    else:
        # <branchSubstitutionModel> wraps a per-branch model assignment
        # (ref: GammaSiteRateModelParser BRANCH_SUBSTITUTION_MODEL);
        # branch models can also sit directly under <siteModel>
        bsm = el.find("branchSubstitutionModel")
        if bsm is not None:
            for c in bsm:
                sub = ax.build(ax.deref(c))
        else:
            for c in el:
                cc = ax.deref(c)
                if cc.tag in ("epochBranchModel",
                              "branchSpecificSubstitutionModel",
                              "estimableStemWeight"
                              "BranchSpecificSubstitutionModel"):
                    sub = ax.build(cc)
    if isinstance(sub, BranchModelSpec):
        spec = sub
        sub = ("branch", spec, spec.freqs_of, spec.k)
    if sub is None or sub[0] not in ("subst", "subst_q", "branch"):
        raise XmlError("<siteModel> missing <substitutionModel>")
    kind, eigen, freqs_of, s = sub

    gs = el.find("gammaShape")
    mu = el.find("mutationRate") or el.find("relativeRate")
    pinv = el.find("proportionInvariant")
    n_cat = int(gs.get("gammaCategories", "4")) if gs is not None else 1
    gname = ax.param_from(gs) if gs is not None else None
    mname = ax.param_from(mu) if mu is not None else None
    iname = ax.param_from(pinv) if pinv is not None else None

    def rates_weights(params, dtype):
        if gname is not None:
            p_inv = params[iname] if iname else None
            r, w = discrete_gamma_rates(
                params[gname], n_cat, p_invariant=p_inv, dtype=dtype,
                exact_quantiles=True,
            )
        elif iname is not None:
            from beast_mcmc_tpu.models.sitemodel import invariant_only_rates

            r, w = invariant_only_rates(params[iname], dtype=dtype)
        else:
            r, w = single_rate(dtype=dtype)
        if mname is not None:
            r = r * params[mname]
        return r, w

    return ({"subst": "site", "subst_q": "site_q",
             "branch": "site_branch"}[kind],
            eigen, freqs_of, s, rates_weights)



def _quantile_model(ax: XmlAnalysis, dist_el):
    """Quantile function q -> rate of the relaxed-clock rate distribution
    (logNormal / gamma / exponential distribution models, ref:
    dr.inference.distribution.* as used by DiscretizedBranchRates)."""
    from beast_mcmc_tpu.models.clock import lognormal_quantile

    for c in dist_el:
        cc = ax.deref(c)
        if cc.tag == "logNormalDistributionModel":
            mreal = _attr(cc, "meanInRealSpace", False, bool)
            mname = ax.param_from(_child_of(cc, "mean"))
            sname = ax.param_from(_child_of(cc, "stdev"))

            def qf(params, q):
                return lognormal_quantile(q, params[mname], params[sname],
                                          mreal)

            return qf
        if cc.tag == "gammaDistributionModel":
            from beast_mcmc_tpu.ops.special import gamma_quantile

            sh_el = cc.find("shape")
            mean_el = cc.find("mean")
            scale_el = cc.find("scale")
            shname = ax.param_from(sh_el)
            if mean_el is not None:
                mname = ax.param_from(mean_el)

                def qf(params, q):
                    scale = params[mname] / params[shname]
                    return gamma_quantile(q, params[shname], scale)
            else:
                scname = ax.param_from(scale_el)

                def qf(params, q):
                    return gamma_quantile(q, params[shname], params[scname])

            return qf
        if cc.tag == "exponentialDistributionModel":
            mname = ax.param_from(_child_of(cc, "mean"))

            def qf(params, q):
                return -params[mname] * jnp.log1p(-q)

            return qf
    raise Unsupported(
        f"relaxed-clock distribution <{[ax.deref(c).tag for c in dist_el]}>"
    )


@register("strictClockBranchRates")
def _strict_clock(ax: XmlAnalysis, el):
    rname = ax.param_from(_child_of(el, "rate"))

    def rates(params, tree):
        return params[rname]

    return ClockModel("strict", None, rates, rate_param=rname)


@register("discretizedBranchRates")
def _discretized_clock(ax: XmlAnalysis, el):
    tm = ax.build(_child_of(el, "treeModel"))
    qf = _quantile_model(ax, _child_of(el, "distribution"))
    cats_el = ax.deref(_child_of(_child_of(el, "rateCategories"), "parameter"))
    cname = cats_el.get("id")
    m = tm.parent.shape[0]
    n_cat = m - 1  # one category slot per branch (reference default)
    p = Param(cname, np.arange(m) % n_cat, integer=True)
    ax._params[cname] = p

    def rates(params, tree):
        q = (params[cname].astype(tree.heights.dtype) + 0.5) / n_cat
        return qf(params, q)

    return ClockModel("discretized", tm.tree_id, rates)


@register("continuousBranchRates")
def _continuous_clock(ax: XmlAnalysis, el):
    tm = ax.build(_child_of(el, "treeModel"))
    qf = _quantile_model(ax, _child_of(el, "distribution"))
    q_el = ax.deref(_child_of(_child_of(el, "rateCategoryQuantiles"),
                              "parameter"))
    qname = q_el.get("id")
    m = tm.parent.shape[0]
    p = Param(qname, np.full(m, 0.5), lower=1e-9, upper=1 - 1e-9)
    ax._params[qname] = p

    def rates(params, tree):
        return qf(params, params[qname])

    return ClockModel("continuous_quantile", tm.tree_id, rates)




@register("localClockModel")
def _local_clock(ax: XmlAnalysis, el):
    """Fixed local clocks on named clades (ref: LocalClockModel.java):
    branches inside each clade (optionally the stem) get that clade's
    rate; everything else the background rate. The clade membership is
    recomputed from the CURRENT topology every evaluation (mrca +
    descendant masks by pointer doubling) — topology moves stay valid."""
    from beast_mcmc_tpu.models.clock import ancestor_or_self_mask
    from beast_mcmc_tpu.models.speciation import mrca_node

    tm = ax.build(_child_of(el, "treeModel"))
    rname = ax.param_from(_child_of(el, "rate"))
    m = tm.parent.shape[0]
    clades = []
    for c in el.findall("clade"):
        crate = ax.param_from(c)
        taxa = None
        for t in c:
            tt = ax.deref(t)
            if tt.tag == "taxa":
                taxa = ax.build(tt)
        include_stem = _attr(c, "includeStem", False, bool)
        tip_set = np.zeros(m, bool)
        for n, _ in taxa:
            tip_set[tm.taxa.index(n)] = True
        clades.append((crate, jnp.asarray(tip_set), include_stem))

    def rates(params, tree):
        r = jnp.full((m,), 0.0, tree.heights.dtype) + params[rname]
        for crate, tip_set, include_stem in clades:
            node = mrca_node(tree.parent, tree.heights, tip_set)
            mask = ancestor_or_self_mask(tree.parent, node)
            # mask marks nodes having `node` as ancestor-or-self; the
            # branch ABOVE node is the stem
            if not include_stem:
                mask = mask & (jnp.arange(m) != node)
            r = jnp.where(mask, params[crate], r)
        return r

    return ClockModel("local", tm.tree_id, rates)


@register("randomLocalClockModel")
def _random_local_clock(ax: XmlAnalysis, el):
    """Random local clocks (ref: RandomLocalClockModel.java): per-node
    change indicators + rate multipliers; a branch's rate is the product
    of multipliers on active ancestors (here: the nearest active ancestor
    convention of the reference, implemented as cumulative products by
    pointer doubling in models/clock.random_local_clock_rates)."""
    from beast_mcmc_tpu.models.clock import random_local_clock_rates

    tm = ax.build(_child_of(el, "treeModel"))
    m = tm.parent.shape[0]
    rates_el = ax.deref(_child_of(_child_of(el, "rates"), "parameter"))
    ind_el = ax.deref(_child_of(_child_of(el, "rateIndicator"), "parameter"))
    clock_el = el.find("clockRate")
    cname = ax.param_from(clock_el) if clock_el is not None else None
    rn, iname = rates_el.get("id"), ind_el.get("id")
    ax._params[rn] = Param(rn, np.ones(m), lower=0.0)
    ax._params[iname] = Param(iname, np.zeros(m), integer=True)

    def rates(params, tree):
        r = random_local_clock_rates(
            tree.parent, tree.heights,
            params[iname].astype(tree.heights.dtype),
            params[rn].astype(tree.heights.dtype),
        )
        if cname:
            r = r * params[cname]
        return r

    return ClockModel("random_local", tm.tree_id, rates)


@register("monophylyStatistic")
def _monophyly_statistic(ax: XmlAnalysis, el):
    """bool statistic: is the clade monophyletic in the current tree
    (ref: MonophylyStatistic.java)."""
    from beast_mcmc_tpu.models.clock import ancestor_or_self_mask
    from beast_mcmc_tpu.models.speciation import mrca_node

    tm, taxa = None, None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)
        elif cc.tag == "mrca":
            for t in cc:
                taxa = ax.build(ax.deref(t))
        elif cc.tag == "taxa":
            taxa = ax.build(cc)
    m = tm.parent.shape[0]
    n_taxa = len(tm.taxa)
    tip_set = np.zeros(m, bool)
    for n, _ in taxa:
        tip_set[tm.taxa.index(n)] = True
    size = int(tip_set.sum())
    tip_set_j = jnp.asarray(tip_set)

    def stat(s, tid=tm.tree_id):
        t = ax.resolve_tree(tid, s.params, s.tree)
        node = mrca_node(t.parent, t.heights, tip_set_j)
        desc = ancestor_or_self_mask(t.parent, node)
        n_below = jnp.sum(desc[:n_taxa])
        return (n_below == size).astype(t.heights.dtype)

    return stat


@register("booleanLikelihood")
def _boolean_likelihood(ax: XmlAnalysis, el):
    """-inf unless every child boolean statistic is true (ref:
    BooleanLikelihood.java)."""
    stats = [ax.build(c) for c in el]

    def fn(params, tree):
        s = _StateShim(params, tree)
        ok = 1.0
        for st in stats:
            ok = ok * st(s)
        return jnp.where(ok > 0, 0.0, -jnp.inf)

    return LikelihoodFn(fn, None, "booleanLikelihood")

# -- likelihoods --------------------------------------------------------------


@register("coalescentLikelihood")
def _coalescent_likelihood(ax: XmlAnalysis, el):
    demo, tm = None, None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "model":
            for d in cc:
                demo = ax.build(ax.deref(d))
        elif cc.tag == "populationTree":
            for t in cc:
                tm = ax.build(ax.deref(t))
        elif cc.tag in ("constantSize", "exponentialGrowth", "expansion",
                      "piecewisePopulation", "cataclysm",
                      "constantPopulationSize",
                      "exponentialPopulationSize", "piecewisePopulationSize"):
            demo = ax.build(cc)
        elif cc.tag == "treeModel":
            tm = ax.build(cc)
    if isinstance(demo, VariableDemographic):
        from beast_mcmc_tpu.models.coalescent import ebsp_coalescent_loglik

        vd = demo
        n_taxas = [len(ax._trees[t].taxa) for t in vd.tree_ids]

        def fn(params, tree):
            hs = [
                ax.resolve_tree(t, params, tree).heights
                for t in vd.tree_ids
            ]
            return ebsp_coalescent_loglik(
                hs, n_taxas, vd.ploidies, params[vd.pop_param],
                params[vd.ind_param], vd.use_midpoints,
            )

        # tree_id None: trees resolve internally (multi-tree likelihood)
        return LikelihoodFn(fn, None, el.get("id") or "coalescent")
    if demo is None or tm is None:
        raise XmlError("coalescentLikelihood needs model + populationTree")
    n_taxa = len(tm.taxa)

    def fn(params, tree):
        return demo.loglik(tree.heights, n_taxa, params)

    return LikelihoodFn(fn, tm.tree_id, el.get("id") or "coalescent")


@register("generalizedSkyLineLikelihood")
def _bsp_likelihood(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import bayesian_skyline_loglik

    pops = ax.param_from(_child_of(el, "populationSizes"))
    gs_el = ax.deref(_child_of(_child_of(el, "groupSizes"), "parameter"))
    tm = None
    pt = el.find("populationTree")
    if pt is not None:
        for t in pt:
            tm = ax.build(ax.deref(t))
    else:
        tm = ax.build(_child_of(el, "treeModel"))
    n_taxa = len(tm.taxa)
    k = ax._params[pops].value.size if ax._params[pops].value.ndim else 1
    if _attr(el, "linear", False, bool):
        k = k - 1  # linear skyline: K+1 boundary sizes, K groups
    gname = gs_el.get("id")
    gvals = _text_values(gs_el)
    if gvals.size == 0:
        gdim = int(gs_el.get("dimension", str(k)))
        k = min(k, gdim) if gdim else k
        # default: distribute n-1 coalescent events over k groups
        base = (n_taxa - 1) // k
        g = np.full(k, base)
        g[: (n_taxa - 1) - base * k] += 1
        gvals = g
    ax._params[gname] = Param(gname, gvals.astype(np.float64), integer=True)
    linear = _attr(el, "linear", False, bool)
    if linear:
        from beast_mcmc_tpu.models.coalescent import (
            bayesian_skyline_linear_loglik,
        )

        def fn(params, tree):
            return bayesian_skyline_linear_loglik(
                tree.heights, n_taxa, params[pops],
                params[gname].astype(jnp.int32),
            )
    else:
        def fn(params, tree):
            return bayesian_skyline_loglik(
                tree.heights, n_taxa, params[pops],
                params[gname].astype(jnp.int32),
            )

    return LikelihoodFn(fn, tm.tree_id, el.get("id") or "skyline")


@register("gmrfSkyrideLikelihood", "gmrfSkylineLikelihood",
          "gmrfSkyLineLikelihood")
def _skyride_likelihood(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.coalescent import (
        gmrf_skyride_loglik,
        gmrf_skyride_time_aware_prior,
        gmrf_skyride_uniform_prior,
    )

    pops = ax.param_from(_child_of(el, "populationSizes"))
    prec = ax.param_from(_child_of(el, "precisionParameter"))
    tm = None
    pt = el.find("populationTree")
    if pt is not None:
        for t in pt:
            tm = ax.build(ax.deref(t))
    n_taxa = len(tm.taxa)
    time_aware = _attr(el, "timeAwareSmoothing", True, bool)

    # optional fixed effects (covariate matrix + beta + lambda mixing)
    cov = beta = lname = None
    cm = el.find("covariateMatrix")
    if cm is not None:
        for c in cm:
            cc = ax.deref(c)
            if cc.tag == "matrixParameter":
                cov = ax.build(cc)
        beta = ax.param_from(_child_of(el, "betaParameter"))
    lam_el = el.find("lambdaParameter")
    if lam_el is not None:
        lname = ax.param_from(lam_el)

    gs = el.find("groupSizes")
    gel = ax.deref(_child_of(gs, "parameter")) if gs is not None else None
    gdim = int(gel.get("dimension", "0")) if gel is not None else 0
    p = ax._params[pops]
    n_field = np.atleast_1d(p.value).size
    grouped = gdim and gdim == n_field and gdim <= n_taxa - 1

    if grouped:
        # grouped field: distribute n-1 events over the declared groups
        from beast_mcmc_tpu.models.coalescent import (
            grouped_skyride_gmrf_prior,
            grouped_skyride_loglik,
        )

        gname = gel.get("id")
        base = (n_taxa - 1) // gdim
        g = np.full(gdim, base)
        g[: (n_taxa - 1) - base * gdim] += 1
        ax._params[gname] = Param(gname, g.astype(np.float64), integer=True)

        def fn(params, tree):
            gg = params[gname].astype(jnp.int32)
            ll = grouped_skyride_loglik(tree.heights, n_taxa,
                                        params[pops], gg)
            lam = params[lname] if lname else (1.0 if time_aware else 0.0)
            pr = grouped_skyride_gmrf_prior(
                tree.heights, n_taxa, params[pops], gg, params[prec],
                covariates=(jnp.asarray(cov, tree.heights.dtype)
                            if cov is not None else None),
                beta=(params[beta] if beta else None),
                lam=lam,
            )
            return ll + pr

        return LikelihoodFn(fn, tm.tree_id, el.get("id") or "skyride")

    if gel is not None:
        gname = gel.get("id")
        if gname and gname not in ax._params:
            ax._params[gname] = Param(gname, np.ones(max(gdim, 1)))
    if cov is not None:
        raise Unsupported("covariates on an ungrouped skyride")
    # ungrouped: resize the field to n-1 (the reference sizes it from
    # the tree)
    field = np.resize(np.atleast_1d(p.value), n_taxa - 1)
    ax._params[pops] = Param(pops, field, p.lower, p.upper)

    def fn(params, tree):
        ll = gmrf_skyride_loglik(tree.heights, n_taxa, params[pops])
        if time_aware:
            pr = gmrf_skyride_time_aware_prior(
                tree.heights, n_taxa, params[pops], params[prec]
            )
        else:
            pr = gmrf_skyride_uniform_prior(params[pops], params[prec])
        return ll + pr

    return LikelihoodFn(fn, tm.tree_id, el.get("id") or "skyride")


@register("yuleModel")
def _yule_model(ax: XmlAnalysis, el):
    bname = ax.param_from(_child_of(el, "birthRate"))
    return ("speciation", "yule", {"birth": bname})


@register("birthDeathModel")
def _birth_death_model(ax: XmlAnalysis, el):
    names = {}
    bmd = el.find("birthMinusDeathRate")
    rel = el.find("relativeDeathRate")
    if bmd is None:
        raise Unsupported("birthDeathModel parameterization")
    names["bmd"] = ax.param_from(bmd)
    names["rel"] = ax.param_from(rel) if rel is not None else None
    return ("speciation", "birth_death", names)


@register("speciationLikelihood")
def _speciation_likelihood(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.speciation import birth_death_loglik, yule_loglik

    model, tm = None, None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "model":
            for d in cc:
                model = ax.build(ax.deref(d))
        elif cc.tag == "speciesTree":
            for t in cc:
                tm = ax.build(ax.deref(t))
    if model is None or tm is None:
        raise XmlError("speciationLikelihood needs model + speciesTree")
    kind, sub, names = model
    n_taxa = len(tm.taxa)
    root = tm.root

    if sub == "bdss_grid":
        from beast_mcmc_tpu.models.speciation import (
            episodic_serial_birth_death_loglik,
        )

        def fn(params, tree):
            rho_c = jnp.ravel(params[names["rho"]])[0] if names.get(
                "rho") else 0.0
            x0 = jnp.ravel(params[names["origin"]])[0]
            return episodic_serial_birth_death_loglik(
                tree.heights, n_taxa,
                x0,
                jnp.ravel(params[names["birth"]]),
                jnp.ravel(params[names["death"]]),
                jnp.ravel(params[names["psi"]]),
                treatment_probs=jnp.ravel(params[names["r"]])
                if names.get("r") else 1.0,
                rho_present=rho_c,
                grid_end=(x0 if names["cutoff"] is None
                          else names["cutoff"]),
                num_intervals=names["k"],
            )

        return LikelihoodFn(fn, tm.tree_id, el.get("id") or "speciation")

    if sub == "yule":
        def fn(params, tree):
            return yule_loglik(tree.heights, n_taxa, tree.root,
                               params[names["birth"]])
    else:
        def fn(params, tree):
            bmd = params[names["bmd"]]
            rel = params[names["rel"]] if names["rel"] else 0.0
            return birth_death_loglik(tree.heights, n_taxa, tree.root,
                                      bmd, rel)

    return LikelihoodFn(fn, tm.tree_id, el.get("id") or "speciation")


@register("treeLikelihood", "treeDataLikelihood")
def _tree_likelihood(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
    from beast_mcmc_tpu.ops.peeling import pad_patterns

    for c in el:
        if ax.deref(c).tag == "rewardsAwareBranchModel":
            from beast_mcmc_tpu.config.xml_ext import (
                _reward_aware_tree_likelihood,
            )

            return _reward_aware_tree_likelihood(ax, el, ax.deref(c))

    patterns, tm, site, clock = None, None, None, None
    partitions = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("patterns", "mergePatterns", "attributePatterns",
                      "ascertainedPatterns"):
            patterns = ax.build(cc)
        elif cc.tag == "alignment" and patterns is None:
            # a bare <alignment> child is a PatternList of its sites
            # (ref: TreeLikelihoodParser accepts any PatternList)
            from beast_mcmc_tpu.data.alignment import SitePatterns

            aln = ax.build(cc)
            patterns = SitePatterns.from_alignment(aln)
        elif cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
        elif cc.tag == "siteModel":
            site = ax.build(cc)
        elif cc.tag in ("strictClockBranchRates", "discretizedBranchRates",
                        "continuousBranchRates", "localClockModel",
                        "randomLocalClockModel", "arbitraryBranchRates",
                        "gridBasedBranchRateModel",
                        "locationScaledBranchRateModel",
                        "scaledByTreeTimeBranchRates",
                        "timeIncrementBranchRateModel"):
            clock = ax.build(cc)
        elif cc.tag == "partition":
            pp, ps = None, None
            for d in cc:
                dd = ax.deref(d)
                if dd.tag in ("patterns", "mergePatterns"):
                    pp = ax.build(dd)
                elif dd.tag == "siteModel":
                    ps = ax.build(dd)
            if pp is None or ps is None:
                raise XmlError("<partition> needs patterns + siteModel")
            partitions.append((pp, ps))
    if partitions and patterns is None:
        patterns, site = partitions[0]
        extra_partitions = partitions[1:]
    else:
        extra_partitions = []
    if patterns is None or tm is None or site is None:
        raise XmlError("treeLikelihood needs patterns+treeModel+siteModel")
    if clock is None:
        clock = ClockModel("strict_unit", tm.tree_id,
                           lambda params, tree: 1.0)
    site_kind, eigen, freqs_of, s, rates_weights = site
    # order tip rows by the tree's taxon order
    idx = [patterns.taxa.index(t) for t in tm.taxa]
    # tip_partials is [taxa, patterns, states]; peel wants [N, S, P]
    tips = np.swapaxes(patterns.tip_partials(np.float64)[idx], 1, 2)
    dtype = ax.dtype
    # lane-pad only wide pattern sets; tiny ones (single-column discrete
    # trait partitions) stay unpadded so the small-pattern LEVEL peel
    # path applies (ops/peeling.py:_LEVEL_PEEL_MAX_CP)
    pad_to = 128 if len(patterns.weights) >= 32 else 1
    tips_j, w_j = pad_patterns(
        jnp.asarray(tips, dtype), jnp.asarray(patterns.weights, dtype),
        pad_to,
    )

    # additional <partition>s share the tree + clock (ref:
    # MultiPartitionDataLikelihoodDelegate.java:64 — the vmapped batching
    # of models/treelikelihood.multipartition_loglikelihood is the hot
    # path; here partitions sum as independent peels)
    extra = []
    for pp, ps in extra_partitions:
        _, eig_k, fr_k, s_k, rw_k = ps
        idx_k = [pp.taxa.index(t) for t in tm.taxa]
        tk = np.swapaxes(pp.tip_partials(np.float64)[idx_k], 1, 2)
        tk_j, wk_j = pad_patterns(
            jnp.asarray(tk, dtype), jnp.asarray(pp.weights, dtype),
            128 if len(pp.weights) >= 32 else 1,
        )
        extra.append((eig_k, fr_k, rw_k, tk_j, wk_j))

    # ascertainment correction columns (AscertainedSitePatterns)
    excl_j = None
    if getattr(patterns, "ascertain_excluded", None) is not None:
        tab = patterns.datatype.ambiguity_table(np.float64)
        ex = tab[patterns.ascertain_excluded[idx]]  # [N, E, S]
        excl_j = jnp.asarray(np.swapaxes(ex, 1, 2), dtype)  # [N, S, E]
        ascertain_include = getattr(patterns, "ascertain_include", False)

    def fn(params, tree):
        r, w = rates_weights(params, dtype)
        br = clock.rates(params, tree)
        if site_kind == "site_branch":
            from beast_mcmc_tpu.models.treelikelihood import (
                tree_loglikelihood_pmats,
            )

            p_mats = eigen.p_mats(params, tree, r, br)
            tot = tree_loglikelihood_pmats(
                tips_j, w_j, tree.children, tree.heights, tree.root,
                tree.parent, p_mats, freqs_of(params), w,
            )
        elif site_kind == "site_q":
            from beast_mcmc_tpu.models.treelikelihood import (
                tree_loglikelihood_q,
            )

            tot = tree_loglikelihood_q(
                tips_j, w_j, tree.parent, tree.children, tree.heights,
                tree.root, eigen(params), freqs_of(params), r, w, br,
            )
        elif excl_j is not None:
            from beast_mcmc_tpu.models.treelikelihood import (
                ascertained_loglik,
                branch_lengths,
            )
            from beast_mcmc_tpu.ops.eigen import transition_probs
            from beast_mcmc_tpu.ops.peeling import (
                peel_order_from_heights,
                peel_site_loglik,
            )

            bl = branch_lengths(tree.parent, tree.heights) * br
            t = bl[:, None] * r[None, :]
            p_mats = transition_probs(eigen(params), t)
            order = peel_order_from_heights(tree.heights, len(tm.taxa))
            fr = freqs_of(params)
            sl_data = peel_site_loglik(
                tips_j, tree.children, order, tree.root, p_mats, fr, w)
            sl_excl = peel_site_loglik(
                excl_j, tree.children, order, tree.root, p_mats, fr, w)
            if ascertain_include:
                # only the listed patterns are observable: correction is
                # +log sum P(included) per site
                corr = jax.scipy.special.logsumexp(sl_excl)
                from beast_mcmc_tpu.utils.accum import stable_dot

                tot = stable_dot(w_j, sl_data - corr)
            else:
                tot = ascertained_loglik(sl_data, w_j, sl_excl)
        else:
            tot = tree_loglikelihood(
                tips_j, w_j, tree.parent, tree.children, tree.heights,
                tree.root, eigen(params), freqs_of(params), r, w, br,
            )
        for eig_k, fr_k, rw_k, tk_j, wk_j in extra:
            rk, wk = rw_k(params, dtype)
            tot = tot + tree_loglikelihood(
                tk_j, wk_j, tree.parent, tree.children, tree.heights,
                tree.root, eig_k(params), fr_k(params), rk, wk, br,
            )
        return tot

    # components for ancestral-state / Markov-jump annotation builders
    ax._treelik_parts = getattr(ax, "_treelik_parts", {})
    ax._treelik_parts[el.get("id") or "treeLikelihood"] = dict(
        tips=tips_j, w=w_j, site_kind=site_kind, eigen=eigen,
        freqs_of=freqs_of, rates_weights=rates_weights, clock=clock,
        tm=tm, dtype=dtype, n_taxa=len(tm.taxa))

    # surrogate with the reference's first-order generator gradient
    # (used by the approximate CTMC-rate gradient providers; for the
    # eigen path the generator is reassembled Q = U diag(λ) U⁻¹)
    def fn_approx(params, tree):
        from beast_mcmc_tpu.models.treelikelihood import (
            tree_loglikelihood_q_approx_grad,
        )

        r, w = rates_weights(params, dtype)
        br = clock.rates(params, tree)
        es = eigen(params)
        q_mat = es if site_kind == "site_q" else (
            es.U @ (es.values[..., None] * es.U_inv))
        return tree_loglikelihood_q_approx_grad(
            tips_j, w_j, tree.parent, tree.children, tree.heights,
            tree.root, q_mat, freqs_of(params), r, w, br,
        )

    ax._surrogate_liks = getattr(ax, "_surrogate_liks", {})
    ax._surrogate_liks[el.get("id") or "treeLikelihood"] = LikelihoodFn(
        fn_approx, tm.tree_id, el.get("id") or "treeLikelihood")

    return LikelihoodFn(fn, tm.tree_id, el.get("id") or "treeLikelihood")


# -- priors -------------------------------------------------------------------


class _StateShim:
    """Minimal state-like view (params, tree) for statistic callables."""

    def __init__(self, params, tree):
        self.params = params
        self.tree = tree


def _targets_of(ax, el) -> List:
    """Return readers for the parameter(s)/statistic(s) a prior applies
    to. An unrecognized or empty target raises — a silently dropped prior
    changes the posterior (the unregistered-parser contract)."""
    outs = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            if isinstance(obj, TreeAlias):
                outs.append(_alias_value_reader(ax, obj))
            else:
                outs.append(lambda params, tree, n=obj.name: params[n])
        elif cc.tag in ("matrixParameter", "compoundSymmetricMatrix",
                        "diagonalMatrix", "transposedMatrix",
                        "diagonalContrainedMatrixView"):
            from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

            mp = matrix_param_of(ax, cc)
            outs.append(
                lambda params, tree, mp=mp: jnp.ravel(mp.fn(params)))
        else:
            obj = ax.build(cc)
            if isinstance(obj, CompoundParam):
                outs.append(
                    lambda params, tree, ns=tuple(obj.names): jnp.concatenate(
                        [jnp.ravel(params[n]) for n in ns]))
            elif isinstance(obj, Param):
                outs.append(lambda params, tree, n=obj.name: params[n])
            elif isinstance(obj, DerivedParam):
                outs.append(
                    lambda params, tree, f=obj.fn: f(params))
            elif (hasattr(obj, "fn") and hasattr(obj, "names")
                  and hasattr(obj, "dim")):
                # MatrixParam view (matrixParameter etc.): the prior
                # scores the flattened matrix
                outs.append(
                    lambda params, tree, mp=obj: jnp.ravel(mp.fn(params)))
            elif callable(obj) and not isinstance(obj, LikelihoodFn):
                outs.append(
                    lambda params, tree, f=obj: f(_StateShim(params, tree))
                )
            else:
                raise Unsupported(f"prior target <{cc.tag}>")
    if not outs:
        raise XmlError(f"prior <{el.tag}> names no target")
    return outs


def _alias_value_reader(ax, a: TreeAlias):
    RT = lambda params, tree: ax.resolve_tree(a.tree_id, params, tree)
    if a.kind == "root_height":
        return lambda params, tree: RT(params, tree).heights[
            RT(params, tree).root]
    if a.kind == "internal_heights":
        def read(params, tree):
            t = RT(params, tree)
            n_taxa = (t.parent.shape[0] + 1) // 2
            mask = jnp.arange(t.parent.shape[0]) >= n_taxa
            isroot = jnp.arange(t.parent.shape[0]) == t.root
            return t.heights, mask & ~isroot

        return read
    if a.kind == "leaf_height":
        return lambda params, tree, i=a.tip_index: RT(params, tree).heights[i]
    if a.kind == "all_heights":
        def read(params, tree):
            t = RT(params, tree)
            n_taxa = (t.parent.shape[0] + 1) // 2
            mask = jnp.arange(t.parent.shape[0]) >= n_taxa
            return t.heights, mask

        return read
    raise Unsupported(a.kind)


def _masked_sum(val, pdf):
    """Apply pdf elementwise; val may be (values, mask) for tree views.

    The library densities SUM over their argument, so for masked views
    the density must be evaluated per element (vmap over scalars) before
    masking — applying the summed value under the mask would scale the
    total by the mask count."""
    if isinstance(val, tuple):
        v, mask = val
        elem = jax.vmap(pdf)(jnp.ravel(v))
        return jnp.sum(jnp.where(jnp.ravel(mask), elem, 0.0))
    return jnp.sum(pdf(val))


def _simple_prior(pdf_factory):
    def build(ax, el):
        targets = _targets_of(ax, el)
        pdf = pdf_factory(ax, el)

        def fn(params, tree):
            tot = 0.0
            for t in targets:
                tot = tot + _masked_sum(t(params, tree), pdf)
            return tot

        return LikelihoodFn(fn, None, el.tag)

    return build


@register("logNormalPrior")
def _lognormal_prior(ax, el):
    from beast_mcmc_tpu.models.priors import lognormal_logpdf

    mean = _attr(el, "mean", _attr(el, "mu", 0.0, float), float)
    stdev = _attr(el, "stdev", _attr(el, "sigma", 1.0, float), float)
    offset = _attr(el, "offset", 0.0, float)
    mreal = _attr(el, "meanInRealSpace", False, bool)
    if mreal:
        import math

        mu = math.log(mean) - 0.5 * stdev**2
    else:
        mu = mean
    return _simple_prior(
        lambda ax_, el_: lambda x: lognormal_logpdf(x - offset, mu, stdev)
    )(ax, el)


@register("normalPrior")
def _normal_prior(ax, el):
    from beast_mcmc_tpu.models.priors import normal_logpdf

    mean = _attr(el, "mean", 0.0, float)
    stdev = _attr(el, "stdev", 1.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: normal_logpdf(x, mean, stdev)
    )(ax, el)


@register("exponentialPrior")
def _exponential_prior(ax, el):
    from beast_mcmc_tpu.models.priors import exponential_logpdf

    mean = _attr(el, "mean", 1.0, float)
    offset = _attr(el, "offset", 0.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: exponential_logpdf(x - offset, mean)
    )(ax, el)


@register("gammaPrior")
def _gamma_prior(ax, el):
    from beast_mcmc_tpu.models.priors import gamma_logpdf

    shape = _attr(el, "shape", 1.0, float)
    scale = _attr(el, "scale", 1.0, float)
    offset = _attr(el, "offset", 0.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: gamma_logpdf(x - offset, shape, scale)
    )(ax, el)


@register("inverseGammaPrior")
def _inverse_gamma_prior(ax, el):
    from beast_mcmc_tpu.models.priors import inverse_gamma_logpdf

    shape = _attr(el, "shape", 1.0, float)
    scale = _attr(el, "scale", 1.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: inverse_gamma_logpdf(x, shape, scale)
    )(ax, el)


@register("laplacePrior")
def _laplace_prior(ax, el):
    from beast_mcmc_tpu.models.priors import laplace_logpdf

    mean = _attr(el, "mean", 0.0, float)
    scale = _attr(el, "scale", 1.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: laplace_logpdf(x, mean, scale)
    )(ax, el)


@register("uniformPrior")
def _uniform_prior(ax, el):
    from beast_mcmc_tpu.models.priors import uniform_logpdf

    lower = _attr(el, "lower", 0.0, float)
    upper = _attr(el, "upper", 1.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: uniform_logpdf(x, lower, upper)
    )(ax, el)


@register("oneOnXPrior", "jeffreysPrior")
def _one_on_x_prior(ax, el):
    from beast_mcmc_tpu.models.priors import one_on_x_logpdf

    return _simple_prior(lambda ax_, el_: one_on_x_logpdf)(ax, el)


@register("poissonPrior")
def _poisson_prior(ax, el):
    from beast_mcmc_tpu.models.priors import poisson_logpmf

    mean = _attr(el, "mean", 1.0, float)
    return _simple_prior(
        lambda ax_, el_: lambda x: poisson_logpmf(x, mean)
    )(ax, el)


@register("dirichletPrior")
def _dirichlet_prior(ax, el):
    from beast_mcmc_tpu.models.priors import dirichlet_logpdf

    alpha = _attr(el, "alpha", 1.0, float)
    counts = _attr(el, "counts", None, str)
    targets = _targets_of(ax, el)

    def fn(params, tree):
        tot = 0.0
        for t in targets:
            v = t(params, tree)
            a = jnp.full(v.shape, alpha)
            tot = tot + dirichlet_logpdf(v / jnp.sum(v), a)
        return tot

    return LikelihoodFn(fn, None, "dirichletPrior")


@register("ctmcScalePrior")
def _ctmc_scale_prior(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.priors import ctmc_scale_logpdf

    rate = ax.param_from(_child_of(el, "ctmcScale"))
    tm = ax.build(_child_of(el, "treeModel"))

    def fn(params, tree):
        bl = tree.heights[tree.parent] - tree.heights
        tl = jnp.sum(jnp.where(tree.parent >= 0, bl, 0.0))
        return jnp.sum(ctmc_scale_logpdf(params[rate], tl))

    return LikelihoodFn(fn, tm.tree_id, "ctmcScalePrior")


@register("exponentialMarkovLikelihood")
def _exp_markov(ax: XmlAnalysis, el):
    """Exponential Markov chain prior on a vector parameter (ref:
    ExponentialMarkovModel.java: x_k ~ Exp(mean = x_{k-1}); jeffreys
    option puts 1/x on the first element)."""
    cp = el.find("chainParameter")
    pname = ax.param_from(cp if cp is not None else el)
    jeffreys = _attr(el, "jeffreys", False, bool)

    def fn(params, tree):
        x = jnp.atleast_1d(params[pname])
        rest = -jnp.log(x[:-1]) - x[1:] / x[:-1]
        tot = jnp.sum(rest)
        if jeffreys:
            tot = tot - jnp.log(x[0])
        return tot

    return LikelihoodFn(fn, None, "exponentialMarkov")




@register("exponentialDistributionModel")
def _exp_dist_model(ax: XmlAnalysis, el):
    mname = ax.param_from(_child_of(el, "mean"))
    return ("dist", "exponential", mname)


@dataclasses.dataclass
class VariableDemographic:
    tree_ids: List[str]
    ploidies: List[float]
    pop_param: str
    ind_param: str
    use_midpoints: bool


@register("variableDemographic")
def _variable_demographic(ax: XmlAnalysis, el):
    """EBSP field over multiple gene trees (ref:
    VariableDemographicModel.java; coalescent density in
    models/coalescent.ebsp_coalescent_loglik)."""
    pop_el = ax.deref(_child_of(_child_of(el, "populationSizes"),
                                "parameter"))
    ind_el = ax.deref(_child_of(_child_of(el, "indicators"), "parameter"))
    tree_ids, ploidies = [], []
    for pt in _child_of(el, "trees"):
        ptc = ax.deref(pt)
        if ptc.tag != "ptree":
            continue
        tm = ax.build(_child_of(ptc, "treeModel"))
        tree_ids.append(tm.tree_id)
        ploidies.append(_attr(ptc, "ploidy", 1.0, float))
    n_events = sum(len(ax._trees[t].taxa) - 1 for t in tree_ids)
    pname, iname = pop_el.get("id"), ind_el.get("id")
    pop0 = _text_values(pop_el)
    fill = float(pop0[0]) if pop0.size else 1.0
    ax._params[pname] = Param(pname, np.full(n_events, fill), lower=0.0)
    ax._params[iname] = Param(iname, np.zeros(n_events - 1))
    return VariableDemographic(
        tree_ids, ploidies, pname, iname,
        _attr(el, "useMidpoints", False, bool),
    )


@register("mixedDistributionLikelihood")
def _mixed_distribution(ax: XmlAnalysis, el):
    """Indicator-switched density over a data vector (ref:
    MixedDistributionLikelihood.java): element i scored under dist0 when
    indicator_i == 0, dist1 otherwise. The EBSP prior on (in)active
    population sizes. Indicators have one fewer element than the data
    (knot 0 is always active -> scored under dist1)."""
    d0 = ax.build(ax.deref(next(iter(_child_of(el, "distribution0")))))
    d1 = ax.build(ax.deref(next(iter(_child_of(el, "distribution1")))))
    data = ax.param_from(_child_of(el, "data"))
    inds = ax.param_from(_child_of(el, "indicators"))

    def pdf_of(d):
        if d[1] != "exponential":
            raise Unsupported(f"mixedDistribution over {d[1]}")
        mname = d[2]

        def lp(params, x):
            from beast_mcmc_tpu.models.priors import exponential_logpdf

            return exponential_logpdf(x, params[mname])

        return lp

    lp0, lp1 = pdf_of(d0), pdf_of(d1)

    def fn(params, tree):
        x = params[data]
        ind = params[inds]
        full_ind = jnp.concatenate(
            [jnp.ones((1,), ind.dtype), ind]
        )
        return jnp.sum(
            jnp.where(full_ind > 0.5, lp1(params, x), lp0(params, x))
        )

    return LikelihoodFn(fn, None, "mixedDistribution")


@dataclasses.dataclass
class SampleNonActiveOperator:
    """Gibbs-resample the INACTIVE EBSP population sizes from their prior
    (their full conditional — inactive knots do not enter Ne(t); ref:
    SampleNonActiveGibbsOperator.java). Always accepted."""

    mean_param: str = ""
    data_param: str = ""
    ind_param: str = ""
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = False

    def modified_params(self):
        return (self.data_param,)

    def initial_adapt(self):
        return 0.0

    def tuning(self, adapt_value):
        return None

    def propose(self, params, tree, key, tuning):
        x = params[self.data_param]
        ind = params[self.ind_param]
        full_ind = jnp.concatenate([jnp.ones((1,), ind.dtype), ind])
        draw = jax.random.exponential(key, x.shape, x.dtype) * params[
            self.mean_param]
        new = jnp.where(full_ind > 0.5, x, draw)
        dt = tree.heights.dtype
        return ({**params, self.data_param: new}, tree,
                jnp.asarray(jnp.inf, dt), jnp.asarray(1.0, dt))


@dataclasses.dataclass
class ActiveEntryScaleOperator:
    """Scale ONE population-size entry chosen uniformly among the ACTIVE
    knots (the reference's <scaleOperator><indicators pickoneprob="1">
    mode, ScaleOperator.java pickoneprob branch); -log s Hastings."""

    data_param: str = ""
    ind_param: str = ""
    scale_factor: float = 0.5
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = True

    def modified_params(self):
        return (self.data_param,)

    def initial_adapt(self):
        import math as _m

        return _m.log(1.0 / self.scale_factor - 1.0)

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def propose(self, params, tree, key, tuning):
        x = params[self.data_param]
        ind = params[self.ind_param]
        active = jnp.concatenate([jnp.ones((1,), bool), ind > 0.5])
        k1, k2 = jax.random.split(key)
        g = jax.random.gumbel(k1, active.shape)
        i = jnp.argmax(jnp.where(active, g, -jnp.inf))
        u = jax.random.uniform(k2, (), x.dtype)
        s = tuning + u * (1.0 / tuning - tuning)
        new = x.at[i].multiply(s)
        dt = tree.heights.dtype
        return ({**params, self.data_param: new}, tree,
                (-jnp.log(s)).astype(dt))

@dataclasses.dataclass
class JointTipHeightOperator:
    """Uniform move of a shared tip age across SEVERAL trees (ref:
    JointParameter over leafHeight parameters, the tip-date sampling
    setup of testJointTipAges): draw U(0, min over trees of the tip's
    parent height) and write the height into every tree."""

    ax: object = None
    targets: tuple = ()  # (tree_id, tip_index) pairs
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = False
    modifies_params = None

    def modified_params(self):
        return tuple(self.ax.tree_key(tid, "heights")
                     for tid, _ in self.targets)

    def initial_adapt(self):
        return 0.0

    def tuning(self, adapt_value):
        return None

    def propose(self, params, tree, key, tuning):
        upper = None
        for tid, tip in self.targets:
            t = self.ax.resolve_tree(tid, params, tree)
            ph = t.heights[t.parent[tip]]
            upper = ph if upper is None else jnp.minimum(upper, ph)
        u = jax.random.uniform(key, (), tree.heights.dtype)
        new_h = u * upper
        for tid, tip in self.targets:
            t = self.ax.resolve_tree(tid, params, tree)
            heights = t.heights.at[tip].set(new_h)
            if self.ax._tree_binding.get(tid, "state") == "state":
                tree = tree.replace(heights=heights)
            else:
                params = {**params,
                          self.ax.tree_key(tid, "heights"): heights}
        return params, tree, jnp.asarray(0.0, tree.heights.dtype)


@dataclasses.dataclass
class MultiTreeUpDownOperator:
    """upDown over parameters AND the internal heights of SEVERAL trees
    (state-resident or params-resident) — the EBSP/multilocus form of
    UpDownOperator.java; log-Hastings (nUp - nDown - 2) log s."""

    ax: object = None
    up_params: tuple = ()
    down_params: tuple = ()
    up_trees: tuple = ()
    down_trees: tuple = ()
    scale_factor: float = 0.75
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = True
    modifies_params = None

    def modified_params(self):
        keys = list(self.up_params) + list(self.down_params)
        for tid in tuple(self.up_trees) + tuple(self.down_trees):
            keys.append(self.ax.tree_key(tid, "heights"))
        return tuple(keys)

    def initial_adapt(self):
        import math as _m

        return _m.log(1.0 / self.scale_factor - 1.0)

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def _scale_tree(self, params, tree, tid, s):
        t = self.ax.resolve_tree(tid, params, tree)
        m = t.parent.shape[0]
        n_taxa = (m + 1) // 2
        internal = jnp.arange(m) >= n_taxa
        heights = jnp.where(internal, t.heights * s, t.heights)
        pidx = jnp.maximum(t.parent, 0)
        ok = jnp.all(
            jnp.where(t.parent >= 0, heights[pidx] > heights, True)
        )
        if self.ax._tree_binding.get(tid, "state") == "state":
            tree = tree.replace(heights=heights)
        else:
            params = {**params,
                      self.ax.tree_key(tid, "heights"): heights}
        return params, tree, n_taxa - 1, ok

    def propose(self, params, tree, key, tuning):
        u = jax.random.uniform(key, (), tree.heights.dtype)
        s = tuning + u * (1.0 / tuning - tuning)
        n_up = n_down = 0
        ok = jnp.asarray(True)
        for name in self.up_params:
            params = {**params, name: params[name] * s}
            n_up += int(np.prod(np.shape(params[name])) or 1)
            ok &= jnp.all(params[name] > 0)
        for name in self.down_params:
            params = {**params, name: params[name] / s}
            n_down += int(np.prod(np.shape(params[name])) or 1)
            ok &= jnp.all(params[name] > 0)
        for tid in self.up_trees:
            params, tree, n, o = self._scale_tree(params, tree, tid, s)
            n_up += n
            ok &= o
        for tid in self.down_trees:
            params, tree, n, o = self._scale_tree(params, tree, tid,
                                                  1.0 / s)
            n_down += n
            ok &= o
        logh = (n_up - n_down - 2) * jnp.log(s)
        return params, tree, jnp.where(ok, logh,
                                       -jnp.inf).astype(tree.heights.dtype)


@register("posterior", "prior", "likelihood", "joint")
def _compound_likelihood(ax: XmlAnalysis, el):
    parts: List[LikelihoodFn] = []
    tree_id = None
    for c in el:
        obj = ax.build(c)
        if isinstance(obj, ClockModel):
            # a branch-rate model inside <likelihood> contributes its
            # rate-evolution density if it has one (ACLikelihood), else
            # nothing (the density is in the rate construction)
            dens = getattr(obj, "density", None)
            if dens is not None:
                parts.append(LikelihoodFn(dens, obj.tree_id,
                                          ax.deref(c).get("id") or "ac"))
                tree_id = tree_id or obj.tree_id
            continue
        if isinstance(obj, JointTipAlias):
            # a mirrored tip-height view contributes no density to the
            # compound likelihood (the tie is a reparameterization)
            continue
        if type(obj).__name__ == "IntegratedFactorModel":
            # the factor data density is already INSIDE the companion
            # traitDataLikelihood's integrated marginal (the reference
            # splits p(data|factors) and p(factors|tree) across the two
            # elements; models/factor.py computes the product directly)
            continue
        if (isinstance(obj, tuple) and obj
                and obj[0] in ("subst", "subst_q")):
            # an SVS substitution model inside <prior> contributes its
            # indicator-connectivity density (ref:
            # SVSGeneralSubstitutionModel.getLogLikelihood():111-115)
            cid = ax.deref(c).get("id")
            if cid and cid in getattr(ax, "_svs_models", {}):
                from beast_mcmc_tpu.config.xml_geo import (
                    svs_connectivity_prior,
                )

                parts.append(svs_connectivity_prior(ax, cid))
            continue
        if not isinstance(obj, LikelihoodFn):
            raise Unsupported(f"<{el.tag}> child <{ax.deref(c).tag}>")
        parts.append(obj)
        tree_id = tree_id or obj.tree_id

    def fn(params, tree):
        tot = 0.0
        for p in parts:
            tot = tot + p.fn(params, tree)
        return tot

    out = LikelihoodFn(fn, tree_id, el.get("id") or el.tag)
    # expose the addends for component-cached MCMC stepping
    # (inference/component_cache.py — the dirty-flag role)
    out.parts = tuple(parts)
    return out


# -- statistics ---------------------------------------------------------------


@register("treeLengthStatistic")
def _tree_length_statistic(ax: XmlAnalysis, el):
    tm = ax.build(_child_of(el, "treeModel"))

    def stat(s, tid=tm.tree_id):
        t = ax.resolve_tree(tid, s.params, s.tree)
        bl = t.heights[t.parent] - t.heights
        return jnp.sum(jnp.where(t.parent >= 0, bl, 0.0))

    return stat


@register("tmrcaStatistic")
def _tmrca_statistic(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.models.speciation import mrca_node

    tm = None
    taxa = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "treeModel":
            tm = ax.build(cc)
        elif cc.tag == "mrca":
            for t in cc:
                taxa = ax.build(ax.deref(t))
    if tm is None:
        raise XmlError("tmrcaStatistic needs treeModel")
    if taxa is None:
        # no mrca clade -> age of the root (absolute tmrca of all taxa)
        return lambda s: s.tree.heights[s.tree.root]
    m = tm.parent.shape[0]
    tip_set = np.zeros(m, bool)
    for n, _ in taxa:
        tip_set[tm.taxa.index(n)] = True

    def stat(s, tid=tm.tree_id):
        t = ax.resolve_tree(tid, s.params, s.tree)
        node = mrca_node(t.parent, t.heights, jnp.asarray(tip_set))
        return t.heights[node]

    return stat


@register("rateStatistic")
def _rate_statistic(ax: XmlAnalysis, el):
    mode = _attr(el, "mode", "mean")
    clock = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeModel", "starTreeModel"):
            continue
        obj = ax.build(cc)
        if isinstance(obj, ClockModel):
            clock = obj
    if clock is None:
        raise XmlError("rateStatistic without a branch-rate model")

    def stat(s):
        t = ax.resolve_tree(clock.tree_id, s.params, s.tree) \
            if clock.tree_id else s.tree
        r = jnp.broadcast_to(clock.rates(s.params, t), t.parent.shape)
        mask = t.parent >= 0
        n = jnp.sum(mask)
        mean = jnp.sum(jnp.where(mask, r, 0.0)) / n
        if mode == "mean":
            return mean
        var = jnp.sum(jnp.where(mask, (r - mean) ** 2, 0.0)) / (n - 1)
        return jnp.sqrt(var) / mean  # coefficientOfVariation

    return stat


@register("rateCovarianceStatistic")
def _rate_covariance_statistic(ax: XmlAnalysis, el):
    clock = None
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeModel", "starTreeModel"):
            continue
        obj = ax.build(cc)
        if isinstance(obj, ClockModel):
            clock = obj
    if clock is None:
        raise XmlError("rateCovarianceStatistic without clock")

    def stat(s):
        # correlation between parent and child branch rates
        t = ax.resolve_tree(clock.tree_id, s.params, s.tree) \
            if clock.tree_id else s.tree
        r = jnp.broadcast_to(clock.rates(s.params, t), t.parent.shape)
        par = t.parent
        mask = (par >= 0) & (t.parent[jnp.maximum(par, 0)] >= 0)
        x = jnp.where(mask, r, 0.0)
        y = jnp.where(mask, r[jnp.maximum(par, 0)], 0.0)
        n = jnp.sum(mask)
        mx = jnp.sum(x) / n
        my = jnp.sum(y) / n
        cov = jnp.sum(jnp.where(mask, (r - mx) * (r[jnp.maximum(par, 0)] - my),
                                0.0)) / (n - 1)
        sx = jnp.sqrt(jnp.sum(jnp.where(mask, (r - mx) ** 2, 0.0)) / (n - 1))
        sy = jnp.sqrt(jnp.sum(
            jnp.where(mask, (r[jnp.maximum(par, 0)] - my) ** 2, 0.0)
        ) / (n - 1))
        return cov / (sx * sy)

    return stat




@register("statistic")
def _generic_statistic(ax: XmlAnalysis, el):
    """<statistic> views: N0 of a log-space demographic model, or a plain
    parameter pass-through (ref: dr.inference.model.Statistic parsers)."""
    for c in el:
        cc = ax.deref(c)
        obj = ax.build(cc)
        if isinstance(obj, Demographic):
            pname = obj.params["pop"]
            if obj.kind.endswith("_log"):
                return lambda s, n=pname: jnp.exp(
                    jnp.mean(s.params[n])
                )
            return lambda s, n=pname: jnp.mean(s.params[n])
        if isinstance(obj, Param):
            return lambda s, n=obj.name: jnp.reshape(s.params[n], ())
    raise Unsupported("<statistic> contents")

@register("sumStatistic")
def _sum_statistic(ax: XmlAnalysis, el):
    names = []
    for c in el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            names.append(obj.name)

    def stat(s):
        return sum(jnp.sum(s.params[n]) for n in names)

    return stat


# -- operators ----------------------------------------------------------------


@register("operators")
def _operators(ax: XmlAnalysis, el):
    ops = []
    tree_ids = []
    for c in el:
        built = _build_operator(ax, c)
        if built is None:
            continue
        op, tid = built
        if isinstance(op, list):
            ops.extend(op)
            tree_ids.extend([tid] * len(op))
        else:
            ops.append(op)
            tree_ids.append(tid)
    if not ops:
        raise XmlError("<operators> produced no operators")
    return ops, tree_ids


def _op_target(ax, el):
    """(kind, payload, tree_id) of the parameter/tree an operator acts on."""
    for c in el:
        cc = ax.deref(c)
        if cc.tag in ("treeModel", "starTreeModel"):
            tm = ax.build(cc)
            return ("tree", None, tm.tree_id)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            if isinstance(obj, TreeAlias):
                return ("alias", obj, obj.tree_id)
            if isinstance(obj, DerivedParam):
                if obj.idx is not None:
                    return ("masked", obj, None)
                return ("param", ax._params[obj.base], None)
            return ("param", obj, None)
        if cc.tag == "compoundParameter":
            return ("compound", ax.build(cc), None)
        if cc.tag in ("matrixParameter", "compoundSymmetricMatrix"):
            from beast_mcmc_tpu.config.xml_hmc import matrix_param_of

            mp = matrix_param_of(ax, cc)
            return ("compound", CompoundParam(list(mp.names)), None)
    # a parameter-view element (maskedParameter etc.) also qualifies
    for c in el:
        cc = ax.deref(c)
        if cc.tag in _BUILDERS:
            try:
                obj = ax.build(cc)
            except (Unsupported, XmlError):
                continue
            if isinstance(obj, Param):
                return ("param", obj, None)
            if isinstance(obj, DerivedParam) and obj.base:
                # masked/transformed view: operators walk the base
                return ("param", ax._params[obj.base], None)
            if isinstance(obj, TreeAlias):
                return ("alias", obj, obj.tree_id)
    raise XmlError(f"operator <{el.tag}> has no target")


def _build_operator(ax: XmlAnalysis, el):
    from beast_mcmc_tpu.inference import operators as O
    from beast_mcmc_tpu.inference import tree_operators as T

    w = _attr(el, "weight", 1.0, float)
    tag = el.tag

    if tag in _OP_EXT:
        return _OP_EXT[tag](ax, el, w)

    if tag in ("subtreeSlide",):
        kind, _, tid = _op_target(ax, el)
        size = _attr(el, "size", 1.0, float)
        return T.SubtreeSlideOperator(
            weight=w, size=size, gaussian=_attr(el, "gaussian", True, bool)
        ), tid
    if tag == "subtreeLeap":
        kind, _, tid = _op_target(ax, el)
        return T.SubtreeLeapOperator(
            weight=w, size=_attr(el, "size", 1.0, float)
        ), tid
    if tag == "subtreeJump":
        # ref: SubtreeJumpOperatorParser (SUBTREE_JUMP), size/uniform attrs
        kind, _, tid = _op_target(ax, el)
        return T.SubtreeJumpOperator(
            weight=w, size=_attr(el, "size", 1.0, float),
            uniform=_attr(el, "uniform", False, bool),
        ), tid
    if tag in ("GibbsPruneAndRegraft", "gibbsPruneAndRegraft"):
        # ref: GibbsPruneAndRegraftParser (GIBBS_PRUNE_AND_REGRAFT)
        kind, _, tid = _op_target(ax, el)
        return T.GibbsPruneAndRegraftOperator(weight=w), tid
    if tag == "narrowExchange":
        _, _, tid = _op_target(ax, el)
        return O.NarrowExchangeOperator(weight=w), tid
    if tag == "wideExchange":
        _, _, tid = _op_target(ax, el)
        return O.WideExchangeOperator(weight=w), tid
    if tag == "wilsonBalding":
        _, _, tid = _op_target(ax, el)
        return O.WilsonBaldingOperator(weight=w), tid

    if tag == "scaleOperator":
        sf = _attr(el, "scaleFactor", 0.75, float)
        ind_el = el.find("indicators")
        if ind_el is not None:
            data = ax.param_from(el)  # the first plain parameter child
            inds = ax.param_from(ind_el)
            return ActiveEntryScaleOperator(
                data_param=data, ind_param=inds, scale_factor=sf,
                weight=w,
            ), None
        kind, obj, tid = _op_target(ax, el)
        if kind == "alias":
            if obj.kind == "root_height":
                if tid in ax._star_trees:
                    n = len(ax.build(ax._ids[tid]).taxa)
                    return O.StarRootHeightScaleOperator(
                        weight=w, scale_factor=sf, n_taxa=n), tid
                return O.RootHeightScaleOperator(weight=w, scale_factor=sf), tid
            if obj.kind in ("internal_heights", "all_heights"):
                return T.ScaleNodeHeightOperator(weight=w, scale_factor=sf), tid
            if obj.kind == "leaf_height":
                return T.TipHeightScaleOperator(
                    weight=w, scale_factor=sf, tip=obj.tip_index
                ), tid
            raise Unsupported(f"scaleOperator on {obj.kind}")
        scale_all = _attr(el, "scaleAll", False, bool)
        if kind == "compound":
            return [
                O.ScaleOperator(parameter=n, weight=w / len(obj.names),
                                scale_factor=sf,
                                mode="all" if scale_all else "random",
                                lower=0.0)
                for n in obj.names
            ], None
        return O.ScaleOperator(
            parameter=obj.name, weight=w, scale_factor=sf,
            mode="all" if scale_all else "random",
            lower=max(obj.lower, 0.0), upper=obj.upper,
        ), tid

    if tag == "randomWalkOperator":
        # a masked view walks ONLY the mask==1 entries of the base
        # (ref: MaskedParameter proxies just those dims to the operator)
        for c in el:
            cc2 = ax.deref(c)
            if cc2.tag == "maskedParameter":
                mobj = ax.build(cc2)
                if isinstance(mobj, DerivedParam) and mobj.idx is not None:
                    return O.SubsetRandomWalkOperator(
                        parameter=mobj.base,
                        indices=tuple(int(i) for i in mobj.idx),
                        weight=w,
                        window=_attr(el, "windowSize", 1.0, float),
                    ), None
        kind, obj, tid = _op_target(ax, el)
        window = _attr(el, "windowSize", 1.0, float)
        if kind == "masked":
            return O.SubsetRandomWalkOperator(
                parameter=obj.base,
                indices=tuple(int(i) for i in obj.idx),
                weight=w, window=window,
            ), None
        if kind == "alias":
            if obj.kind == "leaf_height":
                return T.TipHeightRandomWalkOperator(
                    weight=w, window=window, tip=obj.tip_index
                ), tid
            raise Unsupported(f"randomWalk on {obj.kind}")
        if kind == "compound":
            return [
                O.RandomWalkOperator(parameter=n, weight=w / len(obj.names),
                                     window=window)
                for n in obj.names
            ], None
        lower, upper = obj.lower, obj.upper
        refl = _attr(el, "boundaryCondition", "") == "reflecting"
        return O.RandomWalkOperator(
            parameter=obj.name, weight=w, window=window,
            lower=lower, upper=upper, reflect=refl,
        ), tid

    if tag == "randomWalkIntegerOperator":
        kind, obj, tid = _op_target(ax, el)
        window = int(_attr(el, "windowSize", 1, float))
        lo = 0 if not np.isfinite(obj.lower) else int(obj.lower)
        hi = obj.value.size if not np.isfinite(obj.upper) else int(obj.upper)
        return O.UniformIntegerOperator(
            parameter=obj.name, weight=w, lower=lo, upper=hi
        ), tid

    if tag == "uniformOperator":
        for c in el:
            cc = ax.deref(c)
            if cc.tag == "jointParameter":
                ja = ax.build(cc)
                return JointTipHeightOperator(
                    ax=ax, targets=ja.targets, weight=w
                ), ja.targets[0][0]
        kind, obj, tid = _op_target(ax, el)
        if kind == "alias" and obj.kind in ("internal_heights",
                                            "all_heights"):
            return O.UniformNodeHeightOperator(weight=w), tid
        if kind == "alias" and obj.kind == "leaf_height":
            return T.TipHeightUniformOperator(weight=w, tip=obj.tip_index), tid
        if kind == "param":
            lo = obj.lower if np.isfinite(obj.lower) else 0.0
            hi = obj.upper if np.isfinite(obj.upper) else 1.0
            return O.UniformRealOperator(
                parameter=obj.name, weight=w, lower=lo, upper=hi
            ), tid
        raise Unsupported(f"uniformOperator on {kind}")

    if tag == "uniformIntegerOperator":
        kind, obj, tid = _op_target(ax, el)
        lo = int(_attr(el, "lower", 0, float))
        n_cat = obj.value.size - 1
        hi = int(_attr(el, "upper", n_cat, float))
        return O.UniformIntegerOperator(
            parameter=obj.name, weight=w, lower=lo, upper=hi
        ), tid

    if tag == "swapOperator":
        kind, obj, tid = _op_target(ax, el)
        return O.SwapOperator(parameter=obj.name, weight=w), tid

    if tag == "centeredScale":
        # ref: CenteredScaleOperator — scales the spread around the mean;
        # substituted by a windowed random walk (same support, valid MH)
        kind, obj, tid = _op_target(ax, el)
        if kind == "compound":
            return [O.RandomWalkOperator(parameter=n,
                                         weight=w / len(obj.names),
                                         window=0.2)
                    for n in obj.names], None
        return O.RandomWalkOperator(parameter=obj.name, weight=w,
                                    window=0.2), tid

    if tag == "compoundPrecisionOperator":
        # ref: CompoundPrecisionOperator — runs the wrapped diffusion +
        # residual precision Gibbs operators; build both inner operators
        inner_ops = []
        for c in el:
            for d in c:
                built_i = _build_operator(ax, ax.deref(d))
                if built_i is not None:
                    op_i, _ = built_i
                    inner_ops.extend(op_i if isinstance(op_i, list)
                                     else [op_i])
        if not inner_ops:
            raise Unsupported("compoundPrecisionOperator structure")
        for op_i in inner_ops:
            op_i.weight = w / len(inner_ops)
        return inner_ops, None

    if tag in ("regressionGibbsEffectOperator",
               "regressionGibbsPrecisionOperator",
               "regressionMetropolizedIndicatorOperator"):
        # ref: RegressionGibbsEffectOperator etc. — conjugate draws for
        # GLM blocks; substituted by posterior-preserving walk/scale/flip
        # moves on the same targets
        kind, obj, tid = _op_target(ax, el)
        if tag.endswith("PrecisionOperator"):
            return O.ScaleOperator(parameter=obj.name, weight=w,
                                   scale_factor=0.75), tid
        if tag.endswith("IndicatorOperator"):
            return O.BitFlipOperator(parameter=obj.name, weight=w), tid
        return O.RandomWalkOperator(parameter=obj.name, weight=w,
                                    window=0.3), tid

    if tag == "fireParameterChanged":
        # ref: FireParameterChangedOperator — model-graph cache poke; the
        # functional chain re-evaluates everything, so a no-op accept
        from beast_mcmc_tpu.config.xml_hmc import _IdentityOperator

        return _IdentityOperator(weight=w), None

    if tag == "patternWeightIncrementOperator":
        # ref: PatternWeightIncrementOperator — online-BEAST data
        # arrival; here the chain scores the FULL data from the start
        # (same target posterior at the end of the run)
        from beast_mcmc_tpu.config.xml_hmc import _IdentityOperator

        return _IdentityOperator(weight=w), None

    if tag == "deltaMixOperator":
        # ref: DeltaMixOperator — multiplicative sum-preserving exchange;
        # substituted by the additive delta exchange (same invariant sum,
        # same support, different kernel)
        kind, obj, tid = _op_target(ax, el)
        return O.DeltaExchangeOperator(
            parameter=obj.name, weight=w,
            delta=_attr(el, "delta", 0.02, float),
            adaptable=_attr(el, "autoOptimize", True, bool),
        ), tid

    if tag == "deltaExchange":
        kind, obj, tid = _op_target(ax, el)
        delta = _attr(el, "delta", 0.02, float)
        if kind == "compound":
            pw = [float(x) for x in
                  (el.get("parameterWeights") or "").split()] or None
            return O.CompoundWeightedDeltaOperator(
                parameters=tuple(obj.names),
                parameter_weights=tuple(pw) if pw else (),
                delta=delta, weight=w,
            ), tid
        return O.DeltaExchangeOperator(
            parameter=obj.name, weight=w, delta=delta,
            integer=_attr(el, "integer", False, bool),
            adaptable=_attr(el, "autoOptimize", True, bool),
        ), tid

    if tag == "upDownOperator":
        up, down, up_trees, down_trees = [], [], [], []
        tid = None
        for c in el:
            if c.tag not in ("up", "down"):
                continue
            for cc in c:
                cc = ax.deref(cc)
                obj = ax.build(cc)
                if isinstance(obj, TreeAlias):
                    tid = obj.tree_id
                    (up_trees if c.tag == "up" else down_trees).append(
                        obj.tree_id)
                elif isinstance(obj, CompoundParam):
                    (up if c.tag == "up" else down).extend(obj.names)
                else:
                    (up if c.tag == "up" else down).append(obj.name)
        if len(set(up_trees + down_trees)) > 1:
            return MultiTreeUpDownOperator(
                ax=ax, up_params=tuple(up), down_params=tuple(down),
                up_trees=tuple(dict.fromkeys(up_trees)),
                down_trees=tuple(dict.fromkeys(down_trees)), weight=w,
                scale_factor=_attr(el, "scaleFactor", 0.75, float),
            ), None
        return O.UpDownOperator(
            up=tuple(up + [O.TREE_HEIGHTS] * len(up_trees)),
            down=tuple(down + [O.TREE_HEIGHTS] * len(down_trees)),
            weight=w,
            scale_factor=_attr(el, "scaleFactor", 0.75, float),
        ), tid

    if tag == "bitFlipOperator":
        kind, obj, tid = _op_target(ax, el)
        return O.BitFlipOperator(parameter=obj.name, weight=w), tid

    if tag == "bitFlipInSubstitutionModelOperator":
        # ref: BitFlipInSubstitutionModelOperator — flips an SVS
        # indicator bit and rescales mu; substituted by the plain
        # posterior-preserving bit-flip (mu has its own scale operator)
        for c in el:
            cc = ax.deref(c)
            if cc.tag in ("svsGeneralSubstitutionModel",
                          "generalSubstitutionModel"):
                ax.build(cc)
                rec = getattr(ax, "_svs_models", {}).get(cc.get("id"))
                if rec is not None:
                    return O.BitFlipOperator(parameter=rec[1], weight=w), None
        raise Unsupported("bitFlipInSubstitutionModelOperator structure")

    if tag in ("gmrfBlockUpdateOperator", "gmrfGridBlockUpdateOperator"):
        # the REAL conditioned-Gaussian block update (ref:
        # GMRFSkyrideBlockUpdateOperator.java:245-345; the Grid variant
        # is GMRFSkygridBlockUpdateOperatorParser — same update on the
        # gridded field) for ungrouped
        # skyride/skygrid fields; grouped fields keep the
        # posterior-preserving scale+walk substitution
        pops = prec = None
        sky_el = None
        for c in el:
            cc = ax.deref(c)
            if cc.tag in ("gmrfSkyrideLikelihood", "gmrfSkylineLikelihood",
                          "gmrfSkyLineLikelihood", "gmrfSkyGridLikelihood",
                          "skyGridLikelihood"):
                sky_el = cc
                for sub in cc:
                    if sub.tag == "populationSizes":
                        pops = ax.param_from(sub)
                    elif sub.tag == "precisionParameter":
                        prec = ax.param_from(sub)
        if pops is None:
            raise Unsupported("gmrfBlockUpdateOperator structure")
        ax.build(sky_el)  # ensures the field is sized from the tree
        tm_b = None
        pt = sky_el.find("populationTree")
        if pt is not None:
            for t in pt:
                tm_b = ax.build(ax.deref(t))
        n_field = int(np.atleast_1d(ax._params[pops].value).size)
        grouped = sky_el.find("groupSizes") is not None and (
            n_field != (len(tm_b.taxa) - 1 if tm_b else -1))
        is_grid = sky_el.tag in ("gmrfSkyGridLikelihood",
                                 "skyGridLikelihood")
        cuts = None
        if is_grid:
            ngp = sky_el.find("numGridPoints")
            cut = sky_el.find("cutOff")
            if ngp is not None and cut is not None:
                n_grid = int(float(np.ravel(
                    ax.value_of(ax.param_from(ngp)))[0]))
                cutoff = float(np.ravel(
                    ax.value_of(ax.param_from(cut)))[0])
                cuts = tuple(np.linspace(cutoff / n_grid, cutoff, n_grid))
        if tm_b is not None and not grouped:
            from beast_mcmc_tpu.inference.gibbs import (
                GmrfBlockUpdateOperator,
            )

            return GmrfBlockUpdateOperator(
                field=pops, precision=prec, n_taxa=len(tm_b.taxa),
                weight=w,
                scale_factor=_attr(el, "scaleFactor", 2.0, float),
                time_aware=_attr(sky_el, "timeAwareSmoothing", True, bool)
                and not is_grid,
                cut_points=cuts,
            ), tm_b.tree_id
        from beast_mcmc_tpu.inference import operators as O2

        return [
            O2.ScaleOperator(parameter=prec, weight=w / 2, scale_factor=0.75),
            O2.RandomWalkOperator(parameter=pops, weight=w / 2, window=0.5),
        ], None

    if tag == "sampleNonActiveOperator":
        dist = None
        for c in _child_of(el, "distribution"):
            dist = ax.build(ax.deref(c))
        if not (isinstance(dist, tuple) and dist[0] == "dist"
                and dist[1] == "exponential"):
            raise Unsupported("sampleNonActiveOperator distribution")
        data = ax.param_from(_child_of(el, "data"))
        inds = ax.param_from(_child_of(el, "indicators"))
        return SampleNonActiveOperator(
            mean_param=dist[2], data_param=data, ind_param=inds, weight=w,
        ), None

    if tag == "gmrfFixedEffectsGibbsOperator":
        # posterior-preserving substitution: random walk on the fixed
        # effects instead of the conjugate Gibbs draw (same posterior)
        bname = None
        for c in el.iter("parameter"):
            r = c.get("idref")
            if r:
                obj = ax.build(ax.deref(c))
                if isinstance(obj, Param):
                    bname = obj.name
                    break
        if bname is None:
            raise Unsupported("gmrfFixedEffectsGibbsOperator target")
        return O.RandomWalkOperator(parameter=bname, weight=w,
                                    window=0.3), None

    raise Unsupported(f"operator <{tag}>")


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def run_testxml(path: str, scale: float = 1.0, seed: int = 666,
                tolerance_se: float = 3.0, max_states: int = 200_000,
                full_eval_steps: int = 100, strict_expectations: bool = True):
    """Execute one reference TestXML file; returns the assertion tuples.
    Raises AssertionError on failed expectations (unless
    strict_expectations=False — the reference itself only WARNS,
    TraceAnalysisParser.java:108-112), Unsupported for vocabulary outside
    the registry."""
    ax = XmlAnalysis(path, scale=scale, seed=seed, max_states=max_states,
                     strict_expectations=strict_expectations)
    return ax.run(tolerance_se=tolerance_se, full_eval_steps=full_eval_steps)


# -- distributionLikelihood ---------------------------------------------------
# (ref: src/dr/inferencexml/distribution/DistributionLikelihoodParser.java —
# a parametric distribution MODEL over arbitrary data parameters/statistics;
# unlike the *Prior attr forms the distribution's parameters may themselves
# be estimated, so densities read them from `params` at runtime.)


def _dist_model_logpdf(ax: XmlAnalysis, el):
    """(params, x) -> summed log density for a distribution-model element
    (ref parser vocabularies cited per branch)."""
    from beast_mcmc_tpu.models import priors as P

    cc = ax.deref(el)
    tag = cc.tag
    if tag == "normalDistributionModel":
        # ref: NormalDistributionModelParser (mean + stdev|precision)
        mname = ax.param_from(_child_of(cc, "mean"))
        prec_el = cc.find("precision")
        if prec_el is not None:
            pname = ax.param_from(prec_el)
            return lambda params, x: P.normal_logpdf(
                x, params[mname], 1.0 / jnp.sqrt(params[pname]))
        sname = ax.param_from(_child_of(cc, "stdev"))
        return lambda params, x: P.normal_logpdf(
            x, params[mname], params[sname])
    if tag == "logNormalDistributionModel":
        # ref: LogNormalDistributionModelParser (mu/sigma or mean/stdev
        # with meanInRealSpace, offset)
        offset = _attr(cc, "offset", 0.0, float)
        mreal = _attr(cc, "meanInRealSpace", False, bool)
        mu_el = cc.find("mu")
        mean_el = cc.find("mean")
        sig_el = cc.find("sigma")
        sd_el = cc.find("stdev")
        prec_el = cc.find("precision")
        loc = ax.param_from(mu_el if mu_el is not None else mean_el)
        if sig_el is not None:
            sc = ax.param_from(sig_el)
            scale_of = lambda params: params[sc]
        elif sd_el is not None:
            sc = ax.param_from(sd_el)
            scale_of = lambda params: params[sc]
        elif prec_el is not None:
            sc = ax.param_from(prec_el)
            scale_of = lambda params: 1.0 / jnp.sqrt(params[sc])
        else:
            raise XmlError("logNormalDistributionModel without scale")

        def lp(params, x):
            s = scale_of(params)
            m = params[loc]
            mu = jnp.where(mreal, jnp.log(m) - 0.5 * s * s, m)
            return P.lognormal_logpdf(x - offset, mu, s)

        return lp
    if tag == "gammaDistributionModel":
        # ref: GammaDistributionModelParser (shape + scale|rate, offset)
        offset = _attr(cc, "offset", 0.0, float)
        shname = ax.param_from(_child_of(cc, "shape"))
        rate_el = cc.find("rate")
        if rate_el is not None:
            rname = ax.param_from(rate_el)
            return lambda params, x: P.gamma_logpdf(
                x - offset, params[shname], 1.0 / params[rname])
        scname = ax.param_from(_child_of(cc, "scale"))
        return lambda params, x: P.gamma_logpdf(
            x - offset, params[shname], params[scname])
    if tag == "exponentialDistributionModel":
        mname = ax.param_from(_child_of(cc, "mean"))
        return lambda params, x: P.exponential_logpdf(x, params[mname])
    if tag == "inverseGammaDistributionModel":
        shname = ax.param_from(_child_of(cc, "shape"))
        scname = ax.param_from(_child_of(cc, "scale"))
        return lambda params, x: P.inverse_gamma_logpdf(
            x, params[shname], params[scname])
    if tag == "betaDistributionModel":
        aname = ax.param_from(_child_of(cc, "alpha"))
        bname = ax.param_from(_child_of(cc, "beta"))
        return lambda params, x: P.beta_logpdf(
            x, params[aname], params[bname])
    if tag == "uniformDistributionModel":
        lname = ax.param_from(_child_of(cc, "lower"))
        uname = ax.param_from(_child_of(cc, "upper"))
        return lambda params, x: P.uniform_logpdf(
            x, params[lname], params[uname])
    raise Unsupported(f"distribution model <{tag}>")


@register("distributionLikelihood")
def _distribution_likelihood(ax: XmlAnalysis, el):
    dist_el = el.find("distribution")
    if dist_el is not None:
        model_el = next(iter(dist_el))
    else:
        cands = [c for c in el if c.tag != "data"]
        if not cands:
            raise XmlError("distributionLikelihood without distribution")
        model_el = cands[0]
    pdf = _dist_model_logpdf(ax, model_el)
    data_el = el.find("data")
    if data_el is None:
        raise XmlError("distributionLikelihood without data")
    targets = _targets_of(ax, data_el)

    def fn(params, tree):
        tot = 0.0
        for t in targets:
            tot = tot + _masked_sum(
                t(params, tree), lambda x: pdf(params, x))
        return tot

    dnames = []
    for c in data_el:
        cc = ax.deref(c)
        if cc.tag == "parameter":
            obj = ax.build(cc)
            if isinstance(obj, Param):
                dnames.append(obj.name)
    return LikelihoodFn(fn, None, el.get("id") or "distributionLikelihood",
                        tuple(dnames))


# ---------------------------------------------------------------------------
# extension vocabularies (register into _BUILDERS/_OP_EXT on import)
# ---------------------------------------------------------------------------

from beast_mcmc_tpu.config import xml_hmc as _xml_hmc  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_traits as _xml_traits  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_assert as _xml_assert  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_ext as _xml_ext  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_field as _xml_field  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_geo as _xml_geo  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_stats as _xml_stats  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_factor as _xml_factor  # noqa: E402,F401
from beast_mcmc_tpu.config import xml_mle as _xml_mle  # noqa: E402,F401
