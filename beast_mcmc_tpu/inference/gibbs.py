"""Conjugate Gibbs operators.

The reference implements exact conditional samplers for conjugate blocks
(ref: src/dr/inference/operators/NormalNormalMeanGibbsOperator.java,
NormalGammaPrecisionGibbsOperator.java, and the GMRF block updater
GMRFSkyrideBlockUpdateOperator.java). Here each is a pure proposal that
draws the target block from its full conditional and reports
log_hastings = +inf — the MH kernel then always accepts (the reference
marks these GIBBS_OPERATOR for the same always-accept bypass,
MarkovChain.java:228-239).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from beast_mcmc_tpu.utils.accum import prefix_sum

from beast_mcmc_tpu.inference.operators import Operator


@dataclasses.dataclass
class NormalNormalMeanGibbs(Operator):
    """mu | x ~ N((p0 m0 + n tau xbar)/(p0 + n tau), 1/(p0 + n tau)) for
    an iid Normal(mu, 1/tau) likelihood with a Normal(m0, 1/p0) prior on
    mu (ref: NormalNormalMeanGibbsOperator.java doOperation)."""

    mean_param: str = ""
    data_params: Sequence[str] = ()
    # precision accessor: params -> scalar tau of the likelihood
    precision_of: Optional[Callable] = None
    prior_mean: float = 0.0
    prior_stdev: float = 1.0
    adaptable: bool = False

    @property
    def modifies_params(self):
        return (self.mean_param,)

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        xs = jnp.concatenate(
            [jnp.ravel(params[n]) for n in self.data_params]).astype(dt)
        n = xs.shape[0]
        tau = jnp.asarray(self.precision_of(params), dt)
        p0 = jnp.asarray(1.0 / (self.prior_stdev ** 2), dt)
        m0 = jnp.asarray(self.prior_mean, dt)
        prec = p0 + n * tau
        mean = (p0 * m0 + tau * jnp.sum(xs)) / prec
        draw = mean + jax.random.normal(key, (), dt) / jnp.sqrt(prec)
        old = params[self.mean_param]
        new = jnp.broadcast_to(draw, jnp.shape(old)).astype(old.dtype)
        return {**params, self.mean_param: new}, tree, jnp.inf


@dataclasses.dataclass
class NormalGammaPrecisionGibbs(Operator):
    """tau | x ~ Gamma(a0 + n/2, rate0 + sum (x - mu)^2 / 2) for an iid
    Normal(mu, 1/tau) likelihood with Gamma(shape=a0, scale) prior on tau
    (ref: NormalGammaPrecisionGibbsOperator.java doOperation)."""

    precision_param: str = ""
    data_params: Sequence[str] = ()
    mean_of: Optional[Callable] = None  # params -> mu
    prior_shape: float = 1.0
    prior_scale: float = 1.0  # BEAST gammaPrior scale; rate = 1/scale
    adaptable: bool = False

    @property
    def modifies_params(self):
        return (self.precision_param,)

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        xs = jnp.concatenate(
            [jnp.ravel(params[n]) for n in self.data_params]).astype(dt)
        n = xs.shape[0]
        mu = jnp.asarray(self.mean_of(params), dt)
        sse = jnp.sum(jnp.square(xs - mu))
        shape = jnp.asarray(self.prior_shape, dt) + 0.5 * n
        rate = 1.0 / jnp.asarray(self.prior_scale, dt) + 0.5 * sse
        draw = jax.random.gamma(key, shape, dtype=dt) / rate
        old = params[self.precision_param]
        new = jnp.broadcast_to(draw, jnp.shape(old)).astype(old.dtype)
        return {**params, self.precision_param: new}, tree, jnp.inf


@dataclasses.dataclass
class GmrfBlockUpdateOperator(Operator):
    """The skyride/skygrid block update (ref:
    GMRFSkyrideBlockUpdateOperator.java:245-345): scale the precision,
    Newton-find the mode of the field's full conditional under the NEW
    precision, propose the field from the Gaussian (Laplace)
    approximation at the mode, and correct with the forward/backward
    proposal densities. Tridiagonal algebra runs dense (field lengths are
    O(taxa); one Cholesky per direction).

    Works for both the skyride field (one entry per coalescent interval;
    sufficient statistics from the tree) and the skygrid (fixed grid;
    pass cut_points)."""

    field: str = ""       # gamma = log pop sizes
    precision: str = ""   # tau
    n_taxa: int = 0
    scale_factor: float = 2.0
    time_aware: bool = False
    cut_points: Optional[Tuple[float, ...]] = None  # skygrid grid
    newton_iters: int = 12
    adaptable: bool = True

    @property
    def modifies_params(self):
        return (self.field, self.precision)

    def initial_adapt(self):
        import math

        return math.sqrt(self.scale_factor - 1.0)

    def tuning(self, adapt_value):
        return 1.0 + adapt_value * adapt_value

    def _suff_stats(self, tree):
        """(w[F], n_events[F]) exposure statistics per field entry."""
        from beast_mcmc_tpu.models.coalescent import coalescent_intervals

        dt = tree.heights.dtype
        times, lineages, is_coal = coalescent_intervals(
            tree.heights, self.n_taxa)
        k = lineages[:-1]
        choose2 = (k * (k - 1) / 2.0).astype(dt)
        expo = choose2 * jnp.diff(times)
        if self.cut_points is not None:
            cuts = jnp.asarray(self.cut_points, dt)
            f = cuts.shape[0] + 1
            lo = jnp.concatenate([jnp.zeros((1,), dt), cuts])
            hi = jnp.concatenate([cuts, jnp.full((1,), jnp.inf, dt)])
            t0 = times[:-1][:, None]
            t1 = times[1:][:, None]
            frac = jnp.clip(
                jnp.minimum(t1, hi[None]) - jnp.maximum(t0, lo[None]), 0.0)
            w = jnp.sum(choose2[:, None] * frac, axis=0)
            cell = jnp.searchsorted(cuts, times, side="left")
            n_events = jnp.zeros((f,), dt).at[cell].add(
                is_coal.astype(dt))
            return w, n_events
        # skyride: field entry i governs the interval ending at the i-th
        # coalescent event
        f = self.n_taxa - 1
        coal_before = prefix_sum(is_coal.astype(jnp.int32))
        idx = jnp.minimum(coal_before[:-1], f - 1)
        w = jnp.zeros((f,), dt).at[idx].add(expo)
        return w, jnp.ones((f,), dt)

    def _q_matrix(self, tau, tree, f, dt):
        """tau-scaled RW1 precision (uniform weights; the time-aware
        variant scales off-diagonals by inter-knot spacing)."""
        if self.time_aware and self.cut_points is None:
            from beast_mcmc_tpu.models.coalescent import (
                skyride_coalescent_midpoints,
            )

            knots = skyride_coalescent_midpoints(tree.heights, self.n_taxa)
            # time-aware RW1 weights w_{i,i+1} = 2/(d_i + d_{i+1}) over
            # the field-knot spacings (ref: GMRFSkyrideLikelihood
            # setupGMRFWeights timeAwareSmoothing)
            sp = jnp.diff(jnp.concatenate([jnp.zeros((1,), dt), knots]))
            offd = -2.0 / jnp.maximum(sp[:-1] + sp[1:], 1e-12)
            diag = jnp.zeros((f,), dt)
            diag = diag.at[:-1].add(-offd)
            diag = diag.at[1:].add(-offd)
            q = (jnp.diag(diag) + jnp.diag(offd, 1)
                 + jnp.diag(offd, -1))
            return tau * q
        diag = jnp.full((f,), 2.0, dt).at[0].set(1.0).at[-1].set(1.0)
        off = jnp.full((f - 1,), -1.0, dt)
        return tau * (jnp.diag(diag) + jnp.diag(off, 1)
                      + jnp.diag(off, -1))

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        gamma = jnp.ravel(params[self.field]).astype(dt)
        f = gamma.shape[0]
        tau = jnp.ravel(params[self.precision])[0].astype(dt)

        k_prec, k_mix, k_norm = jax.random.split(key, 3)
        # precision proposal (ref getNewPrecision:94-108: uniform-slab /
        # power mixture over [tau/s, tau*s])
        s = tuning.astype(dt)
        length = s - 1.0 / s
        u1 = jax.random.uniform(k_mix, (), dt)
        u2 = jax.random.uniform(k_prec, (), dt)
        slab = (1.0 / s + length * u2) * tau
        power = jnp.power(s, 2.0 * u2 - 1.0) * tau
        tau_new = jnp.where(
            u1 < length / (length + 2.0 * jnp.log(s)), slab, power)

        w, n_events = self._suff_stats(tree)

        def newton(q, g0):
            def body(_, g):
                grad = -(q @ g) + (w * jnp.exp(-g) - n_events)
                jac = q + jnp.diag(w * jnp.exp(-g))
                return g + jnp.linalg.solve(jac, grad)

            return jax.lax.fori_loop(0, self.newton_iters, body, g0)

        def laplace(q, mode):
            d1 = w * jnp.exp(-mode)
            qw = q + jnp.diag(d1)
            canon = d1 * (mode + 1.0) - n_events
            chol = jnp.linalg.cholesky(qw)
            mean = jax.scipy.linalg.cho_solve((chol, True), canon)
            logdet_u = jnp.sum(jnp.log(jnp.diagonal(chol)))
            return qw, chol, mean, logdet_u

        q_new = self._q_matrix(tau_new, tree, f, dt)
        q_cur = self._q_matrix(tau, tree, f, dt)

        mode_f = newton(q_new, gamma)
        qw_f, chol_f, mean_f, logdet_f = laplace(q_new, mode_f)
        z = jax.random.normal(k_norm, (f,), dt)
        # x = mean + (L^T)^-1 z (ref getMultiNormal: U v = z with U = L^T)
        v = jax.scipy.linalg.solve_triangular(chol_f.T, z, lower=False)
        gamma_new = mean_f + v

        mode_b = newton(q_cur, gamma_new)
        qw_b, chol_b, mean_b, logdet_b = laplace(q_cur, mode_b)
        d = gamma - mean_b
        h = (logdet_b - 0.5 * d @ (qw_b @ d)
             - logdet_f + 0.5 * z @ z)

        ok = jnp.isfinite(h) & jnp.all(jnp.isfinite(gamma_new))
        new_params = {
            **params,
            self.field: jnp.reshape(gamma_new, jnp.shape(params[self.field])
                                    ).astype(params[self.field].dtype),
            self.precision: jnp.reshape(
                tau_new, jnp.shape(params[self.precision])
            ).astype(params[self.precision].dtype),
        }
        return new_params, tree, jnp.where(ok, h, -jnp.inf).astype(dt)


@dataclasses.dataclass
class EllipticalSliceOperator(Operator):
    """Elliptical slice sampler (Murray, Adams & MacKay 2010) for a
    parameter with a multivariate-normal prior (ref:
    EllipticalSliceOperator.java:63 drawFromSlice). The ellipse through
    the current state and a fresh prior draw preserves N(mu, Sigma); the
    angle is slice-sampled on the LIKELIHOOD f = log_post - log_prior,
    so the move is rejection-free (Gibbs; logh = +inf).

    In-jit: the bracket-shrinking loop is a lax.while_loop with a trace
    -time iteration cap; on cap exhaustion the angle collapses to 0
    (the current state), which is a valid no-op slice outcome."""

    parameter: str = ""
    prior_mean: Sequence[float] = ()
    # Cholesky factor of the prior COVARIANCE (host-side constant)
    prior_chol: object = None
    # log N(x; mu, Sigma) up to the additive constant
    prior_logpdf: Optional[Callable] = None
    max_iters: int = 64
    adaptable: bool = False
    _log_post: Optional[Callable] = None

    @property
    def modifies_params(self):
        return (self.parameter,)

    def bind_log_posterior(self, log_posterior):
        self._log_post = log_posterior

    def propose(self, params, tree, key, tuning):
        x = params[self.parameter]
        dt = x.dtype
        mu = jnp.asarray(self.prior_mean, dt)
        chol = jnp.asarray(self.prior_chol, dt)

        def f(v):
            p2 = {**params, self.parameter: v.astype(dt)}
            return (self._log_post(p2, tree)
                    - self.prior_logpdf(v, mu))

        k_nu, k_u, k_a, k_loop = jax.random.split(key, 4)
        nu = chol @ jax.random.normal(k_nu, jnp.shape(x), dt)
        logy = f(x) + jnp.log(jax.random.uniform(k_u, dtype=dt))
        a0 = jax.random.uniform(k_a, dtype=dt) * 2.0 * jnp.pi
        lo0, hi0 = a0 - 2.0 * jnp.pi, a0

        def point(a):
            return (x - mu) * jnp.cos(a) + nu * jnp.sin(a) + mu

        def cond(carry):
            a, lo, hi, it, done = carry
            return (~done) & (it < self.max_iters)

        def body(carry):
            a, lo, hi, it, _ = carry
            ok = f(point(a)) > logy
            lo2 = jnp.where(ok, lo, jnp.where(a < 0, a, lo))
            hi2 = jnp.where(ok, hi, jnp.where(a < 0, hi, a))
            key_it = jax.random.fold_in(k_loop, it)
            a2 = jnp.where(
                ok, a,
                lo2 + (hi2 - lo2) * jax.random.uniform(key_it, dtype=dt))
            return (a2, lo2, hi2, it + 1, ok)

        a_fin, _, _, _, done = jax.lax.while_loop(
            cond, body, (a0, lo0, hi0, 0, jnp.asarray(False)))
        a_fin = jnp.where(done, a_fin, jnp.zeros((), dt))
        new = point(a_fin).astype(dt)
        return {**params, self.parameter: new}, tree, jnp.inf


@dataclasses.dataclass
class InternalTraitGibbsOperator(Operator):
    """Gibbs draw of one internal (non-root) node's sampled trait from
    its full conditional under the Brownian branch-increment density
    (ref: dr.evomodel.operators.TraitGibbsOperator — neighbors p, c1,
    c2 give N(weighted mean, Lambda^-1 / w), w = 1/t_up + 1/t1 + 1/t2)."""

    trait_param: str = ""
    dim: int = 1
    n_tips: int = 0
    prec_of: Optional[Callable] = None  # params -> [d, d] Lambda
    adaptable: bool = False

    @property
    def modifies_params(self):
        return (self.trait_param,)

    def propose(self, params, tree, key, tuning):
        from beast_mcmc_tpu.inference.operators import sample_excluding

        d = self.dim
        n = self.n_tips
        x = jnp.reshape(params[self.trait_param], (-1, d))
        dt = x.dtype
        k1, k2 = jax.random.split(key)
        node = n + sample_excluding(
            k1, x.shape[0] - n, jnp.asarray([tree.root - n]))
        lam = self.prec_of(params).astype(dt)
        cov_base = jnp.linalg.inv(lam)
        p = tree.parent[node]
        c1 = tree.children[node, 0]
        c2 = tree.children[node, 1]
        t_up = tree.heights[p] - tree.heights[node]
        t1 = tree.heights[node] - tree.heights[c1]
        t2 = tree.heights[node] - tree.heights[c2]
        w1, w2, w3 = 1.0 / t_up, 1.0 / t1, 1.0 / t2
        w = w1 + w2 + w3
        mean = (x[p] * w1 + x[c1] * w2 + x[c2] * w3) / w
        chol = jnp.linalg.cholesky(cov_base / w)
        z = jax.random.normal(k2, (d,), dt)
        new = mean + chol @ z
        x2 = x.at[node].set(new)
        return ({**params, self.trait_param: x2.reshape(
            jnp.shape(params[self.trait_param]))}, tree, jnp.inf)


@dataclasses.dataclass
class PrecisionWishartGibbsOperator(Operator):
    """EXACT conjugate Wishart draw of the diffusion precision given the
    SAMPLED node traits (ref: PrecisionMatrixGibbsOperator.java:63 —
    posterior df = prior df + #branches, inverse scale = prior rate +
    sum_branches outer(dx, dx)/t). Gibbs: logh = +inf."""

    trait_param: str = ""
    dim: int = 1
    # names of the d COLUMN parameters of the precision matrixParameter
    col_params: Sequence[str] = ()
    prior_df: float = 2.0
    prior_scale: object = None  # [d, d] prior scale matrix (host)
    adaptable: bool = False

    @property
    def modifies_params(self):
        return tuple(self.col_params)

    def propose(self, params, tree, key, tuning):
        d = self.dim
        x = jnp.reshape(params[self.trait_param], (-1, d))
        dt = x.dtype
        pidx = jnp.maximum(tree.parent, 0)
        t_b = jnp.where(tree.parent >= 0,
                        tree.heights[pidx] - tree.heights, 1.0)
        diff = x - x[pidx]
        mask = (tree.parent >= 0).astype(dt)
        s_mat = jnp.einsum("m,md,me->de", mask / t_b, diff, diff)
        n_b = jnp.sum(mask)
        scale0_inv = jnp.linalg.inv(jnp.asarray(self.prior_scale, dt))
        post_scale = jnp.linalg.inv(scale0_inv + s_mat)
        df = self.prior_df + n_b
        # Bartlett decomposition draw W ~ Wishart(df, post_scale)
        k1, k2 = jax.random.split(key)
        l = jnp.linalg.cholesky(post_scale)
        z = jnp.tril(jax.random.normal(k1, (d, d), dt), -1)
        # chi draws on the diagonal: sqrt of gamma((df - i)/2, 2)
        i = jnp.arange(d, dtype=dt)
        c_diag = jnp.sqrt(2.0 * jax.random.gamma(
            k2, 0.5 * (df - i), dtype=dt))
        a_mat = z + jnp.diag(c_diag)
        w_draw = l @ a_mat @ a_mat.T @ l.T
        out = dict(params)
        for j, cn in enumerate(self.col_params):
            out[cn] = w_draw[:, j].astype(params[cn].dtype).reshape(
                jnp.shape(params[cn]))
        return out, tree, jnp.inf


@dataclasses.dataclass
class LatentLiabilityGibbsOperator(Operator):
    """ref: NewLatentLiabilityGibbs.java:139-280 — draw ONE tip's latent
    trait from its tree full-conditional N(mean_i, s_i Lambda^-1),
    rejecting draws inconsistent with the tip's discrete datum (bounded
    attempts; all-fail returns -inf). For a FIXED topology the tip joint
    is MVN(mu0, T (x) Sigma) with T_ij = t(root->mrca) + 1/pss, so the
    conditional weights W_i = T_{i,-i} T_{-i,-i}^{-1} and Schur scalars
    s_i are host-side constants; the diffusion precision stays live.
    Hastings = logpdf(old draw) - logpdf(new draw) under the proposal."""

    trait_param: str = ""
    dim: int = 1
    n_tips: int = 0
    cond_weights: object = None  # [N, N] rows: weights over other tips
    cond_scale: object = None  # [N] Schur scalars
    mu0: object = None  # [D] root prior mean
    lo: object = None  # [N, D]
    hi: object = None  # [N, D]
    prec_of: Optional[Callable] = None
    max_attempts: int = 64
    adaptable: bool = False

    @property
    def modifies_params(self):
        return (self.trait_param,)

    def propose(self, params, tree, key, tuning):
        d = self.dim
        n = self.n_tips
        x = jnp.reshape(params[self.trait_param], (n, d))
        dt = x.dtype
        k_tip, k_draw = jax.random.split(key)
        i = jax.random.randint(k_tip, (), 0, n)
        w = jnp.asarray(self.cond_weights, dt)[i]  # [N]
        s = jnp.asarray(self.cond_scale, dt)[i]
        mu0 = jnp.asarray(self.mu0, dt)
        mean = mu0 + w @ (x - mu0[None, :])
        lam = self.prec_of(params).astype(dt)
        cov = s * jnp.linalg.inv(lam)
        chol = jnp.linalg.cholesky(cov)
        lo = jnp.asarray(self.lo, dt)[i]
        hi = jnp.asarray(self.hi, dt)[i]

        def draw(k):
            z = jax.random.normal(k, (d,), dt)
            return mean + chol @ z

        def cond(carry):
            it, val, ok = carry
            return (~ok) & (it < self.max_attempts)

        def body(carry):
            it, val, _ = carry
            v = draw(jax.random.fold_in(k_draw, it))
            ok = jnp.all((v >= lo) & (v <= hi))
            return it + 1, jnp.where(ok, v, val), ok

        _, new, ok = jax.lax.while_loop(
            cond, body, (0, x[i], jnp.asarray(False)))

        prec_c = jnp.linalg.inv(cov)

        def lp(v):
            dlt = v - mean
            return -0.5 * dlt @ prec_c @ dlt

        logh = lp(x[i]) - lp(new)
        logh = jnp.where(ok, logh, -jnp.inf).astype(tree.heights.dtype)
        x2 = x.at[i].set(new)
        return ({**params, self.trait_param: x2.reshape(
            jnp.shape(params[self.trait_param]))}, tree, logh)
