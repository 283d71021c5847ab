"""Generalized linear model likelihoods (ref:
src/dr/inference/distribution/GeneralizedLinearModel.java:49,
LinearRegression.java:53-66, LogisticRegression.java:64-77,
LogLinearModel.java; native side: the role of
src/dr/inference/regression/RegressionJNIWrapper.java:40-110, the BSCCS
self-controlled case series JNI library).

TPU-native design: each likelihood is one fused matvec + elementwise
reduction — X @ beta rides the MXU, jax.grad supplies the gradient the
JNI wrapper exposes via getLogLikelihoodGradient (RegressionJNIWrapper
.java:53), and vmapping over beta draws batches entire HMC trajectories.
Random-effect designs enter as an additive offset (the reference's
addRandomEffectsModel path, GeneralizedLinearModel.java:96-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_2PI = 1.8378770664093453


def xbeta(design: jnp.ndarray, beta: jnp.ndarray, offset=0.0) -> jnp.ndarray:
    """Linear predictor X @ beta (+ offset). design: [N, P]."""
    return design @ beta + offset


def linear_regression_loglik(y, design, beta, precision, offset=0.0,
                             log_transform=False):
    """Gaussian linear regression (ref: LinearRegression.java:53-66).

    precision: scalar or [N] per-observation precisions. log_transform:
    the reference's logTransform flag — the dependent variable enters as
    log(y) with the -log(y) Jacobian per observation."""
    y = jnp.asarray(y)
    prec = jnp.broadcast_to(jnp.asarray(precision, y.dtype), y.shape)
    jac = 0.0
    if log_transform:
        jac = -jnp.sum(jnp.log(y))
        y = jnp.log(y)
    mu = xbeta(design, beta, offset)
    r = y - mu
    return (jac + 0.5 * jnp.sum(jnp.log(prec))
            - 0.5 * jnp.sum(r * r * prec)
            - 0.5 * y.shape[-1] * LOG_2PI)


def logistic_regression_loglik(y, design, beta, offset=0.0):
    """Bernoulli regression with logit link (ref:
    LogisticRegression.java:64-77: sum y*xbeta - log(1 + exp(xbeta)))."""
    eta = xbeta(design, beta, offset)
    return jnp.sum(y * eta - jax.nn.softplus(eta))


def log_linear_loglik(y, design, beta, offset=0.0):
    """Poisson regression with log link (ref: LogLinearModel.java — the
    exponential inverse link over the linear predictor)."""
    eta = xbeta(design, beta, offset)
    return jnp.sum(y * eta - jnp.exp(eta) - jax.lax.lgamma(y + 1.0))


def sccs_conditional_loglik(counts, design, beta, log_exposure):
    """Self-controlled case series conditional Poisson likelihood — the
    computation behind the BSCCS native library the reference wraps
    (RegressionJNIWrapper.java:40-110). Conditioning each case's total
    event count away removes the per-case baseline rate, leaving a
    multinomial over that case's exposure intervals:

      sum_ij y_ij * eta_ij  -  sum_i n_i * logsumexp_j(eta_ij)
      with eta_ij = log tau_ij + x_ij @ beta.

    counts:        [I, J] events per case x interval (J padded; pad with
                   log_exposure = -inf)
    design:        [I, J, P] covariates per interval
    log_exposure:  [I, J] log interval lengths (-inf pads)
    """
    eta = jnp.einsum("ijp,p->ij", design, beta) + log_exposure
    n_i = jnp.sum(counts, axis=1)
    lse = jax.scipy.special.logsumexp(eta, axis=1)
    return jnp.sum(counts * jnp.where(jnp.isfinite(eta), eta, 0.0)) - jnp.sum(
        n_i * lse)


def glm_loglik(kind: str, y, design, beta, scale=None, offset=0.0,
               log_transform=False):
    """Dispatch matching the reference's GLM family vocabulary
    (glmModel family attribute)."""
    if kind in ("normal", "linear", "gaussian"):
        return linear_regression_loglik(
            y, design, beta, precision=scale, offset=offset,
            log_transform=log_transform)
    if kind in ("logistic", "bernoulli", "binomial"):
        return logistic_regression_loglik(y, design, beta, offset)
    if kind in ("poisson", "logLinear"):
        return log_linear_loglik(y, design, beta, offset)
    raise ValueError(f"unknown GLM family '{kind}'")
