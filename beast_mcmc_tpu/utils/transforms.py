"""General parameter-transform framework (ref: src/dr/util/Transform.java:48
— the reference's univariable/multivariable transform hierarchy used by
transformed operators, HMC-on-unconstrained-space, and logJacobian-corrected
densities).

Conventions (JAX-first, one direction of Jacobian only):
  forward(x)  constrained -> unconstrained  (the space samplers move in)
  inverse(y)  unconstrained -> constrained
  log_det_jacobian_inverse(y) = log |d inverse(y) / dy|   (summed)

so a posterior over x becomes, in y-space,
  log p_Y(y) = log p_X(inverse(y)) + log_det_jacobian_inverse(y),
which is exactly the correction HMC/NUTS add when sampling y. The
reference's `logJacobian(x)` is the same quantity evaluated at
y = forward(x). Gradients of all of this come from jax.grad — the
reference's hand-written updateGradientLogDensity chains
(Transform.java:200-260) are superseded by autodiff.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from beast_mcmc_tpu.utils.accum import prefix_sum


class Transform:
    """Bijection between a constrained parameter space and R^n."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def log_det_jacobian_inverse(self, y):
        """log |d inverse(y)/dy| summed over elements (default: autodiff
        of the flattened map — subclasses override with closed forms)."""
        y = jnp.atleast_1d(y)
        jac = jax.jacfwd(lambda v: jnp.atleast_1d(self.inverse(v)))(y)
        sign, logdet = jnp.linalg.slogdet(jac)
        return logdet

    def log_jacobian(self, x):
        """Reference-convention logJacobian at x (Transform.java:95):
        log |d forward(x)/dx| = -log_det_jacobian_inverse(forward(x))."""
        return -self.log_det_jacobian_inverse(self.forward(x))


@dataclasses.dataclass
class NoTransform(Transform):
    """ref: Transform.java:1631 (NoTransform)."""

    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def log_det_jacobian_inverse(self, y):
        return jnp.asarray(0.0, jnp.result_type(y))


@dataclasses.dataclass
class LogTransform(Transform):
    """(0, inf) <-> R. ref: Transform.java:815 (LogTransform)."""

    def forward(self, x):
        return jnp.log(x)

    def inverse(self, y):
        return jnp.exp(y)

    def log_det_jacobian_inverse(self, y):
        return jnp.sum(y)


@dataclasses.dataclass
class LogitTransform(Transform):
    """(0, 1) <-> R. ref: Transform.java:1125 (LogitTransform)."""

    def forward(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def inverse(self, y):
        return jax.nn.sigmoid(y)

    def log_det_jacobian_inverse(self, y):
        # d sigmoid/dy = sigmoid(y) sigmoid(-y)
        return jnp.sum(jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y))


@dataclasses.dataclass
class ScaledLogitTransform(Transform):
    """(lower, upper) <-> R. ref: Transform.java:1188."""

    lower: float = 0.0
    upper: float = 1.0

    def forward(self, x):
        z = (x - self.lower) / (self.upper - self.lower)
        return jnp.log(z) - jnp.log1p(-z)

    def inverse(self, y):
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(y)

    def log_det_jacobian_inverse(self, y):
        width = jnp.log(jnp.asarray(self.upper - self.lower))
        return jnp.sum(
            jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y) + width)


@dataclasses.dataclass
class FisherZTransform(Transform):
    """(-1, 1) <-> R (correlations). ref: Transform.java:1252."""

    def forward(self, x):
        return jnp.arctanh(x)

    def inverse(self, y):
        return jnp.tanh(y)

    def log_det_jacobian_inverse(self, y):
        # d tanh/dy = sech^2(y); log sech^2 = 2(log2 - y - softplus(-2y))
        return jnp.sum(2.0 * (jnp.log(2.0) - y - jax.nn.softplus(-2.0 * y)))


@dataclasses.dataclass
class AffineTransform(Transform):
    """y = a*x + b. ref: Transform.java:1555."""

    a: float = 1.0
    b: float = 0.0

    def forward(self, x):
        return self.a * x + self.b

    def inverse(self, y):
        return (y - self.b) / self.a

    def log_det_jacobian_inverse(self, y):
        n = jnp.size(y)
        return -n * jnp.log(jnp.abs(jnp.asarray(self.a, jnp.result_type(y))))


@dataclasses.dataclass
class NegateTransform(Transform):
    """y = -x (maps (-inf,0) parameters to (0,inf) pipelines).
    ref: Transform.java:1307."""

    def forward(self, x):
        return -x

    def inverse(self, y):
        return -y

    def log_det_jacobian_inverse(self, y):
        return jnp.asarray(0.0, jnp.result_type(y))


@dataclasses.dataclass
class PowerTransform(Transform):
    """y = x^p on (0, inf). ref: Transform.java:1362."""

    power: float = 2.0

    def forward(self, x):
        return jnp.power(x, self.power)

    def inverse(self, y):
        return jnp.power(y, 1.0 / self.power)

    def log_det_jacobian_inverse(self, y):
        p = self.power
        return jnp.sum(
            -jnp.log(jnp.abs(p)) + (1.0 / p - 1.0) * jnp.log(y))


@dataclasses.dataclass
class ReciprocalTransform(Transform):
    """y = 1/x on (0, inf). ref: Transform.java:1438. Self-inverse; note
    the image is (0, inf), not R — compose with Log for samplers."""

    def forward(self, x):
        return 1.0 / x

    def inverse(self, y):
        return 1.0 / y

    def log_det_jacobian_inverse(self, y):
        return jnp.sum(-2.0 * jnp.log(y))


@dataclasses.dataclass
class PositiveOrderedTransform(Transform):
    """0 < x_0 < x_1 < ... <-> R^n via log-increments: y_0 = log x_0,
    y_i = log(x_i - x_{i-1}) (the standard bijection for the role of the
    reference's ordered transforms, e.g. epoch time grids)."""

    def forward(self, x):
        incr = jnp.diff(x, prepend=0.0)
        return jnp.log(incr)

    def inverse(self, y):
        return prefix_sum(jnp.exp(y))

    def log_det_jacobian_inverse(self, y):
        # triangular Jacobian, diagonal exp(y)
        return jnp.sum(y)


@dataclasses.dataclass
class SimplexTransform(Transform):
    """Probability simplex (K) <-> R^{K-1} by stick-breaking with the
    centering offsets (Stan's simplex bijection). The TPU-native stand-in
    for LogConstrainedSumTransform (ref: Transform.java:881), which keeps
    K coordinates and renormalizes — not a bijection, so unusable for
    HMC; this is."""

    k: int = 2

    def forward(self, x):
        x = jnp.atleast_1d(x)
        k = self.k
        rem = 1.0 - jnp.concatenate(
            [jnp.zeros((1,), x.dtype), prefix_sum(x[:-1])])
        z = x[:-1] / rem[:-1]
        offs = jnp.log(jnp.arange(k - 1, 0, -1).astype(x.dtype))
        return jnp.log(z) - jnp.log1p(-z) + offs

    def inverse(self, y):
        y = jnp.atleast_1d(y)
        k = self.k
        offs = jnp.log(jnp.arange(k - 1, 0, -1).astype(y.dtype))
        z = jax.nn.sigmoid(y - offs)

        def body(rem, zi):
            xi = rem * zi
            return rem - xi, xi

        rem, xs = jax.lax.scan(body, jnp.asarray(1.0, y.dtype), z)
        return jnp.concatenate([xs, rem[None]])

    def log_det_jacobian_inverse(self, y):
        y = jnp.atleast_1d(y)
        k = self.k
        offs = jnp.log(jnp.arange(k - 1, 0, -1).astype(y.dtype))
        u = y - offs
        z = jax.nn.sigmoid(u)

        def body(rem, args):
            zi, ui = args
            # d x_i = rem * dz_i ; log dz/du = log sig(u) + log sig(-u)
            ld = jnp.log(rem) + jax.nn.log_sigmoid(ui) + jax.nn.log_sigmoid(
                -ui)
            return rem * (1.0 - zi), ld

        _, lds = jax.lax.scan(body, jnp.asarray(1.0, y.dtype), (z, u))
        return jnp.sum(lds)


@dataclasses.dataclass
class LKJCorrelationTransform(Transform):
    """Correlation-matrix off-diagonals (row-major upper triangle,
    length d(d-1)/2) <-> unconstrained canonical partial correlations
    (ref: dr.util.LKJTransformConstrained — CPC construction; the
    z-space walk is what transformedParameterRandomWalkOperator uses).

    inverse: z -> tanh -> CPCs -> Cholesky-factor rows -> R = L L^T.
    forward: R -> chol -> CPCs -> atanh. Static dimension d, host loops
    unrolled at trace time (d is small: operator targets are <= ~10)."""

    d: int = 2

    def _tri(self):
        iu = np.triu_indices(self.d, 1)
        return iu

    def inverse(self, z):
        d = self.d
        z = jnp.ravel(z)
        c = jnp.tanh(z)
        iu = self._tri()
        # cpc[i][j] for j<i (lower triangle by construction rows)
        cpc = {}
        for k in range(len(iu[0])):
            i, j = int(iu[0][k]), int(iu[1][k])  # i < j
            cpc[(i, j)] = c[k]  # L row j, column i uses cpc[(i, j)]
        rows = []
        for i in range(d):
            row = []
            rem = 1.0
            for j in range(i):
                lij = cpc[(j, i)] * jnp.sqrt(rem)
                row.append(lij)
                rem = rem * (1.0 - cpc[(j, i)] ** 2)
            row.append(jnp.sqrt(rem))
            row.extend([jnp.zeros(()) ] * (d - i - 1))
            rows.append(jnp.stack(row))
        L = jnp.stack(rows)
        R = L @ L.T
        return R[iu]

    def forward(self, x):
        d = self.d
        iu = self._tri()
        R = jnp.eye(d, dtype=jnp.result_type(x, 1.0))
        R = R.at[iu].set(x).at[(iu[1], iu[0])].set(x)
        L = jnp.linalg.cholesky(R)
        zs = []
        for k in range(len(iu[0])):
            i, j = int(iu[0][k]), int(iu[1][k])
            # L row `col` index `row`: recover cpc[(i,j)] with i<j
            denom = jnp.sqrt(1.0 - jnp.sum(L[j, :i] ** 2))
            zs.append(jnp.arctanh(L[j, i] / denom))
        return jnp.stack(zs)


@dataclasses.dataclass
class ComposeTransform(Transform):
    """outer o inner: forward = outer.forward(inner.forward(x)).
    ref: Transform.java:1793 (Compose)."""

    outer: Transform = None
    inner: Transform = None

    def forward(self, x):
        return self.outer.forward(self.inner.forward(x))

    def inverse(self, y):
        return self.inner.inverse(self.outer.inverse(y))

    def log_det_jacobian_inverse(self, y):
        mid = self.outer.inverse(y)
        return (self.outer.log_det_jacobian_inverse(y)
                + self.inner.log_det_jacobian_inverse(mid))


@dataclasses.dataclass
class ArrayTransform(Transform):
    """Blockwise transform over a flat vector: [(transform, size), ...].
    ref: Transform.java:2169 (Array) / 2344 (Collection)."""

    blocks: Sequence[Tuple[Transform, int]] = ()

    @staticmethod
    def _y_size(t: Transform, n: int) -> int:
        # dimension-changing transforms map n constrained coords to a
        # different unconstrained count (simplex: k -> k-1)
        if isinstance(t, SimplexTransform):
            return n - 1
        return n

    def _split(self, v, space: str):
        out, i = [], 0
        for t, n in self.blocks:
            m = n if space == "x" else self._y_size(t, n)
            out.append(v[i:i + m])
            i += m
        return out

    def forward(self, x):
        return jnp.concatenate(
            [jnp.atleast_1d(t.forward(p))
             for (t, _), p in zip(self.blocks, self._split(x, "x"))])

    def inverse(self, y):
        return jnp.concatenate(
            [jnp.atleast_1d(t.inverse(p))
             for (t, _), p in zip(self.blocks, self._split(y, "y"))])

    def log_det_jacobian_inverse(self, y):
        parts = self._split(y, "y")
        return sum(
            t.log_det_jacobian_inverse(p)
            for (t, _), p in zip(self.blocks, parts))


def parse_transform(name: str, **kw) -> Transform:
    """Name registry matching the reference's transform parser vocabulary
    (ref: Transform.java Type enum: none/log/negate/logit/fisherZ/
    power/logConstrainedSum...)."""
    table = {
        "none": NoTransform,
        "log": LogTransform,
        "logit": LogitTransform,
        "scaledLogit": ScaledLogitTransform,
        "fisherZ": FisherZTransform,
        "negate": NegateTransform,
        "power": PowerTransform,
        "reciprocal": ReciprocalTransform,
        "affine": AffineTransform,
        "positiveOrdered": PositiveOrderedTransform,
        "logConstrainedSum": SimplexTransform,
        "simplex": SimplexTransform,
    }
    if name not in table:
        raise ValueError(f"unknown transform '{name}'")
    return table[name](**kw)
