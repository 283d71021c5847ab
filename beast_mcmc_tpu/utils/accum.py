"""High-precision accumulation for the f32 hot path.

The reference runs everything in f64 and enforces a 0.1 log-unit
full-evaluation self-check (ref: MarkovChain.java:55,336-373). On TPU the
peeling hot path is f32; a plain f32 dot of per-pattern log-likelihoods
at Makona/benchmark2 scale carries O(1) error (|logL| ~ 5e6, f32 ulp 0.5)
and XLA is free to pick different reduction orders in different fusion
contexts, so the carried chain posterior and a fresh recompute can differ
by several log units. The fix is the standard TPU dtype policy: compute
low, accumulate high.

`stable_dot(w, x)` computes sum(w*x) with:
  - an f64 accumulation when x64 is enabled (the deployment configuration
    — bench.py enables x64; the per-eval cost is one emulated-f64 dot of
    a [P] vector, negligible next to the peeling matmuls);
  - a chunked, vectorized Kahan compensated summation in f32 otherwise
    (error ~ ulp of the total instead of ~P * ulp(partials); implemented
    as a lax.scan so the reduction order is fixed and deterministic
    across fusion contexts).

`accum_dtype()` is the dtype such sums are carried in; the MH kernel
stores `log_posterior` in it so the chain's carried scalar does not
quantize at the f32 ulp of the total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accum_dtype():
    """dtype for carried log-density scalars: f64 under x64, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _kahan_sum_f32(p: jnp.ndarray) -> jnp.ndarray:
    """Compensated sum of a 1-D f32 vector with a fixed reduction order.

    Lane-vectorized: [K,128] chunks are Kahan-accumulated down K on the
    VPU, then the 128 lane (sum, comp) pairs are combined by a scalar
    Kahan pass.
    """
    p = jnp.ravel(p).astype(jnp.float32)
    lanes = 128
    n = p.shape[0]
    pad = (-n) % lanes
    if pad:
        p = jnp.pad(p, (0, pad))
    rows = p.reshape(-1, lanes)

    def body(carry, row):
        s, c = carry
        y = row - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    (s, c), _ = jax.lax.scan(
        body, (jnp.zeros(lanes, jnp.float32), jnp.zeros(lanes, jnp.float32)),
        rows,
    )
    # true lane totals are ~ (s - c); combine the 256 (sum, -comp) values
    # by FIXED-ORDER pairwise halving — deterministic across fusion
    # contexts (explicit slicing pins the reduction tree) and log-depth
    # (a scalar Kahan scan here cost ~0.07 ms/eval, half the whole
    # benchmark2 likelihood)
    tail = jnp.concatenate([s, -c])  # [256]
    n2 = tail.shape[0]
    while n2 > 1:
        half = n2 // 2
        tail = tail[:half] + tail[half:n2]
        n2 = half
    return tail[0]


@jax.custom_vjp
def stable_dot(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sum(w * x) accumulated high. Returns an `accum_dtype()` scalar."""
    if jax.config.jax_enable_x64:
        return jnp.dot(
            jnp.ravel(w).astype(jnp.float64),
            jnp.ravel(x).astype(jnp.float64),
            precision=jax.lax.Precision.HIGHEST,
        )
    return _kahan_sum_f32(jnp.ravel(w) * jnp.ravel(x))


def _stable_dot_fwd(w, x):
    return stable_dot(w, x), (w, x)


def _stable_dot_bwd(res, g):
    w, x = res
    return ((g * x.astype(g.dtype)).astype(w.dtype),
            (g * w.astype(g.dtype)).astype(x.dtype))


stable_dot.defvjp(_stable_dot_fwd, _stable_dot_bwd)


def stable_sum(x: jnp.ndarray) -> jnp.ndarray:
    """sum(x) accumulated high (see stable_dot)."""
    return stable_dot(jnp.ones_like(jnp.ravel(x)), jnp.ravel(x))


def prefix_sum(x, axis: int = -1):
    """Inclusive prefix sum via log-depth associative scan.

    Drop-in for jnp.cumsum on the device hot path: under vmap inside a
    while-loop on TPU, jnp.cumsum lowers to a reduce_window with a
    quadratic window that blows the v5e 16MB scoped-VMEM limit at ~1k
    elements x 8 chains (observed: BENCH_r03 AOT OOM). associative_scan
    stays O(n) work / O(log n) depth and lowers to plain adds.
    """
    import jax

    return jax.lax.associative_scan(jnp.add, x, axis=axis)
