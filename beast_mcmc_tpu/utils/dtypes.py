"""Global float-precision policy.

The reference (BEAST) computes everything in Java doubles. On TPU, f32 with
per-pattern rescaling is the fast path; f64 (XLA-emulated on TPU, native on
CPU) is the parity/validation path. Tests enable x64; benchmarks run f32.
"""

import jax.numpy as jnp

_DEFAULT_FLOAT = None


def default_float():
    """Return the framework-wide default float dtype.

    If jax_enable_x64 is on (tests, parity runs) this is float64, otherwise
    float32 (TPU production path) — unless overridden via set_default_float.
    """
    if _DEFAULT_FLOAT is not None:
        return _DEFAULT_FLOAT
    import jax

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_default_float(dtype):
    global _DEFAULT_FLOAT
    _DEFAULT_FLOAT = dtype
