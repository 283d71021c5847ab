"""Pallas TPU kernel for Felsenstein peeling — the hot path.

The pure-JAX peeling (ops/peeling.py) runs the per-node scan through HBM:
every internal node reads two [C,S,P] child partials from the carry buffer
and writes one back, ~2x[M,C,S,P] of HBM traffic per likelihood
evaluation. This kernel blocks the pattern axis and keeps the ENTIRE
[C, M, S, BP] partials tensor resident in VMEM for each block: HBM
traffic drops to tips-in + site-logL-out (plus the stored partials for
the VJP), and the node loop becomes VMEM-speed broadcast-multiply-adds
on the VPU.

Mosaic constraints shape the design: all in-kernel vector values are 2D
[sublane, lane] = [S, BP]; the category axis is a static python unroll
(C is 1 or 4 in practice), so no 1D->3D shape casts are emitted.

Same numerics as the reference path: per-pattern max-rescaling at every
node; log-scales accumulate linearly into one [1, BP] accumulator (the
root log-scale is the sum of every internal node's, each contributing
exactly once); root reduction with category-weighted frequencies.

The custom VJP reuses the linear-time pre-order adjoint of
ops/peeling.py, reading the partials stored by this kernel — forward
(the MH hot loop) is Pallas, backward (HMC/NUTS only) stays XLA.

(ref: the BEAGLE updatePartials/accumulateScaleFactors/
calculateRootLogLikelihoods sequence, BeagleDataLikelihoodDelegate
.java:904-934 — one fused kernel instead of buffer-indexed calls.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beast_mcmc_tpu.ops import peeling as _jax_peeling


def _pick_block(n_nodes: int, c: int, s: int, p: int) -> int:
    """Largest pattern block keeping the partials tensor under ~6 MB of
    VMEM (f32), within [128, 2048] lanes."""
    budget = 6 * 1024 * 1024
    bp = budget // (n_nodes * c * s * 4)
    bp = max(128, min(2048, (bp // 128) * 128))
    return min(bp, max(128, ((p + 127) // 128) * 128))


def _peel_kernel(children_ref, order_ref, tips_ref, pmat_ref, wcs_ref,
                 out_ref, post_ref, *, n_tips, n_internal, c, s, bp):
    # seed tip partials into every category block
    for cc in range(c):
        post_ref[cc, 0:n_tips] = tips_ref[:]

    def matvec(pm, child_post):
        # [S,S] x [S,BP] -> [S,BP] as j-summed broadcasts (VPU-shaped)
        acc = pm[:, 0:1] * child_post[0:1, :]
        for j in range(1, s):
            acc += pm[:, j:j + 1] * child_post[j:j + 1, :]
        return acc

    def body(i, acc):
        node = order_ref[i]
        l = children_ref[2 * node]
        r = children_ref[2 * node + 1]
        xs = []
        scale = None
        for cc in range(c):
            x = matvec(pmat_ref[cc, l], post_ref[cc, l]) * matvec(
                pmat_ref[cc, r], post_ref[cc, r]
            )
            xs.append(x)
            mx = jnp.max(x, axis=0, keepdims=True)  # [1, BP]
            scale = mx if scale is None else jnp.maximum(scale, mx)
        scale = jnp.where(scale > 0, scale, 1.0)
        for cc in range(c):
            post_ref[cc, node] = xs[cc] / scale
        return acc + jnp.log(scale)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_internal), body,
        jnp.zeros((1, bp), out_ref.dtype)
    )

    root = order_ref[n_internal - 1]
    site_lik = jnp.zeros((1, bp), out_ref.dtype)
    for cc in range(c):
        # wcs[cc]: [S, 1] category-weighted frequencies
        site_lik += jnp.sum(
            post_ref[cc, root] * wcs_ref[cc], axis=0, keepdims=True
        )
    out_ref[:] = jnp.log(site_lik) + acc


def _peel_forward_pallas(tip_partials, children, order, p_matrices, freqs,
                         cat_w, interpret=False, want_post=True):
    """want_post=False is the MH hot path: the whole-tree partials live
    only in VMEM scratch (no [C,M,S,P] HBM write-out + transpose), since
    the forward-only evaluation never reads them back. The VJP path
    (want_post=True) materializes them for the linear-time adjoint."""
    n_tips, s, p = tip_partials.shape
    m = children.shape[0]
    c = p_matrices.shape[1]
    n_internal = n_tips - 1
    dt = p_matrices.dtype
    bp = _pick_block(m, c, s, p)
    pad = (-p) % bp
    if pad:
        tip_partials = jnp.pad(
            tip_partials, ((0, 0), (0, 0), (0, pad)), constant_values=1.0
        )
    p_padded = p + pad

    pmats_cm = jnp.swapaxes(p_matrices, 0, 1)  # [C, M, S, S]
    wcs = (cat_w[:, None] * freqs[None, :])[:, :, None]  # [C, S, 1]

    grid = (p_padded // bp,)
    kernel = functools.partial(
        _peel_kernel, n_tips=n_tips, n_internal=n_internal, c=c, s=s, bp=bp
    )
    out_specs = [pl.BlockSpec((1, bp), lambda i, *_: (0, i))]
    out_shape = [jax.ShapeDtypeStruct((1, p_padded), dt)]
    scratch_shapes = []
    if want_post:
        # post_ref arrives as the 2nd output — same kernel signature
        out_specs.append(
            pl.BlockSpec((c, m, s, bp), lambda i, *_: (0, 0, 0, i))
        )
        out_shape.append(jax.ShapeDtypeStruct((c, m, s, p_padded), dt))
    else:
        # ...or as the 1st scratch ref (pallas passes scratch after outputs)
        scratch_shapes.append(pltpu.VMEM((c, m, s, bp), dt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_tips, s, bp), lambda i, *_: (0, 0, i)),
            pl.BlockSpec((c, m, s, s), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((c, s, 1), lambda i, *_: (0, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    # Mosaic requires i32 index-map scalars; under x64 (the accumulate-high
    # deployment config, utils/accum.py) index maps would trace as i64 and
    # fail to legalize — scope x64 off around the kernel trace only.
    with jax.enable_x64(False):
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            children.reshape(-1).astype(jnp.int32),
            order.astype(jnp.int32),
            tip_partials.astype(dt),
            pmats_cm,
            wcs.astype(dt),
        )
    if not want_post:
        return res[0][0, :p], None
    out, post_cm = res
    post = jnp.swapaxes(post_cm, 0, 1)  # [M, C, S, P]
    return out[0, :p], post[..., :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def peel_site_loglik_pallas(
    tip_partials, children, order, root, p_matrices, freqs, cat_w,
    interpret=False,
):
    """Per-pattern log-likelihood [P] via the fused Pallas kernel.
    `root` is accepted for interface parity (the peel order ends at the
    root, which the kernel uses directly)."""
    site_logl, _ = _peel_forward_pallas(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret,
        want_post=False,
    )
    return site_logl


def _fwd(tip_partials, children, order, root, p_matrices, freqs, cat_w,
         interpret):
    site_logl, post = _peel_forward_pallas(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret
    )
    # root site likelihood (pre-log, post-rescale) for the adjoint seed
    dt = p_matrices.dtype
    site_lik = jnp.einsum(
        "c,s,csp->p", cat_w, freqs, post[root], preferred_element_type=dt
    )
    residuals = (children, order, root, p_matrices, freqs, cat_w, post, site_lik)
    return site_logl, residuals


def _bwd(interpret, residuals, g):
    # reuse the linear-time pre-order adjoint from the JAX path
    return _jax_peeling._peel_bwd(residuals, g)


peel_site_loglik_pallas.defvjp(_fwd, _bwd)


def resident_plan_fits(m: int, c: int, s: int) -> bool:
    """True when the whole-tree partials tensor fits the resident kernel's
    ~6 MB VMEM budget at the minimum 128-lane block (see _pick_block).
    Above this, peeling must stream through HBM (ops/pallas_stream.py)."""
    return m * c * max(s, 8) * 128 * 4 <= 6 * 1024 * 1024


def peel_loglikelihood_pallas(
    tip_partials, children, order, root, p_matrices, freqs,
    category_weights, pattern_weights, interpret=False,
):
    from beast_mcmc_tpu.utils.accum import stable_dot

    site_logl = peel_site_loglik_pallas(
        tip_partials, children, order, root, p_matrices, freqs,
        category_weights, interpret,
    )
    return stable_dot(pattern_weights, site_logl)


def peel_loglikelihood_pallas_auto(
    tip_partials, children, order, root, p_matrices, freqs,
    category_weights, pattern_weights, interpret=False,
):
    """Shape-dispatched TPU peel: the fully-VMEM-resident kernel when the
    partials tensor fits on-chip, the HBM-streaming kernel otherwise
    (benchmark1/Makona scale, 1,441-1,610+ taxa)."""
    m, c, s = p_matrices.shape[0], p_matrices.shape[1], p_matrices.shape[2]
    if resident_plan_fits(m, c, s):
        return peel_loglikelihood_pallas(
            tip_partials, children, order, root, p_matrices, freqs,
            category_weights, pattern_weights, interpret,
        )
    # deep-prefetch streaming variant: ~5% over the v1 stream at Makona
    # shape, value identical to the last f32 bit (pallas_stream2.py)
    from beast_mcmc_tpu.ops.pallas_stream2 import peel_loglikelihood_deep

    return peel_loglikelihood_deep(
        tip_partials, children, order, root, p_matrices, freqs,
        category_weights, pattern_weights, interpret,
    )
