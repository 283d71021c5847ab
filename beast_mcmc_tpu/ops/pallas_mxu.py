"""MXU-packed Pallas peeling kernel (v2) — categories in the sublanes.

MEASURED (v5e, benchmark2 shape 62 taxa x 5565 patterns, f32, HIGHEST
matmul precision): 416 us/eval vs the v1 broadcast kernel's 371; x8
vmapped 1824 vs 1618. The block-diagonal [16,16] matmuls do not beat
the VPU broadcast chain at nucleotide shapes once full-f32 MXU passes
are required (default bf16 passes are 1.5x faster but lose ~4e-5
relative logL — unacceptable against the 0.1 self-check budget). Kept
as the candidate kernel for LARGE state spaces (amino acid S=20 /
codon S=61, where the per-node matmul is [80,80]+ and MXU occupancy is
real); ops/pallas_peeling.py remains the production nucleotide path.


The v1 resident kernel (ops/pallas_peeling.py) unrolls the category loop
in Python and runs every node as S=4 broadcast-FMA chains on [S->8, BP]
tiles — half the sublanes idle and the VPU issues ~32 small ops per
node. This kernel packs CATEGORY x STATE into one [CS, BP] tile (CS =
C*S, e.g. 16 for nucleotide +G4 — two FULL native (8,128) tiles, zero
sublane waste) and computes each node with TWO block-diagonal MXU
matmuls:

    post[node] = (Wl @ post[l]) * (Wr @ post[r]),   Wl, Wr : [CS, CS]

where W = blockdiag(P_c) is assembled OUTSIDE the kernel ([M, CS, CS],
~126 KB at benchmark2 shape). The MXU does the j-summation in hardware;
the VPU keeps only the elementwise product, the per-pattern max-rescale
(one max over CS sublanes — the same scale the v1 kernel computes as a
max over categories), and the log-scale accumulator.

Numerics are IDENTICAL in structure to v1/the XLA scan: per-pattern
rescale at every internal node, linear accumulation of log-scales, and a
category-weighted root reduction; only the reduction order inside each
matvec differs (MXU tree-sum vs sequential FMA), which stays within f32
rounding of the same value.

Memory: the resident partials tensor is [M, CS, BP] — exactly the same
bytes as v1's [C, M, S, BP]. The VJP stores it for the linear-time
pre-order adjoint of ops/peeling.py.

(ref: the BEAGLE updatePartials/accumulateScaleFactors/
calculateRootLogLikelihoods sequence, BeagleDataLikelihoodDelegate
.java:904-934 — one fused kernel, categories vectorized in-lane.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beast_mcmc_tpu.ops import peeling as _jax_peeling


def _pick_block(n_nodes: int, cs: int, p: int) -> int:
    """Largest pattern block keeping the [M, CS, BP] partials under
    ~7 MB of VMEM (f32), within [128, 2048] lanes."""
    budget = 7 * 1024 * 1024
    bp = budget // (n_nodes * max(cs, 8) * 4)
    bp = max(128, min(2048, (bp // 128) * 128))
    return min(bp, max(128, ((p + 127) // 128) * 128))


def _peel_kernel_mxu(children_ref, order_ref, tips_ref, w_ref, wcs_ref,
                     out_ref, post_ref, *, n_tips, n_internal, cs, bp):
    post_ref[0:n_tips] = tips_ref[:]

    def body(i, acc):
        node = order_ref[i]
        l = children_ref[2 * node]
        r = children_ref[2 * node + 1]
        # HIGHEST: full-f32 MXU passes — the default bf16 truncation
        # loses ~4e-5 relative logL (~200 log units at benchmark2 scale)
        xl = jax.lax.dot_general(
            w_ref[node, 0], post_ref[l],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        xr = jax.lax.dot_general(
            w_ref[node, 1], post_ref[r],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        x = xl * xr
        mx = jnp.max(x, axis=0, keepdims=True)  # [1, BP] over CS rows
        scale = jnp.where(mx > 0, mx, 1.0)
        post_ref[node] = x / scale
        return acc + jnp.log(scale)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_internal), body,
        jnp.zeros((1, bp), out_ref.dtype)
    )

    root = order_ref[n_internal - 1]
    site_lik = jnp.sum(post_ref[root] * wcs_ref[:], axis=0, keepdims=True)
    out_ref[:] = jnp.log(site_lik) + acc


def _blockdiag_w(p_matrices: jnp.ndarray, children: jnp.ndarray):
    """[M, 2, CS, CS] block-diagonal child transition operators in the
    PARENT-indexed layout the kernel wants: W[node, 0] acts on the left
    child's packed partials, W[node, 1] on the right's."""
    m, c, s, _ = p_matrices.shape
    cs = c * s
    eye_c = jnp.eye(c, dtype=p_matrices.dtype)
    # blockdiag: [M, C, S, S] -> [M, CS, CS]
    bd = jnp.einsum("mcij,cd->mcidj", p_matrices, eye_c).reshape(m, cs, cs)
    l = children[:, 0]
    r = children[:, 1]
    wl = bd[jnp.maximum(l, 0)]
    wr = bd[jnp.maximum(r, 0)]
    return jnp.stack([wl, wr], axis=1)  # [M, 2, CS, CS]


def _peel_forward_mxu(tip_partials, children, order, p_matrices, freqs,
                      cat_w, interpret=False, want_post=True):
    n_tips, s, p = tip_partials.shape
    m = children.shape[0]
    c = p_matrices.shape[1]
    cs = c * s
    n_internal = n_tips - 1
    dt = p_matrices.dtype
    bp = _pick_block(m, cs, p)
    pad = (-p) % bp
    if pad:
        tip_partials = jnp.pad(
            tip_partials, ((0, 0), (0, 0), (0, pad)), constant_values=1.0
        )
    p_padded = p + pad

    # packed tips: [N, CS, BP] (same values every category block)
    tips_cs = jnp.tile(tip_partials, (1, c, 1))
    w_ops = _blockdiag_w(p_matrices, children)
    wcs = jnp.repeat(cat_w, s) * jnp.tile(freqs, c)  # [CS]
    wcs = wcs[:, None]

    grid = (p_padded // bp,)
    kernel = functools.partial(
        _peel_kernel_mxu, n_tips=n_tips, n_internal=n_internal, cs=cs, bp=bp
    )
    out_specs = [pl.BlockSpec((1, bp), lambda i, *_: (0, i))]
    out_shape = [jax.ShapeDtypeStruct((1, p_padded), dt)]
    scratch_shapes = []
    if want_post:
        out_specs.append(
            pl.BlockSpec((m, cs, bp), lambda i, *_: (0, 0, i))
        )
        out_shape.append(jax.ShapeDtypeStruct((m, cs, p_padded), dt))
    else:
        scratch_shapes.append(pltpu.VMEM((m, cs, bp), dt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_tips, cs, bp), lambda i, *_: (0, 0, i)),
            pl.BlockSpec((m, 2, cs, cs), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((cs, 1), lambda i, *_: (0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    with jax.enable_x64(False):
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            children.reshape(-1).astype(jnp.int32),
            order.astype(jnp.int32),
            tips_cs.astype(dt),
            w_ops.astype(dt),
            wcs.astype(dt),
        )
    if not want_post:
        return res[0][0, :p], None
    out, post_cs = res
    # [M, CS, P] -> [M, C, S, P] for the shared pre-order adjoint
    post = post_cs.reshape(m, c, s, p_padded)
    return out[0, :p], post[..., :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def peel_site_loglik_mxu(
    tip_partials, children, order, root, p_matrices, freqs, cat_w,
    interpret=False,
):
    """Per-pattern log-likelihood [P] via the MXU-packed kernel."""
    site_logl, _ = _peel_forward_mxu(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret,
        want_post=False,
    )
    return site_logl


def _fwd(tip_partials, children, order, root, p_matrices, freqs, cat_w,
         interpret):
    site_logl, post = _peel_forward_mxu(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret
    )
    dt = p_matrices.dtype
    site_lik = jnp.einsum(
        "c,s,csp->p", cat_w, freqs, post[root], preferred_element_type=dt
    )
    residuals = (children, order, root, p_matrices, freqs, cat_w, post,
                 site_lik)
    return site_logl, residuals


def _bwd(interpret, residuals, g):
    return _jax_peeling._peel_bwd(residuals, g)


peel_site_loglik_mxu.defvjp(_fwd, _bwd)


def resident_mxu_fits(m: int, c: int, s: int) -> bool:
    """True when [M, CS, 128] partials + [M, 2, CS, CS] operators fit
    the ~7 MB VMEM budget at the minimum block."""
    cs = max(c * s, 8)
    return (m * cs * 128 + m * 2 * cs * cs) * 4 <= 7 * 1024 * 1024


def peel_loglikelihood_mxu(
    tip_partials, children, order, root, p_matrices, freqs,
    category_weights, pattern_weights, interpret=False,
):
    from beast_mcmc_tpu.utils.accum import stable_dot

    site_logl = peel_site_loglik_mxu(
        tip_partials, children, order, root, p_matrices, freqs,
        category_weights, interpret,
    )
    return stable_dot(pattern_weights, site_logl)
