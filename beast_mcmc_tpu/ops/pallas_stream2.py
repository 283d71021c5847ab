"""Deep-pipelined streaming peel — hiding HBM latency, not traffic.

Measured on v5e at Makona shape (1,610 taxa GTR+G4, 2,048 patterns,
f32): the v1 streaming kernel (ops/pallas_stream.py) runs at ~1.69
ms/eval = ~260 ns per node-block — LATENCY-bound on its 1-step-ahead
child DMA chain, not bandwidth-bound (its ~630 MB/eval would cost only
~0.77 ms at full HBM bandwidth).

Two designs were built and measured against it:

  - a postorder + 32-slot ring kernel that cuts HBM partial traffic
    ~35x (46 of 1,608 internal reads spill) — SLOWER (4.46 ms/eval):
    the in-jit Euler-tour list ranking costs ~2 ms of tiny-gather
    dispatch on TPU and the ring's dynamic VMEM indexing adds per-step
    latency. Traffic was never the binding constraint.
  - THIS kernel: identical schedule and traffic to v1, but child DMAs
    issued D=4 steps ahead through a [D][2] fetch-buffer pipeline, with
    the VMEM ring widened to R = D + 2 = 6 statically-selected slots so
    every position the deeper pipeline cannot fetch safely is served
    on-chip. Write-back waits stay at distance K = R - D = 2, which
    keeps the fetch-after-write hazard closed: a fetch of position p is
    issued at step t - D + 1 >= p + K only when p <= t - R, and ring
    positions p >= t - R + 1 never touch HBM.

MEASURED: 1.712 ms/eval vs v1's 1.801 in the same session (~5%;
identical value to the last f32 bit). Conclusion: the binding
constraint is the per-step SCALAR/control cost of the 1,609-iteration
node loop (~1.1 us/step at bp=2048 with a single grid block), not DMA
latency or bandwidth — the next real lever is packing categories into
sublanes to shrink per-step vector-op count, or multi-node unrolling.
v1 remains the default dispatch; this kernel is kept as the measured
record of both experiments.

Numerics identical to v1 (same per-node order of operations).
Gradients rematerialize through the XLA scan adjoint.

(ref: the BEAGLE updatePartials/accumulateScaleFactors sequence,
BeagleDataLikelihoodDelegate.java:904-934.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beast_mcmc_tpu.ops import peeling as _jax_peeling
from beast_mcmc_tpu.utils.accum import stable_dot

DEPTH = 4  # fetch lookahead
RINGN = DEPTH + 2  # statically-selected VMEM ring slots


def _matvec(pm_cols, child, s):
    acc = pm_cols(0) * child[0:1, :]
    for j in range(1, s):
        acc = acc + pm_cols(j) * child[j:j + 1, :]
    return acc


def _deep_kernel(
    lr_ids_ref,
    lr_pos_ref,
    tips_ref,
    pm_ref,
    wcs_ref,
    out_ref,
    post_ref,
    fetch_buf,  # VMEM [D, 2, C, S, BP]
    tip_buf,  # VMEM [D, 2, S, BP]
    pm_buf,  # VMEM [2, CHUNK, 2*C*S, S_pad]
    prev_buf,  # VMEM [R, C, S, BP]
    fetch_sem,  # DMA [D, 2]
    tip_sem,  # DMA [D, 2]
    pm_sem,  # DMA [2]
    write_sem,  # DMA [R]
    *,
    n_tips,
    n_int,
    c,
    s,
    bp,
    chunk,
):
    blk = pl.program_id(0)
    n_chunks = (n_int + chunk - 1) // chunk
    dt = out_ref.dtype
    d = DEPTH
    r = RINGN

    def tip_dma(slot, k, tip_id):
        return pltpu.make_async_copy(
            tips_ref.at[tip_id, :, pl.ds(blk * bp, bp)],
            tip_buf.at[slot, k],
            tip_sem.at[slot, k],
        )

    def fetch_dma(slot, k, pos):
        return pltpu.make_async_copy(
            post_ref.at[pos, :, :, pl.ds(blk * bp, bp)],
            fetch_buf.at[slot, k],
            fetch_sem.at[slot, k],
        )

    def write_dma(i):
        return pltpu.make_async_copy(
            prev_buf.at[i % r],
            post_ref.at[i, :, :, pl.ds(blk * bp, bp)],
            write_sem.at[i % r],
        )

    def pm_dma(slot, ci):
        return pltpu.make_async_copy(
            pm_ref.at[pl.ds(ci * chunk, chunk)],
            pm_buf.at[slot],
            pm_sem.at[slot],
        )

    def issue_fetches(t):
        """Child DMAs for step t, issued D-1 steps ahead. Positions
        >= t - R + 1 are served from the VMEM ring instead."""
        slot = t % d
        for k in range(2):
            cid = lr_ids_ref[2 * t + k]
            pos = lr_pos_ref[2 * t + k]
            is_tip = pos < 0

            @pl.when(is_tip)
            def _():
                tip_dma(slot, k, cid).start()

            @pl.when(jnp.logical_not(is_tip) & (pos <= t - r))
            def _():
                fetch_dma(slot, k, pos).start()

    pm_dma(0, 0).start()
    for t in range(min(d - 1, n_int)):
        issue_fetches(t)

    def body(i, acc):
        slot = i % d
        ci = i // chunk

        # write-back wait at distance K = R - D: closes both the ring
        # slot-reuse hazard (reuse at +R) and the fetch-after-write
        # hazard (earliest fetch issue of p is at p + K + 1)
        @pl.when(i >= r - d)
        def _():
            write_dma(i - (r - d)).wait()

        @pl.when(i % chunk == 0)
        def _():
            @pl.when(ci + 1 < n_chunks)
            def _():
                pm_dma((ci + 1) % 2, ci + 1).start()

            pm_dma(ci % 2, ci).wait()

        @pl.when(i + d - 1 < n_int)
        def _():
            issue_fetches(i + d - 1)

        for k in range(2):
            pos = lr_pos_ref[2 * i + k]
            is_tip = pos < 0

            @pl.when(is_tip)
            def _():
                tip_dma(slot, k, lr_ids_ref[2 * i + k]).wait()

            @pl.when(jnp.logical_not(is_tip) & (pos <= i - r))
            def _():
                fetch_dma(slot, k, pos).wait()

        pm_block = pm_buf[ci % 2, i % chunk]

        xs = []
        scale = None
        for cc in range(c):
            vals = []
            for k in range(2):
                pos = lr_pos_ref[2 * i + k]
                is_tip = pos < 0
                tip_v = tip_buf[slot, k]
                # static R-way ring select (no dynamic VMEM indexing)
                ring_v = prev_buf[(i - 1) % r, cc]
                for back in range(2, r):
                    ring_v = jnp.where(
                        pos == i - back, prev_buf[(i - back) % r, cc],
                        ring_v)
                hbm_v = fetch_buf[slot, k, cc]
                child = jnp.where(
                    is_tip, tip_v,
                    jnp.where(pos > i - r, ring_v, hbm_v))
                row0 = (k * c + cc) * s
                if s >= 16:
                    pm_m = pm_block[row0:row0 + s, 0:s]
                    v = jax.lax.dot_general(
                        pm_m, child, (((1,), (0,)), ((), ())),
                        preferred_element_type=dt,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                else:
                    v = _matvec(
                        lambda j: pm_block[row0:row0 + s, j:j + 1],
                        child, s,
                    )
                vals.append(v)
            x = vals[0] * vals[1]
            xs.append(x)
            mx = jnp.max(x, axis=0, keepdims=True)
            scale = mx if scale is None else jnp.maximum(scale, mx)
        scale = jnp.where(scale > 0, scale, 1.0)
        for cc in range(c):
            prev_buf[i % r, cc] = xs[cc] / scale

        write_dma(i).start()
        return acc + jnp.log(scale)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_int), body, jnp.zeros((1, bp), dt))

    # drain the last K writes still in flight
    for back in range(r - d):
        if n_int - 1 - back >= 0:
            write_dma(n_int - 1 - back).wait()

    root_slot = (n_int - 1) % r
    site_lik = jnp.zeros((1, bp), dt)
    for cc in range(c):
        site_lik += jnp.sum(
            prev_buf[root_slot, cc] * wcs_ref[cc], axis=0, keepdims=True
        )
    out_ref[:] = jnp.log(site_lik) + acc


def _pick_bp(p: int, c: int, s: int) -> int:
    sp = max(8, s)
    per_lane = (DEPTH * 2 * c + DEPTH * 2 + RINGN * c) * sp * 4
    budget = 8 * 1024 * 1024
    bp = (budget // per_lane // 128) * 128
    bp = max(128, min(2048, bp))
    return min(bp, max(128, ((p + 127) // 128) * 128))


def _pick_chunk(c: int, s: int) -> int:
    row_bytes = ((2 * c * s + 7) // 8) * 8 * 128 * 4
    chunk = max(8, (1024 * 1024) // row_bytes)
    return min(256, chunk)


def _deep_forward(tip_partials, children, order, p_matrices, freqs, cat_w,
                  interpret=False):
    n_tips, s, p = tip_partials.shape
    c = p_matrices.shape[1]
    n_int = n_tips - 1
    dt = p_matrices.dtype

    bp = _pick_bp(p, c, s)
    pad = (-p) % bp
    if pad:
        tip_partials = jnp.pad(
            tip_partials, ((0, 0), (0, 0), (0, pad)), constant_values=1.0
        )
    p_padded = p + pad

    m = children.shape[0]
    pos_of = jnp.full((m,), -1, jnp.int32).at[order].set(
        jnp.arange(n_int, dtype=jnp.int32)
    )
    lr_ids = children[order].astype(jnp.int32)
    lr_pos = pos_of[lr_ids]
    pm_ordered = p_matrices[lr_ids]
    s_pad = max(128, ((s + 127) // 128) * 128)
    pm_flat = jnp.pad(
        pm_ordered.reshape(n_int, 2 * c * s, s),
        ((0, 0), (0, 0), (0, s_pad - s)),
    )
    chunk = _pick_chunk(c, s)
    n_chunks = (n_int + chunk - 1) // chunk
    if n_chunks * chunk != n_int:
        pm_flat = jnp.pad(
            pm_flat, ((0, n_chunks * chunk - n_int), (0, 0), (0, 0))
        )

    wcs = (cat_w[:, None] * freqs[None, :])[:, :, None].astype(dt)

    kernel = functools.partial(
        _deep_kernel, n_tips=n_tips, n_int=n_int, c=c, s=s, bp=bp,
        chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p_padded // bp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c, s, 1), lambda i, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bp), lambda i, *_: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 2, c, s, bp), dt),
            pltpu.VMEM((DEPTH, 2, s, bp), dt),
            pltpu.VMEM((2, chunk, 2 * c * s, s_pad), dt),
            pltpu.VMEM((RINGN, c, s, bp), dt),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((RINGN,)),
        ],
    )
    with jax.enable_x64(False):
        out, _post = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, p_padded), dt),
                jax.ShapeDtypeStruct((n_int, c, s, p_padded), dt),
            ],
            interpret=interpret,
        )(
            lr_ids.reshape(-1),
            lr_pos.reshape(-1),
            tip_partials.astype(dt),
            pm_flat,
            wcs,
        )
    return out[0, :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def peel_site_loglik_deep(
    tip_partials, children, order, root, p_matrices, freqs, cat_w,
    interpret=False,
):
    """Per-pattern log-likelihood [P] via the deep-pipelined streaming
    kernel."""
    return _deep_forward(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret
    )


def _fwd(tip_partials, children, order, root, p_matrices, freqs, cat_w,
         interpret):
    site_logl = _deep_forward(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret
    )
    return site_logl, (tip_partials, children, order, root, p_matrices,
                       freqs, cat_w)


def _bwd(interpret, residuals, g):
    tip_partials, children, order, root, p_matrices, freqs, cat_w = residuals
    _, post, site_lik = _jax_peeling._peel_forward(
        tip_partials, children, order, root, p_matrices, freqs, cat_w
    )
    res = (children, order, root, p_matrices, freqs, cat_w, post, site_lik)
    return _jax_peeling._peel_bwd(res, g)


peel_site_loglik_deep.defvjp(_fwd, _bwd)


def peel_loglikelihood_deep(
    tip_partials, children, order, root, p_matrices, freqs,
    category_weights, pattern_weights, interpret=False,
):
    site_logl = peel_site_loglik_deep(
        tip_partials, children, order, root, p_matrices, freqs,
        category_weights, interpret,
    )
    return stable_dot(pattern_weights, site_logl)
