"""Streaming Pallas TPU peeling kernel — unbounded tree size, bounded VMEM.

The resident kernel (ops/pallas_peeling.py) keeps the whole [C, M, S, BP]
partials tensor in VMEM, which stops fitting once M*C*S exceeds ~12k
(benchmark1/Makona scale: 1,441-1,610 taxa). This kernel keeps partials in
HBM and *streams* the peel:

  - node partials live in an HBM buffer indexed by PEEL-ORDER POSITION
    (not node id) — the schedule is the storage layout;
  - per step, the two child partials are DMA'd HBM->VMEM one step ahead
    (double-buffered), the node op runs on the VPU, and the result is
    DMA'd back; a 2-slot VMEM ring holds the last two computed nodes so a
    parent that immediately follows its child never waits on HBM
    (read-after-write hazards are resolved by position arithmetic:
    child at position >= i-2 comes from the ring, else its write-back has
    been awaited);
  - the per-branch transition matrices are pre-gathered OUTSIDE the
    kernel into peel order ([n_int, 2, C, S, S] — child l/r of step i)
    and streamed through VMEM in fixed-size chunks, one DMA per chunk —
    sequential access needs no per-node gather;
  - tips are fetched as category-free [S, BP] slices from a separate HBM
    input.

VMEM high-water mark is O(C*S*BP + CHUNK*C*S^2) — independent of tree
size. Numerics match ops/peeling.py: per-pattern max-rescale at every
node, log-scales accumulated into one running [1, BP] sum (each internal
node contributes exactly once to the root's total), category-weighted
root reduction.

Gradients: rematerialized VJP — backward recomputes partials with the
XLA scan (ops/peeling.py) and runs its linear-time pre-order adjoint.
The MH hot loop is forward-only; HMC/NUTS at huge-tree scale pays one
extra forward, the standard remat trade.

(ref: the BEAGLE updatePartials/accumulateScaleFactors/
calculateRootLogLikelihoods sequence, BeagleDataLikelihoodDelegate
.java:904-934; REVERSE_LEVEL_ORDER vectorized traversal,
TreeTraversal.java:41-131.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beast_mcmc_tpu.ops import peeling as _jax_peeling
from beast_mcmc_tpu.utils.accum import stable_dot


def _matvec(pm_cols, child, s):
    """[S,S] x [S,BP] -> [S,BP]. pm_cols: callable j -> [S,1] column."""
    acc = pm_cols(0) * child[0:1, :]
    for j in range(1, s):
        acc = acc + pm_cols(j) * child[j : j + 1, :]
    return acc


def _stream_kernel(
    lr_ids_ref,  # int32 [2*n_int] child node ids (tip id when tip)
    lr_pos_ref,  # int32 [2*n_int] child peel position; -1 for tips
    tips_ref,  # ANY [N, S, P]
    pm_ref,  # ANY [n_int, 2*C*S, S] branch matrices in peel order
    wcs_ref,  # VMEM [C, S, 1] category-weighted frequencies
    out_ref,  # VMEM [1, BP]
    post_ref,  # ANY [n_int, C, S, P] partials by peel position
    fetch_buf,  # VMEM [2, 2, C, S, BP]
    tip_buf,  # VMEM [2, 2, S, BP]
    pm_buf,  # VMEM [2, CHUNK, 2*C*S, S]
    prev_buf,  # VMEM [2, C, S, BP] last two computed nodes
    fetch_sem,  # DMA [2, 2]
    tip_sem,  # DMA [2, 2]
    pm_sem,  # DMA [2]
    write_sem,  # DMA [2]
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

    def write_dma(slot, i):
        return pltpu.make_async_copy(
            prev_buf.at[slot],
            post_ref.at[i, :, :, pl.ds(blk * bp, bp)],
            write_sem.at[slot],
        )

    def pm_dma(slot, ci):
        return pltpu.make_async_copy(
            pm_ref.at[pl.ds(ci * chunk, chunk)],
            pm_buf.at[slot],
            pm_sem.at[slot],
        )

    def issue_fetches(t):
        """Start child DMAs for step t (called during step t-1). A child
        at peel position >= t-2 is served from the VMEM ring instead
        (its HBM write-back may still be in flight)."""
        slot = t % 2
        for k in range(2):
            cid = lr_ids_ref[2 * t + k]
            pos = lr_pos_ref[2 * t + k]
            is_tip = pos < 0

            @pl.when(is_tip)
            def _():
                tip_dma(slot, k, cid).start()

            @pl.when(jnp.logical_not(is_tip) & (pos < t - 2))
            def _():
                fetch_dma(slot, k, pos).start()

    # ---- warm-up: pm chunk 0 + step-0 fetches (children of the first
    # topological node are necessarily tips, but the general path is used)
    pm_dma(0, 0).start()
    issue_fetches(0)

    def body(i, acc):
        slot = i % 2
        ci = i // chunk

        # await write of step i-2 (its prev slot is reused by this step)
        @pl.when(i >= 2)
        def _():
            write_dma(slot, i - 2).wait()

        # pm chunk rotation: on chunk boundary, prefetch next + await cur
        @pl.when(i % chunk == 0)
        def _():
            @pl.when(ci + 1 < n_chunks)
            def _():
                pm_dma((ci + 1) % 2, ci + 1).start()

            pm_dma(ci % 2, ci).wait()

        # issue fetches for step i+1
        @pl.when(i + 1 < n_int)
        def _():
            issue_fetches(i + 1)

        # await this step's fetches (issued at step i-1 / warm-up)
        for k in range(2):
            pos = lr_pos_ref[2 * i + k]
            is_tip = pos < 0

            @pl.when(is_tip)
            def _():
                tip_dma(slot, k, lr_ids_ref[2 * i + k]).wait()

            @pl.when(jnp.logical_not(is_tip) & (pos < i - 2))
            def _():
                fetch_dma(slot, k, pos).wait()

        # ---- node op
        pm_block = pm_buf[ci % 2, i % chunk]  # [2*C*S, S]

        xs = []
        scale = None
        for cc in range(c):
            vals = []
            for k in range(2):
                pos = lr_pos_ref[2 * i + k]
                is_tip = pos < 0
                tip_v = tip_buf[slot, k]  # [S, BP]
                ring_v = jnp.where(
                    pos == i - 1,
                    prev_buf[(i - 1) % 2, cc],
                    prev_buf[i % 2, cc],
                )
                hbm_v = fetch_buf[slot, k, cc]
                child = jnp.where(
                    is_tip, tip_v, jnp.where(pos >= i - 2, ring_v, hbm_v)
                )
                row0 = (k * c + cc) * s
                if s >= 16:
                    pm_m = pm_block[row0 : row0 + s, 0:s]  # [S(rows), S(cols)]
                    # child[j,:] weighted by column j: out = pm_m @ child
                    v = jax.lax.dot_general(
                        pm_m,
                        child,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=dt,
                    )
                else:
                    v = _matvec(
                        lambda j: pm_block[row0 : row0 + s, j : j + 1],
                        child,
                        s,
                    )
                vals.append(v)
            x = vals[0] * vals[1]
            xs.append(x)
            mx = jnp.max(x, axis=0, keepdims=True)
            scale = mx if scale is None else jnp.maximum(scale, mx)
        scale = jnp.where(scale > 0, scale, 1.0)
        for cc in range(c):
            prev_buf[slot, cc] = xs[cc] / scale

        write_dma(slot, i).start()
        return acc + jnp.log(scale)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_int), body, jnp.zeros((1, bp), dt))

    # drain outstanding writes (root + its predecessor)
    write_dma((n_int - 1) % 2, n_int - 1).wait()
    if n_int >= 2:
        write_dma((n_int - 2) % 2, n_int - 2).wait()

    # root reduction: the root is the last peel step, still in the ring
    root_slot = (n_int - 1) % 2
    site_lik = jnp.zeros((1, bp), dt)
    for cc in range(c):
        site_lik += jnp.sum(
            prev_buf[root_slot, cc] * wcs_ref[cc], axis=0, keepdims=True
        )
    out_ref[:] = jnp.log(site_lik) + acc


def _pick_bp(p: int, c: int, s: int) -> int:
    """Pattern block width: one block when affordable (fetch+ring buffers
    stay under ~4 MB), else 512-lane tiles."""
    sp = max(8, s)  # sublane padding
    per_lane = (2 * 2 * c + 2 * 2 + 2 * c) * sp * 4  # fetch+tip+ring bytes
    budget = 4 * 1024 * 1024
    bp = (budget // per_lane // 128) * 128
    bp = max(128, min(2048, bp))
    return min(bp, max(128, ((p + 127) // 128) * 128))


def _pick_chunk(c: int, s: int) -> int:
    """pm chunk length keeping the double-buffered pm VMEM under ~2 MB
    (lanes pad S->128, sublanes 2*C*S->mult of 8)."""
    row_bytes = ((2 * c * s + 7) // 8) * 8 * 128 * 4
    chunk = max(8, (1024 * 1024) // row_bytes)
    return min(256, chunk)


def _stream_forward(tip_partials, children, order, p_matrices, freqs, cat_w,
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

    # schedule arrays: positions, per-step child ids/positions, pm gather
    m = children.shape[0]
    pos_of = jnp.full((m,), -1, jnp.int32).at[order].set(
        jnp.arange(n_int, dtype=jnp.int32)
    )
    lr_ids = children[order].astype(jnp.int32)  # [n_int, 2]
    lr_pos = pos_of[lr_ids]  # [n_int, 2]; -1 marks tips
    pm_ordered = p_matrices[lr_ids]  # [n_int, 2, C, S, S]
    # lane dim must be 128-aligned for chunked DMA (Mosaic tiling); the
    # padding costs a few % of HBM traffic and zero VMEM vs the tiled pad
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
        _stream_kernel, n_tips=n_tips, n_int=n_int, c=c, s=s, bp=bp,
        chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p_padded // bp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # tips
            pl.BlockSpec(memory_space=pl.ANY),  # pm
            pl.BlockSpec((c, s, 1), lambda i, *_: (0, 0, 0)),  # wcs
        ],
        out_specs=[
            pl.BlockSpec((1, bp), lambda i, *_: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),  # post (by position)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, c, s, bp), dt),
            pltpu.VMEM((2, 2, s, bp), dt),
            pltpu.VMEM((2, chunk, 2 * c * s, s_pad), dt),
            pltpu.VMEM((2, c, s, bp), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # i32 index maps under x64: see the matching scope in pallas_peeling
    with jax.enable_x64(False):
        out, post_pos = pl.pallas_call(
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
    return out[0, :p], post_pos[..., :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def peel_site_loglik_stream(
    tip_partials, children, order, root, p_matrices, freqs, cat_w,
    interpret=False,
):
    """Per-pattern log-likelihood [P] via the streaming kernel. `root` is
    accepted for interface parity (the peel ends at the root)."""
    site_logl, _ = _stream_forward(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret
    )
    return site_logl


def _fwd(tip_partials, children, order, root, p_matrices, freqs, cat_w,
         interpret):
    site_logl, _ = _stream_forward(
        tip_partials, children, order, p_matrices, freqs, cat_w, interpret
    )
    return site_logl, (tip_partials, children, order, root, p_matrices,
                       freqs, cat_w)


def _bwd(interpret, residuals, g):
    # rematerialize: recompute partials with the XLA scan, then run its
    # linear-time pre-order adjoint (ops/peeling.py:_peel_bwd)
    tip_partials, children, order, root, p_matrices, freqs, cat_w = residuals
    _, post, site_lik = _jax_peeling._peel_forward(
        tip_partials, children, order, root, p_matrices, freqs, cat_w
    )
    res = (children, order, root, p_matrices, freqs, cat_w, post, site_lik)
    return _jax_peeling._peel_bwd(res, g)


peel_site_loglik_stream.defvjp(_fwd, _bwd)


def peel_loglikelihood_stream(
    tip_partials, children, order, root, p_matrices, freqs,
    category_weights, pattern_weights, interpret=False,
):
    site_logl = peel_site_loglik_stream(
        tip_partials, children, order, root, p_matrices, freqs,
        category_weights, interpret,
    )
    return stable_dot(pattern_weights, site_logl)
