"""Transmission-tree likelihoods: virus genealogy given a transmission
history (who-infected-whom with infection times).

Role of dr.evomodel.transmission.TransmissionLikelihood (ref:
src/dr/evomodel/transmission/TransmissionLikelihood.java:273-414 — walks
the virus tree, moving lineages across host boundaries at the hosts'
transmission times, accumulating per-host coalescent interval lists, and
summing per-host coalescent densities; coalescences of lineages in
different hosts are incompatible -> -inf) and the sampled-history side of
the case-to-case package (ref: src/dr/evomodel/epidemiology/casetocase/
CaseToCaseTransmissionLikelihood.java — here the infection times become
parameters moved by infection_time_move).

TPU-native redesign: the reference's recursive setupIntervals becomes a
dense [edges x hosts] occupancy computation — each virus-tree edge's host
chain is resolved by iterating the donor map (a fixed H-step pointer
chase), the time each edge spends in each host is a clipped interval
intersection, and every per-host coalescent density is an O(E log E)
sort-free masked sum. No interval lists, no recursion, fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def host_at(tip_host, height, donor_host: jnp.ndarray,
            transmission_time: jnp.ndarray) -> jnp.ndarray:
    """Host containing a lineage that starts in `tip_host` once it has
    reached `height` (going back in time): follow the donor chain while
    height exceeds the current host's infection time (ref: the while loops
    in setupIntervals :385-404). Fixed H iterations (a chain can cross at
    most H-1 boundaries)."""
    h = jnp.asarray(tip_host)
    n_hosts = donor_host.shape[0]
    for _ in range(n_hosts):
        cross = height > transmission_time[h]
        h = jnp.where(cross, donor_host[h], h)
    return h


def transmission_loglik(
    parent: jnp.ndarray,            # virus tree, int32[M]
    children: jnp.ndarray,          # int32[M,2]
    heights: jnp.ndarray,           # [M]
    n_taxa: int,
    tip_host: jnp.ndarray,          # int32[N] host index of each tip
    donor_host: jnp.ndarray,        # int32[H]; source host points at itself
    transmission_time: jnp.ndarray, # [H]; +inf for the source host
    host_pop_sizes: jnp.ndarray,    # [H] constant within-host Ne
) -> jnp.ndarray:
    """Sum over hosts of the within-host coalescent density of the virus
    genealogy, -inf when the genealogy is incompatible with the
    transmission history (a coalescence whose two child lineages sit in
    different hosts at that height).

    Within-host demographic: constant Ne per host (the reference's
    TransmissionDemographicModel CONSTANT mode; :124-132).
    """
    dt = heights.dtype
    m = parent.shape[0]
    n_hosts = donor_host.shape[0]

    # host of every node at its own height (tips: assignment; internals:
    # chain-resolved from any descendant tip — use child 0's node host)
    node_host = jnp.full((m,), -1, jnp.int32)
    node_host = node_host.at[:n_taxa].set(tip_host.astype(jnp.int32))
    # resolve internal nodes in height order: child hosts are known first
    order = jnp.argsort(heights[n_taxa:]).astype(jnp.int32) + n_taxa

    def assign(node_host, node):
        c0 = children[node, 0]
        c1 = children[node, 1]
        h = heights[node]
        h0 = host_at(node_host[c0], h, donor_host, transmission_time)
        h1 = host_at(node_host[c1], h, donor_host, transmission_time)
        node_host = node_host.at[node].set(h0)
        return node_host, h0 == h1

    node_host, compat = jax.lax.scan(assign, node_host, order)
    compatible = jnp.all(compat)

    # edge occupancy per host: edge above node i spans [heights[i], h_par];
    # its host chain starts at node_host[i]; it is inside host k during
    # [max(h_i, t_enter_k), min(h_par, transmission_time[k])]
    pidx = jnp.maximum(parent, 0)
    h_lo = heights
    h_hi = jnp.where(parent >= 0, heights[pidx], heights)  # root: empty edge

    def edge_occupancy(i):
        """[H, 2] (start, end) of edge i's time inside each host."""
        start = jnp.full((n_hosts,), jnp.inf, dt)
        end = jnp.full((n_hosts,), -jnp.inf, dt)
        host = node_host[i]
        t = h_lo[i]

        def body(carry, _):
            start, end, host, t = carry
            exit_t = jnp.minimum(transmission_time[host], h_hi[i])
            seg_lo = t
            seg_hi = jnp.maximum(exit_t, t)
            live = seg_hi > seg_lo
            start = start.at[host].min(jnp.where(live, seg_lo, jnp.inf))
            end = end.at[host].max(jnp.where(live, seg_hi, -jnp.inf))
            nxt = (transmission_time[host] < h_hi[i])
            host = jnp.where(nxt, donor_host[host], host)
            t = seg_hi  # next segment starts at the crossing time
            return (start, end, host, t), None

        (start, end, _, _), _ = jax.lax.scan(
            body, (start, end, host, t), None, length=n_hosts)
        return start, end

    occ_start, occ_end = jax.vmap(edge_occupancy)(jnp.arange(m))  # [M,H]

    # per-host density: sum over inter-event slices of -C(k,2)/N dt and
    # -log N per coalescence. Event times in host k: all occupancy starts
    # and ends in k. k(t) = # edges with start <= t < end.
    def host_density(k):
        starts = jnp.where(jnp.isfinite(occ_start[:, k]), occ_start[:, k],
                           jnp.inf)
        ends = jnp.where(jnp.isfinite(occ_end[:, k]), occ_end[:, k], jnp.inf)
        times = jnp.sort(jnp.concatenate([starts, ends]))  # [2M]
        t0 = times[:-1]
        t1 = times[1:]
        span = jnp.where(jnp.isfinite(t1) & jnp.isfinite(t0), t1 - t0, 0.0)
        mid = jnp.where(jnp.isfinite(t1), 0.5 * (t0 + t1), 0.0)
        lin = jnp.sum(
            (starts[None, :] <= mid[:, None]) & (mid[:, None] < ends[None, :]),
            axis=1,
        ).astype(dt)
        ne = host_pop_sizes[k]
        interval_term = -jnp.sum(lin * (lin - 1.0) / 2.0 * span / ne)
        # coalescences in host k
        is_coal = (node_host == k) & (jnp.arange(m) >= n_taxa)
        event_term = -jnp.sum(jnp.where(is_coal, jnp.log(ne), 0.0))
        return interval_term + event_term

    total = jnp.sum(jax.vmap(host_density)(jnp.arange(n_hosts)))
    return jnp.where(compatible, total, -jnp.inf)


def infection_time_move(key, transmission_time: jnp.ndarray, window,
                        source_host) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Random-walk one host's infection time (the case-to-case sampled
    transmission history role; ref: casetocase operators acting on
    infection-time parameters). Symmetric; the source host (infinite
    infection time) is excluded."""
    n_hosts = transmission_time.shape[0]
    k1, k2 = jax.random.split(key)
    from beast_mcmc_tpu.inference.operators import sample_excluding

    h = sample_excluding(k1, n_hosts, jnp.asarray([source_host], jnp.int32))
    delta = (jax.random.uniform(k2, dtype=transmission_time.dtype) * 2 - 1) * window
    new = transmission_time.at[h].add(delta)
    ok = new[h] > 0.0
    return new, jnp.where(ok, 0.0, -jnp.inf)
