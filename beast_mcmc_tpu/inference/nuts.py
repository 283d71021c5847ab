"""No-U-Turn Sampler (NUTS).

Role of the reference's NoUTurnOperator (ref: src/dr/inference/operators/
hmc/NoUTurnOperator.java:41,157 — recursive buildTree with slice
sampling). TPU-native redesign: the recursion is replaced by the
*iterative* multinomial-NUTS formulation — a static unrolled loop over
tree depths, each doubling a single lax.scan of 2^d leapfrog steps, with
the binary-counter checkpoint scheme for the sub-U-turn checks (the same
balanced-subtree structure the recursive buildTree visits, without
recursion or dynamic shapes).

The operator is a Gibbs-style move: the returned state is already a draw
from the target, so it reports log-Hastings = +inf (always accept — the
reference's GibbsOperator bypass, MarkovChain.java:283-303) and supplies
the trajectory's mean Metropolis acceptance statistic for Robbins-Monro
step-size adaptation (the reference adapts NUTS step size the same way).

Positive parameters run in log space exactly as HmcOperator: the internal
target is pi(e^y) e^y.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.hmc import HmcOperator

_DIVERGENCE = 1000.0  # energy-error threshold (Stan/reference convention)


def _ckpt_idxs(n):
    """Binary-counter bookkeeping for leaf n (0-based within a subtree).

    idx_max = popcount(n >> 1) (checkpoint slot for even leaves);
    num_trailing = number of trailing set bits of n. A balanced subtree
    completes at every odd leaf; its left endpoints are the checkpoints in
    [idx_min, idx_max].
    """
    n = n.astype(jnp.int32)

    def popcount_body(c):
        v, acc = c
        return v >> 1, acc + (v & 1)

    _, idx_max = jax.lax.while_loop(
        lambda c: c[0] > 0, popcount_body, (n >> 1, jnp.int32(0))
    )

    def trail_body(c):
        v, acc = c
        return v >> 1, acc + 1

    _, num_trailing = jax.lax.while_loop(
        lambda c: (c[0] & 1) != 0, trail_body, (n, jnp.int32(0))
    )
    idx_min = idx_max - num_trailing + 1
    return idx_min, idx_max


@dataclasses.dataclass
class NutsOperator(HmcOperator):
    """Multinomial NUTS over a named subset of continuous parameters.

    max_depth: maximum number of doublings (trajectory <= 2^max_depth
    leapfrogs). step_size adapts toward target_acceptance (default 0.8).
    """

    max_depth: int = 6
    target_acceptance: float = 0.8

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "NutsOperator not bound"
        lp_fn = self._log_posterior
        eps = tuning
        dt = tree.heights.dtype
        y0 = self._pack(params).astype(dt)
        dim = y0.shape[0]
        inv_mass = 1.0 / self.mass
        md = self.max_depth

        def log_py(y):
            prms = self._unpack(params, y)
            lp = lp_fn(prms, tree)
            if self.log_transform:
                lp = lp + jnp.sum(y)
            return lp

        grad_fn = jax.grad(lambda y: -log_py(y))

        def energy(y, r):
            return -log_py(y) + 0.5 * jnp.sum(r * r) * inv_mass

        def leapfrog(y, r):
            r = r - 0.5 * eps * grad_fn(y)
            y = y + eps * r * inv_mass
            r = r - 0.5 * eps * grad_fn(y)
            return y, r

        k_mom, k_dir, k_sub, k_sel = jax.random.split(key, 4)
        r0 = jax.random.normal(k_mom, (dim,), dt) * jnp.sqrt(self.mass)
        h0 = energy(y0, r0)

        def build_subtree(y_edge, r_edge_int, depth, key):
            """Simulate 2^depth leapfrogs from (y_edge, r_edge) — momenta in
            the INTEGRATION frame. Returns far endpoint, multinomial
            proposal, logsumexp weight, acceptance sum, and stop flags."""
            n_steps = 2 ** depth
            ck_y0 = jnp.zeros((md + 1, dim), dt)
            ck_r0 = jnp.zeros((md + 1, dim), dt)

            def body(carry, i):
                (y, r, y_prop, logw, sum_acc, turning, diverged,
                 ck_y, ck_r, key) = carry
                key, k_leaf = jax.random.split(key)
                y_new, r_new = leapfrog(y, r)
                h_new = energy(y_new, r_new)
                delta = h0 - h_new
                diverged = diverged | (delta < -_DIVERGENCE) | jnp.isnan(delta)
                logw_leaf = jnp.where(diverged, -jnp.inf, delta)
                # progressive multinomial sampling within the subtree
                logw_new = jnp.logaddexp(logw, logw_leaf)
                take = jnp.log(jax.random.uniform(k_leaf, dtype=dt)) < (
                    logw_leaf - logw_new
                )
                y_prop = jnp.where(take, y_new, y_prop)
                sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(delta))
                # checkpoint bookkeeping: even leaves store; odd leaves close
                # one or more balanced subtrees and check them for U-turns
                idx_min, idx_max = _ckpt_idxs(i)
                is_even = (i & 1) == 0
                ck_y = jnp.where(is_even, ck_y.at[idx_max].set(y_new), ck_y)
                ck_r = jnp.where(is_even, ck_r.at[idx_max].set(r_new), ck_r)
                idxs = jnp.arange(md + 1)
                active = (~is_even) & (idxs >= idx_min) & (idxs <= idx_max)
                d_y = y_new[None, :] - ck_y  # [md+1, dim]
                t_left = jnp.einsum("kd,kd->k", d_y, ck_r) < 0.0
                t_right = (d_y @ r_new) < 0.0
                turning = turning | jnp.any(active & (t_left | t_right))
                carry = (
                    y_new, r_new, y_prop, logw_new, sum_acc,
                    turning, diverged, ck_y, ck_r, key,
                )
                return carry, None

            init = (
                y_edge, r_edge_int, y_edge, -jnp.inf,
                jnp.asarray(0.0, dt), jnp.asarray(False), jnp.asarray(False),
                ck_y0, ck_r0, key,
            )
            (y_far, r_far, y_prop, logw, sum_acc, turning, diverged,
             _, _, _) = jax.lax.scan(body, init, jnp.arange(n_steps))[0]
            return y_far, r_far, y_prop, logw, sum_acc, turning, diverged

        # trajectory endpoints in the GLOBAL frame
        y_minus, r_minus = y0, r0
        y_plus, r_plus = y0, r0
        y_prop = y0
        logw = jnp.asarray(0.0, dt)  # weight of the root leaf: exp(h0-h0)
        sum_acc = jnp.asarray(0.0, dt)
        n_lf = jnp.asarray(0, jnp.int32)
        done = jnp.asarray(False)

        dir_keys = jax.random.split(k_dir, md)
        sub_keys = jax.random.split(k_sub, md)
        sel_keys = jax.random.split(k_sel, md)

        for depth in range(md):
            direction = jnp.where(
                jax.random.uniform(dir_keys[depth], dtype=dt) < 0.5, -1.0, 1.0
            ).astype(dt)
            y_edge = jnp.where(direction > 0, y_plus, y_minus)
            r_edge = jnp.where(direction > 0, r_plus, r_minus)
            (y_far, r_far_int, y_sub, logw_sub, acc_sub, turning_sub,
             diverged_sub) = build_subtree(
                y_edge, r_edge * direction, depth, sub_keys[depth]
            )
            r_far = r_far_int * direction  # back to the global frame
            ok = ~done & ~turning_sub & ~diverged_sub
            # biased progressive sampling across doublings
            take = ok & (
                jnp.log(jax.random.uniform(sel_keys[depth], dtype=dt))
                < (logw_sub - logw)
            )
            y_prop = jnp.where(take, y_sub, y_prop)
            logw = jnp.where(ok, jnp.logaddexp(logw, logw_sub), logw)
            sum_acc = sum_acc + jnp.where(~done, acc_sub, 0.0)
            n_lf = n_lf + jnp.where(~done, 2 ** depth, 0)
            # extend endpoints only if the subtree was accepted into the tree
            y_minus = jnp.where(ok & (direction < 0), y_far, y_minus)
            r_minus = jnp.where(ok & (direction < 0), r_far, r_minus)
            y_plus = jnp.where(ok & (direction > 0), y_far, y_plus)
            r_plus = jnp.where(ok & (direction > 0), r_far, r_plus)
            dz = y_plus - y_minus
            whole_turn = (jnp.dot(dz, r_minus) < 0.0) | (
                jnp.dot(dz, r_plus) < 0.0
            )
            done = done | turning_sub | diverged_sub | whole_turn

        mean_acc = sum_acc / jnp.maximum(n_lf.astype(dt), 1.0)
        new_params = self._unpack(params, y_prop)
        # Gibbs-style: always accept; adapt on the internal mean acceptance
        return new_params, tree, jnp.asarray(jnp.inf, dt), mean_acc
