"""Tip-data uncertainty models (sequence error / hypermutation).

Role of dr.evomodel.tipstatesmodel (ref: TipStatesModel.java:45;
SequenceErrorModel.java:123-200 — error-rate-smeared tip partials;
HypermutantErrorModel.java:95-140 — APOBEC-context A<-G smearing).
In the reference these models push mutable tip partials into BEAGLE;
here they are pure functions from observed states + error parameters to
the [N, S, P] tip-partial tensor consumed by the peeling kernel, so error
rates are sampled like any other parameter with zero extra machinery.

Nucleotide state codes: A,C,G,T = 0,1,2,3; >=4 means ambiguous/gap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# transition partner (A<->G, C<->T) and the two transversion partners
_TS_PARTNER = jnp.asarray([2, 3, 0, 1])


def sequence_error_partials(
    tip_states: jnp.ndarray,  # int[N, P]
    base_error_rate=0.0,
    age_related_rate=None,
    tip_ages=None,  # [N] heights, required with age_related_rate
    transitions_only: bool = False,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """[N, 4, P] partials under the sequence error model:
    p(observed | true) with pUndamaged = (1 - base) * exp(-rate * age)
    spread over transitions only or all substitutions
    (SequenceErrorModel.java:128-155)."""
    n, p = tip_states.shape
    p_undamaged = jnp.asarray(1.0 - base_error_rate, dtype)
    if age_related_rate is not None:
        ages = jnp.asarray(tip_ages, dtype)
        p_undamaged = p_undamaged * jnp.exp(
            -jnp.asarray(age_related_rate, dtype) * ages
        )[:, None]
    else:
        p_undamaged = jnp.broadcast_to(p_undamaged, (n, 1))
    if transitions_only:
        p_ts = 1.0 - p_undamaged
        p_tv = jnp.zeros_like(p_undamaged)
    else:
        p_ts = (1.0 - p_undamaged) / 3.0
        p_tv = p_ts

    states = tip_states  # [N, P]
    s_axis = jnp.arange(4)[None, :, None]  # [1, 4, 1]
    obs = states[:, None, :]  # [N, 1, P]
    ambiguous = obs >= 4
    is_obs = s_axis == obs
    is_ts = s_axis == _TS_PARTNER[jnp.clip(obs, 0, 3)]
    out = jnp.where(
        is_obs, p_undamaged[:, :, None] if p_undamaged.ndim == 2 else p_undamaged,
        jnp.where(is_ts, p_ts[:, :, None], p_tv[:, :, None]),
    )
    return jnp.where(ambiguous, 1.0, out).astype(dtype)


def hypermutant_error_partials(
    tip_states: jnp.ndarray,  # int[N, P]
    apobec_context: jnp.ndarray,  # bool[N, P] A observed in APOBEC context
    hypermutated: jnp.ndarray,  # bool[N] per-tip indicator (sampled)
    rate,  # scalar or [N] hypermutation rate
    dtype=jnp.float64,
) -> jnp.ndarray:
    """[N, 4, P] partials under the APOBEC hypermutation model: an A in a
    hypermutable context on a hypermutated tip may really be a G with
    probability `rate` (HypermutantErrorModel.java:129-140); on
    non-hypermutated tips context-A stays a plain A."""
    n, p = tip_states.shape
    r = jnp.broadcast_to(jnp.asarray(rate, dtype), (n,))[:, None]  # [N,1]
    hyper = jnp.asarray(hypermutated)[:, None]  # [N,1]
    base = jax.nn.one_hot(jnp.clip(tip_states, 0, 3), 4, dtype=dtype)
    base = jnp.where((tip_states >= 4)[:, :, None], 1.0, base)
    base = jnp.swapaxes(base, 1, 2)  # [N, 4, P]
    ctx = apobec_context & (tip_states == 0)  # A in context
    eff = ctx & hyper
    a_row = jnp.where(eff, 1.0 - r, base[:, 0, :])
    g_row = jnp.where(eff, r * jnp.ones_like(base[:, 2, :]), base[:, 2, :])
    out = base.at[:, 0, :].set(a_row).at[:, 2, :].set(g_row)
    return out


def hypermutation_count_statistic(apobec_context, hypermutated):
    """Number of hypermutable sites on hypermutated tips (the reference's
    HypermutantAlignment statistic surface)."""
    return jnp.sum(apobec_context & hypermutated[:, None])
