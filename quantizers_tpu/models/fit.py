"""Tiny-model language-model fitting.

The BASELINE.md quality north star is a *delta*: quantized PPL minus bf16
PPL. On random weights that delta is pure noise (quantization of noise can
even come out "better"), so the pinned PPL protocol first FITS the tiny
model to its evaluation corpus — a few hundred CPU steps — which makes the
bf16 model a real (local) optimum. Quantization then strictly damages it,
deltas come out positive, and recipe ordering (AWQ <= RTN damage at equal
bit-width) becomes assertable.

This is protocol machinery, not a training framework: single device, full
batch gradients through the same ``forward`` the serving path uses.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def fit_lm(
    spec,
    params: Dict[str, Any],
    ids: np.ndarray,
    steps: int = 300,
    batch_size: int = 8,
    seq_len: int = 64,
    lr: float = 3e-3,
    seed: int = 0,
    log_every: int = 100,
) -> Dict[str, Any]:
    """Fit ``params`` on next-token prediction over ``ids``.

    Parameters are trained in float32 and returned in their original
    dtypes. ``params`` must be the dense (unquantized) pytree from
    ``init_params`` — gradients flow through the dense QuantLinear path.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from .transformer import forward

    def to_f32(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.float32)
        return x

    orig_leaves, treedef = jax.tree_util.tree_flatten(params)
    params32 = jax.tree_util.tree_unflatten(
        treedef, [to_f32(leaf) for leaf in orig_leaves])

    # cosine decay to ~0 settles the model into a sharp optimum — needed so
    # quantization perturbations reliably hurt (a model mid-descent can be
    # helped by 4-bit noise, which makes PPL deltas noise-signed)
    opt = optax.adamw(optax.cosine_decay_schedule(lr, max(steps, 1)))
    opt_state = opt.init(params32)

    ids = np.asarray(ids, np.int32)
    n_starts = len(ids) - seq_len - 1
    if n_starts <= 0:
        raise ValueError(
            f"corpus too short: {len(ids)} tokens for seq_len={seq_len}")
    rng = np.random.default_rng(seed)

    @jax.jit
    def train_step(p, s, batch):
        def loss_fn(p):
            logits, _ = forward(p, spec, batch[:, :-1])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = batch[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    loss = float("nan")
    for i in range(steps):
        starts = rng.integers(0, n_starts, size=batch_size)
        batch = jnp.asarray(
            np.stack([ids[s:s + seq_len + 1] for s in starts]))
        params32, opt_state, loss = train_step(params32, opt_state, batch)
        if log_every and (i % log_every == 0 or i == steps - 1):
            logger.info("fit step %d/%d loss %.4f", i, steps, float(loss))

    # restore original dtypes leaf-for-leaf
    trained_leaves = jax.tree_util.tree_leaves(params32)
    restored = [
        t.astype(o.dtype) if hasattr(o, "dtype") and t.dtype != o.dtype else t
        for t, o in zip(trained_leaves, orig_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)
