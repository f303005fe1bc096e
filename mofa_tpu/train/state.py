"""Train state: optax AdamW + EMA + path-regex parameter freezing.

Replaces the reference's torch AdamW + `requires_grad_(False)` freezing
(Training/train_stage1.py:835-843; stage-2 freeze of `flow_encoder` and
`controlnet_cond_embedding`, Training/train_stage2.py:949-956) and its
EMAModel (train_stage1.py:753-755) with a pure-pytree formulation:
frozen leaves get `optax.set_to_zero`, EMA is a decayed tree average.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def freeze_mask(params: Any, frozen_patterns: tuple[str, ...]) -> Any:
    """True = trainable. Pattern is re.search on the '/'-joined path."""

    def label(path_tuple, _leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        return not any(re.search(p, path) for p in frozen_patterns)

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(lr: float = 2e-5, weight_decay: float = 1e-2,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   frozen_patterns: tuple[str, ...] = (),
                   params: Any = None,
                   memory_lean: bool = False) -> optax.GradientTransformation:
    """AdamW matching train_stage1.sh defaults (lr 2e-5, wd 1e-2, clip 1.0).

    memory_lean: factored second moments (adafactor) — the TPU stand-in for
    stage 2's bitsandbytes 8-bit Adam (train_stage2.sh:24), cutting
    optimizer-state HBM instead of quantizing it."""
    if memory_lean:
        inner = optax.adafactor(lr, multiply_by_parameter_scale=False,
                                weight_decay_rate=weight_decay)
    else:
        inner = optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                            weight_decay=weight_decay)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        inner,
    )
    if frozen_patterns:
        assert params is not None, "need params to build the freeze mask"
        mask = freeze_mask(params, frozen_patterns)
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, mask)
    return tx


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any               # trainable controlnet params
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema: bool = False):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   ema_params=jax.tree_util.tree_map(jnp.copy, params)
                   if ema else None)

    def apply_gradients(self, grads, tx: optax.GradientTransformation,
                        ema_decay: float = 0.9999) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema, new_params)
        return TrainState(self.step + 1, new_params, new_opt, new_ema)


jax.tree_util.register_dataclass(
    TrainState, data_fields=["step", "params", "opt_state", "ema_params"],
    meta_fields=[])

# stage-2 freeze set (Training/train_stage2.py:949-956)
STAGE2_FROZEN = (r"flow_encoder", r"controlnet_cond_embedding")
