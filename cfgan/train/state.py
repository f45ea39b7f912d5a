"""Train-state pytrees (flax.struct dataclasses, donate-friendly)."""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class NetState:
    """One network: params + auxiliary variable collections
    (batch_stats / spectral_stats) + optimizer state."""

    params: Any
    stats: Any  # dict of extra collections, may be empty
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "NetState":
        variables = dict(variables)
        params = variables.pop("params")
        return cls(params=params, stats=variables, opt_state=tx.init(params))

    def variables(self) -> dict:
        return {"params": self.params, **self.stats}

    def apply_grads(self, tx: optax.GradientTransformation, grads,
                    new_stats=None) -> "NetState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params,
            opt_state=new_opt,
            stats=self.stats if new_stats is None else new_stats,
        )


@struct.dataclass
class GANState:
    g: NetState
    d: NetState
    step: jnp.ndarray  # int32 scalar
    # per-step EMA of the generator params (CounterGANConfig.ema_decay > 0);
    # None when EMA is off — None is an empty pytree node, so the no-EMA
    # state keeps its round-1/2 structure (old mid-run `train_state`
    # checkpoints remain restorable for EMA-less configs)
    g_ema: Any = None


def g_eval_variables(state: "GANState") -> dict:
    """Generator variables for eval/serving: the EMA params when the state
    carries them (CounterGANConfig.ema_decay > 0), the live params
    otherwise.  BN/spectral stats are the live collections — for
    BatchNorm-carrying generators with EMA on, prefer
    `cfgan.train.builders.g_serving_variables`, which recalibrates the
    running stats under the EMA params (pairing EMA params with
    live-params stats mis-normalizes BN and can collapse eval quality;
    see make_bn_recalibrator)."""
    params = state.g_ema if state.g_ema is not None else state.g.params
    return {"params": params, **state.g.stats}


def adam_like_torch(lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
                    weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam/AdamW-equivalent (same bias correction and eps
    placement)."""
    if weight_decay:
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def global_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g**2) for g in leaves))
