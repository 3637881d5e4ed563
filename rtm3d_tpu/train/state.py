"""Train state pytree: params + batch stats + optimizer state + bookkeeping."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    ema_params: Any = None  # optional EMA shadow (module.py:71-119 parity)

    @classmethod
    def create(cls, variables, tx, with_ema: bool = False):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros([], jnp.int32),
            ema_params=jax.tree_util.tree_map(jnp.array, params) if with_ema else None,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def eval_variables(self):
        """EMA weights when tracked (the reference's CheckPointer prefers the
        EMA model when the solver has one, check_point.py:122)."""
        p = self.ema_params if self.ema_params is not None else self.params
        return {"params": p, "batch_stats": self.batch_stats}
