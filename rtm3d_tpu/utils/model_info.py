"""Model summary: parameter count + compiled FLOP estimate.

Reference: utils/torch_utils.py:118-136 (``model_info`` with optional thop
GFLOPS). Here FLOPs come from XLA's own cost analysis of the lowered
program — exact for the compiled graph, no tracer package needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtm3d_tpu.nn.model import num_parameters


def model_info(model, variables, input_hw, batch: int = 1, verbose: bool = False) -> dict:
    h, w = input_hw
    n_params = num_parameters(variables)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    lowered = jax.jit(fwd).lower(variables, jnp.zeros((batch, h, w, 3), jnp.float32))
    cost = lowered.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    info = {
        "params": n_params,
        "params_M": round(n_params / 1e6, 2),
        "flops": flops,
        "gflops_per_image": round(flops / 1e9 / max(batch, 1), 2),
        "input": f"{batch}x{h}x{w}x3",
    }
    if verbose:
        for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
            name = "/".join(getattr(k, "key", str(k)) for k in path)
            print(f"{name:70s} {tuple(leaf.shape)}")
    return info
