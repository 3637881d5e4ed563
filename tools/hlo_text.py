"""Dump the optimized HLO of the flagship train step to a local file.

``--xla_dump_to`` is useless on tunneled runtimes (compilation happens
server-side, the dump lands there), but the PJRT client can fetch the
optimized module of a compiled executable, so trace fusion names
(tools/trace_times.py) can be mapped to real ops locally.

Usage: python tools/hlo_text.py OUT.txt [--dtype bfloat16] [--batch 32]
"""

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_train import synth_batch  # noqa: E402  (tools/ sibling)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax

    from rtm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.optim import build_optimizer
    from rtm3d_tpu.train.state import TrainState
    from rtm3d_tpu.train.step import make_train_step

    B, H, W, N = args.batch, 384, 1280, 32
    cfg = default_config()
    cfg.MODEL.BACKBONE = "DLA-34"
    cfg.INPUT_SIZE = (W, H)
    cfg.DATASET.MAX_OBJS = N
    cfg.TPU.COMPUTE_DTYPE = args.dtype

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    step = make_train_step(model, cfg, tx)
    batch = synth_batch(np.random.RandomState(0), B, H, W, N)
    compiled = step.lower(state, batch).compile()
    with open(args.out, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
