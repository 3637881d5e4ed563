"""Training-throughput benchmark: flagship DLA-34 train step.

Full jitted train step — on-device targets (Pallas splat), forward+backward,
Adamax update — batch 16 at 1280x384 (the reference's KITTI training shape,
rtm3d_dla34_kitti.yaml). Prints one JSON line (not the driver bench; see
bench.py for the headline detect metric).

Usage: python tools/bench_train.py [--dtype float32|bfloat16] [--batch N]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    rng = np.random.RandomState(0)
    x1 = rng.rand(B, N) * (W - 100)
    y1 = rng.rand(B, N) * (H - 60)
    batch = {
        "image": jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.uint8)),
        "labels": {
            "cls": jnp.asarray(rng.randint(0, 3, (B, N)), jnp.int32),
            "bbox": jnp.asarray(
                np.stack([x1, y1, x1 + 90, y1 + 55], -1), jnp.float32
            ),
            "dim": jnp.asarray(rng.rand(B, N, 3) + 0.8, jnp.float32),
            "alpha": jnp.zeros((B, N), jnp.float32),
            "ry": jnp.asarray(rng.uniform(-3, 3, (B, N)), jnp.float32),
            "loc": jnp.asarray(
                np.stack(
                    [rng.randn(B, N) * 5, rng.randn(B, N) * 0.3 + 1.2, rng.rand(B, N) * 40 + 6],
                    -1,
                ),
                jnp.float32,
            ),
            "K": jnp.asarray(
                np.tile(
                    np.array([721.5, 0, 609.6, 0, 721.5, 172.9, 0, 0, 1], np.float32),
                    (B, N, 1),
                )
            ),
            "mask": jnp.ones((B, N), bool),
            "noise_mask": jnp.zeros((B, N), bool),
        },
    }

    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(
        json.dumps(
            {
                "metric": f"train_images_per_sec_dla34_b{B}_1280x384_{args.dtype}",
                "value": round(B / dt, 2),
                "unit": "images/sec",
                "ms_per_step": round(dt * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
