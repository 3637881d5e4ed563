"""Training-throughput benchmark: flagship DLA-34 train step.

Two numbers, printed as JSON lines:
  * step-only img/s — the jitted program alone (forward+backward+Adamax,
    on-device targets), re-feeding one resident batch; the device ceiling.
  * end-to-end img/s (--e2e) — synthetic-KITTI loader -> shard -> step with
    host/device overlap, i.e. what an epoch actually sustains. Reported so
    input starvation can never hide behind the step-only number
    (VERDICT round 1: training ran at ~half the chip capability unnoticed).

The e2e pipeline uses the TPU-first input path: decoded-image RAM cache
(DATASET.CACHE_IMAGES) + device-warp raw mode (TPU.DEVICE_WARP: the host
ships raw uint8 frames + 6 affine scalars; resampling/photometric/normalise
run on the MXU, ops/device_warp.py).

Usage: python tools/bench_train.py [--dtype float32|bfloat16] [--batch N]
       [--e2e] [--workers N] [--iters N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_batch(rng, B, H, W, N):
    import jax.numpy as jnp

    x1 = rng.rand(B, N) * (W - 100)
    y1 = rng.rand(B, N) * (H - 60)
    return {
        "image": jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.uint8)),
        "labels": {
            "cls": jnp.asarray(rng.randint(0, 3, (B, N)), jnp.int32),
            "bbox": jnp.asarray(np.stack([x1, y1, x1 + 90, y1 + 55], -1), jnp.float32),
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


def bench_step_only(args, cfg, state, step):
    import jax

    rng = np.random.RandomState(0)
    W, H = cfg.INPUT_SIZE
    batch = synth_batch(rng, args.batch, H, W, cfg.DATASET.MAX_OBJS)
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profile trace -> {args.profile}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"train_step_images_per_sec_dla34_b{args.batch}_1280x384_{args.dtype}",
                "value": round(args.batch / dt, 2),
                "unit": "images/sec",
                "ms_per_step": round(dt * 1e3, 1),
            }
        )
    )
    return state


def bench_e2e(args, cfg, state, step):
    """Loader -> shard -> step, overlapped: epoch throughput."""
    import jax

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.loader import DataLoader, prefetch_to_device
    from rtm3d_tpu.data.synthetic import generate_kitti
    from rtm3d_tpu.parallel.mesh import DEVICE_BATCH_KEYS

    root = args.data_path or "/tmp/rtm3d_bench_kitti"
    if not os.path.exists(os.path.join(root, "ImageSets", "train.txt")):
        print("generating KITTI-scale synthetic dataset ...", file=sys.stderr)
        # 372x1242 -> rect-sized (1280, 384): the reference's KITTI train shape
        generate_kitti(root, num_train=48, num_test=0, img_hw=(372, 1242), max_objs=12)

    dcfg = cfg.clone()
    dcfg.DATASET.PATH = root
    dcfg.INPUT_SIZE = (1280, 1280)
    dcfg.IS_RECT = True
    dcfg.TPU.DEVICE_WARP = True
    dcfg.TPU.DEVICE_DATA_CACHE = not args.no_device_cache
    dcfg.DATASET.CACHE_IMAGES = True
    ds = create_dataset(root, dcfg, is_training=True, split="train")
    assert tuple(ds.img_size) == tuple(cfg.INPUT_SIZE), (ds.img_size, cfg.INPUT_SIZE)
    image_cache = None
    if ds.device_cache:
        arr = ds.canvas_array()
        image_cache = jax.device_put(arr)
        print(f"device data cache: {arr.nbytes / 1e9:.2f} GB in HBM", file=sys.stderr)
    loader = DataLoader(
        ds, args.batch, shuffle=True, seed=0, num_workers=args.workers,
        prefetch=4, num_shards=1, shard_index=0,
    )

    def put(batch):
        return jax.device_put(
            {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch}
        )

    def run_epochs(n):
        steps = 0
        nonlocal state
        for ep in range(n):
            loader.set_epoch(ep)
            # background-thread H2D (prefetch_to_device) overlaps transfer
            # with the device step, like the CLI loop
            for sb in prefetch_to_device(iter(loader), put):
                state, m = step(state, sb, image_cache)
                steps += 1
        jax.block_until_ready(m["loss"])
        return steps

    run_epochs(1)  # warm: compiles the raw-mode program, fills caches
    epochs = max(1, int(np.ceil(args.iters * args.batch / len(ds))))
    t0 = time.perf_counter()
    steps = run_epochs(epochs)
    dt = time.perf_counter() - t0
    imgs = steps * args.batch
    print(
        json.dumps(
            {
                "metric": f"train_e2e_images_per_sec_dla34_b{args.batch}_1280x384_{args.dtype}",
                "value": round(imgs / dt, 2),
                "unit": "images/sec",
                "ms_per_step": round(dt / steps * 1e3, 1),
                "workers": args.workers,
            }
        )
    )
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--e2e", action="store_true", help="also run the loader->device epoch bench")
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--data-path", default="")
    ap.add_argument(
        "--no-device-cache", action="store_true",
        help="disable the HBM dataset cache in the e2e bench",
    )
    ap.add_argument(
        "--profile", default="",
        help="capture an XLA profiler trace of the timed steps to this dir",
    )
    ap.add_argument(
        "--s2d-block", type=int, default=0,
        help="force the stem s2d block (2/4); 0 = auto",
    )
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
    cfg.TPU.S2D_BLOCK = args.s2d_block

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    step = make_train_step(model, cfg, tx)

    state = bench_step_only(args, cfg, state, step)
    if args.e2e:
        bench_e2e(args, cfg, state, step)


if __name__ == "__main__":
    main()
