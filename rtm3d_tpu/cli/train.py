"""Training entry point — the reference train.py / train_multi_gpu.py unified.

Single-host and multi-host use the same code path: the device mesh covers all
local (or, after ``jax.distributed.initialize``, global) chips, the batch is
sharded on the ``data`` axis and XLA reduces gradients over ICI — no separate
DDP script, no process groups, no rendezvous URL (SURVEY.md §2.7).

Usage:
  python -m rtm3d_tpu.cli.train --model-config configs/rtm3d_dla34_kitti.yaml \
      [--data-path PATH] [--num-epochs N] [--set KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import numpy as np

from rtm3d_tpu.config import load_config
from rtm3d_tpu.data.kitti import create_dataset
from rtm3d_tpu.data.loader import DataLoader, prefetch_to_device
from rtm3d_tpu.nn.model import create_model, num_parameters
from rtm3d_tpu.parallel.mesh import (
    create_mesh_for_batch,
    device_batch,
    is_master,
    local_batch_size,
    replicate_state,
)
from rtm3d_tpu.train.checkpoint import (
    CheckPointer,
    import_torch_weights,
    load_torch_state_dict,
)
from rtm3d_tpu.train.optim import build_optimizer
from rtm3d_tpu.train.state import TrainState
from rtm3d_tpu.train.step import make_eval_loss_step, make_train_step

LOSS_NAMES = ["MKF", "VFM", "M_OFF", "V_OFF", "total"]


def parse_args(argv=None):
    p = argparse.ArgumentParser("rtm3d_tpu train")
    p.add_argument("--model-config", type=str, required=True)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--test-interval", type=int, default=1)
    p.add_argument("--seed", type=int, default=20)
    p.add_argument(
        "--multihost",
        action="store_true",
        help="call jax.distributed.initialize() (multi-host SPMD; replaces "
        "the reference's NCCL rendezvous, train_multi_gpu.py:65-66)",
    )
    p.add_argument("--set", nargs="*", default=[], help="dotted config overrides")
    return p.parse_args(argv)


def setup(args):
    """Mirrors train.py:34-58."""
    np.random.seed(args.seed)
    cfg = load_config(args.model_config, args.set)
    if args.data_path:
        cfg.DATASET.PATH = args.data_path
    if args.num_epochs:
        cfg.SOLVER.MAX_EPOCH = args.num_epochs
    if args.batch_size:
        cfg.BATCH_SIZE = args.batch_size
    return cfg


def run_eval_epoch(eval_step, state, loader, mesh, image_cache=None):
    """Equal-weight mean of per-batch losses over TRUE samples only: the
    wrap-around rows `pad_final` adds to the last batch are excluded inside
    the loss via the batch's `sample_valid` row mask (reference test_epoch
    averages true batches, train.py:61-81 — padded duplicates must not bias
    the best-model metric)."""
    losses = []
    for sb in prefetch_to_device(iter(loader), lambda b: device_batch(mesh, b)):
        out = eval_step(state, sb, image_cache)
        losses.append(np.asarray(out["loss_items"]))
    return np.stack(losses).mean(axis=0) if losses else np.zeros(5)


def build_image_cache(ds, mesh):
    """HBM-resident dataset cache (TPU.DEVICE_DATA_CACHE): one-time transfer
    of every raw frame, replicated over the mesh; per-step H2D then carries
    only labels + affine scalars."""
    if not getattr(ds, "device_cache", False):
        return None
    from rtm3d_tpu.parallel.mesh import replicated

    arr = ds.canvas_array()
    rep = replicated(mesh)
    if jax.process_count() > 1:
        cache = jax.make_array_from_process_local_data(rep, arr, arr.shape)
    else:
        cache = jax.device_put(arr, rep)
    if is_master():
        print(f"device data cache: {arr.nbytes / 1e9:.2f} GB resident in HBM")
    return cache


def main(argv=None):
    from rtm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.multihost:
        jax.distributed.initialize()
    cfg = setup(args)

    train_ds = create_dataset(cfg.DATASET.PATH, cfg, is_training=True, split="train")
    test_ds = create_dataset(cfg.DATASET.PATH, cfg, is_training=False, split="test")
    # dataset-derived rect size feeds the jitted programs (dataset_reader.py:55-61);
    # the test split must share the train resolution (its own rect estimate may
    # differ), else the eval jit sees a different static shape
    cfg.INPUT_SIZE = tuple(train_ds.img_size)
    test_ds.img_size = list(train_ds.img_size)

    mesh = create_mesh_for_batch(cfg, cfg.BATCH_SIZE)
    if is_master():
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} over {mesh.devices.size} device(s)")
    # multi-process: establish the collective context + startup barrier
    # before the long train-step compile (Gloo's rendezvous times out at
    # 30 s; first-compile skew between processes can exceed it)
    from rtm3d_tpu.parallel.mesh import warmup_collectives

    warmup_collectives(mesh)
    # each process loads only its local_batch_size slice; shard_batch
    # assembles the global batch (make_array_from_process_local_data), so
    # the global batch scales with process count and every loaded row is used
    local_bs = local_batch_size(cfg.BATCH_SIZE)
    workers = int(cfg.get("num_workers", 0))
    train_loader = DataLoader(
        train_ds, local_bs, shuffle=True, seed=args.seed, num_workers=workers
    )
    test_loader = DataLoader(
        test_ds,
        local_bs,  # full batch even when len(test_ds) < local_bs: pad_final
        # wraps the tail, and a smaller eval batch would break the mesh's
        # data-axis divisibility (e.g. 3 test rows over an 8-device mesh)
        shuffle=False,
        drop_last=False,
        pad_final=True,  # one compiled eval shape; tail padded by wrap-around
        num_workers=workers,
    )

    model = create_model(cfg)
    import jax.numpy as jnp

    w, h = cfg.INPUT_SIZE
    variables = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, h, w, 3)))
    if is_master():
        print(f"model: {cfg.MODEL.BACKBONE}, params: {num_parameters(variables)/1e6:.2f}M, input {w}x{h}")

    # pretrained import (.pt/.pth via suffix matching, check_point.py:14-92)
    mode = str(cfg.TRAINING.CHECKPOINT_MODE).lower()
    ckpt_file = cfg.TRAINING.CHECKPOINT_FILE
    if mode == "pretrained" and ckpt_file and os.path.exists(ckpt_file):
        if ckpt_file.endswith((".pt", ".pth", ".pkl")):
            sd = load_torch_state_dict(ckpt_file)
            variables, report = import_torch_weights(variables, sd)
            if is_master():
                print(f"imported {len(report['loaded'])} tensors from {ckpt_file}; "
                      f"{len(report['missed'])} missed")

    steps_per_epoch = max(len(train_loader), 1)
    tx, schedule = build_optimizer(
        cfg, variables["params"], max_iters=cfg.SOLVER.MAX_EPOCH * steps_per_epoch
    )
    state = replicate_state(
        mesh, TrainState.create(variables, tx, with_ema=bool(cfg.TRAINING.EMA))
    )

    save_dir = os.path.join(cfg.TRAINING.WEIGHTS, cfg.MODEL.BACKBONE)
    checkpointer = CheckPointer(
        save_dir, use_orbax=bool(cfg.TRAINING.get("USE_ORBAX", False))
    )
    start_epoch, min_loss = 0, float("inf")
    if mode == "resume" and checkpointer.has_checkpoint():
        state, meta = checkpointer.load(state, use_latest=True)
        start_epoch = int(meta.get("epoch", -1)) + 1
        min_loss = float(meta.get("min_loss", float("inf")))
        state = replicate_state(mesh, state)
        if is_master():
            print(f"resumed from epoch {start_epoch}, min_loss {min_loss:.4f}")

    train_step = make_train_step(model, cfg, tx)
    eval_step = make_eval_loss_step(model, cfg)
    train_cache = build_image_cache(train_ds, mesh)
    test_cache = build_image_cache(test_ds, mesh)

    tb_writer = None
    if is_master():
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(
                os.path.join(cfg.TRAINING.LOGDIR, cfg.MODEL.BACKBONE)
            )
        except ImportError:
            pass

    for epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        train_loader.set_epoch(epoch)
        mloss = np.zeros(5)
        t_ep = time.time()
        # batches are sharded/transferred by a background thread so H2D
        # overlaps the device step (prefetch_to_device)
        for i, sb in enumerate(
            prefetch_to_device(iter(train_loader), lambda b: device_batch(mesh, b))
        ):
            state, metrics = train_step(state, sb, train_cache)
            items = np.asarray(metrics["loss_items"])
            if not np.isfinite(items[-1]):
                # non-finite loss abort (train.py:97-99)
                print(f"WARNING: non-finite loss {items}, aborting epoch")
                break
            mloss = (mloss * i + items) / (i + 1)
            if is_master():
                step = int(jax.device_get(state.step))
                if tb_writer is not None:
                    for name, v in zip(LOSS_NAMES, items):
                        tb_writer.add_scalar(f"loss/{name}", float(v), step)
                if i % 10 == 0:
                    lr = float(jax.device_get(schedule(step)))
                    print(
                        f"epoch {epoch} it {i}/{steps_per_epoch} "
                        + " ".join(f"{n}={v:.4f}" for n, v in zip(LOSS_NAMES, mloss))
                        + f" lr={lr:.2e} ntgt={int(metrics['num_targets'])}"
                    )

        test_items = mloss
        if (epoch + 1) % args.test_interval == 0 and len(test_loader) > 0:
            test_items = run_eval_epoch(
                eval_step, state, test_loader, mesh, image_cache=test_cache
            )
            if is_master():
                print(
                    f"epoch {epoch} test: "
                    + " ".join(f"{n}={v:.4f}" for n, v in zip(LOSS_NAMES, test_items))
                    + f" ({time.time() - t_ep:.1f}s)"
                )

        # per-epoch checkpoint + best tracking by test loss (train.py:158-162);
        # a non-finite test loss is explicitly excluded from the best-model
        # comparison (NaN would compare False anyway, but be deliberate).
        # msgpack saves are master-only (replicated state; reference
        # train_multi_gpu.py:226-230); orbax saves are COLLECTIVE — every
        # process writes its shards, pointer tagging stays master-only
        # inside the checkpointer. test_items derives from the global
        # (psum-reduced) loss, so the best-model decision and min_loss agree
        # across processes.
        test_total = float(test_items[-1])
        do_save = is_master() or checkpointer.collective
        if do_save:
            checkpointer.save(
                f"model_{epoch:07d}", state, epoch=epoch, min_loss=min_loss
            )
        if math.isfinite(test_total) and test_total < min_loss:
            min_loss = test_total
            if do_save:
                checkpointer.save(
                    "model_best", state, epoch=epoch, min_loss=min_loss
                )
    if tb_writer is not None:
        tb_writer.close()
    return state


if __name__ == "__main__":
    main()
