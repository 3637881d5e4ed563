"""Device mesh + sharding utilities — the TPU-native distributed backend.

Replaces the reference's NCCL/DDP machinery (train_multi_gpu.py:57-72,
model_factory.py:50-76, torch_utils.py:206-210) with the JAX single-controller
model: one ``jax.sharding.Mesh`` over all chips, batch sharded on the ``data``
axis, parameters replicated. Under ``jax.jit`` XLA inserts the gradient
``psum`` over ICI; across hosts the same code runs after
``jax.distributed.initialize()`` (no rendezvous URL, no process groups, no
explicit collectives).

An optional ``spatial`` mesh axis shards the image height: XLA partitions the
convolutions spatially with automatic halo exchange, which is how very large
input resolutions (cfg.INPUT_SIZE is 1280x1280 in the reference YAMLs) fit a
small per-chip HBM — a capability with no reference counterpart.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtm3d_tpu.config import Config


def create_mesh(cfg: Config | None = None, devices=None, axes=None, shape=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    axes = tuple(axes if axes is not None else (cfg.TPU.MESH_AXES if cfg else ("data",)))
    shape = list(shape if shape is not None else (cfg.TPU.MESH_SHAPE if cfg else (-1,)))
    n = len(devices)
    fixed = int(np.prod([s for s in shape if s != -1])) if shape else 1
    shape = [n // fixed if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def create_mesh_for_batch(cfg: Config, batch_size: int) -> Mesh:
    """Mesh over the largest device count whose data axis divides the batch.
    (The reference instead divides BATCH_SIZE by ngpus and errors on
    mismatch, model_factory.py:61-62.)

    Multi-process: trimming must keep the per-process device count UNIFORM —
    ``make_array_from_process_local_data`` requires every process's local
    rows to match its addressable shard of the mesh, and a prefix-trim of
    ``jax.devices()`` can drop devices from only some processes (the same
    hazard class the r4 advisor flagged in warmup_collectives). So under
    multiple processes the trim unit is one device PER PROCESS, selecting
    each process's first k local devices."""
    devices = jax.devices()
    nproc = jax.process_count()
    axes = tuple(cfg.TPU.MESH_AXES)
    if nproc > 1:
        # each process must contribute local rows, so the global batch must
        # split across processes before any device trim can help (same
        # contract local_batch_size enforces on the train path)
        assert batch_size % nproc == 0, (
            f"global batch {batch_size} not divisible by "
            f"{nproc} processes — no data mesh can shard it"
        )
        k = len(devices) // nproc  # devices per process (uniform by JAX)
        while k > 1 and batch_size % (k * nproc) != 0:
            k -= 1
        if k * nproc == len(devices):
            if "spatial" in axes:
                return create_mesh(cfg, devices=devices)
            return create_mesh(cfg=None, devices=devices, axes=("data",),
                               shape=(len(devices),))
        taken: dict = {}
        picked = []
        for d in devices:
            if taken.get(d.process_index, 0) < k:
                taken[d.process_index] = taken.get(d.process_index, 0) + 1
                picked.append(d)
        return create_mesh(
            cfg=None, devices=picked, axes=("data",), shape=(len(picked),)
        )
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if "spatial" in axes and n == len(devices):
        return create_mesh(cfg, devices=devices)
    return create_mesh(cfg=None, devices=devices[:n], axes=("data",), shape=(n,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Images + labels sharded on batch; optionally height on 'spatial'."""
    axes = mesh.axis_names
    spatial = "spatial" if "spatial" in axes else None
    return {
        "image": NamedSharding(mesh, P("data", spatial)),
        "labels": NamedSharding(mesh, P("data")),
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding: NamedSharding):
    """Place a host-local batch array onto the mesh. Multi-process: each
    process holds its local_batch_size slice and the global array is
    assembled with ``make_array_from_process_local_data`` (the batch axis is
    the outermost mesh axis, spanning processes uniformly) — so the global
    batch scales with process count and no loaded rows are discarded
    (reference scales BATCH_SIZE/ngpus the same way, model_factory.py:61-62)."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    out = dict(batch)
    if "image" in batch:  # absent in device-data-cache mode (image_idx instead)
        out["image"] = _put(batch["image"], sh["image"])
    out["labels"] = jax.tree_util.tree_map(
        lambda x: _put(x, sh["labels"]), batch["labels"]
    )
    # auxiliary per-sample arrays (e.g. 'warp', 'border') shard on batch
    for key, val in batch.items():
        if key in ("image", "labels", "path", "shape"):
            continue
        if hasattr(val, "shape"):
            out[key] = _put(val, sh["labels"])
    return out


# arrays the jitted steps consume; host-only keys (path, shape, num_valid)
# stay on the host side of the pipeline
DEVICE_BATCH_KEYS = (
    "image", "image_idx", "labels", "warp", "border", "photo", "sample_valid",
)


def device_batch(mesh: Mesh, batch):
    """Select the jit-consumed arrays of a loader batch and shard them —
    includes the device-warp raw-mode keys (warp/border/photo) so
    TPU.DEVICE_WARP works through the CLI loop."""
    return shard_batch(mesh, {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch})


def shard_detect_inputs(mesh: Mesh, images, K, warp=None, border=None):
    """Shard a detect batch over the ``data`` axis (multi-chip data-parallel
    serving — the inference analogue of the reference's DDP, which has no
    multi-GPU inference path at all: detect.py iterates images one by one).
    Returns the tuple of device arrays for ``detect_step``."""
    sh = NamedSharding(mesh, P("data"))
    out = [_put(images, sh), _put(K, sh)]
    for extra in (warp, border):
        out.append(_put(extra, sh) if extra is not None else None)
    return tuple(out)


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def warmup_collectives(mesh: Mesh):
    """Run one tiny all-reduce over the full mesh and block on it.

    Multi-process only. Two jobs: (a) establish the cross-process collective
    context (Gloo on CPU; its rendezvous key-exchange times out at a fixed
    30 s) BEFORE the multi-minute train-step compile, whose duration can
    skew between processes by more than that under host load; (b) act as a
    startup barrier so subsequent per-process work begins aligned. No-op
    single-process."""
    if jax.process_count() <= 1:
        return
    # one row per device over a FULL-device 1-D mesh (not the caller's mesh:
    # create_mesh_for_batch may trim to a device subset, and then this
    # process's local rows would not match its addressable shards of the
    # trimmed mesh — advisor r4). The Gloo/collective context being
    # established is per process set, not per mesh, so the full-device
    # warmup covers any sub-mesh the training step later uses.
    warm_mesh = Mesh(np.asarray(jax.devices()), ("warm",))
    local = np.ones((jax.local_device_count(),), np.float32)
    ones = _put(local, NamedSharding(warm_mesh, P("warm")))

    @jax.jit
    def _sum(x):
        return x.sum()

    jax.block_until_ready(_sum(ones))
    # also establish the multihost_utils Gloo contexts (allgather/broadcast
    # shapes orbax's save-entry consistency checks use, and the
    # sync_global_devices barrier) while the processes are still aligned —
    # their first-use rendezvous carries the same fixed 30 s deadline
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.array(0, np.int32))
    multihost_utils.broadcast_one_to_all(np.zeros((32,), np.uint8))
    multihost_utils.sync_global_devices("rtm3d_warmup")


def sync_processes(name: str):
    """Cross-process barrier (no-op single-process): aligns every process at
    ``name`` so a following multi-step collective protocol (e.g. an orbax
    collective save) never begins with >30 s of skew — Gloo context
    rendezvous inside it would hit its fixed deadline."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def is_master() -> bool:
    """Reference is_master_node (train_multi_gpu.py:71-72)."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int, mesh: Optional[Mesh] = None) -> int:
    """Per-host share of the global batch (replaces BATCH_SIZE/ngpus division,
    model_factory.py:61-62)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    return global_batch // n_proc
