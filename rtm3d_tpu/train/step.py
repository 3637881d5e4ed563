"""The three jitted programs: train_step, eval_loss_step, detect_step.

These replace the reference's epoch-loop bodies (train.py:85-117 forward/loss/
solver.step; train.py:61-81 eval loss; detect.py:47-88 inference+decode) with
single compiled XLA programs. Target building runs on device inside the step
(see rtm3d_tpu/data/targets.py). Under a sharded-batch ``jax.jit`` the
gradient all-reduce over the ``data`` mesh axis is inserted by XLA —
the TPU-native replacement for DDP/NCCL (train_multi_gpu.py:57-72) and for
``reduce_tensor`` loss averaging (utils/torch_utils.py:206-210).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rtm3d_tpu.config import Config
from rtm3d_tpu.data.targets import build_targets
from rtm3d_tpu.decode.peaks import decode_detections
from rtm3d_tpu.decode.solve3d import solve_bbox3d
from rtm3d_tpu.losses.rtm3d_loss import rtm3d_loss
from rtm3d_tpu.train.state import TrainState


def _feat_hw(cfg: Config) -> Tuple[int, int]:
    w, h = int(cfg.INPUT_SIZE[0]), int(cfg.INPUT_SIZE[1])
    d = int(cfg.MODEL.DOWN_SAMPLE)
    return h // d, w // d


def normalize_images(imgs: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """On-device normalisation for uint8 batches: the host ships raw bytes
    (4x less H2D traffic than fp32) and XLA fuses /255-mean/std into the
    first conv. Float inputs pass through (already normalised by the host
    pipeline, reference Normalize transforms.py:110-120)."""
    if imgs.dtype == jnp.uint8:
        mean = jnp.asarray(cfg.DATASET.MEAN, jnp.float32)
        std = jnp.asarray(cfg.DATASET.STD, jnp.float32)
        return (imgs.astype(jnp.float32) / 255.0 - mean) / std
    return imgs


def prepare_images(batch, cfg: Config, image_cache=None) -> jnp.ndarray:
    """Device-side input stage: either the MXU matmul-warp ('raw' mode ships
    the original uint8 frame + affine scalars; ops/device_warp.py) or plain
    uint8 normalisation. Photometric augmentation (brightness/contrast +
    gaussian noise) also runs on device when the loader ships its params —
    generating full-res noise in numpy costs ~20 ms/img on a weak host.

    With TPU.DEVICE_DATA_CACHE the batch carries ``image_idx`` instead of
    pixels: frames are gathered from the HBM-resident dataset cache, so the
    host->device path per step is labels + scalars only (~100 KB vs ~22 MB
    at KITTI scale — the per-step H2D was the input-pipeline bottleneck)."""
    if "image_idx" in batch:
        assert image_cache is not None, "batch has image_idx but no image_cache"
        imgs = jnp.take(image_cache, batch["image_idx"], axis=0)
    else:
        imgs = batch["image"]
    if "warp" in batch:
        from rtm3d_tpu.ops.device_warp import device_warp

        if "photo" in batch:
            ph = batch["photo"].astype(jnp.float32)  # (B, 4): alpha, beta, std, seed
            x = imgs.astype(jnp.float32)
            x = x * ph[:, 0, None, None, None] + ph[:, 1, None, None, None] * 255.0
            key = jax.random.PRNGKey(0)
            # fold in the batch lane as well as the host seed so two samples
            # that drew the same 31-bit randint still get distinct noise
            lanes = jnp.arange(ph.shape[0], dtype=jnp.int32)
            keys = jax.vmap(
                lambda s, i: jax.random.fold_in(
                    jax.random.fold_in(key, s.astype(jnp.int32)), i
                )
            )(ph[:, 3], lanes)
            noise = jax.vmap(
                lambda k, sd: jax.random.normal(k, imgs.shape[1:]) * sd
            )(keys, ph[:, 2])
            imgs = jnp.clip(x + noise, 0, 255)
        w, h = int(cfg.INPUT_SIZE[0]), int(cfg.INPUT_SIZE[1])
        return device_warp(
            imgs,
            batch["warp"],
            (h, w),
            cfg.DATASET.MEAN,
            cfg.DATASET.STD,
            border=batch.get("border"),
        )
    return normalize_images(imgs, cfg)


def _loss_from_batch(model, cfg: Config, params, batch_stats, batch, train: bool,
                     image_cache=None, sample_mask=None):
    feat_hw = _feat_hw(cfg)
    num_classes = len(cfg.DATASET.OBJs)
    imgs = prepare_images(batch, cfg, image_cache)
    targets = build_targets(
        batch["labels"],
        feat_hw,
        num_classes,
        down_ratio=float(cfg.MODEL.DOWN_SAMPLE),
        gaussian_gen_type=cfg.DATASET.GAUSSIAN_GEN_TYPE,
        bbox_area_max=cfg.DATASET.BBOX_AREA_MAX,
        bbox_area_min=cfg.DATASET.BBOX_AREA_MIN,
    )

    compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
        )

    def fwd(p):
        # Mixed precision: master params stay fp32 in the optimizer; the
        # forward (and backward) run in COMPUTE_DTYPE. The cast is linear, so
        # grads flow back to the fp32 masters; batch stats are re-promoted.
        bs = batch_stats
        if compute_dtype != jnp.float32:
            p = _cast(p, compute_dtype)
            bs = _cast(bs, compute_dtype)
        if train:
            logits, mut = model.apply(
                {"params": p, "batch_stats": bs},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            new_stats = mut["batch_stats"]
            if compute_dtype != jnp.float32:
                new_stats = jax.tree_util.tree_map(
                    lambda new, old: new.astype(old.dtype), new_stats, batch_stats
                )
            return logits, new_stats
        logits = model.apply({"params": p, "batch_stats": bs}, imgs, train=False)
        return logits, batch_stats

    if train and cfg.TPU.REMAT:
        fwd = jax.checkpoint(fwd)

    def loss_fn(p):
        logits, new_stats = fwd(p)
        loss, aux = rtm3d_loss(
            logits,
            targets,
            w_mkf=cfg.TRAINING.W_MKF,
            w_vfm=cfg.TRAINING.W_VFM,
            w_m_off=cfg.TRAINING.W_M_OFF,
            w_v_off=cfg.TRAINING.W_V_OFF,
            focal_alpha=cfg.MODEL.FOCAL_LOSS_ALPHA,
            focal_beta=cfg.MODEL.FOCAL_LOSS_BEDA,
            sample_mask=sample_mask,
        )
        return loss, (aux, new_stats)

    return loss_fn


def make_train_step(model, cfg: Config, tx) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    batch: {'image': (B,H,W,3) float32, 'labels': {cls,bbox,dim,alpha,ry,loc,
    K,mask,noise_mask} padded to MAX_OBJS}.
    metrics: {'loss', 'loss_items'[MKF,VFM,M_OFF,V_OFF,total], 'num_targets'}.
    """

    def train_step(state: TrainState, batch, image_cache=None):
        loss_fn = _loss_from_batch(
            model, cfg, state.params, state.batch_stats, batch, train=True,
            image_cache=image_cache,
        )
        (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            # decay with exponential ramp (reference ModelEMA, module.py:94)
            decay = float(cfg.TRAINING.get("EMA_DECAY", 0.9999))
            d = decay * (1.0 - jnp.exp(-(state.step + 1).astype(jnp.float32) / 2000.0))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + (1.0 - d) * p, new_ema, new_params
            )
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            ema_params=new_ema,
        )
        metrics = {
            "loss": loss,
            "loss_items": aux,
            "num_targets": batch["labels"]["mask"].sum(),
        }
        return new_state, metrics

    donate = (0,) if cfg.TPU.DONATE else ()
    return jax.jit(train_step, donate_argnums=donate)


def make_eval_loss_step(model, cfg: Config) -> Callable:
    """eval-mode loss (reference test_epoch, train.py:61-81) — without the
    reference's quirk of paying the decode cost and discarding it.

    Evaluates the EMA shadow when one is tracked (the reference's
    CheckPointer prefers the EMA model, check_point.py:122) — whether
    ``ema_params`` is None is part of the pytree structure, so the branch is
    resolved at trace time.

    Padded-tail exclusion: when the batch carries ``sample_valid`` (the
    loader's per-sample validity, False on wrap-around pad rows — sharded on
    the batch axis so it stays correct under multi-process assembly) or the
    caller passes ``num_valid`` (a traced ``np.int32`` scalar), the loss is
    computed as if the batch held only its valid samples."""

    def eval_step(state: TrainState, batch, image_cache=None, num_valid=None):
        p = state.ema_params if state.ema_params is not None else state.params
        sample_mask = batch.get("sample_valid")
        if num_valid is not None:
            B = batch["labels"]["mask"].shape[0]
            sample_mask = jnp.arange(B) < num_valid
        loss_fn = _loss_from_batch(
            model, cfg, p, state.batch_stats, batch, train=False,
            image_cache=image_cache, sample_mask=sample_mask,
        )
        loss, (aux, _) = loss_fn(p)
        return {"loss": loss, "loss_items": aux}

    return jax.jit(eval_step)


def attach_3d(det, K, cfg: Config):
    """Complete a decoded detection dict with the 3D recovery: batched LM
    solve from the regressed vertices + residual acceptance
    (reference optim_decode_bbox3d, model_utils.py:264-312)."""
    dim_ref = jnp.asarray(cfg.DETECTOR.dim_ref, jnp.float32)
    ref_loc = jnp.asarray(cfg.DETECTOR.REF_LOC, jnp.float32)
    topk = det["v_proj"].shape[1]
    Kb = jnp.broadcast_to(K[:, None, :, :], K.shape[:1] + (topk, 3, 3))
    sol = solve_bbox3d(
        det["v_proj"], det["cls"], Kb, dim_ref, ref_loc,
        iters=int(cfg.DETECTOR.SOLVER_ITERS),
        prior_weight=float(cfg.DETECTOR.get("DIM_PRIOR_WEIGHT", 0.0)),
    )
    det = dict(det)
    det.update(sol)
    det["accepted"] = det["valid"] & (
        sol["cost"] < float(cfg.DETECTOR.RESIDUAL_THRESH)
    )
    return det


def make_detect_step(
    model, cfg: Config, with_3d: bool = True, apply_fn: Callable | None = None
) -> Callable:
    """detect_step(variables, images, K) -> detections dict.

    K: (B, 3, 3) per-image intrinsics (already transformed to the padded
    input frame). Returns fixed (B, TOPK) arrays; `accepted` combines the
    score threshold with the 3D solver residual acceptance
    (model_utils.py:298).

    apply_fn: optional replacement for ``model.apply`` with the same
    signature — e.g. ``nn.quant.quantized_apply`` for int8 serving.
    """
    topk = int(cfg.DETECTOR.TOPK_CANDIDATES)
    thresh = float(cfg.DETECTOR.SCORE_THRESH)

    compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)

    def detect_step(variables, images, K, warp=None, border=None):
        if warp is not None:
            from rtm3d_tpu.ops.device_warp import device_warp

            w, h = int(cfg.INPUT_SIZE[0]), int(cfg.INPUT_SIZE[1])
            images = device_warp(
                images, warp, (h, w), cfg.DATASET.MEAN, cfg.DATASET.STD, border=border
            )
        else:
            images = normalize_images(images, cfg)
        if compute_dtype != jnp.float32:
            # true mixed-precision inference: params cast to the compute dtype
            # so XLA runs the convs on the MXU in bf16 (fp32 flax params would
            # otherwise re-promote the whole graph); decode/solver stay fp32.
            variables = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if getattr(p, "dtype", None) == jnp.float32
                else p,
                variables,
            )
        logits = (apply_fn or model.apply)(variables, images, train=False)
        det = decode_detections(
            logits,
            score_thresh=thresh,
            topk=topk,
            down_sample=float(cfg.MODEL.DOWN_SAMPLE),
        )
        if with_3d:
            det = attach_3d(det, K, cfg)
        else:
            det["accepted"] = det["valid"]
        return det

    return jax.jit(detect_step)


def make_detect_step_from_export(exported, cfg: Config) -> Callable:
    """Detect step built around a deserialized ``jax.export`` artifact
    (cli/export.py): the model forward (optionally + heatmap decode) comes
    from the artifact's StableHLO — its MLIR is spliced into this program
    without re-tracing or re-lowering the flax model, which is the dominant
    per-process jit start cost (measured 4-90 s at KITTI scale). Only the
    thin pre/post stages (normalise/warp, 3D solve) trace here.

    The artifact's contract: input is the preprocessed float32 frame batch
    (B, H, W, 3); output is either the 4-logit tuple or, for a
    ``--with-decode`` export, the decoded detection dict.
    """
    thresh = float(cfg.DETECTOR.SCORE_THRESH)
    topk = int(cfg.DETECTOR.TOPK_CANDIDATES)

    def detect_step(images, K, warp=None, border=None):
        if warp is not None:
            from rtm3d_tpu.ops.device_warp import device_warp

            w, h = int(cfg.INPUT_SIZE[0]), int(cfg.INPUT_SIZE[1])
            images = device_warp(
                images, warp, (h, w), cfg.DATASET.MEAN, cfg.DATASET.STD,
                border=border,
            )
        else:
            images = normalize_images(images, cfg)
        out = exported.call(images.astype(jnp.float32))
        if isinstance(out, dict):  # exported --with-decode
            det = out
        else:  # logits-only artifact: decode here
            det = decode_detections(
                out,
                score_thresh=thresh,
                topk=topk,
                down_sample=float(cfg.MODEL.DOWN_SAMPLE),
            )
        return attach_3d(det, K, cfg)

    return jax.jit(detect_step)
