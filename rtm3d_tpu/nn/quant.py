"""Post-training int8 quantization for the serving path (TPU-native extra;
no reference counterpart — the reference's promised export_onnx.py, its one
deployment artifact, does not even exist in its tree).

All ``layers.Conv`` instances (backbone, KFPN 1x1s, header branches — ~98%
of model FLOPs) execute as int8 x int8 -> int32 on the MXU, which runs at
~2x the bf16 peak on v5e. Scheme:

- weights: symmetric per-output-channel scales (absmax / 127), quantized
  on the fly from the fp32 master params — checkpoints are untouched;
- activations: symmetric per-tensor scales from an absmax calibration sweep
  over representative batches (run once, save as JSON);
- BN / ReLU / UpSample (transposed conv) / softmax fusion / decode / 3D
  solver stay in float: they are <2% of FLOPs and carry the numerics that
  matter (running stats, sub-pixel offsets).

Implementation: ``flax.linen.intercept_methods`` swaps Conv.__call__ for the
quantized kernel at apply time — zero changes to the model modules, and the
same ``variables`` serve fp32, bf16 and int8 paths.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtm3d_tpu.nn.layers import Conv


def _key(module: nn.Module) -> str:
    return "/".join(module.path)


def _unfused(model):
    """The fused header computes its four first convs as one manual wide conv
    (header.py), which method-interception cannot see; the int8 path needs
    every conv to run through ``Conv.__call__``, so serve from an unfused
    clone (exact same params/outputs — the fusion is a pure compute-graph
    rearrangement)."""
    if getattr(model, "fuse_header_first", False):
        return model.clone(fuse_header_first=False)
    return model


def skip_scales(
    scales: Dict[str, float], skip: Iterable[str]
) -> Dict[str, float]:
    """Zero the calibration scale of convs matched by ``skip`` — those convs
    then take the float fallback in ``quantized_apply``. A pattern ending in
    "/" matches path PREFIXES (whole submodule, e.g. a header branch);
    anything else matches path SUFFIXES (e.g. "/head", the output convs).

    Default serving policy (cfg.TPU.INT8_SKIP) keeps the vertex-regression
    branch and the output convs in float: their int8 error is amplified by
    the 3D solver's residual<RESIDUAL_THRESH acceptance gate (measured on a
    trained checkpoint — full-int8 accepts 11/108 detections, float-head 28,
    float vertex branch restores parity; see PARITY.md)."""
    prefixes = tuple(p for p in skip if p.endswith("/"))
    suffixes = tuple(p for p in skip if not p.endswith("/"))

    def hit(k: str) -> bool:
        return (bool(suffixes) and k.endswith(suffixes)) or (
            bool(prefixes) and k.startswith(prefixes)
        )

    return {k: (0.0 if hit(k) else v) for k, v in scales.items()}


def calibrate_act_scales(
    model, variables, batches: Iterable[jnp.ndarray]
) -> Dict[str, float]:
    """Absmax activation calibration over ``batches`` (arrays shaped like
    model input, already normalised the way the detect path feeds the
    model): the max |input| per Conv.

    The sweep runs as ONE jitted program per batch shape: the interceptor
    collects per-Conv absmax *tracers* during tracing and the program
    returns them alongside nothing else — XLA dead-code-eliminates the
    model outputs and fuses the reductions into the forward. (The previous
    eager sweep executed the whole model op-by-op: ~10 s of single-core CPU
    per batch at test scale, minutes on the serving CLI.)"""
    model = _unfused(model)
    stats: Dict[str, float] = {}

    def batch_maxes(b):
        traced: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if isinstance(m, Conv) and context.method_name == "__call__":
                k = _key(m)
                a = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                traced[k] = jnp.maximum(traced[k], a) if k in traced else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, b)
        return traced

    fn = jax.jit(batch_maxes)
    for b in batches:
        for k, v in jax.device_get(fn(b)).items():
            stats[k] = max(stats.get(k, 0.0), float(v))
    return stats


def save_act_scales(path: str, scales: Dict[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)


def load_act_scales(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}


def _quantized_conv(m: Conv, x, s_act: float):
    """int8 twin of layers.Conv.__call__ on the same params."""
    params = m.variables["params"]["conv"]
    w = params["kernel"].astype(jnp.float32)
    k = m.kernel_size
    pad = m.padding if m.padding is not None else (k - 1) * m.dilation // 2

    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)  # (cout,)
    s_x = max(s_act / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        (m.stride, m.stride),
        [(pad, pad), (pad, pad)],
        rhs_dilation=(m.dilation, m.dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_w * s_x)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantized_apply(model, act_scales: Dict[str, float]) -> Callable:
    """Returns ``fn(variables, images, train=False)`` — model.apply with
    every calibrated Conv running int8. Scales are plain floats, so the
    returned fn jits cleanly (they are compile-time constants).

    Convs missing from ``act_scales`` (e.g. a config with extra layers added
    after calibration) fall back to the float path.
    """
    model = _unfused(model)

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, Conv) and context.method_name == "__call__":
            s = act_scales.get(_key(m), 0.0)
            if s > 0.0:
                return _quantized_conv(m, args[0], s)
        return next_fun(*args, **kwargs)

    def fn(variables, images, train: bool = False):
        del train  # serving path only; every model's __call__ defaults eval
        with nn.intercept_methods(interceptor):
            return model.apply(variables, images)

    return fn
