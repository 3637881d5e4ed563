"""Post-training int8 quantization for the serving path (TPU-native extra;
no reference counterpart — the reference's promised export_onnx.py, its one
deployment artifact, does not even exist in its tree).

All ``layers.Conv`` instances (backbone, KFPN 1x1s, header branches — ~98%
of model FLOPs) execute as int8 x int8 -> int32 on the MXU, which runs at
~2x the bf16 peak on v5e. Scheme:

- weights: symmetric per-output-channel scales (absmax / 127), quantized
  on the fly from the fp32 master params — checkpoints are untouched;
- activations: symmetric scales from a calibration sweep over
  representative batches (run once, save as JSON). Clip selection:
  absmax (default), outlier-robust percentile (p99.9/p99.99), or
  MSE-optimal grid search; selected convs can calibrate PER-INPUT-CHANNEL
  (scales folded into the weights — exact for the conv sum);
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
import numpy as np
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


def _match_fns(patterns: Iterable[str]):
    """Path matching shared by skip_scales and per-channel selection:
    trailing "/" = path prefix (whole submodule), else path suffix."""
    prefixes = tuple(p for p in patterns if p.endswith("/"))
    suffixes = tuple(p for p in patterns if not p.endswith("/"))

    def hit(k: str) -> bool:
        return (bool(suffixes) and k.endswith(suffixes)) or (
            bool(prefixes) and k.startswith(prefixes)
        )

    return hit


def skip_scales(
    scales: Dict[str, float], skip: Iterable[str]
) -> Dict[str, float]:
    """Zero the calibration scale of convs matched by ``skip`` — those convs
    then take the float fallback in ``quantized_apply``. Matching rules are
    ``_match_fns``: a pattern ending in "/" matches path PREFIXES (whole
    submodule, e.g. a header branch); anything else matches path SUFFIXES
    (e.g. "/head", the output convs).

    Default serving policy (cfg.TPU.INT8_SKIP) keeps the header output
    convs in float: their int8 error is amplified by the 3D solver's
    residual<RESIDUAL_THRESH acceptance gate (r5 sweep on a trained
    checkpoint, docs/experiments/int8_calib_sweep_r5.json: full-int8
    accepts 10/107 float-accepted 3D detections under absmax calibration,
    float-head 25; MSE clips lift those to 29/41; the best variant of the
    whole sweep reaches 44 — see PARITY.md)."""
    hit = _match_fns(skip)
    return {k: (0.0 if hit(k) else v) for k, v in scales.items()}


def calibrate_act_scales(
    model,
    variables,
    batches: Iterable[jnp.ndarray],
    method: str = "absmax",
    per_channel: Iterable[str] = (),
    mse_grid: int = 16,
) -> Dict[str, object]:
    """Activation calibration over ``batches`` (arrays shaped like model
    input, already normalised the way the detect path feeds the model).
    Returns the per-Conv clip value the quantizer divides by 127.

    ``method`` selects the clipping scheme (the absmax default is the
    crudest — a single outlier wrecks the whole tensor's resolution):

    - ``absmax``  — max |input| per Conv (max across batches);
    - ``p99.9`` / ``p99.99`` — that percentile of |input| (max across
      batches): outlier-robust clipping;
    - ``mse`` — per Conv, the clip c (from a ``mse_grid``-point grid up to
      the global absmax) minimising the int8 quantization error
      E[(x - dequant(quant_c(x)))^2] accumulated over all batches
      (two passes: absmax first, then the MSE accumulation).

    ``per_channel`` lists path patterns (skip_scales matching rules) whose
    convs calibrate PER-INPUT-CHANNEL: the returned value is a list of
    per-channel clips and the quantizer folds them into the weights
    (x_q[c] = x[c]/s[c], w_eff[c] = w[c]*s[c] — exact for the conv sum),
    giving heterogeneous-magnitude inputs (e.g. the vertex-regression
    branch's fused features) full int8 resolution per channel. Per-channel
    convs use absmax or percentile statistics; under ``method='mse'`` they
    fall back to per-channel absmax (a per-channel MSE search is a grid per
    channel — unwarranted while the tensor-level search exists).

    The sweep runs as ONE jitted program per batch shape: the interceptor
    collects per-Conv statistics *tracers* during tracing and the program
    returns only them — XLA dead-code-eliminates the model outputs and
    fuses the reductions into the forward."""
    model = _unfused(model)
    batches = list(batches)
    is_pc = _match_fns(per_channel)
    q = {"p99.9": 99.9, "p99.99": 99.99}.get(method)
    if method not in ("absmax", "mse") and q is None:
        raise ValueError(f"unknown calibration method {method!r}")

    def batch_stats(b):
        traced: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if isinstance(m, Conv) and context.method_name == "__call__":
                k = _key(m)
                x = jnp.abs(args[0].astype(jnp.float32))
                if is_pc(k):
                    flat = x.reshape(-1, x.shape[-1])
                    v = (
                        jnp.quantile(flat, q / 100.0, axis=0)
                        if (q is not None and method != "mse")
                        else jnp.max(flat, axis=0)
                    )
                else:
                    v = (
                        jnp.quantile(x.ravel(), q / 100.0)
                        if q is not None
                        else jnp.max(x)
                    )
                traced[k] = jnp.maximum(traced[k], v) if k in traced else v
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, b)
        return traced

    fn = jax.jit(batch_stats)
    stats: Dict[str, np.ndarray] = {}
    for b in batches:
        for k, v in jax.device_get(fn(b)).items():
            v = np.asarray(v, np.float64)
            stats[k] = np.maximum(stats.get(k, 0.0), v)

    if method == "mse":
        # pass 2: accumulate quantization MSE at grid clips <= global absmax
        amax = {k: float(v) for k, v in stats.items() if np.ndim(v) == 0}

        def batch_mse(b):
            traced: Dict[str, jnp.ndarray] = {}

            def interceptor(next_fun, args, kwargs, context):
                m = context.module
                if isinstance(m, Conv) and context.method_name == "__call__":
                    k = _key(m)
                    if k in amax and amax[k] > 0.0:
                        x = args[0].astype(jnp.float32)
                        errs = []
                        for i in range(mse_grid):
                            s = amax[k] * (i + 1) / mse_grid / 127.0
                            xq = jnp.clip(jnp.round(x / s), -127, 127) * s
                            errs.append(jnp.mean((x - xq) ** 2))
                        e = jnp.stack(errs)
                        traced[k] = traced[k] + e if k in traced else e
                return next_fun(*args, **kwargs)

            with nn.intercept_methods(interceptor):
                model.apply(variables, b)
            return traced

        fn2 = jax.jit(batch_mse)
        mse: Dict[str, np.ndarray] = {}
        for b in batches:
            for k, v in jax.device_get(fn2(b)).items():
                mse[k] = mse.get(k, 0.0) + np.asarray(v, np.float64)
        for k, e in mse.items():
            stats[k] = amax[k] * (int(np.argmin(e)) + 1) / mse_grid

    return {
        k: (float(v) if np.ndim(v) == 0 else [float(x) for x in v])
        for k, v in stats.items()
    }


def save_act_scales(path: str, scales: Dict[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)


def load_act_scales(path: str) -> Dict[str, object]:
    with open(path) as f:
        return {
            k: ([float(x) for x in v] if isinstance(v, list) else float(v))
            for k, v in json.load(f).items()
        }


def _quantized_conv(m: Conv, x, s_act):
    """int8 twin of layers.Conv.__call__ on the same params.

    ``s_act`` is either a scalar clip (per-tensor activation scale) or a
    per-input-channel clip vector: x_q[c] = x[c]/s_x[c] with the channel
    scales FOLDED into the weights (w_eff[c] = w[c]*s_x[c]) — exact for the
    conv sum, so only the two int8 roundings differ from float."""
    params = m.variables["params"]["conv"]
    w = params["kernel"].astype(jnp.float32)
    k = m.kernel_size
    pad = m.padding if m.padding is not None else (k - 1) * m.dilation // 2

    if np.ndim(s_act) == 0:
        s_x = max(float(s_act) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / s_w), -127, 127)
        out_scale = s_w * s_x  # (cout,)
    else:
        s_act = np.asarray(s_act, np.float32)  # (cin,)
        # a channel all-zero across the calibration batches (ReLU-dead
        # there) has clip 0; quantizing with it would zero that channel's
        # real-input contribution entirely (its folded weights round to 0).
        # Use the tensor-level max clip for such channels instead — coarse
        # resolution, but the contribution is preserved. (All-zero vectors
        # never reach here: quantized_apply's max(s)>0 gate keeps those
        # convs float.)
        if (s_act <= 0.0).any():
            s_act = np.where(s_act <= 0.0, s_act.max(), s_act)
        s_x = np.maximum(s_act / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
        w_eff = w * jnp.asarray(s_x)[None, None, :, None]
        s_w = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w_eff / s_w), -127, 127)
        out_scale = s_w  # s_x already folded into the weights
    y = jax.lax.conv_general_dilated(
        xq.astype(jnp.int8),
        wq.astype(jnp.int8),
        (m.stride, m.stride),
        [(pad, pad), (pad, pad)],
        rhs_dilation=(m.dilation, m.dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * out_scale
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
            if np.ndim(s) > 0:  # per-channel clip vector
                if max(s) > 0.0:
                    return _quantized_conv(m, args[0], s)
            elif s > 0.0:
                return _quantized_conv(m, args[0], s)
        return next_fun(*args, **kwargs)

    def fn(variables, images, train: bool = False):
        del train  # serving path only; every model's __call__ defaults eval
        with nn.intercept_methods(interceptor):
            return model.apply(variables, images)

    return fn
