"""int8 post-training quantization (nn/quant.py): correctness and API."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.nn.layers import Conv
from rtm3d_tpu.nn.quant import (
    calibrate_act_scales,
    load_act_scales,
    quantized_apply,
    save_act_scales,
)


def test_quantized_conv_close_to_float(rng):
    m = Conv(8, 3)
    x = jnp.asarray(rng.randn(2, 8, 10, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)

    scales = calibrate_act_scales(m, v, [x])
    assert list(scales) == [""] and scales[""] > 0  # top-level module path
    got = quantized_apply(m, scales)(v, x)
    # absmax-symmetric int8: error bounded by ~1/127 of each operand's range
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.03 * scale, (err, scale)


def test_quantized_model_logits_and_jit(rng, base_prog):
    # reuses the session-scoped compiled base program's model+variables
    # (same ResNet-18 @64x64 config) — init_model alone costs seconds
    model, variables = base_prog["model"], base_prog["variables"]
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    scales = calibrate_act_scales(model, variables, [x])
    # every layers.Conv got a scale (ResNet convs + KFPN 1x1s + header)
    assert len(scales) > 20
    fn = quantized_apply(model, scales)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    got = jax.jit(lambda v, i: fn(v, i))(variables, x)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        rng_ = np.abs(r).max() + 1e-6
        assert np.abs(g - r).max() < 0.15 * rng_, np.abs(g - r).max() / rng_


@pytest.mark.slow  # the int8 logit-error bound runs fast; the full detect
# program variant (decode+solver compile) moves to the slow set
def test_quantized_detect_step(rng):
    """The detect step accepts the quantized apply_fn and produces the same
    top candidates as the float path on a well-separated heatmap."""
    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.step import make_detect_step

    cfg = default_config()
    cfg.MODEL.BACKBONE = "RESNET-18"
    cfg.MODEL.KFNs = ["layer1", "layer2", "layer3", "layer4"]
    cfg.INPUT_SIZE = (64, 64)
    cfg.DETECTOR.TOPK_CANDIDATES = 5
    cfg.DETECTOR.SCORE_THRESH = 0.0
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray((rng.rand(1, 64, 64, 3) * 255).astype(np.uint8))
    K = jnp.asarray(
        np.array([[[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]], np.float32)
    )
    scales = calibrate_act_scales(
        model, variables, [(x.astype(jnp.float32) / 255.0 - 0.5)]
    )
    det_f = make_detect_step(model, cfg, with_3d=False)(variables, x, K)
    det_q = make_detect_step(
        model, cfg, with_3d=False, apply_fn=quantized_apply(model, scales)
    )(variables, x, K)
    # identical output contract; scores in the same range. (Peak *positions*
    # are not compared — a random-weight heatmap is near-flat, so the int8
    # rounding legitimately reorders near-equal peaks; the trained-model
    # closeness guarantee is the logit bound in
    # test_quantized_model_logits_and_jit.)
    for k in det_f:
        assert det_q[k].shape == det_f[k].shape, k
    np.testing.assert_allclose(
        np.asarray(det_q["scores"]).mean(),
        np.asarray(det_f["scores"]).mean(),
        rtol=0.2,
    )


def test_skip_scales_zeroes_suffix_matches():
    from rtm3d_tpu.nn.quant import skip_scales

    scales = {
        "backbone/conv1": 1.5,
        "detect_header/main_kf/head": 0.25,
        "detect_header/offset_fr_main/head": 0.5,
        "detect_header/main_kf/convs/layer0/conv": 2.0,
    }
    out = skip_scales(scales, ("/head",))
    # zeroed scale -> quantized_apply's float fallback for that conv
    assert out["detect_header/main_kf/head"] == 0.0
    assert out["detect_header/offset_fr_main/head"] == 0.0
    assert out["backbone/conv1"] == 1.5
    assert out["detect_header/main_kf/convs/layer0/conv"] == 2.0
    assert skip_scales(scales, ()) == scales
    # trailing "/" = whole-submodule prefix match
    out = skip_scales(scales, ("detect_header/main_kf/",))
    assert out["detect_header/main_kf/head"] == 0.0
    assert out["detect_header/main_kf/convs/layer0/conv"] == 0.0
    assert out["detect_header/offset_fr_main/head"] == 0.5
    assert out["backbone/conv1"] == 1.5


def test_scales_roundtrip(tmp_path):
    scales = {"backbone/conv1": 1.5, "detect_header/main_kf/head": 0.25}
    p = os.path.join(tmp_path, "scales.json")
    save_act_scales(p, scales)
    assert load_act_scales(p) == scales
    # per-channel clip vectors round-trip as lists
    scales_pc = {"backbone/conv1": [0.5, 1.5, 2.0], "x/head": 0.25}
    save_act_scales(p, scales_pc)
    assert load_act_scales(p) == scales_pc


def test_percentile_calibration_clips_outliers(rng):
    """p99.9 calibration must ignore a single huge outlier that wrecks the
    absmax scale, making the quantized output strictly closer to float on
    the bulk of the tensor."""
    m = Conv(8, 3)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    x[0, 0, 0, 0] = 500.0  # one outlier, bulk is ~N(0,1)
    x = jnp.asarray(x)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))

    s_abs = calibrate_act_scales(m, v, [x], method="absmax")
    s_pct = calibrate_act_scales(m, v, [x], method="p99.9")
    assert 0 < s_pct[""] < 0.2 * s_abs[""]
    got_abs = np.asarray(quantized_apply(m, s_abs)(v, x))
    got_pct = np.asarray(quantized_apply(m, s_pct)(v, x))
    # compare on the bulk (mask the output rows the outlier touches)
    bulk = np.ones(ref.shape, bool)
    bulk[0, :3, :3, :] = False
    err_abs = np.abs(got_abs - ref)[bulk].mean()
    err_pct = np.abs(got_pct - ref)[bulk].mean()
    assert err_pct < 0.25 * err_abs, (err_pct, err_abs)


def test_mse_calibration_between_absmax_and_aggressive_clip(rng):
    """MSE-optimal clip: <= absmax, > 0, and its quantization MSE is no
    worse than the absmax clip's by construction."""
    m = Conv(8, 3)
    x = rng.standard_t(df=3, size=(2, 16, 16, 4)).astype(np.float32)  # heavy tails
    x = jnp.asarray(x)
    v = m.init(jax.random.PRNGKey(0), x)
    s_abs = calibrate_act_scales(m, v, [x], method="absmax")
    s_mse = calibrate_act_scales(m, v, [x], method="mse")
    assert 0.0 < s_mse[""] <= s_abs[""]

    def qmse(c):
        s = c / 127.0
        xq = np.clip(np.round(np.asarray(x) / s), -127, 127) * s
        return ((np.asarray(x) - xq) ** 2).mean()

    assert qmse(s_mse[""]) <= qmse(s_abs[""]) + 1e-12


def test_per_channel_activation_scales(rng):
    """Per-input-channel calibration: heterogeneous channel magnitudes get
    per-channel clips, and the folded-weight quantized conv is closer to
    float than the per-tensor path on the small channels."""
    m = Conv(8, 3)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    x[..., 0] *= 100.0  # channel 0 dominates the tensor absmax
    x = jnp.asarray(x)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))

    s_pt = calibrate_act_scales(m, v, [x])
    s_pc = calibrate_act_scales(m, v, [x], per_channel=("",))
    assert isinstance(s_pc[""], list) and len(s_pc[""]) == 4
    assert s_pc[""][0] > 10 * max(s_pc[""][1:])
    got_pt = np.asarray(quantized_apply(m, s_pt)(v, x))
    got_pc = np.asarray(quantized_apply(m, s_pc)(v, x))
    err_pt = np.abs(got_pt - ref).mean()
    err_pc = np.abs(got_pc - ref).mean()
    # folding moves part of the channel imbalance into the weight scales, so
    # the win is real but not the full 100x — assert strictly better with
    # margin rather than an arbitrary large factor
    assert err_pc < 0.8 * err_pt, (err_pc, err_pt)
    # jits cleanly with per-channel scales baked in
    got_jit = np.asarray(
        jax.jit(lambda v, i: quantized_apply(m, s_pc)(v, i))(v, x)
    )
    np.testing.assert_allclose(got_jit, got_pc, rtol=1e-5, atol=1e-5)


def test_per_channel_dead_calib_channel_keeps_contribution(rng):
    """A channel that is all-zero during calibration (clip 0) but active on
    real inputs must not have its contribution silently zeroed — the
    quantizer substitutes the tensor-level max clip for zero-clip channels
    (r5 review finding)."""
    m = Conv(8, 3)
    x_calib = rng.randn(2, 16, 16, 4).astype(np.float32)
    x_calib[..., 2] = 0.0  # channel 2 silent in calibration
    x_calib = jnp.asarray(x_calib)
    v = m.init(jax.random.PRNGKey(0), x_calib)
    s_pc = calibrate_act_scales(m, v, [x_calib], per_channel=("",))
    assert s_pc[""][2] == 0.0  # calibration honestly records the dead clip

    # serving input where ONLY channel 2 carries signal
    x_serve = np.zeros((1, 16, 16, 4), np.float32)
    x_serve[..., 2] = rng.randn(1, 16, 16).astype(np.float32)
    x_serve = jnp.asarray(x_serve)
    ref = np.asarray(m.apply(v, x_serve))
    got = np.asarray(quantized_apply(m, s_pc)(v, x_serve))
    bias = np.asarray(m.apply(v, jnp.zeros_like(x_serve)))
    # the channel's contribution survives (coarse resolution is fine; total
    # loss of the channel would leave got == bias)
    assert np.abs(got - bias).max() > 0.5 * np.abs(ref - bias).max()
    assert np.abs(got - ref).mean() < 0.5 * np.abs(ref - bias).mean()
