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
