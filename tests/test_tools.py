import numpy as np
import yaml


def test_stats_cli(tmp_path):
    from rtm3d_tpu.cli.stats import main
    from rtm3d_tpu.data.synthetic import generate_kitti

    root = generate_kitti(str(tmp_path / "kitti"), num_train=4, num_test=1, img_hw=(96, 128))
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump({"INPUT_SIZE": "(128, 128)", "DATASET": {"PATH": root, "MAX_OBJS": 8}}, f)
    vis = str(tmp_path / "tvis")
    out = main(
        ["--model-config", cfg_path, "--split", "train",
         "--vis-targets", vis, "--vis-count", "2"]
    )
    assert 0 < out["BBOX_AREA_MAX"] <= 1.5
    assert out["BBOX_AREA_MIN"] <= out["BBOX_AREA_MAX"]
    assert len(out["VERTEX_OFFSET_INFER"]) == 2
    import os

    pngs = [f for f in os.listdir(vis) if f.endswith("_targets.png")]
    assert len(pngs) == 2  # heatmap overlays (ref tests/test_dataset_reader.py)


def test_model_info():
    import jax

    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.utils.model_info import model_info

    cfg = default_config()
    cfg.MODEL.BACKBONE = "RESNET-18"
    cfg.MODEL.KFNs = ["layer1", "layer2", "layer3", "layer4"]
    cfg.INPUT_SIZE = (64, 64)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    info = model_info(model, variables, (64, 64))
    assert info["params_M"] > 1
    assert info["gflops_per_image"] > 0.1


def test_birdview_drawing():
    from rtm3d_tpu.utils.visual import draw_birdview

    img = draw_birdview([(2.0, 20.0, 1.6, 3.9, 0.5)], gts=[(0.0, 15.0, 1.6, 3.9, 0.0)])
    assert img.shape == (400, 400, 3)
    assert (img != 30).any()  # something was drawn


def test_timer_and_memory_stats():
    import jax.numpy as jnp

    from rtm3d_tpu.utils.profiling import Timer, device_memory_stats

    t = Timer()
    with t.section("a", sync=jnp.zeros(4)):
        pass
    assert "a" in t.summary()
    stats = device_memory_stats()
    assert len(stats) >= 1
