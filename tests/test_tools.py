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


import pytest


@pytest.mark.slow
def test_real_parity_dryrun(tmp_path):
    """E2E dry-run of the one-command real-data north-star protocol
    (tools/real_parity.py, BASELINE.md command block) on the synthetic tree
    with a torch-twin checkpoint: torch .pt import -> dual-pipeline serve ->
    devkit-bar AP on R40 AND R11 -> bootstrap CIs. Asserts the full report
    contract so the harness is known-good the day real KITTI + the
    reference weights exist."""
    import torch

    from rtm3d_tpu.data.synthetic import generate_kitti
    from tools.ap_parity import build_torch_twin
    from tools.real_parity import run_real_parity

    data = generate_kitti(
        str(tmp_path / "kitti"), num_train=6, num_test=4, img_hw=(96, 128),
        max_objs=3,
    )
    twin = build_torch_twin(seed=7, backbone="RESNET-18")
    ckpt = str(tmp_path / "model_best.pt")
    torch.save({"model": twin.state_dict()}, ckpt)

    out = run_real_parity(
        data, ckpt, split="test", backbone="RESNET-18", input_size=128,
        batch=4, work_dir=str(tmp_path / "work"), score_thresh=0.45,
        topk=5, bootstrap=20, min_overlap=0.3, min_height=0.0,
        progress=lambda *a: None,
    )
    # report contract: config, counts, both recall grids, bootstrap
    assert out["config"]["n_images"] == 4
    assert set(out["accepted_counts"]) == {"jax", "torch"}
    for rp in ("ap_r40", "ap_r11"):
        cells = out[rp]
        assert len(cells) == 27  # 3 classes x 3 metrics x 3 difficulties
        for v in cells.values():
            assert {"jax", "torch", "delta"} <= set(v)
    assert out["bootstrap"]["n_images"] == 4
    assert "Car_3d_moderate" in out["bootstrap"]
    # result dirs contain one txt per image on both legs
    import os

    for leg in ("results_jax", "results_torch"):
        assert len(os.listdir(tmp_path / "work" / leg)) == 4


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
