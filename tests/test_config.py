import os

import pytest

from rtm3d_tpu.config import default_config, load_config

REF_YAML = "/root/reference/models/configs/rtm3d_dla34_kitti.yaml"


def test_defaults_mirror_reference_keys():
    cfg = default_config()
    assert cfg.MODEL.BACKBONE == "DLA-34"
    assert cfg.TRAINING.W_M_OFF == 0.5
    assert cfg.DATASET.GAUSSIAN_GEN_TYPE == "dynamic_radius"
    assert tuple(cfg.SOLVER.STEPS) == (20000, 50000)
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 123
    assert cfg.SOLVER.BASE_LR != 123  # clone is deep


def test_merge_from_list_types():
    cfg = default_config()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.003", "MODEL.BACKBONE", "RESNET-18",
                         "SOLVER.STEPS", "(1, 2)"])
    assert cfg.SOLVER.BASE_LR == 0.003
    assert cfg.MODEL.BACKBONE == "RESNET-18"
    assert tuple(cfg.SOLVER.STEPS) == (1, 2)


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference tree absent")
def test_reference_yaml_loads_unchanged():
    """The reference's own YAML configs must load without edits."""
    cfg = load_config(REF_YAML)
    assert tuple(cfg.INPUT_SIZE) == (1280, 1280)
    assert cfg.BATCH_SIZE == 16
    assert cfg.SOLVER.BASE_LR == 0.001
    assert tuple(cfg.SOLVER.STEPS) == (80000, 100000)
    assert cfg.DETECTOR.SCORE_THRESH == 0.4
    assert len(cfg.DETECTOR.dim_ref) == 3
    assert cfg.DETECTOR.dim_ref[0][0] == pytest.approx(1.52607842)
    # defaults not overridden by the YAML survive
    assert cfg.MODEL.DOWN_SAMPLE == 4.0


def test_tpu_tuned_yaml_loads():
    """The shipped TPU recipe config resolves every key against defaults."""
    import os

    from rtm3d_tpu.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "rtm3d_dla34_kitti_tpu.yaml"))
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"
    assert cfg.TPU.DEVICE_WARP and cfg.TPU.DEVICE_DATA_CACHE and cfg.TPU.S2D_STEM
    assert cfg.BATCH_SIZE == 32 and cfg.num_workers == 4
    assert cfg.TRAINING.EMA is True
