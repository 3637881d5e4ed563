import numpy as np
import yaml


def test_detector_facade(tmp_path, rng):
    from rtm3d_tpu.api import Detector

    cfg = {
        "INPUT_SIZE": "(64, 64)",
        "MODEL": {"BACKBONE": "RESNET-18", "KFNs": ["layer1", "layer2", "layer3", "layer4"]},
        "DETECTOR": {"TOPK_CANDIDATES": 5, "SCORE_THRESH": 0.0, "SOLVER_ITERS": 5,
                     "RESIDUAL_THRESH": 1e9},
    }
    p = str(tmp_path / "cfg.yaml")
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    det = Detector.from_config(p)
    imgs = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    K = np.tile(np.array([[60.0, 0, 32], [0, 60, 32], [0, 0, 1]], np.float32), (2, 1, 1))
    out = det(imgs, K)
    assert out["scores"].shape == (2, 5)
    objs = det.to_objects(out)
    assert len(objs) == 2
    for o in objs[0]:
        assert set(o) >= {"class", "score", "bbox2d", "dim", "loc", "ry"}
