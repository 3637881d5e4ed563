import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml


@pytest.mark.slow
def test_export_roundtrip(tmp_path, rng):
    from rtm3d_tpu.cli.export import load_exported, main

    cfg = {
        "INPUT_SIZE": "(64, 64)",
        "MODEL": {
            "BACKBONE": "RESNET-18",
            "KFNs": ["layer1", "layer2", "layer3", "layer4"],
        },
        "DETECTOR": {"TOPK_CANDIDATES": 5},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = str(tmp_path / "model.stablehlo")
    main(["--model-config", cfg_path, "--output", out, "--with-decode"])
    assert os.path.exists(out)

    exported = load_exported(out)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    det = exported.call(x)
    assert det["scores"].shape == (1, 5)
    assert det["v_proj"].shape == (1, 5, 8, 2)
    assert np.isfinite(np.asarray(det["scores"])).all()


@pytest.mark.slow
def test_detect_cli_from_export_matches_model(tmp_path):
    """export -> detect --from-export must write byte-identical KITTI result
    files to detect-from-model (the artifact bakes the same weights; only
    the trace/lower path differs)."""
    from rtm3d_tpu.cli.detect import main as detect_main
    from rtm3d_tpu.cli.export import main as export_main
    from rtm3d_tpu.data.synthetic import generate_kitti

    data = generate_kitti(
        str(tmp_path / "kitti"), num_train=2, num_test=3, img_hw=(96, 128), max_objs=3
    )
    cfg = {
        "INPUT_SIZE": "(128, 128)",
        "IS_RECT": True,
        "BATCH_SIZE": 3,
        "DATASET": {"PATH": data, "MAX_OBJS": 8},
        "MODEL": {
            "BACKBONE": "RESNET-18",
            "KFNs": ["layer1", "layer2", "layer3", "layer4"],
        },
        "DETECTOR": {"SCORE_THRESH": 0.25, "TOPK_CANDIDATES": 10, "SOLVER_ITERS": 20},
        "TPU": {"DONATE": False},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    # IS_RECT derives the true input size from the data; export needs the
    # same static shape the detect dataset will use
    from rtm3d_tpu.config import load_config
    from rtm3d_tpu.data.kitti import create_dataset

    rcfg = load_config(cfg_path, [])
    ds = create_dataset(data, rcfg, is_training=False, split="test")
    w, h = ds.img_size
    artifact = str(tmp_path / "model.stablehlo")
    export_main([
        "--model-config", cfg_path, "--output", artifact,
        "--with-decode", "--batch-size", "3",
        "--set", "INPUT_SIZE", f"({w}, {h})", "IS_RECT", "False",
    ])

    out_model = str(tmp_path / "res_model")
    out_export = str(tmp_path / "res_export")
    detect_main([
        "--model-config", cfg_path, "--data-path", data, "--split", "test",
        "--out-dir", out_model, "--batch-size", "3",
    ])
    detect_main([
        "--model-config", cfg_path, "--data-path", data, "--split", "test",
        "--out-dir", out_export, "--batch-size", "3",
        "--from-export", artifact,
    ])
    with open(os.path.join(data, "ImageSets", "test.txt")) as f:
        names = f.read().splitlines()
    for n in names:
        with open(os.path.join(out_model, f"{n}.txt")) as f:
            a = f.read()
        with open(os.path.join(out_export, f"{n}.txt")) as f:
            b = f.read()
        assert a == b, n
