"""End-to-end slice: synthetic KITTI -> train CLI -> detect CLI -> AP eval.

This is the SURVEY.md §7 'minimum end-to-end slice' exercised as a test:
config, data, model, loss, solver, checkpoint, decode, 3D recovery, KITTI
writer and AP evaluator all in one pass, CPU-runnable.
"""

import json
import os

import numpy as np
import pytest
import yaml

from rtm3d_tpu.data.synthetic import generate_kitti


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = generate_kitti(
        os.path.join(str(root), "kitti"), num_train=4, num_test=2, img_hw=(96, 128), max_objs=3
    )
    cfg_path = os.path.join(str(root), "cfg.yaml")
    cfg = {
        "INPUT_SIZE": "(128, 128)",
        "IS_RECT": True,
        "BATCH_SIZE": 2,
        "DATASET": {"PATH": data, "MAX_OBJS": 8},
        "MODEL": {
            "BACKBONE": "RESNET-18",
            "KFNs": ["layer1", "layer2", "layer3", "layer4"],
        },
        "TRAINING": {"WEIGHTS": os.path.join(str(root), "weights"), "LOGDIR": os.path.join(str(root), "logs"), "CHECKPOINT_MODE": "start"},
        "SOLVER": {
            "BASE_LR": 0.001,
            "MAX_EPOCH": 1,
            "WARMUP_ITERS": 2,
            "STEPS": "(1000, 2000)",
        },
        "DETECTOR": {"SCORE_THRESH": 0.25, "TOPK_CANDIDATES": 10, "SOLVER_ITERS": 20},
        "TPU": {"DONATE": False},
    }
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    return {"root": str(root), "data": data, "cfg": cfg_path}


@pytest.mark.slow
def test_train_cli_runs_and_checkpoints(workdir):
    from rtm3d_tpu.cli.train import main

    state = main(["--model-config", workdir["cfg"]])
    assert state is not None
    wdir = os.path.join(workdir["root"], "weights", "RESNET-18")
    assert os.path.exists(os.path.join(wdir, "last_checkpoint"))
    assert os.path.exists(os.path.join(wdir, "model_best.msgpack"))


@pytest.mark.slow
def test_detect_and_evaluate_cli(workdir):
    from rtm3d_tpu.cli.evaluate import main as eval_main

    wdir = os.path.join(workdir["root"], "weights", "RESNET-18")
    out_dir = os.path.join(workdir["root"], "results")
    results = eval_main(
        [
            "--model-config", workdir["cfg"],
            "--data-path", workdir["data"],
            "--split", "test",
            "--checkpoint", os.path.join(wdir, "model_best.msgpack"),
            "--out-dir", out_dir,
            "--batch-size", "2",
        ]
    )
    # result files exist for every test image
    with open(os.path.join(workdir["data"], "ImageSets", "test.txt")) as f:
        names = f.read().splitlines()
    for n in names:
        assert os.path.exists(os.path.join(out_dir, f"{n}.txt"))
    # AP keys present (2 epochs on 4 images won't detect anything real)
    assert "Car_3d_moderate" in results


@pytest.mark.slow
def test_train_cli_batch_wider_than_test_split(tmp_path):
    """Batch 8 spreads over the full 8-device (virtual) mesh while the test
    split has only 3 images: the eval loader must keep the full local batch
    (pad_final wrap) — an eval batch of 3 cannot shard over the 8-wide data
    axis and crashed at the first eval before the r5 fix (cli/train.py
    eval-loader sizing)."""
    from rtm3d_tpu.cli.train import main

    data = generate_kitti(
        str(tmp_path / "kitti"), num_train=8, num_test=3, img_hw=(64, 96),
        max_objs=3,
    )
    cfg = {
        "INPUT_SIZE": "(96, 96)",
        "IS_RECT": True,
        "BATCH_SIZE": 8,  # == virtual device count (tests/conftest.py)
        "DATASET": {"PATH": data, "MAX_OBJS": 8},
        "MODEL": {
            "BACKBONE": "RESNET-18",
            "KFNs": ["layer1", "layer2", "layer3", "layer4"],
        },
        "TRAINING": {
            "WEIGHTS": str(tmp_path / "weights"),
            "LOGDIR": str(tmp_path / "logs"),
            "CHECKPOINT_MODE": "start",
        },
        "SOLVER": {
            "BASE_LR": 0.001,
            "MAX_EPOCH": 1,
            "WARMUP_ITERS": 2,
            "STEPS": "(1000, 2000)",
        },
        "TPU": {"DONATE": False},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    import jax

    assert len(jax.devices()) == 8
    state = main(["--model-config", cfg_path])
    assert state is not None  # the epoch's eval ran to completion


@pytest.mark.slow
def test_resume_from_checkpoint(workdir):
    """CHECKPOINT_MODE=resume restores epoch and continues (train.py:137-145,
    without the reference's case-sensitivity bug)."""
    from rtm3d_tpu.cli.train import main

    state = main(
        [
            "--model-config", workdir["cfg"],
            "--num-epochs", "2",
            "--set", "TRAINING.CHECKPOINT_MODE", "resume",
        ]
    )
    # trained 1 epoch before; resume runs exactly 1 more
    assert int(np.asarray(state.step)) >= 2


@pytest.mark.slow
def test_detect_cli_saves_vis_panels(workdir):
    """--save-vis writes the drawn frame, the 3-row gt/pred comparison panel
    (reference detect.py:64-104 stacked display) and the BEV view."""
    import cv2

    from rtm3d_tpu.cli.detect import main as detect_main

    wdir = os.path.join(workdir["root"], "weights", "RESNET-18")
    vis = os.path.join(workdir["root"], "vis")
    detect_main(
        [
            "--model-config", workdir["cfg"],
            "--data-path", workdir["data"],
            "--split", "test",
            "--out-dir", os.path.join(workdir["root"], "results_vis"),
            "--save-vis", vis,
            "--checkpoint", os.path.join(wdir, "model_best.msgpack"),
            "--batch-size", "2",
        ]
    )
    with open(os.path.join(workdir["data"], "ImageSets", "test.txt")) as f:
        names = f.read().splitlines()
    for n in names:
        for suffix in ("", "_panel", "_bev"):
            assert os.path.exists(os.path.join(vis, f"{n}{suffix}.png")), (n, suffix)
    panel = cv2.imread(os.path.join(vis, f"{names[0]}_panel.png"))
    frame = cv2.imread(os.path.join(vis, f"{names[0]}.png"))
    assert panel.shape[0] == frame.shape[0] * 3 // 2  # 3 rows, half-resized
    assert panel.shape[1] == frame.shape[1] // 2


@pytest.mark.slow
def test_detect_cli_with_tpu_recipe_flags(workdir):
    """Detect must serve a config carrying the TPU training recipe flags
    (configs/rtm3d_dla34_kitti_tpu.yaml): TPU.DEVICE_DATA_CACHE is a
    train-only optimisation detect clears (it would otherwise KeyError on
    batch['image']), and --save-vis works in device-warp raw mode by
    reconstructing the preprocessed frame on host."""
    import cv2

    from rtm3d_tpu.cli.detect import main as detect_main

    wdir = os.path.join(workdir["root"], "weights", "RESNET-18")
    out_dir = os.path.join(workdir["root"], "results_tpu_flags")
    vis = os.path.join(workdir["root"], "vis_warp")
    detect_main(
        [
            "--model-config", workdir["cfg"],
            "--data-path", workdir["data"],
            "--split", "test",
            "--out-dir", out_dir,
            "--save-vis", vis,
            "--checkpoint", os.path.join(wdir, "model_best.msgpack"),
            "--batch-size", "2",
            "--set",
            "TPU.DEVICE_WARP", "True",
            "TPU.DEVICE_DATA_CACHE", "True",
            "DATASET.CACHE_IMAGES", "True",
        ]
    )
    with open(os.path.join(workdir["data"], "ImageSets", "test.txt")) as f:
        names = f.read().splitlines()
    for n in names:
        assert os.path.exists(os.path.join(out_dir, f"{n}.txt")), n
        for suffix in ("", "_panel", "_bev"):
            assert os.path.exists(os.path.join(vis, f"{n}{suffix}.png")), (n, suffix)
    # the reconstructed display frame has the preprocessed geometry
    frame = cv2.imread(os.path.join(vis, f"{names[0]}.png"))
    assert frame is not None and frame.shape[:2][::-1] != (0, 0)


@pytest.mark.slow
def test_evaluate_cli_int8(workdir):
    """evaluate --int8 runs the quantized detect path end-to-end and yields
    the full AP table (the fp-vs-int8 comparison workflow)."""
    from rtm3d_tpu.cli.evaluate import main as eval_main

    wdir = os.path.join(workdir["root"], "weights", "RESNET-18")
    out_dir = os.path.join(workdir["root"], "results_int8")
    results = eval_main(
        [
            "--model-config", workdir["cfg"],
            "--data-path", workdir["data"],
            "--split", "test",
            "--checkpoint", os.path.join(wdir, "model_best.msgpack"),
            "--out-dir", out_dir,
            "--batch-size", "2",
            "--int8",
        ]
    )
    assert "Car_3d_moderate" in results


@pytest.mark.slow
def test_detect_cli_int8_is_2d_only_by_default(workdir, capsys):
    """Structural int8 honesty: `detect --int8` serves 2D-only (the residual
    gate keeps ~26% of float 3D detections under int8), prints the notice,
    and runs the default float-consistency gate over the calibration
    batches; --int8-3d-anyway restores 3D output."""
    from rtm3d_tpu.cli.detect import main as detect_main

    wdir = os.path.join(workdir["root"], "weights", "RESNET-18")
    base = [
        "--model-config", workdir["cfg"],
        "--data-path", workdir["data"],
        "--split", "test",
        "--checkpoint", os.path.join(wdir, "model_best.msgpack"),
        "--batch-size", "2",
    ]
    out_2d = os.path.join(workdir["root"], "results_int8_2d")
    detect_main(base + ["--out-dir", out_2d, "--int8"])
    out = capsys.readouterr().out
    assert "serving 2D-only" in out
    assert "int8 gate (float-reference" in out
    with open(os.path.join(workdir["data"], "ImageSets", "test.txt")) as f:
        names = f.read().splitlines()
    for n in names:
        p = os.path.join(out_2d, f"{n}.txt")
        assert os.path.exists(p)
        for line in open(p):
            fields = line.split()
            if fields:  # any emitted row carries the 2D-only placeholders
                assert fields[8] == "-1.00" and fields[14] == "-10.00"
    # the --int8-3d-anyway/--int8-no-gate leg is exercised by
    # test_evaluate_cli_int8 (evaluate passes both and scores the 3D table)
