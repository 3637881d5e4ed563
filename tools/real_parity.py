"""One-command real-data north-star protocol (BASELINE.md).

The literal north star — "AP3D within 0.1 of the reference's pretrained
checkpoint" — needs two artifacts this environment does not have: real
KITTI and the reference weights (`model_best.pt`, Baidu-pan link at
/root/reference/README.md:61-63). This tool is the single command that
executes the full protocol the day both exist, and it is e2e-dry-run
tested on the synthetic tree with a torch-twin checkpoint
(tests/test_tools.py::test_real_parity_dryrun):

  python tools/real_parity.py \
      --data-path /data/kitti --split val \
      --torch-checkpoint /ckpts/model_best.pt \
      --backbone DLA-34 --input-size 1280 --bootstrap 500 \
      --out real_parity_report.json

Protocol, in order:
  1. import the torch checkpoint into the jax model (longest-suffix key
     matching — the reference CheckPointer's own import semantics,
     check_point.py:14-92); hard-fail on any unmatched model tensor;
  2. export the SAME weights to the torch reference twin
     (train/checkpoint.py export_torch_weights) so both stacks serve
     identical parameters;
  3. serve the split through BOTH inference pipelines — jax batched decode
     + Pallas LM vs the reference's per-image decode + scipy L-BFGS-B
     (reference detect.py:47-88 + utils/model_utils.py:264-312) — into
     KITTI result dirs;
  4. score every (class x metric x difficulty) cell at the DEVKIT bars
     (official min-overlaps 0.7/0.5, difficulty heights 40/25/25) on BOTH
     recall grids: R40 (official devkit since 2019-10-08) and R11 (the
     upstream paper's val tables);
  5. percentile-bootstrap 95% CIs over the split's images for the
     jax-torch AP deltas (and the int8 leg when --int8 is given).

The report's "delta" column IS the north-star number: identical weights on
identical pixels, so any AP difference is purely the inference-path
difference between the stacks.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_real_parity(
    data_path: str,
    torch_checkpoint: str,
    split: str = "val",
    backbone: str = "DLA-34",
    input_size: int = 1280,
    batch: int = 8,
    work_dir: str = "/tmp/real_parity",
    score_thresh: float = 0.4,
    topk: int = 100,
    bootstrap: int = 0,
    with_int8: bool = False,
    allow_partial_import: bool = False,
    min_overlap: float | None = None,
    min_height: float | None = None,
    progress=print,
) -> dict:
    import jax
    import torch

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.nn.model import create_model
    from rtm3d_tpu.train.checkpoint import (
        export_torch_weights,
        import_torch_weights,
        load_torch_state_dict,
    )
    from tools.ap_parity import (
        _count_accepted,
        _detect_jax,
        _detect_torch,
        _int8_apply,
        _score_both,
        bootstrap_cis,
        build_torch_twin,
        make_config,
    )

    os.makedirs(work_dir, exist_ok=True)
    cfg = make_config(data_path, input_size, batch, lr=1e-3, backbone=backbone)
    # reference SERVING gates (detault.py DETECTOR defaults), not the
    # overfit-fixture production gates make_config sets for training runs
    cfg.DETECTOR.SCORE_THRESH = float(score_thresh)
    cfg.DETECTOR.TOPK_CANDIDATES = int(topk)
    cfg.DATASET.MAX_OBJS = 32  # real KITTI scenes carry up to ~30 labels

    ds = create_dataset(data_path, cfg, is_training=False, split=split)
    cfg.INPUT_SIZE = tuple(ds.img_size)
    w, h = cfg.INPUT_SIZE
    progress(
        f"real-parity [{backbone}] on {data_path} split {split}: "
        f"{len(ds)} images at {w}x{h}"
    )

    # 1. torch checkpoint -> jax variables (suffix matching)
    import jax.numpy as jnp

    model = create_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    sd = load_torch_state_dict(torch_checkpoint)
    variables, rep = import_torch_weights(variables, sd)
    progress(
        f"imported {len(rep['loaded'])} tensors from {torch_checkpoint}; "
        f"{len(rep['missed'])} missed"
    )
    if rep["missed"] and not allow_partial_import:
        raise SystemExit(
            f"import missed {len(rep['missed'])} model tensors (first: "
            f"{rep['missed'][:5]}); a partial import invalidates the "
            "same-weights claim — pass --allow-partial-import to override"
        )
    eval_vars = jax.device_get(variables)

    # 2. the SAME weights into the torch reference twin
    twin = build_torch_twin(backbone=backbone)
    tsd, trep = export_torch_weights(eval_vars, twin.state_dict())
    bad = [m for m in trep["missed"] if "num_batches_tracked" not in m]
    assert not bad, f"twin export missed {bad[:8]}"
    twin.load_state_dict({k: torch.as_tensor(v) for k, v in tsd.items()})
    twin.eval()
    progress(f"exported {len(trep['exported'])} tensors to the torch twin")

    # 3. both serving legs (+ optional int8)
    res = {
        "jax": os.path.join(work_dir, "results_jax"),
        "torch": os.path.join(work_dir, "results_torch"),
    }
    _detect_jax(cfg, model, eval_vars, ds, batch, res["jax"])
    progress("jax leg done")
    _detect_torch(cfg, twin, ds, batch, res["torch"])
    progress("torch leg done")
    if with_int8:
        res["int8"] = os.path.join(work_dir, "results_int8")
        _detect_jax(
            cfg, model, eval_vars, ds, batch, res["int8"],
            apply_fn=_int8_apply(cfg, model, eval_vars, ds, batch),
        )
        progress("int8 leg done")
    counts = {leg: _count_accepted(d) for leg, d in res.items()}
    progress(f"accepted detections: {counts}")

    # 4. devkit-bar AP on both recall grids
    out = {
        "config": {
            "data_path": data_path, "split": split, "backbone": backbone,
            "input": [w, h], "torch_checkpoint": torch_checkpoint,
            "score_thresh": cfg.DETECTOR.SCORE_THRESH,
            "topk": cfg.DETECTOR.TOPK_CANDIDATES,
            "residual_thresh": float(cfg.DETECTOR.RESIDUAL_THRESH),
            "min_overlap": min_overlap, "min_height": min_height,
            "n_images": len(ds),
        },
        "accepted_counts": counts,
    }
    for rp in (40, 11):
        out[f"ap_r{rp}"] = _score_both(
            data_path, res["jax"], res["torch"], res.get("int8"),
            min_overlap=min_overlap, min_height=min_height, split=split,
            recall_points=rp,
        )
    # the headline cell
    car3d = out["ap_r40"]["Car_3d_moderate"]
    progress(
        f"Car 3D moderate (R40): jax {car3d['jax']} torch {car3d['torch']} "
        f"delta {car3d['delta']}"
    )

    # 5. bootstrap CIs
    if bootstrap:
        out["bootstrap"] = bootstrap_cis(
            data_path, res, n_resamples=bootstrap,
            min_overlap=min_overlap, min_height=min_height, split=split,
        )
    return out


def main(argv=None):
    from rtm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser("real_parity")
    p.add_argument("--data-path", required=True,
                   help="KITTI root: training/{image_2,label_2,calib} + "
                   "ImageSets/<split>.txt")
    p.add_argument("--torch-checkpoint", required=True,
                   help="reference .pt/.pth checkpoint (e.g. model_best.pt)")
    p.add_argument("--split", default="val")
    p.add_argument("--backbone", default="DLA-34",
                   choices=("DLA-34", "RESNET-18"))
    p.add_argument("--input-size", type=int, default=1280)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--work-dir", default="/tmp/real_parity")
    p.add_argument("--score-thresh", type=float, default=0.4)
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--bootstrap", type=int, default=0)
    p.add_argument("--int8", action="store_true",
                   help="also run the int8 serving leg")
    p.add_argument("--allow-partial-import", action="store_true")
    p.add_argument(
        "--min-overlap", type=float, default=None,
        help="override the devkit IoU bars (synthetic dry-runs only; leave "
        "unset for the real protocol)",
    )
    p.add_argument("--min-height", type=float, default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    out = run_real_parity(
        args.data_path, args.torch_checkpoint, split=args.split,
        backbone=args.backbone, input_size=args.input_size, batch=args.batch,
        work_dir=args.work_dir, score_thresh=args.score_thresh,
        topk=args.topk, bootstrap=args.bootstrap, with_int8=args.int8,
        allow_partial_import=args.allow_partial_import,
        min_overlap=args.min_overlap, min_height=args.min_height,
    )
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
