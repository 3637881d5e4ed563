"""Measure int8 serving variants on a trained production-parity checkpoint.

For each quantization policy, run the jax detect leg on the eval split and
report accepted-detection counts + AP vs the float leg. Policies:

  full         every calibrated Conv int8 (round-2 behaviour)
  float-head   header output convs ("head") float  <- candidate default
  float-header entire header float (backbone+KFPN int8 only)

Usage:
  python tools/int8_variants.py --work-dir /tmp/prodov
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--input-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-split", default="train")
    args = ap.parse_args()

    import jax.numpy as jnp

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.loader import DataLoader
    from rtm3d_tpu.nn.model import create_model
    from rtm3d_tpu.nn.quant import calibrate_act_scales, quantized_apply, skip_scales
    from tools.ap_parity import (
        _count_accepted, _detect_jax, _score_both, make_config,
    )

    data = os.path.join(args.work_dir, "kitti")
    cfg = make_config(data, args.input_size, args.batch, 1e-3)
    model = create_model(cfg)
    with open(os.path.join(args.work_dir, "jax_final.pkl"), "rb") as f:
        eval_vars = pickle.load(f)

    train_ds = create_dataset(data, cfg, is_training=False, split="train")
    cfg.INPUT_SIZE = tuple(train_ds.img_size)
    loader = DataLoader(
        train_ds, args.batch, shuffle=False, drop_last=False,
        num_shards=1, shard_index=0, pad_final=True,
    )
    calib = []
    for i, b in enumerate(loader):
        if i >= 2:
            break
        calib.append(jnp.asarray(b["image"].astype(np.float32)))
    scales = calibrate_act_scales(model, eval_vars, calib)

    test_ds = create_dataset(data, cfg, is_training=False, split=args.eval_split)
    test_ds.img_size = list(train_ds.img_size)

    policies = {
        "full": scales,
        "float-head": skip_scales(scales, ("/head",)),
        # the residual<0.1 gate consumes v_proj = f(offset_fr_main branch,
        # main_offset branch); keep exactly those float, quantize the rest
        # (incl. the heatmap branch and the dead vertex_offset branch)
        "float-vertex": skip_scales(
            scales,
            ("/head", "detect_header/offset_fr_main/", "detect_header/main_offset/"),
        ),
        "float-header": skip_scales(scales, ("detect_header/",)),
    }
    res_float = os.path.join(args.work_dir, "results_jax")
    report = {}
    for name, sc in policies.items():
        out = os.path.join(args.work_dir, f"results_int8_{name}")
        _detect_jax(
            cfg, model, eval_vars, test_ds, args.batch, out,
            apply_fn=quantized_apply(model, sc),
        )
        n = _count_accepted(out)
        aps = _score_both(data, res_float, out, split=args.eval_split)
        cells = {
            k: v for k, v in aps.items()
            if abs(v["jax"]) > 0 or abs(v["torch"]) > 0
        }
        worst = max((abs(v["delta"]) for v in cells.values()), default=0.0)
        print(f"{name}: accepted {n}, worst |dAP| vs float {worst}")
        report[name] = {"accepted": n, "worst_abs_dap": worst, "ap": cells}
    with open(os.path.join(args.work_dir, "int8_variants.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("float leg accepted:", _count_accepted(res_float))


if __name__ == "__main__":
    main()
