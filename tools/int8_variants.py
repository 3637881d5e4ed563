"""Measure int8 serving variants on a trained production-parity checkpoint.

Two sweep axes (VERDICT r4: the 2D-only verdict must not rest on the
crudest calibration scheme alone):

- skip POLICY — which convs stay float:
    full         every calibrated Conv int8 (round-2 behaviour)
    float-head   header output convs ("head") float  <- serving default
    float-vertex head + the offset_fr_main/main_offset branches float
    float-header entire header float (backbone+KFPN int8 only)
- CALIBRATION of the activation clip (nn/quant.calibrate_act_scales):
    absmax | p99.9 | p99.99 | mse, optionally with PER-INPUT-CHANNEL
    scales on the vertex-regression branches (folded into the weights).

For each variant, run the jax detect leg on the eval split and report
accepted-3D counts + AP vs the float leg. The decision artifact is
``int8_variants.json`` in the work dir (promote to docs/experiments/).

Usage:
  python tools/int8_variants.py --work-dir /tmp/prodq5            # policies, absmax
  python tools/int8_variants.py --work-dir /tmp/prodq5 --calib-sweep
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 3D residual gate consumes v_proj = f(offset_fr_main, main_offset)
VERTEX_BRANCHES = (
    "detect_header/offset_fr_main/",
    "detect_header/main_offset/",
)


def policy_scales(scales, policy):
    from rtm3d_tpu.nn.quant import skip_scales

    if policy == "full":
        return scales
    if policy == "float-head":
        return skip_scales(scales, ("/head",))
    if policy == "float-vertex":
        return skip_scales(scales, ("/head",) + VERTEX_BRANCHES)
    if policy == "float-header":
        return skip_scales(scales, ("detect_header/",))
    raise ValueError(policy)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--input-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-split", default="train")
    ap.add_argument(
        "--calib-sweep", action="store_true",
        help="sweep calibration methods (absmax/p99.9/p99.99/mse, each with "
        "and without per-channel vertex-branch scales) x {full, float-head} "
        "instead of the default absmax-only policy sweep",
    )
    ap.add_argument("--calib-batches", type=int, default=2)
    ap.add_argument("--backbone", default="RESNET-18")
    args = ap.parse_args()

    import jax.numpy as jnp

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.loader import DataLoader
    from rtm3d_tpu.nn.model import create_model
    from rtm3d_tpu.nn.quant import calibrate_act_scales, quantized_apply
    from tools.ap_parity import (
        _count_accepted, _detect_jax, _score_both, make_config,
    )

    data = os.path.join(args.work_dir, "kitti")
    cfg = make_config(data, args.input_size, args.batch, 1e-3, args.backbone)
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
        if i >= args.calib_batches:
            break
        calib.append(jnp.asarray(b["image"].astype(np.float32)))

    test_ds = create_dataset(data, cfg, is_training=False, split=args.eval_split)
    test_ds.img_size = list(train_ds.img_size)

    if args.calib_sweep:
        variants = []
        for method in ("absmax", "p99.9", "p99.99", "mse"):
            for pc in (False, True):
                for policy in ("full", "float-head"):
                    variants.append((method, pc, policy))
        # the round-4 best policy under the upgraded calibrations too.
        # per-channel x float-vertex is NOT swept: the policy zeroes exactly
        # the branches per_channel targets, so pc=True would silently
        # measure the pc=False configuration (caught by r5 review)
        variants += [("p99.9", False, "float-vertex"), ("mse", False, "float-vertex")]
    else:
        variants = [("absmax", False, p)
                    for p in ("full", "float-head", "float-vertex", "float-header")]

    scale_cache = {}
    res_float = os.path.join(args.work_dir, "results_jax")
    n_float = _count_accepted(res_float)
    report = {"float_accepted": n_float, "eval_split": args.eval_split}
    for method, pc, policy in variants:
        ck = (method, pc)
        if ck not in scale_cache:
            scale_cache[ck] = calibrate_act_scales(
                model, eval_vars, calib, method=method,
                per_channel=VERTEX_BRANCHES if pc else (),
            )
        sc = policy_scales(scale_cache[ck], policy)
        name = f"{method}{'_pc' if pc else ''}_{policy}"
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
        print(f"{name}: accepted {n}/{n_float}, worst |dAP| vs float {worst}",
              flush=True)
        report[name] = {
            "method": method, "per_channel_vertex": pc, "policy": policy,
            "accepted": n, "accepted_frac": round(n / max(n_float, 1), 3),
            "worst_abs_dap": worst, "ap": cells,
        }
    with open(os.path.join(args.work_dir, "int8_variants.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("float leg accepted:", n_float)


if __name__ == "__main__":
    main()
