"""Same-weights AP at each forward-precision rung of the jax serving path.

On TPU, fp32 convs at JAX's DEFAULT matmul precision run bf16 MXU passes
(~2^-8 relative error — measured <=0.13 px on regressed vertices, enough to
flip residual<0.1 acceptance on near-gate candidates). This tool re-runs the
jax detect leg of a production-parity work dir at:

  highest   true-fp32 forward (6-pass bf16) — isolates PIPELINE divergence
  default   deployed fp32 (single bf16 pass)
  bf16      deployed mixed-precision serving (TPU.COMPUTE_DTYPE=bfloat16)

and scores each against the unchanged torch/scipy reference leg
(results_torch). With identical weights, the 'highest' row is the pure
inference-pipeline ΔAP; lower rungs add the serving precision trade.

Usage:
  python tools/precision_ladder.py --work-dir /tmp/prodov
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
    ap.add_argument("--bootstrap", type=int, default=0)
    args = ap.parse_args()

    import jax

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.nn.model import create_model
    from tools.ap_parity import (
        _count_accepted, _detect_jax, _score_both, bootstrap_cis, make_config,
    )

    data = os.path.join(args.work_dir, "kitti")
    cfg = make_config(data, args.input_size, args.batch, 1e-3)
    model = create_model(cfg)
    with open(os.path.join(args.work_dir, "jax_final.pkl"), "rb") as f:
        eval_vars = pickle.load(f)
    test_ds = create_dataset(data, cfg, is_training=False, split=args.eval_split)
    cfg.INPUT_SIZE = tuple(test_ds.img_size)

    res_t = os.path.join(args.work_dir, "results_torch")
    assert os.path.isdir(res_t), "run ap_parity --production first"

    report = {}
    for rung in ("highest", "default", "bf16"):
        out = os.path.join(args.work_dir, f"results_jax_{rung}")
        rcfg = cfg
        if rung == "bf16":
            rcfg = make_config(data, args.input_size, args.batch, 1e-3)
            rcfg.INPUT_SIZE = tuple(test_ds.img_size)
            rcfg.TPU.COMPUTE_DTYPE = "bfloat16"
        if rung == "highest":
            with jax.default_matmul_precision("highest"):
                _detect_jax(rcfg, model, eval_vars, test_ds, args.batch, out)
        else:
            _detect_jax(rcfg, model, eval_vars, test_ds, args.batch, out)
        n = _count_accepted(out)
        aps = _score_both(data, out, res_t, split=args.eval_split)
        cells = {
            k: v for k, v in aps.items() if v["jax"] > 0 or v["torch"] > 0
        }
        worst = max((abs(v["delta"]) for v in cells.values()), default=0.0)
        row = {"accepted": n, "worst_abs_dap_vs_torch": worst, "ap": cells}
        if args.bootstrap:
            row["bootstrap"] = bootstrap_cis(
                data, {"jax": out, "torch": res_t},
                n_resamples=args.bootstrap, split=args.eval_split,
            )
        print(f"{rung}: accepted {n} (torch {_count_accepted(res_t)}), "
              f"worst |dAP| vs torch {worst}")
        report[rung] = row
    with open(os.path.join(args.work_dir, "precision_ladder.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
