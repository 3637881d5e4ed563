"""Candidate-level diagnosis of the same-weights production-gate AP delta.

The production-parity harness (tools/ap_parity.py --production) pushes one
trained checkpoint through both inference pipelines and scores AP; when the
AP columns disagree, this tool answers WHERE the pipelines diverge:

  per matched candidate (same image, same class, same heatmap peak cell):
    score_jax vs score_torch        -> forward-pass numerics
    max |vertex_jax - vertex_torch| -> decode numerics
    cost_LM vs cost_scipy           -> solver quality
    accepted_jax vs accepted_torch  -> residual<RESIDUAL_THRESH gate flips

Usage:
  python tools/diag_same_weights.py --work-dir /tmp/prodov [--input-size 512]
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
    ap.add_argument("--backbone", default="RESNET-18")
    ap.add_argument("--bf16", action="store_true",
                    help="serve the jax leg in bf16 compute (match a --bf16 campaign)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.loader import DataLoader
    from rtm3d_tpu.train.checkpoint import export_torch_weights
    from rtm3d_tpu.train.step import make_detect_step
    from rtm3d_tpu.nn.model import create_model
    from tools.ap_parity import build_torch_twin, make_config
    from tests.test_decode_parity import _torch_reference_decode
    from tests.test_detect_parity import _scipy_reference_solve

    data = os.path.join(args.work_dir, "kitti")
    cfg = make_config(data, args.input_size, args.batch, 1e-3, backbone=args.backbone)
    if args.bf16:
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = create_model(cfg)
    with open(os.path.join(args.work_dir, "jax_final.pkl"), "rb") as f:
        eval_vars = pickle.load(f)

    ds = create_dataset(data, cfg, is_training=False, split=args.eval_split)
    cfg.INPUT_SIZE = tuple(ds.img_size)
    down = float(cfg.MODEL.DOWN_SAMPLE)
    thresh = float(cfg.DETECTOR.SCORE_THRESH)
    res_thresh = float(cfg.DETECTOR.RESIDUAL_THRESH)
    topk = int(cfg.DETECTOR.TOPK_CANDIDATES)

    detect = make_detect_step(model, cfg, with_3d=True)
    loader = DataLoader(
        ds, min(args.batch, len(ds)), shuffle=False, drop_last=False,
        num_shards=1, shard_index=0, pad_final=True,
    )
    jax_by_img = {}
    for b in loader:
        imgs = jnp.asarray(b["image"].astype(np.float32))
        Ks = jnp.asarray(b["calib"].reshape(-1, 3, 3).astype(np.float32))
        det = jax.device_get(detect(eval_vars, imgs, Ks))
        for bi in range(int(b.get("num_valid", imgs.shape[0]))):
            name = os.path.splitext(os.path.basename(b["path"][bi]))[0]
            jax_by_img[name] = {k: np.asarray(v)[bi] for k, v in det.items()}

    twin = build_torch_twin(backbone=args.backbone)
    sd, rep = export_torch_weights(eval_vars, twin.state_dict())
    twin.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    twin.eval()

    import tests.test_detect_parity as tdp

    rows = []
    unmatched = {"jax_only": 0, "torch_only": 0}
    for i in range(len(ds)):
        sample = ds[i]
        name = os.path.splitext(os.path.basename(sample["path"]))[0]
        K = sample["calib"].reshape(3, 3)
        img = sample["image"].astype(np.float32)
        with torch.no_grad():
            logits = twin(torch.as_tensor(img.transpose(2, 0, 1)[None]))
        dec = _torch_reference_decode(
            tuple(np.ascontiguousarray(t.numpy()) for t in logits), thresh, topk
        )[0]
        jdet = jax_by_img[name]
        jvalid = np.asarray(jdet["valid"]).astype(bool)
        # match on (class, heatmap peak cell)
        jkeys = {}
        for k in np.nonzero(jvalid)[0]:
            cell = tuple((np.floor(jdet["m_proj"][k] / down)).astype(int))
            jkeys[(int(jdet["cls"][k]), cell)] = int(k)
        tseen = set()
        for t in range(len(dec["cls"])):
            cell = tuple((np.floor(dec["centers"][t] / down)).astype(int))
            key = (int(dec["cls"][t]), cell)
            if key not in jkeys:
                unmatched["torch_only"] += 1
                continue
            tseen.add(key)
            k = jkeys[key]
            old = tdp.K_CAM
            tdp.K_CAM = K
            try:
                sol = _scipy_reference_solve(int(dec["cls"][t]), dec["verts"][t], K)
            finally:
                tdp.K_CAM = old
            cost_lm = float(jdet["cost"][k])
            cost_sp = float(sol["cost"])
            dv = float(np.abs(jdet["v_proj"][k] - dec["verts"][t]).max())
            rows.append(
                {
                    "img": name,
                    "cls": int(dec["cls"][t]),
                    "score_j": float(jdet["scores"][k]),
                    "score_t": float(dec["scores"][t]),
                    "dvert": dv,
                    "cost_lm": cost_lm,
                    "cost_scipy": cost_sp,
                    "acc_j": bool(cost_lm < res_thresh),
                    "acc_t": bool(cost_sp < res_thresh),
                }
            )
        unmatched["jax_only"] += int(jvalid.sum()) - len(tseen)

    flips = [r for r in rows if r["acc_j"] != r["acc_t"]]
    lm_worse = [r for r in flips if not r["acc_j"]]
    sp_worse = [r for r in flips if not r["acc_t"]]
    dcost = np.array([r["cost_lm"] - r["cost_scipy"] for r in rows])
    dvert = np.array([r["dvert"] for r in rows])
    dscore = np.array([abs(r["score_j"] - r["score_t"]) for r in rows])
    summary = {
        "n_matched": len(rows),
        "unmatched": unmatched,
        "max_dscore": float(dscore.max()) if len(rows) else None,
        "max_dvert_px": float(dvert.max()) if len(rows) else None,
        "cost_lm_minus_scipy_pct": {
            str(q): float(np.percentile(dcost, q))
            for q in (0, 25, 50, 75, 90, 99, 100)
        } if len(rows) else None,
        "gate_flips": len(flips),
        "flips_lm_rejected_scipy_accepted": len(lm_worse),
        "flips_scipy_rejected_lm_accepted": len(sp_worse),
        "accepted_jax": sum(r["acc_j"] for r in rows),
        "accepted_torch": sum(r["acc_t"] for r in rows),
    }
    print(json.dumps(summary, indent=1))
    worst = sorted(flips, key=lambda r: -abs(r["cost_lm"] - r["cost_scipy"]))[:12]
    for r in worst:
        print(
            f"flip {r['img']} cls{r['cls']} score {r['score_j']:.3f} "
            f"cost LM {r['cost_lm']:.4f} scipy {r['cost_scipy']:.4f} dvert {r['dvert']:.3f}px"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
