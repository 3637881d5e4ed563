"""Sweep 3D-solver variants against cached scipy reference costs.

Feeds on a prior diag_same_weights.py --out dump (per-candidate scipy costs)
plus a fresh decode pass on the same checkpoint (vertex sets). For each
solver variant, reports how often LM's reprojection cost exceeds scipy's and
the resulting residual<0.1 acceptance flips.

Usage:
  python tools/solver_tune.py --work-dir /tmp/prodov --diag /tmp/diag_sw.json
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
    ap.add_argument("--diag", required=True)
    ap.add_argument("--input-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-split", default="train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.loader import DataLoader
    from rtm3d_tpu.decode.solve3d import solve_bbox3d
    from rtm3d_tpu.nn.model import create_model
    from rtm3d_tpu.train.step import make_detect_step
    from tools.ap_parity import make_config

    data = os.path.join(args.work_dir, "kitti")
    cfg = make_config(data, args.input_size, args.batch, 1e-3)
    model = create_model(cfg)
    with open(os.path.join(args.work_dir, "jax_final.pkl"), "rb") as f:
        eval_vars = pickle.load(f)
    ds = create_dataset(data, cfg, is_training=False, split=args.eval_split)
    cfg.INPUT_SIZE = tuple(ds.img_size)

    detect = make_detect_step(model, cfg, with_3d=False)
    loader = DataLoader(
        ds, min(args.batch, len(ds)), shuffle=False, drop_last=False,
        num_shards=1, shard_index=0, pad_final=True,
    )
    cand = []  # (img, cls, score, verts, K)
    for b in loader:
        imgs = jnp.asarray(b["image"].astype(np.float32))
        Ks = jnp.asarray(b["calib"].reshape(-1, 3, 3).astype(np.float32))
        det = jax.device_get(detect(eval_vars, imgs, Ks))
        for bi in range(int(b.get("num_valid", imgs.shape[0]))):
            name = os.path.splitext(os.path.basename(b["path"][bi]))[0]
            valid = np.asarray(det["valid"][bi]).astype(bool)
            for k in np.nonzero(valid)[0]:
                cand.append(
                    (
                        name,
                        int(det["cls"][bi][k]),
                        float(det["scores"][bi][k]),
                        np.asarray(det["v_proj"][bi][k]),
                        np.asarray(b["calib"][bi]).reshape(3, 3),
                    )
                )

    with open(args.diag) as f:
        rows = json.load(f)["rows"]
    scipy_cost = {
        (r["img"], r["cls"], round(r["score_j"], 4)): r["cost_scipy"] for r in rows
    }
    # align candidates to cached scipy costs
    matched = []
    for name, c, s, v, K in cand:
        key = (name, c, round(s, 4))
        if key in scipy_cost:
            matched.append((v, K, c, scipy_cost[key]))
    print(f"candidates: {len(cand)} decoded, {len(matched)} matched to scipy cache")

    V = jnp.asarray(np.stack([m[0] for m in matched]))
    Km = jnp.asarray(np.stack([m[1] for m in matched]))
    C = jnp.asarray(np.array([m[2] for m in matched], np.int32))
    sp = np.array([m[3] for m in matched])
    dim_ref = jnp.asarray(cfg.DETECTOR.dim_ref, jnp.float32)
    ref_loc = jnp.asarray(cfg.DETECTOR.REF_LOC, jnp.float32)

    def run(iters, prior_weight, use_pallas):
        sol = solve_bbox3d(
            V, C, Km, dim_ref, ref_loc, iters=iters,
            use_pallas=use_pallas, prior_weight=prior_weight,
        )
        return np.asarray(sol["cost"])

    thr = float(cfg.DETECTOR.RESIDUAL_THRESH)
    variants = [
        ("pallas it40 prior20 (deployed)", dict(iters=40, prior_weight=20.0, use_pallas="auto")),
        ("pallas it40 prior0", dict(iters=40, prior_weight=0.0, use_pallas="auto")),
        ("pallas it100 prior0", dict(iters=100, prior_weight=0.0, use_pallas="auto")),
        ("pallas it200 prior0", dict(iters=200, prior_weight=0.0, use_pallas="auto")),
        ("jnp it40 prior0", dict(iters=40, prior_weight=0.0, use_pallas=False)),
        ("jnp it200 prior0", dict(iters=200, prior_weight=0.0, use_pallas=False)),
        ("pallas it100 prior20", dict(iters=100, prior_weight=20.0, use_pallas="auto")),
    ]
    for name, kw in variants:
        lm = run(**kw)
        d = lm - sp
        worse = (lm > sp + 1e-6) & (lm >= thr)
        flips_rej = int(((lm >= thr) & (sp < thr)).sum())
        flips_acc = int(((lm < thr) & (sp >= thr)).sum())
        print(
            f"{name}: max(lm-scipy) {d.max():.4f} p90 {np.percentile(d, 90):.4f} "
            f"lm-rejects-scipy-accepts {flips_rej} lm-accepts-scipy-rejects {flips_acc} "
            f"worse-above-gate {int(worse.sum())}"
        )


if __name__ == "__main__":
    main()
