"""Dataset statistics tools.

The reference ships these as standalone scripts whose outputs became config
constants: tests/calc_area_of_bbox.py (-> BBOX_AREA_MAX/MIN, detault.py:27-28)
and tests/calc_vertex_offset_fr_center.py (-> VERTEX_OFFSET_INFER,
detault.py:31). Unified here as one CLI over any KITTI tree.

Usage:
  python -m rtm3d_tpu.cli.stats --model-config CFG [--data-path P] [--split train]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from rtm3d_tpu.config import load_config
from rtm3d_tpu.data.kitti import create_dataset
from rtm3d_tpu.geometry.box_ops import bbox_area, bbox_center
from rtm3d_tpu.geometry.projection import proj2d_bbox3d


def parse_args(argv=None):
    p = argparse.ArgumentParser("rtm3d_tpu stats")
    p.add_argument("--model-config", type=str, required=True)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--split", type=str, default="train")
    p.add_argument(
        "--vis-targets", type=str, default=None,
        help="write per-image target-heatmap overlays (the headless analogue "
        "of reference tests/test_dataset_reader.py) to this directory",
    )
    p.add_argument("--vis-count", type=int, default=4)
    p.add_argument("--set", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.model_config, args.set)
    if args.data_path:
        cfg.DATASET.PATH = args.data_path
    ds = create_dataset(cfg.DATASET.PATH, cfg, is_training=False, split=args.split)
    W, H = ds.img_size

    areas, voffs = [], []
    for i in range(len(ds)):
        s = ds[i]
        lab = s["labels"]
        m = lab["mask"]
        if not m.any():
            continue
        bbox = lab["bbox"][m]
        # normalized area (calc_area_of_bbox.py semantics)
        areas.append(bbox_area(bbox / np.array([W, H, W, H])))
        # vertex offsets from center, normalized (calc_vertex_offset_fr_center.py)
        K = lab["K"][m].reshape(-1, 3, 3)
        uv, _, m3 = proj2d_bbox3d(lab["dim"][m], lab["loc"][m], lab["ry"][m], K)
        verts = np.transpose(np.asarray(uv), (0, 2, 1))[:, :8]
        centers = bbox_center(bbox)
        off = np.abs(verts - centers[:, None, :]) / np.array([W, H])
        voffs.append(off[np.asarray(m3)])

    areas = np.concatenate(areas) if areas else np.zeros(1)
    voffs = np.concatenate(voffs).reshape(-1, 2) if voffs else np.zeros((1, 2))
    out = {
        "BBOX_AREA_MAX": float(areas.max()),
        "BBOX_AREA_MIN": float(areas.min()),
        "VERTEX_OFFSET_INFER": [float(voffs[:, 0].max()), float(voffs[:, 1].max())],
        "num_images": len(ds),
        "num_objects": int(sum(len(a) for a in [areas])),
    }
    print(json.dumps(out, indent=2))
    if args.vis_targets:
        _write_target_overlays(args, cfg, ds)
    return out


def _write_target_overlays(args, cfg, _ds):
    import os

    import cv2

    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.targets import build_targets
    from rtm3d_tpu.utils.visual import denormalize, draw_heatmap_overlay

    os.makedirs(args.vis_targets, exist_ok=True)
    # host-preprocessed frames: in device-warp raw mode the dataset ships
    # the ORIGINAL frame + affine scalars while labels live in the warped
    # frame — blending those would misplace every blob, so the overlay
    # pipeline always materialises the warped frame on the host
    vcfg = cfg.clone()
    vcfg.TPU.DEVICE_WARP = False
    vcfg.TPU.DEVICE_DATA_CACHE = False
    ds = create_dataset(vcfg.DATASET.PATH, vcfg, is_training=False, split=args.split)
    W, H = ds.img_size
    feat = (H // int(cfg.MODEL.DOWN_SAMPLE), W // int(cfg.MODEL.DOWN_SAMPLE))
    import jax.numpy as jnp

    for i in range(min(args.vis_count, len(ds))):
        s = ds[i]
        img = s["image"]
        if img.dtype != np.uint8:
            img = denormalize(
                img, np.array(cfg.DATASET.MEAN), np.array(cfg.DATASET.STD)
            )
        labels = {k: jnp.asarray(v)[None] for k, v in s["labels"].items()}
        # same target parameters the train step uses (train/step.py)
        t = build_targets(
            labels,
            feat,
            len(cfg.DATASET.OBJs),
            down_ratio=float(cfg.MODEL.DOWN_SAMPLE),
            gaussian_gen_type=cfg.DATASET.GAUSSIAN_GEN_TYPE,
            bbox_area_max=cfg.DATASET.BBOX_AREA_MAX,
            bbox_area_min=cfg.DATASET.BBOX_AREA_MIN,
        )
        overlay = draw_heatmap_overlay(img, np.asarray(t["m_hm"])[0])
        name = os.path.splitext(os.path.basename(s["path"]))[0]
        cv2.imwrite(os.path.join(args.vis_targets, f"{name}_targets.png"), overlay)
    print(f"target overlays -> {args.vis_targets}")


if __name__ == "__main__":
    main()
