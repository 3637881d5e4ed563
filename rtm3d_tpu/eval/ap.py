"""KITTI AP evaluation: AP2D / AP-BEV / AP3D with R40 interpolation.

New capability — the reference computes no metric at all ("test" is eval-mode
loss only, SURVEY.md §6). This follows the official KITTI object devkit
protocol: greedy score-ordered matching per class, 40-point interpolated
precision (R40), difficulty buckets by bbox height / occlusion / truncation.
Rotated-box overlap is computed with a Sutherland-Hodgman polygon clip in
numpy (no shapely dependency); 3D IoU = BEV intersection x height overlap.

Simplifications vs the official C++ evaluator (documented deliberately):
no DontCare-region filtering and no "van for car" ignore classes — the
synthetic fixture and typical val splits don't exercise them.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

# difficulty: (min bbox height px, max occlusion, max truncation)
DIFFICULTY = {
    "easy": (40.0, 0, 0.15),
    "moderate": (25.0, 1, 0.30),
    "hard": (25.0, 2, 0.50),
}

MIN_OVERLAP = {  # per metric, class group: (Car, Pedestrian/Cyclist)
    "bbox": (0.7, 0.5),
    "bev": (0.7, 0.5),
    "3d": (0.7, 0.5),
}


def _clip_polygon(poly: np.ndarray, edge_p1, edge_p2) -> np.ndarray:
    """Clip polygon by the half-plane left of edge p1->p2 (Sutherland-Hodgman)."""
    out = []
    n = len(poly)
    ex, ey = edge_p2[0] - edge_p1[0], edge_p2[1] - edge_p1[1]

    def inside(p):
        return ex * (p[1] - edge_p1[1]) - ey * (p[0] - edge_p1[0]) <= 1e-12

    def intersect(a, b):
        dx, dy = b[0] - a[0], b[1] - a[1]
        denom = ex * dy - ey * dx
        if abs(denom) < 1e-12:
            return b
        t = (ex * (edge_p1[1] - a[1]) - ey * (edge_p1[0] - a[0])) / denom
        return (a[0] + t * dx, a[1] + t * dy)

    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        if inside(cur):
            out.append(tuple(cur))
            if not inside(nxt):
                out.append(intersect(cur, nxt))
        elif inside(nxt):
            out.append(intersect(cur, nxt))
    return np.array(out) if out else np.zeros((0, 2))


def _poly_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def _bev_corners(box) -> np.ndarray:
    """box: (x, z, w, l, ry) -> (4, 2) corners in the BEV (x, z) plane."""
    x, z, w, l, ry = box
    c, s = np.cos(ry), np.sin(ry)
    dx = np.array([l / 2, l / 2, -l / 2, -l / 2])
    dz = np.array([w / 2, -w / 2, -w / 2, w / 2])
    rx = c * dx + s * dz
    rz = -s * dx + c * dz
    return np.stack([x + rx, z + rz], axis=-1)


def bev_overlap(box_a, box_b) -> float:
    """Intersection area of two rotated BEV rectangles."""
    pa, pb = _bev_corners(box_a), _bev_corners(box_b)
    poly = pa
    for i in range(4):
        poly = _clip_polygon(poly, pb[i], pb[(i + 1) % 4])
        if len(poly) == 0:
            return 0.0
    return _poly_area(poly)


def iou_2d(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def iou_bev(a, b) -> float:
    """a, b: (x, z, w, l, ry)."""
    inter = bev_overlap(a, b)
    ua = a[2] * a[3] + b[2] * b[3] - inter
    return inter / ua if ua > 0 else 0.0


def iou_3d(a, b) -> float:
    """a, b: dicts with loc (x,y,z: y = bottom), dim (h,w,l), ry."""
    bev_a = (a["loc"][0], a["loc"][2], a["dim"][1], a["dim"][2], a["ry"])
    bev_b = (b["loc"][0], b["loc"][2], b["dim"][1], b["dim"][2], b["ry"])
    inter_bev = bev_overlap(bev_a, bev_b)
    ya1, ya0 = a["loc"][1], a["loc"][1] - a["dim"][0]
    yb1, yb0 = b["loc"][1], b["loc"][1] - b["dim"][0]
    ih = max(0.0, min(ya1, yb1) - max(ya0, yb0))
    inter = inter_bev * ih
    va = a["dim"][0] * a["dim"][1] * a["dim"][2]
    vb = b["dim"][0] * b["dim"][1] * b["dim"][2]
    union = va + vb - inter
    return inter / union if union > 0 else 0.0


def parse_kitti_line(line: str, with_score: bool) -> Dict:
    p = line.split()
    d = {
        "type": p[0],
        "truncated": float(p[1]),
        "occluded": int(float(p[2])),
        "alpha": float(p[3]),
        "bbox": np.array([float(v) for v in p[4:8]]),
        "dim": np.array([float(v) for v in p[8:11]]),  # h, w, l
        "loc": np.array([float(v) for v in p[11:14]]),
        "ry": float(p[14]),
    }
    d["score"] = float(p[15]) if with_score and len(p) > 15 else 1.0
    return d


def _overlap(metric: str, det: Dict, gt: Dict) -> float:
    if metric == "bbox":
        return iou_2d(det["bbox"], gt["bbox"])
    if metric == "bev":
        return iou_bev(
            (det["loc"][0], det["loc"][2], det["dim"][1], det["dim"][2], det["ry"]),
            (gt["loc"][0], gt["loc"][2], gt["dim"][1], gt["dim"][2], gt["ry"]),
        )
    return iou_3d(det, gt)


def _gt_in_difficulty(gt: Dict, difficulty: str) -> bool:
    min_h, max_occ, max_trunc = DIFFICULTY[difficulty]
    h = gt["bbox"][3] - gt["bbox"][1]
    return (
        h >= min_h and gt["occluded"] <= max_occ and gt["truncated"] <= max_trunc
    )


# classes whose gt boxes are "ignored neighbours" when evaluating a class:
# detections matching them count neither TP nor FP (official devkit rule)
NEIGHBOR_CLASSES = {
    "Car": ("Van",),
    "Pedestrian": ("Person_sitting",),
    "Cyclist": (),
}


def evaluate_ap(
    gts: List[List[Dict]],
    dets: List[List[Dict]],
    class_name: str = "Car",
    metric: str = "3d",
    difficulty: str = "moderate",
) -> float:
    """AP_R40 over a dataset. gts/dets: per image lists of parsed objects.

    Official-devkit semantics: gt of the class split into valid (difficulty
    bucket) vs ignored; neighbour-class gt (Van for Car, Person_sitting for
    Pedestrian) and DontCare regions absorb matching detections without
    counting as FP."""
    min_ov = MIN_OVERLAP[metric][0 if class_name == "Car" else 1]
    neighbors = NEIGHBOR_CLASSES.get(class_name, ())

    # collect per-image class-filtered gt/det
    all_scores = []
    per_image = []
    total_valid_gt = 0
    for gt_list, det_list in zip(gts, dets):
        g = [o for o in gt_list if o["type"] == class_name]
        valid = [o for o in g if _gt_in_difficulty(o, difficulty)]
        ignore_boxes = [
            o for o in gt_list if o["type"] in neighbors or o["type"] == "DontCare"
        ]
        d = sorted(
            (o for o in det_list if o["type"] == class_name),
            key=lambda o: -o["score"],
        )
        total_valid_gt += len(valid)
        per_image.append((g, valid, ignore_boxes, d))
        all_scores += [o["score"] for o in d]
    if total_valid_gt == 0:
        return 0.0

    def pr_at(thresh: float):
        tp = fp = 0
        for g_all, g_valid, ignores, d in per_image:
            matched = set()
            for det in d:
                if det["score"] < thresh:
                    continue
                best, best_i = min_ov, -1
                for i, gt in enumerate(g_all):
                    if i in matched:
                        continue
                    ov = _overlap(metric, det, gt)
                    if ov >= best:
                        best, best_i = ov, i
                if best_i >= 0:
                    matched.add(best_i)
                    # identity check: dicts hold numpy arrays, `in` would
                    # trigger ambiguous array equality
                    if any(g_all[best_i] is v for v in g_valid):
                        tp += 1
                    # matches to harder-difficulty gt are ignored (not FP)
                else:
                    # neighbour-class / DontCare absorption (2D overlap, like
                    # the devkit's image-plane stuff boxes)
                    absorbed = any(
                        iou_2d(det["bbox"], ig["bbox"]) >= 0.5 for ig in ignores
                    )
                    if not absorbed:
                        fp += 1
        fn = total_valid_gt - tp
        prec = tp / (tp + fp) if tp + fp > 0 else 0.0
        rec = tp / (tp + fn) if tp + fn > 0 else 0.0
        return prec, rec

    # R40: precision sampled at 40 recall points via score thresholds
    scores = np.sort(np.array(all_scores))[::-1]
    if len(scores) == 0:
        return 0.0
    precs = []
    recalls = []
    for t in np.unique(scores):
        p, r = pr_at(t)
        precs.append(p)
        recalls.append(r)
    precs, recalls = np.array(precs), np.array(recalls)
    ap = 0.0
    for r in np.linspace(0.025, 1.0, 40):
        mask = recalls >= r
        ap += (precs[mask].max() if mask.any() else 0.0) / 40.0
    return float(min(ap, 1.0))


def evaluate_directories(gt_dir: str, det_dir: str, image_names: Sequence[str], **kw):
    import os

    gts, dets = [], []
    for name in image_names:
        with open(os.path.join(gt_dir, f"{name}.txt")) as f:
            gts.append(
                [parse_kitti_line(l, False) for l in f.read().splitlines() if l]
            )
        det_path = os.path.join(det_dir, f"{name}.txt")
        if os.path.exists(det_path):
            with open(det_path) as f:
                dets.append(
                    [parse_kitti_line(l, True) for l in f.read().splitlines() if l]
                )
        else:
            dets.append([])
    return evaluate_ap(gts, dets, **kw)
