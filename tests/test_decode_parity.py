"""Decode parity vs a torch re-statement of the reference inference loop.

Implements the reference's per-image decode (models/model.py:29-98 +
utils/model_utils.py:17-26) independently in torch and checks the batched
jax decode produces the same detections on identical logits — the
'bit-for-bit decode parity on fixed inputs' goal of BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.decode.peaks import decode_detections


def _torch_reference_decode(logits_nchw, score_thresh, topk, down=4.0):
    """Per-image loop, dynamic filtering — reference semantics."""
    import torch
    import torch.nn.functional as F

    main_kf, offset_fr_main, main_offset, _ = [
        torch.as_tensor(x) for x in logits_nchw
    ]
    out = []
    B = main_kf.shape[0]
    for i in range(B):
        hm = torch.sigmoid(main_kf[i])
        hmax = F.max_pool2d(hm.unsqueeze(0), 3, stride=1, padding=1).squeeze(0)
        hm = hm * (hmax == hm).float()
        K_, H, W = hm.shape
        scores, indices = torch.topk(hm.view(-1), topk)
        keep = scores > score_thresh
        scores, indices = scores[keep], indices[keep]
        if len(indices) == 0:  # no candidates above threshold in this image
            out.append(
                {
                    "cls": np.zeros((0,), np.int64),
                    "scores": np.zeros((0,), np.float32),
                    "centers": np.zeros((0, 2), np.float32),
                    "verts": np.zeros((0, 8, 2), np.float32),
                }
            )
            continue
        cls = indices // (H * W)
        xy = indices % (H * W)
        y = (xy // W).float()
        x = (xy % W).float()
        offs = offset_fr_main[i][:, y.long(), x.long()].view(-1, 2, len(x)).permute(
            0, 2, 1
        )  # (8, N, 2)
        sub = torch.sigmoid(main_offset[i][:, y.long(), x.long()])
        cx = x + sub[0]
        cy = y + sub[1]
        centers = torch.stack([cx, cy], dim=-1)  # (N, 2)
        verts = (offs.permute(1, 0, 2) + centers.view(-1, 1, 2)) * down
        out.append(
            {
                "cls": cls.numpy(),
                "scores": scores.numpy(),
                "centers": (centers * down).numpy(),
                "verts": verts.numpy(),
            }
        )
    return out


def test_batched_decode_matches_torch_reference_loop(rng):
    B, H, W, C = 3, 24, 32, 3
    # realistic peaky logits: background at -4 with a few sharp peaks
    main = np.full((B, C, H, W), -4.0, np.float32)
    for b in range(B):
        for _ in range(rng.randint(1, 5)):
            c = rng.randint(C)
            y, x = rng.randint(2, H - 2), rng.randint(2, W - 2)
            main[b, c, y, x] = rng.uniform(0.5, 4.0)
    offs = rng.randn(B, 16, H, W).astype(np.float32)
    moff = rng.randn(B, 2, H, W).astype(np.float32)
    voff = np.zeros((B, 2, H, W), np.float32)

    ref = _torch_reference_decode((main, offs, moff, voff), 0.4, 10)

    logits_nhwc = tuple(
        jnp.asarray(np.transpose(a, (0, 2, 3, 1))) for a in (main, offs, moff, voff)
    )
    got = jax.device_get(
        decode_detections(logits_nhwc, 0.4, 10, 4.0, approx_topk=False)
    )

    for b in range(B):
        valid = got["valid"][b]
        n_ref = len(ref[b]["cls"])
        assert int(valid.sum()) == n_ref
        # order: both sorted by score descending
        np.testing.assert_array_equal(got["cls"][b][valid], ref[b]["cls"])
        np.testing.assert_allclose(got["scores"][b][valid], ref[b]["scores"], rtol=1e-5)
        np.testing.assert_allclose(
            got["m_proj"][b][valid], ref[b]["centers"], atol=1e-3
        )
        np.testing.assert_allclose(
            got["v_proj"][b][valid], ref[b]["verts"], atol=5e-3
        )
        # bbox2d = min/max over vertices
        vb = got["v_proj"][b][valid]
        exp_box = np.concatenate([vb.min(axis=1), vb.max(axis=1)], axis=-1)
        np.testing.assert_allclose(got["bbox2d"][b][valid], exp_box, atol=1e-4)
