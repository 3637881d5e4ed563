"""Pinned (shrunk) AP-level parity: torch and jax stacks trained side by
side from identical imported init, each evaluated with its own pipeline,
scored by the same evaluator (tools/ap_parity.py harness).

The full-scale experiment (64 train images @256x192, results + artifacts in
PARITY.md) is run by ``python tools/ap_parity.py``; this test
pins a smaller configuration so regressions in any composed piece (importer,
forward, loss, Adamax, decode, solver, evaluator) show up as loss-drift or
AP divergence between the stacks.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")


def test_ap_parity_small(tmp_path):
    from tools.ap_parity import run_ap_parity

    out = run_ap_parity(
        str(tmp_path),
        img_hw=(96, 128),
        input_size=128,
        num_train=16,
        num_test=8,
        steps=50,  # drift window = 50; the torch CPU leg prices every step
        batch=4,
        drift_steps=50,
        progress=lambda *a: None,
    )
    # the stacks consume identical batches from identical init: per-step
    # loss drift measures accumulated numeric divergence only (fp order,
    # Adamax sign steps, BN stats). Observed ~1e-4 at step 0, percent-level
    # by step 50 with isolated ~25% transients while the loss crosses its
    # steep initial descent (measured at this scale); an order worse means
    # something is broken.
    drift = out["loss_drift_curve"]
    assert drift[0] < 5e-3, drift[0]
    assert max(drift[:10]) < 5e-2, max(drift[:10])
    assert max(drift) < 0.5, max(drift)
    # both stacks must have learned the same amount
    lj0, lj1 = out["loss_jax_first_last"]
    lt0, lt1 = out["loss_torch_first_last"]
    assert lj1 < lj0 and lt1 < lt0
    assert abs(lj1 - lt1) / max(abs(lt1), 1e-9) < 0.25
    # AP: each stack decoded with its own pipeline, same evaluator — the
    # deltas bound the end-to-end divergence (both may legitimately be 0.0
    # at this scale; the bound catches one stack detecting and the other
    # not)
    for key, row in out["ap"].items():
        assert abs(row["delta"]) <= 15.0, (key, row)
        assert abs(row.get("delta_int8", 0.0)) <= 15.0, (key, row)
        # same trained weights through both inference stacks: the training
        # trajectories cancel, so this bound is tighter than the trained
        # jax-vs-torch delta
        assert abs(row.get("delta_samew", 0.0)) <= 5.0, (key, row)


def test_production_parity_small(tmp_path):
    """Production-gate same-weights mode at pinned small scale: the jax-only
    training leg runs, the trained weights export to the torch twin
    (export_torch_weights) and BOTH inference pipelines run at the true
    production gates. At 40 steps neither pipeline's detections clear the
    gates — the contract here is that the whole composed path executes and
    the same-weights delta stays bounded (identical weights: the only
    difference is the inference stack)."""
    from tools.ap_parity import run_production_parity

    out = run_production_parity(
        str(tmp_path),
        input_size=128,
        num_train=12,
        num_test=4,
        steps=40,
        batch=4,
        save_every=20,
        progress=lambda *a: None,
    )
    assert out["config"]["mode"] == "production_same_weights"
    l0, l1 = out["loss_first_last"]
    assert l1 < l0
    assert set(out["accepted_counts"]) == {"jax", "torch", "int8"}
    for key, row in out["ap"].items():
        # same weights on both sides: the inference-path delta must be small
        # even when detections exist; int8 is a lossy path, bounded looser
        assert abs(row["delta"]) <= 5.0, (key, row)
        assert abs(row.get("delta_int8", 0.0)) <= 15.0, (key, row)

    # resume contract: a second call with the same work_dir must not retrain
    out2 = run_production_parity(
        str(tmp_path),
        input_size=128,
        num_train=12,
        num_test=4,
        steps=40,
        batch=4,
        progress=lambda *a: None,
    )
    assert out2["loss_first_last"] == out["loss_first_last"]


def test_rescore_only_requires_results_dirs(tmp_path):
    from tools.ap_parity import run_ap_parity

    with pytest.raises(FileNotFoundError):
        run_ap_parity(str(tmp_path), rescore_only=True)


def test_rescore_only_rescores_written_dirs(tmp_path):
    """rescore_only re-scores existing results dirs without touching the
    training path: empty result dirs score an all-zero table and carry the
    requested bars in the config block."""
    import os

    from tools.ap_parity import run_ap_parity

    for leg in ("jax", "torch", "int8", "samew"):
        os.makedirs(tmp_path / f"results_{leg}")
    out = run_ap_parity(
        str(tmp_path), rescore_only=True, min_height=0.0, min_overlap=0.3,
        bootstrap=5, progress=lambda *a: None,
    )
    assert out["config"]["min_overlap"] == 0.3
    assert set(out) == {"config", "ap", "bootstrap"}
    for row in out["ap"].values():
        assert row["jax"] == 0.0 and row["delta"] == 0.0


def test_production_parity_small_dla34(tmp_path):
    """The flagship recipe leg: jax DLA-34 (s2d stem reparameterisation on —
    the deployed trainer default) trains, exports through the suffix-matching
    jax->torch path into the recursive TDLA twin, and both inference
    pipelines serve the same weights. Pins the DLA-34 wiring end to end so
    the full-scale campaign (PARITY.md) rests on a tested contract."""
    from tools.ap_parity import run_production_parity

    out = run_production_parity(
        str(tmp_path),
        input_size=128,
        num_train=8,
        num_test=4,
        steps=30,
        batch=4,
        save_every=20,
        progress=lambda *a: None,
        backbone="DLA-34",
    )
    assert out["config"]["backbone"] == "DLA-34"
    l0, l1 = out["loss_first_last"]
    assert l1 < l0
    for key, row in out["ap"].items():
        assert abs(row["delta"]) <= 5.0, (key, row)
