import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml


@pytest.mark.slow
def test_export_roundtrip(tmp_path, rng):
    from rtm3d_tpu.cli.export import load_exported, main

    cfg = {
        "INPUT_SIZE": "(64, 64)",
        "MODEL": {
            "BACKBONE": "RESNET-18",
            "KFNs": ["layer1", "layer2", "layer3", "layer4"],
        },
        "DETECTOR": {"TOPK_CANDIDATES": 5},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = str(tmp_path / "model.stablehlo")
    main(["--model-config", cfg_path, "--output", out, "--with-decode"])
    assert os.path.exists(out)

    exported = load_exported(out)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    det = exported.call(x)
    assert det["scores"].shape == (1, 5)
    assert det["v_proj"].shape == (1, 5, 8, 2)
    assert np.isfinite(np.asarray(det["scores"])).all()
