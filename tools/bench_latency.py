"""Serving LATENCY bench: per-batch detect latency percentiles on the
flagship DLA-34 model (1280x384 bf16, full pipeline: backbone + KFPN +
header + decode + LM 3D recovery).

Complements bench.py (throughput at the throughput-optimal batch 128): a
deployment also needs the latency-throughput tradeoff at small batch. Two
numbers per batch size:

- device p50/p90/p99/mean: per-execution durations of the detect module
  from a profiler trace (tools/trace_times.module_durations) — the honest
  on-chip latency. Wall-clock (even with block_until_ready) is NOT
  reported: on this remote/tunneled runtime it comes back smaller than
  the device-time itself (the runtime acks before the chip finishes), so
  only trace-derived device time is meaningful (same rationale as
  bench.py's throughput measurement).

The reference has no latency harness at all; its detect.py prints
per-image wall times inside a Python loop (reference detect.py:47-58).

Usage:
  python tools/bench_latency.py [--batches 1,8,32] [--iters 30] [--int8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 384, 1280


def _pcts(durs_ms):
    d = np.asarray(sorted(durs_ms))
    return {
        "p50_ms": round(float(np.percentile(d, 50)), 2),
        "p90_ms": round(float(np.percentile(d, 90)), 2),
        "p99_ms": round(float(np.percentile(d, 99)), 2),
        "mean_ms": round(float(d.mean()), 2),
    }


def bench_batch(detect, variables, batch, iters):
    import jax
    import jax.numpy as jnp

    from tools.trace_times import module_durations

    rng = np.random.RandomState(0)
    base = (rng.rand(batch, H, W, 3) * 255).astype(np.uint8)
    K = jnp.asarray(
        np.tile(
            np.array(
                [[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]], np.float32
            ),
            (batch, 1, 1),
        )
    )
    # distinct device-resident inputs (memoization-proof, H2D excluded)
    inputs = [jnp.asarray(base + np.uint8(i + 1)) for i in range(iters)]
    jax.block_until_ready(inputs)
    jax.block_until_ready(detect(variables, inputs[0], K))  # warmup/compile

    tracedir = tempfile.mkdtemp(prefix="lat_trace_")
    try:
        with jax.profiler.trace(tracedir):
            for imgs in inputs:
                jax.block_until_ready(detect(variables, imgs, K))
        mods = module_durations(tracedir)
    finally:
        shutil.rmtree(tracedir, ignore_errors=True)
    # the detect program is the module with the most executions and the
    # largest total time; tiny helper programs (reformats) also appear
    name, durs = max(
        mods.items(), key=lambda kv: (len(kv[1]), sum(kv[1]))
    ) if mods else ("", [])
    out = {"batch": batch, "iters": iters}
    if durs:
        out["device"] = _pcts([d / 1e3 for d in durs[-iters:]])
        out["device"]["per_image_ms"] = round(
            out["device"]["p50_ms"] / batch, 3
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser("bench_latency")
    p.add_argument("--batches", type=str, default="1,8,32")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--backbone", type=str, default="DLA-34",
                   choices=["DLA-34", "RESNET-18"])
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import jax

    from rtm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.step import make_detect_step

    cfg = default_config()
    cfg.MODEL.BACKBONE = args.backbone
    if args.backbone == "RESNET-18":
        cfg.MODEL.KFNs = ["layer1", "layer2", "layer3", "layer4"]
    cfg.INPUT_SIZE = (W, H)
    cfg.TPU.COMPUTE_DTYPE = args.dtype
    cfg.DETECTOR.TOPK_CANDIDATES = 100
    cfg.DETECTOR.SCORE_THRESH = 0.4

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    apply_fn = None
    if args.int8:
        from rtm3d_tpu.nn.quant import calibrate_act_scales, quantized_apply, skip_scales

        rng = np.random.RandomState(1)
        calib = [
            jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
            for _ in range(2)
        ]
        scales = calibrate_act_scales(model, variables, calib)
        scales = skip_scales(scales, tuple(cfg.TPU.get("INT8_SKIP", ())))
        apply_fn = quantized_apply(model, scales)
    detect = make_detect_step(model, cfg, with_3d=True, apply_fn=apply_fn)

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        r = bench_batch(detect, variables, b, args.iters)
        r["backbone"], r["dtype"] = args.backbone, args.dtype
        print(json.dumps(r))
        results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {
                    "int8": bool(args.int8),
                    "backbone": args.backbone,
                    "dtype": args.dtype,
                    "results": results,
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
