"""Benchmark: KITTI-val-shaped detect path on the flagship DLA-34 model.

Measures end-to-end jitted inference — backbone + KFPN + header + heatmap
decode + batched LM 3D recovery — images/sec on the local accelerator,
batch 128 at 1280x384 (the KITTI rect resolution the reference trains at,
rtm3d_dla34_kitti.yaml INPUT_SIZE 1280 with IS_RECT). Batch scaling on
v5e-1, trace-measured device time: 208 (b8) / 361 (b64) / 384 (b96) /
393-398 (b128, driver-captured BENCH_r03 = 393.1) / 383 (b192) img/s;
b256 exceeds HBM — batch 128 is the throughput-optimal serving batch.

Prints ONE JSON line. ``vs_baseline`` is relative to the upstream RTM3D
paper's published DLA-34 runtime (0.055 s/image ~= 18.2 FPS on a GTX 1080Ti,
arXiv:2001.03343 Tab. 4) — the reference repo itself publishes no numbers
(BASELINE.md): >1.0 means faster than the paper's GPU figure.

``--b1`` switches to the reference's own headline metric — single-image
serving latency (reference detect.py:55-60 times each batch-1 forward):
warm, device-synced p50 ms/image from a profiler trace, same full detect
pipeline. vs_baseline is then paper_ms / measured_ms (>1.0 = lower latency
than the paper's 55 ms). The driver runs the default throughput mode.
"""

import json
import os
import sys
import time

import numpy as np

PAPER_FPS = 18.2  # RTM3D paper DLA-34, GTX 1080Ti
PAPER_MS = 55.0  # the same figure as per-image latency
BATCH = 128
H, W = 384, 1280


def main_b1():
    import jax

    from rtm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.step import make_detect_step
    from tools.bench_latency import bench_batch

    cfg = default_config()
    cfg.MODEL.BACKBONE = "DLA-34"
    cfg.INPUT_SIZE = (W, H)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.DETECTOR.TOPK_CANDIDATES = 100
    cfg.DETECTOR.SCORE_THRESH = 0.4
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    detect = make_detect_step(model, cfg, with_3d=True)
    r = bench_batch(detect, variables, 1, 30)
    if "device" not in r:
        raise SystemExit(
            "bench --b1: the profiler trace captured no device-module "
            "durations — run on an accelerator with a device trace lane "
            "(wall-clock is untrustworthy on this runtime, see module doc)"
        )
    ms = r["device"]["p50_ms"]
    print(
        json.dumps(
            {
                "metric": "detect_ms_per_image_dla34_b1_1280x384",
                "value": ms,
                "unit": "ms/image",
                "vs_baseline": round(PAPER_MS / ms, 3),
            }
        )
    )


def main():
    import jax

    from rtm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.step import make_detect_step

    cfg = default_config()
    cfg.MODEL.BACKBONE = "DLA-34"
    cfg.INPUT_SIZE = (W, H)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"  # MXU-native inference; decode/solver stay fp32
    cfg.DETECTOR.TOPK_CANDIDATES = 100
    cfg.DETECTOR.SCORE_THRESH = 0.4

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    detect = make_detect_step(model, cfg, with_3d=True)

    rng = np.random.RandomState(0)
    # serving-realistic input: raw uint8 frames, normalised on device
    base = (rng.rand(BATCH, H, W, 3) * 255).astype(np.uint8)
    K = jnp.asarray(
        np.tile(
            np.array(
                [[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]], np.float32
            ),
            (BATCH, 1, 1),
        )
    )

    # a DISTINCT input batch per iteration: the runtime may memoize repeated
    # identical executions, which would turn a re-fed constant batch into a
    # cache-hit benchmark; device-resident ahead of the timed loop so H2D is
    # excluded either way
    iters = 5
    inputs = [jnp.asarray(base + np.uint8(i + 1)) for i in range(iters)]
    jax.block_until_ready(inputs)

    # warmup / compile
    out = detect(variables, jnp.asarray(base), K)
    jax.block_until_ready(out)

    # Wall-clock is untrustworthy on remote/tunneled runtimes (async dispatch
    # and execution memoization can make the loop complete far faster than
    # the device runs it) — measure DEVICE time from a profiler trace of the
    # loop and use wall-clock only as a fallback when no device lane exists.
    import shutil
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.trace_times import summarize

    tracedir = tempfile.mkdtemp(prefix="bench_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tracedir):
        outs = [detect(variables, imgs, K) for imgs in inputs]
        jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    try:
        _, _, _, modules = summarize(tracedir)
        # the detect program dominates the trace; everything else in the
        # module lane (transfers, tiny reformats) is not steady-state work
        device_s = max(t for _, t in modules) / 1e6 if modules else 0.0
    except Exception:
        device_s = 0.0
    finally:
        shutil.rmtree(tracedir, ignore_errors=True)
    dt = device_s if device_s > 0 else dt

    ips = BATCH * iters / dt
    print(
        json.dumps(
            {
                "metric": "detect_images_per_sec_dla34_b128_1280x384",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / PAPER_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--b1" in sys.argv[1:]:
        main_b1()
    else:
        main()
