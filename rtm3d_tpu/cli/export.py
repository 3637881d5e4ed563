"""Model export — the TPU-native analog of the reference's promised-but-
missing ``export_onnx.py`` (reference README.md:59 references it; the file
does not exist in the tree).

Exports the jitted forward (or full detect) program as serialized StableHLO
via ``jax.export``: a self-contained, version-stable artifact loadable from
any JAX process (``jax.export.deserialize``) or compilable by any
StableHLO-consuming runtime (IREE, TF, XLA AOT).

Usage:
  python -m rtm3d_tpu.cli.export --model-config CFG --output model.stablehlo \
      [--checkpoint CKPT] [--batch-size N] [--with-decode]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from rtm3d_tpu.cli.detect import load_variables
from rtm3d_tpu.config import load_config
from rtm3d_tpu.decode.peaks import decode_detections
from rtm3d_tpu.nn.model import create_model


def parse_args(argv=None):
    p = argparse.ArgumentParser("rtm3d_tpu export")
    p.add_argument("--model-config", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--with-decode", action="store_true",
                   help="include heatmap decode (peaks+vertices) in the export")
    p.add_argument(
        "--platforms", type=str, default=None,
        help="comma-separated lowering platforms (e.g. 'cpu,tpu') so one "
        "artifact serves anywhere; default: the current backend only",
    )
    p.add_argument("--set", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.model_config, args.set)
    w, h = int(cfg.INPUT_SIZE[0]), int(cfg.INPUT_SIZE[1])
    model = create_model(cfg)
    variables = load_variables(cfg, model, args.checkpoint or cfg.DETECTOR.CHECKPOINT, (w, h))

    # serve at the configured precision: bake bf16-cast weights into the
    # artifact so the exported convs hit the MXU in bf16 exactly like
    # make_detect_step (decode stays fp32)
    compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    if compute_dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype)
            if getattr(p, "dtype", None) == jnp.float32
            else p,
            variables,
        )

    def fwd(images):
        return model.apply(variables, images.astype(compute_dtype), train=False)

    if args.with_decode:
        def fn(images):
            return decode_detections(
                fwd(images),
                score_thresh=float(cfg.DETECTOR.SCORE_THRESH),
                topk=int(cfg.DETECTOR.TOPK_CANDIDATES),
                down_sample=float(cfg.MODEL.DOWN_SAMPLE),
            )
    else:
        fn = fwd

    spec = jax.ShapeDtypeStruct((args.batch_size, h, w, 3), jnp.float32)
    platforms = args.platforms.split(",") if args.platforms else None
    exported = jax.export.export(jax.jit(fn), platforms=platforms)(spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(data)
    print(
        f"exported {'detect' if args.with_decode else 'forward'} "
        f"({args.batch_size}x{h}x{w}x3) -> {args.output} ({len(data)/1e6:.1f} MB)"
    )
    return args.output


def load_exported(path: str):
    """Deserialize an exported program; call via ``.call(images)``."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))


if __name__ == "__main__":
    main()
