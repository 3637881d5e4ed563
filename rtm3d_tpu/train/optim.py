"""Optimizer + LR schedule, replicating the reference solver semantics.

Reference: solver/OptimizerBuilder.py:13-36 (per-parameter groups with a
name-based policy, optimizer hard-coded to torch Adamax with coupled L2
weight decay), solver/lr_scheduler.py (detectron2-style warmup multistep /
cosine, stepped EVERY ITERATION per solver/Solver.py:99).

The Adamax update matches torch exactly:
    m   = b1*m + (1-b1)*g
    u   = max(b2*u, |g| + eps)
    p  -= lr_t * m / ((1 - b1^t) * u)
with g pre-augmented by the coupled decay g += wd * p.

Param-group policy: BN scale/bias -> WEIGHT_DECAY_NORM; other biases ->
BIAS_LR_FACTOR * lr + WEIGHT_DECAY_BIAS; everything else -> WEIGHT_DECAY;
EXCLUDE_SCOPE path prefixes are frozen. (Divergence note: the reference's
norm rule matches only modules literally named ``norm*`` — an artifact of
attribute naming that misses Sequential-wrapped BNs, OptimizerBuilder.py:22 —
here ALL BatchNorm parameters are classified as norm params.)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from rtm3d_tpu.config import Config


# ---------------------------------------------------------------------------
# LR schedules (iteration-based)
# ---------------------------------------------------------------------------


def warmup_factor_at(step, method: str, warmup_iters: int, warmup_factor: float):
    """lr_scheduler.py:90-116, branch-free."""
    step = jnp.asarray(step, jnp.float32)
    if method == "constant":
        wf = jnp.full_like(step, warmup_factor)
    elif method == "linear":
        alpha = step / max(warmup_iters, 1)
        wf = warmup_factor * (1 - alpha) + alpha
    else:
        raise ValueError(f"unknown warmup method {method}")
    return jnp.where(step >= warmup_iters, 1.0, wf)


def warmup_multistep_schedule(base_lr, steps, gamma, warmup_factor, warmup_iters, method="linear"):
    """lr = base * warmup(iter) * gamma^(#milestones passed) (lr_scheduler.py:16-50)."""
    milestones = jnp.asarray(sorted(steps), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wf = warmup_factor_at(step, method, warmup_iters, warmup_factor)
        n_passed = jnp.sum(step >= milestones)
        return base_lr * wf * jnp.power(gamma, n_passed.astype(jnp.float32))

    return schedule


def warmup_cosine_schedule(base_lr, max_iters, warmup_factor, warmup_iters, method="linear"):
    """lr = base * warmup(iter) * 0.5*(1+cos(pi*iter/max)) (lr_scheduler.py:52-87)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wf = warmup_factor_at(step, method, warmup_iters, warmup_factor)
        return base_lr * wf * 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_iters))

    return schedule


def build_lr_schedule(cfg: Config, max_iters: int | None = None):
    """Dispatch by SOLVER.LR_SCHEDULER_NAME (OptimizerBuilder.py:39-64)."""
    s = cfg.SOLVER
    if s.LR_SCHEDULER_NAME == "WarmupMultiStepLR":
        return warmup_multistep_schedule(
            s.BASE_LR, tuple(s.STEPS), s.GAMMA, s.WARMUP_FACTOR, s.WARMUP_ITERS, s.WARMUP_METHOD
        )
    if s.LR_SCHEDULER_NAME == "WarmupCosineLR":
        return warmup_cosine_schedule(
            s.BASE_LR, max_iters or s.get("MAX_ITER", 100000), s.WARMUP_FACTOR, s.WARMUP_ITERS, s.WARMUP_METHOD
        )
    raise ValueError(f"Unknown LR scheduler: {s.LR_SCHEDULER_NAME}")


# ---------------------------------------------------------------------------
# Param-group classification over the flax param tree
# ---------------------------------------------------------------------------

_NORM_LEAVES = {"scale"}  # BN scale is unambiguous
_NORM_MODULE_HINTS = ("bn", "norm")


def _classify(path) -> str:
    keys = [getattr(k, "key", str(k)) for k in path]
    leaf = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    is_norm_module = any(h in parent.lower() for h in _NORM_MODULE_HINTS)
    if leaf in _NORM_LEAVES or (leaf == "bias" and is_norm_module):
        return "norm"
    if leaf == "bias":
        return "bias"
    return "weight"


def param_groups(params, exclude_scopes=()):
    """Tree of group labels ('norm'|'bias'|'weight'|'frozen') matching params."""

    def label(path, _):
        dotted = "/".join(getattr(k, "key", str(k)) for k in path)
        if any(dotted.startswith(scope) for scope in exclude_scopes):
            return "frozen"
        return _classify(path)

    return jax.tree_util.tree_map_with_path(label, params)


class AdamaxState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    u: optax.Updates


def adamax_groups(
    lr_schedule,
    wd_tree,
    lr_mult_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Torch-parity Adamax with per-leaf coupled weight decay and lr factor."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamaxState(jnp.zeros([], jnp.int32), z, jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        assert params is not None, "adamax_groups needs params (coupled decay)"
        count = state.count + 1
        g = jax.tree_util.tree_map(lambda gr, p, wd: gr + wd * p, grads, params, wd_tree)
        m = jax.tree_util.tree_map(lambda mm, gr: b1 * mm + (1 - b1) * gr, state.m, g)
        u = jax.tree_util.tree_map(
            lambda uu, gr: jnp.maximum(b2 * uu, jnp.abs(gr) + eps), state.u, g
        )
        bc = 1.0 - b1 ** count.astype(jnp.float32)
        lr = lr_schedule(count - 1)  # torch scheduler value used for step t is pre-step
        updates = jax.tree_util.tree_map(
            lambda mm, uu, mult: -(lr * mult) * mm / (bc * uu), m, u, lr_mult_tree
        )
        return updates, AdamaxState(count, m, u)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: Config, params, max_iters: int | None = None):
    """Returns (optax transformation, lr_schedule). Mirrors
    OptimizerBuilder.build_optimizer + build_lr_scheduler."""
    s = cfg.SOLVER
    groups = param_groups(params, tuple(s.EXCLUDE_SCOPE))
    wd_by_group = {
        "weight": s.WEIGHT_DECAY,
        "bias": s.WEIGHT_DECAY_BIAS,
        "norm": s.WEIGHT_DECAY_NORM,
        "frozen": 0.0,
    }
    mult_by_group = {
        "weight": 1.0,
        "bias": s.BIAS_LR_FACTOR,
        "norm": 1.0,
        "frozen": 0.0,  # frozen params get zero update
    }
    wd_tree = jax.tree_util.tree_map(lambda gr: wd_by_group[gr], groups)
    mult_tree = jax.tree_util.tree_map(lambda gr: mult_by_group[gr], groups)
    schedule = build_lr_schedule(cfg, max_iters)
    tx = adamax_groups(schedule, wd_tree, mult_tree)
    accum = int(s.get("ACCUMULATE_STEPS", 1) or 1)
    if accum > 1:
        # gradient accumulation (the reference's dead solver computed but
        # never used `subdivisions`, train_multi_gpu.py:67-69 / solver.py:65)
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
