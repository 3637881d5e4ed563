"""Checkpoint subsystem: orbax-backed save/resume + torch .pt import.

Reference semantics: utils/check_point.py. ``save`` writes
{model, solver state, epoch, min_loss} and tags a ``last_checkpoint`` pointer
file (check_point.py:116-134, 172-175); ``load`` resolves the pointer when
``use_latest`` and aligns weights by longest-suffix key matching so partial
(e.g. ImageNet-backbone) checkpoints load into the nested model
(align_and_update_state_dicts, check_point.py:14-92). The three semantic
modes {pretrained, resume, start} (TRAINING.CHECKPOINT_MODE) are honoured —
without the reference's case-sensitivity bug (detault.py:13 'RESUME' never
matching 'resume', SURVEY.md §5).

Torch import maps the reference's / torchvision's state_dict naming onto this
framework's flax tree (rule-based translation + suffix matching fallback),
with layout conversion: conv (O,I,kh,kw)->(kh,kw,I,O), convtranspose
(I,O,kh,kw)->(kh,kw,O,I), linear (O,I)->(I,O).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None

from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


class CheckPointer:
    """Msgpack-file checkpoints with a ``last_checkpoint`` pointer.

    (Orbax's directory-per-step layout is available through ``use_orbax=True``;
    the default single-file msgpack format keeps parity with the reference's
    one-file-per-save layout, check_point.py:130-134.)
    """

    def __init__(self, save_dir: str, use_orbax: bool = False, max_to_keep: int = 5):
        """max_to_keep bounds the rolling ``model_*`` files (oldest deleted;
        ``model_best`` is never removed). The reference saves every epoch
        unboundedly (train.py:158-162) — at ~400 MB per full train state that
        exhausts a disk in a few hundred epochs."""
        self.save_dir = save_dir
        self.use_orbax = use_orbax and ocp is not None
        self.max_to_keep = max_to_keep
        os.makedirs(save_dir, exist_ok=True)

    @property
    def collective(self) -> bool:
        """True when ``save`` must be called by EVERY process: orbax saves
        are a collective operation (each process writes its addressable
        shards and the barrier spans all of them), unlike the master-only
        msgpack save of replicated state."""
        return self.use_orbax and jax.process_count() > 1

    # -- pointer file (check_point.py:156-175) --
    def _tag_file(self) -> str:
        return os.path.join(self.save_dir, "last_checkpoint")

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_file())

    def get_checkpoint_file(self) -> str:
        try:
            with open(self._tag_file()) as f:
                return f.read().strip()
        except OSError:
            return ""

    def tag_last_checkpoint(self, path: str):
        with open(self._tag_file(), "w") as f:
            f.write(path)

    # -- save/load --
    def save(self, name: str, state, epoch: int = 0, min_loss: float = float("inf"), **extra):
        if self.use_orbax:
            return self._save_orbax(name, state, epoch, min_loss)
        payload = {
            "state": jax.device_get(state),
            "epoch": epoch,
            "min_loss": min_loss,
            **extra,
        }
        path = os.path.join(self.save_dir, f"{name}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        self.tag_last_checkpoint(path)
        self._enforce_retention(keep=os.path.basename(path))
        return path

    def _save_orbax(self, name, state, epoch, min_loss):
        """Orbax directory checkpoint — multi-host / sharded-state aware
        (each process writes its addressable shards; msgpack requires
        replicated state). Collective: under jax.process_count() > 1 every
        process must make this call. Pointer tagging + retention stay
        master-only (the reference's master-only checkpointing contract,
        train_multi_gpu.py:226-230)."""
        path = os.path.abspath(os.path.join(self.save_dir, name))
        if jax.process_count() > 1:
            # align all processes BEFORE the collective save: its internal
            # consistency collectives run early, and a late-arriving process
            # would trip the fixed 30 s Gloo rendezvous deadline
            from rtm3d_tpu.parallel.mesh import sync_processes

            sync_processes(f"orbax_save:{name}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {"state": state, "meta": {"epoch": epoch, "min_loss": min_loss}},
            force=True,
        )
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            self.tag_last_checkpoint(path)
            self._enforce_retention(keep=os.path.basename(path))
        return path

    def _load_orbax(self, state_template, path):
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path),
            {"state": state_template, "meta": {"epoch": 0, "min_loss": float("inf")}},
        )
        return restored["state"], dict(restored["meta"])

    def _enforce_retention(self, keep: str):
        if not self.max_to_keep or self.max_to_keep <= 0:
            return
        rolling = sorted(
            f
            for f in os.listdir(self.save_dir)
            if f.startswith("model_")
            and not f.startswith("model_best")
            and (f.endswith(".msgpack") or os.path.isdir(os.path.join(self.save_dir, f)))
        )
        for f in rolling[: max(0, len(rolling) - self.max_to_keep)]:
            if f != keep:
                try:
                    full = os.path.join(self.save_dir, f)
                    if os.path.isdir(full):
                        import shutil

                        shutil.rmtree(full)
                    else:
                        os.remove(full)
                except OSError:
                    pass

    def load(self, state_template, path: Optional[str] = None, use_latest: bool = True):
        """Returns (state, meta) with meta = {'epoch', 'min_loss'}. If no file
        is found, returns (state_template, {}) — parity with the reference's
        'no checkpoint found' path (check_point.py:139-145)."""
        if use_latest and self.has_checkpoint():
            path = self.get_checkpoint_file()
        if not path or not os.path.exists(path):
            return state_template, {}
        if os.path.isdir(path):  # orbax directory checkpoint
            return self._load_orbax(state_template, path)
        with open(path, "rb") as f:
            data = f.read()
        template = {
            "state": jax.device_get(state_template),
            "epoch": 0,
            "min_loss": float("inf"),
        }
        payload = serialization.from_bytes(template, data)
        meta = {k: payload[k] for k in payload if k != "state"}
        return payload["state"], meta


def strip_checkpoint(src: str, dst: str, dtype: str = "bfloat16"):
    """Create a deploy checkpoint: params + batch_stats only, optionally
    downcast — the analog of the reference's optimizer-stripping + FP16
    pretrained-ckpt creation (utils/utils.py:89-110, which uses torch half).
    """
    import numpy as np

    with open(src, "rb") as f:
        raw = f.read()
    payload = serialization.msgpack_restore(raw)
    state = payload.get("state", payload)
    keep = {
        "params": state.get("params", {}),
        "batch_stats": state.get("batch_stats", {}),
    }
    if state.get("ema_params") is not None:
        # prefer the EMA shadow like the reference's CheckPointer.save
        # (check_point.py:122)
        keep["params"] = state["ema_params"]
    if dtype:
        import jax.numpy as jnp

        target = jnp.dtype(dtype)

        def conv(x):
            if hasattr(x, "dtype") and x.dtype == np.float32:
                return np.asarray(jnp.asarray(x).astype(target))
            return x

        keep = jax.tree_util.tree_map(conv, keep)
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(keep))
    return dst


# ---------------------------------------------------------------------------
# Torch state_dict import
# ---------------------------------------------------------------------------


_HEAD_BRANCHES = ("main_kf", "offset_fr_main", "main_offset", "vertex_offset", "vertex_kf")


def _to_dotted(flax_path: Tuple[str, ...]) -> str:
    """Translate a flax param path to the reference/torch naming.

    Covers: ResNet blocks ('block0' -> '0', downsample pairs), DLA
    (base/project/norm naming), ConvLevel -> torch Sequential indices
    ('layerI/conv' -> 3I, 'layerI/bn' -> 3I+1, make_conv_level layout
    torch_utils.py:194-203), header branches ('main_kf' ->
    'main_kf_header', final 'head' -> '<branch>_head', header.py:15-37),
    UpSample kernels -> 'conv_tran.weight' (module.py:7-15), fusion_up
    chains 'fusion_upL_J' -> 'fusion_upL.J'.
    """
    parts = list(flax_path)
    out = []
    i = 0
    branch = next((p for p in parts if p in _HEAD_BRANCHES), None)
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else ""
        m_layer = re.fullmatch(r"layer(\d+)", p)
        m_block = re.fullmatch(r"block(\d+)", p)
        m_fup = re.fullmatch(r"(fusion_up\d+)_(\d+)", p)
        if p == "kernel":
            if out and re.fullmatch(r"(kfpn_up\d+|fusion_up\d+(\.\d+)?)", out[-1]):
                out.append("conv_tran.weight")  # UpSample transposed conv
            else:
                out.append("weight")
        elif p == "scale":
            out.append("weight")
        elif p == "mean":
            out.append("running_mean")
        elif p == "var":
            out.append("running_var")
        elif m_layer and nxt in ("conv", "bn"):
            # ConvBNReLU #I inside a ConvLevel == torch Sequential index
            idx = int(m_layer.group(1))
            out.append(str(3 * idx) if nxt == "conv" else str(3 * idx + 1))
            i += 1  # consume the 'conv'/'bn' wrapper
            # a Conv wrapper still has an inner 'conv' module to collapse
        elif m_block:
            out.append(m_block.group(1))
        elif m_fup:
            out.append(f"{m_fup.group(1)}.{m_fup.group(2)}")
        elif p == "downsample_conv":
            out.append("downsample.0")
        elif p == "downsample_bn":
            out.append("downsample.1")
        elif p == "project_conv":
            out.append("project.0")
        elif p == "project_norm":
            out.append("project.1")
        elif p == "base_conv":
            out.append("base_layer.0")
        elif p == "base_norm":
            out.append("base_layer.1")
        elif p in _HEAD_BRANCHES and nxt in ("convs", "head"):
            out.append(f"{p}_header")
        elif p == "convs":
            pass  # HeadBranch ConvLevel wrapper: the Sequential is flat in torch
        elif p == "head" and branch:
            out.append(f"{branch}_head")
        elif p == "conv" and nxt in ("kernel", "bias"):
            pass  # Conv wrapper module: collapse (the torch conv IS the parent)
        elif p == "bn" and nxt in ("scale", "bias", "mean", "var"):
            pass  # BatchNorm wrapper: collapse
        else:
            out.append(p)
        i += 1
    return ".".join(out)


def _convert_array(torch_arr: np.ndarray, flax_shape) -> Optional[np.ndarray]:
    a = np.asarray(torch_arr)
    fs = tuple(flax_shape)
    if a.shape == fs:
        return a
    if a.ndim == 4:
        for perm in ((2, 3, 1, 0), (2, 3, 0, 1)):
            if np.transpose(a, perm).shape == fs:
                return np.transpose(a, perm)
    if a.ndim == 2 and a.T.shape == fs:
        return a.T
    return None


def load_torch_state_dict(pt_path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(pt_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def import_torch_weights(
    variables: Dict[str, Any], state_dict: Dict[str, np.ndarray], verbose: bool = False
):
    """Align a torch state_dict into flax ``variables`` by longest-suffix
    matching of dotted names (align_and_update_state_dicts parity,
    check_point.py:14-92). Returns (new_variables, report)."""
    flat_params = flatten_dict(variables["params"])
    flat_stats = flatten_dict(variables.get("batch_stats", {}))

    targets = {}
    for path, val in flat_params.items():
        targets[("params",) + path] = (_to_dotted(path), val)
    for path, val in flat_stats.items():
        targets[("batch_stats",) + path] = (_to_dotted(path), val)

    loaded, missed = [], []
    new_params = dict(flat_params)
    new_stats = dict(flat_stats)
    for full_path, (dotted, val) in targets.items():
        # longest torch key that is a suffix match with our dotted name
        best_key, best_len = None, 0
        for tk in state_dict:
            # strip DataParallel / wrapper prefixes
            tkn = tk[7:] if tk.startswith("module.") else tk
            if dotted == tkn:
                score = 3 * len(tkn)  # exact name beats any suffix match
            elif dotted.endswith("." + tkn):
                score = 2 * len(tkn)  # partial (e.g. ImageNet backbone) ckpt
            elif tkn.endswith("." + dotted):
                score = len(dotted)  # full-model ckpt into a sub-module
            else:
                continue
            if score > best_len:
                best_key, best_len = tk, score
        if best_key is None:
            missed.append(dotted)
            continue
        conv = _convert_array(state_dict[best_key], val.shape)
        if conv is None:
            missed.append(f"{dotted} (shape {state_dict[best_key].shape} vs {val.shape})")
            continue
        arr = conv.astype(np.asarray(val).dtype)
        if full_path[0] == "params":
            new_params[full_path[1:]] = arr
        else:
            new_stats[full_path[1:]] = arr
        loaded.append((dotted, best_key))
        if verbose:
            print(f"loaded {dotted:60s} <- {best_key}")

    out = dict(variables)
    out["params"] = unflatten_dict(new_params)
    if flat_stats:
        out["batch_stats"] = unflatten_dict(new_stats)
    return out, {"loaded": loaded, "missed": missed}


def _convert_array_back(flax_arr: np.ndarray, torch_shape) -> Optional[np.ndarray]:
    """Inverse of ``_convert_array``: flax layout -> torch layout. The perm
    order mirrors the import's priority ((2,3,1,0) before (2,3,0,1)) with the
    inverse permutations, so square-kernel ambiguity resolves identically and
    an import->export round trip is bit-exact."""
    a = np.asarray(flax_arr)
    ts = tuple(torch_shape)
    if a.shape == ts:
        return a
    if a.ndim == 4:
        for perm in ((3, 2, 0, 1), (2, 3, 0, 1)):
            if np.transpose(a, perm).shape == ts:
                return np.ascontiguousarray(np.transpose(a, perm))
    if a.ndim == 2 and a.T.shape == ts:
        return np.ascontiguousarray(a.T)
    return None


def export_torch_weights(
    variables: Dict[str, Any], state_dict: Dict[str, np.ndarray]
):
    """Inverse of ``import_torch_weights``: write the flax ``variables`` into
    a torch-naming ``state_dict`` template (e.g. ``twin.state_dict()``),
    using the SAME dotted-name suffix matching and the inverse layout
    conversions (conv (kh,kw,I,O)->(O,I,kh,kw), convtranspose
    (kh,kw,O,I)->(I,O,kh,kw), linear (I,O)->(O,I)).

    Template keys with no flax counterpart (e.g. ``num_batches_tracked``)
    keep their template values. Returns (new_state_dict: name->np.ndarray,
    report {exported, missed}). The caller converts to tensors for
    ``load_state_dict`` (values are numpy; ``torch.as_tensor`` suffices).

    This enables serving a checkpoint trained by THIS framework through the
    reference's torch inference stack — the reverse of the usual import
    direction (reference capability: check_point.py:14-92 loads only
    torch->torch)."""
    flat_params = flatten_dict(variables["params"])
    flat_stats = flatten_dict(variables.get("batch_stats", {}))

    sources = {}
    for path, val in flat_params.items():
        sources[_to_dotted(path)] = val
    for path, val in flat_stats.items():
        sources[_to_dotted(path)] = val

    new_sd, exported, missed = {}, [], []
    for tk, tval in state_dict.items():
        tkn = tk[7:] if tk.startswith("module.") else tk
        # longest flax dotted name that suffix-matches this torch key
        # (same scoring as import_torch_weights, direction flipped)
        best_dotted, best_len = None, 0
        for dotted in sources:
            if dotted == tkn:
                score = 3 * len(tkn)
            elif dotted.endswith("." + tkn):
                score = 2 * len(tkn)
            elif tkn.endswith("." + dotted):
                score = len(dotted)
            else:
                continue
            if score > best_len:
                best_dotted, best_len = dotted, score
        if best_dotted is None:
            new_sd[tk] = np.asarray(tval)  # e.g. num_batches_tracked
            missed.append(tkn)
            continue
        conv = _convert_array_back(
            np.asarray(sources[best_dotted]), np.asarray(tval).shape
        )
        if conv is None:
            new_sd[tk] = np.asarray(tval)
            missed.append(
                f"{tkn} (shape {np.asarray(sources[best_dotted]).shape} vs "
                f"{np.asarray(tval).shape})"
            )
            continue
        new_sd[tk] = conv.astype(np.asarray(tval).dtype)
        exported.append((tkn, best_dotted))
    return new_sd, {"exported": exported, "missed": missed}
