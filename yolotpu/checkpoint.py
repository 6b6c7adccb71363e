"""Checkpoint/resume for training state.

The reference has no checkpointing (inference-only; its only resume story is
pipeline stage re-entry, ``run_pipeline.py:866-888``). Training here gets a
real one: atomic .npz checkpoints of (params, velocity, step) with
latest-symlink semantics and resumable loading, plus export to the
reference's weight artifact contract so a trained model drops into any
consumer of ``weights.bin``/``bias.bin``.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in sorted(tree.items()):
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(ckpt_dir: str, step: int, params: dict,
                    velocity: dict | None = None, keep: int = 3) -> str:
    """Atomic write of step state; prunes old checkpoints beyond ``keep``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = {"step": np.asarray(step)}
    flat.update(_flatten(params, "params/"))
    if velocity is not None:
        flat.update(_flatten(velocity, "velocity/"))
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    os.close(fd)
    np.savez(tmp, **flat)           # numpy appends .npz to names without it
    written = tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp
    os.replace(written, path)
    if os.path.exists(tmp):
        os.remove(tmp)
    # prune
    ckpts = sorted(p for p in os.listdir(ckpt_dir)
                   if p.startswith("ckpt_") and p.endswith(".npz"))
    for old in ckpts[:-keep]:
        os.remove(os.path.join(ckpt_dir, old))
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(p for p in os.listdir(ckpt_dir)
                   if p.startswith("ckpt_") and p.endswith(".npz"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def load_checkpoint(path: str) -> tuple[int, dict, dict | None]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("step"))
    tree = _unflatten(flat)
    return step, tree.get("params", {}), tree.get("velocity")


def export_weight_artifacts(params: dict, spec, out_dir: str) -> None:
    """HWIO fp32 params -> the reference's weights.bin/bias.bin contract."""
    from .weights import WeightStore
    store = WeightStore(spec=spec)
    for l in spec.conv_layers():
        p = params[f"conv{l.idx}"]
        w = np.asarray(p["w"]).transpose(3, 2, 0, 1)  # HWIO -> (n,c,k,k)
        store.fp32[l.idx] = (np.ascontiguousarray(w, np.float32),
                             np.asarray(p["b"], np.float32))
    store.save_fp32(out_dir)
