"""Param pytree persistence (.npz with dotted-path keys) + model config JSON.

This replaces the reference's "model files" (3 ONNX protos + tokens.txt):
a model directory here holds

    config.json    — model_type + per-family hyperparameters (the analogue of
                     the reference's ONNX CustomMetadataMap source of truth,
                     OnlineModel.cs:32-183)
    params.npz     — flat { "encoder.layers.0.attn.q.w": array, ... }
    tokens.txt     — identical format to the reference

``convert/importer.py`` produces this layout from reference ONNX exports.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np


def flatten_params(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    def visit(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(v, f"{path}.{i}" if path else str(i))
        else:
            out[path] = np.asarray(node)

    visit(tree, prefix)
    return out


def unflatten_params(flat: dict[str, np.ndarray]) -> Any:
    """Rebuild nested dict/list structure from dotted paths (numeric path
    components become list indices)."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, tree: Any, dtype: str = "float32") -> None:
    """dtype="int8": symmetric per-tensor quantization of float leaves
    (>=2-D, >=1024 elements) with the scale stored alongside — the storage
    analogue of the reference's int8 ONNX models.  Dequantized on load."""
    flat = flatten_params(tree)
    if dtype == "int8":
        out: dict[str, np.ndarray] = {}
        for k, v in flat.items():
            if v.dtype.kind == "f" and v.ndim >= 2 and v.size >= 1024:
                scale = np.abs(v).max() / 127.0 or 1.0
                out[k + "::q8"] = np.round(v / scale).astype(np.int8)
                out[k + "::scale"] = np.float32(scale)
            else:
                out[k] = v
        flat = out
    np.savez(path, **flat)


def load_params(path: str, device=None) -> Any:
    with np.load(path) as data:
        flat: dict[str, np.ndarray] = {}
        for k in data.files:
            if k.endswith("::q8"):
                base = k[: -len("::q8")]
                flat[base] = data[k].astype(np.float32) * data[base + "::scale"]
            elif k.endswith("::scale"):
                continue
            else:
                flat[k] = data[k]
    tree = unflatten_params(flat)
    if device is not None:
        tree = jax.device_put(tree, device)
    return tree


def save_config(path: str, model_type: str, configs: dict[str, Any]) -> None:
    """configs: {"encoder": EncoderConfig, "decoder": ..., "joiner": ...,
    "ctc": ..., "frontend": FbankConfig} (None values skipped)."""
    payload: dict[str, Any] = {"model_type": model_type}
    for name, cfg in configs.items():
        if cfg is not None:
            payload[name] = dataclasses.asdict(cfg)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def load_config(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def model_dir_files(model_dir: str, accuracy: str = "") -> dict[str, str]:
    """Locate config/params/tokens in a model directory (the analogue of the
    reference Examples' file discovery, which prefers ``*.{accuracy}.*``
    files — Examples/OnlineRecognizer.cs:41-77).  ``accuracy`` (e.g.
    "int8") selects ``params.int8.npz`` when present."""
    params = os.path.join(model_dir, "params.npz")
    if accuracy:
        preferred = os.path.join(model_dir, f"params.{accuracy}.npz")
        if os.path.exists(preferred):
            params = preferred
    files = {
        "config": os.path.join(model_dir, "config.json"),
        "params": params,
        "tokens": os.path.join(model_dir, "tokens.txt"),
    }
    missing = [k for k, v in files.items() if not os.path.exists(v)]
    if missing:
        raise FileNotFoundError(f"model dir {model_dir} missing: {missing}")
    return files
