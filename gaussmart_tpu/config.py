"""Configuration system.

Dataclass equivalents of the reference's reflection-based ParamGroups
(arguments/__init__.py:19-96) with the same flag surface: every field becomes
a ``--flag``; fields listed in ``_shorthand`` also get a one-letter alias.
Saved configs round-trip through JSON (the reference `eval()`s a repr'd
Namespace — arguments/__init__.py:112 — which we deliberately do not
reproduce; see SURVEY.md §7.11).
"""
from __future__ import annotations

import dataclasses
import json
import os
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelParams:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = False
    render_items: List[str] = field(default_factory=lambda: [
        "RGB", "Alpha", "Normal", "Depth", "Edge", "Curvature"])
    uniform_upsampling: bool = False
    _shorthand = ("source_path", "model_path", "images", "resolution",
                  "white_background")

    def finalize(self):
        if self.source_path:
            self.source_path = os.path.abspath(self.source_path)
        return self


@dataclass
class PipelineParams:
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    depth_ratio: float = 0.0
    debug: bool = False
    # TPU-specific: which rasterizer backend to use ("auto"|"pallas"|"dense")
    backend: str = "auto"
    _shorthand = ()


@dataclass
class OptimizationParams:
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_dist: float = 0.0
    # EXTENSION (not in the reference): linear ramp length for lambda_dist
    # after its iter-3000 gate (0 = reference parity, full weight at once).
    # The DTU-mesh recipe's lambda_dist=1000 step at iter 3000 destabilizes
    # sparse-view scenes (BASELINE.md round-2 table); a ramp reaches the
    # same weight gradually: lam = lambda_dist * clip((it-3000)/ramp, 0, 1)
    lambda_dist_ramp: int = 0
    # EXTENSION: cap on the raw per-view mean distortion entering the dist
    # loss (0 = reference parity, no cap). Bounds the per-step injection of
    # grazing views whose raw distortion runs ~170x the healthy-view scale
    # (BASELINE.md "DTU-mesh recipe instability: root cause")
    lambda_dist_clip: float = 0.0
    lambda_normal: float = 0.05
    lambda_segment: float = 0.05   # parity: parsed but unused (SURVEY.md §7.4)
    opacity_cull: float = 0.05
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    _shorthand = ()


_GROUPS = {
    "model": ModelParams,
    "pipeline": PipelineParams,
    "optimization": OptimizationParams,
}


def add_group_args(parser: ArgumentParser, cls, sentinel: bool = False):
    """Register a dataclass's fields as CLI flags (ParamGroup equivalent)."""
    shorthand = set(getattr(cls, "_shorthand", ()))
    defaults = cls()
    for f in dataclasses.fields(cls):
        default = None if sentinel else getattr(defaults, f.name)
        names = ["--" + f.name]
        if f.name in shorthand:
            names.append("-" + f.name[0])
        ftype = f.type if isinstance(f.type, type) else type(getattr(defaults, f.name))
        if ftype is bool:
            parser.add_argument(*names, default=default, action="store_true")
        elif ftype is list or isinstance(getattr(defaults, f.name), list):
            parser.add_argument(*names, nargs="+", default=default)
        else:
            parser.add_argument(*names, default=default, type=ftype)


def extract_group(args: Namespace, cls):
    known = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in vars(args).items() if k in known and v is not None}
    obj = cls(**kwargs)
    if hasattr(obj, "finalize"):
        obj.finalize()
    return obj


def save_cfg(model_path: str, args: Namespace):
    os.makedirs(model_path, exist_ok=True)
    payload = {k: v for k, v in vars(args).items()
               if isinstance(v, (int, float, str, bool, list, type(None)))}
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(payload, f, indent=2)


def load_cfg(model_path: str) -> Optional[dict]:
    path = os.path.join(model_path, "cfg_args.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """Merge CLI args with the saved training config (safe-JSON version of
    arguments/__init__.py:98-118)."""
    args_cmdline = parser.parse_args(argv)
    merged = {}
    saved = load_cfg(getattr(args_cmdline, "model_path", "") or "")
    if saved:
        merged.update(saved)
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
