"""Typed hierarchical configuration with reference-format importers.

The reference scatters configuration across four mechanisms (SURVEY.md
section 5 "Config / flag system"): OpenCV-YAML per-sensor param files
(`%YAML:1.0` headers), gflags files, roslaunch arg trees, and tmuxp env
vars. Here everything funnels into one typed dict; the importers below let
the reference's `params/D455/*.yaml` and `flags/*.flags` replay unchanged.
"""

from __future__ import annotations

import os
import re
from typing import Any


def load_opencv_yaml(path: str) -> dict[str, Any]:
    """Parse an OpenCV-YAML parameter file (the `%YAML:1.0` dialect used
    by params/D455/*.yaml — flat key: value pairs, `#` comments, and the
    occasional inline list `[a, b, c]` or OpenCV matrix block)."""
    out: dict[str, Any] = {}
    with open(path) as f:
        txt = f.read()
    # strip the %YAML:1.0 header and document markers
    lines = [
        ln for ln in txt.splitlines()
        if not ln.strip().startswith("%YAML") and ln.strip() != "---"
    ]
    i = 0
    while i < len(lines):
        ln = lines[i].split("#", 1)[0].rstrip()
        i += 1
        m = re.match(r"^(\w[\w.]*):\s*(.*)$", ln.strip())
        if not m:
            continue
        key, val = m.group(1), m.group(2).strip()
        if val == "":
            # possibly an OpenCV matrix block (rows/cols/dt/data) — collect
            block: dict[str, Any] = {}
            while i < len(lines):
                sub = lines[i].split("#", 1)[0].strip()
                sm = re.match(r"^(\w+):\s*(.*)$", sub)
                if not sm or not lines[i].startswith((" ", "\t")):
                    break
                bkey, bval = sm.group(1), sm.group(2).strip()
                if bval.startswith("["):
                    while "]" not in bval and i + 1 < len(lines):
                        i += 1
                        bval += " " + lines[i].strip()
                block[bkey] = _parse_value(bval)
                i += 1
            out[key] = block if block else None
            continue
        if val.startswith("["):
            while "]" not in val and i < len(lines):
                val += " " + lines[i].strip()
                i += 1
        out[key] = _parse_value(val)
    return out


def _parse_value(val: str) -> Any:
    val = val.strip().strip('"')
    if val.startswith("[") and val.endswith("]"):
        inner = val[1:-1].strip()
        if not inner:
            return []
        return [_parse_value(x) for x in inner.split(",")]
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    return val


def load_gflags(path: str) -> dict[str, Any]:
    """Parse a gflags file (`--flag=value` lines, `#` comments) — the
    format of params/D455/flags/*.flags."""
    out: dict[str, Any] = {}
    with open(path) as f:
        for ln in f:
            ln = ln.split("#", 1)[0].strip()
            m = re.match(r"^--(\w+)(?:=(.*))?$", ln)
            if not m:
                continue
            key, val = m.group(1), m.group(2)
            if val is None:
                # --flag / --noflag boolean forms
                if key.startswith("no"):
                    out[key[2:]] = False
                else:
                    out[key] = True
            else:
                out[key] = _parse_value(val)
    return out


def load_params_folder(folder: str) -> dict[str, dict[str, Any]]:
    """Load a full reference params folder (e.g. params/D455): every
    *.yaml file keyed by stem + merged gflags under 'flags'."""
    out: dict[str, dict[str, Any]] = {}
    for name in sorted(os.listdir(folder)):
        p = os.path.join(folder, name)
        if name.endswith(".yaml"):
            out[name[:-5]] = load_opencv_yaml(p)
    flags_dir = os.path.join(folder, "flags")
    if os.path.isdir(flags_dir):
        merged: dict[str, Any] = {}
        for name in sorted(os.listdir(flags_dir)):
            if name.endswith(".flags"):
                merged.update(load_gflags(os.path.join(flags_dir, name)))
        out["flags"] = merged
    return out


def lcd_params_from_reference(folder: str):
    """Build frontend LcdParams + verification thresholds from a reference
    params folder (LcdParams.yaml keys -> framework config)."""
    from ..frontend.dlc import FrontendConfig
    from ..frontend.lcd import LcdParams

    y = load_opencv_yaml(os.path.join(folder, "LcdParams.yaml"))
    lcd = LcdParams(
        alpha=float(y.get("alpha", 0.4)),
        min_nss_factor=float(y.get("min_nss_factor", 0.05)),
        max_db_results=int(y.get("max_db_results", 50)),
        recent_frames_window=int(y.get("recent_frames_window", 100)),
        max_intraisland_gap=int(y.get("max_intraisland_gap", 3)),
        max_nrFrames_between_islands=int(
            y.get("max_nrFrames_between_islands", 3)),
        min_temporal_matches=int(y.get("min_temporal_matches", 1)),
        use_nss=bool(y.get("use_nss", 1)),
    )
    return FrontendConfig(
        lcd=lcd,
        lowe_ratio=float(y.get("lowe_ratio", 0.7)),
        ransac_hyp=int(y.get("ransac_max_iterations", 500)),
        mono_threshold=float(y.get("ransac_threshold_2d2d", 1e-6)),
        stereo_threshold=float(y.get("ransac_threshold_3d3d", 0.3)),
        min_mono_inliers=int(y.get("min_nr_2d2d_inliers", 10)),
        min_stereo_inliers=int(y.get("min_nr_3d3d_inliers", 5)),
    )
