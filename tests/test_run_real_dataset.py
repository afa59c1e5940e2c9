"""scripts/run_real_dataset.sh dry-run (VERDICT r2 #6): against a synthetic
folder laid out EXACTLY like a real Middlebury download (PNG images +
*_par.txt KRt file), the one-command script must autodetect the layout, run
per-view depth + fusion through the CLI, and leave the standard artifacts.
Real tarballs dropped per DATA_REQUEST.md go through the identical path."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from gipuma_tpu.io.vis import save_png
from gipuma_tpu.utils.synthetic import look_at_R, plane_scene

REPO = Path(__file__).resolve().parents[1]


def _write_middlebury_folder(folder: Path, num_cams=4, h=48, w=64,
                             focal=100.0, plane_depth=5.0):
    """Synthetic scene in the Middlebury MVS archive layout: per-image PNG
    plus a *_par.txt with 'name K(9) R(9) t(3)' lines (fileIoUtils.h:111)."""
    images, rig, gt, _ = plane_scene(num_cams=num_cams, h=h, w=w,
                                     focal=focal, plane_depth=plane_depth,
                                     slant=(0.15, -0.1))
    K = np.array([[focal, 0.0, w / 2.0],
                  [0.0, focal, h / 2.0],
                  [0.0, 0.0, 1.0]])
    target = np.array([0.0, 0.0, plane_depth])
    lines = [str(num_cams)]
    for i in range(num_cams):
        if i == 0:
            eye = np.zeros(3)
        else:
            ang = 2.0 * np.pi * (i - 1) / max(num_cams - 1, 1)
            eye = np.array([0.4 * np.cos(ang), 0.4 * np.sin(ang), 0.0])
        R = look_at_R(eye, target)
        t = -R @ eye
        name = f"synth{i:04d}.png"
        save_png(folder / name,
                 np.clip(images[i], 0, 255).astype(np.uint8))
        vals = list(K.ravel()) + list(R.ravel()) + list(t.ravel())
        lines.append(name + " " + " ".join(f"{v:.9g}" for v in vals))
    (folder / "synth_par.txt").write_text("\n".join(lines) + "\n")
    return gt


def test_run_real_dataset_dry_run(tmp_path):
    data = tmp_path / "dinoSynthetic"
    data.mkdir()
    _write_middlebury_folder(data)
    out = tmp_path / "out"

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # Tiny overrides keep the dry-run in CI time; layout detection, batch
    # loop, fusion, and artifact writing are exactly the real-data path.
    r = subprocess.run(
        ["bash", str(REPO / "scripts/run_real_dataset.sh"), str(data),
         str(out), "middlebury", "-blocksize", "7", "--iterations", "1",
         "--depth_min", "3", "--depth_max", "8", "--min_angle", "1"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "Middlebury KRt" in r.stdout

    views = sorted(out.rglob("disp.dmb"))
    assert len(views) == 4, sorted(out.rglob("*"))
    for v in views:
        assert (v.parent / "normals.dmb").exists()
    assert len(list(out.rglob("fused.ply"))) == 1
