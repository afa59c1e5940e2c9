"""Generate PARITY.md: exact-vs-rect error-budget table per preset.

CPU (default; add the repo root AND the axon site to PYTHONPATH on TPU):

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/parity_presets.py
    ... --scale full     # 480x640 rows (slow on CPU; fine on TPU)
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("small", "medium", "full"),
                    default="medium")
    ap.add_argument("--presets", nargs="*",
                    default=["middlebury", "dtu_fast", "dtu_accurate"])
    ap.add_argument("--textures", nargs="*", default=["sos", "noise"],
                    help="utils/synthetic.TEXTURES keys; 'noise' is the "
                         "aperiodic band-limited gate texture (VERDICT r3 "
                         "item 6)")
    ap.add_argument("--two_stage_rows", action="store_true",
                    help="add rect_two_stage_cull rows for middlebury + "
                         "dtu_fast (the round-4 semantics change)")
    ap.add_argument("--hard_scene_rows", action="store_true",
                    help="add the hard-scene cull-gate section (round 5: "
                         "occluding discontinuity, textureless patch, "
                         "low contrast — eval/parity.run_cull_hard_scene)")
    ap.add_argument("--only_hard", action="store_true",
                    help="update ONLY the hard-scene section, keeping the "
                         "existing preset table untouched")
    ap.add_argument("--out", default=str(ROOT / "PARITY.md"))
    args = ap.parse_args()

    from gipuma_tpu.eval.parity import (format_hard_scene_markdown,
                                        format_markdown,
                                        run_cull_hard_scene,
                                        run_preset_parity)

    shape = {"small": (96, 128), "medium": (192, 256),
             "full": (480, 640)}[args.scale]
    ap2 = args.two_stage_rows
    rows = []
    if not args.only_hard:
        for preset in args.presets:
            for tex in args.textures:
                r = run_preset_parity(preset, *shape, texture=tex)
                rows.append(r)
                print(json.dumps(r))
                if ap2 and preset in ("middlebury", "dtu_fast"):
                    r = run_preset_parity(preset, *shape, texture=tex,
                                          two_stage=True)
                    rows.append(r)
                    print(json.dumps(r))

    hard_md = ""
    if args.hard_scene_rows:
        hrows = []
        for kind in ("two_plane", "textureless_patch", "low_contrast"):
            hr = run_cull_hard_scene(kind)
            hrows.append(hr)
            print(json.dumps(hr))
        hard_md = "\n" + format_hard_scene_markdown(hrows)

    out = Path(args.out)
    tail = ""
    if args.only_hard:
        # Keep the existing preset table + analysis; only the hard-scene
        # section is (re)generated.
        assert out.exists(), "--only_hard needs an existing PARITY.md"
        old = out.read_text()
        k = old.find("\n## ")
        md = old[:k] if k >= 0 else old
        tail = old[k:] if k >= 0 else ""
    else:
        md = format_markdown(rows)
        if out.exists():
            # Preserve hand-written analysis sections ("## ..." onward).
            old = out.read_text()
            k = old.find("\n## ")
            if k >= 0:
                tail = old[k:]
    if hard_md:
        # Replace any previously generated hard-scene section in the tail.
        hk = tail.find("## Two-stage-cull gate on hard scenes")
        if hk >= 0:
            nxt = tail.find("\n## ", hk)
            tail = (tail[:hk] + tail[nxt + 1:]) if nxt >= 0 \
                else tail[:hk].rstrip() + "\n"
    out.write_text(md + tail + hard_md)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
