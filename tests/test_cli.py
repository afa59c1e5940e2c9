"""CLI end-to-end: batch over all views, fusion (in-memory and the
disk-fallback path a resumed/distributed invocation takes)."""
import numpy as np

from gipuma_tpu.cli import main
from gipuma_tpu.io.vis import save_png
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def _write_scene(tmp_path, num_cams=4, h=48, w=64):
    images, _, _, _ = plane_scene(num_cams=num_cams, h=h, w=w, focal=90.0,
                                  plane_depth=5.0)
    Ps = make_ring_P(num_cams, h, w, 90.0, target_depth=5.0)
    pdir = tmp_path / "cams"
    pdir.mkdir()
    names = []
    for i, (im, P) in enumerate(zip(images, Ps)):
        name = f"cam{i:03d}.png"
        save_png(tmp_path / name, np.clip(im, 0, 255).astype(np.uint8))
        (pdir / f"{name}.P").write_text(
            "\n".join(" ".join(f"{v:.10g}" for v in row) for row in P))
        names.append(name)
    return names, str(pdir)


def _flags(tmp_path, pdir, out):
    return ["-images_folder", str(tmp_path), "-p_folder", pdir,
            "-output_folder", str(out),
            "-blocksize", "7", "--iterations", "1",
            "--depth_min", "3.0", "--depth_max", "8.0",
            "--min_angle", "0.01", "--max_angle", "60.0"]


def test_cli_batch_and_fuse(tmp_path):
    names, pdir = _write_scene(tmp_path)
    out = tmp_path / "res"
    rc = main(_flags(tmp_path, pdir, out) + names
              + ["--all_views", "--fuse", "--num_consistent", "1",
                 "--disp_thresh", "2.0", "--normal_thresh", "60"])
    assert rc == 0
    run_dir = next(out.iterdir())          # timestamped subdir
    assert (run_dir / "fused.ply").exists()
    for n in names:
        assert (run_dir / n.replace(".png", "") / "disp.dmb").exists()


def test_cli_distributed_resume_fuses_from_disk(tmp_path):
    """--distributed: no timestamp subdir; a second invocation finds all
    views done (results == []) and fuses from the on-disk dmb maps."""
    names, pdir = _write_scene(tmp_path)
    out = tmp_path / "res"
    base = _flags(tmp_path, pdir, out) + names + ["--all_views",
                                                  "--distributed"]
    assert main(base) == 0
    assert (out / "cam000" / "disp.dmb").exists()   # no timestamp level
    rc = main(base + ["--fuse", "--num_consistent", "1",
                      "--disp_thresh", "2.0", "--normal_thresh", "60"])
    assert rc == 0
    assert (out / "fused.ply").exists()


def test_algorithm_flag_roundtrip():
    """-a pm|ct maps to MatchingAlgorithm (reference main.cpp:225-241)."""
    from gipuma_tpu.cli import build_parser, params_from_args
    from gipuma_tpu.config import MatchingAlgorithm

    args = build_parser().parse_args(["-a", "ct", "--census_epsilon", "3.0",
                                      "x.png"])
    p = params_from_args(args)
    assert p.algorithm == MatchingAlgorithm.CENSUS
    assert p.census_epsilon == 3.0
    args = build_parser().parse_args(["-a", "pm", "x.png"])
    assert params_from_args(args).algorithm == MatchingAlgorithm.PM
    # default: PM
    args = build_parser().parse_args(["x.png"])
    assert params_from_args(args).algorithm == MatchingAlgorithm.PM


def test_cli_census_end_to_end(tmp_path):
    """-a ct end-to-end on the rect path: the census engine produces a
    sane depth map via the CLI."""
    from gipuma_tpu.io.dmb import read_dmb

    names, pdir = _write_scene(tmp_path)
    out = tmp_path / "res_ct"
    rc = main(_flags(tmp_path, pdir, out) + names
              + ["-a", "ct", "--cost_path", "rect"])
    assert rc == 0
    import os
    sub = [d for d in os.listdir(out)][0]
    d = np.asarray(read_dmb(out / sub / "cam000" / "disp.dmb"))
    valid = d > 0
    assert valid.mean() > 0.5
    assert abs(np.median(d[valid]) - 5.0) < 1.0


def test_cli_batch_gt_eval(tmp_path):
    """Batch (--all_views) GT evaluation with a per-view {name} template
    (VERDICT r3 item 8 — the reference evaluates per run inside every
    script-loop invocation, main.cpp:1087-1163): every view dir gets an
    error PNG and results.txt metric lines."""
    from gipuma_tpu.io.pfm import write_pfm
    from gipuma_tpu.utils.synthetic import intersect_plane

    images, _, _, (n_pl, d_pl) = plane_scene(num_cams=4, h=48, w=64,
                                             focal=90.0, plane_depth=5.0)
    Ps = make_ring_P(4, 48, 64, 90.0, target_depth=5.0)
    names, pdir = _write_scene(tmp_path)
    gtdir = tmp_path / "gt"
    gtdir.mkdir()
    for i, P in enumerate(Ps):
        _, dep = intersect_plane(P, 48, 64, n_pl, d_pl)
        write_pfm(gtdir / f"cam{i:03d}.pfm", dep.astype(np.float32))

    out = tmp_path / "res_gt"
    rc = main(_flags(tmp_path, pdir, out) + names
              + ["--all_views", "-gt", str(gtdir / "{name}.pfm"),
                 "--gt_tol", "0.5"])
    assert rc == 0
    run_dir = next(out.iterdir())
    for n in names:
        vdir = run_dir / n.replace(".png", "")
        assert (vdir / "gt_error.png").exists()
        txt = (vdir / "results.txt").read_text()
        assert "error_rate_tol0.5" in txt
        assert "mean_abs_error" in txt


def test_cli_gt_division_factor(tmp_path):
    """--gtDepth_divisionFactor (main.h:34-35, groundTruthUtils.h:38):
    GT images storing disparity*divFactor are divided at load, and the
    raw 0 no-GT marker stays invalid.  A GT file scaled by 4 with the
    flag must reproduce the unscaled error rate; without the flag the
    rate is (catastrophically) different."""
    from gipuma_tpu.io.pfm import write_pfm
    from gipuma_tpu.utils.synthetic import intersect_plane

    Ps = make_ring_P(4, 48, 64, 90.0, target_depth=5.0)
    names, pdir = _write_scene(tmp_path)
    _, dep = intersect_plane(Ps[0], 48, 64, *plane_scene(
        num_cams=1, h=48, w=64, focal=90.0, plane_depth=5.0)[3])
    dep = dep.astype(np.float32)
    dep[:4] = 0.0                       # no-GT marker rows
    write_pfm(tmp_path / "gt_x4.pfm", dep * 4.0)
    write_pfm(tmp_path / "gt_x1.pfm", dep)

    def run(extra, out):
        rc = main(_flags(tmp_path, pdir, out) + names + extra)
        assert rc == 0
        run_dir = next(out.iterdir())
        txt = (run_dir / "cam000" / "results.txt").read_text()
        line = [l for l in txt.splitlines()
                if l.startswith("error_rate_tol")][0]
        return float(line.split()[-1])

    r_plain = run(["-gt", str(tmp_path / "gt_x1.pfm"), "--gt_tol", "0.5"],
                  tmp_path / "o1")
    r_div = run(["-gt", str(tmp_path / "gt_x4.pfm"), "--gt_tol", "0.5",
                 "--gtDepth_divisionFactor", "4"], tmp_path / "o2")
    r_wrong = run(["-gt", str(tmp_path / "gt_x4.pfm"), "--gt_tol", "0.5"],
                  tmp_path / "o3")
    assert abs(r_div - r_plain) < 1e-9
    assert r_wrong > r_plain + 0.5
