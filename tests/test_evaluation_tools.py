"""Tests for evaluation tooling, trajectories, drawing, and ply export."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest


def test_evaluation_index_generator():
    from pixelsplat_tpu.evaluation.evaluation_index_generator import (
        EvaluationIndexGenerator,
        EvaluationIndexGeneratorCfg,
        expand_to_video_index,
    )

    # A linear dolly: overlap decreases with distance.
    v = 40
    extrinsics = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    extrinsics[:, 0, 3] = np.arange(v) * 0.15
    intrinsics = np.tile(
        np.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32), (v, 1, 1)
    )
    cfg = EvaluationIndexGeneratorCfg(
        num_target_views=3,
        min_distance=3,
        max_distance=20,
        min_overlap=0.2,
        max_overlap=1.0,
        output_path=Path("/tmp/test_eval_index"),
        save_previews=False,
        seed=0,
    )
    gen = EvaluationIndexGenerator(cfg)
    gen.process_scene("scene_a", extrinsics, intrinsics, (16, 16))
    entry = gen.index["scene_a"]
    assert entry is not None
    left, right = entry.context
    assert 3 <= right - left <= 21
    assert all(left <= t <= right for t in entry.target)
    assert len(set(entry.target)) == 3
    path = gen.save_index()
    data = json.load(path.open())
    assert "scene_a" in data

    # Video expansion covers every frame between the context views.
    out = Path("/tmp/test_eval_index/video.json")
    expand_to_video_index(path, out)
    video = json.load(out.open())
    assert video["scene_a"]["target"] == list(range(left, right + 1))


def test_metric_computer(tmp_path):
    from pixelsplat_tpu.evaluation.evaluation_cfg import EvaluationCfg, MethodCfg
    from pixelsplat_tpu.evaluation.metric_computer import MetricComputer
    from pixelsplat_tpu.utils.image_io import save_image

    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    # Method renders = GT with slight noise.
    method_dir = tmp_path / "method" / "sceneX" / "color"
    for i, idx in enumerate([4, 9]):
        noisy = np.clip(gt[i] + 0.02 * rng.standard_normal(gt[i].shape), 0, 1)
        save_image(noisy.astype(np.float32), method_dir / f"{idx:0>6}.png")

    cfg = EvaluationCfg(
        methods=(MethodCfg(name="Ours", key="ours", path=tmp_path / "method"),)
    )
    computer = MetricComputer(cfg)
    result = computer.process_scene("sceneX", gt, [4, 9])
    assert result is not None
    assert result["ours"]["psnr"] > 25
    assert 0 < result["ours"]["ssim"] <= 1
    # Missing frames are skipped gracefully.
    assert computer.process_scene("missing", gt, [1]) is None


def test_interpolate_extrinsics():
    from pixelsplat_tpu.visualization.camera_trajectory.interpolation import (
        interpolate_extrinsics,
        interpolate_intrinsics,
    )

    a = np.eye(4, dtype=np.float32)
    b = np.eye(4, dtype=np.float32)
    # Rotate 30 degrees about y and translate.
    th = np.deg2rad(30)
    b[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    b[:3, 3] = [1.0, 0.1, 0.2]

    t = np.linspace(0, 1, 5)
    out = interpolate_extrinsics(a, b, t)
    assert out.shape == (5, 4, 4)
    np.testing.assert_allclose(out[0], a, atol=1e-4)
    np.testing.assert_allclose(out[-1], b, atol=1e-4)
    # All interpolated matrices are rigid (orthonormal rotations).
    for m in out:
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)

    ki = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
    kf = ki.copy()
    kf[0, 0] = 2.0
    k_out = interpolate_intrinsics(ki, kf, t)
    np.testing.assert_allclose(k_out[2][0, 0], 1.5, atol=1e-5)


def test_wobble_and_spin():
    from pixelsplat_tpu.visualization.camera_trajectory.spin import generate_spin
    from pixelsplat_tpu.visualization.camera_trajectory.wobble import generate_wobble

    t = np.linspace(0, 1, 8).astype(np.float32)
    out = generate_wobble(np.eye(4, dtype=np.float32), np.asarray(0.5), t)
    assert out.shape == (8, 4, 4)
    # Starts at the original camera (radius scales with t).
    np.testing.assert_allclose(out[0], np.eye(4), atol=1e-5)

    spin = generate_spin(12, elevation=20.0, radius=3.0)
    assert spin.shape == (12, 4, 4)
    # Cameras all at distance `radius` from the origin.
    d = np.linalg.norm(spin[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, 3.0, atol=1e-5)


def test_drawing_primitives():
    from pixelsplat_tpu.visualization.drawing.lines import draw_lines
    from pixelsplat_tpu.visualization.drawing.points import draw_points

    img = jnp.zeros((3, 32, 32))
    out = draw_lines(
        img, np.array([[4.0, 4.0]]), np.array([[28.0, 28.0]]), (1.0, 0.0, 0.0), 2.0
    )
    assert float(out[0].max()) > 0.9  # red line drawn
    assert float(out[1].max()) < 0.5  # not green
    out2 = draw_points(img, np.array([[16.0, 16.0]]), (0.0, 1.0, 0.0), 4.0)
    assert float(out2[1, 16, 16]) > 0.9
    assert float(out2[1, 0, 0]) < 0.1


def test_ply_export_roundtrip(tmp_path):
    from pixelsplat_tpu.model.ply_export import export_ply

    g = 16
    rng = np.random.default_rng(0)
    path = tmp_path / "g.ply"
    export_ply(
        np.eye(4, dtype=np.float32),
        rng.normal(size=(g, 3)).astype(np.float32),
        np.abs(rng.normal(size=(g, 3))).astype(np.float32) + 0.1,
        rng.normal(size=(g, 4)).astype(np.float32),
        rng.normal(size=(g, 3, 25)).astype(np.float32),
        rng.uniform(0, 1, g).astype(np.float32),
        path,
    )
    raw = path.read_bytes()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode()
    assert f"element vertex {g}" in header
    n_props = header.count("property float")
    body = np.frombuffer(raw[header_end:], dtype="<f4")
    assert body.size == g * n_props
    assert np.isfinite(body).all()
