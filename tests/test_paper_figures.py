"""Checkpoint-driven paper figure generators, end to end.

The reference's figure scripts load a trained checkpoint, encode one scene,
and render publication figures (src/paper/generate_point_cloud_figure.py,
generate_attention_figure.py, generate_sampling_figure.py,
generate_epipolar_sampling_figure.py). These tests run our counterparts
against the checked-in RE10K chunk fixture with a (random-init) orbax
checkpoint, proving the whole path — config, dataset pinning, checkpoint
loading, encoder capture (visualization_dump + sown intermediates),
orthographic renders, overlay compositing, SVG/PNG/PLY output — executes.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from test_parity_runbook import FIXTURE_ROOT, SMALL_OVERRIDES

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def figure_env(tmp_path_factory):
    """A small-config orbax checkpoint + the overrides every script needs."""
    import jax

    from pixelsplat_tpu.config import load_config
    from pixelsplat_tpu.model.encoder import get_encoder
    from pixelsplat_tpu.training.checkpoint import save_checkpoint

    tmp = tmp_path_factory.mktemp("figures")
    overrides = [
        *SMALL_OVERRIDES,
        f"dataset.roots=[{FIXTURE_ROOT}]",
        "dataset.augment=false",
    ]
    cfg = load_config(["+experiment=re10k", "mode=test", *overrides])
    encoder, _ = get_encoder(cfg.model.encoder)

    import jax.numpy as jnp

    b, v, h, w = 1, 2, 64, 64
    context = {
        "image": jnp.zeros((b, v, 3, h, w)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4)),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
        ),
        "near": jnp.ones((b, v)),
        "far": jnp.full((b, v), 100.0),
    }
    variables = encoder.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        context,
        jnp.asarray(0),
        True,
    )
    ckpt = save_checkpoint(
        tmp / "checkpoints", 0, {"params": variables, "step": 0}
    )
    return tmp, [*overrides, f"checkpointing.load={ckpt}"]


def test_point_cloud_figure_checkpoint_driven(figure_env):
    tmp, overrides = figure_env
    from pixelsplat_tpu.paper import generate_point_cloud_figure as gpc

    out = tmp / "point_clouds"
    gpc.main(
        [
            "--output",
            str(out),
            "--scene",
            "fixture_scene_a:0:5:30.0:60",
            "--resolution",
            "128",
            "--capacity",
            "512",
            *overrides,
        ]
    )
    pngs = sorted(out.glob("*.png"))
    # One orbit render + two turbo depth maps.
    assert any("angle" in p.name for p in pngs), pngs
    assert sum("depth" in p.name for p in pngs) == 2, pngs
    plys = list(out.rglob("gaussians.ply"))
    assert len(plys) == 1 and plys[0].stat().st_size > 0


def test_attention_figure_checkpoint_driven(figure_env):
    tmp, overrides = figure_env
    from pixelsplat_tpu.paper import generate_attention_figure as gaf

    out = tmp / "attention.svg"
    gaf.main(
        [
            "--output",
            str(out),
            "--scene",
            "fixture_scene_a:0:5",
            "--layer",
            "0",
            "--head",
            "0",
            "--query",
            "0.4,0.4",
            "--query",
            "0.6,0.55",
            *overrides,
        ]
    )
    text = out.read_text()
    assert text.startswith("<svg")
    # Two embedded context photographs + per-sample attention lines.
    assert text.count("<image") == 2
    assert text.count("<line") > 2 * 4  # 2 queries x num_samples + backers


def test_sampling_figure_checkpoint_driven(figure_env):
    tmp, overrides = figure_env
    from pixelsplat_tpu.paper import generate_sampling_figure as gsf
    from pixelsplat_tpu.utils.image_io import load_image

    out = tmp / "sampling_figure"
    gsf.main(
        [
            "--output",
            str(out),
            "--scene",
            "fixture_scene_a:0:5:30.0",
            "--resolution",
            "96",
            "--samples-per-ray",
            "48",
            "--capacity",
            "512",
            *overrides,
        ]
    )
    gaussians = load_image(out / "gaussians.png")
    density = load_image(out / "density.png")
    assert gaussians.shape == (3, 96, 96)
    assert density.shape == (3, 96, 96)
    # The density composite must actually contain signal (the pdf is a
    # softmax -> nonzero somewhere on the frustum rays) over the white
    # canvas.
    assert float(density.min()) < 0.999


def test_epipolar_sampling_figure_dataset_driven(figure_env, tmp_path):
    tmp, overrides = figure_env
    from pixelsplat_tpu.paper import generate_epipolar_sampling_figure as ges

    out = tmp_path / "epipolar_sampling.svg"
    ges.main(
        [
            "--output",
            str(out),
            "--scene",
            "fixture_scene_a:0:5",
            "--ray",
            "0.45,0.5",
            *overrides,
        ]
    )
    text = out.read_text()
    assert text.count("<image") == 2
    assert "Ray" in text
    # 8 depth labels: one infinity marker + 7 numeric.
    assert text.count("&#8734;") == 1


def test_comparison_grids_layout(tmp_path):
    """The SVG grid geometry used by generate_image_comparison (2- and
    3-context variants) and the ablation grid."""
    from pixelsplat_tpu.paper.generate_ablation_image_comparison import (
        generate_ablation_grid,
    )
    from pixelsplat_tpu.paper.generate_image_comparison import generate_image_grid

    rng = np.random.default_rng(0)

    def img():
        return rng.uniform(size=(3, 16, 16)).astype(np.float32)

    # 2 context + gt + 2 methods (one missing -> placeholder).
    rows = [[img(), img(), img(), img(), None] for _ in range(2)]
    out = tmp_path / "comparison.svg"
    generate_image_grid(rows, ["Ours", "Baseline"], out, num_context=2)
    text = out.read_text()
    assert text.count("<image") == 10
    assert "Ours" in text and "Target View" in text

    rows3 = [[img()] * 3 + [img(), img()] for _ in range(1)]
    out3 = tmp_path / "comparison3.svg"
    generate_image_grid(rows3, ["Ours"], out3, num_context=3)
    assert out3.read_text().count("<image") == 5

    out_ab = tmp_path / "ablation.svg"
    generate_ablation_grid([[img(), None, img()]], ["A", "B", "C"], out_ab)
    text = out_ab.read_text()
    assert text.count("<image") == 3 and "B" in text
