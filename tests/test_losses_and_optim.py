"""Loss gating / optimizer schedule / video export tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class _FakeOutput:
    def __init__(self, color, depth=None):
        self.color = color
        self.depth = depth


def test_lpips_requires_pretrained_weights():
    """Without weights on disk, configuring the LPIPS loss must hard-fail
    rather than silently train against a random-VGG distance."""
    from pixelsplat_tpu.evaluation.lpips import load_lpips_params
    from pixelsplat_tpu.loss import LossLpipsCfg
    from pixelsplat_tpu.loss.loss_lpips import LossLpips

    if load_lpips_params() is None:
        with pytest.raises(FileNotFoundError):
            LossLpips(LossLpipsCfg())


def test_lpips_gating(monkeypatch):
    import pixelsplat_tpu.loss.loss_lpips as mod
    from pixelsplat_tpu.evaluation.lpips import get_lpips_params
    from pixelsplat_tpu.loss import LossLpipsCfg
    from pixelsplat_tpu.loss.loss_lpips import LossLpips

    # Gating semantics are weight-independent; random weights stand in for
    # the pretrained ones (which require one-time egress to export).
    monkeypatch.setattr(
        mod, "get_lpips_params", lambda allow_random=False: get_lpips_params()
    )
    loss = LossLpips(LossLpipsCfg(weight=0.05, apply_after_step=100))
    key = jax.random.PRNGKey(0)
    pred = _FakeOutput(jax.random.uniform(key, (1, 1, 3, 32, 32)))
    batch = {"target": {"image": jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 3, 32, 32))}}
    before = loss(pred, batch, None, jnp.asarray(50))
    after = loss(pred, batch, None, jnp.asarray(150))
    assert float(before) == 0.0
    assert float(after) > 0.0

    # The gate must be differentiable under jit on both sides (lax.cond
    # with closed-over prediction tracers).
    def f(img, step):
        return loss(_FakeOutput(img), batch, None, step)

    g_off = jax.jit(jax.grad(f))(pred.color, jnp.asarray(50))
    g_on = jax.jit(jax.grad(f))(pred.color, jnp.asarray(150))
    assert float(jnp.abs(g_off).max()) == 0.0
    assert float(jnp.abs(g_on).max()) > 0.0


def test_depth_loss():
    from pixelsplat_tpu.loss import LossDepthCfg
    from pixelsplat_tpu.loss.loss_depth import LossDepth

    loss = LossDepth(LossDepthCfg(weight=0.25))
    depth = jnp.ones((1, 1, 16, 16)) * jnp.linspace(1, 2, 16)
    pred = _FakeOutput(None, depth=depth)
    batch = {"target": {"image": jnp.zeros((1, 1, 3, 16, 16))}}
    value = loss(pred, batch, None, jnp.asarray(0))
    assert float(value) > 0  # non-constant disparity penalized
    flat = _FakeOutput(None, depth=jnp.ones((1, 1, 16, 16)))
    assert float(loss(flat, batch, None, jnp.asarray(0))) == pytest.approx(0.0)


def test_optimizer_warmup():
    import optax

    from pixelsplat_tpu.training.optimizer import OptimizerCfg, build_optimizer

    opt = build_optimizer(OptimizerCfg(lr=1e-2, warm_up_steps=10), 0.5)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    grads = {"w": jnp.ones(4)}

    lrs = []
    p = params
    for _ in range(12):
        updates, state = opt.update(grads, state, p)
        lrs.append(float(-updates["w"][0]))
        p = optax.apply_updates(p, updates)
    # Adam step size ~ lr at steady gradient; must ramp then plateau.
    assert lrs[0] < lrs[5] < lrs[9] * 1.001
    assert lrs[10] == pytest.approx(lrs[11], rel=1e-3)


def test_gradient_clipping():
    import optax

    from pixelsplat_tpu.training.optimizer import OptimizerCfg, build_optimizer

    opt = build_optimizer(OptimizerCfg(lr=1.0, warm_up_steps=1), gradient_clip_val=0.5)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    big = {"w": jnp.full(3, 100.0)}
    updates, _ = opt.update(big, state, params)
    # The clip happens before Adam; updates stay finite and bounded.
    assert bool(jnp.isfinite(updates["w"]).all())


def test_video_export(tmp_path):
    from pixelsplat_tpu.utils.video import save_gif, save_video

    frames = np.random.default_rng(0).uniform(0, 1, (6, 3, 32, 32)).astype(np.float32)
    gif = tmp_path / "clip.gif"
    save_gif(frames, gif, fps=10)
    assert gif.exists() and gif.stat().st_size > 0
    out = save_video(frames, tmp_path / "clip.mp4", fps=10)
    assert out.exists() and out.stat().st_size > 0


def test_benchmarker(tmp_path):
    from pixelsplat_tpu.utils.benchmarker import Benchmarker

    b = Benchmarker()
    with b.time("encoder"):
        pass
    with b.time("decoder", num_calls=4):
        pass
    assert len(b.execution_times["decoder"]) == 4
    b.dump(tmp_path / "benchmark.json")
    b.dump_memory(tmp_path / "peak_memory.json")
    assert (tmp_path / "benchmark.json").exists()
    assert (tmp_path / "peak_memory.json").exists()
    summary = b.summarize()
    assert "encoder" in summary and "decoder" in summary
