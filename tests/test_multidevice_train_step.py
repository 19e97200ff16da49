"""Multi-device training correctness: the shard_map+pmean train step on
the 8-device CPU mesh must equal its data-parallel semantics computed
manually on one device.

The reference's distributed training is Lightning DDP whose contract is
exactly this: per-rank gradients from per-rank batches (with per-rank
rngs), all-reduce averaged, one optimizer step on identical replicas
(/root/reference/src/main.py:94-98). Here the per-device rng is
fold_in(rng, axis_index) (training/model_wrapper.py per_device_step), so
the single-device reference computes per-example gradients with those
same folded keys, averages them, and applies one Adam update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixelsplat_tpu.model.decoder.decoder_splatting import (
    DecoderSplatting,
    DecoderSplattingCfg,
)
from pixelsplat_tpu.ops.rasterizer import RenderSettings
from pixelsplat_tpu.parallel.mesh import make_mesh, shard_batch
from pixelsplat_tpu.training.model_wrapper import (
    ModelWrapper,
    TestCfg,
    TrainCfg,
)
from pixelsplat_tpu.training.optimizer import OptimizerCfg

from test_grad_accumulation import _make_batch
from test_model import tiny_cfg

N_DEV = 8


def _make_wrapper():
    from pixelsplat_tpu.loss import LossMseCfg, get_losses

    return ModelWrapper(
        OptimizerCfg(lr=1e-3, warm_up_steps=5),
        TrainCfg(),
        TestCfg(),
        tiny_cfg(),
        DecoderSplatting(
            DecoderSplattingCfg(
                render=RenderSettings(capacity=128, big_capacity=16, chunk=64)
            )
        ),
        get_losses([LossMseCfg()]),
    )


def test_sharded_step_equals_manual_data_parallel():
    assert jax.device_count() >= N_DEV
    wrapper = _make_wrapper()
    batch = _make_batch(jax.random.PRNGKey(3), b=N_DEV)
    state = wrapper.init_state(
        jax.tree.map(lambda x: np.asarray(x), batch), seed=0
    )
    rng = jax.random.PRNGKey(11)

    mesh = make_mesh(N_DEV)
    step_fn, _ = wrapper.make_jit_train_step(mesh, batch_size=N_DEV)
    sharded = shard_batch(jax.device_get(batch), mesh)
    state8, parts8 = step_fn(jax.tree.map(jnp.copy, state), sharded, rng)

    # Manual single-device data parallelism with the same per-device keys.
    grads_sum = None
    loss_sum = 0.0
    for i in range(N_DEV):
        example = jax.tree.map(
            lambda x: x[i : i + 1],
            batch,
            is_leaf=lambda x: not isinstance(x, dict),
        )
        key_i = jax.random.fold_in(rng, i)
        (_, parts), grads = jax.value_and_grad(wrapper.loss_fn, has_aux=True)(
            state.params, example, state.step, key_i
        )
        loss_sum += float(parts["loss/total"])
        grads_sum = (
            grads if grads_sum is None else jax.tree.map(jnp.add, grads_sum, grads)
        )
    grads_avg = jax.tree.map(lambda g: g / N_DEV, grads_sum)
    updates, _ = wrapper.optimizer.update(grads_avg, state.opt_state, state.params)
    params_manual = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(
        float(parts8["loss/total"]), loss_sum / N_DEV, rtol=1e-5
    )
    flat8 = jax.tree_util.tree_leaves_with_path(state8.params)
    flatm = jax.tree.leaves(params_manual)
    assert len(flat8) == len(flatm)
    for (path, a), b in zip(flat8, flatm):
        # psum-tree vs python-loop summation order differs by ~1 ulp per
        # gradient element; Adam's 1/(sqrt(v)+eps) amplifies near-zero
        # second moments (same tolerance rationale as
        # test_grad_accumulation.test_accumulated_step_matches_manual_average).
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            rtol=2e-3,
            atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )
