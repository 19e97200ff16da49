import time, jax, jax.numpy as jnp, numpy as np
print(jax.devices(), flush=True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0
x = jnp.ones((256, 256))
t0=time.time()
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
print("simple pallas ok:", float(np.asarray(y).mean()), "%.1fs" % (time.time()-t0), flush=True)

# now the composite kernel on small input
from pixelsplat_tpu.ops.rasterizer.pallas_composite import pallas_composite_core
T, F, K = 4, 16, 256
rng = np.random.default_rng(0)
params = np.zeros((T, F, K), np.float32)
params[:, 0] = rng.uniform(0, 64, (T, K))   # mx
params[:, 1] = rng.uniform(0, 16, (T, K))   # my
params[:, 2] = 0.5; params[:, 4] = 0.5      # conic
params[:, 5] = rng.uniform(0.1, 0.6, (T, K))  # opacity
params[:, 6:9] = rng.uniform(0, 1, (T, 3, K))
counts = np.full((T,), K, np.int32)
t0=time.time()
acc, trans = pallas_composite_core(jnp.asarray(params), jnp.asarray(counts), 4)
acc_np = np.asarray(acc)
print("composite pallas ok: %.1fs acc mean %.4f trans mean %.4f" % (time.time()-t0, acc_np.mean(), float(np.asarray(trans).mean())), flush=True)

from pixelsplat_tpu.ops.rasterizer.composite import _xla_composite_core
acc_x, trans_x = jax.jit(lambda a,b: _xla_composite_core(a,b,4))(jnp.asarray(params), jnp.asarray(counts))
print("max err vs xla:", float(np.abs(acc_np - np.asarray(acc_x)).max()),
      float(np.abs(np.asarray(trans)-np.asarray(trans_x)).max()), flush=True)
