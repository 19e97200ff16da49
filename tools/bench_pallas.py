import time, jax, jax.numpy as jnp, numpy as np
print(jax.devices(), flush=True)
from pixelsplat_tpu.ops.rasterizer.projection import project_gaussians
from pixelsplat_tpu.ops.rasterizer.binning import bin_gaussians
from pixelsplat_tpu.ops.rasterizer.composite import build_tile_params, _xla_composite_core
from pixelsplat_tpu.ops.rasterizer.pallas_composite import pallas_composite_core

G = 2*256*256*3
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-2,2,G), rng.uniform(-2,2,G), rng.uniform(1.2,12,G)], -1).astype(np.float32)
axes = rng.normal(size=(G,3,3)).astype(np.float32)*0.01
covs = axes@axes.transpose(0,2,1)+1e-6*np.eye(3,dtype=np.float32)
sh = rng.normal(size=(G,3,25)).astype(np.float32)*0.1
opac = rng.uniform(0.05,0.6,G).astype(np.float32)
K = jnp.array([[1.,0,.5],[0,1.,.5],[0,0,1.]])
extr = jnp.eye(4)
IM = (256,256)

jm, jc, jsh, jo = map(jnp.asarray, (means, covs, sh, opac))
t0=time.time()
p = jax.jit(lambda: project_gaussians(extr, K, IM, jm, jc, jo, harmonics=jsh))()
tiles = jax.jit(lambda: bin_gaussians(p, IM, capacity=4096, big_capacity=128))()
params_t, counts = jax.jit(build_tile_params)(p, tiles)
print("prep done %.0fs; params_t %s counts mean %.0f" % (time.time()-t0, params_t.shape, float(np.asarray(counts.mean()))), flush=True)

t0=time.time()
acc_p, trans_p = pallas_composite_core(params_t, counts, 16)
acc_p_np = np.asarray(acc_p); print("pallas compile+run: %.1fs" % (time.time()-t0), flush=True)
acc_x, trans_x = jax.jit(lambda a,b: _xla_composite_core(a,b,16))(params_t, counts)
acc_x_np = np.asarray(acc_x)
err = np.abs(acc_p_np - acc_x_np).max()
terr = np.abs(np.asarray(trans_p) - np.asarray(trans_x)).max()
print("max abs err acc: %.2e trans: %.2e" % (err, terr), flush=True)

def timed(f, *args, N=20):
    @jax.jit
    def many(*a):
        def body(i, z):
            r = f(*a)
            return z + jax.tree.leaves(r)[0].ravel()[0] + jnp.float32(i)*0
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))
    np.asarray(many(*args))
    t0=time.perf_counter(); np.asarray(many(*args))
    return (time.perf_counter()-t0)/N*1e3

print("pallas core: %.2f ms" % timed(lambda: pallas_composite_core(params_t, counts, 16)), flush=True)
print("xla core: %.2f ms" % timed(lambda: _xla_composite_core(params_t, counts, 16)), flush=True)
