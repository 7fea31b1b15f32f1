import time, sys
from functools import partial
from pepper_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from pepper_tpu.models.polish_gru import init_polish_params
from pepper_tpu.polish.consensus import consensus_scan, SEQ_LENGTH

dtype = jnp.float32 if len(sys.argv) < 3 or sys.argv[2] == "f32" else jnp.bfloat16
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
params = init_polish_params(jax.random.PRNGKey(0), dtype=dtype)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randint(0, 30, size=(B, SEQ_LENGTH, 10)), dtype)

@partial(jax.jit, static_argnames=("iters",))
def run(params, imgs, iters):
    def body(acc, i):
        x = imgs + i.astype(imgs.dtype)
        votes, labels, phred = consensus_scan(params, x)
        return acc + jnp.sum(phred) + jnp.sum(labels), ()
    total, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(iters, dtype=jnp.int32))
    return total

def timed(iters):
    float(run(params, imgs, iters))
    best = float("inf")
    for _ in range(3):
        s = time.perf_counter(); float(run(params, imgs, iters)); best = min(best, time.perf_counter()-s)
    return best

marginal = (timed(25) - timed(5)) / 20
print(f"B={B} dtype={jnp.dtype(dtype).name}: {B*SEQ_LENGTH/marginal/1e6:.1f} M positions/s ({marginal*1e3:.2f} ms/batch)")
