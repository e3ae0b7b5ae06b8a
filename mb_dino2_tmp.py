import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from llmseg_tpu import config as C
from llmseg_tpu.models import vit, layers as L
from llmseg_tpu.ops.attention import attention

cfg = C.llmseg_7b().dino
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
p = vit.block_init(key, cfg, dt)
T = cfg.num_patches + 1
x = jax.random.normal(key, (1, T, cfg.hidden_size), dt)

def timeit_scan(fn, args, lo=8, hi=40, repeats=5):
    def chained(xs, *a):
        def body(c, s):
            return c, fn(*a, s)
        _, outs = jax.lax.scan(body, 0, xs)
        return outs.sum()
    cf = jax.jit(chained)
    def run(n):
        xs = jnp.zeros(n, jnp.float32)
        float(cf(xs, *args))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter(); float(cf(xs, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    tlo, thi = run(lo), run(hi)
    return (thi - tlo) / (hi - lo)

def full_block(p, x, s):
    return vit.block_apply(p, x + jnp.asarray(s, x.dtype), cfg).astype(jnp.float32).sum()
def attn_only(p, x, s):
    xx = (x + jnp.asarray(s, x.dtype)).reshape(1, T, cfg.num_heads, -1)
    return attention(xx, xx, xx).astype(jnp.float32).sum()
for name, fn in [("full_block", full_block), ("flash attn", attn_only)]:
    t = timeit_scan(fn, (p, x))
    print(f"{name:12s}: {t*1e3:6.3f} ms", flush=True)
