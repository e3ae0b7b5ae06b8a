"""DINOv2 block component timing at (1, 4097, 1024) bf16 on the real chip."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from llmseg_tpu import config as C
from llmseg_tpu.models import vit, layers as L
from llmseg_tpu.ops.attention import attention

cfg = C.llmseg_7b().dino
print("dino cfg:", cfg.hidden_size, cfg.depth, cfg.num_heads, cfg.num_patches)
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
def ln_only(p, x, s):
    return L.layernorm(p["norm1"], x + jnp.asarray(s, x.dtype), eps=cfg.ln_eps).astype(jnp.float32).sum()
def qkv3(p, x, s):
    xx = x + jnp.asarray(s, x.dtype)
    q = L.dense(p["attn"]["q"], xx); k = L.dense(p["attn"]["k"], xx)
    v = L.dense(p["attn"]["v"], xx)
    return (q.astype(jnp.float32).sum() + k.astype(jnp.float32).sum()
            + v.astype(jnp.float32).sum())
wfused = jnp.concatenate([p["attn"][k]["w"] for k in ("q","k","v")], axis=1)
bfused = jnp.concatenate([p["attn"][k]["b"] for k in ("q","k","v")])
def qkv_fused(p, x, s):
    return (jnp.einsum("btc,cd->btd", x + jnp.asarray(s, x.dtype), wfused) + bfused).astype(jnp.float32).sum()
def attn_only(p, x, s):
    xx = (x + jnp.asarray(s, x.dtype)).reshape(1, T, cfg.num_heads, -1)
    return attention(xx, xx, xx).astype(jnp.float32).sum()
def mlp_only(p, x, s):
    return L.mlp(p["mlp"], x + jnp.asarray(s, x.dtype)).astype(jnp.float32).sum()
def proj_only(p, x, s):
    return L.dense(p["attn"]["out"], x + jnp.asarray(s, x.dtype)).astype(jnp.float32).sum()

for name, fn in [("full_block", full_block), ("ln", ln_only),
                 ("qkv 3-dense", qkv3), ("qkv fused", qkv_fused),
                 ("flash attn", attn_only), ("out proj", proj_only),
                 ("mlp", mlp_only)]:
    t = timeit_scan(fn, (p, x))
    print(f"{name:12s}: {t*1e3:6.3f} ms")
