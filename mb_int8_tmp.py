import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K, N = 3072, 4096, 4096
key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (M, K), jnp.bfloat16)
wb = jax.random.normal(key, (K, N), jnp.bfloat16)
xq = jnp.clip(jnp.round(xb.astype(jnp.float32)*10), -127, 127).astype(jnp.int8)
wq = jnp.clip(jnp.round(wb.astype(jnp.float32)*10), -127, 127).astype(jnp.int8)

def timeit_scan(fn, args, lo=16, hi=80, repeats=5):
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

flops = 2*M*K*N
def bf16_mm(x, w, s):
    return jax.lax.dot_general(x + jnp.asarray(s, x.dtype), w,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32).sum()
def int8_mm(x, w, s):
    xx = (x + jnp.asarray(s, jnp.float32).astype(jnp.int8))
    return jax.lax.dot_general(xx, w,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).sum().astype(jnp.float32)
def w8a8_full(x, w, s):
    # full W8A8 pipeline: dynamic per-row activation quant + int8 dot + rescale
    xx = x + jnp.asarray(s, x.dtype)
    ax = jnp.max(jnp.abs(xx.astype(jnp.float32)), axis=-1, keepdims=True)
    sc = ax / 127.0
    xq_ = jnp.clip(jnp.round(xx.astype(jnp.float32) / sc), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq_, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sc).sum()

for name, fn, args in [("bf16", bf16_mm, (xb, wb)),
                       ("int8 dot", int8_mm, (xq, wq)),
                       ("w8a8 e2e", w8a8_full, (xb, wq))]:
    t = timeit_scan(fn, args)
    print(f"{name:9s}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TFLOP/s", flush=True)
