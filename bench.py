"""Headline benchmark: end-to-end ReasonSeg inference throughput per chip.

Measures the reference's inference configuration (BASELINE.json: "Full
inference: SAM masks + LLaVA-7B [SEG] decode + mask-selection transformer,
batch 1"): per image, one DINOv2 ViT-L/14 forward @896^2, one CLIP ViT-L/14
forward @224^2, one LLaMA teacher-forced forward over the spliced sequence,
mask pooling over K=50 proposals, and the selection head.  SAM proposal
generation is offline in the reference (prepare_datasets) and is excluded,
exactly as in reference validate_threshold (training.py:690-870).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(config_name: str):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: first run ~5-10 min, later runs seconds
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"bench: compile cache unavailable: {e}")

    from llmseg_tpu import config as C
    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg

    cfg = getattr(C, config_name)()
    dtype = jnp.bfloat16
    log(f"bench: config={config_name} backend={jax.default_backend()} "
        f"devices={jax.devices()}")

    t0 = time.perf_counter()
    with jax.default_device(jax.devices()[0]):
        params = jax.jit(lambda k: llmseg.init(k, cfg, dtype=dtype))(
            jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"bench: init {time.perf_counter() - t0:.1f}s")

    batch = make_batch(cfg, num_images=1, rows_per_image=1,
                       text_len=512, dtype=dtype)

    # Timing through the remote-device tunnel: block_until_ready does not
    # block (measured 0.7ms for a 7B forward) and a per-call host sync costs
    # ~30-90ms.  Instead: enqueue ITERS async calls, then transfer each
    # scalar at the end — executions overlap the earlier transfers, so
    # total/ITERS converges to pure device time.  (An in-graph fori_loop was
    # tried first but made XLA materialize transposed copies of the LLM
    # weights outside the loop -> OOM at 7B.)
    ITERS = 8
    fn = jax.jit(
        lambda p, b: llmseg.predict(p, cfg, b)["pred_similarity"].sum())
    t0 = time.perf_counter()
    val = float(fn(params, batch))
    log(f"bench: compile+first step {time.perf_counter() - t0:.1f}s "
        f"(val={val:.4f})")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(params, batch) for _ in range(ITERS)]
        for o in outs:
            float(o)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS
    log(f"bench: {dt * 1e3:.1f} ms/image ({min(ts):.3f}s per {ITERS} images)")
    return 1.0 / dt


def main():
    for name in ("llmseg_7b", "llmseg_small"):
        try:
            ips = run(name)
            print(json.dumps({
                "metric": f"reasonseg_e2e_infer_images_per_sec_chip[{name}]",
                "value": round(ips, 4),
                "unit": "images/s",
                "vs_baseline": None,
            }))
            return
        except Exception as e:  # OOM or compile failure: fall back
            log(f"bench: {name} failed: {type(e).__name__}: {e}")
    print(json.dumps({"metric": "reasonseg_e2e_infer_images_per_sec_chip",
                      "value": 0.0, "unit": "images/s",
                      "vs_baseline": None}))
    sys.exit(1)


if __name__ == "__main__":
    main()
