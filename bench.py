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

    # reduce to one scalar on device; per-iteration float() forces a real
    # host sync (block_until_ready does not reliably block through the
    # remote-device tunnel, which yielded bogus 0.7ms timings)
    fn = jax.jit(
        lambda p, b: llmseg.predict(p, cfg, b)["pred_similarity"].sum())
    t0 = time.perf_counter()
    val = float(fn(params, batch))
    log(f"bench: compile+first step {time.perf_counter() - t0:.1f}s "
        f"(val={val:.4f})")

    for _ in range(2):
        float(fn(params, batch))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(params, batch))
    dt = (time.perf_counter() - t0) / iters
    log(f"bench: {dt * 1e3:.1f} ms/image")
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
