"""Headline benchmark: end-to-end ReasonSeg inference throughput per chip.

Measures the reference's inference configuration (BASELINE.json: "Full
inference: SAM masks + LLaVA-7B [SEG] decode + mask-selection transformer"):
per image, one DINOv2 ViT-L/14 forward @896^2, one CLIP ViT-L/14 forward
@224^2, one LLaMA teacher-forced forward over the spliced sequence, mask
pooling over K=50 proposals, and the selection head.  SAM proposal generation
is offline in the reference (prepare_datasets) and is excluded, exactly as in
reference validate_threshold (training.py:690-870).

Round-3 robustness (VERDICT r2 #1/#2/#5/#7):
  * every batch point retries once after a ~110 s backoff (repeated OOMs
    wedge the TPU backend for ~2 min; it recovers on its own),
  * a failed batch size no longer aborts the sweep,
  * the orchestrator re-runs a failed flagship subprocess once before
    falling back to llmseg_small,
  * per-tower timings run in their OWN subprocesses (`--tower`), so the 7B
    tower breakdown cannot OOM against the sweep's leftover buffers,
  * an int8 weight-only pass (`--quant 8`, reference load_8bit,
    model/llava/model/builder.py:40-47) halves weight HBM (13.5 -> 6.8 GB),
    unlocks the batch-8 point, and logs a quality delta vs bf16
    (top-1 agreement + max |dsim| on the same batch),
  * `vs_baseline` is MFU vs the v5e bf16 peak; the metric string says so.

Round-4 outage-proofing (VERDICT r3 #1: BENCH_r03 ended rc=124 with NO
parseable line after a backend outage ate the whole driver window):
  * a labeled fallback JSON line is printed to stdout BEFORE any TPU work
    and the best-so-far headline is re-printed after every lane — the
    driver takes the LAST line, so a SIGKILL at any minute still leaves a
    valid record,
  * `--probe` runs a 128x128 matmul; the orchestrator probes the backend
    (150 s cap, retried through transient post-lane wedges — see
    `_probe_with_retry`) before each expensive lane and fails FAST to the
    fallback line on the outage signature (`UNAVAILABLE: Unable to
    initialize backend`, or an init hang) instead of burning a 40-minute
    attempt,
  * the W8A8 lane (the best lane, 12+ img/s) runs FIRST so a short
    driver window records the headline before anything else,
  * the bf16/int8 lanes STREAM their banked per-batch-point lines straight
    through to stdout as they appear, so even a kill of the orchestrator
    mid-lane keeps the child's best-so-far,
  * the last good headline is banked to .bench_last_good.json and quoted
    by the fallback line (no hardcoded last-known-good literal).

The LAST stdout line is always one JSON object:
{"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

V5E_BF16_PEAK = 197e12   # TPU v5e: 197 TFLOP/s bf16
RETRY_SLEEP_S = 110      # wedged-backend recovery time is ~2 min
COLD_PROBE_S = 420       # cold backend init through the tunnel: 3-4 min
TOWERS = ("dino", "clip", "llama", "select_head")
LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json")
HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_history.jsonl")
# A backend emitting these during INIT is down, not busy; retrying a full
# lane against it wedges harder (observed 2026-08-17: 45 min - 4 h).
OUTAGE_SIGNATURES = ("Unable to initialize backend", "UNAVAILABLE")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _vit_flops(cfg, tokens=None):
    n = tokens if tokens is not None else cfg.num_patches + 1
    d = cfg.hidden_size
    mlp = int(cfg.mlp_ratio * d)
    per_layer = 8 * n * d * d + 4 * n * mlp * d + 4 * n * n * d
    return cfg.depth * per_layer


def _llama_flops(cfg, seq):
    d = cfg.hidden_size
    per_layer = (2 * seq * d * (cfg.num_heads + 2 * cfg.num_kv_heads)
                 * cfg.head_dim
                 + 2 * seq * cfg.num_heads * cfg.head_dim * d
                 + 6 * seq * d * cfg.intermediate_size
                 + 4 * seq * seq * cfg.num_heads * cfg.head_dim)
    return cfg.num_layers * per_layer


def model_flops_per_image(cfg, text_len: int) -> float:
    """Analytic forward FLOPs per image (2 x MACs) for the inference path."""
    lv = cfg.llava
    seq = text_len + lv.num_image_tokens - 1
    f = _vit_flops(cfg.dino)                       # DINOv2 @896
    f += _vit_flops(lv.vision)                     # CLIP @224
    f += _llama_flops(lv.llm, seq)
    f += 2 * cfg.max_proposals * cfg.seg_grid ** 2 * cfg.select.dim  # pooling
    return float(f)


def _timeit(fn, *args, iters=8, repeats=3):
    """Min-of-repeats average ms.  Through the remote-device tunnel,
    block_until_ready does not block; force a sync by pulling each scalar."""
    t0 = time.perf_counter()
    val = float(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            float(o)
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters, compile_s, val


def _timeit_scan(fn, args, iters=8, repeats=3):
    """Chain `iters` invocations of fn(*args, x_i) in ONE device program via
    lax.scan and time the whole call: the remote tunnel adds ~25 ms of
    dispatch latency per executable launch, which contaminates per-call
    timing (a sub-ms kernel 'measures' 25 ms); a scanned chain amortizes it
    to zero and reports true device time.  fn MUST fold its trailing scalar
    argument into the computation (it is the scanned xs slice — a runtime
    value XLA cannot prove loop-invariant, so the body cannot be hoisted)."""
    import jax
    import jax.numpy as jnp

    def chained(xs, *a):
        def body(carry, x):
            return carry, fn(*a, x)
        _, outs = jax.lax.scan(body, 0, xs)
        return outs.sum()

    cf = jax.jit(chained)
    # xs MUST be a runtime argument: created inside the jit it would be a
    # compile-time constant, XLA would fold `images + 0`, prove the body
    # loop-invariant, and hoist the entire model out of the scan (observed:
    # "397% MFU").
    xs = jnp.zeros(iters, jnp.float32)
    t0 = time.perf_counter()
    val = float(cf(xs, *args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(cf(xs, *args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters, compile_s, val / iters


def _with_retry(label, attempt, attempts=2):
    """Run attempt() with one retry after a backoff: transient
    RESOURCE_EXHAUSTED/ABORTED states on the shared chip clear in ~2 min
    (BENCH_r02 lost the flagship number to exactly this)."""
    for i in range(attempts):
        try:
            return attempt()
        except Exception as e:
            log(f"bench: {label} attempt {i + 1}/{attempts} failed: "
                f"{type(e).__name__}: {str(e)[:200]}")
            if i + 1 < attempts:
                log(f"bench: sleeping {RETRY_SLEEP_S}s for backend recovery")
                time.sleep(RETRY_SLEEP_S)
    return None


def _setup(config_name: str):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: first run ~5-10 min, later runs seconds
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"bench: compile cache unavailable: {e}")

    from llmseg_tpu import config as C

    cfg = getattr(C, config_name)()
    log(f"bench: config={config_name} backend={jax.default_backend()} "
        f"devices={jax.devices()}")
    return cfg, jnp.bfloat16


def _init_params(cfg, dtype):
    import jax

    from llmseg_tpu.models import llmseg

    t0 = time.perf_counter()
    with jax.default_device(jax.devices()[0]):
        params = jax.jit(lambda k: llmseg.init(k, cfg, dtype=dtype))(
            jax.random.PRNGKey(0))
    # exact frozen-tower reparameterizations (DINO layerscale fold) — all
    # lanes measure the folded form; quality probes compare folded bf16 vs
    # folded quantized, so the fold never hides a quantization delta
    llmseg.fold_frozen_inplace(params)
    jax.block_until_ready(params)
    log(f"bench: init {time.perf_counter() - t0:.1f}s")
    return params


def run(config_name: str, quant_bits: int | None = None,
        w8a8: bool = False):
    import jax

    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg

    cfg, dtype = _setup(config_name)
    TEXT_LEN = 512
    params = _init_params(cfg, dtype)

    flops = model_flops_per_image(cfg, TEXT_LEN)
    log(f"bench: analytic fwd FLOPs/image = {flops / 1e12:.2f} TFLOP")

    # e2e sweep uses plain async-dispatch timing (_timeit): at ~100 ms/step
    # the ~25 ms host dispatch overlaps device execution across the 8 queued
    # iterations (<3% inflation), and scan-chaining the FULL 7B model inside
    # a while loop crashes the remote compile helper.  _timeit_scan is for
    # the small per-tower programs (--tower), where 25 ms would swamp it.
    fn = jax.jit(
        lambda p, b: llmseg.predict(p, cfg, b)["pred_similarity"].sum())

    probe_sim = None
    probe_top1 = None
    if quant_bits:
        # quality probe: bf16 similarities on a fixed batch BEFORE
        # quantizing (weights are then mutated in place; both full trees
        # cannot coexist in 16 GB)
        probe = make_batch(cfg, num_images=1, rows_per_image=1,
                           text_len=TEXT_LEN, dtype=dtype)

        def _probe():
            return jax.device_get(jax.jit(
                lambda p, b: llmseg.predict(p, cfg, b)["pred_similarity"]
            )(params, probe))

        probe_sim = _with_retry("bf16 probe", _probe)
        from llmseg_tpu.ops import quant

        smooth_stats = None
        if w8a8:
            # SmoothQuant calibration on the probe batch (bf16 weights
            # still live): per-site activation colmaxes fold the outlier
            # columns into the weights for free at runtime — the
            # replacement for the dynamic LLM.int8-style decomposition,
            # which measured +37% on the quantized matmul path
            t0 = time.perf_counter()
            smooth_stats = _with_retry(
                "w8a8 calibration",
                lambda: llmseg.calibrate_quant_stats(params, cfg, probe))
            log(f"bench: w8a8 smoothquant calibration "
                f"{time.perf_counter() - t0:.1f}s"
                + ("" if smooth_stats is not None
                   else " FAILED — quantizing unsmoothed"))
        t0 = time.perf_counter()
        quant.quantize_llama_inplace(params["llava"]["llm"],
                                     bits=quant_bits, w8a8=w8a8,
                                     smooth_stats=smooth_stats,
                                     head_dim=cfg.llava.llm.head_dim)
        jax.block_until_ready(params["llava"]["llm"])
        log(f"bench: int{quant_bits}{'-w8a8' if w8a8 else ''} "
            f"quantization {time.perf_counter() - t0:.1f}s")
        if probe_sim is not None:
            def _probe_q():
                return jax.device_get(jax.jit(
                    lambda p, b: llmseg.predict(p, cfg, b)["pred_similarity"]
                )(params, probe))

            q_sim = _with_retry(f"int{quant_bits} probe", _probe_q)
            if q_sim is not None:
                import numpy as np

                a = np.asarray(probe_sim, np.float32)
                b = np.asarray(q_sim, np.float32)
                top1 = float(np.mean(a.argmax(-1) == b.argmax(-1)))
                log(f"bench: int{quant_bits}{'-w8a8' if w8a8 else ''} "
                    f"quality vs bf16: top1_agreement={top1:.3f} "
                    f"max|dsim|={float(np.abs(a - b).max()):.4f} "
                    f"(random-init weights; real-weight delta needs "
                    f"checkpoints, see COMPONENTS.md gap 1)")
                if w8a8:
                    # the orchestrator only promotes the W8A8 lane to the
                    # headline when the probe ranking is exact
                    probe_top1 = top1
        del probe

    # ---- batch sweep ----
    # bf16 7B: batch 8 cannot fit (13.5 GB weights of 16 GB HBM, verified
    # 2026-08-16); int8 frees 6.7 GB and sweeps {4, 8, 1}.
    # Throughput points run FIRST and the best-so-far RESULT line is printed
    # after every point: batch-1 compiles are pathologically slow on this
    # stack (10-20 min, see COMPONENTS.md) and the backend sometimes wedges
    # mid-run — banking partial results means a later hang cannot erase the
    # headline (the orchestrator takes the LAST result line, including from
    # a timed-out subprocess's partial stdout).  The int8 lane exists for
    # the batch-8 capacity point; it skips batch 1 (the bf16 lane covers
    # latency, and batch-1 compiles cost 10+ min each).
    sizes = (4, 8) if quant_bits else (4, 1)
    if quant_bits and w8a8:
        t1 = "na" if probe_top1 is None else f"{probe_top1:.3f}"
        tag = f",int{quant_bits}-w8a8,top1={t1}"
    elif quant_bits:
        tag = f",int{quant_bits}"
    else:
        tag = ""
    results = {}
    for bsz in sizes:
        def _point(bsz=bsz):
            batch = make_batch(cfg, num_images=bsz, rows_per_image=1,
                               text_len=TEXT_LEN, dtype=dtype)
            dt, compile_s, val = _timeit(fn, params, batch)
            return dt, compile_s, val

        r = _with_retry(f"batch {bsz}", _point)
        if r is None:
            continue            # a failed size must not abort the sweep
        dt, compile_s, val = r
        ips = bsz / dt
        mfu = flops * ips / V5E_BF16_PEAK
        results[bsz] = (ips, mfu)
        log(f"bench: batch {bsz}: {dt * 1e3:.1f} ms/step, "
            f"{ips:.2f} img/s, MFU {mfu * 100:.1f}% "
            f"(compile {compile_s:.1f}s, val {val:.3f})")
        best = max(results, key=lambda b: results[b][0])
        print(_result_line(config_name, best, *results[best], tag),
              flush=True)

    if not results:
        raise RuntimeError("no batch size fit")
    best_bsz = max(results, key=lambda b: results[b][0])
    ips, mfu = results[best_bsz]
    return ips, mfu, best_bsz, tag


def _maybe_calibrate(params, cfg, w8a8, dtype, text_len):
    """SmoothQuant calibration stats from one synthetic batch (bf16 weights
    must still be live).  None (and a log line) on failure — the caller
    quantizes unsmoothed."""
    if not w8a8:
        return None
    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg

    calib = make_batch(cfg, num_images=1, rows_per_image=1,
                       text_len=text_len, dtype=dtype)
    t0 = time.perf_counter()
    st = _with_retry(
        "w8a8 calibration",
        lambda: llmseg.calibrate_quant_stats(params, cfg, calib))
    log(f"bench: w8a8 smoothquant calibration "
        f"{time.perf_counter() - t0:.1f}s"
        + ("" if st is not None else " FAILED — quantizing unsmoothed"))
    return st


def run_valloop(config_name: str, val_batch: int = 8, n_images: int = 48,
                quant_bits=None, w8a8=False):
    """Time the BATCHED validation loop (BASELINE configs[3]: 'ReasonSeg
    val eval loop with gIoU/cIoU at batch 8 per chip'): device forwards at
    `val_batch` plus the host-side mask compose + IoU accumulation of
    train/evaluate.run_validation, on synthetic data.  Reports val
    images/s — the end-to-end eval rate, not just the forward."""
    import numpy as np

    import jax

    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg
    from llmseg_tpu.train import evaluate as eval_lib
    from llmseg_tpu.train.train_step import make_eval_step

    cfg, dtype = _setup(config_name)
    TEXT_LEN = min(512, cfg.max_seq_len - cfg.llava.num_image_tokens + 1)
    params = _init_params(cfg, dtype)
    if quant_bits:
        from llmseg_tpu.ops import quant

        quant.quantize_llama_inplace(
            params["llava"]["llm"], bits=quant_bits, w8a8=w8a8,
            smooth_stats=_maybe_calibrate(params, cfg, w8a8, dtype,
                                          TEXT_LEN),
            head_dim=cfg.llava.llm.head_dim)
        jax.block_until_ready(params["llava"]["llm"])
    step = jax.jit(make_eval_step(cfg))
    rng = np.random.RandomState(0)
    segs_origin = (rng.rand(480, 640, cfg.max_proposals) < 0.3).astype(
        np.uint8)
    gt = (rng.rand(480, 640) < 0.3).astype(np.float32)

    def batches():
        for i in range(n_images // val_batch):
            batch = make_batch(cfg, num_images=val_batch, rows_per_image=1,
                               text_len=TEXT_LEN, dtype=dtype, seed=i)
            extras = {"segs_origin": [segs_origin] * val_batch,
                      "masks_list": [[gt]] * val_batch,
                      "image_paths": [None] * val_batch,
                      "conversations": [[""]] * val_batch}
            yield batch, extras

    # warm-up pass compiles the eval step; timed pass measures steady state
    eval_lib.run_validation(step, params,
                            iter(list(batches())[:1]), strategy="threshold")
    t0 = time.perf_counter()
    res = eval_lib.run_validation(step, params, batches(),
                                  strategy="threshold")
    dt = time.perf_counter() - t0
    ips = n_images / dt
    log(f"bench: valloop batch{val_batch}: {n_images} images in {dt:.2f}s "
        f"= {ips:.2f} img/s (giou {res['giou']:.3f})")
    return ips


def run_amg(n_images: int = 16, survivors: int = 64, model: str = "vit_h",
            points_per_side: int = 32):
    """AMG extraction throughput (BASELINE configs[0]/[1]; VERDICT r4 #3):
    SAM ViT-H everything-mode over synthetic images through the SAME
    pipelined submit/prefetch/finish path as cli/prepare.py (reference hot
    path prepare_datasets/prepare_ReasonSeg.py:55-116 ->
    automatic_mask_generator.py:126-321).  Random weights produce no
    realistic detections, so the IoU/stability gates are opened and
    max_masks capped at `survivors` — giving every image the full
    K-survivor host load (upscale + download + RLE) that dominates the
    pipelined cost.

    Survivor CONTENT is pinned to trained-SAM mask statistics: random
    weights emit salt-and-pepper logits whose thresholded masks overflow
    the device-RLE run budget (MAX_RUNS_PER_COL) on every column, forcing
    the 8.4 MB bit-packed fallback + host speckle-RLE for all K masks —
    a workload no trained SAM produces (measured 788 ms/image, 4x the
    real load).  After each submit the lane swaps `masks_low` for fixed
    blobby ellipse logits (1-2 threshold crossings per column, one
    device-resident array reused across images, zero per-image upload);
    encode + select still run in full on the real program.
    Reports images/s."""
    import numpy as np

    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.models.sam import amg as amg_lib
    from llmseg_tpu.models.sam import sam as sam_lib

    _setup("llmseg_7b")      # cache + backend log only; SAM has its own cfg
    import jax.numpy as jnp

    cfg = (sam_lib.MODEL_REGISTRY[model]() if model in sam_lib.MODEL_REGISTRY
           else getattr(C, f"sam_{model}")())
    t0 = time.perf_counter()
    params = jax.jit(lambda k: sam_lib.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"bench: sam init {time.perf_counter() - t0:.1f}s")
    # gates opened so RANDOM weights still carry a full K-survivor load:
    # random nets emit near-identical full-extent boxes, so a real NMS
    # threshold would collapse everything to ~1 survivor and the lane
    # would measure the 0-survivor pipeline instead; box IoU <= 1 < 1.1
    # means NMS keeps all, and top-K caps at exactly `survivors`
    amg_cfg = C.AMGConfig(points_per_side=points_per_side,
                          pred_iou_thresh=-1e9, stability_score_thresh=-1.0,
                          box_nms_thresh=1.1, max_masks=survivors)
    gen = amg_lib.AutomaticMaskGenerator(params, cfg, amg_cfg)

    rs = np.random.RandomState(0)
    # structured synthetic frames (blobby, not white noise) at the
    # reference's longest-side-1024 prep size (3:4 of the encoder input);
    # vary per image so nothing is constant-folded or host-cached
    W = cfg.encoder.img_size
    H = W * 3 // 4
    base = (rs.rand(12, 16, 3) * 255)
    cell = -(-W // 16)
    imgs = []
    for i in range(n_images):
        lo = np.roll(base, i, axis=0)
        img = np.kron(lo, np.ones((cell, cell, 1)))[:H, :W]
        imgs.append(np.clip(img + rs.randn(H, W, 3) * 8, 0,
                            255).astype(np.uint8))

    # build the blobby survivor logits once, shaped/typed off a probe
    # submit (masks_low is (K, S, S) low-res logits)
    probe = gen.submit(imgs[0])
    ml = probe["out"]["masks_low"]
    K, S = int(ml.shape[0]), int(ml.shape[-1])
    yy, xx = (np.mgrid[0:S, 0:S].astype(np.float32) + 0.5) / S
    rb = np.random.RandomState(1)
    cx, cy = rb.rand(2, K) * 0.7 + 0.15
    rx, ry = rb.rand(2, K) * 0.18 + 0.06
    d2 = (((xx[None] - cx[:, None, None]) / rx[:, None, None]) ** 2
          + ((yy[None] - cy[:, None, None]) / ry[:, None, None]) ** 2)
    blobby = jax.device_put(
        (cfg.mask_threshold + 8.0 * (1.0 - d2)).astype(ml.dtype))
    probe["out"] = dict(probe["out"], masks_low=blobby)
    gen.finish(probe)

    def pipeline(images):
        n_masks = 0
        pending = None
        for img in images:
            if pending is not None:
                gen.prefetch(pending)
            handle = gen.submit(img)
            handle["out"] = dict(handle["out"], masks_low=blobby)
            if pending is not None:
                n_masks += len(gen.finish(pending))
            pending = handle
        n_masks += len(gen.finish(pending))
        return n_masks

    t0 = time.perf_counter()
    warm_masks = pipeline(imgs[:2])      # compile (encoder + select + rle)
    log(f"bench: amg warmup {time.perf_counter() - t0:.1f}s "
        f"({warm_masks / 2:.0f} survivors/image)")
    t0 = time.perf_counter()
    n_masks = pipeline(imgs)
    dt = time.perf_counter() - t0
    ips = n_images / dt
    log(f"bench: amg {n_images} images in {dt:.2f}s = {ips:.2f} img/s "
        f"({dt / n_images * 1e3:.0f} ms/image, "
        f"{n_masks / n_images:.0f} survivors/image)")
    return ips, n_masks / n_images


def run_trainstep(config_name: str, text_len: int = 512):
    """Single-chip QLoRA train-step time (BASELINE configs[4]; VERDICT r4
    #5): 7B with int8 frozen base, LoRA + embeds/heads trainable,
    remat_policy='dots', donated buffers, 1 image / 1 conversation row —
    the 215 ms/step configuration from COMPONENTS.md, now driver-visible.
    Reports ms/step.  The reference's only training observability is
    secs/batch (training.py:571-573)."""
    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg
    from llmseg_tpu.parallel import mesh as M
    from llmseg_tpu.train import optim, train_step as ts_lib

    cfg, dtype = _setup(config_name)
    tcfg = C.TrainConfig(quantize_frozen=True, quantize_bits=8,
                         remat_policy="dots", grad_accum_steps=1)
    lora_cfg = tcfg.lora
    mesh = M.make_mesh(C.MeshConfig(data=1, fsdp=1, tensor=1))

    with mesh:
        # quantize INSIDE the init jit: eager quantization would hold the
        # bf16 and int8 trees simultaneously and OOM the 16 GB chip
        def init_all(k):
            params = llmseg.init(k, cfg, dtype=dtype, lora_cfg=lora_cfg)
            trainable, skeleton = optim.partition(params)
            return trainable, optim.quantize_skeleton(
                skeleton, bits=tcfg.quantize_bits)

        t0 = time.perf_counter()
        trainable, skeleton = jax.jit(init_all)(jax.random.PRNGKey(0))
        jax.block_until_ready(trainable)
        log(f"bench: qlora init {time.perf_counter() - t0:.1f}s")
        tx = optim.make_trainable_optimizer(tcfg)
        opt_state = jax.jit(tx.init)(trainable)
        step = ts_lib.make_partitioned_train_step(
            cfg, tx, lora_cfg=lora_cfg, remat=tcfg.remat_policy)
        jstep = jax.jit(step, donate_argnums=(0, 2))
        batch = make_batch(cfg, num_images=1, rows_per_image=1,
                           text_len=text_len, dtype=dtype)

        t0 = time.perf_counter()
        trainable, opt_state, metrics = jstep(trainable, skeleton,
                                              opt_state, batch)
        loss = float(metrics["loss"])
        log(f"bench: trainstep compile {time.perf_counter() - t0:.1f}s "
            f"(loss {loss:.3f})")
        iters, ts = 8, []
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for _ in range(iters):
                trainable, opt_state, metrics = jstep(trainable, skeleton,
                                                      opt_state, batch)
                outs.append(metrics["loss"])
            for o in outs:      # tunnel sync (block_until_ready lies here)
                float(o)
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / iters
        log(f"bench: trainstep {dt * 1e3:.1f} ms/step (qlora int8, "
            f"remat=dots, text_len={text_len})")
        return dt


def run_tower(config_name: str, tower: str, quant_bits=None, w8a8=False,
              num_images: int = 1):
    """Time ONE tower in a fresh process (VERDICT r2 weak #3: in-process
    tower scans at 7B OOM against the sweep's leftovers; isolating each
    tower makes the breakdown reproducible from the committed bench).
    quant_bits/w8a8 quantize the LLM in place first, so the W8A8 LLaMA
    split (~40 ms vs 66 bf16) is reproducible too.  num_images>1 times the
    tower at the flagship batch point (per-BATCH ms, not per-image)."""
    import jax
    import jax.numpy as jnp

    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llama, llava, llmseg, selection_head

    cfg, dtype = _setup(config_name)
    TEXT_LEN = 512
    params = _init_params(cfg, dtype)
    if quant_bits:
        from llmseg_tpu.ops import quant

        quant.quantize_llama_inplace(
            params["llava"]["llm"], bits=quant_bits, w8a8=w8a8,
            smooth_stats=_maybe_calibrate(params, cfg, w8a8, dtype,
                                          TEXT_LEN),
            head_dim=cfg.llava.llm.head_dim)
        jax.block_until_ready(params["llava"]["llm"])
    batch = make_batch(cfg, num_images=num_images, rows_per_image=1,
                       text_len=TEXT_LEN, dtype=dtype)
    lv = cfg.llava

    # prune the param subtrees this tower does not touch: the full 7B tree
    # is ~15.4 GB of 16 GB HBM, and the scan-of-llama program needs the
    # freed headroom (this is what OOM'd the in-process breakdown in r2 AND
    # the first isolated attempt in r3)
    if tower == "dino":
        params = {"dino": params["dino"], "select": params["select"]}
        f = lambda p, b, x: llmseg.dino_features(
            p, cfg, b["images_dino"] + x.astype(dtype)).sum()
        args = (params, batch)
    elif tower == "clip":
        params = {"llava": {
            "vision_tower": params["llava"]["vision_tower"],
            "mm_projector": params["llava"]["mm_projector"]}}
        f = lambda p, b, x: llava.encode_images(
            p["llava"], lv, b["images_clip"] + x.astype(dtype)).sum()
        args = (params, batch)
    elif tower == "llama":
        img_embeds = jax.jit(lambda p, b: llava.encode_images(
            p["llava"], lv, b["images_clip"]))(params, batch)
        jax.block_until_ready(img_embeds)
        params.pop("dino")
        params.pop("select")
        params["llava"].pop("vision_tower")
        f = lambda p, b, e, x: llava.forward(
            p["llava"], lv, input_ids=b["input_ids"],
            image_pos=b["image_pos"],
            image_embeds=e + x.astype(dtype)).sum()
        args = (params, batch, img_embeds)
    elif tower == "select_head":
        params = {"select": params["select"]}
        R, K, D = num_images, cfg.max_proposals, cfg.select.dim
        pe = jnp.zeros((R, K, D), dtype)
        te = jnp.zeros((R, D), dtype)
        pv = jnp.ones((R, K), bool)
        f = lambda p, x: selection_head.apply(
            p["select"], cfg.select, pe + x.astype(dtype), te, pv)[0].sum()
        args = (params,)
    else:
        raise ValueError(f"unknown tower {tower!r}")

    r = _with_retry(f"tower {tower}",
                    lambda: _timeit_scan(f, args, iters=8, repeats=2))
    if r is None:
        raise RuntimeError(f"tower {tower} failed twice")
    dt, _, _ = r
    log(f"bench: tower {tower}: {dt * 1e3:.2f} ms")
    return dt


def _result_line(config_name, bsz, ips, mfu, tag=""):
    return json.dumps({
        "metric": (f"reasonseg_e2e_infer_images_per_sec_chip"
                   f"[{config_name},batch{bsz}{tag},"
                   f"vs_baseline=mfu_v5e_bf16]"),
        "value": round(ips, 4),
        "unit": "images/s",
        "vs_baseline": round(mfu, 4),
    })


def _pick_headline(bf16_line, int8_line, w8a8_line):
    """Best lane wins, with honesty gates: int8 weight-only is a
    reference-supported mode (builder.py load_8bit) and competes freely;
    the W8A8 lane (activation quant, beyond the reference) is promoted
    only when its ranking probe was exact (top1=1.000 in the metric tag).
    A lane whose line fails to parse never displaces a parsed one."""
    def val(line):
        try:
            return json.loads(line)["value"]
        except Exception:
            return None

    headline = bf16_line if val(bf16_line) is not None else None
    if val(int8_line) is not None and (
            headline is None or val(int8_line) > val(headline)):
        headline = int8_line
    if val(w8a8_line) is not None and "top1=1.000" in w8a8_line and (
            headline is None or val(w8a8_line) > val(headline)):
        headline = w8a8_line
    return headline


def _subprocess(argv, timeout=3600, stream=False):
    """Run bench.py `argv` as a child; return its LAST banked JSON line.

    stream=True tees every banked line straight to OUR stdout as it
    appears (last-line-wins for the driver), so even a SIGKILL of this
    orchestrator mid-lane keeps the child's best-so-far on record.  Used
    for lanes whose lines need no gating (bf16/int8); the W8A8 lane stays
    captured because its line must pass the top1=1.000 gate first."""
    import subprocess

    if stream:
        import threading

        lines = []
        try:
            p = subprocess.Popen([sys.executable, __file__] + argv,
                                 stdout=subprocess.PIPE, text=True)
        except Exception as e:
            log(f"bench: subprocess {argv} failed: {type(e).__name__}")
            return None

        def _pump():
            for ln in p.stdout:
                ln = ln.rstrip("\n")
                if ln.startswith("{"):
                    lines.append(ln)
                    print(ln, flush=True)

        th = threading.Thread(target=_pump, daemon=True)
        th.start()
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            log(f"bench: subprocess {argv} timed out after {timeout}s "
                f"(salvaging banked lines)")
            p.kill()
            p.wait()
            rc = None
        th.join(timeout=30)
        if lines and rc not in (0, None):
            log(f"bench: subprocess {argv} rc={rc}, using banked result")
        elif not lines:
            log(f"bench: subprocess {argv} rc={rc}")
        return lines[-1] if lines else None

    stdout, stderr, rc = "", "", None
    try:
        r = subprocess.run([sys.executable, __file__] + argv,
                           capture_output=True, text=True, timeout=timeout)
        stdout, stderr, rc = r.stdout, r.stderr, r.returncode
    except subprocess.TimeoutExpired as e:
        # a wedged backend can hang a sweep indefinitely; the run() loop
        # prints its best-so-far RESULT line after every point, so the
        # partial stdout still carries a usable headline
        stdout = e.stdout or ""
        stderr = e.stderr or ""
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
        log(f"bench: subprocess {argv} timed out after {timeout}s "
            f"(salvaging partial output)")
    except Exception as e:       # spawn failure: keep going
        log(f"bench: subprocess {argv} failed: {type(e).__name__}")
        return None
    sys.stderr.write(stderr)
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    line = lines[-1] if lines else None   # last = best-so-far
    if line:
        # accept even on rc != 0: a banked point survives a later crash
        if rc not in (0, None):
            log(f"bench: subprocess {argv} rc={rc}, using banked result")
        return line
    log(f"bench: subprocess {argv} rc={rc}")
    return None


def run_probe():
    """Tiny-matmul backend liveness probe (`--probe`).  Prints PROBE_OK on
    success; any outage (init UNAVAILABLE, hang) surfaces as a non-zero rc
    or a timeout at the caller."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    v = float(jax.jit(lambda a: (a @ a.T).sum())(x))
    print(f"PROBE_OK {v}", flush=True)


def _probe_backend(timeout=150):
    """True iff the backend answers a 128x128 matmul within `timeout`.
    The outage signature (VERDICT r3 weak #1) — init UNAVAILABLE or a
    silent init hang — must fail FAST here, never inside a 40-min lane.

    Timeout calibration (measured 2026-08-19): a COLD backend legitimately
    takes 3-4 min to init through the tunnel; once warm, init is ~20 s.
    The first probe of a run must get a cold-init budget (see COLD_PROBE_S)
    — killing the probe mid-init is itself a wedge trigger — while later
    probes keep the short budget, because by then a hang means trouble."""
    import subprocess

    t0 = time.monotonic()
    try:
        r = subprocess.run([sys.executable, __file__, "--probe"],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        log(f"bench: probe timed out after {timeout}s (backend init hang)")
        return False
    except Exception as e:
        log(f"bench: probe spawn failed: {type(e).__name__}")
        return False
    if "PROBE_OK" in (r.stdout or ""):
        log(f"bench: probe ok in {time.monotonic() - t0:.0f}s")
        return True
    err = (r.stderr or "")[-400:]
    sig = next((s for s in OUTAGE_SIGNATURES if s in (r.stderr or "")), None)
    log(f"bench: probe failed rc={r.returncode}"
        f"{f' signature={sig!r}' if sig else ''}: {err}")
    return False


def _probe_with_retry(time_left=None, retries=2):
    """Probe the backend, sleeping RETRY_SLEEP_S between failures.  A big
    lane can leave the backend wedged for a few minutes (observed
    2026-08-19: two 150 s probe timeouts right after the flagship lane,
    then a 78 s success) — one failed probe must not permanently skip the
    next lane, which is exactly how the 12+ img/s W8A8 headline got
    dropped from an otherwise-healthy run."""
    for i in range(retries + 1):
        if _probe_backend():
            return True
        if i == retries:
            break
        if time_left is not None and time_left() < 900:
            log("bench: no time left for a probe retry")
            break
        log(f"bench: probe retry in {RETRY_SLEEP_S}s")
        time.sleep(RETRY_SLEEP_S)
    return False


def _read_last_good():
    try:
        with open(LAST_GOOD_PATH) as f:
            d = json.load(f)
        if isinstance(d.get("value"), (int, float)) and d["value"] > 0:
            return d
    except Exception:
        pass
    return None


def _git_commit():
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__))
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _write_last_good(line):
    """Bank the headline, keeping the BEST measured value.  Monotonic on
    purpose: the bank only feeds the outage fallback tag, and a degraded
    run (observed 2026-08-19: the W8A8 lane lost to a post-lane backend
    wedge, leaving only bf16 8.98) must not erase a better known-good
    (12.16 W8A8).  Regression awareness (VERDICT r4 #7 + ADVICE r4):
    every run's headline is appended, commit-stamped, to
    .bench_history.jsonl — the round-over-round record — and the banked
    entry carries the commit + timestamp that produced it, so a stale
    bank is attributable."""
    try:
        d = json.loads(line)
        if d.get("value", 0) <= 0:
            return
        d = dict(d, commit=_git_commit(), ts=int(time.time()))
        with open(HISTORY_PATH, "a") as f:
            json.dump(d, f)
            f.write("\n")
        prev = _read_last_good()
        if prev is None or d["value"] >= prev["value"]:
            with open(LAST_GOOD_PATH, "w") as f:
                json.dump(d, f)
                f.write("\n")
    except Exception as e:
        log(f"bench: could not bank last-good headline: {e}")


def _tag_regression(line, threshold: float = 0.9):
    """Append a `regressed_from=` tag to the headline's metric when this
    run's best lane lands >10% below the banked best (VERDICT r4 #7): the
    monotonic bank then cannot silently misrepresent a degraded current
    commit — the regression is visible in the recorded line itself."""
    lg = _read_last_good()
    if not lg or not line:
        return line
    try:
        d = json.loads(line)
        if d.get("value", 0) > 0 and d["value"] < threshold * lg["value"]:
            d["metric"] = (f"{d['metric'][:-1]},regressed_from="
                           f"{lg['value']}@{lg.get('commit', 'unknown')}]"
                           if d["metric"].endswith("]") else
                           f"{d['metric']},regressed_from={lg['value']}")
            return json.dumps(d)
    except Exception:
        pass
    return line


def _fallback_line(reason):
    """A valid zero-value JSON line labeled with why there is no
    measurement, quoting the banked last-known-good (VERDICT r3 weak #5:
    no hardcoded literal)."""
    lg = _read_last_good()
    if lg:
        lane = ("w8a8" if "w8a8" in lg["metric"]
                else "int8" if "int8" in lg["metric"] else "bf16")
        m = re.search(r"batch(\d+)", lg["metric"])
        tag = (f"last_known_good={lg['value']}_{lane}"
               f"{f'_batch{m.group(1)}' if m else ''}")
    else:
        tag = "last_known_good=none"
    return json.dumps({
        "metric": (f"reasonseg_e2e_infer_images_per_sec_chip"
                   f"[no_measurement,{reason},{tag}]"),
        "value": 0.0, "unit": "images/s", "vs_baseline": None})


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="bench one named config only")
    ap.add_argument("--tower", default=None, choices=TOWERS,
                    help="time one tower only (implies --config)")
    ap.add_argument("--tower_batch", type=int, default=1,
                    help="images per tower timing batch (per-BATCH ms)")
    ap.add_argument("--quant", type=int, default=None, choices=[8, 4],
                    help="int weight-only quantized sweep (ref load_8bit)")
    ap.add_argument("--w8a8", action="store_true",
                    help="with --quant 8: also quantize activations per "
                         "token and run s8 x s8 MXU matmuls (double rate; "
                         "beyond the reference's load_8bit)")
    ap.add_argument("--probe", action="store_true",
                    help="tiny-matmul backend liveness probe")
    ap.add_argument("--valloop", action="store_true",
                    help="time the batched validation loop (val images/s)")
    ap.add_argument("--val_batch", type=int, default=8)
    ap.add_argument("--amg", action="store_true",
                    help="time SAM ViT-H everything-mode extraction "
                         "(BASELINE configs[0]/[1]; pipelined, 64-survivor "
                         "load)")
    ap.add_argument("--trainstep", action="store_true",
                    help="time the single-chip QLoRA train step "
                         "(BASELINE configs[4])")
    args = ap.parse_args()

    if args.probe:
        run_probe()
        return
    if args.amg:
        try:
            ips, surv = run_amg()
            print(json.dumps({
                "metric": (f"amg_images_per_sec[vit_h,pipelined,"
                           f"{surv:.0f}_survivors]"),
                "value": round(ips, 3), "unit": "images/s",
                "vs_baseline": None}))
            return
        except Exception as e:
            log(f"bench: amg failed: {type(e).__name__}: {e}")
            sys.exit(1)
    if args.config:
        try:
            if args.trainstep:
                dt = run_trainstep(args.config)
                print(json.dumps({
                    "metric": (f"train_step_ms[{args.config},qlora_int8,"
                               f"remat_dots,batch1]"),
                    "value": round(dt * 1e3, 2), "unit": "ms",
                    "vs_baseline": None}))
            elif args.valloop:
                ips = run_valloop(args.config, val_batch=args.val_batch,
                                  quant_bits=args.quant, w8a8=args.w8a8)
                qt = (f",int{args.quant}{'-w8a8' if args.w8a8 else ''}"
                      if args.quant else "")
                print(json.dumps({
                    "metric": (f"val_loop_images_per_sec"
                               f"[{args.config},batch{args.val_batch}{qt}]"),
                    "value": round(ips, 3), "unit": "images/s",
                    "vs_baseline": None}))
            elif args.tower:
                dt = run_tower(args.config, args.tower,
                               quant_bits=args.quant, w8a8=args.w8a8,
                               num_images=args.tower_batch)
                qt = (f",int{args.quant}{'-w8a8' if args.w8a8 else ''}"
                      if args.quant else "")
                qt += (f",batch{args.tower_batch}"
                       if args.tower_batch != 1 else "")
                print(json.dumps({
                    "metric": f"tower_ms[{args.config},{args.tower}{qt}]",
                    "value": round(dt * 1e3, 3), "unit": "ms",
                    "vs_baseline": None}))
            else:
                ips, mfu, bsz, tag = run(args.config,
                                         quant_bits=args.quant,
                                         w8a8=args.w8a8)
                print(_result_line(args.config, bsz, ips, mfu, tag))
            return
        except Exception as e:
            log(f"bench: {args.config} failed: {type(e).__name__}: {e}")
            # no zero-line here: run() already banked any successful points
            # on stdout, and the orchestrator takes the LAST result line —
            # a zero line would clobber a banked one
            sys.exit(1)
    else:
        sys.exit(_orchestrate())


def _orchestrate():
    """One subprocess per measurement — a 7B run leaves the 16 GB chip too
    fragmented for a second model in-process.  Contract with the driver
    (VERDICT r3 #1): the LAST stdout line is ALWAYS a valid JSON result,
    no matter when this process is killed.  Achieved by (a) printing a
    labeled zero-value fallback line before any TPU work, (b) streaming
    the bf16/int8 lanes' banked per-point lines straight through, and
    (c) re-printing the gated best-so-far headline after every lane."""
    t_start = time.monotonic()
    # budgeted against the MEASURED driver window (VERDICT r4 #2: r04's
    # tail shows ~55 min wall with ~9 min lost to wedge retries; 4200 s
    # produced rc=124 three rounds running) — finish and exit rc=0 first
    DEADLINE_S = 3000
    flagship = "llmseg_7b"

    def time_left():
        return DEADLINE_S - (time.monotonic() - t_start)

    # (a) a parseable line is on stdout BEFORE any backend contact
    print(_fallback_line("no_lane_completed_yet"), flush=True)

    lanes = {"bf16": None, "int8": None, "w8a8": None}

    def emit():
        h = _tag_regression(
            _pick_headline(lanes["bf16"], lanes["int8"], lanes["w8a8"]))
        if h:
            print(h, flush=True)
        return h

    # (b) outage fail-fast: a backend that cannot answer a 128x128 matmul
    # gets ONE short retry, never a 40-minute lane.  The first probe gets
    # the cold-init budget (a true outage still fails fast: the init
    # UNAVAILABLE signature surfaces in ~1 min, long before the cap)
    if not _probe_backend(timeout=COLD_PROBE_S):
        log(f"bench: backend down; one retry in {RETRY_SLEEP_S}s")
        time.sleep(RETRY_SLEEP_S)
        if not _probe_backend():
            print(_fallback_line("backend_outage"), flush=True)
            return 1

    # W8A8 lane runs FIRST (s8 x s8 MXU matmuls, double rate): it is the
    # best lane (12+ img/s vs ~9.0 bf16), and the driver window may be
    # short — the headline must be on stdout before anything else runs.
    # Captured, NOT streamed — its line is promoted only when it wins AND
    # its ranking probe was exact (top1=1.000 in the metric tag); the
    # bf16 lane below is the reference-supported backup.
    lanes["w8a8"] = _subprocess(
        ["--config", flagship, "--quant", "8", "--w8a8"],
        timeout=min(1800, max(900, time_left())))
    if lanes["w8a8"]:
        log(f"bench: RESULT {flagship} w8a8: {lanes['w8a8']}")
    emit()

    # bf16 flagship (the reference-comparable MFU point) — up to 2
    # attempts, each bounded so a mid-run wedge cannot consume the whole
    # deadline; generous floor (900 s) because killing a client
    # mid-compile is what wedges the backend for hours
    for attempt in (1, 2):
        if not _probe_with_retry(time_left):
            log("bench: backend down before bf16 lane; skipping")
            break
        lanes["bf16"] = _subprocess(["--config", flagship],
                                    timeout=min(1500, max(900, time_left())),
                                    stream=True)
        if lanes["bf16"]:
            log(f"bench: RESULT {flagship}: {lanes['bf16']}")
            break
        if attempt == 1:
            log(f"bench: flagship retry after {RETRY_SLEEP_S}s")
            time.sleep(RETRY_SLEEP_S)
    emit()

    # BASELINE-config lanes run BEFORE the capacity sweep and tower
    # diagnostics (VERDICT r4 #2/#3/#5): a short driver window must record
    # the measured-config set first.  Each lane prints its own JSON line
    # (streamed through), so a later kill keeps them; _pick_headline only
    # considers e2e lanes, so these cannot displace the headline.

    # batched validation loop rate (BASELINE configs[3])
    if time_left() > 700 and _probe_with_retry(time_left):
        vl = _subprocess(["--config", flagship, "--valloop",
                          "--quant", "8", "--w8a8"],
                         timeout=min(900, max(600, time_left())),
                         stream=True)
        if vl:
            log(f"bench: RESULT valloop: {vl}")
        emit()

    # AMG extraction throughput (BASELINE configs[0]/[1])
    if time_left() > 700 and _probe_with_retry(time_left):
        am = _subprocess(["--amg"],
                         timeout=min(1100, max(600, time_left())),
                         stream=True)
        if am:
            log(f"bench: RESULT amg: {am}")
        emit()

    # single-chip QLoRA train-step time (BASELINE configs[4])
    if time_left() > 600 and _probe_with_retry(time_left):
        ts_line = _subprocess(["--config", flagship, "--trainstep"],
                              timeout=min(900, max(500, time_left())),
                              stream=True)
        if ts_line:
            log(f"bench: RESULT trainstep: {ts_line}")
        emit()

    # int8 weight-only sweep (reference load_8bit; batch-8 capacity
    # point) — competes freely for the headline in _pick_headline
    if time_left() > 900 and _probe_with_retry(time_left):
        lanes["int8"] = _subprocess(["--config", flagship, "--quant", "8"],
                                    timeout=min(1500, time_left()),
                                    stream=True)
        if lanes["int8"]:
            log(f"bench: RESULT {flagship} int8: {lanes['int8']}")
        emit()

    # reproducible tower breakdown, each in its own process — pure
    # diagnostics, last, each skippable at fine granularity
    if time_left() > 420 and _probe_with_retry(time_left):
        for t in TOWERS + ("llama_w8a8",):
            if time_left() < 420:
                log(f"bench: deadline reached, skipping tower {t}")
                continue
            argv = (["--config", flagship, "--tower", "llama",
                     "--quant", "8", "--w8a8"] if t == "llama_w8a8"
                    else ["--config", flagship, "--tower", t])
            # captured, NOT streamed: a mid-loop kill must leave the
            # HEADLINE as the last stdout line, not a tower_ms diagnostic
            # (the value reaches the driver record via the stderr log)
            _subprocess(argv, timeout=min(600, time_left()))

    headline = emit()
    if not headline and time_left() > 300 and _probe_backend():
        small = _subprocess(["--config", "llmseg_small"],
                            timeout=max(600, time_left()), stream=True)
        if small:
            log(f"bench: RESULT llmseg_small: {small}")
            lanes["bf16"] = small
            headline = emit()
    if headline:
        _write_last_good(headline)
        return 0
    # every lane failed after a live probe — label it, quote the banked
    # last-known-good, and leave the labeled line as the final word
    print(_fallback_line("all_lanes_failed"), flush=True)
    return 1


if __name__ == "__main__":
    main()
