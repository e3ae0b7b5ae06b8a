"""Post-review-fix TPU drive: AMG finish at 64 forced survivors still
matches the packed assembly, including a forced-overflow pass."""
import numpy as np, jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from llmseg_tpu.config import sam_vit_h, AMGConfig
import llmseg_tpu.models.sam.sam as S
import llmseg_tpu.models.sam.amg as amg_mod
from llmseg_tpu.models.sam.amg import AutomaticMaskGenerator, upscale_binary
from llmseg_tpu.ops import rle

cfg = sam_vit_h()
params = S.init(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
amg = AutomaticMaskGenerator(params, cfg, AMGConfig())
rng = np.random.default_rng(0)
img = rng.integers(0, 255, (768, 1024, 3), np.uint8)
handle = amg.submit(img)
out = dict(handle["out"])
n = 64
lowres = out["masks_low"].shape[-1]
yy, xx = np.meshgrid(np.arange(lowres), np.arange(lowres), indexing="ij")
masks_low = np.full(np.asarray(out["masks_low"]).shape, -8.0, np.float32)
for i in range(n):
    cy, cx = rng.integers(20, lowres - 20, 2); rad = rng.integers(8, 60)
    masks_low[i][(yy - cy) ** 2 + (xx - cx) ** 2 < rad ** 2] = 8.0
out["masks_low"] = jax.device_put(jnp.asarray(masks_low, out["masks_low"].dtype))
out["valid"] = jax.device_put(jnp.asarray(np.arange(len(np.asarray(out["valid"]))) < n))

def packed_golden():
    nn, small = amg._pull_survivors(out)
    s_in = cfg.encoder.img_size
    h, w = handle["hw"]
    packed = jax.device_get(upscale_binary(
        out["masks_low"], (s_in, s_in), cfg.mask_threshold,
        bucket=amg._bucket(nn)))
    anns = []
    for i in range(nn):
        r, a, bbox = rle.encode_packed(packed[i], h, w)
        if a:
            anns.append({"segmentation": r, "area": int(a),
                         "bbox": [float(v) for v in bbox],
                         "predicted_iou": float(small["iou"][i]),
                         "point_coords": [[float(small["points"][i][0]),
                                           float(small["points"][i][1])]],
                         "stability_score": float(small["stability"][i]),
                         "crop_box": [0, 0, w, h]})
    anns.sort(key=lambda x: x["area"], reverse=True)
    return anns

golden = packed_golden()
got = amg.finish({"out": dict(out), "hw": handle["hw"]})
assert got == golden, "device-RLE path diverged"
amg_mod.MAX_RUNS_PER_COL = 1  # force every mask through the batched fallback
got2 = amg.finish({"out": dict(out), "hw": handle["hw"]})
assert got2 == golden, "overflow fallback diverged"
print(f"TPU drive OK: {len(got)} annotations; overflow fallback identical")
