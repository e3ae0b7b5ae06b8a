import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmseg_tpu import config as C
from llmseg_tpu.data.synthetic import make_batch
from llmseg_tpu.models import llmseg
from llmseg_tpu.train import checkpoint as ckpt_lib
from llmseg_tpu.train import evaluate as eval_lib
from llmseg_tpu.train import loader as loader_lib
from llmseg_tpu.train import optim, train_step as ts_lib


def test_trainable_mask():
    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg,
                         lora_cfg=C.LoraConfig(rank=2))
    mask = optim.trainable_mask(params)
    assert mask["select"]["iou_head"]["layers"][0]["w"] is True
    assert mask["lora"]["layers"][0]["q"]["a"] is True
    assert mask["llava"]["llm"]["embed_tokens"] is True
    assert mask["llava"]["llm"]["lm_head"]["w"] is True
    assert mask["llava"]["llm"]["layers"][0]["attn"]["q"]["w"] is False
    assert mask["dino"]["blocks"][0]["mlp"]["fc1"]["w"] is False


def test_warmup_decay_schedule():
    tcfg = C.TrainConfig(lr=1e-4, warmup_steps=10, epochs=1,
                         steps_per_epoch=100)
    sched = optim.warmup_decay_schedule(tcfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    assert float(sched(55)) < 1e-4
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-9)


def test_train_step_updates_only_trainables():
    cfg = C.llmseg_tiny()
    tcfg = C.TrainConfig(grad_accum_steps=1, epochs=1, steps_per_epoch=10,
                         warmup_steps=0, lr=1e-2)
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(tcfg, params)
    opt_state = tx.init(params)
    step = ts_lib.make_train_step(cfg.model if hasattr(cfg, "model") else cfg,
                                  tx, remat=False)
    batch = make_batch(cfg, num_images=1, rows_per_image=1, text_len=32)
    frozen_before = np.asarray(params["dino"]["blocks"][0]["attn"]["q"]["w"])
    train_before = np.asarray(params["select"]["text_fc1"]["w"])
    params2, opt_state, metrics = jax.jit(step)(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(
        np.asarray(params2["dino"]["blocks"][0]["attn"]["q"]["w"]),
        frozen_before)
    assert np.abs(np.asarray(params2["select"]["text_fc1"]["w"])
                  - train_before).max() > 0


def test_grad_accum_steps():
    cfg = C.llmseg_tiny()
    tcfg = C.TrainConfig(grad_accum_steps=2, epochs=1, steps_per_epoch=10,
                         warmup_steps=0, lr=1e-2)
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(tcfg, params)
    opt_state = tx.init(params)
    step = jax.jit(ts_lib.make_train_step(cfg, tx, remat=False))
    batch = make_batch(cfg, num_images=1, rows_per_image=1, text_len=32)
    before = np.asarray(params["select"]["text_fc1"]["w"])
    params, opt_state, _ = step(params, opt_state, batch)
    # first micro-step: grads accumulated, no update yet
    np.testing.assert_array_equal(
        np.asarray(params["select"]["text_fc1"]["w"]), before)
    params, opt_state, _ = step(params, opt_state, batch)
    assert np.abs(np.asarray(params["select"]["text_fc1"]["w"])
                  - before).max() > 0


def test_eval_selectors():
    sim = np.array([0.9, 0.2, 0.8, 0.1])
    iou = np.array([0.3, 0.9, 0.6, 0.7])
    valid = np.array([True, True, True, False])
    np.testing.assert_array_equal(
        eval_lib.select_argmax_similarity(sim, iou, valid), [0])
    np.testing.assert_array_equal(
        eval_lib.select_threshold(sim, iou, valid, 0.5), [1, 2])
    np.testing.assert_array_equal(
        eval_lib.select_iou_iop(sim, iou, valid, 0.5), [0, 1, 2])
    np.testing.assert_array_equal(
        eval_lib.select_threshold_from_top_iou(sim, iou, valid, 0.5, top_k=2),
        [2])


def test_seg_eval_accumulator():
    acc = eval_lib.SegEvalAccumulator()
    gt = np.zeros((64, 64), np.uint8); gt[:32] = 1
    acc.add(gt.copy(), gt)               # perfect
    pred = np.zeros_like(gt)             # empty prediction
    acc.add(pred, gt)
    r = acc.result()
    np.testing.assert_allclose(r["giou"], 0.5, atol=1e-6)
    np.testing.assert_allclose(r["ciou"], 0.5, atol=1e-6)


def test_run_validation_end_to_end():
    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, num_images=1, rows_per_image=1, text_len=32)
    rng = np.random.RandomState(0)
    segs_origin = (rng.rand(40, 50, cfg.max_proposals) < 0.4).astype(np.uint8)
    gt = (rng.rand(40, 50) < 0.4).astype(np.float32)
    extras = {"segs_origin": [segs_origin], "masks_list": [[gt]],
              "image_paths": [None], "conversations": [[""]]}
    step = jax.jit(ts_lib.make_eval_step(cfg))
    out = eval_lib.run_validation(step, params, [(batch, extras)],
                                  strategy="threshold")
    assert set(out) == {"giou", "ciou"}
    assert np.isfinite(out["giou"]) and np.isfinite(out["ciou"])


def test_run_validation_batched_matches_batch1():
    """VERDICT r3 #4: the batched eval loop (BASELINE configs[3], batch 8)
    must produce bit-identical gIoU/cIoU to the serial batch-1 path,
    including a padded final batch masked via extras['row_valid']."""
    rng = np.random.RandomState(0)
    K, N = 6, 10
    samples = []
    for i in range(N):
        h, w = rng.randint(30, 60), rng.randint(30, 60)
        samples.append({
            "sim": rng.rand(K).astype(np.float32),
            "iou": rng.rand(K).astype(np.float32),
            "valid": rng.rand(K) < 0.8,
            "segs": (rng.rand(h, w, K) < 0.4).astype(np.uint8),
            "gt": (rng.rand(h, w) < 0.4).astype(np.float32),
        })

    # eval_step echoes per-row scores from the batch: trivially
    # batch-size-invariant, isolating run_validation's own batching
    def step(params, batch):
        return {"pred_similarity": batch["sim"], "pred_iou": batch["iou"],
                "prop_valid": batch["valid"]}

    def batches_of(bsz):
        for j in range(0, N, bsz):
            chunk = samples[j:j + bsz]
            n_valid = len(chunk)
            while len(chunk) < bsz:           # pad tail like cli/train.py
                chunk = chunk + [chunk[-1]]
            batch = {k: np.stack([s[k] for s in chunk])
                     for k in ("sim", "iou", "valid")}
            extras = {"segs_origin": [s["segs"] for s in chunk],
                      "masks_list": [[s["gt"]] for s in chunk],
                      "image_paths": [None] * bsz,
                      "conversations": [[""]] * bsz,
                      "row_valid": [True] * n_valid
                      + [False] * (bsz - n_valid)}
            yield batch, extras

    for strategy in ("threshold", "argmax", "iou_iop", "top_iou"):
        r1 = eval_lib.run_validation(step, None, batches_of(1),
                                     strategy=strategy)
        r4 = eval_lib.run_validation(step, None, batches_of(4),
                                     strategy=strategy)
        r8 = eval_lib.run_validation(step, None, batches_of(8),
                                     strategy=strategy)
        assert r1 == r4 == r8, (strategy, r1, r4, r8)


def test_loader_prefetch_and_shard():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int32)}

    def coll(samples):
        return {"x": np.stack([s["x"] for s in samples])}

    ld = loader_lib.BatchLoader(DS(), coll, batch_size=2, steps=3,
                                shuffle=True, seed=0)
    batches = list(ld.epoch(0))
    assert len(batches) == 3
    assert batches[0]["x"].shape == (2, 2)
    # 2-host sharding draws disjoint strides
    ld0 = loader_lib.BatchLoader(DS(), coll, batch_size=2, steps=2,
                                 process_index=0, process_count=2)
    ld1 = loader_lib.BatchLoader(DS(), coll, batch_size=2, steps=2,
                                 process_index=1, process_count=2)
    x0 = np.concatenate([b["x"].ravel() for b in ld0.epoch(0)])
    x1 = np.concatenate([b["x"].ravel() for b in ld1.epoch(0)])
    assert set(x0.tolist()).isdisjoint(set(x1.tolist()))


def test_loader_propagates_errors():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    ld = loader_lib.BatchLoader(Bad(), lambda s: s, batch_size=1, steps=1)
    with pytest.raises(RuntimeError):
        list(ld.epoch(0))


def test_checkpoint_roundtrip(tmp_path):
    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    log_dir = str(tmp_path)
    ckpt_lib.save(log_dir, 7, params, metrics={"giou": 0.5})
    assert ckpt_lib.latest_step(log_dir) == 7
    zeros = jax.tree.map(jnp.zeros_like, params)
    restored, _, step = ckpt_lib.restore(log_dir, params_like=zeros)
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(restored["select"]["text_fc1"]["w"]),
        np.asarray(params["select"]["text_fc1"]["w"]))

    keeper = ckpt_lib.BestKeeper(log_dir, "giou")
    assert keeper.update(8, {"giou": 0.6, "ciou": 0.1}, params)
    assert not keeper.update(9, {"giou": 0.4, "ciou": 0.2}, params)
    keeper2 = ckpt_lib.BestKeeper(log_dir, "giou")
    assert keeper2.best == 0.6


def test_partition_combine_roundtrip():
    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg,
                         lora_cfg=C.LoraConfig(rank=2))
    trainable, skeleton = optim.partition(params)
    assert "select/text_fc1/w" in trainable
    assert "llava/llm/embed_tokens" in trainable
    assert "lora/layers/0/q/a" in trainable
    assert skeleton["select"]["text_fc1"]["w"] is None
    assert skeleton["dino"]["blocks"][0]["attn"]["q"]["w"] is not None
    merged = optim.combine(skeleton, trainable)
    ref, got = jax.tree.leaves(params), jax.tree.leaves(merged)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bits", [8, 4])
def test_partitioned_train_step_and_qlora(bits):
    cfg = C.llmseg_tiny()
    tcfg = C.TrainConfig(grad_accum_steps=1, epochs=1, steps_per_epoch=10,
                         warmup_steps=0, lr=1e-2)
    params = llmseg.init(jax.random.PRNGKey(0), cfg,
                         lora_cfg=C.LoraConfig(rank=2))
    trainable, skeleton = optim.partition(params)
    skeleton_q = optim.quantize_skeleton(skeleton, bits=bits)
    qkey = "w_q" if bits == 8 else "w_q4"
    assert qkey in skeleton_q["llava"]["llm"]["layers"][0]["attn"]["q"]
    # trainable holes untouched by quantization
    assert skeleton_q["llava"]["llm"]["lm_head"]["w"] is None

    tx = optim.make_trainable_optimizer(tcfg)
    opt_state = tx.init(trainable)
    step = jax.jit(ts_lib.make_partitioned_train_step(
        cfg, tx, lora_cfg=C.LoraConfig(rank=2), remat=False))
    batch = make_batch(cfg, num_images=1, rows_per_image=1, text_len=32)
    before = np.asarray(trainable["select/text_fc1/w"])
    trainable2, opt_state, metrics = step(trainable, skeleton_q, opt_state,
                                          batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.abs(np.asarray(trainable2["select/text_fc1/w"]) - before).max() > 0


@pytest.mark.slow
def test_trainer_epoch_tiny(tmp_path):
    from llmseg_tpu.train.trainer import Trainer

    cfg = C.ExperimentConfig(
        model=C.llmseg_tiny(),
        train=C.TrainConfig(grad_accum_steps=2, epochs=1, steps_per_epoch=2,
                            warmup_steps=0, lr=1e-3,
                            log_dir=str(tmp_path),
                            mesh=C.MeshConfig(data=1),
                            lora=C.LoraConfig(rank=2)))
    trainer = Trainer(cfg)
    batch = make_batch(cfg.model, num_images=1, rows_per_image=1, text_len=32)
    metrics = trainer.train_epoch([batch] * 4, epoch=0)
    assert np.isfinite(metrics["loss"])
    assert trainer.global_step == 2
