"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Covers SURVEY.md T7/T8 (the reference's DeepSpeed ZeRO-2 data parallelism,
training.py:292-332,369-381, replaced here with GSPMD over a dp/fsdp/tp
mesh): the partitioned train step compiles and runs under real shardings,
the optimizer state is sharded, and GSPMD gives the same loss as a
single-device run of the same batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llmseg_tpu import config as C
from llmseg_tpu.data.synthetic import make_batch
from llmseg_tpu.models import llmseg
from llmseg_tpu.parallel import mesh as M
from llmseg_tpu.train import optim, train_step as ts_lib


def _run_step(dp, fsdp, tp, *, one_hot_embed=True):
    n = dp * fsdp * tp
    assert len(jax.devices()) >= n
    mesh = M.make_mesh(C.MeshConfig(data=dp, fsdp=fsdp, tensor=tp),
                       devices=jax.devices()[:n])
    cfg = C.llmseg_tiny()
    tcfg = C.TrainConfig(grad_accum_steps=1, epochs=1, steps_per_epoch=2,
                         warmup_steps=0, lr=1e-3)
    lora_cfg = C.LoraConfig(rank=4)
    with mesh:
        params = llmseg.init(jax.random.PRNGKey(0), cfg, lora_cfg=lora_cfg)
        params = M.shard_params(params, mesh)
        trainable, skeleton = optim.partition(params)
        tx = optim.make_trainable_optimizer(tcfg)
        opt_state = tx.init(trainable)
        step = ts_lib.make_partitioned_train_step(
            cfg, tx, lora_cfg=lora_cfg, remat=True,
            one_hot_embed=one_hot_embed)
        batch = make_batch(cfg, num_images=max(dp * fsdp, 1),
                           rows_per_image=1, text_len=32)
        batch = M.shard_batch(batch, mesh)
        trainable, opt_state, metrics = jax.jit(step)(
            trainable, skeleton, opt_state, batch)
    return trainable, opt_state, metrics, mesh


def test_partitioned_step_dp2_fsdp2_tp2():
    trainable, opt_state, metrics, mesh = _run_step(2, 2, 2)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # LLaMA embed_tokens (V, D) must come out sharded per _llm_spec (tp, fsdp)
    emb = trainable["llava/llm/embed_tokens"]
    spec = emb.sharding.spec
    assert spec == P("tp", "fsdp"), spec
    # ...and so must its Adam moments (optimizer state shards like params)
    mu = jax.tree.leaves(
        {k: v for k, v in _flatten_opt(opt_state).items()
         if "embed_tokens" in k})
    assert mu, "no embed_tokens leaves in opt state"
    for leaf in mu:
        if hasattr(leaf, "sharding") and leaf.ndim == 2:
            assert leaf.sharding.spec == P("tp", "fsdp"), leaf.sharding.spec


def _flatten_opt(opt_state):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
        flat[jax.tree_util.keystr(path)] = leaf
    return flat


@pytest.mark.slow
def test_partitioned_step_dp8():
    _, _, metrics, _ = _run_step(8, 1, 1, one_hot_embed=False)
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_loss_matches_single_device():
    """GSPMD determinism: the sharded step computes the same loss as one
    device on the same batch (CPU, matmul precision=highest per conftest)."""
    cfg = C.llmseg_tiny()
    tcfg = C.TrainConfig(grad_accum_steps=1, epochs=1, steps_per_epoch=2,
                         warmup_steps=0, lr=1e-3)
    lora_cfg = C.LoraConfig(rank=4)
    params = llmseg.init(jax.random.PRNGKey(0), cfg, lora_cfg=lora_cfg)
    batch = make_batch(cfg, num_images=4, rows_per_image=1, text_len=32)
    loss_1dev = float(llmseg.loss_fn(params, cfg, batch,
                                     lora_cfg=lora_cfg)[0])

    mesh = M.make_mesh(C.MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=jax.devices()[:8])
    with mesh:
        sp = M.shard_params(params, mesh)
        sb = M.shard_batch(batch, mesh)
        loss_mesh = float(jax.jit(
            lambda p, b: llmseg.loss_fn(p, cfg, b, lora_cfg=lora_cfg,
                                        one_hot_embed=True)[0])(sp, sb))
    np.testing.assert_allclose(loss_mesh, loss_1dev, rtol=2e-4)


def test_sharded_predict_matches_single_device():
    """Inference (predict) under a dp=2 x tp=2 mesh returns the same
    similarity/IoU scores as one device — the multi-chip serving path
    (tensor-parallel LLaMA + replicated heads) is exercised end to end."""
    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, num_images=2, rows_per_image=1, text_len=32)
    ref = llmseg.predict(params, cfg, batch)

    mesh = M.make_mesh(C.MeshConfig(data=2, fsdp=1, tensor=2),
                       devices=jax.devices()[:4])
    with mesh:
        sp = M.shard_params(params, mesh)
        sb = M.shard_batch(batch, mesh)
        out = jax.jit(lambda p, b: llmseg.predict(p, cfg, b))(sp, sb)
    for k in ("pred_similarity", "pred_iou"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4)


def test_7b_layout_divides_production_mesh():
    """VERDICT r3 #6: the tiny dryrun proves sharding *correctness*, but
    only the 7B dims prove the production layout divides the mesh — vocab
    32004, 32 heads/kv-heads, MLP 11008, hidden 4096 under (dp=2, fsdp=2,
    tp=2).  jax.eval_shape instantiates the abstract 7B tree without 7B
    memory; every sharded dim must divide its mesh axes exactly (GSPMD
    would silently pad uneven shards — wasted ICI bandwidth at best,
    surprise OOM on real multi-chip at worst)."""
    cfg = C.llmseg_7b()
    lora_cfg = C.LoraConfig(rank=8)
    abstract = jax.eval_shape(
        lambda k: llmseg.init(k, cfg, lora_cfg=lora_cfg),
        jax.random.PRNGKey(0))
    spec = M.param_spec(abstract)
    axis_size = {"dp": 2, "fsdp": 2, "tp": 2}

    flat_p = jax.tree_util.tree_flatten_with_path(
        abstract, is_leaf=lambda x: hasattr(x, "shape"))[0]
    flat_s = jax.tree_util.tree_flatten_with_path(
        spec, is_leaf=lambda x: isinstance(x, P))[0]
    assert len(flat_p) == len(flat_s)
    checked = 0
    for (path, leaf), (_, s) in zip(flat_p, flat_s):
        if not isinstance(s, P):
            continue
        for dim, names in zip(leaf.shape, tuple(s)):
            if names is None:
                continue
            names = names if isinstance(names, tuple) else (names,)
            total = int(np.prod([axis_size[n] for n in names]))
            assert dim % total == 0, (
                f"{jax.tree_util.keystr(path)}: dim {dim} not divisible "
                f"by {names} (x{total})")
            checked += 1
    # the LLaMA subtree must actually have been exercised
    assert checked > 100, checked


def test_7b_step_traces_on_production_mesh():
    """Trace (eval_shape) the full 7B partitioned train step AND predict
    under the dp=2 x fsdp=2 x tp=2 mesh: catches head-split/shape
    arithmetic that only exists at 7B dims, with zero 7B memory."""
    cfg = C.llmseg_7b()
    tcfg = C.TrainConfig(grad_accum_steps=1, epochs=1, steps_per_epoch=2,
                         warmup_steps=0, lr=1e-3)
    lora_cfg = C.LoraConfig(rank=8)
    mesh = M.make_mesh(C.MeshConfig(data=2, fsdp=2, tensor=2),
                       devices=jax.devices()[:8])
    abstract = jax.eval_shape(
        lambda k: llmseg.init(k, cfg, lora_cfg=lora_cfg),
        jax.random.PRNGKey(0))
    with mesh:
        trainable, skeleton = optim.partition(abstract)
        tx = optim.make_trainable_optimizer(tcfg)
        opt_state = jax.eval_shape(tx.init, trainable)
        step = ts_lib.make_partitioned_train_step(
            cfg, tx, lora_cfg=lora_cfg, remat=True, one_hot_embed=True)
        batch = jax.eval_shape(
            lambda: make_batch(cfg, num_images=4, rows_per_image=1,
                               text_len=512))
        out = jax.eval_shape(step, trainable, skeleton, opt_state, batch)
        assert out[2]["loss"].shape == ()

        pred = jax.eval_shape(
            lambda p, b: llmseg.predict(p, cfg, b), abstract, batch)
        assert pred["pred_similarity"].shape == (4, cfg.max_proposals)


def test_one_hot_embed_matches_gather():
    """llama.embed one-hot formulation is numerically identical to the
    gather (same table, same ids)."""
    from llmseg_tpu.models import llama

    cfg = C.llmseg_tiny().llava.llm
    params = llama.init(jax.random.PRNGKey(1), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0,
                             cfg.vocab_size)
    g = llama.embed(params, ids, one_hot=False)
    o = llama.embed(params, ids, one_hot=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(o), atol=1e-6)


@pytest.mark.slow
def test_trainer_on_mesh():
    """The full Trainer (not just the step) on a dp=2 x tp=2 mesh: epoch of
    steps with grad accumulation, metrics finite, params stay sharded."""
    import tempfile

    cfg = C.ExperimentConfig(
        model=C.llmseg_tiny(),
        train=C.TrainConfig(grad_accum_steps=1, epochs=1, steps_per_epoch=2,
                            warmup_steps=1, log_dir=tempfile.mkdtemp(),
                            mesh=C.MeshConfig(data=2, fsdp=1, tensor=2),
                            precision="fp32",
                            lora=C.LoraConfig(rank=4)))
    from llmseg_tpu.train.trainer import Trainer

    tr = Trainer(cfg)

    def batches():
        for i in range(2):
            yield make_batch(cfg.model, num_images=2, rows_per_image=1,
                             text_len=32, seed=i), None

    with tr.mesh:
        metrics = tr.train_epoch(batches(), epoch=0)
    assert np.isfinite(metrics["loss"])
    emb = tr.trainable["llava/llm/embed_tokens"]
    assert emb.sharding.spec == P("tp", "fsdp"), emb.sharding.spec


@pytest.mark.slow
def test_multihost_two_process_cpu():
    """VERDICT r4 #4: exercise the REAL multi-process branches — metric
    all_reduce over jax.distributed (reference dist.all_reduce,
    utils/utils.py:76-97), BatchLoader per-host sharding (reference
    DistributedSampler), and one partitioned train step over a mesh
    spanning two OS processes (2 procs x 2 virtual CPU devices).  A
    single-process 8-device mesh exercises GSPMD but leaves every
    `process_count() > 1` branch dead; this does not."""
    import os
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker rc={rc}\nstdout:{out}\nstderr:{err[-3000:]}"
        assert "MULTIHOST_OK" in out, out
    # both workers reduced to the identical loss
    import json as _json
    losses = {round(_json.loads(out.split("MULTIHOST_OK ")[1])["loss"], 10)
              for _, out, _ in outs}
    assert len(losses) == 1, losses
