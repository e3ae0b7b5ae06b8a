"""Weight-import parity tests against torch/HF reference implementations
(instantiated from configs — no downloads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from llmseg_tpu import config as C
from llmseg_tpu.import_weights import torch_import as TI
from llmseg_tpu.models import layers as L
from llmseg_tpu.models import llama as llama_lib
from llmseg_tpu.models import vit as vit_lib


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_linear_conv_parity():
    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(2, 6)
    p = TI.linear({"fc.weight": lin.weight.detach().numpy(),
                   "fc.bias": lin.bias.detach().numpy()}, "fc")
    ours = L.dense(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), lin(x).detach().numpy(),
                               atol=1e-5)

    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    xi = torch.randn(1, 3, 8, 8)
    ref = conv(xi).detach().numpy().transpose(0, 2, 3, 1)
    pc = {"w": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
          "b": conv.bias.detach().numpy()}
    got = L.conv2d(pc, jnp.asarray(xi.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_conv_transpose_parity():
    from llmseg_tpu.models.sam.mask_decoder import _convt

    torch.manual_seed(1)
    ct = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    xi = torch.randn(1, 6, 5, 5)
    ref = ct(xi).detach().numpy().transpose(0, 2, 3, 1)
    sd = {"up.weight": ct.weight.detach().numpy(),
          "up.bias": ct.bias.detach().numpy()}
    p = TI.conv_transpose2d(sd, "up")
    got = _convt(p, jnp.asarray(xi.numpy().transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_llama_parity_vs_hf():
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM

    hf_cfg = HFCfg(vocab_size=64, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=4, max_position_embeddings=64,
                   rms_norm_eps=1e-6, attn_implementation="eager")
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    sd = _sd(hf)

    cfg = C.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                        max_seq_len=64)
    params = TI.import_llama(sd, cfg, prefix="model.")

    ids = torch.randint(0, 64, (2, 16))
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    hidden = llama_lib.apply(params, cfg, input_ids=jnp.asarray(ids.numpy()))
    got = np.asarray(llama_lib.logits(params, cfg, hidden))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_clip_parity_vs_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=28, patch_size=14,
                              attn_implementation="eager")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = _sd(hf)

    cfg = C.ViTConfig(img_size=28, patch_size=14, hidden_size=32, depth=3,
                      num_heads=4, mlp_ratio=2.0)
    params = TI.import_clip_vision(sd, cfg, prefix="vision_model.")

    x = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = hf(x, output_hidden_states=True).hidden_states[-2].numpy()
    got = vit_lib.clip_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), cfg, select_layer=-2)
    np.testing.assert_allclose(np.asarray(got), ref[:, 1:], atol=2e-4,
                               rtol=2e-3)


def test_dinov2_parity_vs_hf():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          image_size=28, patch_size=14,
                          layerscale_value=1.0,
                          attn_implementation="eager")
    torch.manual_seed(0)
    hf = Dinov2Model(hf_cfg).eval()
    hf_sd = _sd(hf)
    # rename HF Dinov2 keys to torch.hub dinov2 names (what our importer eats)
    sd = {}
    sd["cls_token"] = hf_sd["embeddings.cls_token"]
    sd["pos_embed"] = hf_sd["embeddings.position_embeddings"]
    sd["patch_embed.proj.weight"] = hf_sd[
        "embeddings.patch_embeddings.projection.weight"]
    sd["patch_embed.proj.bias"] = hf_sd[
        "embeddings.patch_embeddings.projection.bias"]
    for i in range(2):
        b = f"encoder.layer.{i}"
        o = f"blocks.{i}"
        qw = hf_sd[f"{b}.attention.attention.query.weight"]
        kw = hf_sd[f"{b}.attention.attention.key.weight"]
        vw = hf_sd[f"{b}.attention.attention.value.weight"]
        sd[f"{o}.attn.qkv.weight"] = np.concatenate([qw, kw, vw], axis=0)
        sd[f"{o}.attn.qkv.bias"] = np.concatenate(
            [hf_sd[f"{b}.attention.attention.query.bias"],
             hf_sd[f"{b}.attention.attention.key.bias"],
             hf_sd[f"{b}.attention.attention.value.bias"]])
        sd[f"{o}.attn.proj.weight"] = hf_sd[f"{b}.attention.output.dense.weight"]
        sd[f"{o}.attn.proj.bias"] = hf_sd[f"{b}.attention.output.dense.bias"]
        sd[f"{o}.norm1.weight"] = hf_sd[f"{b}.norm1.weight"]
        sd[f"{o}.norm1.bias"] = hf_sd[f"{b}.norm1.bias"]
        sd[f"{o}.norm2.weight"] = hf_sd[f"{b}.norm2.weight"]
        sd[f"{o}.norm2.bias"] = hf_sd[f"{b}.norm2.bias"]
        sd[f"{o}.ls1.gamma"] = hf_sd[f"{b}.layer_scale1.lambda1"]
        sd[f"{o}.ls2.gamma"] = hf_sd[f"{b}.layer_scale2.lambda1"]
        sd[f"{o}.mlp.fc1.weight"] = hf_sd[f"{b}.mlp.fc1.weight"]
        sd[f"{o}.mlp.fc1.bias"] = hf_sd[f"{b}.mlp.fc1.bias"]
        sd[f"{o}.mlp.fc2.weight"] = hf_sd[f"{b}.mlp.fc2.weight"]
        sd[f"{o}.mlp.fc2.bias"] = hf_sd[f"{b}.mlp.fc2.bias"]
    sd["norm.weight"] = hf_sd["layernorm.weight"]
    sd["norm.bias"] = hf_sd["layernorm.bias"]

    cfg = C.ViTConfig(img_size=28, patch_size=14, hidden_size=32, depth=2,
                      num_heads=4, mlp_ratio=2.0, layernorm_pre=False,
                      layerscale=True, use_quick_gelu=False, ln_eps=1e-6)
    params = TI.import_dinov2(sd, cfg)
    x = torch.randn(1, 3, 28, 28)
    with torch.no_grad():
        ref = hf(x).last_hidden_state.numpy()[:, 1:]
    got = vit_lib.dino_patch_features(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-3)


def test_pad_vocab():
    w = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = TI._pad_vocab(w, 6)
    assert out.shape == (6, 3)
    np.testing.assert_allclose(out[4], w.mean(axis=0))


def test_sam_import_structural():
    """Build a state dict with the original SAM key naming for sam_tiny and
    check the import consumes it and the model runs."""
    from llmseg_tpu.models.sam import sam as sam_lib

    cfg = C.sam_tiny()
    rng = np.random.RandomState(0)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    enc = cfg.encoder
    d = enc.embed_dim
    sd = {
        "image_encoder.patch_embed.proj.weight": t(d, 3, enc.patch_size, enc.patch_size),
        "image_encoder.patch_embed.proj.bias": t(d),
        "image_encoder.pos_embed": t(1, enc.grid, enc.grid, d),
        "image_encoder.neck.0.weight": t(cfg.encoder.out_chans, d, 1, 1),
        "image_encoder.neck.1.weight": np.ones(enc.out_chans, np.float32),
        "image_encoder.neck.1.bias": t(enc.out_chans),
        "image_encoder.neck.2.weight": t(enc.out_chans, enc.out_chans, 3, 3),
        "image_encoder.neck.3.weight": np.ones(enc.out_chans, np.float32),
        "image_encoder.neck.3.bias": t(enc.out_chans),
    }
    head_dim = d // enc.num_heads
    for i in range(enc.depth):
        b = f"image_encoder.blocks.{i}"
        win = i not in enc.global_attn_indexes
        size = enc.window_size if win else enc.grid
        sd.update({
            f"{b}.norm1.weight": np.ones(d, np.float32), f"{b}.norm1.bias": t(d),
            f"{b}.attn.qkv.weight": t(3 * d, d), f"{b}.attn.qkv.bias": t(3 * d),
            f"{b}.attn.proj.weight": t(d, d), f"{b}.attn.proj.bias": t(d),
            f"{b}.attn.rel_pos_h": t(2 * size - 1, head_dim),
            f"{b}.attn.rel_pos_w": t(2 * size - 1, head_dim),
            f"{b}.norm2.weight": np.ones(d, np.float32), f"{b}.norm2.bias": t(d),
            f"{b}.mlp.lin1.weight": t(4 * d, d), f"{b}.mlp.lin1.bias": t(4 * d),
            f"{b}.mlp.lin2.weight": t(d, 4 * d), f"{b}.mlp.lin2.bias": t(d),
        })
    pd = cfg.prompt.embed_dim
    sd.update({
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": t(2, pd // 2),
        "prompt_encoder.not_a_point_embed.weight": t(1, pd),
        "prompt_encoder.no_mask_embed.weight": t(1, pd),
    })
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = t(1, pd)
    mc = cfg.prompt.mask_in_chans
    sd.update({
        "prompt_encoder.mask_downscaling.0.weight": t(mc // 4, 1, 2, 2),
        "prompt_encoder.mask_downscaling.0.bias": t(mc // 4),
        "prompt_encoder.mask_downscaling.1.weight": np.ones(mc // 4, np.float32),
        "prompt_encoder.mask_downscaling.1.bias": t(mc // 4),
        "prompt_encoder.mask_downscaling.3.weight": t(mc, mc // 4, 2, 2),
        "prompt_encoder.mask_downscaling.3.bias": t(mc),
        "prompt_encoder.mask_downscaling.4.weight": np.ones(mc, np.float32),
        "prompt_encoder.mask_downscaling.4.bias": t(mc),
        "prompt_encoder.mask_downscaling.6.weight": t(pd, mc, 1, 1),
        "prompt_encoder.mask_downscaling.6.bias": t(pd),
    })
    dd = cfg.decoder.transformer_dim
    nt = cfg.decoder.num_multimask_outputs + 1
    inner = dd // 2
    sd.update({
        "mask_decoder.iou_token.weight": t(1, dd),
        "mask_decoder.mask_tokens.weight": t(nt, dd),
        "mask_decoder.output_upscaling.0.weight": t(dd, dd // 4, 2, 2),
        "mask_decoder.output_upscaling.0.bias": t(dd // 4),
        "mask_decoder.output_upscaling.1.weight": np.ones(dd // 4, np.float32),
        "mask_decoder.output_upscaling.1.bias": t(dd // 4),
        "mask_decoder.output_upscaling.3.weight": t(dd // 4, dd // 8, 2, 2),
        "mask_decoder.output_upscaling.3.bias": t(dd // 8),
    })
    for i in range(nt):
        m = f"mask_decoder.output_hypernetworks_mlps.{i}"
        sd.update({f"{m}.layers.0.weight": t(dd, dd), f"{m}.layers.0.bias": t(dd),
                   f"{m}.layers.1.weight": t(dd, dd), f"{m}.layers.1.bias": t(dd),
                   f"{m}.layers.2.weight": t(dd // 8, dd), f"{m}.layers.2.bias": t(dd // 8)})
    ih = cfg.decoder.iou_head_hidden_dim
    sd.update({
        "mask_decoder.iou_prediction_head.layers.0.weight": t(ih, dd),
        "mask_decoder.iou_prediction_head.layers.0.bias": t(ih),
        "mask_decoder.iou_prediction_head.layers.1.weight": t(ih, ih),
        "mask_decoder.iou_prediction_head.layers.1.bias": t(ih),
        "mask_decoder.iou_prediction_head.layers.2.weight": t(nt, ih),
        "mask_decoder.iou_prediction_head.layers.2.bias": t(nt),
    })
    t_pref = "mask_decoder.transformer"
    for i in range(cfg.decoder.transformer_depth):
        b = f"{t_pref}.layers.{i}"
        for attn, idim in (("self_attn", dd), ("cross_attn_token_to_image", inner),
                           ("cross_attn_image_to_token", inner)):
            sd.update({f"{b}.{attn}.q_proj.weight": t(idim, dd), f"{b}.{attn}.q_proj.bias": t(idim),
                       f"{b}.{attn}.k_proj.weight": t(idim, dd), f"{b}.{attn}.k_proj.bias": t(idim),
                       f"{b}.{attn}.v_proj.weight": t(idim, dd), f"{b}.{attn}.v_proj.bias": t(idim),
                       f"{b}.{attn}.out_proj.weight": t(dd, idim), f"{b}.{attn}.out_proj.bias": t(dd)})
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[f"{b}.{n}.weight"] = np.ones(dd, np.float32)
            sd[f"{b}.{n}.bias"] = t(dd)
        sd.update({f"{b}.mlp.lin1.weight": t(cfg.decoder.transformer_mlp_dim, dd),
                   f"{b}.mlp.lin1.bias": t(cfg.decoder.transformer_mlp_dim),
                   f"{b}.mlp.lin2.weight": t(dd, cfg.decoder.transformer_mlp_dim),
                   f"{b}.mlp.lin2.bias": t(dd)})
    fa = f"{t_pref}.final_attn_token_to_image"
    sd.update({f"{fa}.q_proj.weight": t(inner, dd), f"{fa}.q_proj.bias": t(inner),
               f"{fa}.k_proj.weight": t(inner, dd), f"{fa}.k_proj.bias": t(inner),
               f"{fa}.v_proj.weight": t(inner, dd), f"{fa}.v_proj.bias": t(inner),
               f"{fa}.out_proj.weight": t(dd, inner), f"{fa}.out_proj.bias": t(dd),
               f"{t_pref}.norm_final_attn.weight": np.ones(dd, np.float32),
               f"{t_pref}.norm_final_attn.bias": t(dd)})

    params = TI.import_sam(sd, cfg)
    img = jnp.zeros((1, 48, 64, 3))
    points = jnp.array([[[10.0, 20.0]]])
    labels = jnp.ones((1, 1), jnp.int32)
    from llmseg_tpu.models.sam import sam as S

    masks, iou = S.forward(params, cfg, img, points=points, labels=labels)
    assert masks.shape[0] == 1 and np.isfinite(np.asarray(masks)).all()


def test_apply_delta_matches_reference_semantics():
    """Our numpy apply_delta vs the reference's merge loop
    (model/llava/model/apply_delta.py:27-56) run on the same tensors."""
    rng = np.random.RandomState(0)
    D, V_base, V_delta = 8, 16, 20
    base = {
        "model.embed_tokens.weight": rng.randn(V_base, D).astype(np.float32),
        "lm_head.weight": rng.randn(V_base, D).astype(np.float32),
        "model.layers.0.self_attn.q_proj.weight":
            rng.randn(D, D).astype(np.float32),
    }
    delta = {
        "model.embed_tokens.weight": rng.randn(V_delta, D).astype(np.float32),
        "lm_head.weight": rng.randn(V_delta, D).astype(np.float32),
        "model.layers.0.self_attn.q_proj.weight":
            rng.randn(D, D).astype(np.float32),
        "model.mm_projector.weight": rng.randn(D, 4).astype(np.float32),
        "model.mm_projector.bias": rng.randn(D).astype(np.float32),
    }
    got = TI.apply_delta(base, delta)

    # reference loop, verbatim semantics in torch
    tbase = {k: torch.from_numpy(v) for k, v in base.items()}
    ref = {}
    for name, param in {k: torch.from_numpy(v.copy())
                        for k, v in delta.items()}.items():
        if name not in tbase:
            assert name in ["model.mm_projector.weight",
                            "model.mm_projector.bias"]
            ref[name] = param
            continue
        if param.shape == tbase[name].shape:
            param += tbase[name]
        else:
            bparam = tbase[name]
            param[: bparam.shape[0], : bparam.shape[1]] += bparam
        ref[name] = param
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k].numpy(), atol=0,
                                   err_msg=k)
    assert set(got) == set(ref)

    # unexpected extra keys / shape mismatches must raise, as the reference
    # asserts
    with pytest.raises(KeyError):
        TI.apply_delta(base, {"model.unknown.weight": delta["lm_head.weight"]})
    with pytest.raises(ValueError):
        TI.apply_delta(base, {"model.layers.0.self_attn.q_proj.weight":
                              rng.randn(D, D + 1).astype(np.float32)})


@pytest.mark.slow
def test_import_llava_delta_dirs(tmp_path):
    """base LLaMA dir + LLaVA delta dir -> merged params equal importing a
    pre-merged dir."""
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM

    hf_cfg = HFCfg(vocab_size=32, hidden_size=16, intermediate_size=32,
                   num_hidden_layers=1, num_attention_heads=2,
                   num_key_value_heads=2, max_position_embeddings=32)
    torch.manual_seed(0)
    base = LlamaForCausalLM(hf_cfg).eval()
    base_dir = tmp_path / "base"
    base.save_pretrained(base_dir)

    # delta: same arch, larger vocab, plus a projector
    hf_cfg2 = HFCfg(vocab_size=36, hidden_size=16, intermediate_size=32,
                    num_hidden_layers=1, num_attention_heads=2,
                    num_key_value_heads=2, max_position_embeddings=32)
    torch.manual_seed(1)
    delta = LlamaForCausalLM(hf_cfg2).eval()
    delta_dir = tmp_path / "delta"
    delta.save_pretrained(delta_dir)
    import safetensors.numpy as st

    extra = {"model.mm_projector.weight": np.ones((16, 8), np.float32),
             "model.mm_projector.bias": np.zeros(16, np.float32)}
    dsd = TI.load_hf_dir(str(delta_dir))
    st.save_file({**dsd, **extra}, str(delta_dir / "model.safetensors"))

    cfg = C.LlavaConfig(
        llm=C.LlamaConfig(vocab_size=36, hidden_size=16,
                          intermediate_size=32, num_layers=1, num_heads=2,
                          num_kv_heads=2, head_dim=8, max_seq_len=32),
        mm_hidden_size=8)
    params = TI.import_llava_delta_dirs(str(base_dir), str(delta_dir), cfg)
    merged = TI.apply_delta(TI.load_hf_dir(str(base_dir)),
                            TI.load_hf_dir(str(delta_dir)))
    expect = merged["model.embed_tokens.weight"]
    np.testing.assert_allclose(params["llm"]["embed_tokens"], expect)
    np.testing.assert_allclose(np.asarray(params["mm_projector"]["w"]),
                               extra["model.mm_projector.weight"].T)
