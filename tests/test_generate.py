import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmseg_tpu import config as C
from llmseg_tpu.models import generate as G
from llmseg_tpu.models import llama


def test_greedy_generate_matches_full_forward():
    """KV-cache greedy decode must agree with re-running the full forward."""
    cfg = C.llama_tiny()
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 4, 200)
    embeds = params["embed_tokens"][ids]

    tokens, hiddens = G.greedy_generate(params, cfg, embeds, max_new_tokens=4,
                                        eos_token_id=2)
    assert tokens.shape == (2, 4)
    assert hiddens.shape == (2, 4, cfg.hidden_size)

    # reference: grow the sequence token by token with the plain forward
    cur = ids
    for step in range(4):
        h = llama.apply(params, cfg, input_ids=cur)
        nxt = jnp.argmax(llama.logits(params, cfg, h[:, -1:])[:, 0], axis=-1)
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(tokens[:, step]))
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)


def test_generate_eos_latching():
    cfg = C.llama_tiny()
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 4), 4, 200)
    embeds = params["embed_tokens"][ids]
    first = int(tokens_first(params, cfg, embeds))
    # declare the first emitted token to be "eos": the loop must latch
    tokens, _ = G.greedy_generate(params, cfg, embeds, max_new_tokens=6,
                                  eos_token_id=first)
    t = np.asarray(tokens)
    assert t[0, 0] == first
    assert (t[0, 1:] == first).all()


def tokens_first(params, cfg, embeds):
    h = llama.apply(params, cfg, inputs_embeds=embeds)
    return jnp.argmax(llama.logits(params, cfg, h[:, -1:])[:, 0], axis=-1)[0]


@pytest.mark.slow
def test_pixel_decoder_path():
    from llmseg_tpu.models import llmseg, pixel_decoder
    from llmseg_tpu.models.sam import sam as sam_lib

    cfg = C.llmseg_tiny()
    sam_cfg = C.sam_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    sam_params = sam_lib.init(jax.random.PRNGKey(1), sam_cfg)

    B = 1
    lv = cfg.llava
    images_clip = jnp.zeros((B, lv.vision.img_size, lv.vision.img_size, 3))
    images_sam = jnp.zeros((B, sam_cfg.encoder.img_size,
                            sam_cfg.encoder.img_size, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, 12), 4, 200)
    tokens, masks = pixel_decoder.evaluate(
        params, cfg, sam_params, sam_cfg, images_clip=images_clip,
        images_sam=images_sam, input_ids=ids,
        image_pos=jnp.ones((B,), jnp.int32), input_hw=(48, 64),
        original_hw=(96, 128), max_new_tokens=4)
    assert tokens.shape == (B, 4)
    assert masks.shape == (B, 96, 128)
    assert np.isfinite(np.asarray(tokens)).all()


def test_stop_token_ids_latch():
    """stop_token_ids acts like KeywordsStoppingCriteria with a single-token
    keyword (reference mm_utils.py:56-88 used with ['</s>'])."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llmseg_tpu import config as C
    from llmseg_tpu.models import generate as gen_lib, llama

    cfg = C.llama_tiny(vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.hidden_size))
    toks_plain, _ = gen_lib.greedy_generate(params, cfg, x, 8,
                                            eos_token_id=63)
    first = int(np.asarray(toks_plain)[0, 0])
    # stopping on the very first generated token freezes the rest at EOS
    toks_stop, _ = gen_lib.greedy_generate(params, cfg, x, 8,
                                           eos_token_id=63,
                                           stop_token_ids=(first,))
    out = np.asarray(toks_stop)[0]
    assert out[0] == first
    assert (out[1:] == 63).all()
