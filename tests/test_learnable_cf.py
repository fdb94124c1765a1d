"""learnable_cf: the empty-text embedding must be trained (via empty_mask
rows, reference dt.py:541-543) and consumed as the CF branch at sampling
(dt.py:155 + 240-249) — i.e. not a dead parameter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models.discrete_diffusion import (
    D3PM)

K, L, B, T = 16, 8, 4, 4


def _model(**kw):
    args = dict(num_embed=K, content_seq_len=L, spatial_size=(4, 2),
                diffusion_step=T, n_layer=1, n_embd=16, n_head=4,
                condition_seq_len=4, condition_dim=16, learnable_cf=True)
    args.update(kw)
    return D3PM(**args)


def _init(model):
    tokens = jnp.zeros((B, L), jnp.int32)
    cond = jnp.zeros((B, 1, 16), jnp.float32)
    return model.init({"params": jax.random.key(0),
                       "diffusion": jax.random.key(1)},
                      tokens, cond, train=True)


@pytest.mark.slow  # two grad compiles ~40s on 1 core
def test_empty_text_embed_gets_gradient_via_empty_mask():
    model = _model()
    variables = _init(model)
    assert "empty_text_embed" in variables["params"]
    tokens = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L) % K
    cond = jax.random.normal(jax.random.key(2), (B, 1, 16))
    mask = jnp.array([True, False, True, False])

    def loss_fn(params, empty_mask):
        out, _ = model.apply(
            {"params": params, "diffusion": variables["diffusion"]},
            tokens, cond, train=True, empty_mask=empty_mask,
            rngs={"diffusion": jax.random.key(3)}, mutable=["diffusion"])
        return out["loss"]

    g_masked = jax.grad(loss_fn)(variables["params"], mask)["empty_text_embed"]
    g_none = jax.grad(loss_fn)(variables["params"], None)["empty_text_embed"]
    assert float(jnp.abs(g_masked).max()) > 0.0, \
        "empty rows must route gradient into empty_text_embed"
    assert float(jnp.abs(g_none).max()) == 0.0


def test_sampling_reads_empty_text_embed_as_cf_branch():
    model = _model(guidance_scale=3.0)
    variables = _init(model)
    cond = jax.random.normal(jax.random.key(4), (B, 1, 16))
    cf = jnp.zeros_like(cond)

    def draw(params):
        return model.apply(
            {"params": params, "diffusion": variables["diffusion"]},
            cond, cf, B, method=D3PM.sample, mode="fused",
            rngs={"diffusion": jax.random.key(5)})

    base = np.asarray(draw(variables["params"]))
    perturbed = dict(variables["params"])
    perturbed["empty_text_embed"] = (
        variables["params"]["empty_text_embed"] + 100.0)
    got = np.asarray(draw(perturbed))
    assert (base != got).any(), \
        "sampling must consume the learnable CF embedding"


def test_learnable_cf_off_has_no_param():
    model = _model(learnable_cf=False)
    variables = _init(model)
    assert "empty_text_embed" not in variables["params"]


def test_prepare_batch_derives_empty_text_mask(tmp_path):
    """Rows with empty captions must train empty_text_embed: the trainer
    derives empty_text_mask from the raw text (the reference builds
    is_empty_text from the condition token mask, dt.py:541-543)."""
    import numpy as np
    from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
        Stage2Trainer)
    from tests.test_stage2_train import _cfg, _dm

    cond = {"mode": "text", "dim": 32, "width": 16, "heads": 2, "layers": 1,
            "allow_hash_tokenizer": True}
    cfg = _cfg(conditioner=cond)
    cfg["model"]["generator"]["diffusion_model"]["learnable_cf"] = True
    t = Stage2Trainer(cfg, _dm(), tmp_path / "run")
    b = t._prepare_batch({"text": ["a dog", "", "   ", "cat"],
                          "video": np.zeros((4, 2, 16, 16, 3), np.uint8)})
    assert b["empty_text_mask"].tolist() == [False, True, True, False]
    # without learnable_cf the key must not appear (no dead batch fields)
    t2 = Stage2Trainer(_cfg(conditioner=cond), _dm(), tmp_path / "run2")
    b2 = t2._prepare_batch({"text": ["x", ""],
                            "video": np.zeros((2, 2, 16, 16, 3), np.uint8)})
    assert "empty_text_mask" not in b2
