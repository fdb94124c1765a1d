"""Process-wide shared-jit cache: equal-config trainers must reuse one
compiled init/apply (the dominant warm-build cost on a 1-core host)."""
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE
from gif_synthesis_with_discrete_diffusion_tpu.train.loop import (
    _SHARED_JIT, _module_key, shared_module_init)


def _vqvae(**kw):
    args = dict(embedding_dim=8, n_codes=16, n_hiddens=16, n_res_layers=1,
                downsample=(1, 4, 4), sequence_length=2, resolution=16,
                kernel_mode="xla")
    args.update(kw)
    return VQVAE(**args)


def test_equal_modules_share_one_init_entry():
    import jax
    before = dict(_SHARED_JIT)
    video = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    rngs = {"params": jax.random.key(0), "codebook": jax.random.key(1)}
    v1 = shared_module_init(_vqvae(), rngs, {"video": video}, train=True)
    added = [k for k in _SHARED_JIT if k not in before]
    # a second, distinct-but-equal module instance adds NO new entry
    v2 = shared_module_init(_vqvae(), rngs, {"video": video}, train=True)
    assert [k for k in _SHARED_JIT if k not in before] == added
    assert len(added) == 1
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        assert (a == b).all()
    # a different shape or different module DOES add a new entry
    shared_module_init(_vqvae(), rngs,
                       {"video": jnp.zeros((2, 2, 16, 16, 3))}, train=True)
    shared_module_init(_vqvae(n_hiddens=32), rngs, {"video": video},
                       train=True)
    assert len([k for k in _SHARED_JIT if k not in before]) == 3


def test_module_key_handles_unhashable_fields():
    from gif_synthesis_with_discrete_diffusion_tpu.models.discrete_diffusion \
        import DiscreteDiffusionModel
    cfg = dict(num_embed=16, content_seq_len=32, spatial_size=(8, 4),
               diffusion_step=4, n_layer=2, n_embd=16, n_head=4,
               condition_dim=32)
    m1 = DiscreteDiffusionModel(d3pm_cfg=dict(cfg), conditioner_cfg=None)
    m2 = DiscreteDiffusionModel(d3pm_cfg=dict(cfg), conditioner_cfg=None)
    assert _module_key(m1) == _module_key(m2)
    hash(_module_key(m1))
    cfg2 = dict(cfg, n_layer=3)
    m3 = DiscreteDiffusionModel(d3pm_cfg=cfg2, conditioner_cfg=None)
    assert _module_key(m1) != _module_key(m3)
