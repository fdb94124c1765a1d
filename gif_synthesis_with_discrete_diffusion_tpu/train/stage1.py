"""Stage 1: VQ-VAE training (reference src/models/text_motion_model.py).

One Adam(betas=(0.5, 0.999)) on the generator (text_motion_model.py:139-144),
loss = weighted ComputeLosses total (l_dummy = recon + commitment), periodic
sample rendering, optional FVD evaluation hook. The whole step — uint8
preprocessing, encoder/decoder convs, fused codebook lookup, EMA update,
grads, Adam — is one jitted function; batches are sharded over the mesh's
``data`` axis, so codebook EMA statistics and gradient averaging become XLA
collectives (replacing dist.all_reduce at videogpt_vq_vae.py:197-198).
"""
from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.preprocess import preprocess_clip
from ..models.vqvae import VQVAE
from ..train.loop import (Trainer, freeze_cfg, shared_jit,
                          shared_module_init)
from ..train.metrics import weighted_losses
from ..utils.logging import get_logger
from ..utils.renderer import render_animation

log = get_logger(__name__)

__all__ = ["Stage1Trainer", "VQVAEState", "make_vqvae", "init_vqvae_state"]


@struct.dataclass
class VQVAEState:
    step: jax.Array
    params: Any
    batch_stats: Any
    codebook: Any
    opt_state: Any


def make_vqvae(model_cfg: Mapping[str, Any], mesh=None) -> VQVAE:
    g = dict(model_cfg.get("generator", model_cfg))
    return VQVAE(
        mesh=mesh,
        embedding_dim=int(g.get("embedding_dim", 128)),
        n_codes=int(g.get("n_codes", 4096)),
        n_hiddens=int(g.get("n_hiddens", 256)),
        n_res_layers=int(g.get("n_res_layers", 3)),
        downsample=tuple(g.get("downsample", (1, 16, 16))),
        sequence_length=int(g.get("sequence_length", 4)),
        resolution=int(g.get("resolution", 128)),
        kernel_mode=str(g.get("kernel_mode", "auto")),
        dtype=jnp.bfloat16 if str(g.get("dtype", "float32")) in
        ("bfloat16", "bf16") else jnp.float32,
    )


def init_vqvae_state(model: VQVAE, tx: optax.GradientTransformation,
                     example_video: jax.Array, rng: jax.Array) -> VQVAEState:
    p_rng, c_rng = jax.random.split(rng)
    # init via the process-wide shared-jit cache (train/loop.py): one fused
    # compile per (module, shape), reused across equal-config trainers.
    variables = shared_module_init(
        model, {"params": p_rng, "codebook": c_rng},
        {"video": example_video}, train=True)
    params = variables["params"]
    return VQVAEState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        codebook=variables["codebook"],
        opt_state=tx.init(params),
    )


class Stage1Trainer(Trainer):
    def __init__(self, cfg, datamodule, run_dir, mesh=None):
        super().__init__(cfg, datamodule, run_dir, mesh)
        self.model_cfg = cfg.get("model", {})
        self.loss_dict = dict(
            self.model_cfg.get("losses", {}).get("loss_dict", {"l_dummy": 1.0}))
        lr = float(self.model_cfg.get("lr_args", {}).get("gen_lr", 4e-4))
        self.tx = optax.adam(lr, b1=0.5, b2=0.999)
        self.model = make_vqvae(self.model_cfg, mesh=self.mesh)
        self.resolution = self.model.resolution
        self._names = [n for n in self.loss_dict] + ["total"]
        self.evaluator = None  # optional FVD evaluator (reconstruction FVD,
        # reference text_motion_model.py:98-100: eval outputs are pushed on
        # val/test splits when do_evaluation is set)

    def loss_names(self):
        return self._names

    def build(self, example_batch):
        video = preprocess_clip(jnp.asarray(example_batch["video"][:1]),
                                self.resolution)
        self.state = init_vqvae_state(self.model, self.tx, video,
                                      self.next_rng())
        # share compiled steps across equal-config trainer instances
        # (train/loop.py shared_jit): jax.jit would otherwise key on the
        # fresh partial object and recompile per instance
        # key on the constructed module (flax modules hash by field values),
        # so config-dict noise (extra keys, defaults spelled out) still
        # shares the compile
        sig = (self.model, self.mesh,
               freeze_cfg(self.model_cfg.get("lr_args", {})),
               tuple(sorted(self.loss_dict.items())))
        self._jit_train = shared_jit(("s1_train", sig), lambda: jax.jit(
            functools.partial(
                _train_step, model=self.model, tx=self.tx,
                loss_dict=self.loss_dict, resolution=self.resolution),
            donate_argnums=(0,)))
        self._jit_eval = shared_jit(("s1_eval", sig), lambda: jax.jit(
            functools.partial(
                _eval_step, model=self.model, loss_dict=self.loss_dict,
                resolution=self.resolution)))
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        log.info("VQ-VAE params: %.2fM", n_params / 1e6)

    def train_step(self, state, batch, rng):
        return self._jit_train(state, batch, rng)

    def eval_step(self, state, batch, rng):
        return self._jit_eval(state, batch, rng)

    def sample_videos(self, batch, rng) -> jax.Array:
        """Reconstructions (the stage-1 'generated' clips for FVD)."""
        video = preprocess_clip(jnp.asarray(batch["video"]), self.resolution)
        out = self.model.apply(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats,
             "codebook": self.state.codebook},
            {"video": video}, train=False)
        return out["pred_data"]

    def extra_eval_metrics(self, split: str, epoch: int) -> dict:
        if self.evaluator is None:
            return {}
        every = int(self.cfg.get("trainer", {}).get("fvd_every_n_epochs", 5))
        if split == "val" and epoch % every != 0:
            return {}
        return self.evaluator.evaluate(self, split, epoch)

    def render_samples(self, epoch: int) -> None:
        try:
            batch = next(iter(self.datamodule.val_batches(epoch)))
        except StopIteration:
            return
        video = preprocess_clip(jnp.asarray(batch["video"][:1]),
                                self.resolution)
        out = self.model.apply(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats,
             "codebook": self.state.codebook},
            {"video": video}, train=False)
        render_animation(jax.device_get(out["pred_data"][0]),
                         self.run_dir / f"epoch{epoch}_synthesis.gif")
        render_animation(jax.device_get(video[0]),
                         self.run_dir / f"epoch{epoch}_original.gif")


def _forward(model, params, batch_stats, codebook, video, rng, train):
    variables = {"params": params, "batch_stats": batch_stats,
                 "codebook": codebook}
    if train:
        out, mutated = model.apply(
            variables, {"video": video}, train=True,
            rngs={"codebook": rng}, mutable=["batch_stats", "codebook"])
        return out, mutated
    return model.apply(variables, {"video": video}, train=False), None


def _train_step(state: VQVAEState, batch, rng, *, model, tx, loss_dict,
                resolution):
    video = preprocess_clip(batch["video"], resolution)

    def loss_fn(params):
        out, mutated = _forward(model, params, state.batch_stats,
                                state.codebook, video, rng, True)
        total, values = weighted_losses(loss_dict, out)
        return total, (values, mutated)

    (_, (values, mutated)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = VQVAEState(
        step=state.step + 1,
        params=new_params,
        batch_stats=mutated.get("batch_stats", state.batch_stats),
        codebook=mutated["codebook"],
        opt_state=new_opt)
    return new_state, values


def _eval_step(state: VQVAEState, batch, rng, *, model, loss_dict,
               resolution):
    video = preprocess_clip(batch["video"], resolution)
    out, _ = _forward(model, state.params, state.batch_stats, state.codebook,
                      video, rng, False)
    _, values = weighted_losses(loss_dict, out)
    return values
