"""Stage 2: discrete-diffusion training over frozen VQ-VAE tokens.

Capability parity with the reference's ``MultistageTextMotionModel``
(reference src/models/multistage_text_motion_model.py:22-281): a trainable
generator (conditioner + D3PM denoiser) and a frozen autoencoder whose
checkpoint loads from stage 1, Adam(gen_lr, betas=(0.5, 0.999)), loss =
diffusion vb loss, periodic synthesis rendering and (hookable) FVD eval.

Divergences from the reference (intended-vs-committed, SURVEY §7):
* the reference creates an Adam(1e-6) for the frozen autoencoder and calls
  ``opt.step()`` unconditionally even during val/test (multistage:186-197) —
  a no-op-at-best bug; here frozen means frozen (no optimizer);
* per-step single-step decode for viz (dd.py:41 decodes the x0 prediction
  EVERY training step) is only done when rendering, not every step;
* ``torch.autograd.set_detect_anomaly`` per step (multistage:192) maps to
  the optional debug_nans config flag.
"""
from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.preprocess import preprocess_clip
from ..models.clip_text import make_tokenizer
from ..models.discrete_diffusion import (DiscreteDiffusionModel,
                                         make_discrete_diffusion)
from ..models.vqvae import VQVAE
from ..train.loop import (Trainer, freeze_cfg, shared_jit,
                          shared_module_apply, shared_module_init)
from ..train.metrics import weighted_losses
from ..train.stage1 import make_vqvae
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import get_logger
from ..utils.renderer import render_animation

log = get_logger(__name__)

__all__ = ["Stage2Trainer", "Stage2State", "load_stage1_checkpoint"]

# largest content_seq_len the fully-fused sampling megakernel auto-selects
# for (compile-time bound, see Stage2Trainer.build). 2304 covers the
# MSRVTT grid (msrvtt-ddiff-train.job:16): with 256-row query blocks the
# kernel Mosaic-compiles in ~8 min (one-time per process) and samples
# 1.44x faster than the XLA+fused_mha route (0.857 vs 0.596 clips/sec at
# batch 8 on the tunnel chip).
MEGAKERNEL_MAX_SEQ = 2304


@struct.dataclass
class Stage2State:
    step: jax.Array
    gen_params: Any
    diffusion: Any          # Lt buffers
    ae_params: Any
    ae_batch_stats: Any
    ae_codebook: Any
    opt_state: Any


def load_stage1_checkpoint(ckpt_dir: str, model: VQVAE, example_video) -> dict:
    """Restore a stage-1 VQVAEState and return its model variables."""
    from ..train.stage1 import init_vqvae_state
    import optax as _optax
    tx = _optax.adam(1e-4)
    template = init_vqvae_state(model, tx, example_video, jax.random.key(0))
    mgr = CheckpointManager(ckpt_dir, monitor=None)
    state = mgr.restore(template)
    mgr.close()
    return {"params": state.params, "batch_stats": state.batch_stats,
            "codebook": state.codebook}


class Stage2Trainer(Trainer):
    def __init__(self, cfg, datamodule, run_dir, mesh=None):
        super().__init__(cfg, datamodule, run_dir, mesh)
        # reference stage-2 renders every 10 val epochs vs stage-1's 5
        # (multistage_text_motion_model.py:235 vs text_motion_model.py:127);
        # an explicit trainer.render_every_n_epochs still wins
        if (cfg.get("trainer", {}) or {}).get("render_every_n_epochs") is None:
            self.render_every_n_epochs = 10
        self.model_cfg = cfg.get("model", {})
        self.loss_dict = dict(self.model_cfg.get(
            "generator_losses", {}).get("loss_dict", {"l_dummy": 1.0}))
        lr = float(self.model_cfg.get("lr_args", {}).get("gen_lr", 1e-4))
        self.tx = optax.adam(lr, b1=0.5, b2=0.999)
        self.autoencoder = make_vqvae(
            {"generator": self.model_cfg.get("autoencoder", {})},
            mesh=self.mesh)
        self.resolution = self.autoencoder.resolution
        self.latent_shape = self.autoencoder.latent_shape
        self.generator = make_discrete_diffusion(
            self.model_cfg, num_embed=self.autoencoder.n_codes,
            latent_shape=self.latent_shape)
        # + the per-step diffusion telemetry scalars (dt.py:407-417,
        # computed-but-never-logged in the reference; logged here)
        self._names = ([n for n in self.loss_dict] + ["total"]
                       + ["diffusion_acc", "diffusion_keep"])
        tenc = self.model_cfg.get("generator", {}).get("textencoder") or {}
        tenc = tenc if isinstance(tenc, Mapping) else {}
        self._text_mode = tenc.get("mode") == "text"
        # only text conditioning needs a tokenizer — make_tokenizer may
        # attempt a (best-effort) BPE-vocab download, which must not run on
        # every label/frame/null trainer build
        self.tokenizer = (make_tokenizer(
            tenc.get("bpe_path"),
            allow_hash=bool(tenc.get("allow_hash_tokenizer", False)))
            if self._text_mode else None)
        self._learnable_cf = bool(
            self.model_cfg.get("generator", {})
            .get("diffusion_model", {}).get("learnable_cf", False))
        self.evaluator = None  # set externally or via cfg (FVD)

    def loss_names(self):
        return self._names

    def _prepare_batch(self, batch: Mapping[str, Any]) -> dict:
        batch = dict(batch)
        if self._text_mode and "text" in batch:
            batch["text_tokens"] = self.tokenizer(batch["text"])
            if self._learnable_cf:
                # rows with EMPTY captions train empty_text_embed — the
                # reference derives this from the condition token mask
                # (dt.py:541-543, is_empty_text from condition_mask)
                batch["empty_text_mask"] = np.array(
                    [not str(t).strip() for t in batch["text"]], bool)
        return batch

    def build(self, example_batch):
        example_batch = self._prepare_batch(example_batch)
        example_batch = {k: (v[:1] if hasattr(v, "__getitem__") else v)
                         for k, v in example_batch.items()}
        video = preprocess_clip(jnp.asarray(example_batch["video"]),
                                self.resolution)
        a_rng, g_rng, d_rng = jax.random.split(self.next_rng(), 3)
        # inits/encode go through the shared-jit cache (loop.py): one fused
        # compile per (module, shape), reused across equal-config trainers
        ae_vars = shared_module_init(
            self.autoencoder, {"params": a_rng, "codebook": a_rng},
            {"video": video}, train=True)
        ckpt_paths = self.model_cfg.get("checkpoint_paths") or {}
        if isinstance(ckpt_paths, Mapping) and ckpt_paths.get("autoencoder"):
            ae_vars = load_stage1_checkpoint(
                ckpt_paths["autoencoder"], self.autoencoder, video)
            log.info("loaded stage-1 autoencoder from %s",
                     ckpt_paths["autoencoder"])

        tokens = shared_module_apply(
            "encode", self.autoencoder,
            {"params": ae_vars["params"],
             "batch_stats": ae_vars.get("batch_stats", {}),
             "codebook": ae_vars["codebook"]},
            video, method=VQVAE.encode)
        flat = tokens.reshape(tokens.shape[0], -1)
        dev_batch = {k: jnp.asarray(v)
                     for k, v in example_batch.items() if k != "text"}
        gen_vars = shared_module_init(
            self.generator, {"params": g_rng, "diffusion": d_rng},
            dev_batch, flat, train=True)
        self.state = Stage2State(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_vars["params"],
            diffusion=gen_vars["diffusion"],
            ae_params=ae_vars["params"],
            ae_batch_stats=ae_vars.get("batch_stats", {}),
            ae_codebook=ae_vars["codebook"],
            opt_state=self.tx.init(gen_vars["params"]))

        # share compiled steps across equal-config trainer instances
        # (train/loop.py shared_jit): jax.jit would otherwise key on the
        # fresh partial object and recompile per instance
        # Only the keys that shape the compiled computation: checkpoint_paths
        # merely selects WEIGHTS, do_evaluation/stage drive host-side logic.
        sig_cfg = {k: self.model_cfg.get(k) for k in
                   ("generator", "autoencoder", "generator_losses",
                    "lr_args")}
        sig = (freeze_cfg(sig_cfg), self.mesh,
               tuple(sorted(self.loss_dict.items())))
        self._jit_train = shared_jit(("s2_train", sig), lambda: jax.jit(
            functools.partial(
                _train_step, autoencoder=self.autoencoder,
                generator=self.generator, tx=self.tx,
                loss_dict=self.loss_dict, resolution=self.resolution),
            donate_argnums=(0,)))
        self._jit_eval = shared_jit(("s2_eval", sig), lambda: jax.jit(
            functools.partial(
                _eval_step, autoencoder=self.autoencoder,
                generator=self.generator, loss_dict=self.loss_dict,
                resolution=self.resolution)))
        self._jit_single = shared_jit(("s2_single", sig), lambda: jax.jit(
            functools.partial(
                _single_step_pred, autoencoder=self.autoencoder,
                generator=self.generator, resolution=self.resolution,
                latent_shape=self.latent_shape)))
        sampler = str(self.cfg.get("trainer", {}).get("sampler", "auto"))
        if sampler == "auto":
            # The megakernel's query-block loop is statically unrolled, so
            # its Mosaic program grows with L; beyond ~1024 tokens (the UCF
            # BASELINE scale) compilation takes >40 min on the tunnel chip.
            # Larger grids (MSRVTT: 48x48 = 2304) route through the XLA
            # sampler with the tiled fused-VMEM attention instead.
            seq = int(self.generator.d3pm_cfg["content_seq_len"])
            sampler = ("megakernel"
                       if jax.default_backend() in ("tpu", "axon")
                       and seq <= MEGAKERNEL_MAX_SEQ
                       else "model")
        self._jit_sample = shared_jit(
            ("s2_sample", sig, sampler), lambda: jax.jit(
                functools.partial(
                    _sample_step, autoencoder=self.autoencoder,
                    generator=self.generator, resolution=self.resolution,
                    latent_shape=self.latent_shape, sampler=sampler,
                    mesh=self.mesh)))
        n_params = sum(x.size for x in jax.tree.leaves(self.state.gen_params))
        log.info("D3PM generator params: %.2fM", n_params / 1e6)

    def train_step(self, state, batch, rng):
        return self._jit_train(state, batch, rng)

    def eval_step(self, state, batch, rng):
        return self._jit_eval(state, batch, rng)

    def sample_videos(self, batch, rng) -> jax.Array:
        """Generate clips for a (host) batch: returns (B, T, H, W, 3)."""
        batch = self._prepare_batch(batch)
        db = {k: jnp.asarray(v) for k, v in batch.items() if k != "text"}
        return self._jit_sample(self.state, db, rng)

    def _run_epoch(self, split, epoch):
        # host-side tokenization before the base loop ships batches
        orig = self.datamodule
        if self._text_mode:
            self.datamodule = _TokenizingDM(orig, self._prepare_batch)
        try:
            return super()._run_epoch(split, epoch)
        finally:
            self.datamodule = orig

    def render_samples(self, epoch: int) -> None:
        """Write the reference's THREE val-render artifacts per render epoch
        (multistage_text_motion_model.py:254-281): full reverse-process
        synthesis, the decoded single-step x0 prediction (pred_data), and
        the ground-truth original."""
        try:
            batch = next(iter(self.datamodule.val_batches(epoch)))
        except StopIteration:
            return
        small = {k: (v[:1] if hasattr(v, "__getitem__") else v)
                 for k, v in batch.items()}
        videos = self.sample_videos(small, self.next_rng())
        render_animation(jax.device_get(videos[0]),
                         self.run_dir / f"epoch{epoch}_synthesis.gif")
        prepared = self._prepare_batch(small)
        db = {k: jnp.asarray(v) for k, v in prepared.items() if k != "text"}
        single = self._jit_single(self.state, db, self.next_rng())
        render_animation(jax.device_get(single[0]),
                         self.run_dir / f"epoch{epoch}_single_step.gif")
        gt = preprocess_clip(jnp.asarray(small["video"]), self.resolution)
        render_animation(jax.device_get(gt[0]),
                         self.run_dir / f"epoch{epoch}_original.gif")

    def extra_eval_metrics(self, split: str, epoch: int) -> dict:
        if self.evaluator is None:
            return {}
        every = int(self.cfg.get("trainer", {}).get("fvd_every_n_epochs", 5))
        if split == "val" and epoch % every != 0:
            return {}
        return self.evaluator.evaluate(self, split, epoch)


class _TokenizingDM:
    """Wraps a datamodule so every batch carries text_tokens."""

    def __init__(self, dm, prepare):
        self._dm = dm
        self._prepare = prepare

    def __getattr__(self, name):
        attr = getattr(self._dm, name)
        if name.endswith("_batches"):
            def wrapped(*a, **k):
                for b in attr(*a, **k):
                    yield self._prepare(b)
            return wrapped
        return attr


def _encode_tokens(autoencoder, state: Stage2State, video):
    tokens = autoencoder.apply(
        {"params": state.ae_params, "batch_stats": state.ae_batch_stats,
         "codebook": state.ae_codebook}, video, method=VQVAE.encode)
    return jax.lax.stop_gradient(tokens.reshape(tokens.shape[0], -1))


def _gen_apply(generator, params, diffusion, batch, flat, rng, train):
    variables = {"params": params, "diffusion": diffusion}
    if train:
        out, mutated = generator.apply(
            variables, batch, flat, train=True, rngs={"diffusion": rng},
            mutable=["diffusion"])
        return out, mutated["diffusion"]
    out = generator.apply(variables, batch, flat, train=False,
                          rngs={"diffusion": rng})
    return out, diffusion


def _train_step(state: Stage2State, batch, rng, *, autoencoder, generator,
                tx, loss_dict, resolution):
    video = preprocess_clip(batch["video"], resolution)
    flat = _encode_tokens(autoencoder, state, video)

    def loss_fn(params):
        out, new_diff = _gen_apply(generator, params, state.diffusion,
                                   batch, flat, rng, True)
        total, values = weighted_losses(loss_dict, {"losses": out["loss"]})
        # per-step x0-accuracy / keep-rate telemetry (logged as
        # diffusion/acc/<split>; the reference computes-but-never-logs
        # these, dt.py:407-417)
        values["diffusion_acc"] = out["diffusion_acc"]
        values["diffusion_keep"] = out["diffusion_keep"]
        return total, (values, new_diff)

    (_, (values, new_diff)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.gen_params)
    updates, new_opt = tx.update(grads, state.opt_state, state.gen_params)
    new_params = optax.apply_updates(state.gen_params, updates)
    new_state = state.replace(step=state.step + 1, gen_params=new_params,
                              diffusion=new_diff, opt_state=new_opt)
    return new_state, values


def _eval_step(state: Stage2State, batch, rng, *, autoencoder, generator,
               loss_dict, resolution):
    video = preprocess_clip(batch["video"], resolution)
    flat = _encode_tokens(autoencoder, state, video)
    out, _ = _gen_apply(generator, state.gen_params, state.diffusion,
                        batch, flat, rng, False)
    _, values = weighted_losses(loss_dict, {"losses": out["loss"]})
    values["diffusion_acc"] = out["diffusion_acc"]
    values["diffusion_keep"] = out["diffusion_keep"]
    return values


def _single_step_pred(state: Stage2State, batch, rng, *, autoencoder,
                      generator, resolution, latent_shape):
    """Decode the model's one-shot x0 prediction for a batch: q_sample a
    noisy x_t, predict x0, argmax tokens, VQ-decode — the reference's
    'single_step' render artifact (multistage_text_motion_model.py:261-267,
    fed by the pred_data the train step computes at dd.py:41)."""
    video = preprocess_clip(batch["video"], resolution)
    flat = _encode_tokens(autoencoder, state, video)
    out, _ = _gen_apply(generator, state.gen_params, state.diffusion,
                        batch, flat, rng, False)
    tokens = out["pred_data"].reshape(flat.shape[0], *latent_shape)
    return autoencoder.apply(
        {"params": state.ae_params, "batch_stats": state.ae_batch_stats,
         "codebook": state.ae_codebook}, tokens, method=VQVAE.decode)


def _sample_step(state: Stage2State, batch, rng, *, autoencoder, generator,
                 resolution, latent_shape, sampler: str = "model",
                 mesh=None, interpret: bool = False,
                 sample_mode: bool = True):
    b = batch["video"].shape[0]
    if sampler == "megakernel":
        # fully-fused Pallas sampling (ops/megakernel.py): conditioner runs
        # under XLA, then the whole reverse step per t runs in one kernel
        from ..models.d3pm import make_schedule
        from ..ops.megakernel import megakernel_sample_tokens
        dcfg = dict(generator.d3pm_cfg)
        cond, cf_cond = generator.apply(
            {"params": state.gen_params}, batch, b,
            method=DiscreteDiffusionModel.conditioner_embeddings)
        sched = make_schedule(int(dcfg["diffusion_step"]),
                              int(dcfg["num_embed"]) + 1)
        params_t = state.gen_params["diffusion"]["transformer"]
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1

        def run_mk(mk_rng, c, cf, params, batch_size):
            return megakernel_sample_tokens(
                mk_rng, sched, params, c, cf, batch_size,
                int(dcfg["content_seq_len"]),
                spatial_size=dcfg["spatial_size"],
                n_layer=int(dcfg["n_layer"]), n_head=int(dcfg["n_head"]),
                n_embd=int(dcfg["n_embd"]),
                diffusion_step=int(dcfg["diffusion_step"]),
                guidance_scale=float(dcfg["guidance_scale"]),
                sample_mode=sample_mode, interpret=interpret)

        if n_data > 1 and b % n_data == 0:
            # pallas_call has no SPMD partitioning rule, so under a
            # multi-device mesh the kernel runs per device over the batch
            # shard via shard_map (sampling is embarrassingly data-parallel;
            # weights replicated). Mirrors the sharded codebook kernel
            # (ops/codebook_kernel.nearest_code_stats_sharded).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            cfb = jnp.broadcast_to(cf_cond, cond.shape)

            def per_shard(mk_rng, c, cf, params):
                mk_rng = jax.random.fold_in(
                    mk_rng, jax.lax.axis_index("data"))
                return run_mk(mk_rng, c, cf, params, b // n_data)

            tokens = shard_map(
                per_shard, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P()),
                out_specs=P("data"), check_vma=False,
            )(rng, cond, cfb, params_t)
        else:
            tokens = run_mk(rng, cond, cf_cond, params_t, b)
    else:
        tokens = generator.apply(
            {"params": state.gen_params, "diffusion": state.diffusion},
            batch, b, method=DiscreteDiffusionModel.sample,
            rngs={"diffusion": rng})
    tokens = tokens.reshape(b, *latent_shape)
    return autoencoder.apply(
        {"params": state.ae_params, "batch_stats": state.ae_batch_stats,
         "codebook": state.ae_codebook}, tokens, method=VQVAE.decode)
