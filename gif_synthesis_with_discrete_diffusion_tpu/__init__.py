"""gif_synthesis_with_discrete_diffusion_tpu: TPU-native GIF/video synthesis.

A from-scratch JAX/XLA/Pallas/pjit framework with the capability surface of
the reference Developer-Zer0/GIF-synthesis-with-Discrete-Diffusion repo
(PyTorch + Lightning + Hydra), re-designed TPU-first:

* Stage 1 — VideoGPT-style 3D-conv VQ-VAE with an EMA codebook, whose
  nearest-neighbor lookup + EMA statistics run in a fused Pallas kernel.
* Stage 2 — VQ-Diffusion-style D3PM transformer over the VQ token grid with
  classifier-free guidance; the full 100-step reverse process compiles to a
  single ``lax.scan``.
* FVD evaluation via an Inception-I3D backbone, on-device video
  preprocessing, composable YAML configs, Orbax checkpointing, and
  data-parallel training over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
