"""TPU compile-smoke tier (`pytest -m tpu`): Mosaic-compile the Pallas
kernels on the real chip with small shapes.

CPU tests run the kernels with ``interpret=True``, which checks NONE of the
Mosaic constraints (no scatter, (8,128) tiling, bool-vector rules) — these
tests exist so Mosaic regressions surface without running the full bench.

The session conftest forces the CPU platform before jax initializes, so
each smoke runs in a SUBPROCESS with the CPU-forcing env stripped; a quick
device probe skips the tier when the TPU tunnel is wedged (single-tenant,
init can hang for 20+ min).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env() -> dict:
    env = dict(os.environ)
    for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        env.pop(var, None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_on_tpu(code: str, timeout: float = 840.0):
    return subprocess.run(
        [sys.executable, "-c", code], env=_tpu_env(), cwd=_REPO,
        capture_output=True, text=True, timeout=timeout)


_PROBE = """
import jax
assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
print("devices:", len(jax.devices()))
"""


@pytest.fixture(scope="module")
def tpu_available():
    # normal tunnel backend init is ~40-90s; a wedged tunnel hangs 20+ min,
    # so 300s separates "slow but alive" from "skip the tier"
    try:
        r = _run_on_tpu(_PROBE, timeout=300.0)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init timed out (tunnel wedged)")
    if r.returncode != 0:
        pytest.skip(f"TPU unavailable: {r.stderr.strip()[-500:]}")
    return True


def _check(r):
    assert r.returncode == 0, (
        f"--- stdout ---\n{r.stdout[-2000:]}\n--- stderr ---\n"
        f"{r.stderr[-4000:]}")


def test_codebook_kernel_compiles_on_tpu(tpu_available):
    _check(_run_on_tpu("""
import numpy as np
import jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.ops.codebook_kernel import (
    nearest_code_stats, nearest_code_stats_reference)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((512, 64)), jnp.float32)
emb = jnp.asarray(rng.standard_normal((96, 64)), jnp.float32)
got = nearest_code_stats(x, emb, use_pallas=True)
want = nearest_code_stats_reference(x, emb)
np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]))
np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                           rtol=1e-4, atol=1e-4)
print("codebook kernel ok")
"""))


def test_sampler_kernel_compiles_on_tpu(tpu_available):
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
    _analytic_posterior, _guided_log_x_recon)
from gif_synthesis_with_discrete_diffusion_tpu.ops.sampler_kernel import (
    fused_sample_step, schedule_rows)
T, K, L, B = 6, 25, 16, 2
sched = d3pm.make_schedule(T, K)
rng = np.random.default_rng(1)
tokens = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)
logits2 = jnp.asarray(rng.standard_normal((2 * B, K - 1, L)), jnp.float32)
rows = schedule_rows(sched)
t = 3
new_tok, post = fused_sample_step(
    logits2, tokens, rows[t], jnp.int32(0), guidance=2.0, num_classes=K,
    sample=False, return_posterior=True)
r = _guided_log_x_recon(logits2, 2.0, B)
want = _analytic_posterior(sched, r, tokens, jnp.asarray(t))
np.testing.assert_allclose(np.asarray(post), np.asarray(want),
                           rtol=2e-3, atol=2e-3)
np.testing.assert_array_equal(np.asarray(new_tok),
                              np.asarray(jnp.argmax(want, axis=1)))
print("sampler kernel ok")
"""))


def test_megakernel_compiles_on_tpu(tpu_available):
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)
from gif_synthesis_with_discrete_diffusion_tpu.ops import megakernel as mk
T, K_CODES, L, B = 6, 24, 16, 2
N_LAYER, N_EMBD, N_HEAD, COND_DIM = 2, 32, 4, 16
sched = d3pm.make_schedule(T, K_CODES + 1)
model = DenoiserTransformer(
    num_embed=K_CODES, spatial_size=(4, 4), n_layer=N_LAYER, n_embd=N_EMBD,
    n_head=N_HEAD, content_seq_len=L, condition_dim=COND_DIM,
    diffusion_step=T)
variables = model.init(jax.random.key(0), jnp.zeros((B, L), jnp.int32),
                       jnp.zeros((B, 1, COND_DIM)), jnp.zeros((B,), jnp.int32))
rng = np.random.default_rng(2)
cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
tokens = mk.megakernel_sample_tokens(
    jax.random.key(0), sched, variables["params"], cond,
    jnp.zeros_like(cond), B, L, spatial_size=(4, 4), n_layer=N_LAYER,
    n_head=N_HEAD, n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
    weights_dtype=jnp.float32)
arr = np.asarray(tokens)
assert arr.shape == (B, L)
assert arr.min() >= 0 and arr.max() <= K_CODES
print("megakernel ok")
"""))


def test_attention_kernel_compiles_on_tpu(tpu_available):
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)
B, L, COND_DIM = 2, 16, 16
model = DenoiserTransformer(
    num_embed=24, spatial_size=(4, 4), n_layer=2, n_embd=32, n_head=4,
    content_seq_len=L, condition_dim=COND_DIM, diffusion_step=6)
tokens = jnp.zeros((B, L), jnp.int32)
cond = jnp.zeros((B, 1, COND_DIM))
t = jnp.zeros((B,), jnp.int32)
variables = model.init(jax.random.key(0), tokens, cond, t)
fused = model.apply(variables, tokens, cond, t, fused_attention=True)
plain = model.apply(variables, tokens, cond, t, fused_attention=False)
np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                           rtol=2e-3, atol=2e-3)
print("attention kernel ok")
"""))


def test_megakernel_compiles_at_baseline_scale(tpu_available):
    """The flagship kernel must Mosaic-compile AND run at the HONEST
    problem size — 19 layers, L=1024 latent tokens, K=4097 classes
    (reference ucf-ddiff-train.job:15) — not just the toy smoke shapes.
    Argmax mode, 2 scan steps; ~4 min compile on the tunnel chip."""
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)
from gif_synthesis_with_discrete_diffusion_tpu.ops import megakernel as mk
K_CODES, L, T, B = 4096, 1024, 2, 2
model = DenoiserTransformer(
    num_embed=K_CODES, spatial_size=(128, 8), n_layer=19, n_embd=64,
    n_head=16, content_seq_len=L, condition_dim=512, diffusion_step=100)
variables = model.init(jax.random.key(0), jnp.zeros((B, L), jnp.int32),
                       jnp.zeros((B, 1, 512)), jnp.zeros((B,), jnp.int32))
sched = d3pm.make_schedule(T, K_CODES + 1)
tokens = mk.megakernel_sample_tokens(
    jax.random.key(1), sched, variables["params"], jnp.zeros((B, 1, 512)),
    jnp.zeros((B, 1, 512)), B, L, spatial_size=(128, 8), n_layer=19,
    n_head=16, n_embd=64, diffusion_step=100, guidance_scale=2.0,
    sample_mode=False)
arr = np.asarray(tokens)
assert arr.shape == (B, L)
assert arr.min() >= 0 and arr.max() <= K_CODES
print("megakernel baseline-scale ok")
""", timeout=840.0))


def test_pack_cfg_megakernel_on_tpu(tpu_available):
    """The CFG-packed kernel (_kernel_packed) must Mosaic-compile and —
    with REAL sampling on — draw the same tokens as the 2-branch kernel:
    the packed kernel's Gumbel stream must equal branch 1's (PRNG seeded
    per batch row; branch 0 never draws), and the packed QK's zero
    padding must not perturb the f32 accumulation."""
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)
from gif_synthesis_with_discrete_diffusion_tpu.ops import megakernel as mk
T, K_CODES, L, B = 6, 24, 16, 2
N_LAYER, N_EMBD, N_HEAD, COND_DIM = 2, 32, 4, 16
sched = d3pm.make_schedule(T, K_CODES + 1)
model = DenoiserTransformer(
    num_embed=K_CODES, spatial_size=(4, 4), n_layer=N_LAYER, n_embd=N_EMBD,
    n_head=N_HEAD, content_seq_len=L, condition_dim=COND_DIM,
    diffusion_step=T)
variables = model.init(jax.random.key(0), jnp.zeros((B, L), jnp.int32),
                       jnp.zeros((B, 1, COND_DIM)), jnp.zeros((B,), jnp.int32))
rng = np.random.default_rng(3)
cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
kw = dict(spatial_size=(4, 4), n_layer=N_LAYER, n_head=N_HEAD,
          n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
          weights_dtype=jnp.float32, sample_mode=True)
want = mk.megakernel_sample_tokens(
    jax.random.key(5), sched, variables["params"], cond,
    jnp.zeros_like(cond), B, L, pack_cfg=False, **kw)
got = mk.megakernel_sample_tokens(
    jax.random.key(5), sched, variables["params"], cond,
    jnp.zeros_like(cond), B, L, pack_cfg=True, **kw)
np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
print("pack_cfg megakernel ok (sampled tokens identical)")
""", timeout=1500.0))


def test_pack_cfg_compiles_at_baseline_scale(tpu_available):
    """The CFG-packed kernel at the HONEST problem size (19 layers,
    L=1024, K=4097): Mosaic compile + run, argmax mode, 2 scan steps."""
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)
from gif_synthesis_with_discrete_diffusion_tpu.ops import megakernel as mk
K_CODES, L, T, B = 4096, 1024, 2, 2
model = DenoiserTransformer(
    num_embed=K_CODES, spatial_size=(128, 8), n_layer=19, n_embd=64,
    n_head=16, content_seq_len=L, condition_dim=512, diffusion_step=100)
variables = model.init(jax.random.key(0), jnp.zeros((B, L), jnp.int32),
                       jnp.zeros((B, 1, 512)), jnp.zeros((B,), jnp.int32))
sched = d3pm.make_schedule(T, K_CODES + 1)
tokens = mk.megakernel_sample_tokens(
    jax.random.key(1), sched, variables["params"], jnp.zeros((B, 1, 512)),
    jnp.zeros((B, 1, 512)), B, L, spatial_size=(128, 8), n_layer=19,
    n_head=16, n_embd=64, diffusion_step=100, guidance_scale=2.0,
    sample_mode=False, pack_cfg=True)
arr = np.asarray(tokens)
assert arr.shape == (B, L)
assert arr.min() >= 0 and arr.max() <= K_CODES
print("pack_cfg baseline-scale ok")
""", timeout=1500.0))


def test_fused_mha_compiles_at_msrvtt_scale(tpu_available):
    """fused_mha must Mosaic-compile at the MSRVTT grid (L=2304 = 48x48,
    msrvtt-ddiff-train.job:16) — the scale where the default 16MB
    scoped-vmem stack used to OOM (query tiling + raised vmem limit).
    MSRVTT-scale sampling now rides the megakernel (MEGAKERNEL_MAX_SEQ =
    2304, ~8-min one-time compile — exercised by ``bench.py --config
    msrvtt``, too slow for this tier); fused_mha remains the training path
    and the sampling fallback above the gate."""
    _check(_run_on_tpu("""
import numpy as np
import jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.ops.attention import (
    fused_mha, sdpa_reference)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((2, 2304, 64)), jnp.float32)
k = jnp.asarray(rng.standard_normal((2, 2304, 64)), jnp.float32)
v = jnp.asarray(rng.standard_normal((2, 2304, 64)), jnp.float32)
got = np.asarray(fused_mha(q, k, v, n_head=16))
want = np.asarray(sdpa_reference(q, k, v, 16))
np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
print("fused_mha msrvtt-scale ok")
"""))


def test_fused_mha_grads_compile_on_tpu(tpu_available):
    """The custom-VJP backward kernel (training path) must Mosaic-compile
    and match the einsum-oracle gradients at the honest D3PM train scale
    (L=1024 tokens, C=64, H=16 — reference ucf-ddiff-train.job:15/16).
    Cross-attention (Lk=77 CLIP sequence) rides the same kernel."""
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.ops.attention import (
    fused_mha, sdpa_reference)
rng = np.random.default_rng(0)
for Lq, Lk in [(1024, 1024), (1024, 77)]:
    q = jnp.asarray(rng.standard_normal((2, Lq, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, Lk, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, Lk, 64)), jnp.float32)
    loss_f = lambda q, k, v: jnp.sum(fused_mha(q, k, v, n_head=16) ** 2)
    loss_r = lambda q, k, v: jnp.sum(sdpa_reference(q, k, v, 16) ** 2)
    got = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"d{name} Lq={Lq} Lk={Lk}")
print("fused_mha grads ok")
"""))


def test_sampler_kernel_compiles_at_honest_k(tpu_available):
    """fused_sample_step must Mosaic-compile at the honest class count
    (K=4097; kp=4104): its ~19 live (kp, 128) f32 temporaries are ~40 MB,
    over Mosaic's default 34 MB scoped-vmem stack (the 2049-class half
    config fit, so this only surfaced at the MSRVTT/honest vocab). The
    kernel serves every non-megakernel sampling path (stage2 'model'
    sampler, MSRVTT grids). Posterior equality vs the jnp path is covered
    on CPU (tests/test_sampler_kernel.py); here: compile + range check."""
    _check(_run_on_tpu("""
import numpy as np
import jax, jax.numpy as jnp
from gif_synthesis_with_discrete_diffusion_tpu.ops.sampler_kernel import (
    fused_sample_step)
from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
    make_schedule)
from gif_synthesis_with_discrete_diffusion_tpu.ops.sampler_kernel import (
    schedule_rows)
K, L, B = 4097, 2304, 2
sched = make_schedule(4, K)
rows = schedule_rows(sched)
rng = np.random.default_rng(0)
logits2 = jnp.asarray(rng.standard_normal((2 * B, K - 1, L)), jnp.float32)
tokens = jnp.full((B, L), K - 1, jnp.int32)
new = np.asarray(fused_sample_step(
    logits2, tokens, rows[3], jnp.int32(7), guidance=2.0, num_classes=K))
assert new.shape == (B, L)
assert new.min() >= 0 and new.max() <= K - 1
print("sampler kernel honest-K ok")
"""))
