"""Megakernel sampling under a multi-device mesh (shard_map wrapper).

pallas_call has no SPMD partitioning rule, so on a >1-device data mesh the
stage-2 sampler must run the kernel per device over the batch shard
(train/stage2.py _sample_step) instead of silently replicating work.
Deterministic (argmax) mode: the sharded result must equal the
single-device run bit-for-bit."""
import numpy as np
import pytest

import jax

from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
    _sample_step)


@pytest.mark.slow  # ~110s: interpret-mode kernel x2 full loops; the
# driver's dryrun_multichip exercises this path every round regardless
def test_megakernel_sampler_sharded_matches_single_device(stage2_trained):
    assert jax.device_count() == 8
    t, _ = stage2_trained   # session-shared trained trainer (conftest.py)
    batch = t._prepare_batch(next(iter(t.datamodule.train_batches(0))))
    db = {k: jax.numpy.asarray(v) for k, v in batch.items() if k != "text"}
    assert int(t.mesh.shape["data"]) == 8

    kw = dict(autoencoder=t.autoencoder, generator=t.generator,
              resolution=t.resolution, latent_shape=t.latent_shape,
              sampler="megakernel", interpret=True, sample_mode=False)
    sharded = _sample_step(t.state, db, jax.random.key(0), mesh=t.mesh,
                           **kw)
    single = _sample_step(t.state, db, jax.random.key(0), mesh=None, **kw)
    assert sharded.shape == (8, 2, 16, 16, 3)
    assert np.isfinite(np.asarray(sharded)).all()
    # tokens are bit-identical; the VQ decode conv runs on differently
    # sharded layouts, so allow last-ulp drift in the pixels
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-4, atol=1e-6)
