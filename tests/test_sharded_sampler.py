"""Megakernel sampling under a multi-device mesh (shard_map wrapper).

pallas_call has no SPMD partitioning rule, so on a >1-device data mesh the
stage-2 sampler must run the kernel per device over the batch shard
(train/stage2.py _sample_step) instead of silently replicating work.
Deterministic (argmax) mode: the sharded result must equal the
single-device run bit-for-bit."""
import numpy as np

import jax

from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
    Stage2Trainer, _sample_step)
from tests.test_stage2_train import _cfg, _dm


def test_megakernel_sampler_sharded_matches_single_device(tmp_path):
    assert jax.device_count() == 8
    t = Stage2Trainer(_cfg(), _dm(), tmp_path / "run")
    batch = t._prepare_batch(next(iter(t.datamodule.train_batches(0))))
    t.build(batch)
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
