"""Prefetching datamodule: same batches, background decode."""
import numpy as np
import pytest

from gif_synthesis_with_discrete_diffusion_tpu.data.prefetch import (
    PrefetchingDataModule, prefetch_iterator)
from gif_synthesis_with_discrete_diffusion_tpu.data.synthetic import (
    SyntheticVideoDataModule)


def test_prefetch_iterator_order_and_exceptions():
    assert list(prefetch_iterator(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetching_dm_matches_plain():
    dm = SyntheticVideoDataModule(batch_size=4, sequence_length=2,
                                  resolution=16, num_train=16, num_val=8)
    pf = PrefetchingDataModule(dm, num_workers=0, depth=2)
    plain = list(dm.train_batches(epoch=3))
    wrapped = list(pf.train_batches(epoch=3))
    assert len(plain) == len(wrapped)
    for a, b in zip(plain, wrapped):
        np.testing.assert_array_equal(a["video"], b["video"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_prefetching_dm_parallel_decode(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from tests.test_video_dataset import _write_video
    from gif_synthesis_with_discrete_diffusion_tpu.data.video_dataset import (
        UCF101DataModule)
    for cls in ("BreastStroke", "BaseballPitch"):
        for vi in range(2):
            _write_video(tmp_path / "train" / cls / f"v{vi}.mp4", seed=vi)
    dm = UCF101DataModule(str(tmp_path), sequence_length=4, resolution=16,
                          batch_size=2, frames_between_clips=8)
    pf = PrefetchingDataModule(dm, num_workers=3, depth=2)
    plain = list(dm.train_batches(epoch=0))
    fast = list(pf.train_batches(epoch=0))
    assert len(plain) == len(fast)
    for a, b in zip(plain, fast):
        np.testing.assert_array_equal(a["video"], b["video"])
