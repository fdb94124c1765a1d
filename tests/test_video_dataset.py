"""UCF101/MSRVTT data layer against real (tiny, generated) video files."""
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gif_synthesis_with_discrete_diffusion_tpu.data.video_dataset import (
    MSRVTTDataModule, UCF101DataModule, VideoClipIndex)


def _write_video(path, n_frames=12, size=32, seed=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, 8.0, (size, size))
    rng = np.random.default_rng(seed)
    for i in range(n_frames):
        frame = np.full((size, size, 3), i * 10 % 255, np.uint8)
        frame[: size // 2] = rng.integers(0, 255, 3, dtype=np.uint8)
        w.write(frame)
    w.release()
    assert path.exists() and path.stat().st_size > 0


@pytest.fixture()
def ucf_root(tmp_path):
    for split in ("train", "val"):
        for ci, cls in enumerate(("BreastStroke", "BaseballPitch")):
            for vi in range(2):
                _write_video(tmp_path / split / cls / f"v{vi}.mp4",
                             seed=ci * 10 + vi)
    return tmp_path


def test_ucf101_datamodule_end_to_end(ucf_root):
    dm = UCF101DataModule(str(ucf_root), sequence_length=4, resolution=16,
                          batch_size=2, frames_between_clips=8)
    batches = list(dm.train_batches(0))
    assert batches, "no batches produced"
    b = batches[0]
    assert b["video"].shape == (2, 4, 16, 16, 3)
    assert b["video"].dtype == np.uint8
    assert set(b["text"]) <= {"BreastStroke", "BaseballPitch"}
    assert b["label"].shape == (2,)
    assert b["frame"].shape == (2, 192)  # 8x8x3 thumbnail features
    # metadata cache written and reused
    assert (ucf_root / ".clip_cache_train.pkl").exists()
    dm2 = UCF101DataModule(str(ucf_root), sequence_length=4, resolution=16,
                           batch_size=2, frames_between_clips=8)
    assert len(dm2._items("train")) == len(dm._items("train"))


def test_ucf101_temporal_repeat(ucf_root):
    # sequence longer than the stored clips -> temporal repeat kicks in
    dm = UCF101DataModule(str(ucf_root), sequence_length=16, resolution=16,
                          batch_size=1, frames_between_clips=100)
    b = next(iter(dm.val_batches(0)))
    assert b["video"].shape[1] == 16


def test_clip_index_stride(ucf_root):
    files = sorted((ucf_root / "train" / "BreastStroke").glob("*.mp4"))
    idx = VideoClipIndex(files, sequence_length=4, frames_between_clips=4)
    # 12 frames, clips at starts 0,4,8 per file
    assert len(idx) == 2 * 3
    clip, path = idx.get_clip(0)
    assert clip.shape[0] == 4 and clip.shape[-1] == 3


def test_msrvtt_datamodule(tmp_path):
    vids = tmp_path / "TrainValVideo"
    for i in range(4):
        _write_video(vids / f"video{i}.mp4", seed=i)
    ann = {"sentences": [
        {"video_id": f"video{i}", "caption": f"clip number {i}"}
        for i in range(4) for _ in range(2)]}
    (tmp_path / "train_val_videodatainfo.json").write_text(json.dumps(ann))
    dm = MSRVTTDataModule(str(tmp_path), sequence_length=4, resolution=16,
                          batch_size=1, frames_between_clips=8, fraction=1.0)
    b = next(iter(dm.train_batches(0)))
    assert b["video"].shape == (1, 4, 16, 16, 3)
    assert b["text"][0].startswith("clip number")
