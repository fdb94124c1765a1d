"""UCF101 / MSRVTT clip datasets with host-side decode.

Capability parity with the reference datasets (reference
src/datamodules/datasets/ucf101_dataset.py:20-140, msrvtt_dataset.py:21-137),
replacing torchvision ``VideoClips`` + ffmpeg with cv2 decode:

* UCF101 layout: ``{root}/{split}/ClassName/*.{avi,mp4,webm}`` filtered to a
  class subset (the reference uses a 2-class subset, ucf101_dataset.py:50-53);
* clips of ``sequence_length`` frames are indexed every
  ``frames_between_clips`` frames (the reference uses 100,
  ucf101_dataset.py:63) with a pickled metadata cache;
* decode happens on demand; frames are resized (bilinear shorter side) and
  center-cropped to ``resolution`` as uint8 on host — the float conversion
  and ImageNet normalization run on device (data/preprocess.py);
* short clips are temporally repeated to ``sequence_length`` (the reference
  repeat-interleaves to 16 with a buggy ``shape[2]`` check,
  ucf101_dataset.py:93-96 — here the check is on the actual frame axis);
* MSRVTT: captions from ``train_val_videodatainfo.json``, random caption per
  item, first quarter of each split's videos (msrvtt_dataset.py:51-70).

Frame conditioning: the reference attaches ResNet50 first-frame features
(ucf101_dataset.py:45-47). :class:`ResNetFrameFeatures` reproduces this with
the flax ResNet50 (models/resnet.py) + torchvision-weight converter
(convert/torch_resnet.py); pass ``frame_features="resnet50"`` (optionally
with ``resnet50_weights=<torchvision .pth>``). The default stays the cheap
8x8 thumbnail stand-in (``frame_features="thumbnail"``) because pretrained
weights cannot be downloaded in this environment. Note the committed
reference feeds the frame through the FULL network (1000-d logits) and
double-normalizes; we implement the intended 2048-d feature extraction —
divergence documented in PARITY.md.
"""
from __future__ import annotations

import json
import pickle
import random
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Sequence

import numpy as np

from ..utils.logging import get_logger
from .synthetic import collate

log = get_logger(__name__)

__all__ = ["VideoClipIndex", "UCF101DataModule", "MSRVTTDataModule",
           "UCF_CLASS_SUBSET", "ResNetFrameFeatures",
           "make_frame_features_fn"]

# reference ucf101_dataset.py:50-53 (full 50-class list is commented there)
UCF_CLASS_SUBSET = ("BreastStroke", "BaseballPitch")
VIDEO_EXTS = (".avi", ".mp4", ".webm")


def _probe_frames(path: Path) -> int:
    import cv2
    cap = cv2.VideoCapture(str(path))
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def _decode_clip(path: Path, start: int, num_frames: int) -> np.ndarray:
    """-> (T, H, W, 3) RGB uint8 (may return fewer frames near EOF)."""
    import cv2
    cap = cv2.VideoCapture(str(path))
    try:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        for _ in range(num_frames):
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if not frames:
            raise IOError(f"failed to decode {path} @ frame {start}")
        return np.stack(frames)
    finally:
        cap.release()


def _resize_center_crop_u8(video: np.ndarray, resolution: int) -> np.ndarray:
    import cv2
    t, h, w, _ = video.shape
    scale = resolution / min(h, w)
    nh, nw = max(int(round(h * scale)), resolution), \
        max(int(round(w * scale)), resolution)
    out = np.empty((t, nh, nw, 3), np.uint8)
    for i in range(t):
        out[i] = cv2.resize(video[i], (nw, nh),
                            interpolation=cv2.INTER_LINEAR)
    top, left = (nh - resolution) // 2, (nw - resolution) // 2
    return out[:, top:top + resolution, left:left + resolution]


@dataclass
class VideoClipIndex:
    """torchvision-VideoClips equivalent: (file, start_frame) clip table with
    an on-disk metadata cache (ucf101_dataset.py:61-69)."""
    files: Sequence[Path]
    sequence_length: int
    frames_between_clips: int = 100
    cache_path: Path | None = None

    clips: list[tuple[int, int]] = field(default_factory=list)

    def __post_init__(self):
        meta = None
        if self.cache_path and Path(self.cache_path).exists():
            try:
                with open(self.cache_path, "rb") as f:
                    meta = pickle.load(f)
                if meta.get("files") != [str(f) for f in self.files] or \
                        meta.get("seq") != self.sequence_length:
                    meta = None
            except Exception:
                meta = None
        if meta is None:
            counts = [_probe_frames(f) for f in self.files]
            meta = {"files": [str(f) for f in self.files],
                    "seq": self.sequence_length, "counts": counts}
            if self.cache_path:
                Path(self.cache_path).parent.mkdir(parents=True,
                                                   exist_ok=True)
                with open(self.cache_path, "wb") as f:
                    pickle.dump(meta, f)
        for fi, count in enumerate(meta["counts"]):
            if count <= 0:
                continue
            starts = range(0, max(count - self.sequence_length, 0) + 1,
                           self.frames_between_clips)
            for s in starts:
                self.clips.append((fi, s))

    def __len__(self) -> int:
        return len(self.clips)

    def get_clip(self, idx: int) -> tuple[np.ndarray, Path]:
        fi, start = self.clips[idx]
        path = Path(self.files[fi])
        return _decode_clip(path, start, self.sequence_length), path


def _default_frame_features(first_frame: np.ndarray) -> np.ndarray:
    """8x8 mean-pooled RGB thumbnail of the first frame -> (192,) float32."""
    import cv2
    thumb = cv2.resize(first_frame, (8, 8), interpolation=cv2.INTER_AREA)
    return (thumb.astype(np.float32) / 255.0).reshape(-1)


class ResNetFrameFeatures:
    """Real start-frame features: flax ResNet50 over the first frame
    (reference ucf101_dataset.py:45-47, 89-91) -> (2048,) float32.

    With ``weights_path`` pointing at a torchvision resnet50 ``.pth`` the
    features match the reference's IMAGENET1K_V2 backbone; without it the
    backbone is randomly initialized (relative features only).
    """

    def __init__(self, weights_path: str | None = None,
                 variables: dict | None = None, seed: int = 0):
        import jax
        import jax.numpy as jnp

        from ..models.resnet import ResNet50, preprocess_imagenet_v2

        self.model = ResNet50()
        if variables is None:
            if weights_path:
                from ..convert.torch_resnet import convert_resnet50_file
                variables = convert_resnet50_file(weights_path)
            else:
                log.warning("ResNetFrameFeatures: no torchvision weights; "
                            "random ResNet50 init (relative features only)")
                dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
                variables = self.model.init(jax.random.key(seed), dummy)
        self.variables = variables
        model = self.model

        @jax.jit
        def run(v, frame_u8):
            x = preprocess_imagenet_v2(frame_u8)
            return model.apply(v, x, features_only=True)

        self._run = run
        self._jnp = jnp

    def __call__(self, first_frame: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> (2048,) float32."""
        out = self._run(self.variables, self._jnp.asarray(first_frame)[None])
        return np.asarray(out)[0]


def make_frame_features_fn(kind: str = "thumbnail",
                           weights_path: str | None = None) -> Callable:
    if kind == "thumbnail":
        return _default_frame_features
    if kind == "resnet50":
        return ResNetFrameFeatures(weights_path=weights_path)
    raise ValueError(f"unknown frame_features kind {kind!r}")


class _BaseVideoDataModule:
    """Shared batching for file-backed video datasets."""

    def __init__(self, batch_size: int, seed: int = 0):
        self.batch_size = batch_size
        self.seed = seed

    def _items(self, split: str) -> list:
        raise NotImplementedError

    def _get(self, split: str, idx: int) -> dict:
        raise NotImplementedError

    def _batches(self, split: str, shuffle: bool, epoch: int):
        n = len(self._items(split))
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(self.seed + 1000 + epoch).shuffle(order)
        bs = self.batch_size
        for s in range(0, n - bs + 1, bs):
            yield collate([self._get(split, int(j))
                           for j in order[s:s + bs]])

    def train_batches(self, epoch: int = 0):
        return self._batches("train", True, epoch)

    def val_batches(self, epoch: int = 0):
        return self._batches("val", False, epoch)

    def test_batches(self, epoch: int = 0):
        # the reference has no separate test dir; val doubles as test
        return self._batches("test" if self._has_split("test") else "val",
                             False, epoch)

    def _has_split(self, split: str) -> bool:
        try:
            return len(self._items(split)) > 0
        except Exception:
            return False

    def steps_per_epoch(self) -> int:
        return len(self._items("train")) // self.batch_size


class UCF101DataModule(_BaseVideoDataModule):
    def __init__(self, data_folder: str, sequence_length: int = 4,
                 resolution: int = 128, batch_size: int = 32,
                 classes: Sequence[str] = UCF_CLASS_SUBSET,
                 frames_between_clips: int = 100, tiny: bool = False,
                 frame_features_fn: Callable | None = None,
                 frame_features: str = "thumbnail",
                 resnet50_weights: str | None = None,
                 seed: int = 0, **_):
        super().__init__(batch_size, seed)
        self.root = Path(data_folder)
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.classes = tuple(classes)
        self.class_to_label = {c: i for i, c in enumerate(self.classes)}
        self.frames_between_clips = frames_between_clips
        self.tiny = tiny
        self.frame_features_fn = frame_features_fn or make_frame_features_fn(
            frame_features, resnet50_weights)
        self._indices: dict[str, VideoClipIndex] = {}
        self._files: dict[str, list[Path]] = {}

    @property
    def nclasses(self) -> int:
        return len(self.classes)

    def _index(self, split: str) -> VideoClipIndex:
        if split not in self._indices:
            files = []
            for cls in self.classes:
                d = self.root / split / cls
                if d.is_dir():
                    files += sorted(p for p in d.iterdir()
                                    if p.suffix.lower() in VIDEO_EXTS)
            if self.tiny:
                files = files[:4]
            if not files:
                raise FileNotFoundError(
                    f"no videos for classes {self.classes} under "
                    f"{self.root / split}")
            self._files[split] = files
            self._indices[split] = VideoClipIndex(
                files, self.sequence_length, self.frames_between_clips,
                cache_path=self.root / f".clip_cache_{split}.pkl")
        return self._indices[split]

    def _items(self, split: str):
        return self._index(split).clips

    def _get(self, split: str, idx: int) -> dict:
        clip, path = self._index(split).get_clip(idx)
        orig_len = clip.shape[0]
        clip = _resize_center_crop_u8(clip, self.resolution)
        # temporal repeat to sequence_length (intended behavior of
        # ucf101_dataset.py:93-96, which checks shape[2] — a latent bug)
        if clip.shape[0] < self.sequence_length:
            reps = -(-self.sequence_length // clip.shape[0])
            clip = np.repeat(clip, reps, axis=0)[: self.sequence_length]
        cls = path.parent.name
        return dict(video=clip, label=self.class_to_label.get(cls, 0),
                    text=cls, length=self.sequence_length,
                    orig_length=orig_len,
                    frame=self.frame_features_fn(clip[0]))


class MSRVTTDataModule(_BaseVideoDataModule):
    def __init__(self, data_folder: str, sequence_length: int = 4,
                 resolution: int = 128, batch_size: int = 32,
                 frames_between_clips: int = 100, tiny: bool = False,
                 fraction: float = 0.25, seed: int = 0, **_):
        super().__init__(batch_size, seed)
        self.root = Path(data_folder)
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.frames_between_clips = frames_between_clips
        self.tiny = tiny
        self.fraction = fraction  # first 1/4 of videos (msrvtt_dataset.py:70)
        self._indices: dict[str, VideoClipIndex] = {}
        self._captions: dict[str, list[str]] | None = None

    nclasses = 1

    def _load_captions(self) -> dict[str, list[str]]:
        if self._captions is None:
            ann = self.root / "train_val_videodatainfo.json"
            with open(ann) as f:
                data = json.load(f)
            caps: dict[str, list[str]] = {}
            for s in data.get("sentences", []):
                caps.setdefault(s["video_id"], []).append(s["caption"])
            self._captions = caps
        return self._captions

    def _index(self, split: str) -> VideoClipIndex:
        if split not in self._indices:
            d = self.root / ("TrainValVideo" if (self.root /
                             "TrainValVideo").is_dir() else split)
            files = sorted(p for p in d.iterdir()
                           if p.suffix.lower() in VIDEO_EXTS)
            files = files[: max(int(len(files) * self.fraction), 1)]
            if self.tiny:
                files = files[:4]
            if split == "val":
                files = files[-max(len(files) // 10, 1):]
            elif split == "train":
                files = files[: -max(len(files) // 10, 1)] or files
            self._indices[split] = VideoClipIndex(
                files, self.sequence_length, self.frames_between_clips,
                cache_path=self.root / f".clip_cache_{split}.pkl")
        return self._indices[split]

    def _items(self, split: str):
        return self._index(split).clips

    def _get(self, split: str, idx: int) -> dict:
        clip, path = self._index(split).get_clip(idx)
        orig_len = clip.shape[0]
        clip = _resize_center_crop_u8(clip, self.resolution)
        if clip.shape[0] < self.sequence_length:
            reps = -(-self.sequence_length // clip.shape[0])
            clip = np.repeat(clip, reps, axis=0)[: self.sequence_length]
        caps = self._load_captions().get(path.stem, ["a video"])
        rng = random.Random(self.seed * 100003 + idx)
        return dict(video=clip, label=0, text=rng.choice(caps),
                    length=self.sequence_length, orig_length=orig_len)
