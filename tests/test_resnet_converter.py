"""flax ResNet50 + torch-weight converter parity.

torchvision is not installed in this image, so the test defines a torch
twin of torchvision.models.resnet50 (standard Bottleneck ResNet-50,
identical module/state_dict naming), random-initializes it, converts the
state_dict with convert/torch_resnet.py, and asserts output parity —
the same scheme used for the VQ-VAE/I3D converters.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_resnet import (
    convert_resnet50)
from gif_synthesis_with_discrete_diffusion_tpu.models.resnet import (
    ResNet50, preprocess_imagenet_v2)


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchResNet50(tnn.Module):
    """torchvision.models.resnet50 twin (same state_dict key names)."""

    def __init__(self, layers=(3, 4, 6, 3), num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x, features_only=False):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return x if features_only else self.fc(x)


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(0)
    tm = _TorchResNet50().eval()
    # randomize BN running stats so parity covers them
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.5, 1.5)
    variables = convert_resnet50(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    return tm, ResNet50(), variables


@pytest.mark.slow  # 224px torch+flax forwards: ~25s on 1 core
def test_resnet50_logits_parity(twins):
    tm, jm, variables = twins
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resnet50_features_parity(twins):
    tm, jm, variables = twins
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                  features_only=True).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x),
                              features_only=True))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_preprocess_imagenet_v2_shapes():
    u8 = np.random.default_rng(2).integers(
        0, 256, (4, 128, 160, 3), dtype=np.uint8)
    out = np.asarray(preprocess_imagenet_v2(jnp.asarray(u8)))
    assert out.shape == (4, 224, 224, 3)
    # normalization applied: values centered near 0
    assert abs(out.mean()) < 2.0


@pytest.mark.slow  # full-res ResNet50 feature path: ~50s
def test_frame_features_fn_real_shape():
    from gif_synthesis_with_discrete_diffusion_tpu.data.video_dataset import (
        make_frame_features_fn)
    fn = make_frame_features_fn("resnet50")
    frame = np.random.default_rng(3).integers(
        0, 256, (64, 64, 3), dtype=np.uint8)
    feats = fn(frame)
    assert feats.shape == (2048,)
    assert np.isfinite(feats).all()
