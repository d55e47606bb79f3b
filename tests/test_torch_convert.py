"""Weight-conversion roundtrips: build torch modules with torchvision-style
state_dict naming (pure torch, no torchvision needed), convert into our
params, and check output parity."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import FP32_POLICY
from megaportraits_tpu.utils import torch_convert as tc

RNG = np.random.default_rng(5)
KEY = jax.random.PRNGKey(0)


def _torch_vgg19_features():
    """torchvision vgg19 'features' layout: conv/relu with maxpools."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


def test_vgg19_conversion_roundtrip():
    from megaportraits_tpu.losses.perceptual import VGG, VGG19_REFERENCE_TAPS

    torch_net = _torch_vgg19_features().eval()
    sd = {f"features.{k}": v for k, v in torch_net.state_dict().items()}
    params = tc.convert_vgg_features(sd, "vgg19")

    ours = VGG(cfg="vgg19", taps=VGG19_REFERENCE_TAPS, policy=FP32_POLICY)
    x = RNG.random((1, 64, 64, 3)).astype(np.float32)
    init_params = ours.init(KEY, jnp.asarray(x))["params"]
    merged = tc.merge_params(init_params, params)
    taps = ours.apply({"params": merged}, jnp.asarray(x))

    # torch forward capturing the reference tap indices [1,6,11,20,29].
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    torch_taps = []
    with torch.no_grad():
        h = xt
        for i, layer in enumerate(torch_net):
            h = layer(h)
            if i in (1, 6, 11, 20, 29):
                torch_taps.append(h)
    for got, ref in zip(taps, torch_taps):
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4
        )


def test_resnet18_conversion_roundtrip():
    from megaportraits_tpu.models.resnet import ResNet18

    # Minimal torch resnet18 with torchvision naming.
    class BasicBlock(nn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(out)
            self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, out, 1, stride, bias=False),
                    nn.BatchNorm2d(out),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = torch.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return torch.relu(h + idt)

    class TorchResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths = [64, 128, 256, 512]
            for s, w in enumerate(widths):
                blocks = [
                    BasicBlock(widths[max(s - 1, 0)] if s else 64, w,
                               stride=1 if s == 0 else 2),
                    BasicBlock(w, w),
                ]
                setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
            self.fc = nn.Linear(512, 6)

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            for s in range(4):
                x = getattr(self, f"layer{s + 1}")(x)
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    torch_net = TorchResNet18().eval()
    # Randomize BN stats so the test is not trivially passing on zeros.
    with torch.no_grad():
        for m in torch_net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params, stats = tc.convert_torchvision_resnet(
        torch_net.state_dict(), layers=(2, 2, 2, 2), bottleneck=False
    )
    ours = ResNet18(num_classes=6, policy=FP32_POLICY)
    x = RNG.random((1, 64, 64, 3)).astype(np.float32)
    variables = ours.init(KEY, jnp.asarray(x))
    merged_params = tc.merge_params(variables["params"], params)
    merged_stats = tc.merge_params(variables["batch_stats"], stats)
    got = ours.apply(
        {"params": merged_params, "batch_stats": merged_stats},
        jnp.asarray(x),
    )
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-4)
