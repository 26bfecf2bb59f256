"""Numeric parity of the Flax ResNet18 mel encoder vs the torch reference
architecture (torchvision resnet18 layout + projector head,
reference audio_mel/model.py:10-23).

torchvision is not installed here, so the test hand-builds a torch module
with torchvision's exact structure and state_dict naming (the standard
resnet18 topology) and compares eval-mode outputs through
convert_torch_mel_extractor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from mer_tpu.models.resnet import AudioMelFeatureExtractor, convert_torch_mel_extractor  # noqa: E402


class _BasicBlock(tnn.Module):
    """torchvision BasicBlock structure/naming (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class _ResNet18(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        self.layer2 = tnn.Sequential(_BasicBlock(64, 128, 2), _BasicBlock(128, 128))
        self.layer3 = tnn.Sequential(_BasicBlock(128, 256, 2), _BasicBlock(256, 256))
        self.layer4 = tnn.Sequential(_BasicBlock(256, 512, 2), _BasicBlock(512, 512))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


class _TorchMelExtractor(tnn.Module):
    """reference AudioMelFeatureExtractor (audio_mel/model.py:10-23)."""

    def __init__(self):
        super().__init__()
        self.resnet18 = _ResNet18()
        self.projector = tnn.Sequential(tnn.ReLU(), tnn.Linear(1000, 300))

    def forward(self, x):
        return tnn.functional.normalize(self.projector(self.resnet18(x)), p=2, dim=-1)


class TestResNetTorchParity:
    def test_eval_outputs_match(self):
        torch.manual_seed(0)
        ref = _TorchMelExtractor()
        # randomize BN running stats so the parity check exercises them too
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.6, 1.5)
        ref.eval()

        params, stats = convert_torch_mel_extractor(ref.state_dict())
        model = AudioMelFeatureExtractor(bn_mode="eval")

        rng = np.random.default_rng(0)
        x_nchw = rng.normal(size=(2, 3, 96, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x_nchw)).numpy()
        got = np.asarray(
            model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x_nchw))
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        # embeddings are L2-normalized in both
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)

    def test_converted_tree_matches_init_shapes(self):
        torch.manual_seed(1)
        ref = _TorchMelExtractor()
        params, stats = convert_torch_mel_extractor(ref.state_dict())
        model = AudioMelFeatureExtractor()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)))
        for name, tree, want_tree in [
            ("params", params, variables["params"]),
            ("batch_stats", stats, variables["batch_stats"]),
        ]:
            got = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}
            want = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_flatten_with_path(want_tree)[0]}
            assert got == want, f"{name} tree mismatch"
