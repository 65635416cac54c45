"""Numeric LPIPS parity against a torch re-statement (VERDICT r3 item 5).

The reference computes LPIPS(squeeze) through torchmetrics
(/root/reference/MirrorFusion/metrics/metrics.py:201-204), whose forward is
the richzhang/PerceptualSimilarity math over torchvision's SqueezeNet-1.1
feature trunk.  torchmetrics itself is not in this image, but torch IS — so
this test re-states that exact forward in ~60 lines of torch (same trunk,
same ceil_mode=True maxpools, same unit-normalize / squared-diff / 1x1-lin /
spatial-mean / tap-sum), runs it over SYNTHETIC weights, pushes the same
weights (in the richzhang state-dict layout) through
`load_torch_lpips_state` -> `metrics/lpips.py::LPIPS`, and asserts numeric
equality.  A transposed conv kernel, a wrong tap, a padding mismatch, or a
maxpool off-by-one all fail this test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reflecting_reality_tpu.metrics.lpips import (  # noqa: E402
    LPIPS, load_torch_lpips_state,
)

# (fire_index, in_ch, squeeze, expand) for squeezenet1_1 features
_FIRES = [(3, 64, 16, 64), (4, 128, 16, 64),
          (6, 128, 32, 128), (7, 256, 32, 128),
          (9, 256, 48, 192), (10, 384, 48, 192),
          (11, 384, 64, 256), (12, 512, 64, 256)]
_TAP_AFTER = {1, 4, 7, 9, 10, 11, 12}  # feature indices after which LPIPS taps
_LIN_CH = (64, 128, 256, 384, 384, 512, 512)


class _TorchFire(tnn.Module):
    def __init__(self, cin, squeeze, expand):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = tnn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = tnn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = torch.relu(self.squeeze(x))
        return torch.relu(torch.cat(
            [self.expand1x1(s), self.expand3x3(s)], dim=1))


class _TorchLPIPSSqueeze(tnn.Module):
    """torchmetrics LPIPS(net_type='squeeze') forward, re-stated."""

    def __init__(self):
        super().__init__()
        feats = {0: tnn.Conv2d(3, 64, 3, stride=2)}  # NO padding
        for idx, cin, sq, ex in _FIRES:
            feats[idx] = _TorchFire(cin, sq, ex)
        self.features = tnn.ModuleDict({str(k): v for k, v in feats.items()})
        self.lins = tnn.ModuleList(
            [tnn.Conv2d(c, 1, 1, bias=False) for c in _LIN_CH])
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _trunk(self, x):
        taps = []
        pool = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
        x = torch.relu(self.features["0"](x))
        taps.append(x)
        for idx in (3, 4, 6, 7, 9, 10, 11, 12):
            if idx in (3, 6, 9):
                x = pool(x)
            x = self.features[str(idx)](x)
            if idx in (4, 7, 9, 10, 11, 12):
                taps.append(x)
        return taps

    def forward(self, a, b):
        fa = self._trunk((a - self.shift) / self.scale)
        fb = self._trunk((b - self.shift) / self.scale)
        total = 0.0
        for ta, tb, lin in zip(fa, fb, self.lins):
            na = ta / torch.sqrt((ta ** 2).sum(1, keepdim=True) + 1e-10)
            nb = tb / torch.sqrt((tb ** 2).sum(1, keepdim=True) + 1e-10)
            total = total + lin((na - nb) ** 2).mean(dim=(2, 3))
        return total.mean()

    def richzhang_state(self):
        """State dict in the richzhang layout load_torch_lpips_state eats."""
        state = {}
        for k, v in self.features.state_dict().items():
            state[f"net.features.{k}"] = v
        for i, lin in enumerate(self.lins):
            state[f"lin{i}.model.1.weight"] = lin.weight
        return {k: v.detach() for k, v in state.items()}


@pytest.mark.parametrize("size", [64, 67])  # even AND odd spatial dims
def test_lpips_matches_torch_restatement(size):
    torch.manual_seed(0)
    ref = _TorchLPIPSSqueeze().eval()
    # non-negative lin heads, like the real checkpoint
    with torch.no_grad():
        for lin in ref.lins:
            lin.weight.abs_()

    rs = np.random.RandomState(1)
    a = rs.uniform(-1, 1, (2, 3, size, size)).astype(np.float32)
    b = rs.uniform(-1, 1, (2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = float(ref(torch.from_numpy(a), torch.from_numpy(b)))

    params = load_torch_lpips_state(
        {k: v.numpy() for k, v in ref.richzhang_state().items()})
    got = float(LPIPS().apply(
        params,
        np.transpose(a, (0, 2, 3, 1)),
        np.transpose(b, (0, 2, 3, 1)),
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_lpips_zero_for_identical_inputs():
    torch.manual_seed(0)
    ref = _TorchLPIPSSqueeze().eval()
    params = load_torch_lpips_state(
        {k: v.numpy() for k, v in ref.richzhang_state().items()})
    a = np.random.RandomState(2).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert abs(float(LPIPS().apply(params, a, a))) < 1e-6
