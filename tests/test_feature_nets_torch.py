"""Value-level checks of the perceptual feature nets vs torch.

Round-2 verdict: the AlexNet/VGG16 converters were tested for shape and
invertibility only — numerical equivalence vs the torch nets was open. Here
the torchvision `features` layouts are rebuilt in torch (torch IS in-image;
torchvision's pretrained weights are not, and random weights exercise the
converter identically), run on fixed inputs, and the flax modules fed the
CONVERTED state dicts must reproduce every tap to float tolerance. The
LPIPS head formula (unit-normalize, squared diff, |w| 1x1 head, spatial
mean, stage sum — the published algorithm) is cross-checked end to end.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dc_vic_tpu.metrics.feature_nets import (  # noqa: E402
    LPIPS,
    AlexNetFeatures,
    VGG16Features,
    convert_alexnet_lpips,
    convert_vgg16_features,
    lpips_normalize,
)


def _torch_alexnet_features():
    """torchvision.models.alexnet().features layout (indices 0..12)."""
    import torch.nn as tnn
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )


def _torch_vgg16_features():
    """torchvision.models.vgg16().features layout (conv at 0,2,5,...,28)."""
    import torch.nn as tnn
    layers, in_ch = [], 3
    for ch, reps in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
        for _ in range(reps):
            layers += [tnn.Conv2d(in_ch, ch, 3, padding=1), tnn.ReLU()]
            in_ch = ch
        layers += [tnn.MaxPool2d(2, 2)]
    return tnn.Sequential(*layers)


def _taps(seq, x, relu_indices):
    out = []
    with torch.no_grad():
        for i, layer in enumerate(seq):
            x = layer(x)
            if i in relu_indices:
                out.append(x.permute(0, 2, 3, 1).numpy())
    return out


@pytest.mark.parametrize("seed", [0])
def test_alexnet_features_match_torch(seed):
    torch.manual_seed(seed)
    seq = _torch_alexnet_features()
    sd = {f"features.{k}": v for k, v in seq.state_dict().items()}
    params = convert_alexnet_lpips(
        {**sd, **{f"lin{i}.model.1.weight": np.ones((1, 1, 1, 1), np.float32)
                  for i in range(5)}})["params"]["backbone"]
    x = np.random.default_rng(seed).standard_normal((2, 3, 64, 64)) \
        .astype(np.float32)
    want = _taps(seq, torch.from_numpy(x), relu_indices=(1, 4, 7, 9, 11))
    got = AlexNetFeatures().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4,
                                   err_msg=f"alexnet tap {i}")


@pytest.mark.parametrize("seed", [1])
def test_vgg16_features_match_torch(seed):
    torch.manual_seed(seed)
    seq = _torch_vgg16_features()
    sd = {f"features.{k}": v.numpy() for k, v in seq.state_dict().items()}
    params = convert_vgg16_features(sd)
    x = np.random.default_rng(seed).standard_normal((1, 3, 64, 64)) \
        .astype(np.float32) * 0.5
    # relu taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    want = _taps(seq, torch.from_numpy(x),
                 relu_indices=(3, 8, 15, 22, 29))
    got = VGG16Features().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4,
                                   err_msg=f"vgg16 tap {i}")


def test_lpips_alex_formula_matches_torch_reference():
    """Full LPIPS pipeline vs an independent torch implementation of the
    published formula (normalize -> backbone taps -> unit-normalize ->
    squared diff -> |w| head -> spatial mean -> sum over stages)."""
    torch.manual_seed(2)
    seq = _torch_alexnet_features()
    lins = [torch.rand(1, c, 1, 1) for c in (64, 192, 384, 256, 256)]
    sd = {f"net.features.{k}": v for k, v in seq.state_dict().items()}
    for i, w in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = w
    params = convert_alexnet_lpips(sd)

    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)

    # torch reference, straight from the published lpips forward
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        return _taps(seq, (torch.from_numpy(x) - shift) / scale,
                     relu_indices=(1, 4, 7, 9, 11))

    want = np.zeros(2, np.float32)
    for i, (fa, fb) in enumerate(zip(taps(a), taps(b))):
        na = fa / np.sqrt((fa ** 2).sum(-1, keepdims=True) + 1e-10)
        nb = fb / np.sqrt((fb ** 2).sum(-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        w = np.abs(lins[i].numpy().reshape(-1))
        want += (d * w).sum(-1).mean((1, 2))

    got = np.asarray(LPIPS(net="alex").apply(
        params, jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)