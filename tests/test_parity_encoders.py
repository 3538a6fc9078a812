"""Parity of the table encoders and the ResNet image encoder vs the reference."""

import numpy as np
import pytest

from reference_oracle import require_reference


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


def _yelp_inputs(rng, bsz=3, vocab=64):
    field = rng.integers(2, vocab, (47, 6)).astype(np.int64)
    field[:, 3:] = 1
    vals = dict(
        name=rng.integers(2, vocab, (bsz, 24)).astype(np.int64),
        category=rng.integers(2, vocab, (bsz, 6, 12)).astype(np.int64),
        str_categorical=rng.integers(2, vocab, (bsz, 5, 3)).astype(np.int64),
        str_boolean=rng.integers(2, vocab, (bsz, 32, 1)).astype(np.int64),
        rating=rng.integers(0, 2, (bsz, 4)).astype(np.int64),
        hours=rng.integers(0, 2, (bsz, 7, 4)).astype(np.int64),
    )
    # null patterns: empty categories / booleans / hours for some rows
    vals["category"][0, 2:] = 1
    vals["category"][1] = 1          # batch 1: no categories at all
    vals["str_boolean"][0, 10:] = 1
    vals["hours"][2] = 0
    vals["name"][0, 12:] = 1
    return field, vals


def test_yelp_table_encoder_parity(torch_mod):
    torch = torch_mod
    from table_encoder import YelpTableEncoder as RefYelp

    from multimodalsum_tpu.ckpt.convert import yelp_table_params_from_torch
    from multimodalsum_tpu.models.table import YelpTableEncoder

    rng = np.random.default_rng(31)
    vocab, d = 64, 1024
    torch.manual_seed(31)
    emb = torch.nn.Embedding(vocab, d, padding_idx=1)
    ref = RefYelp(emb)
    ref.eval()

    field, vals = _yelp_inputs(rng, vocab=vocab)
    with torch.no_grad():
        ref_h, ref_m = ref(
            torch.from_numpy(field),
            [torch.from_numpy(vals[k]) for k in
             ("name", "category", "str_categorical", "str_boolean", "rating", "hours")],
        )

    mine = YelpTableEncoder(d_model=d)
    params = yelp_table_params_from_torch(ref.state_dict())
    h, m = mine.apply({"params": params}, field, vals, emb.weight.detach().numpy())
    np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=3e-4, rtol=3e-4)
    np.testing.assert_array_equal(np.asarray(m), ref_m.numpy())


def test_amazon_table_encoder_parity(torch_mod):
    torch = torch_mod
    from table_encoder import AmazonTableEncoder as RefAmazon

    from multimodalsum_tpu.ckpt.convert import amazon_table_params_from_torch
    from multimodalsum_tpu.models.table import AmazonTableEncoder

    rng = np.random.default_rng(32)
    vocab, d, bsz = 64, 1024, 3
    torch.manual_seed(32)
    emb = torch.nn.Embedding(vocab, d, padding_idx=1)
    ref = RefAmazon(emb)
    ref.eval()

    field = rng.integers(2, vocab, (6, 1)).astype(np.int64)
    vals = dict(
        price=rng.integers(0, 2, (bsz, 11)).astype(np.int64),
        rating=rng.integers(0, 2, (bsz, 4)).astype(np.int64),
        brand=rng.integers(2, vocab, (bsz, 12)).astype(np.int64),
        name=rng.integers(2, vocab, (bsz, 32)).astype(np.int64),
        category=rng.integers(2, vocab, (bsz, 3, 8, 12)).astype(np.int64),
        description=rng.integers(2, vocab, (bsz, 128)).astype(np.int64),
    )
    vals["price"][1] = 0          # null price
    vals["brand"][0] = 1          # null brand
    vals["category"][0, 1:] = 1
    vals["category"][2] = 1       # all-null categories
    vals["description"][1, 40:] = 1

    with torch.no_grad():
        ref_h, ref_m = ref(
            torch.from_numpy(field),
            [torch.from_numpy(vals[k]) for k in
             ("price", "rating", "brand", "name", "category", "description")],
        )

    mine = AmazonTableEncoder(d_model=d)
    params = amazon_table_params_from_torch(ref.state_dict())
    h, m = mine.apply({"params": params}, field, vals, emb.weight.detach().numpy())
    np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=3e-4, rtol=3e-4)
    np.testing.assert_array_equal(np.asarray(m), ref_m.numpy())


def test_resnet_against_torch_replica(torch_mod):
    """Build a small torch bottleneck ResNet with torchvision naming, convert
    its weights, and compare outputs (eval mode, running stats)."""
    torch = torch_mod
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
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

    class TinyResnet(tnn.Module):
        """resnet50-shaped trunk with 1 block per layer (torchvision naming)."""

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

            def make_layer(inplanes, planes, stride):
                ds = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )
                return tnn.Sequential(Bottleneck(inplanes, planes, stride, ds))

            self.layer1 = make_layer(64, 64, 1)
            self.layer2 = make_layer(256, 128, 2)
            self.layer3 = make_layer(512, 256, 2)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            x = self.layer2(x)
            x = self.layer3(x)
            return x

    torch.manual_seed(41)
    ref = TinyResnet()
    # randomize running stats so eval mode is a real test
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    ref.eval()

    rng = np.random.default_rng(42)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # [b, 1024, 4, 4]

    from multimodalsum_tpu.ckpt.convert import resnet_params_from_torch
    from multimodalsum_tpu.models.resnet import ResnetEncoder

    emb_dim = 32
    mine = ResnetEncoder(embed_dim=emb_dim, model="resnet50", stage=3)
    params, stats = resnet_params_from_torch(ref.state_dict(), prefix="")
    # trunk truncated to 1 block/layer: our resnet50 arch expects (3,4,6);
    # build a variables tree with only the blocks that exist and a random
    # projection, then compare the trunk output by inverting the projection.
    import jax
    import jax.numpy as jnp

    variables = mine.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # splice converted weights for the blocks the replica has
    p = jax.device_get(variables["params"])
    s = jax.device_get(variables["batch_stats"])
    for k, v in params.items():
        if k in p:
            p[k] = v
    for k, v in stats.items():
        if k in s:
            s[k] = v
    # identity-like projection to read the trunk output directly
    eye = np.zeros_like(np.asarray(p["linear"]["kernel"]))
    eye[:emb_dim, :emb_dim] = np.eye(emb_dim)
    p["linear"]["kernel"] = eye

    # run only the blocks the replica has: monkeypatch arch to 1 block/layer
    from multimodalsum_tpu.models import resnet as resnet_mod

    old = resnet_mod.ARCHS["resnet50"]
    resnet_mod.ARCHS["resnet50"] = dict(layers=(1, 1, 1, 1), groups=1, width_factor=1)
    try:
        got = mine.apply(
            {"params": p, "batch_stats": s}, x.transpose(0, 2, 3, 1), train=False
        )
    finally:
        resnet_mod.ARCHS["resnet50"] = old

    # want: [b, 1024, 4, 4] -> [b, 16, 1024] row-major -> first emb_dim ch
    want_seq = want.reshape(2, 1024, 16).transpose(0, 2, 1)[:, :, :emb_dim]
    np.testing.assert_allclose(np.asarray(got), want_seq, atol=2e-3, rtol=2e-3)
