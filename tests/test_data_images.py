"""Image transform and comm-wrapper tests."""

import numpy as np
import pytest


@pytest.fixture()
def pil_image():
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    return Image.fromarray((rng.random((300, 420, 3)) * 255).astype(np.uint8))


def test_center_crop_deterministic(pil_image):
    from multimodalsum_tpu.data.images import center_crop_transform

    a = center_crop_transform(pil_image)
    b = center_crop_transform(pil_image)
    assert a.shape == (224, 224, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    # ImageNet normalisation: roughly zero-mean for uniform noise
    assert abs(a.mean()) < 2.0


def test_train_transform_shapes_and_randomness(pil_image):
    from multimodalsum_tpu.data.images import train_transform

    a = train_transform(pil_image, np.random.default_rng(1))
    b = train_transform(pil_image, np.random.default_rng(2))
    assert a.shape == b.shape == (224, 224, 3)
    assert not np.array_equal(a, b)  # augmentation is random
    c = train_transform(pil_image, np.random.default_rng(1))
    np.testing.assert_array_equal(a, c)  # but seeded-reproducible


def test_stack_images_padding(pil_image, tmp_path):
    from multimodalsum_tpu.data.images import stack_images

    p = tmp_path / "img.jpg"
    pil_image.save(p)
    imgs, mask = stack_images([str(p), str(p)], max_imgs=5)
    assert imgs.shape == (5, 224, 224, 3)
    np.testing.assert_array_equal(mask, [True, True, False, False, False])
    assert (imgs[2:] == 0).all()
    imgs0, mask0 = stack_images([], max_imgs=3)
    assert (imgs0 == 0).all() and not mask0.any()


def test_comm_wrappers_on_mesh():
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from multimodalsum_tpu.parallel.comm import all_gather, pmean, psum
    from multimodalsum_tpu.parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh()
    n = mesh.shape[DATA_AXIS]
    x = np.arange(n * 2, dtype=np.float32).reshape(n, 2)

    def f(x):
        return pmean(x, DATA_AXIS), psum(x, DATA_AXIS), all_gather(x, DATA_AXIS)

    mean, total, gathered = jax.jit(shard_map(
        f, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=(P(), P(), P()),
        check_rep=False,  # the rep checker can't see through tiled all_gather
    ))(x)
    np.testing.assert_allclose(np.asarray(mean)[0], x.mean(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(total)[0], x.sum(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gathered), x, rtol=1e-6)


def test_uint8_device_normalize_matches_host(pil_image, tmp_path):
    """The eval fast path ships uint8 crops and normalises on device
    (eval/harness.normalize_images); result must match the host float path
    (stack_images train=False) to float tolerance, with masked rows exactly
    0.0 like the host zero-padding."""
    import jax.numpy as jnp

    from multimodalsum_tpu.data.images import stack_images, stack_images_uint8
    from multimodalsum_tpu.eval.harness import normalize_images

    p = str(tmp_path / "img.jpg")
    pil_image.save(p)
    host_img, host_mask = stack_images([p, p], 4, train=False)
    u8_img, u8_mask = stack_images_uint8([p, p], 4)
    np.testing.assert_array_equal(host_mask, u8_mask)
    assert u8_img.dtype == np.uint8

    dev = np.asarray(normalize_images(jnp.asarray(u8_img)[None],
                                      jnp.asarray(u8_mask)[None]))[0]
    np.testing.assert_allclose(dev, host_img, atol=2e-6)
    # padding exactly zero (host writes literal zeros there)
    np.testing.assert_array_equal(dev[2:], np.zeros_like(dev[2:]))




def test_uint8_train_path_matches_float_within_quantization(pil_image, tmp_path):
    """The TRAIN loader default ships augmented uint8 crops (host RAM leaks
    per H2D byte on the remote-device tunnel — see ops/images.py) which
    ``MultimodalSum.encode_img`` normalises on device. Same augmentation
    seed through both paths must agree to uint8 quantization tolerance
    (±0.5/255 pre-normalisation, /std post), masked rows exactly 0.0."""
    import jax.numpy as jnp

    from multimodalsum_tpu.data.images import (
        IMAGENET_STD, stack_images, stack_images_uint8,
    )
    from multimodalsum_tpu.ops.images import normalize_uint8_images

    p = str(tmp_path / "img.jpg")
    pil_image.save(p)
    f_img, f_mask = stack_images([p, p], 3, train=True,
                                 rng=np.random.default_rng(7))
    u_img, u_mask = stack_images_uint8([p, p], 3, train=True,
                                       rng=np.random.default_rng(7))
    np.testing.assert_array_equal(f_mask, u_mask)
    assert u_img.dtype == np.uint8

    dev = np.asarray(normalize_uint8_images(jnp.asarray(u_img)[None],
                                            jnp.asarray(u_mask)[None]))[0]
    # jitter output is clipped to [0,1] before re-quantisation, so the
    # worst-case error is half a uint8 level scaled by 1/std
    atol = 0.5 / 255.0 / float(IMAGENET_STD.min()) + 1e-5
    np.testing.assert_allclose(dev[:2], f_img[:2], atol=atol)
    np.testing.assert_array_equal(dev[2:], np.zeros_like(dev[2:]))
