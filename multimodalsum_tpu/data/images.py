"""Image loading and augmentation (reference ``src/data_utils.py:7-65``)
without torchvision: PIL + numpy, emitting TPU-native NHWC float32.

Train transforms mirror torchvision semantics: RandomResizedCrop(224)
(scale 0.08-1.0, ratio 3/4-4/3), RandomRotation(±5°), RandomHorizontalFlip,
ColorJitter(brightness/contrast/saturation 0.3, hue 0.1), ImageNet
normalisation. Eval: Resize(shorter side → 224, bilinear) + CenterCrop(224)
+ normalisation — deterministic and numerically equivalent to the reference
eval path.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def load_image(path: str) -> "Image.Image":
    """reference ``image_loader`` (``src/data_utils.py:30-33``)."""
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


def _normalize(arr: np.ndarray) -> np.ndarray:
    """uint8 HWC -> normalised float32 HWC."""
    return (arr.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def center_crop_uint8(img, size: int = 224) -> np.ndarray:
    """Eval resize/crop WITHOUT normalisation: uint8 HWC. Split out so the
    eval harness can ship 4x-smaller uint8 tensors to the device and
    normalise there — host->device bandwidth, not PIL, bounded the r3 gate
    (the float32 image batch is ~6 MB/row; see eval/harness.py)."""
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                     Image.BILINEAR)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    return np.asarray(img.crop((left, top, left + size, top + size)))


def center_crop_transform(img, size: int = 224) -> np.ndarray:
    """Eval path: resize shorter side to ``size``, center crop (reference
    ``test_img_transforms``)."""
    return _normalize(center_crop_uint8(img, size))


def _random_resized_crop(img, rng, size=224, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(math.log(ratio[0]), math.log(ratio[1]))
        ar = math.exp(log_r)
        cw = int(round(math.sqrt(target * ar)))
        ch = int(round(math.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.integers(0, w - cw + 1)
            top = rng.integers(0, h - ch + 1)
            return img.crop((left, top, left + cw, top + ch)).resize((size, size), Image.BILINEAR)
    # fallback: center crop of the largest valid region
    side = min(w, h)
    left, top = (w - side) // 2, (h - side) // 2
    return img.crop((left, top, left + side, top + side)).resize((size, size), Image.BILINEAR)


def _color_jitter(arr: np.ndarray, rng, brightness=0.3, contrast=0.3,
                  saturation=0.3, hue=0.1) -> np.ndarray:
    """float HWC in [0,1]; factor order randomised like torchvision."""
    ops = list(range(4))
    rng.shuffle(ops)
    for op in ops:
        if op == 0 and brightness > 0:
            arr = arr * rng.uniform(1 - brightness, 1 + brightness)
        elif op == 1 and contrast > 0:
            mean = arr.mean(axis=(0, 1), keepdims=True).mean()
            arr = (arr - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
        elif op == 2 and saturation > 0:
            gray = arr @ np.asarray([0.299, 0.587, 0.114], np.float32)
            f = rng.uniform(1 - saturation, 1 + saturation)
            arr = arr * f + gray[..., None] * (1 - f)
        elif op == 3 and hue > 0:
            # cheap hue rotation in YIQ space
            theta = rng.uniform(-hue, hue) * 2 * math.pi
            c, s = math.cos(theta), math.sin(theta)
            yiq = arr @ _RGB2YIQ.T
            rot = np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
            arr = (yiq @ rot.T) @ _YIQ2RGB.T
        arr = np.clip(arr, 0.0, 1.0)
    return arr


_RGB2YIQ = np.asarray(
    [[0.299, 0.587, 0.114], [0.5959, -0.2746, -0.3213], [0.2115, -0.5227, 0.3112]],
    np.float32,
)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


def _train_augment(img, rng: np.random.Generator, size: int = 224) -> np.ndarray:
    """Crop/rotate/flip/jitter → float32 HWC in [0,1] (pre-normalisation)."""
    img = _random_resized_crop(img, rng, size)
    angle = rng.uniform(-5, 5)
    img = img.rotate(angle, Image.NEAREST)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img).astype(np.float32) / 255.0
    return _color_jitter(arr, rng)


def train_transform(img, rng: np.random.Generator, size: int = 224) -> np.ndarray:
    return ((_train_augment(img, rng, size) - IMAGENET_MEAN)
            / IMAGENET_STD).astype(np.float32)


def train_transform_uint8(img, rng: np.random.Generator, size: int = 224) -> np.ndarray:
    """Augment, then RE-QUANTISE to uint8 (pre-normalisation). Every byte
    shipped host->device leaks host RAM on the remote-device tunnel
    (measured 1:1, size-proportional — a 200-epoch stage-3 run was
    OOM-killed at 130 GB RSS by its float32 image batches), so train images
    ship as uint8 and are normalised on device. The crop/jitter sub-level
    precision lost to rounding is ±1/510 on values the augmentation just
    randomised — noise on noise."""
    arr = _train_augment(img, rng, size)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def stack_images(
    paths: Sequence[str], max_imgs: int, *,
    train: bool = False, rng: Optional[np.random.Generator] = None, size: int = 224,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load/transform up to ``max_imgs`` photos, zero-pad, return
    (images [max_imgs, H, W, 3] NHWC, mask [max_imgs]) — reference
    ``img_processing`` (``src/data_utils.py:54-65``)."""
    imgs: List[np.ndarray] = []
    for p in paths[:max_imgs]:
        pil = load_image(p)
        imgs.append(train_transform(pil, rng, size) if train else center_crop_transform(pil, size))
    n = len(imgs)
    out = np.zeros((max_imgs, size, size, 3), np.float32)
    if n:
        out[:n] = np.stack(imgs)
    mask = np.zeros((max_imgs,), bool)
    mask[:n] = True
    return out, mask


def stack_images_uint8(
    paths: Sequence[str], max_imgs: int, *,
    train: bool = False, rng: Optional[np.random.Generator] = None, size: int = 224,
) -> Tuple[np.ndarray, np.ndarray]:
    """:func:`stack_images` variant emitting uint8 (pre-normalisation)
    tensors — 4x less host->device traffic; normalise on device with the
    same formula (``(x/255 - mean)/std``, then zero the masked rows so
    padding matches the host path's exact 0.0). ``train=True`` applies the
    full augmentation chain before re-quantising
    (:func:`train_transform_uint8`)."""
    imgs: List[np.ndarray] = []
    for p in paths[:max_imgs]:
        pil = load_image(p)
        imgs.append(train_transform_uint8(pil, rng, size) if train
                    else center_crop_uint8(pil, size))
    n = len(imgs)
    out = np.zeros((max_imgs, size, size, 3), np.uint8)
    if n:
        out[:n] = np.stack(imgs)
    mask = np.zeros((max_imgs,), bool)
    mask[:n] = True
    return out, mask


def photo_paths(data_root: str, dataset: str, photo_ids: Sequence[str]) -> List[str]:
    """reference photo path contract (``data/<ds>/raw_others/photos/<id>.jpg``)."""
    return [
        os.path.join(data_root, dataset, "raw_others", "photos", f"{pid}.jpg")
        for pid in photo_ids
    ]
