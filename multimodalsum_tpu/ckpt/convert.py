"""PyTorch → Flax weight converters.

Maps reference checkpoints (``pytorch_model.bin`` state dicts of the classes
in ``src/transformer/modeling_multimodalsum.py``, ``src/table_encoder.py``,
``src/img_encoder.py``) onto this framework's parameter pytrees. Used both
for production checkpoint import and — with randomly initialised reference
models — by the activation-parity test-suite.

Only numpy is required at call time; tensors may be torch Tensors (they are
converted via ``.detach().numpy()``) or numpy arrays.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from multimodalsum_tpu.core.config import BartConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layer_norm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _attention(sd: Mapping[str, Any], prefix: str, multimodal: bool = False) -> dict:
    out = {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }
    if multimodal:
        out["alpha_proj"] = _linear(sd, f"{prefix}.alpha_proj")
        out["beta_proj"] = _linear(sd, f"{prefix}.beta_proj")
    return out


def _encoder_layer(sd, prefix: str) -> dict:
    return {
        "self_attn": _attention(sd, f"{prefix}.self_attn"),
        "self_attn_layer_norm": _layer_norm(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "final_layer_norm": _layer_norm(sd, f"{prefix}.final_layer_norm"),
    }


def _decoder_layer(sd, prefix: str, multimodal: bool) -> dict:
    out = _encoder_layer(sd, prefix)
    out["encoder_attn"] = _attention(sd, f"{prefix}.encoder_attn", multimodal=multimodal)
    out["encoder_attn_layer_norm"] = _layer_norm(sd, f"{prefix}.encoder_attn_layer_norm")
    return out


def bart_params_from_torch(
    state_dict: Mapping[str, Any],
    config: BartConfig,
    multimodal: bool = False,
    prefix: str = "model.",
) -> dict:
    """Convert a reference BART state dict to a ``BartModel`` param pytree.

    Handles the state dicts of ``BartForConditionalGeneration``,
    ``BartForEncConditionalGeneration`` and (with ``multimodal=True``)
    ``BartForMultiEncConditionalGeneration``. ``prefix`` is the key prefix in
    front of ``shared./encoder./decoder.`` — ``"model."`` for head-class
    checkpoints, ``"bart_model.model."`` inside full MultimodalSum dumps.
    """
    sd = state_dict
    p = prefix
    params: dict = {
        "shared": {"embedding": _np(sd[f"{p}shared.weight"])},
        "final_logits_bias": _np(
            sd.get(f"{p[:-len('model.')] if p.endswith('model.') else p}final_logits_bias",
                   np.zeros((1, config.vocab_size), np.float32))
        ).reshape(-1),
    }

    enc: dict = {}
    if not config.static_position_embeddings:
        enc["embed_positions"] = {"embedding": _np(sd[f"{p}encoder.embed_positions.weight"])}
    if config.normalize_embedding:
        enc["layernorm_embedding"] = _layer_norm(sd, f"{p}encoder.layernorm_embedding")
    if config.normalize_before and f"{p}encoder.layer_norm.weight" in sd:
        enc["layer_norm"] = _layer_norm(sd, f"{p}encoder.layer_norm")
    for i in range(config.encoder_layers):
        enc[f"layers_{i}"] = _encoder_layer(sd, f"{p}encoder.layers.{i}")
    params["encoder"] = enc

    key = f"{p}decoder.rating_embeddings"
    if key in sd:
        rating = _np(sd[key])
    else:
        # stock facebook/bart-large dumps lack the rating embedding (the
        # reference loads non-strictly and keeps its fresh init) — same here
        rating = (np.random.default_rng(0).normal(0.0, config.init_std,
                  (config.d_model,)).astype(np.float32))
    dec: dict = {
        "rating_embeddings": rating,
    }
    if not config.static_position_embeddings:
        dec["embed_positions"] = {"embedding": _np(sd[f"{p}decoder.embed_positions.weight"])}
    if config.normalize_embedding:
        dec["layernorm_embedding"] = _layer_norm(sd, f"{p}decoder.layernorm_embedding")
    if config.add_final_layer_norm and f"{p}decoder.layer_norm.weight" in sd:
        dec["layer_norm"] = _layer_norm(sd, f"{p}decoder.layer_norm")
    for i in range(config.decoder_layers):
        dec[f"layers_{i}"] = _decoder_layer(sd, f"{p}decoder.layers.{i}", multimodal)
    params["decoder"] = dec
    return params


def yelp_table_params_from_torch(state_dict: Mapping[str, Any], prefix: str = "") -> dict:
    """Convert a reference ``YelpTableEncoder`` state dict (``src/table_encoder.py:5``)."""
    sd, p = state_dict, prefix
    return {
        "rating_embedding": _linear(sd, f"{p}rating_embedding", bias=False),
        "hours_embedding": _linear(sd, f"{p}hours_embedding", bias=False),
        "fc": _linear(sd, f"{p}fc"),
        "linear": _linear(sd, f"{p}linear", bias=False),
    }


def amazon_table_params_from_torch(state_dict: Mapping[str, Any], prefix: str = "") -> dict:
    """Convert a reference ``AmazonTableEncoder`` state dict (``src/table_encoder.py:86``)."""
    sd, p = state_dict, prefix
    return {
        "price_embedding": _linear(sd, f"{p}price_embedding", bias=False),
        "rating_embedding": _linear(sd, f"{p}rating_embedding", bias=False),
        "fc": _linear(sd, f"{p}fc"),
        "linear": _linear(sd, f"{p}linear", bias=False),
    }


def _bn(sd, prefix: str) -> tuple[dict, dict]:
    """BatchNorm: returns (params, batch_stats) entries."""
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _conv(sd, prefix: str) -> dict:
    # torch conv weight [out, in, kh, kw] -> flax [kh, kw, in, out]
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def resnet_params_from_torch(state_dict: Mapping[str, Any], prefix: str = "resnet.") -> tuple[dict, dict]:
    """Convert a torchvision-style ResNet state dict to Flax (params, batch_stats).

    Covers the truncated encoder of reference ``src/img_encoder.py:4-41``:
    stem + layer1..layer3 (+optional layer4) + the bias-free projection
    ``linear``. Keys follow torchvision naming: ``conv1``, ``bn1``,
    ``layerL.B.convN/bnN`` and ``layerL.B.downsample.{0,1}``.
    """
    sd, p = state_dict, prefix
    params: dict = {}
    stats: dict = {}
    params["conv1"] = _conv(sd, f"{p}conv1")
    params["bn1"], stats["bn1"] = _bn(sd, f"{p}bn1")

    layer = 1
    while f"{p}layer{layer}.0.conv1.weight" in sd:
        block = 0
        while f"{p}layer{layer}.{block}.conv1.weight" in sd:
            name = f"layer{layer}_block{block}"
            bp: dict = {}
            bs: dict = {}
            conv = 1
            while f"{p}layer{layer}.{block}.conv{conv}.weight" in sd:
                bp[f"conv{conv}"] = _conv(sd, f"{p}layer{layer}.{block}.conv{conv}")
                bp[f"bn{conv}"], bs[f"bn{conv}"] = _bn(sd, f"{p}layer{layer}.{block}.bn{conv}")
                conv += 1
            if f"{p}layer{layer}.{block}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{p}layer{layer}.{block}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{p}layer{layer}.{block}.downsample.1")
            params[name] = bp
            stats[name] = bs
            block += 1
        layer += 1

    if "linear.weight" in sd:  # projection owned by the wrapper, not torchvision
        params["linear"] = _linear(sd, "linear", bias=False)
    return params, stats
