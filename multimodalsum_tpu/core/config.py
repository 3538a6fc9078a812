"""Configuration tree for the MultimodalSum-TPU framework.

A single dataclass hierarchy replaces the reference's four overlapping config
systems (argparse per script, ``cfg/bart-large.json`` via PretrainedConfig,
``TrainingArguments``, Luigi parameters) — see reference
``src/transformer/configuration_bart.py:36`` and ``cfg/bart-large.json``.

Configs are plain frozen dataclasses so they are hashable and can be passed
as static arguments through ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping


@dataclass(frozen=True)
class BartConfig:
    """Model hyperparameters.

    Field semantics mirror the reference ``cfg/bart-large.json`` (reference
    ``configuration_bart.py:36``); defaults below are the bart-large values.
    """

    vocab_size: int = 50265
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    encoder_attention_heads: int = 16
    decoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    decoder_ffn_dim: int = 4096
    max_position_embeddings: int = 1024
    # BART offsets learned position ids by 2 (reference
    # modeling_multimodalsum.py:945-968, ``extra_pos_embeddings``).
    extra_pos_embeddings: int = 2
    activation_function: str = "gelu"
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    classif_dropout: float = 0.0
    init_std: float = 0.02
    normalize_embedding: bool = True
    normalize_before: bool = False
    add_final_layer_norm: bool = False
    scale_embedding: bool = False
    static_position_embeddings: bool = False

    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    mask_token_id: int = 50264

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_attention_heads

    @classmethod
    def from_json(cls, path: str) -> "BartConfig":
        """Load from a reference-style JSON config (``cfg/bart-large.json``)."""
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Mapping[str, Any]) -> "BartConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in names}
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def replace(self, **kwargs) -> "BartConfig":
        return dataclasses.replace(self, **kwargs)


#: A tiny configuration used throughout the test-suite. Same structural
#: properties as bart-large (post-LN, learned positions with offset 2,
#: normalize_embedding) but small enough for CPU parity tests.
TINY_CONFIG = BartConfig(
    vocab_size=128,
    d_model=32,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=64,
    decoder_ffn_dim=64,
    max_position_embeddings=64,
    dropout=0.0,
    mask_token_id=127,
)


@dataclass(frozen=True)
class GenerationConfig:
    """Decoding knobs.

    Defaults mirror the generation defaults in the reference config
    (``cfg/bart-large.json:48-57`` ``task_specific_params``) and the
    mandatory eval flags of ``src/test.py:156-181``.
    """

    max_length: int = 142
    min_length: int = 56
    num_beams: int = 4
    length_penalty: float = 2.0
    early_stopping: bool = True
    no_repeat_ngram_size: int = 3
    repetition_penalty: float = 1.0
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    num_return_sequences: int = 1

    def replace(self, **kwargs) -> "GenerationConfig":
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class TrainConfig:
    """Training-stage hyperparameters.

    Reference per-stage defaults: ``src/text_pretrain.py:214-227``,
    ``src/img_pretrain.py:244-258``, ``src/table_pretrain.py:314-328``,
    ``src/multimodal_train.py:414-428``.
    """

    learning_rate: float = 5e-5
    warmup_ratio: float = 0.1
    weight_decay: float = 0.01
    max_grad_norm: float | None = None
    label_smoothing: float | None = None
    batch_size: int = 4
    num_epochs: int = 5
    seed: int = 0
    early_stopping: bool = False

    def replace(self, **kwargs) -> "TrainConfig":
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD execution.

    The reference uses pure data parallelism over NCCL (apex DDP,
    ``src/train_utils.py:28``); here the mesh generalizes to (data, model)
    axes so tensor-parallel shardings can ride ICI when enabled.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: all devices
    model_parallel: int = 1
