"""Global matmul-precision policy.

JAX's default matmul precision is reduced (bf16-like inputs) on TPU *and* on
this CPU build; parity tests need true float32 accumulation, while production
TPU runs want the fast default. Because pytest plugins may import jax before
any conftest runs, the env-var route (``JAX_DEFAULT_MATMUL_PRECISION``) is
unreliable — so the framework threads this explicit policy into every einsum
and Dense layer instead.
"""

from __future__ import annotations

from typing import Optional

import jax

_PRECISION: Optional[jax.lax.Precision] = None

_NAMES = {
    None: None,
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
    "float32": jax.lax.Precision.HIGHEST,
    "bfloat16": jax.lax.Precision.DEFAULT,
}


def set_default_matmul_precision(name: str | None) -> None:
    global _PRECISION
    _PRECISION = _NAMES[name] if isinstance(name, str) or name is None else name


def matmul_precision() -> Optional[jax.lax.Precision]:
    return _PRECISION
