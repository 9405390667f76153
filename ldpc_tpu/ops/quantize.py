"""Fixed-point LLR quantization as a jittable XLA op.

Must match ldpc_tpu.golden.decoder.quantize bit-exactly on identical inputs
(BASELINE.json:5 'fixed-point LLR quantization ... explicit int8/int16
quantized ops'). Semantics: round half away from zero, symmetric saturation to
+/- (2**(bits-1)-1). With the default power-of-two scale the scaling multiply
is exact in float32, so float32 XLA matches the float64 golden path except on
measure-zero half-LSB boundaries.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import QuantConfig


def quantize(llr: jnp.ndarray, quant: QuantConfig = QuantConfig()) -> jnp.ndarray:
    """Float LLRs (..., n) -> int8 fixed point."""
    qmax = quant.qmax
    scaled = llr.astype(jnp.float32) * jnp.float32(quant.scale)
    r = jnp.where(scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5))
    return jnp.clip(r, -qmax, qmax).astype(jnp.int8)


def dequantize(q: jnp.ndarray, quant: QuantConfig = QuantConfig()) -> jnp.ndarray:
    return q.astype(jnp.float32) / jnp.float32(quant.scale)
