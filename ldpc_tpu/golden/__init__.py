"""Golden-model oracles: bit-exact fixed-point + float NumPy decoders."""
from .decoder import (  # noqa: F401
    DecodeResult, decode_fixed, decode_float, decode_hard, quantize)
from .encoder import encode, systematic_form  # noqa: F401
