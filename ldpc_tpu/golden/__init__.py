"""Golden-model oracles: bit-exact fixed-point + float NumPy decoders."""
from .decoder import DecodeResult, decode_fixed, decode_float, quantize  # noqa: F401
from .encoder import encode, systematic_form  # noqa: F401
