from . import channel
from .channel import awgn, demap, modulate, sigma_for
from .decode_hard import make_hard_decoder
from .encode import info_positions, make_encoder
from .quantize import dequantize, quantize

__all__ = ["channel", "modulate", "awgn", "demap", "sigma_for",
           "make_encoder", "info_positions", "quantize", "dequantize",
           "make_hard_decoder"]
