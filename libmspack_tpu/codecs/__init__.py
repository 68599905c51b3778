"""L2 codec layer: scalar (host) reference decoders.

Each codec here is the bit-exact correctness reference; batched
TPU-accelerated equivalents live in `libmspack_tpu.ops`.
"""
from . import bitstream, huffman, lzh, lzss, mszip  # noqa: F401
