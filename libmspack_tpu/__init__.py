"""libmspack_tpu: a TPU-native Microsoft compression-format suite.

A ground-up re-design of the capabilities of libmspack (CAB, CHM, SZDD,
KWAJ, OAB containers; LZX, MSZIP/deflate, Quantum, LZSS, KWAJ-LZH
codecs) for JAX/XLA/Pallas on TPU hardware.

Layering (mirrors the reference's clean five-layer split, SURVEY.md §1):

* L1 primitives  — codecs.bitstream / codecs.huffman, ops.* device kernels
* L2 codecs      — codecs.{lzss,mszip,lzx,qtm,lzh} scalar reference +
                   ops.* batched TPU two-phase decoders
* L3 drivers     — formats.{cab,chm,szdd,kwaj,oab}
* L4 public API  — this module's create_* constructors
* L5 CLI         — cli.cabextract

The scalar codecs are bit-exact against the reference implementation;
the TPU path decodes batches of independent streams (CAB folders, MSZIP
frames, LZX reset intervals) in parallel across devices of a
jax.sharding.Mesh.
"""
from __future__ import annotations

from .errors import (ArgsError, ChecksumError, CrunchError, DataFormatError,
                     DecrunchError, Err, MSPackError, OpenError, ReadError,
                     SeekError, SignatureError, WriteError)

__version__ = "0.1.0"


def version(entity: str = "library") -> int:
    """Feature-version registry (reference: system.c:16-51 mspack_version).

    Returns the supported version for an entity name, 0 if unsupported.
    """
    versions = {
        "library": 2,
        "system": 1,
        "cab_decoder": 2,
        "chm_decoder": 1,
        "szdd_decoder": 1,
        "kwaj_decoder": 1,
        "oab_decoder": 2,
        # the reference returns 0 for every compressor; we implement some
        "szdd_encoder": 1,
        "kwaj_encoder": 1,
        "cab_encoder": 1,
    }
    return versions.get(entity, 0)


def create_cab_decompressor(**kw):
    from .formats.cab import CabDecompressor
    return CabDecompressor(**kw)


def create_chm_decompressor(**kw):
    from .formats.chm import ChmDecompressor
    return ChmDecompressor(**kw)


def create_szdd_decompressor(**kw):
    from .formats.szdd import SzddDecompressor
    return SzddDecompressor(**kw)


def create_kwaj_decompressor(**kw):
    from .formats.kwaj import KwajDecompressor
    return KwajDecompressor(**kw)


def create_oab_decompressor(**kw):
    from .formats.oab import OabDecompressor
    return OabDecompressor(**kw)
