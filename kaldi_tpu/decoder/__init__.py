"""Decoders (reference L7: src/decoder/ + the fork's GPU decoder)."""

from kaldi_tpu.decoder.simple import SimpleDecoder
from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig

__all__ = ["SimpleDecoder", "BeamDecoder", "BeamDecoderConfig"]
