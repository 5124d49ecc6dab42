"""DNA sequence ops: reverse complement and vocab-derived permutations.

The reference computes the reverse complement with an index remap +
flip wrapper copied from Selene (reference: models/NonStrandSpecific.py:13-44).
Here it is a single fused gather: ``comp_map[tokens[..., ::-1]]`` — XLA fuses
the reverse and the 5-entry table lookup into one cheap VPU pass.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from chromegcn_tpu.data.constants import COMPLEMENT


def complement_permutation(src_vocab: Mapping[str, int]) -> np.ndarray:
    """Token-id permutation implementing Watson-Crick complement.

    Derived from whatever vocab the dataset artifact carries, so both the
    canonical alphabetical vocab and the reference's frequency-ordered vocab
    (reference: data/create_torch_data.py:52-90) work. Symbols without a
    complement entry (e.g. 'n', special tokens) map to themselves
    (matching reference models/NonStrandSpecific.py:28-44, which only swaps
    a/t and c/g).
    """
    size = max(src_vocab.values()) + 1
    perm = np.arange(size, dtype=np.int32)
    for sym, idx in src_vocab.items():
        comp_sym = COMPLEMENT.get(sym.lower())
        if comp_sym is not None and comp_sym in src_vocab:
            perm[idx] = src_vocab[comp_sym]
    return perm


def reverse_complement(tokens: jax.Array, comp_map: jax.Array) -> jax.Array:
    """Reverse-complement token sequences along the last axis.

    Args:
      tokens: (..., L) integer token ids.
      comp_map: (V,) int32 permutation from ``complement_permutation``.
    """
    return jnp.take(comp_map, tokens[..., ::-1], axis=0)


def encode_sequence(seq: str, src_vocab: Dict[str, int], unk: str = "n") -> np.ndarray:
    """Encode an ASCII DNA string into token ids (host-side, ingest path)."""
    unk_id = src_vocab[unk]
    lut = np.full(256, unk_id, dtype=np.int32)
    for sym, idx in src_vocab.items():
        lut[ord(sym)] = idx
        lut[ord(sym.upper())] = idx
    return lut[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]
