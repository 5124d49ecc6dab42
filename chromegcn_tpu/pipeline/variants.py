"""Variant-effect pipeline: SNP-centered windows and ref/alt effect scores.

Replaces the reference's snp_data scripts (reference: data/snp_data/
10_create_snp_bed.py, 11_create_snp_seqs.py, 12_create_binary.py): GRASP
eQTL SNPs -> centered windows -> ref/alt sequences -> per-label prediction
deltas (DeepSEA-style variant effect scoring with the trained window model).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chromegcn_tpu.data.constants import EXTENDED_WINDOW_SIZE, SRC_VOCAB
from chromegcn_tpu.ops.seq import encode_sequence
from chromegcn_tpu.pipeline.genome import Fasta


def snp_window(pos: int, extended: int = EXTENDED_WINDOW_SIZE) -> Tuple[int, int]:
    """Extended window centered on a SNP (reference: 10_create_snp_bed.py
    emits windows around each SNP position)."""
    half = extended // 2
    start = max(0, pos - half)
    return start, start + extended


def variant_sequences(
    fasta: Fasta,
    chrom: str,
    pos: int,
    ref: str,
    alt: str,
    extended: int = EXTENDED_WINDOW_SIZE,
    src_vocab: Dict[str, int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenized (ref_seq, alt_seq) for a SNP's centered window.

    Validates that the genome matches the claimed ref allele; substitutes
    the alt allele at the SNP position.
    """
    src_vocab = src_vocab or SRC_VOCAB
    start, end = snp_window(pos, extended)
    seq = fasta.fetch(chrom, start, end)
    offset = pos - start
    if seq[offset].lower() != ref.lower():
        raise ValueError(
            f"reference mismatch at {chrom}:{pos}: genome has "
            f"{seq[offset]!r}, expected {ref!r}"
        )
    alt_seq = seq[:offset] + alt.lower() + seq[offset + 1 :]
    return (
        encode_sequence(seq, src_vocab),
        encode_sequence(alt_seq, src_vocab),
    )


def variant_effect_scores(
    window_state,
    comp_map: jax.Array,
    ref_tokens: np.ndarray,
    alt_tokens: np.ndarray,
) -> np.ndarray:
    """Per-label variant effect: sigmoid(alt) - sigmoid(ref), strand-averaged.

    Args:
      window_state: a trained WindowTrainState (strand-averaged wrapper).
      ref_tokens/alt_tokens: (L,) or (B, L) token arrays.
    """
    if ref_tokens.ndim == 1:
        ref_tokens = ref_tokens[None]
        alt_tokens = alt_tokens[None]
    both = jnp.asarray(np.concatenate([ref_tokens, alt_tokens], axis=0))
    _, _, logits = window_state.apply_fn(
        {"params": window_state.params, "batch_stats": window_state.batch_stats},
        both,
        comp_map,
        train=False,
    )
    probs = jax.nn.sigmoid(logits)
    b = ref_tokens.shape[0]
    return np.asarray(probs[b:] - probs[:b])


def score_snp_table(
    window_state,
    comp_map: jax.Array,
    fasta: Fasta,
    snps: Sequence[Tuple[str, int, str, str]],
    batch_size: int = 64,
    extended: int = EXTENDED_WINDOW_SIZE,
) -> np.ndarray:
    """Variant effect scores for a table of (chrom, pos, ref, alt) SNPs."""
    refs, alts = [], []
    for chrom, pos, ref, alt in snps:
        r, a = variant_sequences(fasta, chrom, pos, ref, alt, extended)
        refs.append(r)
        alts.append(a)
    refs = np.stack(refs)
    alts = np.stack(alts)
    out = []
    for i in range(0, len(refs), batch_size):
        out.append(
            variant_effect_scores(
                window_state, comp_map, refs[i : i + batch_size], alts[i : i + batch_size]
            )
        )
    return np.concatenate(out, axis=0)
