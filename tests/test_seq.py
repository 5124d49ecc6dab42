"""Reverse-complement parity with the reference's flip+complement semantics."""

import jax.numpy as jnp
import numpy as np

from chromegcn_tpu.data.constants import SRC_VOCAB
from chromegcn_tpu.ops.seq import (
    complement_permutation,
    encode_sequence,
    reverse_complement,
)


def test_encode_decode_roundtrip():
    seq = "acgtnACGTN"
    toks = encode_sequence(seq, SRC_VOCAB)
    assert toks.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]


def test_revcomp_canonical_vocab():
    toks = encode_sequence("aacgt", SRC_VOCAB)
    comp = complement_permutation(SRC_VOCAB)
    rc = np.asarray(reverse_complement(jnp.asarray(toks), jnp.asarray(comp)))
    # revcomp of aacgt = acgtt
    assert rc.tolist() == encode_sequence("acgtt", SRC_VOCAB).tolist()


def test_revcomp_involution():
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 5, size=(4, 50)).astype(np.int32))
    comp = jnp.asarray(complement_permutation(SRC_VOCAB))
    rc2 = reverse_complement(reverse_complement(toks, comp), comp)
    np.testing.assert_array_equal(np.asarray(rc2), np.asarray(toks))


def test_revcomp_frequency_ordered_vocab():
    """Works with the reference's frequency-ordered vocab too
    (reference: data/create_torch_data.py:52-90, models/NonStrandSpecific.py:28-44)."""
    vocab = {"t": 0, "a": 1, "g": 2, "c": 3, "n": 4}
    comp = complement_permutation(vocab)
    # a<->t, c<->g, n fixed
    assert comp[vocab["a"]] == vocab["t"]
    assert comp[vocab["t"]] == vocab["a"]
    assert comp[vocab["c"]] == vocab["g"]
    assert comp[vocab["g"]] == vocab["c"]
    assert comp[vocab["n"]] == vocab["n"]
