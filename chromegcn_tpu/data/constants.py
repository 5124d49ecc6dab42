"""Vocabulary and token constants.

The reference encodes DNA with a frequency-ordered vocabulary built at
tensorize time (reference: data/create_torch_data.py:52-90, built with
use_bos_eos=False so base tokens occupy ids 0..4, which is why the window
models use a 5-slot embedding — reference models/WindowModels.py:29
``nn.Embedding(5, 5)``).

We fix a canonical alphabetical vocabulary instead and carry the actual
vocab dict inside every dataset artifact; all sequence ops (notably
reverse-complement) derive their permutations from the artifact's vocab, so
either ordering round-trips. Special tokens PAD/UNK/BOS/EOS (reference:
data/Constants.py:1-9) are retained only for the *label* vocabulary; DNA
sequences are fixed-length so no src padding token is needed (the reference
"pads with token 0", i.e. with its most frequent base — a quirk we do not
reproduce; documented divergence).
"""

PAD = 0
UNK = 1
BOS = 2
EOS = 3

PAD_WORD = "<blank>"
UNK_WORD = "<unk>"
BOS_WORD = "<s>"
EOS_WORD = "</s>"

# Canonical DNA vocabulary: token id per base symbol.
SRC_VOCAB = {"a": 0, "c": 1, "g": 2, "t": 3, "n": 4}
SRC_VOCAB_SIZE = 5

# Watson-Crick complement at the symbol level ('n' maps to itself).
COMPLEMENT = {"a": "t", "t": "a", "c": "g", "g": "c", "n": "n"}

# Chromosome split contract (reference: data/create_data.py:44-45).
VALID_CHROMS = ("chr3", "chr12", "chr17")
TEST_CHROMS = ("chr1", "chr8", "chr21")
ALL_CHROMS = tuple(f"chr{i}" for i in range(1, 23))
TRAIN_CHROMS = tuple(
    c for c in ALL_CHROMS if c not in VALID_CHROMS and c not in TEST_CHROMS
)

# Window geometry (reference: data/create_data.py:17-18).
WINDOW_SIZE = 1000
EXTENDED_WINDOW_SIZE = 2000
