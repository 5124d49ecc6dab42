"""Synthetic datasets for tests and benchmarks.

Generates windows whose labels are a (noisy) function of sequence content so
that training actually reduces loss / lifts AUROC, plus synthetic Hi-C
contact lists at chromosome scale for kernel and scaling benchmarks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from chromegcn_tpu.data.constants import SRC_VOCAB, EXTENDED_WINDOW_SIZE
from chromegcn_tpu.data.loader import WindowDataset


def make_window_dataset(
    n_per_chrom: Dict[str, int],
    n_targets: int = 8,
    seq_length: int = EXTENDED_WINDOW_SIZE,
    seed: int = 0,
) -> WindowDataset:
    """Windows with learnable structure: each label fires on the presence of
    a short motif, so even a tiny CNN can separate classes."""
    rng = np.random.default_rng(seed)
    total = sum(n_per_chrom.values())
    tokens = rng.integers(0, 4, size=(total, seq_length)).astype(np.int32)
    motifs = rng.integers(0, 4, size=(n_targets, 6)).astype(np.int32)
    targets = np.zeros((total, n_targets), dtype=np.uint8)

    for t in range(n_targets):
        has = rng.random(total) < 0.3
        pos = rng.integers(0, seq_length - 6, size=total)
        for i in np.nonzero(has)[0]:
            tokens[i, pos[i] : pos[i] + 6] = motifs[t]
        targets[has, t] = 1

    chroms: List[str] = []
    starts: List[int] = []
    for chrom, n in n_per_chrom.items():
        chroms.extend([chrom] * n)
        starts.extend(range(0, n * 1000, 1000))

    tgt_vocab = {f"assay{i}": i for i in range(n_targets)}
    return WindowDataset(
        tokens=tokens,
        targets=targets,
        chroms=np.asarray(chroms, dtype=object),
        starts=np.asarray(starts, dtype=np.int64),
        src_vocab=dict(SRC_VOCAB),
        tgt_vocab=tgt_vocab,
    )


def make_hic_edges(
    n_nodes: int,
    n_pairs: int,
    seed: int = 0,
    power: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric binary contact pairs with a power-law-ish distance profile
    (short-range contacts dominate, like real Hi-C)."""
    rng = np.random.default_rng(seed)
    i = rng.integers(0, n_nodes, size=n_pairs * 2)
    # distance drawn heavy-tailed, sign random
    dist = np.maximum(1, (rng.pareto(power, size=n_pairs * 2) * 3).astype(np.int64))
    j = i + np.where(rng.random(n_pairs * 2) < 0.5, dist, -dist)
    ok = (j >= 0) & (j < n_nodes) & (j != i)
    i, j = i[ok][:n_pairs], j[ok][:n_pairs]
    dense_keys = set()
    si, sj = [], []
    for a, b in zip(i.tolist(), j.tolist()):
        key = (a, b) if a < b else (b, a)
        if key not in dense_keys:
            dense_keys.add(key)
            si.append(key[0])
            sj.append(key[1])
    si = np.asarray(si, np.int32)
    sj = np.asarray(sj, np.int32)
    senders = np.concatenate([si, sj])
    receivers = np.concatenate([sj, si])
    vals = np.ones(senders.shape[0], np.float32)
    return senders, receivers, vals
