"""Variant-effect product run: trained checkpoint -> SNP scores
(VERDICT r4 missing 5 / next 7).

The reference's snp_data pipeline exists to feed variant-effect evaluation
of a trained model (reference: data/snp_data/10_create_snp_windows.py ->
12_create_torch_files.py -> DeepSEA-style ref/alt deltas). Round 4 left
pipeline/variants.py unit-tested but never composed into a product run.
This driver does the composition on the ROUND-5 E2E checkpoint:

1. restores the converged CNN from run_e2e.py's workdir (the product's
   own stage-1 checkpoint format);
2. writes a synthetic-genome FASTA whose contigs are dataset-style
   windows built from the SAME motif tables the model was trained on
   (data/synthetic.graph_coupled_motifs, seed 0 = run_e2e's seed);
3. scores three SNP sets through the FULL pipeline path
   (pipeline.variants.score_snp_table: fasta fetch -> ref-allele
   validation -> alt substitution -> batched strand-averaged scoring):
   - DISRUPT: mid-motif flips inside planted motifs -> the labels mapped
     to that motif must drop (planted-effect check),
   - CONTROL: flips in motif-free sequence of the same windows,
   - BACKGROUND: random centered SNPs in unstructured genome (the
     distributional near-zero negative control);
4. asserts the planted effect separates from control by a wide margin and
   writes VARIANTS_r05.json (score distributions + separation stats).

Run AFTER run_e2e.py (same workdir): `python run_variants.py`
(TPU, ~5-10 min). `--tiny` CPU check needs `run_e2e.py --tiny` first.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASES = "acgt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--workdir", default="/tmp/e2e_r05")
    ap.add_argument("--out", default="VARIANTS_r05.json")
    ap.add_argument("--n-motif-probes", type=int, default=8)
    ap.add_argument("--windows-per-motif", type=int, default=8)
    ap.add_argument("--n-background", type=int, default=64)
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.workdir = "/tmp/e2e_r05_tiny"
        args.n_motif_probes, args.windows_per_motif = 3, 3
        args.n_background = 8

    import jax.numpy as jnp

    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data.constants import SRC_VOCAB
    from chromegcn_tpu.data.synthetic import graph_coupled_motifs
    from chromegcn_tpu.models.window import make_window_model
    from chromegcn_tpu.ops.seq import complement_permutation
    from chromegcn_tpu.pipeline.genome import Fasta
    from chromegcn_tpu.pipeline.variants import score_snp_table
    from chromegcn_tpu.train import checkpoint as ckpt
    from chromegcn_tpu.train import pretrain as pt
    from chromegcn_tpu.train.optim import make_optimizer
    from chromegcn_tpu.train.runner import apply_matmul_precision

    t_all = time.time()
    # mirror run_e2e.py's stage-1 config so stage1_run_dir resolves
    if args.tiny:
        seq_length, d_model, n_targets, n_motifs = 500, 32, 16, 64
        base = dict(
            dataroot=os.path.join(args.workdir, "data"),
            results_dir=os.path.join(args.workdir, "results"),
            cell_type="SYNE2E", seq_length=500, d_model=32, batch_size=32,
            optim="adam", lr=1e-3, dropout=0.2,
        )
    else:
        seq_length, d_model, n_targets, n_motifs = 2000, 128, 919, 64
        base = dict(
            dataroot=os.path.join(args.workdir, "data"),
            results_dir=os.path.join(args.workdir, "results"),
            cell_type="SYNE2E", seq_length=2000, d_model=128, batch_size=64,
            optim="adam", lr=1e-3, dropout=0.2,
        )
    cfg = Config(**base)
    apply_matmul_precision(cfg)
    assert ckpt.checkpoint_exists(cfg.stage1_run_dir), (
        f"no trained CNN at {cfg.stage1_run_dir}; run run_e2e.py first"
    )

    # ---- restore the trained window model ------------------------------
    print("[variants] restoring CNN checkpoint...", flush=True)
    wmodel = make_window_model(
        cfg.window_model, n_targets, seq_length=seq_length, d_model=d_model
    )
    wstate = pt.create_window_state(
        wmodel, make_optimizer(cfg.optim, cfg.lr), jax.random.PRNGKey(0),
        seq_length, dict(SRC_VOCAB),
    )
    cnn = ckpt.restore_checkpoint(cfg.stage1_run_dir)
    wstate = wstate.replace(
        params=jax.tree_util.tree_map(jnp.asarray, cnn["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, cnn["batch_stats"]),
    )
    comp_map = jnp.asarray(complement_permutation(SRC_VOCAB))

    # ---- the motif tables the model was trained on ---------------------
    motif_len = 8
    motifs, mu = graph_coupled_motifs(
        np.random.default_rng(0), n_motifs, motif_len, n_targets
    )
    rng = np.random.default_rng(11)
    # probe motifs with the most mapped labels (strongest readout), whose
    # canonical slot sits below the window midpoint so the contig-start
    # fetch regime holds (see genome layout note below)
    counts = np.bincount(mu, minlength=n_motifs)
    eligible = [
        m for m in np.argsort(-counts)
        if (int(m) * motif_len) % (seq_length - motif_len) + motif_len
        < seq_length // 2
    ]
    probe_motifs = np.asarray(eligible[: args.n_motif_probes])

    def window_with(mset):
        """Dataset-style window: random background + each motif m of mset
        planted at its canonical offset (m*motif_len) % (L-motif_len)."""
        tok = rng.integers(0, 4, size=seq_length).astype(np.int32)
        for m in mset:
            off = (m * motif_len) % (seq_length - motif_len)
            tok[off: off + motif_len] = motifs[m]
        return tok

    # ---- genome fasta: one contig per probe window ---------------------
    # Contig-start placement makes snp_window's centered fetch clamp to
    # [0, seq_length) (reference 10_create_snp_windows.py has the same
    # chromosome-start clamp), so the scored window IS the dataset-style
    # window and planted motifs sit at their canonical offsets.
    fasta_path = os.path.join(args.workdir, "variants", "genome.fa")
    os.makedirs(os.path.dirname(fasta_path), exist_ok=True)
    contigs, disrupt, control = {}, [], []
    half = seq_length // 2
    for m in probe_motifs:
        off = (int(m) * motif_len) % (seq_length - motif_len)
        for w in range(args.windows_per_motif):
            name = f"snp_m{m}_w{w}"
            extras = list(rng.integers(0, n_motifs, 2))
            mset = [int(m)] + extras
            tok = window_with(mset)
            contigs[name] = tok
            # mid-motif flip; pos < half keeps the centered fetch in the
            # contig-start clamp regime (scored window == dataset window)
            pos = off + motif_len // 2
            assert pos < half, (pos, half)
            ref = BASES[tok[pos]]
            alt = BASES[(tok[pos] + 1 + rng.integers(0, 3)) % 4]
            disrupt.append((name, pos, ref, alt, int(m)))
            # motif-free control flip in the SAME scored window: also
            # below half, re-drawn until clear of every planted slot
            slots = {
                (mm * motif_len) % (seq_length - motif_len) for mm in mset
            }
            while True:
                cpos = int(rng.integers(half // 2, half - 1))
                if all(not (s <= cpos < s + motif_len) for s in slots):
                    break
            cref = BASES[tok[cpos]]
            calt = BASES[(tok[cpos] + 1 + rng.integers(0, 3)) % 4]
            control.append((name, cpos, cref, calt, int(m)))
    # background: centered SNPs in unstructured (motif-free) contigs
    background = []
    for b in range(args.n_background):
        name = f"bg{b}"
        tok = rng.integers(0, 4, size=2 * seq_length).astype(np.int32)
        contigs[name] = tok
        pos = seq_length  # centered fetch sits fully inside the contig
        background.append(
            (name, pos, BASES[tok[pos]],
             BASES[(tok[pos] + 1 + rng.integers(0, 3)) % 4], -1)
        )
    with open(fasta_path, "w") as f:
        for name, tok in contigs.items():
            s = "".join(BASES[t] for t in tok)
            f.write(f">{name}\n")
            for i in range(0, len(s), 80):
                f.write(s[i: i + 80] + "\n")
    fasta = Fasta(fasta_path)
    print(f"[variants] genome: {len(contigs)} contigs, "
          f"{len(disrupt)}+{len(control)}+{len(background)} SNPs", flush=True)

    # ---- score through the product pipeline path -----------------------
    def score(snps):
        table = [(name, pos, ref, alt) for name, pos, ref, alt, _ in snps]
        return score_snp_table(
            wstate, comp_map, fasta, table, batch_size=32, extended=seq_length
        )

    t0 = time.time()
    d_scores = score(disrupt)     # (n, n_targets) sigmoid deltas
    c_scores = score(control)
    b_scores = score(background)
    score_s = time.time() - t0

    # planted-effect readout: the labels mapped to the disrupted motif
    def on_target_delta(scores, snps):
        out = []
        for row, (_, _, _, _, m) in zip(scores, snps):
            idx = np.nonzero(mu == m)[0]
            out.append(float(row[idx].mean()))
        return np.asarray(out)

    d_on = on_target_delta(d_scores, disrupt)
    c_on = on_target_delta(c_scores, control)
    sep = float(np.abs(d_on).mean() / max(np.abs(c_on).mean(), 1e-12))
    report = {
        "check": "variant-effect scores through the trained E2E CNN "
                 "(VERDICT r4 missing 5)",
        "backend": jax.default_backend(),
        "checkpoint": cfg.stage1_run_dir,
        "n_snps": {"disrupt": len(disrupt), "control": len(control),
                   "background": len(background)},
        "scoring_wall_s": round(score_s, 1),
        "on_target_delta": {
            "disrupt_mean": round(float(d_on.mean()), 5),
            "disrupt_mean_abs": round(float(np.abs(d_on).mean()), 5),
            "disrupt_frac_negative": round(float((d_on < 0).mean()), 3),
            "control_mean_abs": round(float(np.abs(c_on).mean()), 5),
            "separation_x": round(sep, 1),
        },
        "full_profile_max_abs": {
            "disrupt": round(float(np.abs(d_scores).max()), 5),
            "control": round(float(np.abs(c_scores).max()), 5),
            "background": round(float(np.abs(b_scores).max()), 5),
        },
        "background_abs_mean": round(float(np.abs(b_scores).mean()), 6),
        "total_wall_s": round(time.time() - t_all, 1),
    }
    if not args.tiny:
        # planted effect must be real: motif-disrupting SNPs move the
        # mapped labels DOWN and far more than motif-free flips
        assert report["on_target_delta"]["disrupt_frac_negative"] > 0.8, report
        assert sep > 3.0, report
    out = args.out if not args.tiny else "/tmp/VARIANTS_tiny.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[variants] separation {sep:.1f}x, disrupt mean "
          f"{report['on_target_delta']['disrupt_mean']:+.5f}; wrote {out} "
          f"({report['total_wall_s']}s)", flush=True)


if __name__ == "__main__":
    main()
