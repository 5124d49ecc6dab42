"""Joint CNN+GCN vs staged training — is joint mode worth shipping?
(VERDICT r4 next 2 / missing 2.)

BASELINE config #4 and the reference's -lr2/-optim2 surface
(reference: main.py:83, config_args.py:13-16) gesture at end-to-end
finetuning of CNN+GCN. Round 4 proved the *mechanics* (resume,
checkpoints) but its artifact trained from 2 epochs at toy scale to a
null AUC. This driver measures the capability's VALUE:

- warm-start joint training from the CONVERGED CNN checkpoint of the
  round-5 E2E run (that is what "finetune end-to-end" means) — run_joint
  picks the checkpoint up automatically because the stage-1 config here
  matches run_e2e's exactly;
- run --epochs joint epochs at full E2E scale (same dataset, graphs);
- compare_runs joint vs the STAGED GCN best snapshot from the same E2E
  workdir — committed either way: a win validates BASELINE config #4, a
  loss is a recorded negative like the fusion one (DESIGN §6).

Run AFTER run_e2e.py on the same workdir:
  `python run_jointwin.py` (TPU, ~40-70 min). `--tiny` CPU check needs a
  prior `python run_e2e.py --tiny`.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--workdir", default="/tmp/e2e_r05")
    ap.add_argument("--out", default="JOINTWIN_r05.json")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument(
        "--resume", action="store_true",
        help="continue a prior joint run from its checkpoint up to --epochs "
        "(run_joint's true-resume path) — for extending the experiment when "
        "the joint curve is still climbing at the first budget",
    )
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.workdir = "/tmp/e2e_r05_tiny"
        args.epochs = min(args.epochs, 2)

    from chromegcn_tpu.analysis import results as analysis_results
    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.train.runner import run

    t_all = time.time()
    # MUST mirror run_e2e.py's base exactly: stage1_id has to resolve to
    # the E2E pretrain checkpoint, and the staged-GCN run_dir to its
    # finetune snapshots
    if args.tiny:
        base = dict(
            dataroot=os.path.join(args.workdir, "data"),
            results_dir=os.path.join(args.workdir, "results"),
            cell_type="SYNE2E", seq_length=500, d_model=32, batch_size=32,
            test_batch_size=64,
            optim="adam", lr=1e-3, dropout=0.2, gcn_dropout=0.2,
            adj_type="hic", hicnorm="SQRTVC",
            use_stage2_hparams=True, optim2="adam", lr2=2e-3,
            overwrite=True,
        )
    else:
        base = dict(
            dataroot=os.path.join(args.workdir, "data"),
            results_dir=os.path.join(args.workdir, "results"),
            cell_type="SYNE2E", seq_length=2000, d_model=128, batch_size=64,
            test_batch_size=256,
            optim="adam", lr=1e-3, dropout=0.2, gcn_dropout=0.2,
            adj_type="hic", hicnorm="SQRTVC",
            use_stage2_hparams=True, optim2="adam", lr2=2e-3,
            overwrite=True,
        )

    joint_cfg = Config(joint=True, joint_chunk=128, epochs=args.epochs,
                       resume=args.resume, **base)
    staged_cfg = Config(load_pretrained=True, **base)
    from chromegcn_tpu.train import checkpoint as ckpt

    assert ckpt.checkpoint_exists(joint_cfg.stage1_run_dir), (
        f"no converged CNN checkpoint at {joint_cfg.stage1_run_dir} — "
        "run run_e2e.py first (same workdir)"
    )
    assert os.path.isdir(os.path.join(staged_cfg.run_dir, "epochs")), (
        f"no staged-GCN snapshots at {staged_cfg.run_dir} — "
        "run run_e2e.py first (same workdir)"
    )

    splits = artifact.load_dataset(joint_cfg.data_path)
    label_names = list(splits["train"].tgt_vocab.keys())

    report = {
        "check": "joint CNN+GCN warm-started from the converged CNN vs the "
                 "staged GCN best (VERDICT r4 next 2)",
        "backend": jax.default_backend(),
        "epochs": args.epochs,
        "stage1_ckpt": joint_cfg.stage1_run_dir,
        "log": [],
    }
    t0 = time.time()

    def verbose(*msg):
        line = " ".join(str(m) for m in msg)
        report["log"].append({"t": round(time.time() - t0, 1), "msg": line})
        print(f"[joint] {line}", flush=True)

    run(joint_cfg, splits, verbose=verbose)
    report["joint_wall_s"] = round(time.time() - t0, 1)

    joint_dir = joint_cfg.run_dir + ".joint"
    for split in ("valid", "test"):
        p = os.path.join(joint_dir, f"{split}.log")
        if os.path.exists(p):
            rows = [ln.split(",") for ln in open(p).read().splitlines() if ln]
            report[f"joint_{split}_epochs"] = [
                {"epoch": int(r[0]), "loss": float(r[1]),
                 "meanAUC": float(r[3]), "meanAUPR": float(r[4])}
                for r in rows
            ]

    # checkpoint the report BEFORE the compare pass: the training hour is
    # banked even if the comparison trips on something
    out = args.out if not args.tiny else "/tmp/JOINTWIN_tiny.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)

    # joint (b) vs staged GCN best (a), per label type
    cmp = analysis_results.compare_runs(
        staged_cfg.run_dir, joint_dir, label_names, cell_type="GM12878"
    )
    report["compare_staged_vs_joint"] = cmp
    delta = cmp["all"]["b_meanAUPR"] - cmp["all"]["a_meanAUPR"]
    report["joint_minus_staged_meanAUPR"] = round(delta, 4)
    report["verdict"] = (
        "joint WINS" if delta > 0.002 else
        "joint LOSES" if delta < -0.002 else "parity"
    )
    report["total_wall_s"] = round(time.time() - t_all, 1)

    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[joint] joint-staged meanAUPR delta: {delta:+.4f} "
          f"({report['verdict']}); wrote {out}", flush=True)


if __name__ == "__main__":
    main()
