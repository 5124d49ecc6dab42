"""Joint CNN+GCN mode on the real TPU, with on-chip resume (VERDICT r3
item 3: joint mode previously had no TPU evidence, no resume, and its
checkpoints omitted optimizer state).

Drives train.runner.run_joint at chromosome scale (a 6k-window training
chromosome spans 3 node buckets) on graph-coupled synthetic data:
  phase A: 2 joint epochs from the warm CNN start,
  phase B: a SECOND process-equivalent invocation with -resume, which must
           restore both stages' params + optimizer state + epoch and
           continue at epoch 3 (round-4 checkpoint format).
Writes JOINT_r04.json: per-epoch wall, trajectories, resume evidence.

Run: python run_joint_tpu.py  (TPU, ~15-25 min incl. compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.synthetic import make_graph_coupled_dataset
    from chromegcn_tpu.train.runner import run

    t_all = time.time()
    workdir = "/tmp/joint_r04"
    split_chroms = {
        "train": {"chr2": 6000},
        "valid": {"chr3": 1500},
        "test": {"chr1": 1500},
    }
    base = dict(
        dataroot=os.path.join(workdir, "data"),
        results_dir=os.path.join(workdir, "results"),
        cell_type="SYNJOINT", seq_length=2000, d_model=128, batch_size=64,
        optim="adam", lr=5e-4, dropout=0.1, gcn_dropout=0.1,
        adj_type="hic", hicnorm="SQRTVC",
        use_stage2_hparams=True, optim2="adam", lr2=1e-3,
        joint=True, joint_chunk=128,
    )
    report = {"workload": {**split_chroms["train"],
                           "n_targets": 919, "seq": 2000}, "phases": {}}

    cfg0 = Config(epochs=2, **base)
    os.makedirs(cfg0.dataset_dir, exist_ok=True)
    os.makedirs(cfg0.graph_root, exist_ok=True)
    print("[joint] generating graph-coupled dataset...", flush=True)
    splits, graphs = make_graph_coupled_dataset(
        split_chroms, n_targets=919, seq_length=2000, seed=1
    )
    artifact.save_dataset(cfg0.data_path, splits)
    for split, per in graphs.items():
        artifact.save_graph_edges(cfg0.graph_path(split), per)

    def phase(name, cfg):
        t0 = time.time()
        lines = []

        def verbose(*m):
            msg = " ".join(str(x) for x in m)
            lines.append({"t": round(time.time() - t0, 1), "msg": msg})
            print(f"[{name}] {msg}", flush=True)

        run(cfg, verbose=verbose)
        report["phases"][name] = {
            "wall_s": round(time.time() - t0, 1), "log": lines,
        }
        return lines

    import jax

    report["backend"] = jax.default_backend()
    phase("joint_2epochs", Config(epochs=2, **base))
    resume_lines = phase("joint_resume_to_3", Config(epochs=3, resume=True, **base))
    # the checkpoint holds the last score-improving epoch (1 or 2), so the
    # resume message reports start at that+1
    report["resume_worked"] = any(
        "resumed joint training at epoch" in l["msg"] for l in resume_lines
    )
    report["resume_message"] = next(
        (l["msg"] for l in resume_lines if "resumed joint" in l["msg"]), None
    )

    run_dir = cfg0.run_dir + ".joint"
    for split in ("train", "valid", "test"):
        rows = []
        for line in open(os.path.join(run_dir, f"{split}.log")).read().splitlines():
            c = line.split(",")
            rows.append({"epoch": int(c[0]), "loss": round(float(c[1]), 4),
                         "meanAUC": None if c[3] == "nan" else round(float(c[3]), 4),
                         "meanAUPR": None if c[4] == "nan" else round(float(c[4]), 4)})
        report[f"{split}_log"] = rows

    # checkpoint carries both stages' optimizer state (round-4 format)
    from chromegcn_tpu.train import checkpoint as ckpt

    saved = ckpt.restore_checkpoint(run_dir)
    report["ckpt_has_opt_state"] = (
        "opt_state" in saved["window"] and "opt_state" in saved["chrome"]
    )
    report["total_wall_s"] = round(time.time() - t_all, 1)
    with open("JOINT_r04.json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"[joint] wrote JOINT_r04.json resume_worked={report['resume_worked']} "
          f"opt_state={report['ckpt_has_opt_state']} total={report['total_wall_s']}s",
          flush=True)


if __name__ == "__main__":
    main()
