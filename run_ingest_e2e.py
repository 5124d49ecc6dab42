"""INGEST E2E (round 4): raw files -> pipeline CLI -> training CLI on TPU.

Closes the last product seam (VERDICT r3 item 1): generates synthetic raw
inputs at honest scale (22 contigs; chr1 spans several 2048-node buckets),
runs `python -m chromegcn_tpu.pipeline` to produce dataset.npz + hic/
artifacts, then drives `python -m chromegcn_tpu.main` -pretrain ->
-save_feats -> GCN finetune as SUBPROCESSES — the exact commands a user
runs (reference: README.md:31-46 over data/create_data.py artifacts).

Writes INGEST_E2E_r04.json: per-phase wall clock, artifact sizes, loss /
metric trajectories parsed from the product's own .log files.

Run (TPU, one process at a time; ~45 min):
    python run_ingest_e2e.py 2>&1 | tee _ingest_e2e/driver.log
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
WORK = os.path.join(ROOT, "_ingest_e2e")
RAW = os.path.join(WORK, "raw")
DATAROOT = os.path.join(WORK, "processed")
RESULTS = os.path.join(WORK, "results")
CELL = "SYNRAW"
OUT_JSON = os.path.join(ROOT, "INGEST_E2E_r04.json")

SCALE = 35          # hg19/35: chr1 ~7.1Mb -> ~4.6k kept windows (3 buckets)
SEED = 4
PRETRAIN_EPOCHS = 3
FINETUNE_EPOCHS = 6
COMMON = [
    "-dataroot", DATAROOT, "-results_dir", RESULTS, "-cell_type", CELL,
    "-batch_size", "64", "-seq_length", "2000", "-d_model", "128",
    "-optim", "adam", "-lr", "0.0005", "-dropout", "0.1",
    "-adj_type", "hic", "-hicsize", "125000", "-hicnorm", "SQRTVC",
]


def log(msg):
    print(f"[ingest-e2e +{time.time() - T0:.0f}s] {msg}", flush=True)


def run_cmd(tag, argv):
    log(f"phase {tag}: {' '.join(argv)}")
    t = time.time()
    out_path = os.path.join(WORK, f"{tag}.out")
    with open(out_path, "w") as f:
        p = subprocess.run(argv, stdout=f, stderr=subprocess.STDOUT, cwd=ROOT)
    wall = time.time() - t
    if p.returncode != 0:
        tail = open(out_path).read()[-3000:]
        raise RuntimeError(f"phase {tag} failed (rc={p.returncode}):\n{tail}")
    log(f"phase {tag} done in {wall:.1f}s")
    return wall


def dir_bytes(path):
    total = 0
    for dp, _, fns in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
    return total


def read_log(run_dir, split):
    path = os.path.join(run_dir, f"{split}.log")
    rows = []
    for line in open(path).read().splitlines():
        c = line.split(",")
        rows.append({
            "epoch": int(c[0]), "loss": round(float(c[1]), 4),
            "mAP": round(float(c[2]), 4), "meanAUC": round(float(c[3]), 4),
            "meanAUPR": round(float(c[4]), 4),
        })
    return rows


T0 = time.time()


def main():
    report = {
        "what": "raw files -> pipeline CLI -> training CLI (subprocesses) on TPU",
        "scale": {"hg19_div": SCALE, "seed": SEED},
        "phases": {},
    }
    os.makedirs(WORK, exist_ok=True)

    # ---- phase 0: raw world ------------------------------------------------
    marker = os.path.join(RAW, "ground_truth.json")
    if not os.path.exists(marker):
        t = time.time()
        sys.path.insert(0, ROOT)
        from chromegcn_tpu.data.synthetic_raw import (
            make_raw_world,
            scaled_hg19_sizes,
        )

        stats = make_raw_world(
            RAW, scaled_hg19_sizes(SCALE), motif_p=0.20,
            pairs_per_node=6.0, noise_frac=0.5, seed=SEED, verbose=log,
        )
        report["phases"]["generate_raw"] = {"wall_s": round(time.time() - t, 1)}
    else:
        stats = json.load(open(marker))
        report["phases"]["generate_raw"] = {"wall_s": 0.0, "cached": True}
    report["raw"] = {
        "fasta_bytes": os.path.getsize(os.path.join(RAW, "genome.fa")),
        "peak_bytes": dir_bytes(os.path.join(RAW, "peaks")),
        "hic_bytes": dir_bytes(os.path.join(RAW, "hic")),
        "n_contigs": len(stats["chroms"]),
        "total_windows": sum(c["n_windows"] for c in stats["chroms"].values()),
        "total_kept": stats["total_kept"],
        "chr1_kept": stats["chroms"]["chr1"]["kept_windows"],
    }
    log(f"raw world: {report['raw']}")

    # ---- phase 1: pipeline CLI --------------------------------------------
    out_dir = os.path.join(DATAROOT, CELL, "1000")
    if not os.path.exists(os.path.join(out_dir, "dataset.npz")):
        wall = run_cmd("pipeline", [
            sys.executable, "-m", "chromegcn_tpu.pipeline",
            "--fasta", os.path.join(RAW, "genome.fa"),
            "--peaks", os.path.join(RAW, "peaks"),
            "--hic", os.path.join(RAW, "hic"),
            "--out", out_dir,
            "--hicsize", "125000", "--hicnorm", "SQRTVC",
        ])
        report["phases"]["pipeline"] = {"wall_s": round(wall, 1)}
    else:
        report["phases"]["pipeline"] = {"cached": True}
    report["artifacts"] = {
        "dataset_bytes": os.path.getsize(os.path.join(out_dir, "dataset.npz")),
        "hic_bytes": dir_bytes(os.path.join(out_dir, "hic")),
    }

    # ---- phases 2-4: training CLI on TPU ----------------------------------
    # config reconstruction MUST use the exact argv of each phase (the
    # gcn_dropout flag is part of the finetune run-dir encoding)
    from chromegcn_tpu.main import build_parser, config_from_args

    pretrain_argv = COMMON + [
        "-pretrain", "-epochs", str(PRETRAIN_EPOCHS), "-shuffle_train",
    ]
    cfg = config_from_args(build_parser().parse_args(pretrain_argv))
    if not os.path.isdir(os.path.join(cfg.stage1_run_dir, "ckpt")):
        wall = run_cmd("pretrain",
                       [sys.executable, "-m", "chromegcn_tpu.main", *pretrain_argv])
        report["phases"]["cli_pretrain"] = {
            "wall_s": round(wall, 1), "epochs": PRETRAIN_EPOCHS,
        }
    else:
        report["phases"]["cli_pretrain"] = {"cached": True}
    report["pretrain_test_log"] = read_log(cfg.stage1_run_dir, "test")

    if not all(
        os.path.exists(cfg.feature_path(s)) for s in ("train", "valid", "test")
    ):
        wall = run_cmd("save_feats", [
            sys.executable, "-m", "chromegcn_tpu.main", *COMMON, "-save_feats",
        ])
        report["phases"]["cli_save_feats"] = {"wall_s": round(wall, 1)}
    else:
        report["phases"]["cli_save_feats"] = {"cached": True}
    feat_bytes = {
        s: os.path.getsize(cfg.feature_path(s))
        for s in ("train", "valid", "test")
    }
    report["feature_bytes"] = feat_bytes

    finetune_argv = COMMON + [
        "-load_pretrained", "-epochs", str(FINETUNE_EPOCHS),
        "-gcn_dropout", "0.1",
    ]
    ft_cfg = config_from_args(build_parser().parse_args(finetune_argv))
    ft_log_path = os.path.join(ft_cfg.run_dir, "test.log")
    done = (
        os.path.exists(ft_log_path)
        and len(open(ft_log_path).read().splitlines()) >= FINETUNE_EPOCHS
    )
    if not done:
        wall = run_cmd("finetune",
                       [sys.executable, "-m", "chromegcn_tpu.main", *finetune_argv])
        report["phases"]["cli_finetune"] = {
            "wall_s": round(wall, 1), "epochs": FINETUNE_EPOCHS,
        }
    else:
        report["phases"]["cli_finetune"] = {"cached": True}
    report["finetune_test_log"] = read_log(ft_cfg.run_dir, "test")

    # ---- verdicts ----------------------------------------------------------
    pre = report["pretrain_test_log"]
    ft = report["finetune_test_log"]
    report["checks"] = {
        "pretrain_loss_decreased": pre[-1]["loss"] < pre[0]["loss"],
        "cnn_test_meanAUC_final": pre[-1]["meanAUC"],
        "gcn_test_meanAUC_final": ft[-1]["meanAUC"],
        "gcn_test_meanAUPR_final": ft[-1]["meanAUPR"],
        "gcn_improves_on_cnn_feats_AUPR": ft[-1]["meanAUPR"] > pre[-1]["meanAUPR"],
    }
    report["total_wall_s"] = round(time.time() - T0, 1)
    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=1)
    log(f"wrote {OUT_JSON}: checks={report['checks']}")


if __name__ == "__main__":
    main()
