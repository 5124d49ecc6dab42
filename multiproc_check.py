"""TRUE multi-process placement + collective check (BASELINE north star:
multi-host GCN trainer).

No TPU pod exists in this environment, but the multi-host CODE PATH can
still be executed for real: this script launches TWO OS processes, each
owning 4 virtual CPU devices, brings up `jax.distributed` (the same
runtime a pod uses, DCN-style coordination over localhost), and runs:

1. `parallel.multihost.put_global` with each process supplying ONLY its
   own contiguous row shard (`jax.make_array_from_process_local_data` —
   the branch a single-process run never exercises);
2. the node-sharded `sharded_spmm` ring-halo exchange across the
   8-device / 2-process mesh (ppermute crossing the process boundary);
3. the full chrome_train_step on the sharded graph,

and checks shard-exact equality against the single-process reference.

Run: `python multiproc_check.py` (parent mode: spawns the two workers
and writes MULTIHOST_r05.json). ~2 min CPU.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
DEV_PER_PROC = 4
PORT = 57421
N_VALID, N_PAD, D, NCLASS = 1000, 1024, 32, 7


def worker(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.models.chrome import ChromeGCN
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops import spmm as spmm_mod
    from chromegcn_tpu.parallel.graph import shard_graph
    from chromegcn_tpu.parallel.mesh import make_mesh, node_sharding
    from chromegcn_tpu.parallel.multihost import local_row_range, put_global
    from chromegcn_tpu.train.finetune import chrome_train_step, create_chrome_state
    from chromegcn_tpu.train.optim import make_optimizer

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    # identical deterministic inputs on every process (shared-artifact model)
    s, r, v = make_hic_edges(N_VALID, 5000, seed=0)
    graph = build_chrom_graph("hic", n_valid=N_VALID, n_pad=N_PAD, hic_edges=(s, r, v))
    rng = np.random.default_rng(0)
    x_full = rng.normal(size=(N_PAD, D)).astype(np.float32)

    mesh = make_mesh(N_PROC * DEV_PER_PROC, axis="graph")
    sharding = node_sharding(mesh)

    # 1) process-local placement: hand put_global ONLY this process's rows
    lo, hi = local_row_range(sharding, x_full.shape)
    expect_rows = N_PAD // N_PROC
    assert hi - lo == expect_rows and lo == pid * expect_rows, (lo, hi)
    x = put_global(x_full[lo:hi], sharding, already_local=True)

    # 2) sharded SpMM with the ring-halo exchange across the process boundary
    sg = shard_graph(graph, mesh, strategy="halo")
    out = jax.jit(lambda xx: spmm_mod.spmm(sg, xx))(x)
    ref = spmm_mod.spmm_xla(graph, jnp.asarray(x_full))
    err = 0.0
    for db in out.addressable_shards:
        sl = db.index[0]
        err = max(err, float(jnp.max(jnp.abs(db.data - ref[sl]))))

    # 2b) PER-PROCESS operator construction (halo_bsr): with a multi-process
    # mesh each host must MATERIALIZE dense blocks only for its own shards
    # (count-only passes elsewhere) and still produce the exact SpMM. This
    # is the pod-scale deployment path (SCALING_r04's stacked-form
    # inflation note turned into code — VERDICT r4 missing #3).
    from chromegcn_tpu.ops import spmm_pallas as sp

    calls = {"materialize": 0, "count_only": 0}
    orig_build = sp._build_one_direction

    def counting_build(*a, **k):
        calls["count_only" if k.get("count_only") else "materialize"] += 1
        return orig_build(*a, **k)

    sp._build_one_direction = counting_build
    try:
        sg_bsr = shard_graph(graph, mesh, strategy="halo_bsr")
    finally:
        sp._build_one_direction = orig_build
    n_shards = N_PROC * DEV_PER_PROC
    own = n_shards // N_PROC
    groups = 4 if sg_bsr.pg.halo_cols else 2  # fl/bl (+fh/bh when halo)
    assert calls["materialize"] == groups * own, calls
    assert calls["count_only"] == groups * n_shards, calls
    # the per-process-built operator holds GLOBAL arrays spanning
    # non-addressable devices — it must be a jit ARGUMENT, not a closure
    # (the trainer already passes graphs as step arguments)
    out_bsr = jax.jit(spmm_mod.spmm)(sg_bsr, x)
    err_bsr = 0.0
    for db in out_bsr.addressable_shards:
        sl = db.index[0]
        err_bsr = max(err_bsr, float(jnp.max(jnp.abs(db.data - ref[sl]))))
    # footprint: materialized-shard fraction is exactly 1/num_processes
    bsr_frac = calls["materialize"] / calls["count_only"]

    # 3) full train step on the sharded graph (loss is replicated)
    model = ChromeGCN(nfeat=D, nhid=D, nclass=NCLASS, dropout=0.0, layers=2)
    state = create_chrome_state(
        model, make_optimizer("sgd", 0.25), jax.random.PRNGKey(0), nfeat=D,
        n_nodes=256,
    )
    targets_full = (rng.random((N_PAD, NCLASS)) < 0.2).astype(np.float32)
    targets = put_global(targets_full[lo:hi], sharding, already_local=True)
    x_r = put_global(x_full[lo:hi] * 0.5, sharding, already_local=True)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, step = jax.random.split(key)
        state, loss, _ = chrome_train_step(state, x, x_r, sg, targets, step)
        losses.append(float(loss))

    print(
        json.dumps(
            {
                "pid": pid,
                "spmm_max_err": err,
                "spmm_bsr_max_err": err_bsr,
                "bsr_build_calls": calls,
                "bsr_materialized_fraction": bsr_frac,
                "losses": losses,
            }
        ),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(N_PROC)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err[-3000:], file=sys.stderr)
            raise SystemExit(f"worker failed rc={p.returncode}")
        results.append(json.loads(out.strip().splitlines()[-1]))

    # single-process reference trajectory for the train step
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.models.chrome import ChromeGCN
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.train.finetune import chrome_train_step, create_chrome_state
    from chromegcn_tpu.train.optim import make_optimizer

    s, r, v = make_hic_edges(N_VALID, 5000, seed=0)
    graph = build_chrom_graph("hic", n_valid=N_VALID, n_pad=N_PAD, hic_edges=(s, r, v))
    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.normal(size=(N_PAD, D)).astype(np.float32))
    model = ChromeGCN(nfeat=D, nhid=D, nclass=NCLASS, dropout=0.0, layers=2)
    state = create_chrome_state(
        model, make_optimizer("sgd", 0.25), jax.random.PRNGKey(0), nfeat=D,
        n_nodes=256,
    )
    targets = jnp.asarray((rng.random((N_PAD, NCLASS)) < 0.2).astype(np.float32))
    ref_losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, step = jax.random.split(key)
        state, loss, _ = chrome_train_step(
            state, x_full, x_full * 0.5, graph, targets, step
        )
        ref_losses.append(float(loss))

    max_err = max(r_["spmm_max_err"] for r_ in results)
    max_err_bsr = max(r_["spmm_bsr_max_err"] for r_ in results)
    loss_dev = max(
        abs(a - b) / abs(b)
        for r_ in results
        for a, b in zip(r_["losses"], ref_losses)
    )
    frac = max(r_["bsr_materialized_fraction"] for r_ in results)
    ok = (
        max_err < 1e-4
        and max_err_bsr < 1e-4
        and loss_dev < 1e-4
        and abs(frac - 1.0 / N_PROC) < 1e-9
    )
    report = {
        "check": "2-process jax.distributed: process-local placement + "
        "cross-process ring-halo SpMM (gather and per-process-built BSR "
        "operators) + sharded train step vs single-process reference",
        "processes": N_PROC,
        "devices_per_process": DEV_PER_PROC,
        "spmm_max_abs_err": max_err,
        "spmm_halo_bsr_max_abs_err": max_err_bsr,
        "bsr_materialized_fraction_per_process": frac,
        "train_loss_rel_dev": loss_dev,
        "per_process": results,
        "single_process_losses": ref_losses,
        "pass": ok,
    }
    print(json.dumps(report))
    with open("MULTIHOST_r05.json", "w") as f:
        json.dump(report, f, indent=1)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
