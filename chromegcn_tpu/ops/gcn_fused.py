"""Fused gated-GCN layer: GEMM + block-sparse SpMM + gate in ONE kernel.

The unfused layer (models/chrome.py, mirroring reference
models/SubLayers.py:42-52 + models/ChromeModels.py:38-40) runs per strand:

    support = X W            (XLA GEMM: read X, write support)
    y       = A @ support    (Pallas SpMM: read support + blocks, write y)
    z       = tanh(y + b)    (XLA elementwise)
    g       = sigmoid(z u + bu)
    x_next  = (1 - g) x + g z

Every arrow is an (N, d) HBM round-trip plus a dispatch; DESIGN.md §1
named this fusion the remaining lever. The DESIGN THAT SURVIVED
MEASUREMENT (round-3 TPU ablation, DESIGN.md §1) is a PARTIAL fusion:

- forward kernel: ``z = tanh((A @ X) W + b)`` in ONE pallas_call, using
  associativity — A (X W) == (A X) W — to stream blocks against X
  directly (no support scratch, no prologue GEMM) and fold the GEMM +
  bias + tanh into a row-blocked IN-PLACE epilogue on the accumulator.
  Two resident (N, d) buffers, exactly like the plain SpMM kernel, one
  output. The gate (z u reduction, sigmoid) and residual lerp stay in
  XLA, which fuses them into one elementwise pass.
- backward kernel: ``h = A^T ds`` accumulates the same way and the
  epilogue computes ``dx = dx_direct + h W^T`` in-kernel; the cheap
  cotangent algebra (ds, dW = X^T h, db, du, dbu) stays in XLA.

Measured-and-rejected alternative (do not retry, round-3 ablation on the
chr1 bench graph, fori timing, probe-relative numbers): the "everything
in one kernel" version — prologue GEMM into a VMEM scratch + gate/lerp
epilogue + TWO (N, d) outputs — ran 8.1 ms/call vs 1.6 ms for the plain
kernel. Each addition is cheap alone (+0.17 ms gate epilogue) but a
second full-size output costs +0.7 ms and a scratch-fed stream +0.74 ms
(Mosaic overheads, not bandwidth: tile DMA here is element-rate bound,
so the ~100 MB of HBM round-trips fusion saves are only worth
~0.1-0.3 ms at the 819 GB/s roofline), and combined they go
superadditive — four resident buffers starve the pipeline. Gradients of
the partial fusion are exact vs the unfused composition
(tests/test_fused.py).

VMEM budget: fwd two (N, d) f32 residents (~51 MB at the chr1 bucket),
bwd four (~103 MB) — within this chip's ~128 MB VMEM (measured,
CLAUDE.md). ``fused_fits`` gates callers; oversized graphs fall back to
the unfused path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from chromegcn_tpu.ops.spmm_pallas import (
    STRIP_R,
    STRIPS_PER_STEP,
    TILES_PER_STEP,
    BSRMatrix,
    BSROperator,
)

# The bwd kernel's four (N, d) f32 buffers must stay VMEM-resident (the
# fwd kernel needs only two — see module docstring).
_FUSED_RESIDENT_BYTES = 112 * 1024 * 1024
# Row-block height for the in-kernel GEMM / elementwise epilogue: bounds
# Mosaic's temporaries to ~1 MB instead of materializing (N, d) intermediates.
_ROW_BLK = 2048


def fused_fits(op: BSROperator, d: int) -> bool:
    """Whether the fused layer's VMEM-resident buffers fit this chip."""
    if not isinstance(op, BSROperator):
        return False
    m = op.fwd
    return 4 * max(m.n_rows, m.n_cols) * d * 4 <= _FUSED_RESIDENT_BYTES


def _row_blocks(n: int):
    blk = _ROW_BLK if n % _ROW_BLK == 0 else 128
    if n % blk != 0:  # fail loudly: a silent remainder would leave tail
        # rows of the epilogue un-activated (ADVICE r3)
        raise ValueError(f"n_rows={n} is not a multiple of row block {blk}")
    return blk, n // blk


def _fused_fwd_call(
    m: BSRMatrix, x: jax.Array, w: jax.Array, b: jax.Array
) -> jax.Array:
    """One pallas_call: z = tanh((A @ x) w + b).

    Associativity moves the GEMM AFTER the aggregation — A (x w) ==
    (A x) w — so the blocks stream against x directly (no scratch, no
    prologue) and the epilogue folds GEMM + bias + tanh into a row-blocked
    IN-PLACE rewrite of the accumulator: two resident buffers, one output,
    the same VMEM shape as the plain SpMM kernel (see module docstring for
    the measured-and-rejected full-fusion variant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr, tc = m.tile_r, m.tile_c
    nt, ns = m.tiles.shape[0], m.strips.shape[0]
    d = x.shape[1]
    assert x.shape[0] == m.n_cols and w.shape == (d, d)
    K, K2 = TILES_PER_STEP, STRIPS_PER_STEP
    assert nt % K == 0 and ns % K2 == 0
    st, ss = nt // K, ns // K2
    n_steps = st + ss

    fast = m.tiles.dtype == jnp.bfloat16
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    eblk, esteps = _row_blocks(m.n_rows)

    def kernel(rbt_ref, cbt_ref, rbs_ref, cbs_ref, live_ref, tiles_ref,
               strips_ref, x_ref, w_ref, b_ref, z_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            z_ref[:] = jnp.zeros_like(z_ref)

        # block streaming identical to spmm_pallas._bsr_matmul, straight
        # against the VMEM-resident x (live-count elision: dead bucketing
        # steps pin their block index and pl.when skips the compute)
        @pl.when(step < live_ref[0])
        def _():
            for k in range(K):
                t = step * K + k
                rb = pl.multiple_of(rbt_ref[t] * tr, tr)
                cb = pl.multiple_of(cbt_ref[t] * tc, tc)
                xs = x_ref[pl.ds(cb, tc), :]
                z_ref[pl.ds(rb, tr), :] += jnp.dot(
                    tiles_ref[k],
                    xs.astype(jnp.bfloat16) if fast else xs,
                    preferred_element_type=jnp.float32, precision=precision,
                )

        @pl.when((step >= st) & (step - st < live_ref[1]))
        def _():
            for k in range(K2):
                t = (step - st) * K2 + k
                ro = pl.multiple_of(rbs_ref[t] * STRIP_R, STRIP_R)
                co = pl.multiple_of(cbs_ref[t] * tc, tc)
                xs = x_ref[pl.ds(co, tc), :]
                z_ref[pl.ds(ro, STRIP_R), :] += jnp.dot(
                    strips_ref[k],
                    xs.astype(jnp.bfloat16) if fast else xs,
                    preferred_element_type=jnp.float32, precision=precision,
                )

        @pl.when(step == n_steps - 1)
        def _():
            # epilogue: acc -> tanh(acc @ w + b), row-blocked and in place
            # (the GEMM is row-local, so no cross-block dependency)
            for i in range(esteps):
                sl = pl.ds(i * eblk, eblk)
                z_ref[sl, :] = jnp.tanh(
                    jnp.dot(
                        z_ref[sl, :], w_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    + b_ref[0, :]
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (K, tr, tc),
                lambda s, rbt, cbt, rbs, cbs, live: (
                    jnp.minimum(s, live[0] - 1), 0, 0,
                ),
            ),
            pl.BlockSpec(
                (K2, STRIP_R, tc),
                lambda s, rbt, cbt, rbs, cbs, live: (
                    jnp.clip(s - st, 0, live[1] - 1), 0, 0,
                ),
            ),
            pl.BlockSpec((m.n_cols, d), lambda s, *_: (0, 0)),
            pl.BlockSpec((d, d), lambda s, *_: (0, 0)),
            pl.BlockSpec((1, d), lambda s, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m.n_rows, d), lambda s, *_: (0, 0)),
    )
    elem_bytes = 2 if fast else 4
    flops = 2 * (nt * tr * tc + ns * STRIP_R * tc) * d + 2 * m.n_rows * d * d
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m.n_rows, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(m.tiles.size + m.strips.size) * elem_bytes
            + x.size * 4 + m.n_rows * d * 4,
            transcendentals=m.n_rows * d,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=jax.default_backend() == "cpu",
    )(m.tile_rb, m.tile_cb, m.strip_rb, m.strip_cb, m.live, m.tiles,
      m.strips, x, w, b.reshape(1, d))


def _fused_bwd_call(
    m: BSRMatrix, ds: jax.Array, dx_dir: jax.Array, w: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One pallas_call: h = A^T ds (block-streamed) and dx = dx_dir + h W^T."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr, tc = m.tile_r, m.tile_c
    nt, ns = m.tiles.shape[0], m.strips.shape[0]
    d = ds.shape[1]
    assert ds.shape[0] == m.n_cols and dx_dir.shape[0] == m.n_rows
    K, K2 = TILES_PER_STEP, STRIPS_PER_STEP
    assert nt % K == 0 and ns % K2 == 0
    st, ss = nt // K, ns // K2
    n_steps = st + ss

    fast = m.tiles.dtype == jnp.bfloat16
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    eblk, esteps = _row_blocks(m.n_rows)

    def kernel(rbt_ref, cbt_ref, rbs_ref, cbs_ref, live_ref, tiles_ref,
               strips_ref, ds_ref, dxdir_ref, w_ref, h_ref, dx_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        @pl.when(step < live_ref[0])
        def _():
            for k in range(K):
                t = step * K + k
                rb = pl.multiple_of(rbt_ref[t] * tr, tr)
                cb = pl.multiple_of(cbt_ref[t] * tc, tc)
                xs = ds_ref[pl.ds(cb, tc), :]
                h_ref[pl.ds(rb, tr), :] += jnp.dot(
                    tiles_ref[k],
                    xs.astype(jnp.bfloat16) if fast else xs,
                    preferred_element_type=jnp.float32, precision=precision,
                )

        @pl.when((step >= st) & (step - st < live_ref[1]))
        def _():
            for k in range(K2):
                t = (step - st) * K2 + k
                ro = pl.multiple_of(rbs_ref[t] * STRIP_R, STRIP_R)
                co = pl.multiple_of(cbs_ref[t] * tc, tc)
                xs = ds_ref[pl.ds(co, tc), :]
                h_ref[pl.ds(ro, STRIP_R), :] += jnp.dot(
                    strips_ref[k],
                    xs.astype(jnp.bfloat16) if fast else xs,
                    preferred_element_type=jnp.float32, precision=precision,
                )

        @pl.when(step == n_steps - 1)
        def _():
            for i in range(esteps):
                sl = pl.ds(i * eblk, eblk)
                dx_ref[sl, :] = dxdir_ref[sl, :] + jnp.dot(
                    h_ref[sl, :], w_ref[:].T,
                    preferred_element_type=jnp.float32, precision=precision,
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (K, tr, tc),
                lambda s, rbt, cbt, rbs, cbs, live: (
                    jnp.minimum(s, live[0] - 1), 0, 0,
                ),
            ),
            pl.BlockSpec(
                (K2, STRIP_R, tc),
                lambda s, rbt, cbt, rbs, cbs, live: (
                    jnp.clip(s - st, 0, live[1] - 1), 0, 0,
                ),
            ),
            pl.BlockSpec((m.n_cols, d), lambda s, *_: (0, 0)),
            pl.BlockSpec((m.n_rows, d), lambda s, *_: (0, 0)),
            pl.BlockSpec((d, d), lambda s, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((m.n_rows, d), lambda s, *_: (0, 0)),
            pl.BlockSpec((m.n_rows, d), lambda s, *_: (0, 0)),
        ],
    )
    elem_bytes = 2 if fast else 4
    flops = 2 * (nt * tr * tc + ns * STRIP_R * tc) * d + 2 * m.n_rows * d * d
    h, dx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m.n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((m.n_rows, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(m.tiles.size + m.strips.size) * elem_bytes
            + (ds.size + dx_dir.size) * 4 + 2 * m.n_rows * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=jax.default_backend() == "cpu",
    )(m.tile_rb, m.tile_cb, m.strip_rb, m.strip_cb, m.live, m.tiles,
      m.strips, ds, dx_dir, w)
    return h, dx


@jax.custom_vjp
def fused_gated_layer(
    op: BSROperator, x: jax.Array, w: jax.Array, b: jax.Array,
    u: jax.Array, bu: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(x_next, z, g) = one gated GCN layer over a flat BSR adjacency.

    Equations (reference: models/SubLayers.py:42-52 +
    models/ChromeModels.py:38-40):
        z      = tanh(A (x w) + b)
        g      = sigmoid(z u + bu)          (per-node scalar gate)
        x_next = (1 - g) x + g z

    ``u`` is the gate Dense kernel (d, 1); ``bu`` its bias (1,). The
    kernel materializes ``z`` only; the gate GEMV/sigmoid and the lerp run
    in XLA (one fused elementwise pass — measured cheaper than a second
    full-size kernel output, see module docstring).
    """
    z = _fused_fwd_call(op.fwd, x, w, b)
    g = jax.nn.sigmoid(z @ u + bu)
    return (1.0 - g) * x + g * z, z, g


def _fused_fwd(op, x, w, b, u, bu):
    z = _fused_fwd_call(op.fwd, x, w, b)
    g = jax.nn.sigmoid(z @ u + bu)
    xn = (1.0 - g) * x + g * z
    return (xn, z, g), (op, x, w, u, bu, z, g)


def _fused_bwd(res, cots):
    op, x, w, u, bu, z, g = res
    dxn, dz_cot, dg_cot = cots
    # cotangent algebra of the gate + lerp (cheap XLA elementwise/GEMV)
    dg = jnp.sum(dxn * (z - x), axis=1, keepdims=True) + dg_cot
    dt = dg * g * (1.0 - g)
    dz = g * dxn + dz_cot + dt * u.reshape(1, -1)
    ds = dz * (1.0 - z * z)
    db = jnp.sum(ds, axis=0)
    du = z.T @ dt
    dbu = jnp.sum(dt, axis=0)
    dx_dir = (1.0 - g) * dxn
    # fused kernel: h = A^T ds and dx = dx_dir + h w^T
    h, dx = _fused_bwd_call(op.bwd, ds, dx_dir, w)
    dw = x.T @ h
    zero_op = jax.tree_util.tree_map(jnp.zeros_like, op)
    return zero_op, dx, dw, db, du, dbu


fused_gated_layer.defvjp(_fused_fwd, _fused_bwd)
