"""Roofline: measured vs ATTAINABLE time for every Pallas kernel.

Round-3 verdict Next #3: "speed-of-light per chip" (BASELINE.json:5)
must be a checkable claim, not an assertion. MFU against bf16 peak is
the wrong yardstick for recurrences — the README performance model
argues (and A/B measurements confirm) that the real ceiling of a
serial-dependency kernel is the MXU's small-M weight-streaming cost
times the chain length, which no hardware parallelism can shorten.

This tool makes that arithmetic empirical instead of theoretical:
every floor is a SUM OF MEASURED BARE PRIMITIVES on the same chip —

- chain primitives: a minimal PALLAS kernel containing nothing but
  the real kernel's serial-dependency op at the exact same shapes
  (dual-direction recurrence matmul for BLSTM fwd/bwd, the 3-way
  log-sum-exp lattice update for CTC/RNN-T). Pallas, not lax.scan: an
  XLA scan carries per-iteration loop overhead the fused kernels
  don't, so a scan-based "floor" can come out ABOVE the kernel it is
  supposed to bound (measured: 7.7 ms bare XLA chain vs 8.4 ms full
  fused fwd kernel, while the fused fwd+bwd beat the two-scan "floor"
  outright).
- batched primitives: large-M matmul FLOP/s, elementwise tanh
  throughput and HBM read+write bandwidth, measured with bare
  carry-chained ops, applied to the kernel's block-batched work.

Tunnel discipline (CLAUDE.md): every measurement chains `inner`
iterations inside ONE jit, syncs by fetching a scalar, and subtracts
the separately-measured per-call dispatch+fetch round-trip, so the
axon tunnel's 10-30 ms call overhead cannot masquerade as kernel time.

measured/floor then answers the BASELINE claim per kernel; a kernel
below ~70% of its floor has real headroom. Writes one JSON line
(collect_bench_artifacts.sh convention):

    python tools/roofline.py [--out BENCH_extra/roofline.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_CALL_OVERHEAD_S = None


def _measure_call_overhead():
    """Round-trip cost of one dispatch + scalar fetch over the tunnel."""
    f = jax.jit(lambda c: c + 1.0)
    c = jnp.float32(0.0)
    float(f(c))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(f(c))
        best = min(best, time.time() - t0)
    return best


def _timed(step, init, inner: int, repeats: int = 2):
    """step: carry -> carry, iterated `inner` times inside one jit.
    Returns seconds per iteration, per-call overhead subtracted.
    The jitted wrapper returns (carry, scalar); only the scalar is
    fetched (fetching a big carry would drag the whole buffer through
    the tunnel), which forces completion on axon where
    block_until_ready does not block (CLAUDE.md)."""

    def looped(carry):
        def body(c, _):
            return step(c), None

        carry, _ = lax.scan(body, carry, None, length=inner)
        leaf = jax.tree.leaves(carry)[0]
        return carry, leaf.ravel()[0].astype(jnp.float32)

    f = jax.jit(looped)
    carry, s = f(init)
    float(s)  # compile + first run
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        carry, s = f(carry)
        float(s)
        best = min(best, time.time() - t0)
    if best < 2 * _CALL_OVERHEAD_S:
        print(
            f"[roofline] WARNING: measurement ({best*1e3:.1f} ms/call) "
            f"within 2x of call overhead — raise `inner` or suspect "
            f"the op was optimized away",
            file=sys.stderr,
        )
    return max(best - _CALL_OVERHEAD_S, 1e-9) / inner


# ------------------------------------------------- bare Pallas chains

def _dual_mm_chain_kernel(w1_ref, w2_ref, h_ref, o_ref, *, T, H,
                          expand):
    """T serial steps of two independent [B,K] @ [K,N] matmuls — the
    BLSTM recurrence chain with every non-chain op stripped. ``expand``
    mirrors the backward chain, where dgates [B,4H] are rebuilt from
    dh [B,H] on-chain before the next link."""

    def shrink(g):
        # [B,4H] -> [B,H] while keeping every output column LIVE (a
        # plain [:, :H] slice lets the compiler dead-code 3/4 of the
        # matmul — measured: the "floor" halves)
        return (
            g[:, :H] + 1e-20 * (
                g[:, H:2 * H] + g[:, 2 * H:3 * H] + g[:, 3 * H:]
            )
        )

    def body(i, carry):
        h1, h2 = carry
        g1 = jnp.dot(h1, w1_ref[...], preferred_element_type=jnp.float32)
        g2 = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
        if expand:  # [B,H] -> [B,4H], the dh -> dgates shape restore
            n1 = jnp.concatenate([g1] * 4, axis=1).astype(h1.dtype)
            n2 = jnp.concatenate([g2] * 4, axis=1).astype(h2.dtype)
        else:  # [B,4H] -> [B,H], the gates -> h shape restore
            n1 = shrink(g1).astype(h1.dtype)
            n2 = shrink(g2).astype(h2.dtype)
        return n1, n2

    h1, h2 = lax.fori_loop(0, T, body, (h_ref[...], h_ref[...]))
    o_ref[...] = h1 + h2


def _bare_mm_chain(B, H, T, direction, dtype=jnp.bfloat16):
    """Jittable carry -> carry step running the bare dual chain once."""
    if direction == "fwd":
        K, N, expand = H, 4 * H, False
        hshape = (B, H)
    else:
        K, N, expand = 4 * H, H, True
        hshape = (B, 4 * H)
    key = jax.random.PRNGKey(0)
    scale = 0.5 / jnp.sqrt(jnp.float32(K))
    w1 = (jax.random.normal(key, (K, N)) * scale).astype(dtype)
    w2 = (jax.random.normal(key, (K, N)) * scale).astype(dtype)

    kernel = pl.pallas_call(
        functools.partial(
            _dual_mm_chain_kernel, T=T, H=H, expand=expand
        ),
        out_shape=jax.ShapeDtypeStruct(hshape, dtype),
        in_specs=[
            pl.BlockSpec((K, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(hshape, lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            hshape, lambda: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    def step(h):
        return kernel(w1, w2, h)

    init = jnp.full(hshape, 0.1, dtype)
    return step, init


def _cell_chain_kernel(w1_ref, w2_ref, h_ref, o_ref, *, T, H):
    """T serial steps of the REAL dual-direction LSTM cell recurrence
    (matmul + f32 gate math), stripped of input projections, masking
    and output writes. The gate transcendentals sit ON the serial
    chain — h_{t+1} needs them — so this, not the pure-matmul chain,
    is the realistic attainable for any LSTM kernel."""

    def cell(h, c, w_ref):
        g = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(g[:, :H])
        gf = jax.nn.sigmoid(g[:, H:2 * H] + 1.0)
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        go = jax.nn.sigmoid(g[:, 3 * H:])
        c_new = gf * c + gi * gg
        return (go * jnp.tanh(c_new)).astype(h.dtype), c_new

    def body(i, carry):
        h1, c1, h2, c2 = carry
        h1, c1 = cell(h1, c1, w1_ref)
        h2, c2 = cell(h2, c2, w2_ref)
        return h1, c1, h2, c2

    h0 = h_ref[...]
    c0 = jnp.zeros(h0.shape, jnp.float32)
    h1, c1, h2, c2 = lax.fori_loop(0, T, body, (h0, c0, h0, c0))
    o_ref[...] = h1 + h2


def _bare_cell_chain(B, H, T, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(2)
    scale = 0.5 / jnp.sqrt(jnp.float32(H))
    w1 = (jax.random.normal(key, (H, 4 * H)) * scale).astype(dtype)
    w2 = (jax.random.normal(key, (H, 4 * H)) * scale).astype(dtype)
    hshape = (B, H)

    kernel = pl.pallas_call(
        functools.partial(_cell_chain_kernel, T=T, H=H),
        out_shape=jax.ShapeDtypeStruct(hshape, dtype),
        in_specs=[
            pl.BlockSpec((H, 4 * H), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hshape, lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            hshape, lambda: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    def step(h):
        return kernel(w1, w2, h)

    return step, jnp.full(hshape, 0.1, dtype)


def _elemwise_chain_kernel(x_ref, o_ref, *, T, op):
    """T serial passes of one elementwise op over a VMEM block — the
    VPU pass-throughput primitive, measured in Pallas so the rate is
    deterministic and VMEM-resident like the kernels it floors (the
    same probe as an XLA scan varies 10x run-to-run with the
    compiler's residency choices)."""

    def body(i, x):
        if op == "tanh":
            return jnp.tanh(x)
        return x * 1.0001 + 0.1

    o_ref[...] = lax.fori_loop(0, T, body, x_ref[...])


def _bare_elemwise_chain(op, n_sub=256, lanes=1024, T=8000):
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (n_sub, lanes), jnp.float32) * 0.1

    kernel = pl.pallas_call(
        functools.partial(_elemwise_chain_kernel, T=T, op=op),
        out_shape=jax.ShapeDtypeStruct((n_sub, lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec((n_sub, lanes), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_sub, lanes), lambda: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    def step(x):
        return kernel(x)

    return step, x0, n_sub * lanes * T


def _lse_chain_kernel(row_ref, a_ref, o_ref, *, T):
    """T serial steps of the masked 3-way log-sum-exp lattice update —
    the CTC forward/backward recursion with everything else stripped."""
    from nabu_tpu.ops.pallas.ctc_batched import _shift_right_lanes

    row = row_ref[...]

    def body(i, a):
        s1 = _shift_right_lanes(a, 1)
        s2 = _shift_right_lanes(a, 2)
        m = jnp.maximum(a, jnp.maximum(s1, s2))
        return m + jnp.log(
            jnp.exp(a - m) + jnp.exp(s1 - m) + jnp.exp(s2 - m)
        ) + row

    o_ref[...] = lax.fori_loop(0, T, body, a_ref[...])


def _bare_lse_chain(B, lanes, T):
    key = jax.random.PRNGKey(1)
    row = jax.random.normal(key, (B, lanes), jnp.float32) * 0.01

    kernel = pl.pallas_call(
        functools.partial(_lse_chain_kernel, T=T),
        out_shape=jax.ShapeDtypeStruct((B, lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec((B, lanes), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, lanes), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, lanes), lambda: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    def step(a):
        return kernel(row, a - a.mean())  # keep values bounded

    init = jnp.zeros((B, lanes), jnp.float32)
    return step, init


# ------------------------------------------------- throughput probes

def measure_primitives(B=32, H=320, T=1000):
    prim = {}
    key = jax.random.PRNGKey(0)

    # large-M matmul rate: a = a @ b chained (b spectral norm < 1 so
    # values stay bounded; MXU timing is value-independent)
    N = 6144
    b = (jax.random.normal(key, (N, N)) / jnp.sqrt(jnp.float32(N))
         * 0.5).astype(jnp.bfloat16)
    a0 = jax.random.normal(key, (N, N)).astype(jnp.bfloat16)
    t = _timed(lambda a: a @ b, a0, inner=100)
    prim["peak_flops"] = 2 * N**3 / t

    # bare Pallas chains at the BLSTM link shapes
    step, init = _bare_mm_chain(B, H, T, "fwd")
    prim["fwd_chain_ms"] = _timed(step, init, inner=60) * 1e3
    step, init = _bare_mm_chain(B, H, T, "bwd")
    prim["bwd_chain_ms"] = _timed(step, init, inner=60) * 1e3
    step, init = _bare_cell_chain(B, H, T)
    prim["cell_chain_ms"] = _timed(step, init, inner=60) * 1e3

    # bare Pallas lattice chain at the CTC shapes
    step, init = _bare_lse_chain(B, 256, T)
    prim["lse_chain_ms"] = _timed(step, init, inner=60) * 1e3
    prim["lse_chain_T"] = T

    # elementwise throughputs, measured as bare Pallas chains on a
    # VMEM block (deterministic; VMEM-resident like the kernels they
    # floor). tanh is the transcendental unit, fma the unit for
    # softmax/gather/scatter pass inventories.
    step, x0, n_ops = _bare_elemwise_chain("tanh")
    t = _timed(step, x0, inner=20)
    prim["tanh_per_s"] = n_ops / t
    step, x0, n_ops = _bare_elemwise_chain("fma")
    t = _timed(step, x0, inner=20)
    prim["mul_per_s"] = n_ops / t

    # HBM bandwidth: every chained-op probe tried through this tunnel
    # was eventually optimized out (constant folding for y+c,
    # scalar-tracking for y*s, pow-composition for sqrt chains) or
    # came out above the part's spec — so the floor term uses the
    # public spec sheet figure, labeled as such. It only enters two
    # small bandwidth terms (CTC logits traffic, STFT frame traffic).
    prim["hbm_bytes_per_s"] = 819e9
    prim["hbm_basis"] = "v5e spec sheet (probes unreliable via tunnel)"
    return prim


# ------------------------------------------------- kernel measurements

def measure_blstm(B=32, T=1000, D=640, H=320):
    from nabu_tpu.ops.pallas.blstm import blstm_apply_fused

    key = jax.random.PRNGKey(1)
    p = {
        d: {
            "wx": jax.random.normal(key, (D, 4 * H), jnp.bfloat16) * 0.05,
            "wh": jax.random.normal(key, (H, 4 * H), jnp.bfloat16) * 0.05,
            "b": jnp.zeros((4 * H,), jnp.bfloat16),
        }
        for d in ("fw", "bw")
    }
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    lengths = jnp.full((B,), T, jnp.int32)

    def fwd(c):
        out = blstm_apply_fused(p, x + c.astype(x.dtype), lengths)
        return c + out.astype(jnp.float32).sum() * 1e-20

    fwd_ms = _timed(fwd, jnp.float32(0.0), inner=40) * 1e3

    def fwdbwd(c):
        def loss(p, x):
            return blstm_apply_fused(p, x, lengths).astype(
                jnp.float32
            ).sum()

        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(
            p, x + c.astype(x.dtype)
        )
        return c + (l + grads[1].astype(jnp.float32).sum()) * 1e-20

    fwdbwd_ms = _timed(fwdbwd, jnp.float32(0.0), inner=30) * 1e3
    return fwd_ms, fwdbwd_ms


def measure_ctc(B=32, T=1000, V=31, L=100):
    from nabu_tpu.ops.pallas.ctc_batched import ctc_loss_pallas_batched

    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (B, T, V), jnp.float32)
    llen = jnp.full((B,), T, jnp.int32)
    labels = jax.random.randint(key, (B, L), 1, V)
    tlen = jnp.full((B,), L, jnp.int32)

    def fwdbwd(c):
        def loss(lg):
            return ctc_loss_pallas_batched(lg, llen, labels, tlen).sum()

        l, g = jax.value_and_grad(loss)(logits + c)
        return c + (l + g.sum()) * 1e-20

    return _timed(fwdbwd, jnp.float32(0.0), inner=40) * 1e3


def measure_rnnt(B=32, T=250, U=100, J=320, V=32):
    from nabu_tpu.ops.pallas.transducer import transducer_loss_fused

    key = jax.random.PRNGKey(3)
    enc = jax.random.normal(key, (B, T, J), jnp.bfloat16)
    pred = jax.random.normal(key, (B, U + 1, J), jnp.bfloat16)
    w = jax.random.normal(key, (J, V), jnp.bfloat16) * 0.05
    bias = jnp.zeros((V,), jnp.float32)
    llen = jnp.full((B,), T, jnp.int32)
    targets = jax.random.randint(key, (B, U), 0, V - 1)
    tlen = jnp.full((B,), U, jnp.int32)

    def fwdbwd(c):
        def loss(enc, pred, w):
            return transducer_loss_fused(
                enc, pred, w, bias, llen, targets, tlen
            ).sum()

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            enc + c.astype(enc.dtype), pred, w
        )
        return c + (l + grads[0].astype(jnp.float32).sum()) * 1e-20

    return _timed(fwdbwd, jnp.float32(0.0), inner=20) * 1e3


def measure_stft_mel(B=32, seconds=10.0, rate=16000, nfilt=80):
    from nabu_tpu.features import jax_frontend as jf
    from nabu_tpu.ops.pallas.stft_mel import stft_mel_pallas

    fp = jf.make_frontend_params(float(rate), nfilt=nfilt)
    W = fp.frame_len
    n = int(seconds * rate)
    nf = 1 + (n - W) // fp.frame_step
    N = B * nf
    key = jax.random.PRNGKey(4)
    frames = jax.random.normal(key, (N, W), jnp.float32)

    def fwd(c):
        out = stft_mel_pallas(
            frames + c, fp.window, fp.dft_cos, fp.dft_sin, fp.mel,
            fp.nfft,
        )
        return c + out.sum() * 1e-20

    ms = _timed(fwd, jnp.float32(0.0), inner=40) * 1e3
    return ms, dict(N=N, W=W, K=fp.dft_cos.shape[1], M=nfilt)


# ---------------------------------------------------------------- floors

def build_rows(prim, meas, B=32, T=1000, D=640, H=320):
    peak = prim["peak_flops"]
    rows = []

    def row(kernel, measured_ms, floor_ms, basis, attainable_ms=None):
        attainable_ms = attainable_ms or floor_ms
        rows.append({
            "kernel": kernel,
            "measured_ms": round(measured_ms, 3),
            "floor_ms": round(floor_ms, 3),
            "attainable_ms": round(attainable_ms, 3),
            "pct_of_attainable": round(
                100 * attainable_ms / measured_ms, 1
            ),
            "pct_of_floor": round(100 * floor_ms / measured_ms, 1),
            "floor_basis": basis,
        })

    # BLSTM forward. Hard floor: pure-matmul serial dual chain +
    # hoisted input projections. Realistic attainable: the LSTM cell
    # chain — the f32 gate transcendentals are ON the serial chain
    # (h_{t+1} needs them), so no LSTM kernel can reach the
    # matmul-only bound.
    proj_flops = 2 * (2 * B * T * D * 4 * H)  # both directions
    proj_ms = proj_flops / peak * 1e3
    floor = prim["fwd_chain_ms"] + proj_ms
    attain = prim["cell_chain_ms"] + proj_ms
    row(
        "blstm_fwd (1 layer, B=32 T=1000 D=640 H=320, bf16)",
        meas["blstm_fwd_ms"], floor,
        f"hard: bare Pallas dual [B,{H}]x[{H},{4*H}] matmul chain "
        f"{prim['fwd_chain_ms']:.2f} ms; attainable: full-cell chain "
        f"(matmul + on-chain f32 gate math) {prim['cell_chain_ms']:.2f}"
        f" ms; both + input-proj {proj_flops/1e9:.1f} GFLOP @ measured "
        f"peak {peak/1e12:.0f} TF/s = {proj_ms:.2f} ms",
        attainable_ms=attain,
    )

    # BLSTM fwd+bwd: both chains + all block-batched matmuls
    # (fwd proj, bwd gate recompute h@wh, dwh, dx, dwx). Attainable
    # swaps the fwd matmul chain for the full-cell chain (the bwd
    # chain's on-chain dgates VPU math is already approximated by the
    # concat-expand in the bare bwd chain).
    batched = proj_flops + 2 * (
        2 * B * T * H * 4 * H        # gate recompute per block
        + 2 * B * T * H * 4 * H      # dwh accumulation
        + 2 * B * T * 4 * H * D      # dx = dxw @ wx.T
        + 2 * B * T * D * 4 * H      # dwx = x.T @ dxw
    )
    batched_ms = batched / peak * 1e3
    floor = prim["fwd_chain_ms"] + prim["bwd_chain_ms"] + batched_ms
    attain = prim["cell_chain_ms"] + prim["bwd_chain_ms"] + batched_ms
    row(
        "blstm_fwd+bwd (1 layer, B=32 T=1000 D=640 H=320, bf16)",
        meas["blstm_fwdbwd_ms"], floor,
        f"fwd chain {prim['fwd_chain_ms']:.2f} (attainable: cell "
        f"chain {prim['cell_chain_ms']:.2f}) + bwd chain "
        f"{prim['bwd_chain_ms']:.2f} ms + block-batched matmuls "
        f"{batched/1e9:.1f} GFLOP @ {peak/1e12:.0f} TF/s = "
        f"{batched_ms:.2f} ms",
        attainable_ms=attain,
    )

    # CTC fwd+bwd: alpha chain + beta chain (same shape) + HBM traffic
    # for logits in / dlogits out (f32, V padded to lane width 128)
    lse2 = 2 * prim["lse_chain_ms"] * (T / prim["lse_chain_T"])
    ctc_bytes = 2 * B * T * 128 * 4
    bw_ms = ctc_bytes / prim["hbm_bytes_per_s"] * 1e3
    floor = lse2 + bw_ms
    row(
        "ctc_fwd+bwd (B=32 T=1000 V=31 L=100)",
        meas["ctc_ms"], floor,
        f"2 x bare Pallas [B,256] lse3 lattice chain "
        f"({prim['lse_chain_ms']:.2f} ms/{prim['lse_chain_T']} steps) "
        f"+ logits/dlogits HBM {ctc_bytes/1e6:.0f} MB @ measured "
        f"{prim['hbm_bytes_per_s']/1e9:.0f} GB/s = {bw_ms:.2f} ms",
    )

    # RNN-T fused joint+loss: block-batched joint matmuls (V padded to
    # 128 lanes — 4x pad waste on V=32 is part of the FLOOR, which is
    # why MFU-vs-peak is misleadingly low for this kernel) + the VPU
    # pass inventory (the kernel is elementwise-bound after sub_t
    # batching): tanh fwd + bwd recompute over [.,Jp], ~4 more
    # J-sized passes (enc+pred adds, tanh backward), and ~16 V-sized
    # passes (softmax fwd ~5, recompute ~5, sm + dlogits ~6), + the
    # [B,U1] lattice DP chain over T'
    Tr, U1p, J, Vp = 250, 128, 320, 128
    joint_flops = 2 * B * Tr * U1p * J * Vp      # fwd hidden @ w
    bwd_flops = 2 * joint_flops                  # dhidden, dw
    mm_ms = (joint_flops + bwd_flops) / peak * 1e3
    n_j = B * Tr * U1p * J
    tanh_ms = 2 * n_j / prim["tanh_per_s"] * 1e3
    lat_ms = 2 * prim["lse_chain_ms"] * (Tr / prim["lse_chain_T"])
    floor = mm_ms + tanh_ms + lat_ms
    row(
        "rnnt_joint+loss_fwd+bwd (B=32 T'=250 U=100 J=320 V=32)",
        meas["rnnt_ms"], floor,
        f"irreducible terms only: joint matmuls "
        f"{(joint_flops+bwd_flops)/1e9:.0f} GFLOP (V padded 32->128) "
        f"@ {peak/1e12:.0f} TF/s = {mm_ms:.2f} ms + {2*n_j/1e6:.0f}M "
        f"tanh @ measured {prim['tanh_per_s']/1e9:.1f} G/s = "
        f"{tanh_ms:.2f} ms + lattice chains {lat_ms:.2f} ms. The gap "
        f"is softmax/emit-gather/dlogits elementwise passes over the "
        f"padded V lanes (fused-pass count is scheduling-dependent, "
        f"so it is not floored); sub_t joint batching recovered 9% "
        f"(A/B in ops/pallas/transducer.py) and the kernel is "
        f"VPU-bound, not matmul-serialization-bound",
    )

    # STFT+Mel: pure batched matmul + bandwidth — whichever binds
    st = meas["stft_shapes"]
    Wp = ((st["W"] + 127) // 128) * 128
    Kp = ((st["K"] + 127) // 128) * 128
    Mp = ((st["M"] + 127) // 128) * 128
    flops = 2 * st["N"] * Wp * 2 * Kp + 2 * st["N"] * Kp * Mp
    mm_ms = flops / peak * 1e3
    bytes_ = st["N"] * (st["W"] + st["M"]) * 4
    bw_ms = bytes_ / prim["hbm_bytes_per_s"] * 1e3
    floor = max(mm_ms, bw_ms)
    row(
        "stft_mel (B=32, 10 s audio, 80 mel)",
        meas["stft_ms"], floor,
        f"max(DFT+mel matmuls {flops/1e9:.0f} GFLOP @ "
        f"{peak/1e12:.0f} TF/s = {mm_ms:.2f} ms, frames+mel HBM "
        f"{bytes_/1e6:.0f} MB @ {prim['hbm_bytes_per_s']/1e9:.0f} "
        f"GB/s = {bw_ms:.2f} ms)",
    )
    return rows


def main(argv=None) -> int:
    global _CALL_OVERHEAD_S
    p = argparse.ArgumentParser(prog="roofline", description=__doc__)
    p.add_argument("--out", default=None,
                   help="also write the JSON line to this path")
    args = p.parse_args(argv)

    dev = jax.devices()[0]
    print(f"[roofline] device: {dev.device_kind}", file=sys.stderr)
    _CALL_OVERHEAD_S = _measure_call_overhead()
    print(f"[roofline] call overhead: {_CALL_OVERHEAD_S*1e3:.1f} ms",
          file=sys.stderr)

    prim = measure_primitives()
    print(f"[roofline] primitives: {json.dumps(prim)}", file=sys.stderr)

    meas = {}
    meas["blstm_fwd_ms"], meas["blstm_fwdbwd_ms"] = measure_blstm()
    print(f"[roofline] blstm: {meas}", file=sys.stderr)
    meas["ctc_ms"] = measure_ctc()
    print(f"[roofline] ctc: {meas['ctc_ms']:.3f} ms", file=sys.stderr)
    meas["rnnt_ms"] = measure_rnnt()
    print(f"[roofline] rnnt: {meas['rnnt_ms']:.3f} ms", file=sys.stderr)
    meas["stft_ms"], meas["stft_shapes"] = measure_stft_mel()
    print(f"[roofline] stft: {meas['stft_ms']:.3f} ms", file=sys.stderr)

    rows = build_rows(prim, meas)
    out = {
        "metric": "roofline_pct_of_attainable",
        "value": round(
            min(r["pct_of_attainable"] for r in rows), 1
        ),
        "unit": "% (worst kernel)",
        "device": dev.device_kind,
        "call_overhead_ms": round(_CALL_OVERHEAD_S * 1e3, 2),
        "primitives": {k: round(v, 4) if isinstance(v, float) else v
                       for k, v in prim.items()},
        "rows": rows,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
