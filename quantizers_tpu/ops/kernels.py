"""Fused dequant-matmul Pallas TPU kernels.

These are the framework's native compute layer — the TPU equivalent of the
CUDA kernels the reference reaches through torch/llmcompressor (SURVEY.md
§7 step 2). Each kernel computes ``y = x @ W^T`` with the weight kept in
its compressed form in HBM and dequantized on the fly in VMEM, so decode-
time HBM traffic shrinks by the compression ratio (the whole point of
weight-only quantization at low batch):

* ``w4``   — INT4 group-quantized (W4A16): packed nibbles are *split-half*
  (see ops.linear), so unpacking is two shift/mask ops and the two nibble
  planes behave as two independent K-ranges, each with its own x and scale
  tiles routed in by BlockSpec index maps. No sublane interleave anywhere.
* ``w8``   — INT8 channel/group quantized.
* ``fp8``  — FP8 E4M3 with 128x128 block scales (FP8_BLOCK).
* ``nvfp4``— FP4 E2M1 with 16-wide micro-group scales (global scale folded
  into the effective scales at layout-build time).

All kernels accumulate f32 in VMEM scratch across the K grid dimension and
write bf16. The XLA reference path (ops.dispatch.xla_quant_matmul) is the
correctness oracle; kernels run in interpret mode on CPU in CI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import _on_tpu
from .linear import QuantLinear


class KernelUnsupported(Exception):
    """Raised when a layout/shape can't go through the fused kernel; the
    dispatcher falls back to the XLA path."""


def _interpret() -> bool:
    # Single source of truth shared with dispatch._on_tpu(): kernels run
    # compiled exactly when dispatch routes to them (incl. the tunneled
    # "axon" TPU backend), interpret-mode everywhere else (CPU CI).
    return not _on_tpu()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# Weight-tile budget. Decode-time quantized matmuls are HBM-streaming with
# tiny M. Measured on v5e (benchmarks/kernel_lab.py): full-row contiguous
# tiles around 2.5 MB stream at ~775 GB/s (95% of peak) while strided
# sub-row tiles peak near 500-590 GB/s — so the picker prefers bn == n and
# the budget admits (256, 9728)-class tiles. The dequant intermediates on
# the Mosaic stack bound it from above (scoped VMEM is 16 MB).
_W_TILE_BYTES = 2_600_000


def _pick_tiles(k_rows: int, n: int, row_quantum: int,
                n_quantum: int = 128, elem_bytes: float = 1.0,
                budget: int = _W_TILE_BYTES) -> Tuple[int, int]:
    """Choose (block_rows, bn) for a (k_rows, n) weight operand: prefer
    bn == n (contiguous DMA), then the largest row-divisor multiple of
    ``row_quantum`` fitting the tile budget. ``elem_bytes`` sizes the
    payload element (0.5 for int4)."""
    bn = n
    while bn > n_quantum and (n % bn or bn * row_quantum * elem_bytes > budget):
        # walk down through divisors of n that are multiples of n_quantum
        bn -= n_quantum
        while bn > n_quantum and n % bn:
            bn -= n_quantum
    best = 0
    r = row_quantum
    while r <= k_rows:
        if k_rows % r == 0 and r * bn * elem_bytes <= budget:
            best = r
        r += row_quantum
    if best == 0:
        raise KernelUnsupported(
            f"no valid tiling for ({k_rows}, {n}) with row quantum {row_quantum}")
    return best, bn


def _flatten_x(x: jax.Array, k: int):
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    return x.reshape(m, k), lead


def _pad_m(x2: jax.Array, bm: int) -> jax.Array:
    m = x2.shape[0]
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2


# ---------------------------------------------------------------------------
# W4A16: packed uint8 (K/2, N), scales (K/g, N)
# ---------------------------------------------------------------------------

def _w4_kernel(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, g: int, bk2: int, n_k: int):
    """VPU-minimal dequant, per-group-dot formulation (fastest of the
    measured variants — see benchmarks/kernel_lab.py):

    * the packed payload stores ``value + 8`` in [0, 15]; the kernel dots
      the *unshifted* codes group by group and applies the group scale to
      the (bm, bn) f32 partial — so per weight the VPU does only
      mask-or-shift + cvt (the scale multiply touches the g×-smaller
      partial, and there is no reshape-broadcast relayout, which measured
      ~2× slower than this form);
    * the +8 storage offset is removed analytically,
      ``x @ ((c-8)·s) == x @ (c·s) − (Σ_{k∈g} x_k)·(8·s_g)``, with the
      group sums computed by an MXU dot against an iota indicator matrix
      (Mosaic cannot lane-split reshape x) and the correction applied in
      f32 — strictly better precision than dequantize-then-dot in bf16.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk2 // g

    # group-membership indicator (bk2, gcount) for the per-group x sums.
    rows = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 1)
    G = (rows // g == cols).astype(jnp.bfloat16)

    for x_ref, shift, s_ref in ((x_lo, 0, s_lo), (x_hi, 4, s_hi)):
        x = x_ref[:]
        s = s_ref[:].astype(jnp.float32)  # (gcount, bn)
        for gi in range(gcount):
            # widen to i32 before bit-ops: Mosaic (v5e) legalizes neither
            # vector<i8> arithmetic nor direct u8->float casts. The widen
            # zero-extends, so the high nibble needs no mask after >>4.
            blk = w_ref[gi * g:(gi + 1) * g, :].astype(jnp.int32)
            codes = ((blk >> shift).astype(jnp.bfloat16) if shift
                     else (blk & 0x0F).astype(jnp.bfloat16))
            part = jnp.dot(x[:, gi * g:(gi + 1) * g], codes,
                           preferred_element_type=jnp.float32)
            acc[:] += part * s[gi:gi + 1, :]
        xg = jnp.dot(x, G, preferred_element_type=jnp.float32)  # (bm, gcount)
        acc[:] += jnp.dot(xg, s * -8.0, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g", "bm", "bn", "bk2", "interpret"))
def _w4_matmul_2d(x2, packed, scale, *, g, bm, bn, bk2, interpret):
    m, k = x2.shape
    k2, n = packed.shape
    n_k = k2 // bk2
    grid = (m // bm, n // bn, n_k)

    # x is consumed twice: rows for the low plane [0, K/2) and the high
    # plane [K/2, K). Block index maps route each plane its own K-range.
    x_lo_spec = pl.BlockSpec((bm, bk2), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM)
    x_hi_spec = pl.BlockSpec((bm, bk2), lambda i, j, ki: (i, ki + n_k), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bk2, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM)
    sg = bk2 // g
    s_lo_spec = pl.BlockSpec((sg, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM)
    s_hi_spec = pl.BlockSpec((sg, bn), lambda i, j, ki: (ki + n_k, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM)

    kernel = functools.partial(_w4_kernel, g=g, bk2=bk2, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_lo_spec, x_hi_spec, w_spec, s_lo_spec, s_hi_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k2 * n + (k // g) * n * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, x2, packed, scale, scale)


def _w4i_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, g: int, bk: int, n_k: int):
    """Native-int4 weight path: the S4 VMEM tile converts to bf16 with one
    hardware cvt per group slab (no i32 widen / shift / mask chains), then
    the per-group-dot formulation applies scales to f32 partials. Measured
    at the DMA floor (628 vs 630 GB/s copy floor, benchmarks/kernel_lab6.py)
    — 1.7x the packed-u8 kernel, whose VPU unpack chain is compute-bound."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:]
    s = s_ref[:].astype(jnp.float32)
    for gi in range(bk // g):
        codes = w_ref[gi * g:(gi + 1) * g, :].astype(jnp.bfloat16)
        part = jnp.dot(x[:, gi * g:(gi + 1) * g], codes,
                       preferred_element_type=jnp.float32)
        acc[:] += part * s[gi:gi + 1, :]

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g", "bm", "bn", "bk", "interpret"))
def _w4i_matmul_2d(x2, w_i4, scale, *, g, bm, bn, bk, interpret):
    m, k = x2.shape
    _, n = w_i4.shape
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)

    return pl.pallas_call(
        functools.partial(_w4i_kernel, g=g, bk=bk, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n // 2 + (k // g) * n * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w_i4, scale)


def w4_matmul(x: jax.Array, lin: QuantLinear, interpret: Optional[bool] = None) -> jax.Array:
    md = lin.meta_dict
    k, n, g = int(md["k"]), int(md["n"]), int(md["group_size"])
    if lin.zero_point is not None:
        raise KernelUnsupported("asymmetric w4 goes through the XLA path")
    if k % (2 * g) or n % 128 or g % 2:
        raise KernelUnsupported(f"w4 kernel needs 2g|K and 128|N (k={k}, n={n}, g={g})")

    x2, lead = _flatten_x(x, k)
    m = x2.shape[0]
    bm = 16 if m <= 16 else (32 if m <= 32 else 128)

    if lin.weight.dtype == jnp.int4:
        # signed (K, N) layout (ops.linear.w4_packed_to_int4)
        bk, bn = _pick_tiles(k, n, max(8 * g, 32), elem_bytes=0.5)
        x2 = _pad_m(x2.astype(jnp.bfloat16), bm)
        out = _w4i_matmul_2d(
            x2, lin.weight, lin.scale, g=g, bm=bm, bn=bn, bk=bk,
            interpret=_interpret() if interpret is None else interpret,
        )
        return out[:m].reshape(*lead, n).astype(x.dtype)

    # one k-step covers bk2 packed rows = bk2 weights per plane
    bk2, bn = _pick_tiles(k // 2, n, 8 * g)  # scale tile rows (bk2/g) must be %8

    x2 = _pad_m(x2.astype(jnp.bfloat16), bm)
    out = _w4_matmul_2d(
        x2, lin.weight, lin.scale, g=g, bm=bm, bn=bn, bk2=bk2,
        interpret=_interpret() if interpret is None else interpret,
    )
    return out[:m].reshape(*lead, n).astype(x.dtype)


# ---------------------------------------------------------------------------
# NVFP4: packed codes uint8 (K/2, N), effective scales (K/16, N)
# ---------------------------------------------------------------------------

def _fp4_decode(codes_u8: jax.Array) -> jax.Array:
    """E2M1 code (0..15) -> float32, branch-free-ish: value = (0.5*m if e==0
    else (1 + 0.5*m) * 2^(e-1)), sign from bit 3."""
    c = codes_u8.astype(jnp.int32)
    m = (c & 1).astype(jnp.float32)
    e = (c >> 1) & 0x3
    mag = jnp.where(
        e == 0, 0.5 * m,
        jnp.where(e == 1, 1.0 + 0.5 * m,
        jnp.where(e == 2, 2.0 + m, 4.0 + 2.0 * m)),
    )
    sign = jnp.where((c >> 3) & 1 == 1, -1.0, 1.0)
    return sign * mag


def _nvfp4_kernel(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, g: int, bk2: int, n_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    # widen u8 -> i32 before bit ops (Mosaic cannot legalize u8 shifts)
    packed = w_ref[:].astype(jnp.int32)
    lo = _fp4_decode(packed & 0x0F)
    hi = _fp4_decode((packed >> 4) & 0x0F)

    def plane(vals_f32, s_ref):
        scale = s_ref[:].astype(jnp.float32)
        reps = bk2 // g
        w = vals_f32.reshape(reps, g, -1) * scale[:, None, :]
        return w.reshape(bk2, -1).astype(jnp.bfloat16)

    acc[:] += jnp.dot(x_lo[:], plane(lo, s_lo), preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(x_hi[:], plane(hi, s_hi), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g", "bm", "bn", "bk2", "interpret"))
def _nvfp4_matmul_2d(x2, packed, scale, *, g, bm, bn, bk2, interpret):
    m, k = x2.shape
    k2, n = packed.shape
    n_k = k2 // bk2
    grid = (m // bm, n // bn, n_k)
    sg = bk2 // g

    return pl.pallas_call(
        functools.partial(_nvfp4_kernel, g=g, bk2=bk2, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk2), lambda i, j, ki: (i, ki + n_k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, bn), lambda i, j, ki: (ki + n_k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k2 * n + (k // g) * n * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, x2, packed, scale, scale)


def _nvfp4_i8_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, g: int, bk: int, n_k: int):
    """int8-doubled nvfp4 layout (2x values, halved scales): plain int
    widen+cvt replaces the branchless E2M1 arithmetic chain that made the
    packed-u8 kernel compute-bound (and crash Mosaic at dense shapes).
    Measured 713 GB/s at full-row tiles — benchmarks/kernel_lab7.py."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    vals = w_ref[:].astype(jnp.int32).astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    n = vals.shape[-1]
    w = (vals.reshape(bk // g, g, n) * s[:, None, :]).reshape(bk, n)
    acc[:] += jnp.dot(x_ref[:], w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g", "bm", "bn", "bk", "interpret"))
def _nvfp4_i8_matmul_2d(x2, w_i8, scale, *, g, bm, bn, bk, interpret):
    m, k = x2.shape
    _, n = w_i8.shape
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)

    return pl.pallas_call(
        functools.partial(_nvfp4_i8_kernel, g=g, bk=bk, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + (k // g) * n * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w_i8, scale)


def nvfp4_matmul(x: jax.Array, lin: QuantLinear, interpret: Optional[bool] = None) -> jax.Array:
    md = lin.meta_dict
    k, n, g = int(md["k"]), int(md["n"]), int(md.get("group_size", 16))
    if k % (2 * g) or n % 128:
        raise KernelUnsupported(f"nvfp4 kernel needs 2g|K and 128|N (k={k}, n={n})")

    x2, lead = _flatten_x(x, k)
    m = x2.shape[0]
    bm = 16 if m <= 16 else (32 if m <= 32 else 128)

    weight, scale = lin.weight, lin.scale
    if weight.dtype == jnp.uint8 and not _interpret():
        # compiled TPU path: the packed-u8 nvfp4 kernel crashes the Mosaic
        # compiler at production shapes (bench_kernels.py); convert to the
        # int8-doubled layout in place. Serving params are pre-converted
        # by i4_device_layout, so this only costs calibration-style
        # callers one extra weight pass.
        from .linear import nvfp4_packed_to_i8

        weight = nvfp4_packed_to_i8(weight)
        scale = (scale.astype(jnp.float32) * 0.5).astype(scale.dtype)

    if weight.dtype == jnp.int8:
        bk, bn = _pick_tiles(k, n, 8 * g)
        x2 = _pad_m(x2.astype(jnp.bfloat16), bm)
        out = _nvfp4_i8_matmul_2d(
            x2, weight, scale, g=g, bm=bm, bn=bn, bk=bk,
            interpret=_interpret() if interpret is None else interpret,
        )
        return out[:m].reshape(*lead, n).astype(x.dtype)

    bk2, bn = _pick_tiles(k // 2, n, 8 * g)  # scale tile rows (bk2/g) must be %8

    x2 = _pad_m(x2.astype(jnp.bfloat16), bm)
    out = _nvfp4_matmul_2d(
        x2, lin.weight, lin.scale, g=g, bm=bm, bn=bn, bk2=bk2,
        interpret=_interpret() if interpret is None else interpret,
    )
    return out[:m].reshape(*lead, n).astype(x.dtype)


# ---------------------------------------------------------------------------
# FP8 block (128x128): w fp8 (K, N), scale f32 (K/128, N/128)
# ---------------------------------------------------------------------------

def _fp8_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, bn: int, n_k: int):
    """One 128-row k-block per grid step. The scale row for this step is
    selected by a statically-unrolled ``pl.when`` ladder over the FULL
    resident scale block — a (1, bn) slice then broadcasts over the
    weight block's sublanes naturally. Every other formulation of
    128x128-block scaling dies on TPU tiling rules or crashes Mosaic:
    (bk//128, bn//128) scale blocks have 2-8 sublane rows (rejected),
    and both jnp.repeat and pltpu.repeat lane expansions of row-expanded
    scales crash the compiler at production shapes
    (benchmarks/bench_kernels.py caught all three)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    for r in range(n_k):
        @pl.when(ki == r)
        def _step(r=r):
            wd = (w_ref[:].astype(jnp.float32) * s_ref[r:r + 1, :]
                  ).astype(jnp.bfloat16)
            acc[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _fp8_matmul_2d(x2, w8, scale_n, *, bm, bn, interpret):
    # scale_n is pre-expanded along N to (K/128, N) f32 (1/256 of the
    # weight bytes); the (k//128, bn) block is legal because its row
    # count equals the full array dim.
    m, k = x2.shape
    _, n = w8.shape
    n_k = k // 128
    grid = (m // bm, n // bn, n_k)

    return pl.pallas_call(
        functools.partial(_fp8_kernel, bn=bn, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 128), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_k, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + (k // 128) * n * 4 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w8, scale_n)


def fp8_matmul(x: jax.Array, lin: QuantLinear, interpret: Optional[bool] = None) -> jax.Array:
    md = lin.meta_dict
    k, n = int(md["k"]), int(md["n"])
    if md.get("strategy") != "block":
        raise KernelUnsupported("fp8 kernel currently covers block strategy only")
    if not (_interpret() if interpret is None else interpret):
        # compiled TPU: every fused formulation of 128x128 block scaling
        # measured or crashed worse than XLA's dequant+matmul fallback —
        # (bk//128, bn//128) scale blocks violate tiling rules, both
        # repeat-based lane expansions crash Mosaic, and the unrolled
        # pl.when row ladder runs at 15 GB/s (benchmarks/bench_kernels.py).
        # Until a viable formulation exists, hardware goes through XLA.
        raise KernelUnsupported("fp8-block fused kernel loses to the XLA path on TPU")
    bk_blk, bn_blk = int(md["block_k"]), int(md["block_n"])
    if bk_blk != 128 or bn_blk != 128 or k % 128 or n % 128:
        raise KernelUnsupported(f"fp8 kernel needs 128x128 blocks and 128|K,N (k={k}, n={n})")

    bk, bn = _pick_tiles(k, n, 128)
    del bk  # the kernel steps in fixed 128-row k-blocks
    if bn % 128:
        raise KernelUnsupported(f"fp8 kernel needs 128|bn (bn={bn})")

    x2, lead = _flatten_x(x, k)
    m = x2.shape[0]
    bm = 16 if m <= 16 else (32 if m <= 32 else 128)
    x2 = _pad_m(x2.astype(jnp.bfloat16), bm)

    scale_n = jnp.repeat(lin.scale.astype(jnp.float32), 128, axis=1)[:, :n]
    out = _fp8_matmul_2d(
        x2, lin.weight, scale_n, bm=bm, bn=bn,
        interpret=_interpret() if interpret is None else interpret,
    )
    return out[:m].reshape(*lead, n).astype(x.dtype)


# ---------------------------------------------------------------------------
# W8 (int8 channel/group)
# ---------------------------------------------------------------------------

def _w8_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, g: Optional[int], bk: int, n_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    # widen i8 -> i32 first (Mosaic cannot cast i8 vectors to float directly)
    w = w_ref[:].astype(jnp.int32).astype(jnp.float32)
    if g:
        scale = s_ref[:].astype(jnp.float32)
        wd = (w.reshape(bk // g, g, -1) * scale[:, None, :]).reshape(bk, -1)
    else:
        wd = w * s_ref[:].astype(jnp.float32)  # (1, bn) broadcast
    acc[:] += jnp.dot(x_ref[:], wd.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g", "bm", "bn", "bk", "interpret"))
def _w8_matmul_2d(x2, w8, scale, *, g, bm, bn, bk, interpret):
    m, k = x2.shape
    _, n = w8.shape
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)
    if g:
        s_spec = pl.BlockSpec((bk // g, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM)
    else:
        s_spec = pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_w8_kernel, g=g, bk=bk, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, w8, scale)


def w8_matmul(x: jax.Array, lin: QuantLinear, interpret: Optional[bool] = None) -> jax.Array:
    md = lin.meta_dict
    k, n = int(md["k"]), int(md["n"])
    g = md.get("group_size")
    if lin.zero_point is not None:
        raise KernelUnsupported("asymmetric w8 goes through the XLA path")
    if n % 128 or k % 256:
        raise KernelUnsupported(f"w8 kernel needs 128|N, 256|K (k={k}, n={n})")
    bk, bn = _pick_tiles(k, n, max(8 * int(g or 0), 256))
    if g and bk % int(g):
        raise KernelUnsupported(f"w8 kernel: group {g} must divide bk {bk}")

    x2, lead = _flatten_x(x, k)
    m = x2.shape[0]
    bm = 16 if m <= 16 else (32 if m <= 32 else 128)
    x2 = _pad_m(x2.astype(jnp.bfloat16), bm)

    out = _w8_matmul_2d(
        x2, lin.weight, lin.scale, g=None if not g else int(g), bm=bm, bn=bn, bk=bk,
        interpret=_interpret() if interpret is None else interpret,
    )
    return out[:m].reshape(*lead, n).astype(x.dtype)


KERNELS = {
    "w4": w4_matmul,
    "w8": w8_matmul,
    "fp8": fp8_matmul,
    "nvfp4": nvfp4_matmul,
}


# ---------------------------------------------------------------------------
# Decode attention with in-place KV-cache update
# ---------------------------------------------------------------------------

def _dec_attn_kernel(len_ref, q_ref, nk_ref, nv_ref, kc_ref, vc_ref,
                     ctx_ref, ko_ref, vo_ref,
                     kbuf, vbuf, k8, v8, sk, sv, swk, swv,
                     *, S: int, KV: int, rep: int, sm_scale: float,
                     n_chunks: int):
    """One grid step per batch row: ALL heads' strips move in one
    contiguous (KV, S, hd) DMA (per-(b,h) gridding measured ~1 µs/step of
    pure overhead — 2304 steps/model-step ≈ 2.9 ms), and all heads'
    attention runs as ONE flattened (KV·rep, KV·S) dot with a
    block-diagonal head mask, so the MXU sees two big matmuls instead of
    2·KV small ones. Cross-head score blocks are masked to -inf and
    contribute zeros through the value dot.

    The strip fetch covers only the *valid prefix* [0, L], not the
    allocated window, so early-in-sequence steps cost a fraction of the
    full-cache roofline (the serving win that pushes vs_baseline past the
    naive full-window model). The prefix length is quantized to
    ``n_chunks`` static sizes and exactly ONE ``pl.when`` branch fires a
    single k + v DMA pair — a per-chunk copy loop costs 2 scalar-core DMA
    issues per chunk and measured ~4x the strip's pure stream time at
    B=8. Unread V rows are zeroed before the value dot: their probability
    columns are exactly 0 after the mask+softmax, but stale VMEM can hold
    NaN bit patterns and 0*NaN would poison the row sums. Unread K rows
    need no such care — their scores are masked to -1e30 before softmax.
    """
    b = pl.program_id(0)
    B = pl.num_programs(0)
    bank = jax.lax.rem(b, 2)
    L = len_ref[b]
    # aligned 8-row window containing L — Mosaic only allows HBM slices at
    # provable sublane multiples, so the in-place row write is an aligned
    # 8-row read-modify-write (~KV·4 KB, negligible next to the strip read)
    A = pl.multiple_of((L // 8) * 8, 8)

    CH = S // n_chunks

    def fetch(step, bank_i):
        # strip + RMW-window DMAs for batch row `step` into bank
        # `bank_i` — issued one grid step AHEAD so their latency hides
        # under the previous row's compute instead of serializing with it
        Ls = len_ref[step]
        nr = Ls // CH + 1
        for c in range(1, n_chunks + 1):
            @pl.when(nr == c)
            def _f(c=c):
                pltpu.make_async_copy(kc_ref.at[step, :, pl.ds(0, c * CH)],
                                      kbuf.at[bank_i, :, pl.ds(0, c * CH)],
                                      sk.at[bank_i]).start()
                pltpu.make_async_copy(vc_ref.at[step, :, pl.ds(0, c * CH)],
                                      vbuf.at[bank_i, :, pl.ds(0, c * CH)],
                                      sv.at[bank_i]).start()
        As = pl.multiple_of((Ls // 8) * 8, 8)
        pltpu.make_async_copy(ko_ref.at[step, :, pl.ds(As, 8)],
                              k8.at[bank_i], swk.at[bank_i]).start()
        pltpu.make_async_copy(vo_ref.at[step, :, pl.ds(As, 8)],
                              v8.at[bank_i], swv.at[bank_i]).start()

    @pl.when(b == 0)
    def _first():
        # zero both V banks once: rows beyond the valid prefix multiply
        # exactly-zero probabilities (masked softmax), which is only safe
        # for *finite* stale data — uninitialized VMEM can hold NaN bits
        vbuf[:] = jnp.zeros_like(vbuf)
        fetch(0, 0)

    @pl.when(b + 1 < B)
    def _prefetch():
        fetch(b + 1, jax.lax.rem(b + 1, 2))

    new_k = nk_ref[0]  # (KV, 1, dk)
    new_v = nv_ref[0]  # (KV, 1, dv)

    pltpu.make_async_copy(ko_ref.at[b, :, pl.ds(A, 8)],
                          k8.at[bank], swk.at[bank]).wait()
    pltpu.make_async_copy(vo_ref.at[b, :, pl.ds(A, 8)],
                          v8.at[bank], swv.at[bank]).wait()
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    k8[bank] = jnp.where(sub == L - A, new_k, k8[bank])
    v8[bank] = jnp.where(sub == L - A, new_v, v8[bank])
    wk = pltpu.make_async_copy(k8.at[bank], ko_ref.at[b, :, pl.ds(A, 8)],
                               swk.at[bank])
    wv = pltpu.make_async_copy(v8.at[bank], vo_ref.at[b, :, pl.ds(A, 8)],
                               swv.at[bank])
    wk.start()
    wv.start()

    nread = L // CH + 1  # chunks covering rows 0..L (merge row included)
    for c in range(1, n_chunks + 1):
        @pl.when(nread == c)
        def _join(c=c):
            pltpu.make_async_copy(kc_ref.at[b, :, pl.ds(0, c * CH)],
                                  kbuf.at[bank, :, pl.ds(0, c * CH)],
                                  sk.at[bank]).wait()
            pltpu.make_async_copy(vc_ref.at[b, :, pl.ds(0, c * CH)],
                                  vbuf.at[bank, :, pl.ds(0, c * CH)],
                                  sv.at[bank]).wait()
    # resolve the fetch/write-back race on the A..A+8 window by storing
    # the merged window into the strips (an aligned 8-row VMEM store; the
    # full-S register-level `where` merge this replaces cost ~2 us/step)
    kbuf[bank, :, pl.ds(A, 8)] = k8[bank]
    vbuf[bank, :, pl.ds(A, 8)] = v8[bank]
    dk = kbuf.shape[-1]
    dv = vbuf.shape[-1]
    k_use = kbuf[bank].reshape(KV * S, dk)
    v_use = vbuf[bank].reshape(KV * S, dv)

    q = q_ref[0].reshape(KV * rep, dk)
    scores = jax.lax.dot_general(
        q, k_use, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (KV*rep, KV*S)
    r_head = jax.lax.broadcasted_iota(jnp.int32, (KV * rep, KV * S), 0) // rep
    col = jax.lax.broadcasted_iota(jnp.int32, (KV * rep, KV * S), 1)
    allow = (r_head == col // S) & (col % S <= L)
    scores = jnp.where(allow, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_use.dtype)
    ctx = jnp.dot(probs, v_use, preferred_element_type=jnp.float32)
    ctx_ref[0] = ctx.reshape(KV, rep, dv).astype(ctx_ref.dtype)

    wk.wait()
    wv.wait()


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def _decode_attention_call(q, new_k, new_v, cache_k, cache_v, lengths,
                           *, sm_scale, interpret):
    B, KV, rep, dk = q.shape
    S = cache_k.shape[2]
    dv = cache_v.shape[3]
    # valid-prefix fetch granularity: one static-size DMA either way, but
    # 16 branches measured slower than 8 (1513 vs 1537 tok/s on bench.py)
    # — scalar-core branch evaluation outweighs the finer-prefix savings
    n_chunks = 8
    while n_chunks > 1 and S % (n_chunks * 8):
        n_chunks //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, KV, rep, dk), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # new rows as (B, KV, 1, hd) VMEM blocks (block dims equal the
            # array dims, satisfying the last-two-dims tiling rule)
            pl.BlockSpec((1, KV, 1, dk), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, 1, dv), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, KV, rep, dv), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KV, S, dk), cache_k.dtype),
            pltpu.VMEM((2, KV, S, dv), cache_v.dtype),
            pltpu.VMEM((2, KV, 8, dk), cache_k.dtype),
            pltpu.VMEM((2, KV, 8, dv), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    ctx, k_out, v_out = pl.pallas_call(
        functools.partial(_dec_attn_kernel, S=S, KV=KV, rep=rep,
                          sm_scale=sm_scale, n_chunks=n_chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, rep, dv), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # inputs are numbered with the scalar-prefetch operand first:
        # 0=lengths 1=q 2=new_k 3=new_v 4=cache_k 5=cache_v
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, q, new_k, new_v, cache_k, cache_v)
    return ctx, k_out, v_out


def decode_attention(q, new_k, new_v, cache_k, cache_v, lengths,
                     sm_scale: float, interpret: Optional[bool] = None):
    """One-token GQA/MHA attention over a head-major KV cache with the
    new row written IN PLACE (``input_output_aliases``) — the decode loop
    carries the same HBM buffers forever instead of copying ~the whole
    cache every step (measured: any functional cache update costs ~2.5 ms
    per 36-layer step at B=8, S=512; this kernel makes it ~free).

    q (B, KV, rep, dk); new_k (B, KV, dk); new_v (B, KV, dv);
    cache_k (B, KV, S, dk); cache_v (B, KV, S, dv); lengths (B,) int32 —
    write position per row; attention admits positions <= lengths.
    Returns (ctx (B, KV, rep, dv), k_cache', v_cache').
    """
    if cache_k.dtype != q.dtype:
        raise KernelUnsupported("fp8/mixed-dtype kv-cache decode goes through the XLA path")
    B, KV, rep, dk = q.shape
    # HBM DMA slices need the trailing (head) dim 128-aligned on real
    # hardware (MLA's dk=192 K head falls back to the XLA path until the
    # latent-cache decode lands)
    if dk % 128 or cache_v.shape[3] % 128:
        raise KernelUnsupported("decode_attention needs 128|head_dim")
    if cache_k.shape[2] % 8:
        raise KernelUnsupported("decode_attention needs 8|S (aligned RMW window)")
    # clamp the write position into the cache: an out-of-range length would
    # otherwise make the aligned RMW window A=(L//8)*8 slice HBM out of
    # bounds (serve.session resets idle slots, but the kernel stays safe
    # regardless of caller bookkeeping)
    lengths = jnp.minimum(lengths.astype(jnp.int32), cache_k.shape[2] - 1)
    return _decode_attention_call(
        q, new_k[:, :, None, :], new_v[:, :, None, :], cache_k, cache_v,
        lengths, sm_scale=float(sm_scale),
        interpret=_interpret() if interpret is None else interpret)


# ---------------------------------------------------------------------------
# Absorbed (latent-cache) MLA decode attention
# ---------------------------------------------------------------------------

def _mla_dec_kernel(len_ref, qa_ref, qp_ref, nc_ref, np_ref, cc_ref, pc_ref,
                    ctx_ref, co_ref, po_ref,
                    cbuf, pbuf, c8, p8, sc, sp, swc, swp,
                    *, S: int, r: int, dp: int, sm_scale: float,
                    n_chunks: int):
    """One grid step per batch row, MQA over the latent cache.

    The absorbed MLA identity (DeepSeek-V2): with k_nope = W_uk c and
    v = W_uv c, attention can run entirely in the r-dim latent space —
    scores_h = (W_uk_h^T q_nope_h)·c + q_pe_h·k_pe and ctx_h = W_uv_h
    (probs·C). The cache then stores one shared (c, k_pe) row per token
    (r + rope_pad elements) instead of H expanded heads — ~H× less HBM
    per decode step, and the dk%128 restriction that forced the expanded
    path off the kernel (192-wide DeepSeek K heads) disappears because
    r and the padded rope dim are 128-multiples.

    Same structure as _dec_attn_kernel: quantized valid-prefix single-DMA
    fetch, aligned 8-row RMW in-place append, NaN-sanitized value rows.
    """
    b = pl.program_id(0)
    L = len_ref[b]
    A = pl.multiple_of((L // 8) * 8, 8)

    @pl.when(pl.program_id(0) == 0)
    def _init_c():
        # one-time zero fill: rows beyond the valid prefix meet exact-zero
        # probabilities, which is only safe for finite stale data (see
        # _dec_attn_kernel)
        cbuf[:] = jnp.zeros_like(cbuf)

    CH = S // n_chunks
    nread = L // CH + 1
    for c in range(1, n_chunks + 1):
        @pl.when(nread == c)
        def _fetch(c=c):
            pltpu.make_async_copy(cc_ref.at[b, 0, pl.ds(0, c * CH)],
                                  cbuf.at[pl.ds(0, c * CH)], sc.at[0]).start()
            pltpu.make_async_copy(pc_ref.at[b, 0, pl.ds(0, c * CH)],
                                  pbuf.at[pl.ds(0, c * CH)], sp.at[0]).start()

    rc = pltpu.make_async_copy(co_ref.at[b, 0, pl.ds(A, 8)], c8, swc)
    rp = pltpu.make_async_copy(po_ref.at[b, 0, pl.ds(A, 8)], p8, swp)
    rc.start()
    rp.start()

    new_c = nc_ref[0]  # (1, r)
    new_p = np_ref[0]  # (1, dp)

    rc.wait()
    rp.wait()
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    c8[:] = jnp.where(sub == L - A, new_c, c8[:])
    p8[:] = jnp.where(sub == L - A, new_p, p8[:])
    wc = pltpu.make_async_copy(c8, co_ref.at[b, 0, pl.ds(A, 8)], swc)
    wp = pltpu.make_async_copy(p8, po_ref.at[b, 0, pl.ds(A, 8)], swp)
    wc.start()
    wp.start()

    for c in range(1, n_chunks + 1):
        @pl.when(nread == c)
        def _join(c=c):
            pltpu.make_async_copy(cc_ref.at[b, 0, pl.ds(0, c * CH)],
                                  cbuf.at[pl.ds(0, c * CH)], sc.at[0]).wait()
            pltpu.make_async_copy(pc_ref.at[b, 0, pl.ds(0, c * CH)],
                                  pbuf.at[pl.ds(0, c * CH)], sp.at[0]).wait()

    # merged-window store resolves the fetch/write-back race (see
    # _dec_attn_kernel); cbuf doubles as the value operand
    cbuf[pl.ds(A, 8)] = c8[:]
    pbuf[pl.ds(A, 8)] = p8[:]
    c_use = cbuf[:]
    p_use = pbuf[:]

    qa = qa_ref[0]  # (H, r)
    qp = qp_ref[0]  # (H, dp)
    scores = (jax.lax.dot_general(qa, c_use, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(qp, p_use, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32))
    scores = scores * sm_scale  # (H, S)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col <= L, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(c_use.dtype)
    ctx_ref[0] = jnp.dot(probs, c_use,
                         preferred_element_type=jnp.float32
                         ).astype(ctx_ref.dtype)

    wc.wait()
    wp.wait()


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def _mla_decode_call(q_abs, q_pe, new_c, new_p, cache_c, cache_p, lengths,
                     *, sm_scale, interpret):
    B, H, r = q_abs.shape
    dp = q_pe.shape[2]
    S = cache_c.shape[2]
    n_chunks = 8
    while n_chunks > 1 and S % (n_chunks * 8):
        n_chunks //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, r), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, dp), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, H, r), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, r), cache_c.dtype),
            pltpu.VMEM((S, dp), cache_p.dtype),
            pltpu.VMEM((8, r), cache_c.dtype),
            pltpu.VMEM((8, dp), cache_p.dtype),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    ctx, c_out, p_out = pl.pallas_call(
        functools.partial(_mla_dec_kernel, S=S, r=r, dp=dp,
                          sm_scale=sm_scale, n_chunks=n_chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, r), q_abs.dtype),
            jax.ShapeDtypeStruct(cache_c.shape, cache_c.dtype),
            jax.ShapeDtypeStruct(cache_p.shape, cache_p.dtype),
        ],
        # 0=lengths 1=q_abs 2=q_pe 3=new_c 4=new_p 5=cache_c 6=cache_p
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, q_abs, q_pe, new_c, new_p, cache_c, cache_p)
    return ctx, c_out, p_out


def mla_decode_attention(q_abs, q_pe, new_c, new_p, cache_c, cache_p,
                         lengths, sm_scale: float,
                         interpret: Optional[bool] = None):
    """Absorbed one-token MLA attention over the latent cache, appended in
    place. q_abs (B, H, r); q_pe (B, H, rope_pad); new_c (B, r); new_p
    (B, rope_pad); cache_c (B, 1, S, r); cache_p (B, 1, S, rope_pad);
    lengths (B,). Returns (ctx_lat (B, H, r), cache_c', cache_p')."""
    if cache_c.dtype != q_abs.dtype:
        raise KernelUnsupported("mixed-dtype latent cache -> XLA path")
    B, H, r = q_abs.shape
    dp = q_pe.shape[2]
    if r % 128 or dp % 128:
        raise KernelUnsupported("mla decode kernel needs 128|r and 128|rope_pad")
    if cache_c.shape[2] % 8:
        raise KernelUnsupported("mla decode kernel needs 8|S")
    lengths = jnp.minimum(lengths.astype(jnp.int32), cache_c.shape[2] - 1)
    return _mla_decode_call(
        q_abs, q_pe, new_c[:, None, :], new_p[:, None, :], cache_c, cache_p,
        lengths, sm_scale=float(sm_scale),
        interpret=_interpret() if interpret is None else interpret)


# ---------------------------------------------------------------------------
# MoE slot FFN: per-(token, expert-slot) gated FFN over stacked quantized
# expert weights, streaming ONLY the routed experts out of HBM
# ---------------------------------------------------------------------------

def _dequant_tile(codes, scale_ref, *, kind: str, g: int, k: int):
    """One expert's payload block -> bf16 (k, n) dequantized weights.

    ``codes`` is the (rows, n) VMEM block value: packed uint8 (split-half
    nibbles, the host/interpret layout), signed int4, or int8-doubled
    (the TPU serving layouts — one hardware cvt instead of the u8
    shift/mask or ~14-op branchless E2M1 chain, which measured as the
    whole slot-kernel bottleneck in benchmarks/lab_moe2.py)."""
    if codes.dtype == jnp.int4:
        # stay in bf16 end to end: an f32 intermediate at expert-payload
        # shape is ~6 MB of extra VMEM liveness per matrix and OOMs the
        # 16 MB scoped budget at production MoE geometry
        vals = codes.astype(jnp.bfloat16)
    elif codes.dtype == jnp.int8:
        vals = codes.astype(jnp.int32).astype(jnp.bfloat16)
    elif codes.dtype == jnp.uint8:
        packed = codes.astype(jnp.int32)
        lo, hi = packed & 0x0F, packed >> 4
        if kind == "nvfp4":
            from .linear import _fp4_values  # local import to avoid cycle

            vals = _fp4_values(jnp.concatenate([lo, hi], axis=0)
                               ).astype(jnp.bfloat16)
        else:
            vals = (jnp.concatenate([lo, hi], axis=0) - 8).astype(jnp.bfloat16)
    else:
        raise ValueError(str(codes.dtype))
    n = vals.shape[-1]
    s = scale_ref[:].astype(jnp.bfloat16)  # (k//g, n)
    return (vals.reshape(k // g, g, n) * s[:, None, :]).reshape(k, n)


def _moe_slot_ffn_kernel(idx_ref, order_ref, x_ref,
                         gw_ref, gs_ref, uw_ref, us_ref, dw_ref, ds_ref,
                         o_ref, acc,
                         *, kind: str, g: int, D: int, Fe: int, S: int,
                         NF: int):
    """Grid (slot, Fe-slice); the expert payload blocks arrive via
    scalar-prefetch BlockSpec index maps (``idx_ref[s]`` picks the expert
    row), so Pallas's own grid pipeline double-buffers the HBM streams —
    and *skips* the fetch entirely when consecutive slots map to the same
    expert (the caller sorts slots by expert id to maximize those hits).
    The Fe-slice axis bounds VMEM: slice fi computes
    ``silu(x@G[:, fi]) * (x@U[:, fi]) @ Dn[fi, :]`` — a self-contained
    partial of the down sum, so per-step payload blocks are 1/NF-sized
    (full-payload blocks OOM the 16 MB scoped budget at Qwen3-30B
    geometry).

    The token row streams IN and the slot output OUT through row-indexed
    (1, 1, D) BlockSpecs on (S, 1, D) views — measured 1.42x over the
    earlier one-hot select/scatter formulation, whose (1,S)@(S,D) MXU
    select plus full (S, D) f32 accumulator RMW serialized with the
    payload consume (benchmarks/lab_moe3.py: 294.7 vs 418.7 us/call at
    Qwen3-30B-A3B geometry on v5e).
    """
    x_s = x_ref[0]  # (1, D) bf16, row-streamed by the s grid axis

    fe = Fe // NF
    gate_w = _dequant_tile(gw_ref[0], gs_ref.at[0], kind=kind, g=g, k=D)
    up_w = _dequant_tile(uw_ref[0], us_ref.at[0], kind=kind, g=g, k=D)
    gv = jnp.dot(x_s, gate_w, preferred_element_type=jnp.float32)  # (1, fe)
    uv = jnp.dot(x_s, up_w, preferred_element_type=jnp.float32)
    a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
    down_w = _dequant_tile(dw_ref[0], ds_ref.at[0], kind=kind, g=g, k=fe)
    y = jnp.dot(a, down_w, preferred_element_type=jnp.float32)  # (1, D)

    if NF == 1:
        # single Fe slice: no accumulation, no runtime predicates — the
        # @pl.when regions below are dynamic branches that cost real time
        # per grid step when they can never fire more than trivially
        o_ref[0] = y
        return

    f_i = pl.program_id(1)

    @pl.when(f_i == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += y

    @pl.when(f_i == NF - 1)
    def _write():
        o_ref[0] = acc[:]


@functools.partial(jax.jit, static_argnames=("kind", "g", "nf", "interpret"))
def _moe_slot_ffn_call(x, idx_sorted, order, gw, gs, uw, us, dw, ds,
                       *, kind, g, nf, interpret):
    """``idx_sorted`` is the expert id per grid step (ascending, so equal
    experts are consecutive and the pipeline skips refetches); ``order``
    maps grid step -> original slot row. x rows are read and output rows
    written through ``order_ref`` in the BlockSpec index maps, so the
    expert-sort permutation costs ZERO data movement — the earlier
    ``x[order]`` / ``out[inv]`` dynamic row gathers were ~2x the kernel's
    own runtime in the decode scan (bench_moe 1368 tok/s with gathers vs
    1610 without, v5e)."""
    S, D = x.shape
    Fe = gs.shape[-1]

    def col_spec(arr):
        # slice the trailing (Fe) axis by f_i
        shape = (1,) + arr.shape[1:-1] + (arr.shape[-1] // nf,)
        return pl.BlockSpec(shape,
                            lambda s, fi, idx_ref, order_ref: (idx_ref[s], 0, fi),
                            memory_space=pltpu.VMEM)

    def row_spec(arr):
        # slice the middle (Fe-derived rows) axis by f_i
        shape = (1, arr.shape[1] // nf, arr.shape[2])
        return pl.BlockSpec(shape,
                            lambda s, fi, idx_ref, order_ref: (idx_ref[s], fi, 0),
                            memory_space=pltpu.VMEM)

    def slot_spec():
        return pl.BlockSpec((1, 1, D),
                            lambda s, fi, idx_ref, order_ref: (order_ref[s], 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, nf),
        in_specs=[
            slot_spec(),
            col_spec(gw), col_spec(gs),
            col_spec(uw), col_spec(us),
            row_spec(dw), row_spec(ds),
        ],
        out_specs=slot_spec(),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_moe_slot_ffn_kernel, kind=kind, g=g,
                          D=D, Fe=Fe, S=S, NF=nf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(idx_sorted, order, x.reshape(S, 1, D), gw, gs, uw, us, dw, ds)
    return out.reshape(S, D)


def moe_slot_ffn(x, idx, gate_el, up_el, down_el,
                 interpret: Optional[bool] = None):
    """Gated FFN for ``S = tokens*top_k`` expert slots: per grid step one
    expert's quantized gate/up/down payloads stream from the stacked
    (E, ...) arrays (scalar-prefetched dynamic expert index in the
    BlockSpec index maps) and are dequantized in VMEM — HBM traffic is
    exactly the routed experts, and nothing bf16-sized is ever
    materialized in HBM. Slots are processed in expert-sorted order so
    repeated experts within a batch are fetched once (the pipeline skips
    same-index blocks).

    x (S, D) bf16 — the slot's token row repeated per expert slot;
    idx (S,) int32 expert ids. Returns (S, D) f32 FFN outputs (un-combined).
    """
    kind = gate_el.kind
    if kind not in ("w4", "nvfp4"):
        raise KernelUnsupported(f"moe_slot_ffn supports w4/nvfp4, got {kind}")
    if any(el.zero_point is not None for el in (gate_el, up_el, down_el)):
        raise KernelUnsupported("asymmetric experts go through the XLA path")
    md = dict(gate_el.meta)
    g = int(md.get("group_size", 16 if kind == "nvfp4" else 32))
    S, D = x.shape
    Fe = int(md["n"])
    if S % 8 or D % 128 or int(dict(down_el.meta)["k"]) % 128:
        raise KernelUnsupported("moe_slot_ffn needs 8|S and 128|D,Fe")

    # Fe-slice factor: keep a slot's per-step payload under ~4.5 MB so the
    # pipeline's double buffers fit scoped VMEM at 30B-class geometry
    def slot_bytes(nf: int) -> float:
        per = 0.0
        for el in (gate_el, up_el, down_el):
            el_bytes = el.weight.size * el.weight.dtype.itemsize
            if el.scale is not None:
                el_bytes += el.scale.size * el.scale.dtype.itemsize
            per += el_bytes / el.weight.shape[0]
        return per / nf

    def nf_ok(nf: int) -> bool:
        if Fe % nf:
            return False
        if any(el.weight.dtype == jnp.uint8
               for el in (gate_el, up_el, down_el)):
            # split-half packed payloads cannot be Fe-row-sliced: a middle
            # row range mixes the low/high nibble planes, so the sliced
            # down block would pair scrambled weight rows with the wrong
            # scales. Packed u8 must run whole-payload (nf == 1); if that
            # exceeds the VMEM budget the caller falls back to XLA.
            return False
        fe = Fe // nf
        dn_srows = fe // g
        return (fe % 128 == 0 and fe % g == 0
                and (nf == 1 or dn_srows % 8 == 0))

    if (slot_bytes(1) > 5_600_000
            and any(el.weight.dtype == jnp.uint8
                    for el in (gate_el, up_el, down_el))):
        raise KernelUnsupported(
            "packed-u8 expert payload too large for an unsliced slot step; "
            "convert to the int4/int8 device layout (i4_device_layout)")

    nf = 1
    while slot_bytes(nf) > 5_600_000 and nf_ok(nf * 2):
        nf *= 2
    # debug-only override: accepted only when it tiles AND still fits the
    # scoped-VMEM slot budget (a forced too-small nf at 30B-class geometry
    # would OOM scoped VMEM instead of falling back)
    import os as _os
    nf_env = _os.environ.get("QTPU_MOE_NF")
    if nf_env:
        try:
            nf_forced = int(nf_env)
        except ValueError:
            nf_forced = 0
        if nf_forced and nf_ok(nf_forced) and slot_bytes(nf_forced) <= 5_600_000:
            nf = nf_forced

    idx = idx.astype(jnp.int32)
    # the permutation to expert-sorted order lives entirely in the scalar-
    # prefetch index maps (order_ref routes x/out rows) — no data movement
    order = jnp.argsort(idx).astype(jnp.int32)
    return _moe_slot_ffn_call(
        x.astype(jnp.bfloat16), idx[order], order,
        gate_el.weight, gate_el.scale, up_el.weight, up_el.scale,
        down_el.weight, down_el.scale,
        kind=kind, g=g, nf=nf,
        interpret=_interpret() if interpret is None else interpret)


# ---------------------------------------------------------------------------
# fused gate|up slot FFN for the int8-per-channel expert serving layout
# ---------------------------------------------------------------------------

def _moe_slot_gu_kernel(idx_ref, order_ref, x_ref, guw_ref, dw_ref,
                        gus_ref, ds_ref, o_ref, *, Fe: int):
    """One expert slot per grid step: a single fused (D, 2*Fe) int8
    payload feeds ONE MXU call producing gate|up together; per-channel
    scales are applied to the (1, 2*Fe) / (1, D) matmul OUTPUTS, so the
    only per-weight VPU work is the hardware int8->bf16 cvt — which the
    payload DMA fully hides (the ``a8`` zero-dequant probe in
    benchmarks/lab_moe4.py times the same 349 us/call as this kernel)."""
    x_s = x_ref[0]  # (1, D) bf16, row-streamed through order_ref
    guv = jnp.dot(x_s, guw_ref[0].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)     # (1, 2Fe)
    guv = guv * gus_ref[0].astype(jnp.float32)
    gv, uv = guv[:, :Fe], guv[:, Fe:]
    a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
    y = jnp.dot(a, dw_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)       # (1, D)
    o_ref[0] = y * ds_ref[0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moe_slot_gu_call(x, idx_sorted, order, guw, gus, dw, ds, *, interpret):
    S, D = x.shape
    Fe2 = guw.shape[-1]

    def pay(arr):
        return pl.BlockSpec((1,) + arr.shape[1:],
                            lambda s, idx_ref, order_ref: (idx_ref[s], 0, 0),
                            memory_space=pltpu.VMEM)

    def slot_spec():
        return pl.BlockSpec((1, 1, D),
                            lambda s, idx_ref, order_ref: (order_ref[s], 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[slot_spec(), pay(guw), pay(dw), pay(gus), pay(ds)],
        out_specs=slot_spec(),
    )
    out = pl.pallas_call(
        functools.partial(_moe_slot_gu_kernel, Fe=Fe2 // 2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx_sorted, order, x.reshape(S, 1, D), guw, dw,
      gus.reshape(gus.shape[0], 1, -1), ds.reshape(ds.shape[0], 1, -1))
    return out.reshape(S, D)


def moe_slot_gu_ffn(x, idx, gu_el, down_el,
                    interpret: Optional[bool] = None):
    """Gated FFN over ``S`` expert slots for the fused w8pc serving layout
    (:func:`quantizers_tpu.ops.linear.moe_w8pc_layout`): per grid step the
    routed expert's fused gate|up payload (one contiguous (D, 2*Fe) int8
    block) and down payload stream HBM->VMEM via scalar-prefetched index
    maps; slots run expert-sorted so repeated experts skip the refetch.

    1.39x over the unfused group-scaled slot kernel at Qwen3-30B-A3B
    geometry (486 -> 349 us/call, 661 GB/s effective = 93% of the
    measured int8 streaming ceiling — benchmarks/lab_moe4.py).

    x (S, D) bf16; idx (S,) int32. Returns (S, D) f32 (un-combined).
    """
    if gu_el.kind != "w8" or down_el.kind != "w8":
        raise KernelUnsupported("moe_slot_gu_ffn needs the w8pc layout")
    if dict(gu_el.meta).get("group_size") or dict(down_el.meta).get("group_size"):
        raise KernelUnsupported("moe_slot_gu_ffn needs per-channel scales")
    if gu_el.zero_point is not None or down_el.zero_point is not None:
        raise KernelUnsupported("asymmetric experts go through the XLA path")
    S, D = x.shape
    Fe2 = int(dict(gu_el.meta)["n"])
    if S % 8 or D % 128 or Fe2 % 256 or int(dict(down_el.meta)["k"]) != Fe2 // 2:
        raise KernelUnsupported("moe_slot_gu_ffn geometry mismatch")
    # double-buffered payload pair must fit scoped VMEM (16 MB):
    per_slot = D * Fe2 + (Fe2 // 2) * D  # int8 bytes
    if 2 * per_slot > 12_000_000:
        raise KernelUnsupported("fused expert payload too large for VMEM")

    idx = idx.astype(jnp.int32)
    order = jnp.argsort(idx).astype(jnp.int32)
    return _moe_slot_gu_call(
        x.astype(jnp.bfloat16), idx[order], order,
        gu_el.weight, gu_el.scale, down_el.weight, down_el.scale,
        interpret=_interpret() if interpret is None else interpret)
