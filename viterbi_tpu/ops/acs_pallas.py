"""Pallas TPU kernel for the Viterbi forward pass (ACS).

The hot layer (SURVEY.md §3.2): the reference's AVX2 32-way butterfly
loop (decon_avx2.asm:43-118) becomes a VPU kernel with

  * the 64 trellis states on the **sublane** axis (rows of a [64, B]
    int32 tile — butterfly halves are tile-aligned row slices),
  * batched frames on the **lane** axis (B padded to 128),
  * a fori_loop over trellis time inside each grid step, symbols
    streamed HBM->VMEM in time chunks by the Pallas pipeline,
  * path metrics resident in a VMEM scratch that persists across the
    sequential grid (the register-resident metrics of the SIMD kernels),
  * decisions packed in-kernel to the reference's 2x-uint32 word layout
    (viterbi.h:89-92) and streamed back to HBM per chunk.

Numerics are bit-identical to ops.acs.forward (and therefore to the
reference's SIMD semantics): rounding-average branch metrics, saturating
adds capped at 255, ties-to-high-predecessor decisions, renormalization
by 63 after every second step when state 0's metric exceeds 150.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    pl = pltpu = None
    _HAVE_PALLAS = False

from .. import constants as C

# Default trellis-time chunk per grid step of the decisions kernel
# (must be even). Need not divide nsteps: the last grid step masks the
# padded remainder via per-step liveness (see `pair` in _kernel).
TIME_CHUNK = 126

_POL = C.branch_polarity_table()  # [4, 32] uint8


def available() -> bool:
    return _HAVE_PALLAS


def _batch_tile(B: int, b_tile: int) -> tuple[int, int]:
    """Pick (padded batch Bp, batch tile bt) for the batch-major grid.

    Pads only to the 128-lane granule, then tiles by the largest exact
    <= b_tile divisor of Bp — rounding Bp up to a tile multiple instead
    would waste up to ~2x compute for batches just above a tile boundary
    (e.g. B=1100 -> 2048). When the best exact divisor degrades far
    below b_tile (Bp/128 prime, e.g. B=1600 -> 13 tiles of 128), fall
    back to tile-multiple padding if its waste is smaller under a coarse
    per-tile overhead of ~64 lanes (pipeline prologue + scratch init;
    round-4 advisor finding — the difference is small either way).
    """
    Bp = max(128, ((B + 127) // 128) * 128)
    if Bp <= b_tile:
        return Bp, Bp
    nbt = -(-Bp // b_tile)
    while Bp % nbt or (Bp // nbt) % 128:
        nbt += 1
    bt = Bp // nbt
    if bt < b_tile // 2:
        nbt_pad = -(-Bp // b_tile)
        overhead = 64  # lanes-equivalent fixed cost per grid tile
        if nbt_pad * (b_tile + overhead) < nbt * (bt + overhead):
            return nbt_pad * b_tile, b_tile
    return Bp, bt


def _kernel(nsteps: int, time_chunk: int, packed: bool, sym_ref, init_ref,
            dec_ref, met_ref, metrics):
    """Grid step: ``time_chunk`` trellis steps over [64, B] metrics.

    sym_ref:  [time_chunk, 4, B] int32 soft symbols (this chunk), or
              [time_chunk, 1, B] one-int32-per-step with ``packed``
    init_ref: [64, B] int32 initial metrics
    dec_ref:  [time_chunk, 2, B] uint32 packed decisions (out)
    met_ref:  [64, B] int32 final metrics (out)
    metrics:  [64, B] int32 VMEM scratch, persistent across the grid
    """
    B = metrics.shape[1]
    step0 = pl.program_id(1) * time_chunk

    @pl.when(pl.program_id(1) == 0)
    def _():
        metrics[:] = init_ref[:]

    # Constant tables, hoisted out of the time loop by the compiler.
    # polarity masks computed in-kernel from iota + popcount (Pallas
    # kernels cannot capture host constants): pol[j][b] =
    # parity((b << 1) & POLYS[j]) — same table as constants.py.
    brow = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)     # butterfly b
    pol = [jax.lax.population_count((brow << 1) & int(C.POLYS[j])) & 1
           for j in range(4)]
    srow = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)     # state s
    # int32 weights (1<<31 wraps to INT_MIN; bit pattern is what matters —
    # Mosaic lacks unsigned reductions, so pack in int32 and bitcast)
    weights = jnp.left_shift(jnp.int32(1), srow % 32)          # [64, B]

    def one_step(t, metrics_val):
        if packed:
            srow = sym_ref[pl.ds(t, 1)][0]                     # [1, B]
            sq = [(srow >> (8 * j)) & 255 for j in range(4)]
        else:
            s4 = sym_ref[pl.ds(t, 1)][0]                       # [4, B]
            sq = [s4[j][None, :] & 0xFF for j in range(4)]
        # branch metric avg-tree with polarity selects
        a = []
        for j in range(4):
            sj = jnp.broadcast_to(sq[j], (32, B))
            a.append(jnp.where(pol[j] != 0, 255 - sj, sj))
        avg = lambda x, y: (x + y + 1) >> 1
        m = (avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2) & 63  # [32, B]
        cm = 63 - m
        lo = metrics_val[:32]
        hi = metrics_val[32:]
        sat = lambda x: jnp.minimum(x, C.METRIC_MAX)
        p0e, p1e = sat(lo + m), sat(hi + cm)
        p0o, p1o = sat(lo + cm), sat(hi + m)
        even = jnp.minimum(p0e, p1e)
        odd = jnp.minimum(p0o, p1o)
        new = jnp.stack([even, odd], axis=1).reshape(64, B)
        # cast decisions to i32 *before* stacking: Mosaic cannot reshape
        # packed-bool (i1) vectors ("Invalid vector register cast")
        dec = jnp.stack([(p1e <= p0e).astype(jnp.int32),
                         (p1o <= p0o).astype(jnp.int32)],
                        axis=1).reshape(64, B)
        dwords = jnp.sum((dec * weights)
                         .reshape(2, 32, B), axis=1, dtype=jnp.int32)
        return new, jax.lax.bitcast_convert_type(dwords, jnp.uint32)

    def pair(i, mcur):
        # metrics ride the loop carry (vector registers) — a scratch
        # round-trip per step is pure VMEM traffic
        t0 = 2 * i
        for sub in range(2):
            t = t0 + sub
            live = step0 + t < nsteps
            new, dwords = one_step(t, mcur)
            mcur = jnp.where(live, new, mcur)
            dec_ref[pl.ds(t, 1)] = dwords[None]
        # renormalize only for live pairs, else frozen metrics would keep
        # draining by 63 on every padded step
        pair_live = step0 + t0 < nsteps
        renorm = (mcur[0:1, :] > C.RENORMALIZE_THRESHOLD) & pair_live
        mcur = jnp.where(renorm, jnp.maximum(mcur - C.RENORM_SUB, 0), mcur)
        return mcur

    mfin = jax.lax.fori_loop(0, time_chunk // 2, pair, metrics[:])
    metrics[:] = mfin
    met_ref[:] = mfin


@functools.partial(jax.jit,
                   static_argnames=("nsteps", "time_chunk", "interpret",
                                    "b_tile", "packed", "mxu"))
def forward(symbols: jax.Array, nsteps: int,
            initial_metrics: jax.Array | None = None,
            time_chunk: int = TIME_CHUNK, interpret: bool = False,
            b_tile: int = 1024, packed: bool | str = False,
            mxu: bool = True):
    """Pallas twin of ops.acs.forward.

    ``symbols``: [B, >=4*nsteps] int32 — or pre-packed one-int32-per-
    step (``pack_symbols``/``pack_symbols_host``): time-major
    [nsteps, B] with ``packed=True``, or frame-major [B, nsteps] with
    ``packed="bt"`` (the host-natural ingest layout, 4x less transfer).
    Returns (decisions uint32[nsteps, B, 2], final_metrics int32[B, 64]).

    The batch is tiled to ``b_tile`` lanes per grid step (batch-major
    grid, full trellis per tile) so large batches stay inside the
    scoped-VMEM budget — B=4096 in one tile measured a 25.7 MB stack
    allocation vs the 16 MB limit (round-4 harness run).

    ``mxu=True`` (default) runs the MXU-assisted kernel (branch-metric
    expansion + decision word-packing as exact matmuls, f32 metrics —
    see ``_kernel_mxu``); ``mxu=False`` keeps the pure-VPU form. Both
    are bit-identical.
    """
    assert nsteps % 2 == 0
    if packed == "bt":
        symbols = symbols.T                  # [B, nsteps] -> [nsteps, B]
        packed = True
    B = symbols.shape[1] if packed else symbols.shape[0]
    Bp, bt = _batch_tile(B, b_tile)
    nbt = Bp // bt
    nchunks = (nsteps + time_chunk - 1) // time_chunk
    Tp = nchunks * time_chunk

    if packed:
        assert symbols.shape[0] >= nsteps
        syms = symbols[:nsteps].astype(jnp.int32)[:, None, :]
        syms = jnp.pad(syms, ((0, Tp - nsteps), (0, 0), (0, Bp - B)))
        sym_spec = pl.BlockSpec((time_chunk, 1, bt), lambda i, j: (j, 0, i),
                                memory_space=pltpu.VMEM)
    else:
        syms = symbols[:, : 4 * nsteps].astype(jnp.int32)
        # [B, 4*nsteps] -> [Tp, 4, Bp]
        syms = syms.T.reshape(nsteps, 4, B)
        syms = jnp.pad(syms, ((0, Tp - nsteps), (0, 0), (0, Bp - B)))
        sym_spec = pl.BlockSpec((time_chunk, 4, bt), lambda i, j: (j, 0, i),
                                memory_space=pltpu.VMEM)

    if initial_metrics is None:
        row = jax.lax.broadcasted_iota(jnp.int32, (64, Bp), 0)
        init = jnp.where(row == 0, 0, 63)
    else:
        init = jnp.pad(initial_metrics.astype(jnp.int32).T,
                       ((0, 0), (0, Bp - B)), constant_values=63)

    mdt = jnp.float32 if mxu else jnp.int32
    kern = _kernel_mxu if mxu else _kernel
    kernel = functools.partial(kern, nsteps, time_chunk, packed)
    decisions, fmetrics = pl.pallas_call(
        kernel,
        grid=(nbt, nchunks),  # batch-major: full trellis per batch tile
        in_specs=[
            sym_spec,
            pl.BlockSpec((64, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((time_chunk, 2, bt), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, 2, Bp), jnp.uint32),
            jax.ShapeDtypeStruct((64, Bp), mdt),
        ],
        scratch_shapes=[pltpu.VMEM((64, bt), mdt)],
        interpret=interpret,
    )(syms, init)

    decisions = decisions[:nsteps, :, :B].transpose(0, 2, 1)
    return decisions, fmetrics[:, :B].astype(jnp.int32).T


# ---------------------------------------------------------------------------
# Fused register-exchange kernel (no decisions array, no serial traceback)
# ---------------------------------------------------------------------------

CKPT = 24  # default checkpoint period; see choose_ckpt (<= 26)


def choose_ckpt(nsteps: int) -> int:
    """Largest even checkpoint period <= 26 dividing nsteps.

    nsteps = framebits + 6 with framebits a multiple of 24, so nsteps is
    always divisible by 6; a larger divisor means a shorter traceback
    walk. An exact divisor lets the kernel run without per-step liveness
    masking (two [64, B] selects per step saved).
    """
    if nsteps % 6 == 0:
        # prefer multiples of 6: enables the constant-geometry kernel
        # (checkpoints must land on natural state ordering)
        for d in (24, 18, 12, 6):
            if nsteps % d == 0:
                return d
    for d in range(26, 5, -2):
        if nsteps % d == 0:
            return d
    return 6


def _choose_time_chunk(nsteps: int, ckpt: int, target: int = 200) -> int:
    """Largest multiple of ckpt dividing nsteps, at most ~target steps."""
    blocks = nsteps // ckpt
    best = 1
    for k in range(1, blocks + 1):
        if blocks % k == 0 and k * ckpt <= target:
            best = k
    return best * ckpt


def choose_layout(nsteps: int) -> tuple[int, int, int]:
    """Jointly choose (front_pad, ckpt, time_chunk) for a CG-eligible
    trellis (6 | nsteps).

    Shapes whose nsteps/ckpt block count is prime force the time chunk
    down to a single checkpoint (e.g. 774/18 = 43 grid chunks, 2328/24
    = 97, 4632/24 = 193), paying the grid's per-chunk overhead once per
    checkpoint; a few more dead front-pad steps buy a layout with large
    chunks and a short walk. Cost model calibrated on-chip (round 4,
    scripts/kladder_probe.py): per-chunk overhead ~2 trellis steps,
    per-checkpoint walk cost ~1.7 steps; measured wins +4-6% at
    framebits 768/2304/4608 (see docs/KERNELS.md). The natural no-pad
    layout is kept when it is within 1.5% of the best candidate (e.g.
    framebits 3072, where the model's preference is below noise).
    """
    pad_cap = max(18, int(0.02 * nsteps))
    best = None          # (cost, pad, ckpt, chunk)
    natural = None       # best pad == 0 option
    for pad in range(0, pad_cap + 1, 6):
        np_ = nsteps + pad
        for ckpt in (24, 18):
            if np_ % ckpt:
                continue
            chunk = _choose_time_chunk(np_, ckpt)
            cost = np_ + 2.0 * (np_ // chunk) + 1.7 * (np_ // ckpt)
            cand = (cost, pad, ckpt, chunk)
            if best is None or cost < best[0]:
                best = cand
            if pad == 0 and (natural is None or cost < natural[0]):
                natural = cand
    if best is None:
        # no 18/24 divisor within the pad budget: natural ckpt, no pad
        ckpt = choose_ckpt(nsteps)
        return 0, ckpt, _choose_time_chunk(nsteps, ckpt)
    if natural is not None and natural[0] <= best[0] * 1.015:
        best = natural
    return best[1], best[2], best[3]


def _kernel_regs_cg(time_chunk: int, ckpt: int, mdt, packed, reset_at,
                    sym_ref, init_ref, reg_ref, met_ref, metrics, regs):
    """Constant-geometry register-exchange ACS.

    The naive butterfly interleaves the 64-state (sublane) axis every
    step (new[2b], new[2b+1] <- pair b) — ablation shows those sublane
    shuffles dominate the kernel. Here the data NEVER interleaves:
    results are written back to the positions they were read from, so
    the state ordering at position p evolves as rotl_phase(p) (6-bit
    rotate). Three phases use pair strides 32/16/8 — all slices are
    whole 8-sublane tiles — and one [8,8] sublane transpose (swap of the
    two 3-bit index halves = rotr3) resets the ordering every 3 steps.
    Branch-polarity masks are phase-permuted via in-kernel iota math.
    Checkpoints land at multiples of 6 steps, i.e. natural order.

    Numerics identical to _kernel_regs / the reference.
    """
    B = metrics.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        metrics[:] = init_ref[:]
        # seed each state's register with its own index: the bits above
        # a checkpoint's own window then spell the survivor path's
        # *start state* (pre-frame bits u_{-6}..u_{-1}) instead of
        # zeros. Terminated decode never reads them; the tail-biting
        # wrap convention needs them (traceback.wrap_last6).
        regs[:] = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 0)

    c255 = jnp.asarray(255, mdt)
    c63 = jnp.asarray(63, mdt)
    zero = jnp.asarray(0, mdt)
    # hoisted: program_id inside the fori body fails interpret lowering
    chunk_base = pl.program_id(1) * time_chunk

    def masks_for_phase(phase):
        # lo-row r (in the [32, B] compacted lo half at this phase) holds
        # predecessor state b = rotl_phase(j), j = r with pair-bit k
        # re-inserted as 0 (k = 5 - phase).
        k = 5 - phase
        S = 1 << k
        r = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
        j = ((r >> k) << (k + 1)) | (r & (S - 1))
        b = ((j << phase) | (j >> (6 - phase))) & 63
        return [(((jax.lax.population_count((b << 1) & int(C.POLYS[q]))
                   & 1) * 255).astype(mdt)) for q in range(4)]

    xmasks = [masks_for_phase(p) for p in range(3)]

    def split(M, phase):
        k = 5 - phase
        S = 1 << k
        G = 32 // S
        Mr = M.reshape(G, 2, S, B)
        return Mr[:, 0].reshape(32, B), Mr[:, 1].reshape(32, B)

    def merge(lo, hi, phase):
        k = 5 - phase
        S = 1 << k
        G = 32 // S
        return jnp.stack([lo.reshape(G, S, B), hi.reshape(G, S, B)],
                         axis=1).reshape(64, B)

    def reset(M):
        # rotr3 ordering fix: position p <- ((p & 7) << 3) | (p >> 3)
        return M.reshape(8, 8, B).transpose(1, 0, 2).reshape(64, B)

    def one_step(t, phase, pos, mv, rv):
        if packed:
            srow = sym_ref[pl.ds(t, 1)][0]                  # [1, B] i32
            sq = [((srow >> (8 * q)) & 255).astype(mdt) for q in range(4)]
        else:
            s4 = sym_ref[pl.ds(t, 1)][0]
            sq = [(s4[q][None, :] & 0xFF).astype(mdt) for q in range(4)]
        xm = xmasks[phase]
        a = [jnp.broadcast_to(sq[q], (32, B)) ^ xm[q] for q in range(4)]
        avg = lambda x, y: (x + y + 1) >> 1
        # no "& 63" after ">> 2": avg <= 255 so the shift already lands
        # in [0, 63] (the reference's AND strips psrlw cross-byte bits, a
        # no-op in int32 lanes)
        m = avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2
        cm = c63 - m
        lo, hi = split(mv, phase)
        sat = lambda x: jnp.minimum(x, c255)
        p0e, p1e = sat(lo + m), sat(hi + cm)
        p0o, p1o = sat(lo + cm), sat(hi + m)
        dec_e = p1e <= p0e
        dec_o = p1o <= p0o
        new = merge(jnp.minimum(p0e, p1e), jnp.minimum(p0o, p1o), phase)
        rlo, rhi = split(rv, phase)
        # deferred-shift register exchange: the survivor's input bit is
        # written at a static position (5 - step-in-window); one <<6 per
        # 6-step window replaces a <<1 per step
        reg_e = jnp.where(dec_e, rhi, rlo)
        reg_o = jnp.where(dec_o, rhi, rlo) | (1 << pos)
        new_regs = merge(reg_e, reg_o, phase)
        return new, new_regs

    def six(i, carry):
        mcur, rcur = carry
        t0 = 6 * i
        if reset_at >= 0:
            # front-pad support: at the pad/real boundary (a window
            # start), discard the pad region's state and start the real
            # trellis from the caller's initial metrics + seeded
            # registers — numerics from here on are identical to an
            # unpadded decode (decode() pads nsteps up to a multiple of
            # 24 so every DAB bitrate gets the cheap ckpt=24 layout)
            hit = chunk_base + t0 == reset_at
            mcur = jnp.where(hit, init_ref[:].astype(mcur.dtype), mcur)
            rcur = jnp.where(
                hit, jax.lax.broadcasted_iota(jnp.int32, rcur.shape, 0),
                rcur)
        rcur = rcur << 6         # free bit positions 5..0 for this window
        for half in range(2):
            for phase in range(3):
                t = t0 + 3 * half + phase
                pos = 5 - (3 * half + phase)
                mcur, rcur = one_step(t, phase, pos, mcur, rcur)
                if (3 * half + phase) % 2 == 1:  # after steps 1, 3, 5
                    sub = jnp.where(
                        mcur[0:1, :] > C.RENORMALIZE_THRESHOLD, c63, zero)
                    mcur = jnp.maximum(mcur - sub, zero)
            mcur = reset(mcur)
            rcur = reset(rcur)

        @pl.when((t0 + 6) % ckpt == 0)
        def _():
            reg_ref[pl.ds((t0 + 6) // ckpt - 1, 1)] = rcur[None]
        return mcur, rcur

    mfin, rfin = jax.lax.fori_loop(0, time_chunk // 6, six,
                                   (metrics[:], regs[:]))
    metrics[:] = mfin
    regs[:] = rfin
    met_ref[:] = mfin


def _kernel_regs_cg_mxu(time_chunk: int, ckpt: int, mdt, packed, reset_at,
                        sym_ref, init_ref, reg_ref, met_ref, metrics,
                        regs):
    """Constant-geometry ACS with MXU-expanded branch metrics.

    The avg-tree runs once per step on an [8, B] tile (the 8 distinct
    polarity patterns (p0, p1, p2); p3 == p0 since g0 == g3), instead of
    on the full [32, B] butterfly rows. The per-phase expansion to the
    [m; cm] [64, B] row layout is a one-hot bf16 matmul on the otherwise
    idle MXU — metric values <= 63 are exact in bf16, and each output row
    has exactly one nonzero term, so the expansion is bit-exact. The
    matmul has no dependence on the ACS carry, so it overlaps the VPU
    butterfly work of neighbouring steps.

    Geometry, numerics, and checkpoint layout identical to
    _kernel_regs_cg.
    """
    B = metrics.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        metrics[:] = init_ref[:]
        # seed each state's register with its own index: the bits above
        # a checkpoint's own window then spell the survivor path's
        # *start state* (pre-frame bits u_{-6}..u_{-1}) instead of
        # zeros. Terminated decode never reads them; the tail-biting
        # wrap convention needs them (traceback.wrap_last6).
        regs[:] = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 0)

    c255 = jnp.asarray(255, mdt)
    c63 = jnp.asarray(63, mdt)
    zero = jnp.asarray(0, mdt)
    chunk_base = pl.program_id(1) * time_chunk

    # Pattern-tree polarity masks: row r of the [8, B] tile is pattern
    # (p0, p1, p2) = (bit2, bit1, bit0) of r; x_q = 255 if p_q else 0.
    prow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    xm8 = [(((prow >> (2 - min(q, 2))) & 1) * 255).astype(jnp.int32)
           for q in range(3)]
    xm8.append(xm8[0])                     # g3 == g0

    def expand_matrix(phase):
        # P[64, 16]: row r<32 selects m8[pat(b(r))], row r>=32 selects
        # cm8[pat(b(r-32))] (= column 8 + pat), where b is the
        # predecessor state of compacted lo-row r at this phase.
        k = 5 - phase
        S = 1 << k
        r64 = jax.lax.broadcasted_iota(jnp.int32, (64, 16), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (64, 16), 1)
        r = r64 & 31
        j = ((r >> k) << (k + 1)) | (r & (S - 1))
        b = ((j << phase) | (j >> (6 - phase))) & 63
        pat = ((jax.lax.population_count((b << 1) & int(C.POLYS[0])) & 1)
               << 2)
        pat = pat | ((jax.lax.population_count((b << 1) & int(C.POLYS[1]))
                      & 1) << 1)
        pat = pat | (jax.lax.population_count((b << 1) & int(C.POLYS[2]))
                     & 1)
        col = pat + jnp.where(r64 >= 32, 8, 0)
        return (c == col).astype(jnp.bfloat16)

    Ps = [expand_matrix(p) for p in range(3)]

    def split(M, phase):
        k = 5 - phase
        S = 1 << k
        G = 32 // S
        Mr = M.reshape(G, 2, S, B)
        return Mr[:, 0].reshape(32, B), Mr[:, 1].reshape(32, B)

    def merge(lo, hi, phase):
        k = 5 - phase
        S = 1 << k
        G = 32 // S
        return jnp.stack([lo.reshape(G, S, B), hi.reshape(G, S, B)],
                         axis=1).reshape(64, B)

    def reset(M):
        return M.reshape(8, 8, B).transpose(1, 0, 2).reshape(64, B)

    def one_step(t, phase, pos, mv, rv):
        if packed:
            srow = sym_ref[pl.ds(t, 1)][0]                  # [1, B] i32
            sq = [(srow >> (8 * q)) & 255 for q in range(4)]
        else:
            s4 = sym_ref[pl.ds(t, 1)][0]
            sq = [s4[q][None, :] & 0xFF for q in range(4)]
        a = [jnp.broadcast_to(sq[q], (8, B)) ^ xm8[q] for q in range(4)]
        avg = lambda x, y: (x + y + 1) >> 1
        # ">> 2" already lands in [0, 63]; no "& 63" needed in i32 lanes
        m8 = avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2
        X = jnp.concatenate([m8, 63 - m8], axis=0).astype(jnp.bfloat16)
        M64 = jax.lax.dot_general(
            Ps[phase], X, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(mdt)
        m, cm = M64[:32], M64[32:]
        lo, hi = split(mv, phase)
        sat = lambda x: jnp.minimum(x, c255)
        p0e, p1e = sat(lo + m), sat(hi + cm)
        p0o, p1o = sat(lo + cm), sat(hi + m)
        dec_e = p1e <= p0e
        dec_o = p1o <= p0o
        new = merge(jnp.minimum(p0e, p1e), jnp.minimum(p0o, p1o), phase)
        rlo, rhi = split(rv, phase)
        # deferred-shift register exchange (see _kernel_regs_cg)
        reg_e = jnp.where(dec_e, rhi, rlo)
        reg_o = jnp.where(dec_o, rhi, rlo) | (1 << pos)
        new_regs = merge(reg_e, reg_o, phase)
        return new, new_regs

    def six(i, carry):
        mcur, rcur = carry
        t0 = 6 * i
        if reset_at >= 0:
            # front-pad support: at the pad/real boundary (a window
            # start), discard the pad region's state and start the real
            # trellis from the caller's initial metrics + seeded
            # registers — numerics from here on are identical to an
            # unpadded decode (decode() pads nsteps up to a multiple of
            # 24 so every DAB bitrate gets the cheap ckpt=24 layout)
            hit = chunk_base + t0 == reset_at
            mcur = jnp.where(hit, init_ref[:].astype(mcur.dtype), mcur)
            rcur = jnp.where(
                hit, jax.lax.broadcasted_iota(jnp.int32, rcur.shape, 0),
                rcur)
        rcur = rcur << 6
        for half in range(2):
            for phase in range(3):
                t = t0 + 3 * half + phase
                pos = 5 - (3 * half + phase)
                mcur, rcur = one_step(t, phase, pos, mcur, rcur)
                if (3 * half + phase) % 2 == 1:
                    sub = jnp.where(
                        mcur[0:1, :] > C.RENORMALIZE_THRESHOLD, c63, zero)
                    mcur = jnp.maximum(mcur - sub, zero)
            mcur = reset(mcur)
            rcur = reset(rcur)

        @pl.when((t0 + 6) % ckpt == 0)
        def _():
            reg_ref[pl.ds((t0 + 6) // ckpt - 1, 1)] = rcur[None]
        return mcur, rcur

    mfin, rfin = jax.lax.fori_loop(0, time_chunk // 6, six,
                                   (metrics[:], regs[:]))
    metrics[:] = mfin
    regs[:] = rfin
    met_ref[:] = mfin


def _kernel_regs_x6(time_chunk: int, ckpt: int, mdt, packed, xch_mode,
                    sym_ref, init_ref, reg_ref, met_ref, metrics, regs):
    """Exchange-form 6-phase constant-geometry ACS (no ordering resets).

    The 3-phase CG kernel must restore natural row order every 3 steps
    with an [8, 8] cross-tile sublane transpose (2 arrays x 2 resets per
    6-step window — measured ~24% of the kernel). Here the rotl-1-per-
    step row ordering is simply allowed to run its full 6-step cycle
    (rotl6 = identity), so natural order restores *itself* at window
    boundaries and checkpoints still land in natural order. The price:
    phases 3/4/5 pair rows at sub-tile strides 4/2/1, handled with a
    butterfly exchange instead of split/merge.

    Exchange formulation: with per-row branch metrics F (value m of the
    row's butterfly pair, via one-hot MXU expansion) and Fc = 63 - F,

        P  = sat(M + F)            # lo rows: a+m   hi rows: b+m
        Q  = sat(M + Fc)           # lo rows: a+cm  hi rows: b+cm
        newM = min(P, xch(Q))      # = butterfly min at every row
        take = (xch(Q) + is_hi) <= P   # ties: lo takes hi-pred (ref
                                       # cmpeq semantics), hi keeps self
        newR = where(take, xch(R), R) | (is_hi << pos)

    which is bit-identical to the reference ACS (deconvolve.cpp:243-254)
    at every row. xch at strides 32/16/8 is vreg renaming; at 4/2/1 it
    is an intra-tile sublane shuffle (xch_mode picks stack vs roll
    lowering). Numerics, checkpoint layout, and renorm cadence identical
    to _kernel_regs_cg_mxu.
    """
    B = metrics.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        metrics[:] = init_ref[:]
        # seed each state's register with its own index: the bits above
        # a checkpoint's own window then spell the survivor path's
        # *start state* (pre-frame bits u_{-6}..u_{-1}) instead of
        # zeros. Terminated decode never reads them; the tail-biting
        # wrap convention needs them (traceback.wrap_last6).
        regs[:] = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 0)

    c255 = jnp.asarray(255, mdt)
    c63 = jnp.asarray(63, mdt)
    zero = jnp.asarray(0, mdt)

    # branch-metric patterns: row r of the [8, B] tile is pattern
    # (p0, p1, p2); x_q = 255 if p_q else 0 (g3 == g0)
    prow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    xm8 = [(((prow >> (2 - min(q, 2))) & 1) * 255) for q in range(3)]
    xm8.append(xm8[0])

    def rotl(x, n):
        n = n % 6
        return ((x << n) | (x >> (6 - n))) & 63

    def pat_of(j):
        p = (jax.lax.population_count((j << 1) & int(C.POLYS[0])) & 1) << 2
        p = p | ((jax.lax.population_count((j << 1) & int(C.POLYS[1]))
                  & 1) << 1)
        return p | (jax.lax.population_count((j << 1) & int(C.POLYS[2])) & 1)

    def expand_matrix(phase):
        # E[128, 16]: rows 0-63 one-hot at pat(j) (selecting m), rows
        # 64-127 at 8+pat(j) (selecting cm = 63-m from the X tile), j =
        # pair index of the state held at row p (state = rotl_phase(p)).
        # One matmul yields [F; Fc] stacked — no 63-F VPU op per step.
        r = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 1)
        j = rotl(r & 63, phase) & 31
        col = pat_of(j) + jnp.where(r >= 64, 8, 0)
        return (c == col).astype(jnp.bfloat16)

    Es = [expand_matrix(p) for p in range(6)]

    p64 = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
    # is_hi / register-bit masks per phase ([64, 1] broadcasts)
    his = [(p64 >> ((5 - p) % 6)) & 1 for p in range(6)]
    hi_m = [h.astype(mdt) for h in his]                  # for take cmp
    hi_bit = [h << (5 - p) for p, h in enumerate(his)]   # register bit

    def xch(A, phase):
        s = 1 << ((5 - phase) % 6)
        if xch_mode == "roll" and s < 8:
            lo = (p64 >> ((5 - phase) % 6)) & 1
            # roll(64 - s) == roll(-s): element p+s lands at row p
            return jnp.where(lo == 0, pltpu.roll(A, 64 - s, axis=0),
                             pltpu.roll(A, s, axis=0))
        G = 64 // (2 * s)
        Ar = A.reshape(G, 2, s, B)
        return jnp.stack([Ar[:, 1], Ar[:, 0]], axis=1).reshape(64, B)

    def one_step(t, phase, mv, rv):
        if packed:
            srow = sym_ref[pl.ds(t, 1)][0]                  # [1, B] i32
            sq = [(srow >> (8 * q)) & 255 for q in range(4)]
        else:
            s4 = sym_ref[pl.ds(t, 1)][0]
            sq = [s4[q][None, :] & 0xFF for q in range(4)]
        a = [jnp.broadcast_to(sq[q], (8, B)) ^ xm8[q] for q in range(4)]
        avg = lambda x, y: (x + y + 1) >> 1
        m8 = avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2
        X = jnp.concatenate([m8, 63 - m8], axis=0).astype(jnp.bfloat16)
        FFc = jax.lax.dot_general(
            Es[phase], X, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(mdt)
        P = jnp.minimum(mv + FFc[:64], c255)
        Q = jnp.minimum(mv + FFc[64:], c255)
        XQ = xch(Q, phase)
        newM = jnp.minimum(P, XQ)
        take = (XQ + hi_m[phase]) <= P
        newR = jnp.where(take, xch(rv, phase), rv) | hi_bit[phase]
        return newM, newR

    def six(i, carry):
        mcur, rcur = carry
        t0 = 6 * i
        rcur = rcur << 6
        for phase in range(6):
            mcur, rcur = one_step(t0 + phase, phase, mcur, rcur)
            if phase % 2 == 1:
                sub = jnp.where(mcur[0:1, :] > C.RENORMALIZE_THRESHOLD,
                                c63, zero)
                mcur = jnp.maximum(mcur - sub, zero)

        @pl.when((t0 + 6) % ckpt == 0)
        def _():
            reg_ref[pl.ds((t0 + 6) // ckpt - 1, 1)] = rcur[None]
        return mcur, rcur

    mfin, rfin = jax.lax.fori_loop(0, time_chunk // 6, six,
                                   (metrics[:], regs[:]))
    metrics[:] = mfin
    regs[:] = rfin
    met_ref[:] = mfin


def _kernel_regs(time_chunk: int, ckpt: int, mdt, sym_ref, init_ref,
                 reg_ref, met_ref, metrics, regs):
    """Register-exchange ACS: each state carries a 32-bit register of the
    last input bits on its survivor path; every ``ckpt`` steps the
    registers are checkpointed to HBM. Replaces the decision history +
    serial chainback (chainback.inc:18-41) entirely: decoded bits are
    read straight out of checkpointed registers along the survivor chain
    (ops.traceback.chainback_regs), turning the traceback into a
    ~T/ckpt-step walk instead of T.

    ckpt and time_chunk divide nsteps exactly (choose_ckpt), so there is
    no padding and no per-step liveness masking.

    reg_ref: [time_chunk//ckpt, 64, Bt] int32 checkpoints (out)
    metrics/regs: [64, Bt] VMEM scratch, persistent across the time grid;
    the hot loop carries them in vector registers.
    """
    B = metrics.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        metrics[:] = init_ref[:]
        # seed each state's register with its own index: the bits above
        # a checkpoint's own window then spell the survivor path's
        # *start state* (pre-frame bits u_{-6}..u_{-1}) instead of
        # zeros. Terminated decode never reads them; the tail-biting
        # wrap convention needs them (traceback.wrap_last6).
        regs[:] = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 0)

    brow = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    # branch polarity as XOR masks (0 or 255): 255 - s == s ^ 255 for u8
    xmask = [((jax.lax.population_count((brow << 1) & int(C.POLYS[j])) & 1)
              * 255).astype(mdt) for j in range(4)]
    c255 = jnp.asarray(255, mdt)
    c63 = jnp.asarray(63, mdt)
    zero = jnp.asarray(0, mdt)

    def one_step(t, mv, rv):
        s4 = sym_ref[pl.ds(t, 1)][0]
        a = [jnp.broadcast_to((s4[j][None, :] & 0xFF).astype(mdt),
                              (32, B)) ^ xmask[j] for j in range(4)]
        avg = lambda x, y: (x + y + 1) >> 1
        m = (avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2) & c63
        cm = c63 - m
        lo, hi = mv[:32], mv[32:]
        sat = lambda x: jnp.minimum(x, c255)
        p0e, p1e = sat(lo + m), sat(hi + cm)
        p0o, p1o = sat(lo + cm), sat(hi + m)
        dec_e = p1e <= p0e
        dec_o = p1o <= p0o
        new = jnp.stack([jnp.minimum(p0e, p1e), jnp.minimum(p0o, p1o)],
                        axis=1).reshape(64, B)
        rlo, rhi = rv[:32], rv[32:]
        reg_e = jnp.where(dec_e, rhi, rlo) << 1          # shift in bit 0
        reg_o = (jnp.where(dec_o, rhi, rlo) << 1) | 1    # shift in bit 1
        new_regs = jnp.stack([reg_e, reg_o], axis=1).reshape(64, B)
        return new, new_regs

    def pair(i, carry):
        mcur, rcur = carry
        t0 = 2 * i
        mcur, rcur = one_step(t0, mcur, rcur)
        mcur, rcur = one_step(t0 + 1, mcur, rcur)
        # renormalize: subtract 63 (saturating at 0) from every state of
        # frames whose state-0 metric exceeds the threshold
        sub = jnp.where(mcur[0:1, :] > C.RENORMALIZE_THRESHOLD,
                        c63, zero)
        mcur = jnp.maximum(mcur - sub, zero)

        @pl.when((t0 + 2) % ckpt == 0)
        def _():
            reg_ref[pl.ds((t0 + 2) // ckpt - 1, 1)] = rcur[None]
        return mcur, rcur

    mfin, rfin = jax.lax.fori_loop(0, time_chunk // 2, pair,
                                   (metrics[:], regs[:]))
    metrics[:] = mfin
    regs[:] = rfin
    met_ref[:] = mfin


def _kernel_mxu(nsteps: int, time_chunk: int, packed: bool, sym_ref,
                init_ref, dec_ref, met_ref, metrics):
    """MXU-assisted decisions kernel: same trellis layout and outputs
    as ``_kernel`` (natural state order, reference 2xu32 decision
    words), with three per-step savings:

      * branch metrics computed once on the [8, B] polarity-pattern
        tile and expanded to the [m; cm] [64, B] rows by a one-hot
        bf16 matmul (exact: values <= 63) — the expansion rides the
        otherwise idle MXU (same trick as _kernel_regs_cg_mxu),
      * decisions packed to words by a [8, 64] weight matmul over
        16-bit halves (each partial sum < 2^16, exact in f32) instead
        of a 32-row sublane reduction — and the weight matrix folds in
        the even/odd interleave, so the decision tensor never needs
        the stack/reshape shuffle,
      * path metrics carried in f32 (integers <= 318, exact), skipping
        per-step int converts of the MXU output.

    Numerics bit-identical to ``_kernel`` / the reference.
    """
    B = metrics.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        metrics[:] = init_ref[:].astype(jnp.float32)

    step0 = pl.program_id(1) * time_chunk

    # [8, B] polarity-pattern masks: row r = pattern (p0, p1, p2) =
    # (bit2, bit1, bit0) of r; x_q = 255 if p_q else 0 (g3 == g0)
    prow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    xm8 = [((prow >> (2 - min(q, 2))) & 1) * 255 for q in range(3)]
    xm8.append(xm8[0])

    # expansion matrix P[64, 16]: row r < 32 one-hot at pat(b=r)
    # (selects m), row r >= 32 at 8 + pat(r - 32) (selects cm)
    r64 = jax.lax.broadcasted_iota(jnp.int32, (64, 16), 0)
    c16 = jax.lax.broadcasted_iota(jnp.int32, (64, 16), 1)
    b = r64 & 31
    pat = (jax.lax.population_count((b << 1) & int(C.POLYS[0])) & 1) << 2
    pat = pat | ((jax.lax.population_count((b << 1) & int(C.POLYS[1]))
                  & 1) << 1)
    pat = pat | (jax.lax.population_count((b << 1) & int(C.POLYS[2])) & 1)
    P = (c16 == pat + jnp.where(r64 >= 32, 8, 0)).astype(jnp.bfloat16)

    # packing matrix W[8, 64] over the un-interleaved [dec_e; dec_o]
    # layout: dec row r < 32 is state 2r, row r >= 32 is state
    # 2(r-32)+1; 16-bit half h of the two words covers states
    # 16h..16h+15 (rows 4..7 zero padding for the MXU tile)
    h8 = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 0)
    rW = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 1)
    sW = jnp.where(rW < 32, 2 * rW, 2 * (rW - 32) + 1)
    inhalf = (sW >= 16 * h8) & (sW < 16 * (h8 + 1)) & (h8 < 4)
    # power-of-two weights via integer shifts (values <= 2^15, exact
    # in bf16); no transcendental in the kernel
    Wpack = jnp.where(inhalf, 1 << ((sW - 16 * h8) & 15), 0) \
        .astype(jnp.float32).astype(jnp.bfloat16)

    c255 = jnp.float32(255)
    c63 = jnp.float32(63)

    def one_step(t, mv):
        if packed:
            srow = sym_ref[pl.ds(t, 1)][0]                 # [1, B] i32
            sq = [(srow >> (8 * q)) & 255 for q in range(4)]
        else:
            s4 = sym_ref[pl.ds(t, 1)][0]                   # [4, B]
            sq = [s4[q][None, :] & 0xFF for q in range(4)]
        a = [jnp.broadcast_to(sq[q], (8, B)) ^ xm8[q] for q in range(4)]
        avg = lambda x, y: (x + y + 1) >> 1
        m8 = avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2
        X = jnp.concatenate([m8, 63 - m8], axis=0).astype(jnp.bfloat16)
        M = jax.lax.dot_general(P, X, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m, cm = M[:32], M[32:]
        lo, hi = mv[:32], mv[32:]
        sat = lambda x: jnp.minimum(x, c255)
        p0e, p1e = sat(lo + m), sat(hi + cm)
        p0o, p1o = sat(lo + cm), sat(hi + m)
        # metrics interleave [even; odd] -> natural order (trellis
        # permutation, unavoidable in the naive geometry)
        new = jnp.stack([jnp.minimum(p0e, p1e), jnp.minimum(p0o, p1o)],
                        axis=1).reshape(64, B)
        # decisions stay un-interleaved; Wpack folds the interleave in
        dec = jnp.concatenate(
            [(p1e <= p0e).astype(jnp.bfloat16),
             (p1o <= p0o).astype(jnp.bfloat16)], axis=0)    # [64, B]
        halves = jax.lax.dot_general(
            Wpack, dec, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [8, B]
        hi_ = halves.astype(jnp.int32)
        words = jnp.stack([hi_[0] + (hi_[1] << 16),
                           hi_[2] + (hi_[3] << 16)], axis=0)  # [2, B]
        return new, jax.lax.bitcast_convert_type(words, jnp.uint32)

    def pair(i, mcur):
        t0 = 2 * i
        for sub in range(2):
            t = t0 + sub
            live = step0 + t < nsteps
            new, dwords = one_step(t, mcur)
            mcur = jnp.where(live, new, mcur)
            dec_ref[pl.ds(t, 1)] = dwords[None]
        pair_live = step0 + t0 < nsteps
        renorm = (mcur[0:1, :] > C.RENORMALIZE_THRESHOLD) & pair_live
        mcur = jnp.where(renorm, jnp.maximum(mcur - c63, 0.0), mcur)
        return mcur

    mfin = jax.lax.fori_loop(0, time_chunk // 2, pair, metrics[:])
    metrics[:] = mfin
    met_ref[:] = mfin


def pack_symbols(symbols: jax.Array, nsteps: int) -> jax.Array:
    """[B, >=4*nsteps] soft symbols -> time-major packed [nsteps, B] i32.

    One trellis step's four symbols occupy one int32 (sym j in byte j) —
    the layout the fast kernels consume. 4x less transpose traffic than
    the [nsteps, 4, B] form; a host runtime can also deliver this layout
    directly (native/vitio.cpp packs it on ingest).
    """
    s = symbols[:, : 4 * nsteps].astype(jnp.int32) & 0xFF
    s = s.reshape(symbols.shape[0], nsteps, 4)
    packed = (s[..., 0] | (s[..., 1] << 8) | (s[..., 2] << 16)
              | (s[..., 3] << 24))
    return packed.T                                    # [nsteps, B]


def pack_symbols_host(symbols: np.ndarray) -> np.ndarray:
    """Host-side zero-arithmetic packing: [B, 4T] soft symbols (values
    0..255 in any integer dtype) -> [B, T] int32, one trellis step per
    word. The DAB symbol stream already arrives as consecutive bytes
    s0 s1 s2 s3 per step, so this is a byte-reinterpret (little-endian),
    the layout native/vitio.cpp produces on ingest — and it cuts
    host->device transfer 4x vs u32-per-symbol.
    """
    b, s4 = symbols.shape
    assert s4 % 4 == 0
    # zero-copy when frames already arrive as contiguous u8 (the
    # over-the-wire layout): astype would copy even u8->u8
    a = np.ascontiguousarray(symbols) if symbols.dtype == np.uint8 \
        else np.ascontiguousarray(symbols.astype(np.uint8))
    return a.view(np.int32).reshape(b, s4 // 4)


@functools.partial(jax.jit,
                   static_argnames=("nsteps", "time_chunk", "interpret",
                                    "b_tile", "metric_dtype", "ckpt",
                                    "mxu", "packed", "geom", "xch_mode",
                                    "front_pad"))
def forward_regs(symbols: jax.Array, nsteps: int,
                 initial_metrics: jax.Array | None = None,
                 time_chunk: int | None = None, interpret: bool = False,
                 b_tile: int = 512, metric_dtype=None,
                 ckpt: int | None = None, mxu: bool = True,
                 packed: bool | str = False, geom: str = "cg3",
                 xch_mode: str = "stack", front_pad: int = 0):
    """Fused forward pass with path-register checkpoints.

    ``symbols``: [B, >=4*nsteps] int32 — or pre-packed one-word-per-step
    int32 (see ``pack_symbols``/``pack_symbols_host``): time-major
    [nsteps, B] with ``packed=True``/``packed="tb"``, or frame-major
    [B, nsteps] with ``packed="bt"`` (the host-natural layout; a single
    int32 transpose happens on device).
    Returns (ckpt_regs int32[nsteps//choose_ckpt(nsteps), 64, B],
    final_metrics int32[B, 64]). Checkpoint k holds, per state, the last
    32 survivor-path input bits as of trellis time (k+1)*ckpt.
    """
    assert nsteps % 2 == 0
    if front_pad:
        # prepend dead trellis steps so nsteps lands on a cheap
        # checkpoint period; the kernel re-initializes metrics and
        # registers at the boundary (reset_at), so the real region is
        # bit-identical to an unpadded decode and the pad's ~1% extra
        # steps buy an up-to-4x shorter checkpoint/walk layout
        assert front_pad % 6 == 0 and front_pad > 0
        if packed == "bt":
            symbols = jnp.pad(symbols.astype(jnp.int32),
                              ((0, 0), (front_pad, 0)))
        elif packed:
            symbols = jnp.pad(symbols.astype(jnp.int32),
                              ((front_pad, 0), (0, 0)))
        else:
            symbols = jnp.pad(symbols[:, : C.RATE * nsteps]
                              .astype(jnp.int32),
                              ((0, 0), (C.RATE * front_pad, 0)))
        nsteps = nsteps + front_pad
    if ckpt is None:
        ckpt = choose_ckpt(nsteps)
    assert nsteps % ckpt == 0 and ckpt % 2 == 0 and ckpt <= 26
    if metric_dtype is None:
        # f32 metrics skip the per-step MXU-output convert (integer
        # values <= 318 are exact in f32; measured ~17% faster); the
        # non-MXU kernels XOR in metric dtype and need int32
        metric_dtype = jnp.float32 if (mxu and ckpt % 6 == 0) else jnp.int32
    if time_chunk is None:
        time_chunk = _choose_time_chunk(nsteps, ckpt)
    assert time_chunk % ckpt == 0 and nsteps % time_chunk == 0
    if packed == "bt":
        symbols = symbols.T                  # [B, nsteps] -> [nsteps, B]
        packed = True
    B = symbols.shape[1] if packed else symbols.shape[0]
    Bp, bt = _batch_tile(B, b_tile)
    nbt = Bp // bt
    nchunks = nsteps // time_chunk
    ncheck = nsteps // ckpt

    if packed:
        assert symbols.shape[0] == nsteps
        syms = symbols.astype(jnp.int32)
        if Bp != B:
            syms = jnp.pad(syms, ((0, 0), (0, Bp - B)))
        syms = syms[:, None, :]                      # [nsteps, 1, Bp]
        sym_spec = pl.BlockSpec((time_chunk, 1, bt), lambda i, j: (j, 0, i),
                                memory_space=pltpu.VMEM)
    else:
        syms = symbols[:, : 4 * nsteps].astype(jnp.int32)
        syms = syms.T.reshape(nsteps, 4, B)
        if Bp != B:
            syms = jnp.pad(syms, ((0, 0), (0, 0), (0, Bp - B)))
        sym_spec = pl.BlockSpec((time_chunk, 4, bt), lambda i, j: (j, 0, i),
                                memory_space=pltpu.VMEM)

    if initial_metrics is None:
        row = jax.lax.broadcasted_iota(jnp.int32, (64, Bp), 0)
        init = jnp.where(row == 0, 0, 63)
    else:
        init = jnp.pad(initial_metrics.astype(jnp.int32).T,
                       ((0, 0), (0, Bp - B)), constant_values=63)
    init = init.astype(metric_dtype)

    if geom == "x6":
        assert ckpt % 6 == 0, "x6 geometry needs 6 | ckpt"
        assert not front_pad, "front_pad needs the cg3 kernels"
        kernel = functools.partial(_kernel_regs_x6, time_chunk, ckpt,
                                   metric_dtype, packed, xch_mode)
    elif ckpt % 6 == 0:
        kern_fn = _kernel_regs_cg_mxu if mxu else _kernel_regs_cg
        kernel = functools.partial(kern_fn, time_chunk, ckpt, metric_dtype,
                                   packed, front_pad if front_pad else -1)
    else:
        assert not packed and not front_pad, \
            "packed/padded input requires the CG kernels"
        kern_fn = _kernel_regs
        kernel = functools.partial(kern_fn, time_chunk, ckpt, metric_dtype)
    cpb = time_chunk // ckpt
    regs, fmetrics = pl.pallas_call(
        kernel,
        grid=(nbt, nchunks),  # batch-major: full trellis per batch tile
        in_specs=[
            sym_spec,
            pl.BlockSpec((64, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cpb, 64, bt), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ncheck, 64, Bp), jnp.int32),
            jax.ShapeDtypeStruct((64, Bp), metric_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((64, bt), metric_dtype),
                        pltpu.VMEM((64, bt), jnp.int32)],
        interpret=interpret,
    )(syms, init)

    return regs[:, :, :B], fmetrics[:, :B].astype(jnp.int32).T


def decode(symbols: jax.Array, framebits: int, **kw) -> jax.Array:
    """Fused end-to-end decode: forward_regs + checkpoint-walk traceback
    with a consistent checkpoint period. [B, 4*(framebits+6)] int32 ->
    uint8[B, framebits//8].

    The trellis layout (front_pad, ckpt, time_chunk) is chosen jointly
    by ``choose_layout``: a few dead front-pad steps (<= ~2%) buy every
    CG-eligible shape a ckpt >= 18 checkpoint period AND a large time
    chunk — shapes with prime nsteps/ckpt otherwise degrade to
    one-checkpoint grid chunks (round-4 measurement: +4-6% at framebits
    768/2304/4608; round-3: up to +32% vs the ckpt-6 fallback at
    1536/4608/9216 — docs/KERNELS.md)."""
    from . import traceback as tb
    nsteps = framebits + C.TAIL_BITS
    interpret = kw.get("interpret", False)
    explicit_ckpt = kw.get("ckpt") is not None
    ckpt = kw.pop("ckpt", None) or choose_ckpt(nsteps)
    pad = 0
    # padding requires window-aligned boundaries (reset lands at a
    # 6-step window start), so only nsteps % 6 == 0 qualifies — other
    # framebits (e.g. 64 -> nsteps 70) keep their natural ckpt and the
    # non-CG kernel.  An explicitly requested ckpt/time_chunk is
    # honored as-is (no silent layout override).
    if (not explicit_ckpt and nsteps % 6 == 0 and "geom" not in kw
            and kw.get("mxu", True) and "time_chunk" not in kw):
        pad, ckpt, chunk = choose_layout(nsteps)
        kw["time_chunk"] = chunk
    regs, _ = forward_regs(symbols, nsteps, ckpt=ckpt, front_pad=pad,
                           **kw)
    return tb.chainback_regs_pallas(regs, framebits, ckpt=ckpt,
                                    interpret=interpret, offset=pad)
