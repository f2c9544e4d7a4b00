"""Latency-optimized Cholesky + quadratics for SMALL batches (K <= ~16).

The Metropolis hot loop evaluates a K-candidate batched log-posterior
(K = 4 speculative proposals, `infer/metropolis.py`) thousands of times
*sequentially* — the wall-clock floor of the full-Bayesian fit is K-batched
Cholesky LATENCY, not throughput. The two existing kernels cover the wrong
regimes for that:

* `pallas_chol_lanes` (batch across 128 VPU lanes) has per-KERNEL latency
  ~1.2 ms — its (n, n, 128)-wide update costs the same whether 4 or 128
  lanes carry real matrices; only wide scans amortize it.
* XLA's batched Cholesky is blocked + panel-recursive per matrix; at K=4 a
  single factorization's sequential depth dominates.

Here ALL K matrices are factorized simultaneously by ONE program with the
batch on the LEADING (untiled) axis: each right-looking step extracts the
pivot column of every matrix and applies K rank-1 downdates as a single
(K, n, n) vector op — (K/8)x fewer tile-ops per step than the lanes layout,
with no per-matrix grid serialization.

The trailing submatrix stays SYMMETRIC through right-looking downdates, so
the pivot column is extracted TWICE — as a lane-masked reduce (giving the
sublane orientation) and a sublane-masked reduce (lane orientation) — and
the rank-1 update is the broadcast product of the two: no in-kernel
transpose, which Mosaic lowers badly. Forward substitution for the [y, 1]
right-hand sides is fused into the same loop (step j consumes exactly the
column step j produced), yielding {logdet, y'R^-1 y, 1'R^-1 y, 1'R^-1 1}
directly — the full sufficient statistic for every likelihood in the
framework (`ops/gp.py`), same contract as `chol_quadratics`.

The factorization loop runs the STATIC unpadded n (not the 128 pad): the
identity pad block contributes nothing to the quadratics and skipping it
saves (128 - n) dead steps of the latency-critical recurrence.

Three entry points share the factorization core:
  * `chol_quadratics_smallk`      — takes materialized Grams;
  * `fused_mix_quadratics_smallk` — builds the SE-mixture Gram in VMEM
    from the shared per-axis squared-difference stack;
  * `fused_mix_mh_round`          — additionally folds the per-candidate
    log-posterior assembly and the Metropolis first-acceptance scan into
    the kernel: ONE kernel per speculative round (the profiler showed
    ~12 of 33 us per round lost to ~30 tiny XLA selection ops).

Non-PSD inputs surface as NaN (sqrt/rsqrt of a negative pivot), matching
the framework's NaN-as-rejection dataflow; NaN log-posteriors compare
False in the acceptance test, i.e. auto-reject.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TILE = 128
# Kernel-side cap on the blocked-Schur recursion (n <= MAX_N). The fit
# path (`models/likelihood.py` / `ops/pallas_chol.py`) routes
# n <= DISPATCH_N_CAP here — the regime with measured on-chip parity +
# latency wins. Hardware validation at n=600/768/1024 (round 3,
# scripts/verify_multitile_tpu.py + verify_multitile_oracle.py +
# time_multitile_tpu.py): all sizes finite on chip, kernel MORE accurate
# than the XLA bordered path vs a CPU-f64 oracle on every quadratic, and
# ~3x faster (0.215/0.246/0.330 ms/eval vs XLA 0.664/0.727/0.999, K=4),
# so the dispatch runs to MAX_N. (Interpret-mode equality alone does NOT
# rule out a Mosaic miscompile — see `_chol_quad_core_slabs`'s history —
# hence the on-chip gate before each widening.)
MAX_TILES = 8
MAX_N = MAX_TILES * TILE
DISPATCH_N_CAP = MAX_N
# Hardware-validated VMEM envelope for the dispatch: K * tiles^2 budget
# units. K=4 at n=1024 (4 * 64 = 256) ran on chip; K=16 at n=512
# (16 * 16 = 256) is the widest small-n batch the dispatch has ever
# routed. Beyond the envelope the kernel working set (~K * n^2 floats
# plus scratch) can exceed the ~100 MB VMEM kernel limit, which fails
# hard in Mosaic rather than falling back — so the dispatch must bound
# it, not discover it.
DISPATCH_BUDGET = 256


def dispatch_ok(n: int, k: int) -> bool:
    """True when (n, K) is inside the small-K kernels' validated
    dispatch envelope (callers fall back to XLA otherwise)."""
    tiles = -(-n // TILE)
    return (n <= DISPATCH_N_CAP and k <= 16
            and k * tiles * tiles <= DISPATCH_BUDGET)


def _make_kernel(n: int):
    def _kernel(gram_ref, ry_ref, ro_ref, out_ref):
        m = gram_ref[...]          # (K, N, N) — trailing block stays symmetric
        ry = ry_ref[...]           # (K, 1, N)
        ro = ro_ref[...]           # (K, 1, N)
        dtype = m.dtype
        kk = m.shape[0]

        ld, qyy, qoy, qoo, _, _, _ = _core_for(m.shape[-1])(
            m, ry, ro, n, kk, dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, m.shape[-1]), 2)
        out_ref[...] = jnp.where(
            lane == 0, ld, jnp.where(
                lane == 1, qyy, jnp.where(
                    lane == 2, qoy, jnp.where(lane == 3, qoo, 0.0))))

    return _kernel


def _chol_quad_core_blocked(m, ry, ro, n: int, kk: int, dtype):
    """Rank-8 blocked right-looking core: panel ministeps on ONE-TILE
    (K, 8, N) row slabs, trailing downdate as one batched MXU dot.

    Per 8 columns, the full-(K, N, N) traffic is ONE read-modify-write
    (the dot subtract) instead of eight rank-1 passes plus sixteen masked
    extractions — the panel work happens on (K, 8, N) arrays that occupy
    a single (8, 128) tile per batch element. The trailing product
    sum_r L[i, j0+r] L[k, j0+r] is `dot_general` contracting the panel
    axis at HIGHEST precision (bf16 MXU passes break Cholesky; measured
    2.6e-6 max err vs 0.06 default). Row slices m[:, j0:j0+8, :] are
    TILE-ALIGNED static slices (the arbitrary-offset slices that lost in
    `_chol_quad_core`'s notes are sub-tile; aligned ones are free).

    Correctness around the identity pad: pad rows stay e_j through every
    update (their cross entries are zero), contribute only to dead
    entries of the trailing dot, and skipped ministeps (j >= n) leave
    them untouched — so partial last panels need no masking.

    MEASURED VERDICT (v5e, n=100, K=4, full fit timing): 57.0 ms vs the
    rank-1 unrolled core's 45.7 ms, plus a ~10 min Mosaic compile — the
    13 small HIGHEST-precision MXU dots cost more latency than the
    full-matrix passes they replace. Kept as a tested exploration
    baseline; `_SINGLE_CORE` stays off it.
    """
    tile = m.shape[-1]
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (kk, 8, 1), 1)
    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    for j0 in range(0, n, 8):
        r8 = m[:, j0:j0 + 8, :]                              # (K, 8, N)
        for r in range(min(8, n - j0)):
            j = j0 + r
            rowr = jnp.sum(jnp.where(i8 == r, r8, 0.0), axis=1,
                           keepdims=True)                    # (K, 1, N)
            d2 = jnp.sum(jnp.where(iilane == j, rowr, 0.0), axis=2,
                         keepdims=True)                      # (K, 1, 1)
            dinv = jax.lax.rsqrt(d2)
            ld = ld + jnp.log(d2)
            lrow = jnp.where(iilane > j, rowr, 0.0) * dinv   # (K, 1, N)
            rowfull = jnp.where(iilane == j, d2 * dinv, lrow)
            c8 = jnp.sum(jnp.where(iilane == j, r8, 0.0), axis=2,
                         keepdims=True)                      # (K, 8, 1)
            sub = jnp.where(i8 > r, c8, 0.0) * dinv
            r8 = jnp.where(i8 == r, rowfull, r8 - sub * rowfull)
            rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                          keepdims=True) * dinv              # (K, 1, 1)
            rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                          keepdims=True) * dinv
            wy = jnp.where(iilane == j, rjy, wy)
            wo = jnp.where(iilane == j, rjo, wo)
            ry = ry - lrow * rjy
            ro = ro - lrow * rjo
        # r8 row r now holds L[., j0+r] as a lane vector (zeros below j);
        # one MXU contraction applies all eight rank-1 downdates — stale
        # values land only in already-consumed or padded (dead) entries
        upd = jax.lax.dot_general(r8, r8, (((1,), (1,)), ((0,), (0,))),
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=dtype)
        m = m - upd
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo


def _chol_quad_core_slabs(m, ry, ro, n: int, kk: int, dtype):
    """Triangular-aware slab core: ~2.5x fewer VPU ops than the rank-1
    core in exact arithmetic — kept as a TESTED-AND-REJECTED exploration.

    Idea: after step j the rows < j are mathematically frozen (their lrow
    mask is 0, so `m - 0*llane` rewrites them unchanged); holding m as a
    Python list of (K, 8, tile) sublane slabs lets each fully-unrolled
    step touch only the pivot-and-trailing slabs, shrinking per-step work
    from ns rows to ns - 8*floor(j/8).

    MEASURED VERDICT (v5e, round 3): CPU interpret mode is BIT-IDENTICAL
    to `_chol_quad_core` (n = 7/16/100, tests), but Mosaic MISCOMPILES it
    on the chip — every candidate log-posterior comes back NaN (zero MH
    acceptances at n=100; suspect the 8-row sublane-masked pivot reduce
    over slab values) — and kernel compiles degrade to >20 minutes even
    at n=32. `_SINGLE_CORE` stays off it until the Mosaic issues are
    fixed upstream; do not enable without re-verifying the pinned bench
    chain (1060 recorded / 6746 proposals) on hardware.
    """
    ns, tile = m.shape[1], m.shape[-1]
    nsl = ns // 8
    slabs = [m[:, 8 * s:8 * (s + 1), :] for s in range(nsl)]
    i8 = jax.lax.broadcasted_iota(jnp.int32, (kk, 8, 1), 1)
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    for j in range(n):
        s0, r0 = divmod(j, 8)
        clane = jnp.sum(jnp.where(i8 == r0, slabs[s0], 0.0), axis=1,
                        keepdims=True)                      # (K, 1, N)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                         # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv    # (K, 1, N)
        for s in range(s0, nsl):
            crow = jnp.sum(jnp.where(iilane == j, slabs[s], 0.0), axis=2,
                           keepdims=True)                   # (K, 8, 1)
            rows = i8 + 8 * s
            lrow = jnp.where(rows > j, crow, 0.0) * dinv
            slabs[s] = slabs[s] - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    m_fin = jnp.concatenate(slabs, axis=1)
    return ld, qyy, qoy, qoo, m_fin, wy, wo


def _chol_quad_core(m, ry, ro, n: int, kk: int, dtype):
    """Shared factorization + fused substitution core.

    Measured formulation notes (v5e, n=100, K=4, full fit timing):
    * masked-reduce extraction in a FULLY UNROLLED fori_loop: 45.7 ms —
      the winner, used here;
    * same but one extraction + (1, N) -> (N, 1) vector swapaxes: 93 ms
      (Mosaic lowers even vector transposes pathologically);
    * Python loop with STATIC pivot slices m[:, j:j+1, :] and scalar
      quadratic accumulators: 54.7 ms and 174 s Mosaic compile —
      arbitrary-offset slices relayout worse than masked full-tile reduces.
    """
    ns, tile = m.shape[1], m.shape[-1]   # sublane dim may be < tile:
    # rows are padded only to the next multiple of 8 (not 128). Measured
    # wall-clock-neutral on the bench (Mosaic appears to re-pad layouts
    # internally); kept for the smaller VMEM working set
    iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns, 1), 1)
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)

    def step(j, carry):
        m, ld, ry, ro, wy, wo = carry
        # pivot column j in both orientations (trailing block symmetric)
        crow = jnp.sum(jnp.where(iilane == j, m, 0.0), axis=2,
                       keepdims=True)                       # (K, N, 1)
        clane = jnp.sum(jnp.where(iirow == j, m, 0.0), axis=1,
                        keepdims=True)                      # (K, 1, N)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                         # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        lrow = jnp.where(iirow > j, crow, 0.0) * dinv       # (K, N, 1)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv    # (K, 1, N)
        m = m - lrow * llane
        # fused forward substitution: w_j = r_j / d, r -= l_col * w_j
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv                 # (K, 1, 1)
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
        return m, ld, ry, ro, wy, wo

    zero_v = jnp.zeros((kk, 1, tile), dtype)
    # full unroll only in the single-tile regime: at n > 128 the unrolled
    # Mosaic program gets too large to compile in reasonable time, and the
    # rolled loop is still ~5x ahead of the XLA fallback
    m, ld, _, _, wy, wo = jax.lax.fori_loop(
        0, n, step,
        (m, jnp.zeros((kk, 1, 1), dtype), ry, ro, zero_v, zero_v),
        unroll=n if n <= 128 else 1)
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)           # (K, 1, 1)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    # byproducts returned for free (no extra per-step ops): the final m's
    # column j is the UNSCALED Cholesky column d_j^{1/2} L[:, j] (columns
    # <= j are never touched after step j), its diagonal is d_j, and
    # (wy, wo) are the whitened [y, 1] — together the full per-draw
    # prediction factor cache (predict/factors.py) at zero marginal cost
    return ld, qyy, qoy, qoo, m, wy, wo


def _chol_quad_core_rowslab(m, ry, ro, n: int, kk: int, dtype):
    """Rank-1 core with a SLAB pivot-row read: bit-identical arithmetic
    to `_chol_quad_core`, but the per-step pivot-row extraction reads the
    tile-aligned 8-row slab holding row j (a static sublane slice — the
    blocked core proved these lower cleanly on v5e, unlike the sub-tile
    1-row slices that sent Mosaic compiles to 174 s) and masks within it,
    instead of masked-reducing the FULL (K, ns, tile) matrix. That cuts
    one of the ~3 full-matrix passes per step; the column extraction
    (crow) and the rank-1 update are irreducibly full-width. Requires a
    static pivot index, hence a Python loop — single-tile (n <= 128)
    only, like the full unroll it replaces.

    Bit-exactness vs `_chol_quad_core`: both extractions sum exactly one
    nonzero term (adding f32 zeros is exact), every other op is
    unchanged and in the same order — so outputs are bit-identical and
    the pinned bench chain replays (tests/test_pallas_chol.py asserts
    integer-level equality in interpret mode; the on-chip gate is
    scripts/verify_rowslab_tpu.py).
    """
    ns, tile = m.shape[1], m.shape[-1]
    iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns, 1), 1)
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (kk, min(8, ns), 1), 1)

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    for j in range(n):
        s0 = 8 * (j // 8)
        slab = m[:, s0:min(s0 + 8, ns), :]              # aligned static read
        clane = jnp.sum(jnp.where(i8[:, :slab.shape[1]] == (j - s0),
                                  slab, 0.0), axis=1,
                        keepdims=True)                  # (K, 1, N)
        crow = jnp.sum(jnp.where(iilane == j, m, 0.0), axis=2,
                       keepdims=True)                   # (K, N, 1)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                     # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        lrow = jnp.where(iirow > j, crow, 0.0) * dinv   # (K, N, 1)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        m = m - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv             # (K, 1, 1)
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo, m, wy, wo


def _chol_quad_core_rowslab_fused(m, ry, ro, n: int, kk: int, dtype):
    """Rowslab core with the NEXT pivot column's extraction fused into the
    current step's rank-1 pass.

    `_chol_quad_core_rowslab` still pays two sequentially-dependent
    full-(K, ns, tile) traversals per step: the sublane-oriented pivot
    extraction `crow_j = sum(where(lane == j, m, 0))` must read the m the
    PREVIOUS step wrote, and the rank-1 downdate then rewrites m. Here the
    dependency is broken algebraically: step j extracts column j+1 from
    the PRE-update m and applies the rank-1 correction to that one column
    directly —

        crow_{j+1}  =  extract(m, j+1)  -  lrow_j * llane_j[j+1]

    (llane_j[j+1] is a scalar masked-reduce off the (K, 1, tile) row).
    Both full-width reads of step j now address the SAME m value with no
    write between them, so Mosaic can service the extraction and the
    downdate from one traversal of m — the extraction rides the update
    pass instead of costing its own.

    Bit-exactness vs `_chol_quad_core_rowslab`: the extraction sums the
    single nonzero term m[r, j+1] exactly; the correction computes
    m[r, j+1] - lrow[r] * llane[j+1] — the identical multiply-then-
    subtract the elementwise downdate performs for that entry, on the
    identical operand values, in the same order. All other ops unchanged.
    (Same caveat as every formulation here: interpret-mode equality does
    not rule out a Mosaic miscompile — the on-chip gate is
    scripts/verify_rowslab_tpu.py, which must show EXACT equality before
    `_SINGLE_CORE` may point here.)
    """
    ns, tile = m.shape[1], m.shape[-1]
    iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns, 1), 1)
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (kk, min(8, ns), 1), 1)

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    crow = jnp.sum(jnp.where(iilane == 0, m, 0.0), axis=2,
                   keepdims=True)                       # (K, N, 1)
    for j in range(n):
        s0 = 8 * (j // 8)
        slab = m[:, s0:min(s0 + 8, ns), :]              # aligned static read
        clane = jnp.sum(jnp.where(i8[:, :slab.shape[1]] == (j - s0),
                                  slab, 0.0), axis=1,
                        keepdims=True)                  # (K, 1, N)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                     # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        lrow = jnp.where(iirow > j, crow, 0.0) * dinv   # (K, N, 1)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        if j + 1 < n:
            # next pivot column off the PRE-update m + rank-1 correction:
            # no write->read dependency between this and the downdate below
            lv = jnp.sum(jnp.where(iilane == j + 1, llane, 0.0), axis=2,
                         keepdims=True)                 # (K, 1, 1)
            crow = jnp.sum(jnp.where(iilane == j + 1, m, 0.0), axis=2,
                           keepdims=True) - lrow * lv
        m = m - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv             # (K, 1, 1)
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo, m, wy, wo


def _chol_quad_core_rowslab_sym(m, ry, ro, n: int, kk: int, dtype):
    """Rowslab core with the pivot-COLUMN extraction replaced by a
    transpose of the pivot-row slab read — deleting the remaining
    full-(K, ns, tile) extraction traversal per step, leaving the rank-1
    downdate as the only full-matrix pass.

    Validity: the active trailing block of a Cholesky downdate stays
    BIT-exactly symmetric. Inductively, if m is bit-symmetric then
    lrow[r] * llane[c] and lrow[c] * llane[r] multiply the same two f32
    values (crow[r] == clane[c] etc.), and f32 multiplication is
    commutative bit-wise, so m - lrow*llane is again bit-symmetric; rows/
    columns <= j are never touched after step j. All callers supply
    bit-symmetric inputs: the in-kernel SE-mixture Gram is built from a
    squared-difference stack (exactly symmetric), `chol_quadratics_smallk`
    pads with zero lanes + identity rows whose mirrored entries are zeros
    on both sides, and the multitile base case's Schur complement
    m - dot(us, us^T) mirrors the same commutative products. (A caller
    passing a non-bit-symmetric Gram is outside the Cholesky contract —
    the rank-1 core already mixes both triangles.)

    So crow == transpose(clane) bit-for-bit, and the (K, 1, tile) ->
    (K, tile, 1) swap is a cheap XLU relayout instead of a full matrix
    read. Everything else is unchanged from `_chol_quad_core_rowslab`.
    The on-chip gate (exactness AND the it-didn't-miscompile check) is
    scripts/verify_rowslab_tpu.py.
    """
    ns, tile = m.shape[1], m.shape[-1]
    iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns, 1), 1)
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (kk, min(8, ns), 1), 1)

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    for j in range(n):
        s0 = 8 * (j // 8)
        slab = m[:, s0:min(s0 + 8, ns), :]              # aligned static read
        clane = jnp.sum(jnp.where(i8[:, :slab.shape[1]] == (j - s0),
                                  slab, 0.0), axis=1,
                        keepdims=True)                  # (K, 1, N)
        crow = jnp.swapaxes(clane, 1, 2)[:, :ns, :]     # == column j (sym)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                     # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        lrow = jnp.where(iirow > j, crow, 0.0) * dinv   # (K, N, 1)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        m = m - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv             # (K, 1, 1)
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo, m, wy, wo


def _chol_quad_core_shrink(m, ry, ro, n: int, kk: int, dtype):
    """Rowslab core with a SHRINKING active-row window: step j downdates
    and extracts only the 8-row slabs holding rows > j (slab index
    >= j // 8 — a static bound, so the slab loop unrolls).

    The rank-1 cores spend their cycles on two full-(K, ns, tile) passes
    per step (pivot-column extraction + downdate), but rows <= j are
    FINALIZED: `lrow` is masked to zero there, so the downdate writes
    back `m - 0 * llane` — pure wasted bandwidth that grows to half the
    total as j sweeps the tile. Holding m as a list of 8-row slab values
    (statically indexed, so everything unrolls) lets step j touch only
    slabs >= j // 8: total downdate work drops from ns*n to ~ns*n/2
    elements, without any dynamic shapes.

    Value-exactness vs `_chol_quad_core_rowslab`: active rows see the
    identical ops in the identical order; finalized rows are simply not
    rewritten. The skipped write is `m - (0.0 * dinv) * llane`, which
    preserves every value (x - 0 == x) except that it can flip a -0.0
    entry to +0.0 (and with a singular pivot, dinv=NaN would poison the
    finalized rows of mfin — unobservable: NaN logpost candidates are
    never accepted, so their stash row is never selected). Gates compare
    with np.array_equal (numeric equality, -0 == +0): interpret-mode in
    tests/test_pallas_chol.py, on-chip via scripts/verify_rowslab_tpu.py
    + the full-output A/B in scripts/ab_mhrounds_core.py.
    """
    ns, tile = m.shape[1], m.shape[-1]
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    nsl = (ns + 7) // 8
    slabs = [m[:, 8 * t:min(8 * t + 8, ns), :] for t in range(nsl)]
    irows = [8 * t + jax.lax.broadcasted_iota(
        jnp.int32, (kk, slabs[t].shape[1], 1), 1) for t in range(nsl)]

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    for j in range(n):
        si = j // 8
        clane = jnp.sum(jnp.where(irows[si] == j, slabs[si], 0.0), axis=1,
                        keepdims=True)                  # (K, 1, N)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                     # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        for t in range(si, nsl):
            crow = jnp.sum(jnp.where(iilane == j, slabs[t], 0.0), axis=2,
                           keepdims=True)               # (K, 8, 1)
            lrow = jnp.where(irows[t] > j, crow, 0.0) * dinv
            slabs[t] = slabs[t] - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv             # (K, 1, 1)
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo, jnp.concatenate(slabs, axis=1), wy, wo


def _chol_quad_core_shrink2(m, ry, ro, n: int, kk: int, dtype):
    """Shrink core with the fused [y, 1] substitution STACKED: ry/ro ride
    one (K, 2, tile) block, so each step pays ONE lane-masked reduce, ONE
    dinv scale, ONE lane-masked w write and ONE fma where the row-by-row
    formulation paid two of each.

    MEASURED VERDICT (v5e, scripts/ab_mhrounds_core.py, 15-rep slope):
    shrink 15.7 / shrink2 15.7 us/round — a WASH. A (K, 1, 128) op
    already issues K vregs (the (rows, 128) minor block pads to an
    (8, 128) vreg either way) and the VPU bills vregs, not op count, so
    folding two 1-row ops into one 2-row op moves nothing. Kept as a
    tested exploration; `_SINGLE_CORE` stays on `shrink`. The same
    session measured +-1 us/round RUN-TO-RUN spread across the whole
    core table (DESIGN.md round-4 cont.), so sub-us core differences
    are below the measurement floor; scripts/probe_round_cost.py
    attributes the n=100 round as ~1.6 us fixed grid-step overhead +
    ~10.8 us linear per-step work + ~3.3 us quadratic downdate/Gram.

    Bit-exactness vs `_chol_quad_core_shrink`: every op on the stack is
    row-independent (lane-masked sums add zeros, the dinv broadcast and
    the llane*rj fma multiply the same per-row operands in the same
    order), so row 0 reproduces ry's and row 1 ro's sequence exactly.
    The final wy/wo split is a sublane-masked reduce over exactly one
    nonzero row (exact; float middle-axis reduces of 2-sublane stacks
    lower fine HERE — the (n, 2, B) failures in the working notes were
    offset-layout tiled axes, this stack is layout-native). Gates:
    interpret-mode equality in tests/test_pallas_chol.py, on-chip
    full-output A/B in scripts/ab_mhrounds_core.py.
    """
    ns, tile = m.shape[1], m.shape[-1]
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    nsl = (ns + 7) // 8
    slabs = [m[:, 8 * t:min(8 * t + 8, ns), :] for t in range(nsl)]
    irows = [8 * t + jax.lax.broadcasted_iota(
        jnp.int32, (kk, slabs[t].shape[1], 1), 1) for t in range(nsl)]
    i2 = jax.lax.broadcasted_iota(jnp.int32, (kk, 2, 1), 1)

    ryo = jnp.concatenate([ry, ro], axis=1)             # (K, 2, tile)
    w = jnp.zeros((kk, 2, tile), dtype)
    ld = jnp.zeros((kk, 1, 1), dtype)
    for j in range(n):
        si = j // 8
        clane = jnp.sum(jnp.where(irows[si] == j, slabs[si], 0.0), axis=1,
                        keepdims=True)                  # (K, 1, N)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                     # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        for t in range(si, nsl):
            crow = jnp.sum(jnp.where(iilane == j, slabs[t], 0.0), axis=2,
                           keepdims=True)               # (K, 8, 1)
            lrow = jnp.where(irows[t] > j, crow, 0.0) * dinv
            slabs[t] = slabs[t] - lrow * llane
        rj = jnp.sum(jnp.where(iilane == j, ryo, 0.0), axis=2,
                     keepdims=True) * dinv              # (K, 2, 1)
        w = jnp.where(iilane == j, rj, w)
        ryo = ryo - llane * rj
    wy = jnp.sum(jnp.where(i2 == 0, w, 0.0), axis=1, keepdims=True)
    wo = jnp.sum(jnp.where(i2 == 1, w, 0.0), axis=1, keepdims=True)
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo, jnp.concatenate(slabs, axis=1), wy, wo


def _chol_quad_core_pipe(m, ry, ro, n: int, kk: int, dtype):
    """Software-PIPELINED shrink core: the per-step serial chain
    (pivot-row extract -> lane-reduce d2 -> rsqrt -> scaled row) is fed by
    a CARRIED corrected pivot row instead of reading the downdated matrix,
    so the chain of step j+1 no longer waits for step j's full-matrix
    downdate.

    Motivation (measured, scripts at /tmp round 4): the factorization is
    latency-bound, not throughput-bound — halving the downdate arithmetic
    (shrink) cut only ~1.6 us of a ~12 us factorization, while deleting
    the d2->rsqrt scalar chain alone cut ~5 us. The serial chain IS the
    cost; this core shortens it to corrections on (K, 1, tile) rows.

    Identity (all bit-exact, same two-operand f32 ops in the same order):
    the active block stays bit-symmetric under the rank-1 downdate
    (commutative products — see `_chol_quad_core_rowslab_sym`), so

        row_{j+1}(post step j)
          = row_pre_{j+1} - lrow_j[j+1] * llane_j      (the downdate)
          = row_pre_{j+1} - llane_j[j+1] * llane_j     (symmetry:
            crow_j[j+1] == clane_j[j+1] bit-for-bit, both scaled by the
            same dinv_j)

    where row_pre_{j+1} is a cheap 8-row slab read taken BEFORE the
    downdate writes, and llane_j[j+1] is a lane-masked scalar extract.
    The carried row equals the downdated matrix row bit-for-bit, d2 and
    llane of step j+1 come off the carry, and the t-loop downdate (with
    its per-slab column extraction) runs OFF the serial chain. Gates:
    interpret-mode bit-identity (tests/test_pallas_chol.py), on-chip
    scripts/verify_rowslab_tpu.py + full-output A/B in
    scripts/ab_mhrounds_core.py.
    """
    ns, tile = m.shape[1], m.shape[-1]
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
    nsl = (ns + 7) // 8
    slabs = [m[:, 8 * t:min(8 * t + 8, ns), :] for t in range(nsl)]
    irows = [8 * t + jax.lax.broadcasted_iota(
        jnp.int32, (kk, slabs[t].shape[1], 1), 1) for t in range(nsl)]

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    clane = jnp.sum(jnp.where(irows[0] == 0, slabs[0], 0.0), axis=1,
                    keepdims=True)                      # row 0, initial m
    for j in range(n):
        si = j // 8
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)                     # (K, 1, 1)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        if j + 1 < n:
            # next pivot row off the PRE-downdate slab + scalar correction:
            # the serial chain of step j+1 starts here, concurrent with
            # this step's downdate below
            sj = (j + 1) // 8
            row_pre = jnp.sum(jnp.where(irows[sj] == j + 1, slabs[sj], 0.0),
                              axis=1, keepdims=True)    # (K, 1, N)
            s = jnp.sum(jnp.where(iilane == j + 1, llane, 0.0), axis=2,
                        keepdims=True)                  # == lrow_j[j+1]
            clane = row_pre - s * llane
        for t in range(si, nsl):
            crow = jnp.sum(jnp.where(iilane == j, slabs[t], 0.0), axis=2,
                           keepdims=True)               # (K, 8, 1)
            lrow = jnp.where(irows[t] > j, crow, 0.0) * dinv
            slabs[t] = slabs[t] - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv             # (K, 1, 1)
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)
    return ld, qyy, qoy, qoo, jnp.concatenate(slabs, axis=1), wy, wo


def _chol_quad_core_multitile(m, ry, ro, n: int, kk: int, dtype):
    """Multi-tile (128 < n <= MAX_N) BLOCKED-SCHUR core: per 128-row
    block, 128 fully-unrolled panel steps + ONE MXU Schur downdate of the
    trailing block, recursing (via `_core_for`) on the Schur complement
    until it fits the unrolled single-tile core. Two tiles give the
    classic right-looking blocked scheme with one recursion level; deeper
    sizes peel one 128-block per level (MAX_TILES levels at MAX_N).

    The straight extension of `_chol_quad_core` past 128 lanes is latency-
    dead on Mosaic: the fori supports only unroll=1 or full, the fully
    unrolled 256-step full-width program does not compile in reasonable
    time, and the rolled version measured ~6% SLOWER than the XLA
    bordered fallback (see `chol_quadratics_smallk`). Here every
    sequential step stays on a 128-row panel:

    * phase 1 — 128 unrolled rank-1 steps restricted to the ROW panel
      m[:, :128, :] (rows 0:127 across all lanes). Downdating the row
      panel keeps row j — the symmetric image of pivot column j — current
      over the FULL lane width, so the lane-oriented column extraction
      stays a sublane-masked reduce (no transposes, the Mosaic killer).
      The fused [y, 1] substitution runs full-width exactly as in the
      single-tile core, so trailing lanes of ry/ro finish phase 1 already
      holding r2 - L21 L11^{-1} r1.
    * Schur — after step j row j is frozen, so the upper-right panel
      m1[:, j, 128:] holds the UNSCALED transposed off-diagonal factor
      d_j^{1/2} L[128+i, j] in lane orientation; one row-rescale by the
      accumulated d_j^{-1/2} column and ONE HIGHEST-precision MXU
      dot_general contracting the sublane axis applies all 128 rank-1
      downdates to the trailing block at once (bf16 MXU passes break
      Cholesky — measured on the blocked rank-8 core).
    * recurse — `_core_for` on the (K, ns-128, tile-128) Schur
      complement: the single-tile core (fully unrolled) once the
      complement fits one tile, this core again otherwise.

    Identity-padded rows/lanes pass through unchanged: their panel
    entries stay zero, the Schur dot contributes nothing to them, and
    every level sees the same identity pad the single-tile core expects.
    Non-PSD inputs surface as NaN through rsqrt exactly as in the
    single-tile core.

    Factor byproducts are ASSEMBLED for stashing (round 4): the returned
    matrix's rows 0..127 are the full-width frozen panel (row j holds
    d_j^{1/2} L[i, j] at lane i >= j — including the off-diagonal block,
    since the panel downdate keeps frozen rows current over ALL lanes),
    and rows >= 128 carry the recursion's assembled matrix in lanes
    >= 128 (lanes < 128 zero — the lower-left block is never
    materialized; its values live transposed in the first panel's
    trailing lanes). The UPPER triangle is therefore complete at every
    recursion depth: S[j, i] = d_j^{1/2} L[i, j] for all i >= j, which
    is exactly what the row-scaled stash (`_make_mh_rounds_kernel`)
    and its tril-of-transpose decode (`predict.factors.decode_stash`)
    consume. wy/wo are assembled by disjoint-lane addition (each level
    writes only its own t1 lanes, so x + 0 preserves every value up to
    -0 -> +0, invisible to the numeric-equality gates).
    """
    ns, tile = m.shape[1], m.shape[-1]
    if ns > tile:
        # stash callers append wy/wo landing rows (pad8(n+2) rows) that
        # can overshoot the lane tile when n sits at / one below a tile
        # multiple (n=255/256, 383/384, ...). Those rows are ALL-ZERO in
        # every caller (the rounds kernel's eye mask can't place a 1 at
        # lane >= tile) and carry no factor content — factor the
        # tile-square part and re-append zero rows so the stash write
        # lands on well-defined slots. Found by the round-4 scaling
        # sweep: the n=300 on-chip stash gate missed the boundary and
        # n=256 crashed at trace time (s22 row mismatch).
        extra = ns - tile
        ld, qyy, qoy, qoo, mfin, wy, wo = _chol_quad_core_multitile(
            m[:, :tile, :], ry, ro, n, kk, dtype)
        mfin = jnp.concatenate(
            [mfin, jnp.zeros((kk, extra, tile), dtype)], axis=1)
        return ld, qyy, qoy, qoo, mfin, wy, wo
    t1 = TILE
    m1 = m[:, :t1, :]                                   # (K, 128, tile)
    iirow1 = jax.lax.broadcasted_iota(jnp.int32, (kk, t1, 1), 1)
    iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)

    ld = jnp.zeros((kk, 1, 1), dtype)
    wy = jnp.zeros((kk, 1, tile), dtype)
    wo = jnp.zeros((kk, 1, tile), dtype)
    dinvcol = jnp.zeros((kk, t1, 1), dtype)
    i8 = jax.lax.broadcasted_iota(jnp.int32, (kk, 8, 1), 1)
    for j in range(t1):
        # pivot-row read from the tile-aligned 8-row slab holding row j
        # (NOT the full panel) — identical single-nonzero masked sum, so
        # bit-identical to the full-panel reduce; see
        # `_chol_quad_core_rowslab` for the formulation notes
        s0 = 8 * (j // 8)
        clane = jnp.sum(jnp.where(i8 == (j - s0), m1[:, s0:s0 + 8, :], 0.0),
                        axis=1, keepdims=True)          # (K, 1, tile)
        crow = jnp.sum(jnp.where(iilane == j, m1, 0.0), axis=2,
                       keepdims=True)                   # (K, 128, 1)
        d2 = jnp.sum(jnp.where(iilane == j, clane, 0.0), axis=2,
                     keepdims=True)
        dinv = jax.lax.rsqrt(d2)
        ld = ld + jnp.log(d2)
        dinvcol = jnp.where(iirow1 == j, dinv, dinvcol)
        lrow = jnp.where(iirow1 > j, crow, 0.0) * dinv
        llane = jnp.where(iilane > j, clane, 0.0) * dinv
        m1 = m1 - lrow * llane
        rjy = jnp.sum(jnp.where(iilane == j, ry, 0.0), axis=2,
                      keepdims=True) * dinv
        rjo = jnp.sum(jnp.where(iilane == j, ro, 0.0), axis=2,
                      keepdims=True) * dinv
        wy = jnp.where(iilane == j, rjy, wy)
        wo = jnp.where(iilane == j, rjo, wo)
        ry = ry - llane * rjy
        ro = ro - llane * rjo
    qyy = jnp.sum(wy * wy, axis=2, keepdims=True)
    qoy = jnp.sum(wy * wo, axis=2, keepdims=True)
    qoo = jnp.sum(wo * wo, axis=2, keepdims=True)

    us = m1[:, :, t1:] * dinvcol                        # (K, 128, tile-128)
    schur = jax.lax.dot_general(
        us, us, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype)                   # (K, t2, t2)
    s22 = m[:, t1:, t1:] - schur[:, :ns - t1, :]
    ld2, qyy2, qoy2, qoo2, mfin2, wy2, wo2 = _core_for(tile - t1)(
        s22, ry[:, :, t1:], ro[:, :, t1:], n - t1, kk, dtype)
    # assemble the stashable factor matrix: upper triangle complete at
    # every level (lower-left block stays zero — see docstring)
    mlow = jnp.concatenate(
        [jnp.zeros((kk, ns - t1, t1), dtype), mfin2], axis=2)
    mfin = jnp.concatenate([m1, mlow], axis=1)
    # levels write disjoint lanes of wy/wo (this level: lanes < t1 via
    # iilane == j masks with j < t1; recursion: lanes >= t1), so the
    # assembled vectors are exact disjoint-lane sums
    wy = wy + jnp.concatenate([jnp.zeros((kk, 1, t1), dtype), wy2], axis=2)
    wo = wo + jnp.concatenate([jnp.zeros((kk, 1, t1), dtype), wo2], axis=2)
    return (ld + ld2, qyy + qyy2, qoy + qoy2, qoo + qoo2, mfin, wy, wo)


# active single-tile core, used by every kernel directly and as the
# multitile recursion's base case (see the cores' docstrings for the
# measured formulation notes; the list-of-slabs core stays OFF — despite
# CPU-interpret bit-identity it MISCOMPILES on v5e Mosaic, silently NaNing
# every candidate log-posterior, and drives remote compiles >20 min even
# at n=32). Module-level so the on-chip gate script can A/B formulations;
# flipping it between traces of the SAME jitted callable is unsupported
# (the jit cache keys on neither). Default: the SHRINK core — on-chip
# BIT-identical to the rank-1 core at n=7/100/200 and fastest in both
# round-4 MH-round A/Bs (14.67 / 15.22 us/round vs rowslab 16.11 / 15.54,
# fused 15.50 / 16.19, pipe 18.38; scripts/ab_mhrounds_core.py +
# scripts/verify_rowslab_tpu.py, v5e). The pipelined core stays off: the
# latency probe says the serial d2->rsqrt chain costs ~5 us/round, but
# carrying the corrected pivot row re-lengthens the chain in practice.
_SINGLE_CORE = _chol_quad_core_shrink


def _core_for(tile: int):
    """Select the factorization core by static working-set width."""
    return _SINGLE_CORE if tile <= TILE else _chol_quad_core_multitile


def chol_quadratics_smallk(grams: jnp.ndarray, y: jnp.ndarray,
                           jitter: float = 0.0,
                           interpret: bool = False) -> dict:
    """Batched {logdet, qyy, qoy, qoo}; grams (K, n, n), n <= MAX_N, K small.

    One kernel invocation factorizes all K matrices simultaneously; use
    for latency-critical small batches — the `chol_quadratics` dispatcher
    routes K <= 16 here on TPU (VMEM holds (K, 128, 128) f32 = 64 KiB per
    matrix; by K ~ 32 XLA's throughput catches up and wide batches belong
    to the lanes kernel). The factorization loop is FULLY unrolled in the
    kernel (Mosaic supports only unroll=1 or full): ~1.4x faster than the
    rolled loop (bench.py full-Bayes 129 -> 90 ms) at the cost of
    per-(n, K)-shape compile time, amortized by the persistent cache.

    n in (128, MAX_N] routes through the multi-tile BLOCKED-SCHUR core
    (`_chol_quad_core_multitile`: 128 unrolled panel steps + one MXU
    Schur downdate per 128-block, recursing on the Schur complement;
    the fit-path dispatch stops at 512 — the hardware-validated
    regime — while the kernel itself accepts up to MAX_N). The
    earlier ROLLED two-tile loop measured ~6% SLOWER than the XLA
    bordered fallback (1979 vs 1857 ms on an identical 1340-draw chain);
    the blocked core replaced it in round 3 and cut the n=256
    full-Bayesian fit 1802.8 -> 341.0 ms on that same chain (RESULTS.md
    full-Bayesian scaling), with records bit-identical to the XLA
    fallback on-chip.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = grams.shape
    dtype = grams.dtype
    tile = -(-n // TILE) * TILE
    if tile > MAX_N:
        raise ValueError(f"n must be <= {MAX_N}")
    if jitter:
        grams = grams + jitter * jnp.eye(n, dtype=dtype)
    ns = -(-n // 8) * 8                  # sublanes: next multiple of 8
    pad = tile - n
    if pad:
        # lane pad to the 128 tile; SUBLANE pad only to ns (identity rows
        # so padded pivots stay 1; the loop never reaches them anyway)
        eye_pad = jnp.eye(tile, dtype=dtype)[n:ns]
        grams = jnp.concatenate([
            jnp.concatenate([grams, jnp.zeros((b, n, pad), dtype)], 2),
            jnp.broadcast_to(eye_pad, (b, ns - n, tile)),
        ], 1)
    ypad = jnp.concatenate([y.astype(dtype), jnp.zeros((pad,), dtype)])
    opad = jnp.concatenate([jnp.ones((n,), dtype), jnp.zeros((pad,), dtype)])
    ry = jnp.broadcast_to(ypad[None, None, :], (b, 1, tile))
    ro = jnp.broadcast_to(opad[None, None, :], (b, 1, tile))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_kernel(n),
        out_shape=jax.ShapeDtypeStruct((b, 1, tile), dtype),
        interpret=interpret,
        **kwargs,
    )(grams, ry, ro)
    flat = out[:, 0, :]                                        # (K, tile)
    return {"logdet": flat[:, 0], "qyy": flat[:, 1],
            "qoy": flat[:, 2], "qoo": flat[:, 3]}


def _make_fused_kernel(n: int, ndim: int, jitter: float):
    def _kernel(d2_ref, r1_ref, r2_ref, p_ref, ry_ref, ro_ref, out_ref):
        d2 = d2_ref[...]           # (ndim, N, N) shared sq-diff stack
        r1 = r1_ref[...]           # (K, 1, N): rates in the first ndim lanes
        r2 = r2_ref[...]
        pv = p_ref[...][:, :, 0:1]                              # (K, 1, 1)
        ry = ry_ref[...]
        ro = ro_ref[...]
        dtype = r1.dtype
        kk = r1.shape[0]
        ns, tile = d2.shape[1], d2.shape[-1]

        iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns, 1), 1)
        iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)

        # ---- SE mixture Gram in VMEM (d-axis contraction unrolled) -------
        dist1 = jnp.zeros((kk, ns, tile), dtype)
        dist2 = jnp.zeros((kk, ns, tile), dtype)
        for k in range(ndim):
            d2k = d2[k][None]                                   # (1, N, N)
            dist1 = dist1 + d2k * r1[:, :, k:k + 1]
            dist2 = dist2 + d2k * r2[:, :, k:k + 1]
        w1 = pv * pv
        w2 = (1.0 - pv) * (1.0 - pv)
        rmix = (w1 * jnp.exp(-dist1) + w2 * jnp.exp(-dist2)) / (w1 + w2)
        real = (iirow < n) & (iilane < n)
        eye = (iirow == iilane).astype(dtype)
        m = jnp.where(real, rmix, eye)
        if jitter:
            m = m + jnp.where(real & (iirow == iilane),
                              jnp.asarray(jitter, dtype), 0.0)

        # ---- shared factorization + substitution core --------------------
        ld, qyy, qoy, qoo, _, _, _ = _core_for(m.shape[-1])(
            m, ry, ro, n, kk, dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, m.shape[-1]), 2)
        out_ref[...] = jnp.where(
            lane == 0, ld, jnp.where(
                lane == 1, qyy, jnp.where(
                    lane == 2, qoy, jnp.where(lane == 3, qoo, 0.0))))

    return _kernel


def fused_mix_quadratics_smallk(
    x: jnp.ndarray,            # (n, d) training inputs
    y: jnp.ndarray,            # (n,)
    r1: jnp.ndarray,           # (K, d) smooth SE rates
    r2: jnp.ndarray,           # (K, d) rough SE rates
    p: jnp.ndarray,            # (K,) mixing weights
    jitter: float = 0.0,
    interpret: bool = False,
) -> dict:
    """{logdet, qyy, qoy, qoo} for the SE convex-combination correlation
    R_b = (p_b^2 e^{-D1_b} + (1-p_b)^2 e^{-D2_b}) / (p_b^2 + (1-p_b)^2),
    D_i = sum_k r_i[k] (x_k - x_k')^2, built ENTIRELY in VMEM.

    Latency sibling of `pallas_gram_chol.fused_mix_quadratics`: in the
    speculative-Metropolis round the Gram construction is a separate XLA
    kernel chain whose launch latency rivals the factorization; fusing it
    removes that stage and the (K, n, n) HBM round-trip. The per-axis
    squared-difference stack d2 is a loop invariant XLA hoists out of the
    sampling while-loop, so each round ships only (K, d) rate rows.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    kk = r1.shape[0]
    dtype = x.dtype
    tile = -(-n // TILE) * TILE
    if tile > MAX_N:
        raise ValueError(f"n must be <= {MAX_N}")
    if d > TILE:
        raise ValueError(f"d must be <= {TILE}")
    ns = -(-n // 8) * 8
    diffs = x[:, None, :] - x[None, :, :]                  # (n, n, d)
    d2 = jnp.transpose(diffs * diffs, (2, 0, 1))           # (d, n, n)
    d2 = jnp.pad(d2, ((0, 0), (0, ns - n), (0, tile - n)))

    def lanes_rates(r):
        r = jnp.broadcast_to(jnp.asarray(r, dtype), (kk, d))
        return jnp.pad(r, ((0, 0), (0, tile - d)))[:, None, :]

    pv = jnp.broadcast_to(jnp.asarray(p, dtype)[:, None, None],
                          (kk, 1, tile))
    ypad = jnp.concatenate([y.astype(dtype), jnp.zeros((tile - n,), dtype)])
    opad = jnp.concatenate([jnp.ones((n,), dtype),
                            jnp.zeros((tile - n,), dtype)])
    ry = jnp.broadcast_to(ypad[None, None, :], (kk, 1, tile))
    ro = jnp.broadcast_to(opad[None, None, :], (kk, 1, tile))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_fused_kernel(n, d, float(jitter)),
        out_shape=jax.ShapeDtypeStruct((kk, 1, tile), dtype),
        interpret=interpret,
        **kwargs,
    )(d2, lanes_rates(r1), lanes_rates(r2), pv, ry, ro)
    flat = out[:, 0, :]
    return {"logdet": flat[:, 0], "qyy": flat[:, 1],
            "qoy": flat[:, 2], "qoo": flat[:, 3]}


def _make_mh_kernel(n: int, ndim: int, jitter: float, log2pi: float):
    def _kernel(d2_ref, r1_ref, r2_ref, p_ref, ry_ref, ro_ref, sc_ref,
                st_ref, cands_ref, out_ref):
        d2 = d2_ref[...]
        r1 = r1_ref[...]
        r2 = r2_ref[...]
        pv = p_ref[...][:, :, 0:1]
        ry = ry_ref[...]
        ro = ro_ref[...]
        sc = sc_ref[...]            # (K, 1, N): lane0 extra, lane1 log-scale,
                                    # lane2 log_u
        st = st_ref[...]            # (1, 1, N): lane0 lp_val, lane1 lp_beta
        cands = cands_ref[...]      # (K, 1, N): candidate z in lanes < dim
        dtype = r1.dtype
        kk = r1.shape[0]
        ns, tile = d2.shape[1], d2.shape[-1]

        iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns, 1), 1)
        iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
        dist1 = jnp.zeros((kk, ns, tile), dtype)
        dist2 = jnp.zeros((kk, ns, tile), dtype)
        for k in range(ndim):
            d2k = d2[k][None]
            dist1 = dist1 + d2k * r1[:, :, k:k + 1]
            dist2 = dist2 + d2k * r2[:, :, k:k + 1]
        w1 = pv * pv
        w2 = (1.0 - pv) * (1.0 - pv)
        rmix = (w1 * jnp.exp(-dist1) + w2 * jnp.exp(-dist2)) / (w1 + w2)
        real = (iirow < n) & (iilane < n)
        eye = (iirow == iilane).astype(dtype)
        m = jnp.where(real, rmix, eye)
        if jitter:
            m = m + jnp.where(real & (iirow == iilane),
                              jnp.asarray(jitter, dtype), 0.0)

        ld, qyy, qoy, qoo, _, _, _ = _core_for(m.shape[-1])(
            m, ry, ro, n, kk, dtype)

        # ---- per-candidate log-posterior and MH first-acceptance ---------
        beta = qoy / qoo                                       # (K, 1, 1)
        quad = qyy - qoy * qoy / qoo
        extra = sc[:, :, 0:1]
        ls = sc[:, :, 1:2]
        logu = sc[:, :, 2:3]
        val = (-0.5 * (n * log2pi + ld + n * ls + quad * jnp.exp(-ls))
               + extra)                                        # (K, 1, 1)
        lp = st[:, :, 0:1]                                     # (1, 1, 1)
        # NaN vals (singular Gram) compare False => auto-rejected
        acc = (val - lp) > logu                                # (K, 1, 1)

        # first acceptance, unrolled over the static K (leading-axis
        # slices are untiled and free). No-acceptance defaults: the body
        # gates every state update on any_acc, so out_z may stay zero.
        val_new = lp
        beta_new = st[:, :, 1:2]
        out_z = jnp.zeros((1, 1, tile), dtype)
        consumed = jnp.full((1, 1, 1), float(kk), dtype)
        taken = jnp.zeros((1, 1, 1), jnp.bool_)
        for k in range(kk):
            acck = acc[k:k + 1]
            take = acck & (~taken)
            out_z = jnp.where(take, cands[k:k + 1], out_z)
            val_new = jnp.where(take, val[k:k + 1], val_new)
            beta_new = jnp.where(take, beta[k:k + 1], beta_new)
            consumed = jnp.where(take, jnp.full((1, 1, 1), float(k + 1),
                                                dtype), consumed)
            taken = taken | acck
        anyf = taken.astype(dtype)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)
        row0 = jnp.where(
            lane1 == 0, val_new, jnp.where(
                lane1 == 1, beta_new, jnp.where(
                    lane1 == 2, anyf, jnp.where(
                        lane1 == 3, consumed, 0.0))))
        out_ref[0:1] = row0
        out_ref[1:2] = out_z

    return _kernel


def fused_mix_mh_round(
    x: jnp.ndarray,            # (n, d) training inputs
    y: jnp.ndarray,            # (n,)
    r1: jnp.ndarray,           # (K, d) smooth SE rates per candidate
    r2: jnp.ndarray,           # (K, d) rough SE rates
    p: jnp.ndarray,            # (K,) mixing weights
    extra: jnp.ndarray,        # (K,) log-jacobian + log-prior terms
    log_scale: jnp.ndarray,    # (K,) log((p^2+(1-p)^2) sigma2)
    cands: jnp.ndarray,        # (K, dim) candidate z vectors (pass-through)
    lp_val, lp_beta,           # scalars: current state's value/intercept
    log_u: jnp.ndarray,        # (K,) log accept thresholds
    jitter: float = 0.0,
    interpret: bool = False,
):
    """ONE kernel = a whole speculative Metropolis round: K Gram builds +
    factorizations + quadratics + log-posteriors + the first-acceptance
    scan. Returns (z_new (dim,), val_new, beta_new, any_acc, consumed).

    Motivation (profiler trace, results/profile): the round was 15.4 us of
    Pallas kernel plus ~12 us spread over ~30 tiny XLA ops — selection,
    comparisons, slices — whose launch latency rivals their work. Fusing
    the MH decision into the kernel removes most of them; the evaluation
    order and random stream are IDENTICAL to the unfused speculative body.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    kk, dim = cands.shape
    dtype = x.dtype
    tile = -(-n // TILE) * TILE
    if tile > MAX_N:
        raise ValueError(f"n must be <= {MAX_N}")
    if d > TILE:
        raise ValueError(f"d must be <= {TILE}")
    ns = -(-n // 8) * 8
    diffs = x[:, None, :] - x[None, :, :]
    d2 = jnp.transpose(diffs * diffs, (2, 0, 1))
    d2 = jnp.pad(d2, ((0, 0), (0, ns - n), (0, tile - n)))

    def lanes_rates(r):
        r = jnp.broadcast_to(jnp.asarray(r, dtype), (kk, d))
        return jnp.pad(r, ((0, 0), (0, tile - d)))[:, None, :]

    pv = jnp.broadcast_to(jnp.asarray(p, dtype)[:, None, None],
                          (kk, 1, tile))
    ypad = jnp.concatenate([y.astype(dtype), jnp.zeros((tile - n,), dtype)])
    opad = jnp.concatenate([jnp.ones((n,), dtype),
                            jnp.zeros((tile - n,), dtype)])
    ry = jnp.broadcast_to(ypad[None, None, :], (kk, 1, tile))
    ro = jnp.broadcast_to(opad[None, None, :], (kk, 1, tile))
    sc = jnp.stack([jnp.asarray(extra, dtype), jnp.asarray(log_scale, dtype),
                    jnp.asarray(log_u, dtype)], axis=-1)       # (K, 3)
    sc = jnp.pad(sc, ((0, 0), (0, tile - 3)))[:, None, :]      # (K, 1, tile)
    st = jnp.stack([jnp.asarray(lp_val, dtype).reshape(()),
                    jnp.asarray(lp_beta, dtype).reshape(())])  # (2,)
    st = jnp.pad(st, (0, tile - 2))[None, None, :]             # (1, 1, tile)
    cz = jnp.pad(jnp.asarray(cands, dtype),
                 ((0, 0), (0, tile - dim)))[:, None, :]        # (K, 1, tile)

    import math as _math

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_mh_kernel(n, d, float(jitter), _math.log(2.0 * _math.pi)),
        out_shape=jax.ShapeDtypeStruct((2, 1, tile), dtype),
        interpret=interpret,
        **kwargs,
    )(d2, lanes_rates(r1), lanes_rates(r2), pv, ry, ro, sc, st, cz)
    row0 = out[0, 0]
    z_new = out[1, 0, :dim]
    any_acc = row0[2] > 0.5
    return (z_new, row0[0], row0[1], any_acc,
            row0[3].astype(jnp.int32))


# ---------------------------------------------------------------------------
# Multi-round fused Metropolis: R speculative rounds per kernel launch
# ---------------------------------------------------------------------------

def _make_mh_rounds_kernel(n: int, ndim: int, dim: int, kk: int,
                           ns2: int, jitter: float, log2pi: float,
                           cand_model, stash: bool, rps: int = 1):
    """One grid step = `rps` whole speculative rounds; grid=(R/rps,) runs
    them SEQUENTIALLY on the core with the chain state carried in a
    VMEM scratch row (the idiomatic Mosaic cross-step carry — a rolled
    in-kernel fori over rounds sent the Mosaic compiler into a
    pathological >20-minute path even at toy sizes; a STATICALLY
    UNROLLED handful of rounds per step compiles fine and is
    bit-identical, but measured a WASH at rps=2 and a regression at
    4/8 — the fixed grid-step cost the DESIGN.md §13 quadratic fit
    attributed turned out to already overlap with compute; see
    fused_mix_mh_rounds).

    Per round, IN-KERNEL: candidate formation (state + precomputed
    proposal deltas), the unconstrained->constrained transform +
    prior/Jacobian terms (`cand_model`, a closure of plain jnp ops —
    measured bit-exact between Mosaic and XLA lowering for
    exp/log/sigmoid/rsqrt on v5e), the SE-mixture Gram, the K-candidate
    factorization + quadratics (`_SINGLE_CORE`), log-posterior assembly, the MH
    first-acceptance scan, and the state update. Outputs are PER-ROUND
    post-state rows (so row R-1 is the carry-out state) plus acc/consumed
    flags; the caller scatters accepted rows into its record buffer.

    With stash=True each round also emits its accepted candidate's
    prediction factor [L | L^{-1}y at row n | L^{-1}1 at row n+1] — free
    byproducts of `_SINGLE_CORE` (the final downdated matrix's columns are
    d_j^{1/2} L[:, j]) — eliminating the posterior factor-cache rebuild
    (~10 ms / 1000 draws via the lanes kernel) from the predict stage.
    """
    from jax.experimental import pallas as pl

    def _kernel(d2_ref, ry_ref, ro_ref, delta_ref, logu_ref, z_ref,
                st_ref, rec_ref, info_ref, *rest):
        if stash:
            stash_ref, state_ref = rest
        else:
            (state_ref,) = rest
        r = pl.program_id(0)
        d2 = d2_ref[...]                       # (ndim, ns2, tile)
        dtype = d2.dtype
        tile = d2.shape[-1]

        iirow = jax.lax.broadcasted_iota(jnp.int32, (kk, ns2, 1), 1)
        iilane = jax.lax.broadcasted_iota(jnp.int32, (kk, 1, tile), 2)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)
        row1 = jax.lax.broadcasted_iota(jnp.int32, (1, ns2, 1), 1)

        def lane_scalar(v, i):
            return jnp.sum(jnp.where(lane1 == i, v, 0.0), axis=2,
                           keepdims=True)      # (1, 1, 1)

        @pl.when(r == 0)
        def _init():
            st = st_ref[...]                   # lane0 lp_val, lane1 lp_beta
            z0 = z_ref[...]                    # z in lanes < dim
            state_ref[...] = jnp.where(
                lane1 < dim, z0, jnp.where(
                    lane1 == dim, lane_scalar(st, 1), jnp.where(
                        lane1 == dim + 1, lane_scalar(st, 0), 0.0)))

        state = state_ref[...]
        s2sc = lane_scalar(st_ref[...], 2)

        def b_l(v):
            return jnp.broadcast_to(v, (kk, 1, tile))

        def lane_k(v, i):
            # extract lane i of a COMPUTED row via a masked reduce: lane
            # slices of computed (non-loaded) values acquire offset
            # layouts whose 2-D broadcast Mosaic rejects ("Broadcast in
            # both sublanes and lanes"); reduce-produced scalars lower
            # replicated and broadcast fine (measured)
            return jnp.sum(jnp.where(iilane == i, v, 0.0), axis=2,
                           keepdims=True)

        # statically unrolled sub-rounds: delta/logu/output blocks hold
        # rps rounds, the chain state threads through as a VALUE and only
        # touches the VMEM scratch once per grid step
        for j in range(rps):
            z = jnp.where(lane1 < dim, state, 0.0)
            lpb = lane_scalar(state, dim)
            lpv = lane_scalar(state, dim + 1)

            delta = delta_ref[j * kk:(j + 1) * kk]   # (kk, 1, tile)
            cz = z + delta
            r1, r2, pv, extra, log_scale = cand_model(cz, iilane, s2sc)

            dist1 = jnp.zeros((kk, ns2, tile), dtype)
            dist2 = jnp.zeros((kk, ns2, tile), dtype)
            for k in range(ndim):
                d2k = d2[k][None]
                dist1 = dist1 + d2k * b_l(lane_k(r1, k))
                dist2 = dist2 + d2k * b_l(lane_k(r2, k))
            pvr = b_l(pv)
            w1 = pvr * pvr
            w2 = (1.0 - pvr) * (1.0 - pvr)
            rmix = (w1 * jnp.exp(-dist1) + w2 * jnp.exp(-dist2)) / (w1 + w2)
            real = (iirow < n) & (iilane < n)
            eye = (iirow == iilane).astype(dtype)
            m0 = jnp.where(real, rmix, eye)
            if jitter:
                m0 = m0 + jnp.where(real & (iirow == iilane),
                                    jnp.asarray(jitter, dtype), 0.0)

            ryk = jnp.broadcast_to(ry_ref[...], (kk, 1, tile))
            rok = jnp.broadcast_to(ro_ref[...], (kk, 1, tile))
            ld, qyy, qoy, qoo, mfin, wy, wo = _core_for(m0.shape[-1])(
                m0, ryk, rok, n, kk, dtype)
            beta = qoy / qoo
            quad = qyy - qoy * qoy / qoo
            val = (-0.5 * (n * log2pi + ld + n * log_scale
                           + quad * jnp.exp(-log_scale)) + extra)

            logu_r = logu_ref[j:j + 1]         # (1, 1, tile), lanes < kk

            out_z, val_n, beta_n = z, lpv, lpb
            consumed = jnp.full((1, 1, 1), float(kk), dtype)
            taken = jnp.zeros((1, 1, 1), jnp.bool_)
            if stash:
                msel = jnp.zeros((1, ns2, tile), dtype)
                wysel = jnp.zeros((1, 1, tile), dtype)
                wosel = jnp.zeros((1, 1, tile), dtype)
            for k in range(kk):
                logu_k = lane_scalar(logu_r, k)
                acck = (val[k:k + 1] - lpv) > logu_k
                take = acck & (~taken)
                out_z = jnp.where(take, cz[k:k + 1], out_z)
                val_n = jnp.where(take, val[k:k + 1], val_n)
                beta_n = jnp.where(take, beta[k:k + 1], beta_n)
                consumed = jnp.where(take, jnp.full((1, 1, 1), float(k + 1),
                                                    dtype), consumed)
                if stash:
                    msel = jnp.where(take, mfin[k:k + 1], msel)
                    wysel = jnp.where(take, wy[k:k + 1], wysel)
                    wosel = jnp.where(take, wo[k:k + 1], wosel)
                taken = taken | acck
            anyf = taken.astype(dtype)

            new_state = jnp.where(
                lane1 < dim, out_z, jnp.where(
                    lane1 == dim, beta_n, jnp.where(
                        lane1 == dim + 1, val_n, 0.0)))
            state = new_state
            rec_ref[j:j + 1] = new_state
            info_ref[j:j + 1] = jnp.where(
                lane1 == 0, anyf,
                jnp.where(lane1 == 1, consumed, 0.0))

            if stash:
                # ROW scaling by the pivot scale: stash[j, i] = S[j, i] *
                # d_j^{-1/2} = L[i, j] for i >= j, so the decode is
                # tril(transpose(stash)) — the one convention that works
                # for BOTH the single-tile cores (S bit-symmetric) and
                # the multi-tile assembled matrix (upper triangle
                # complete, lower-left off-diagonal blocks zero); see
                # predict.factors.decode_stash
                diagc = jnp.sum(jnp.where(row1 == lane1, msel, 0.0),
                                axis=2, keepdims=True)      # (1, ns2, 1)
                dinvc = jax.lax.rsqrt(diagc)
                lsel = msel * dinvc
                stash_ref[j:j + 1] = jnp.where(
                    row1 == n, wysel,
                    jnp.where(row1 == n + 1, wosel, lsel))

        state_ref[...] = state

    return _kernel


def fused_mix_mh_rounds(
    x: jnp.ndarray,            # (n, d) training inputs
    y: jnp.ndarray,            # (n,)
    z: jnp.ndarray,            # (dim,) current unconstrained state
    lp_val, lp_beta,           # scalars
    sigma2,                    # scalar (plug-in variance)
    deltas: jnp.ndarray,       # (R*K, dim) proposal offsets eps @ chol^T
    log_u: jnp.ndarray,        # (R, K) log accept thresholds
    cand_model,                # lane-space candidate model (likelihood.py)
    jitter: float = 0.0,
    stash: bool = False,
    interpret: bool = False,
    rounds_per_step: int | None = None,
) -> dict:
    """R speculative Metropolis rounds as ONE kernel launch over a
    sequential grid=(R/rps,) with `rounds_per_step` (rps) rounds
    statically unrolled per grid step (see `_make_mh_rounds_kernel`;
    identical math, stream, and records at every rps — bit-identity
    verified on-chip for rps in {2,4,8}; measured a WASH at rps=2 and a
    regression beyond, so the default stays 1). Returns a dict:

      rec       (R, dim+2) PER-ROUND post-state rows [z | beta | logpost]
                (row r repeats the previous state when round r rejected;
                row R-1 is the carry-out state)
      acc       (R,) bool    per-round acceptance flags
      consumed  (R,) int32   proposals consumed per round
      z_fin (dim,), val_fin, beta_fin: state after all R rounds
      stash     (R, ns2, tile) row-scaled factor rows: stash[j, i] =
                L[i, j] for i >= j (decode: tril of the transpose, see
                `predict.factors.decode_stash`), L^{-1}y at row n,
                L^{-1}1 at row n+1, of each round's accepted candidate
                (NaN/garbage when rejected — never selected), when
                stash=True; works at every kernel size incl. the
                multi-tile blocked-Schur core (assembled factors)

    The caller (infer/metropolis.py body_chunk) scatters accepted rows
    into its record buffer and applies caps / Geweke stopping / truncation
    OUTSIDE, exactly reproducing one-round-at-a-time semantics (valid
    rounds always form a prefix).
    """
    import math as _math

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    rk, dim = deltas.shape
    rr, kk = log_u.shape
    assert rk == rr * kk
    # default 1: the rps sweep on v5e measured med us/round 15.85 (rps=1)
    # / 16.08 (2) / 16.55 (4) / 18.41 (8) at the bench shape — the
    # hypothesized ~1.6 us fixed grid-step saving does not materialize
    # (Mosaic already overlaps block copies with compute; bigger blocks
    # only degrade the pipelining), so more rounds per step is a wash at
    # 2 and a regression beyond. Kept selectable for future re-measure.
    if rounds_per_step is None:
        rounds_per_step = 1
    rps = rounds_per_step
    if rr % rps:
        raise ValueError(f"rounds_per_step={rps} must divide R={rr}")
    dtype = x.dtype
    tile = -(-n // TILE) * TILE
    if tile > MAX_N:
        raise ValueError(
            f"n must be <= {MAX_N} for the multi-round kernel")
    if d > TILE:
        raise ValueError(f"d must be <= {TILE}")
    ns2 = -(-(n + 2) // 8) * 8 if stash else -(-n // 8) * 8

    diffs = x[:, None, :] - x[None, :, :]
    d2 = jnp.transpose(diffs * diffs, (2, 0, 1))
    d2 = jnp.pad(d2, ((0, 0), (0, ns2 - n), (0, tile - n)))

    ypad = jnp.concatenate([y.astype(dtype), jnp.zeros((tile - n,), dtype)])
    opad = jnp.concatenate([jnp.ones((n,), dtype),
                            jnp.zeros((tile - n,), dtype)])
    ry = ypad[None, None, :]
    ro = opad[None, None, :]
    drow = jnp.pad(jnp.asarray(deltas, dtype),
                   ((0, 0), (0, tile - dim)))[:, None, :]   # (R*K, 1, tile)
    lurow = jnp.pad(jnp.asarray(log_u, dtype),
                    ((0, 0), (0, tile - kk)))[:, None, :]   # (R, 1, tile)
    zrow = jnp.pad(jnp.asarray(z, dtype), (0, tile - dim))[None, None, :]
    strow = jnp.stack([jnp.asarray(lp_val, dtype).reshape(()),
                       jnp.asarray(lp_beta, dtype).reshape(()),
                       jnp.asarray(sigma2, dtype).reshape(())])
    strow = jnp.pad(strow, (0, tile - 3))[None, None, :]

    const = lambda *_: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((d, ns2, tile), const),
        pl.BlockSpec((1, 1, tile), const),
        pl.BlockSpec((1, 1, tile), const),
        pl.BlockSpec((rps * kk, 1, tile), lambda r: (r, 0, 0)),
        pl.BlockSpec((rps, 1, tile), lambda r: (r, 0, 0)),
        pl.BlockSpec((1, 1, tile), const),
        pl.BlockSpec((1, 1, tile), const),
    ]
    out_shapes = [jax.ShapeDtypeStruct((rr, 1, tile), dtype),
                  jax.ShapeDtypeStruct((rr, 1, tile), dtype)]
    out_specs = [pl.BlockSpec((rps, 1, tile), lambda r: (r, 0, 0)),
                 pl.BlockSpec((rps, 1, tile), lambda r: (r, 0, 0))]
    if stash:
        out_shapes.append(jax.ShapeDtypeStruct((rr, ns2, tile), dtype))
        out_specs.append(
            pl.BlockSpec((rps, ns2, tile), lambda r: (r, 0, 0)))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_mh_rounds_kernel(n, d, dim, kk, ns2, float(jitter),
                               _math.log(2.0 * _math.pi), cand_model,
                               stash, rps),
        grid=(rr // rps,),
        in_specs=in_specs,
        out_shape=tuple(out_shapes),
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((1, 1, tile), dtype)],
        interpret=interpret,
        **kwargs,
    )(d2, ry, ro, drow, lurow, zrow, strow)
    rec, info = out[0], out[1]
    res = {
        "rec": rec[:, 0, :dim + 2],
        "acc": info[:, 0, 0] > 0.5,
        "consumed": info[:, 0, 1].astype(jnp.int32),
        "z_fin": rec[rr - 1, 0, :dim],
        "beta_fin": rec[rr - 1, 0, dim],
        "val_fin": rec[rr - 1, 0, dim + 1],
    }
    if stash:
        res["stash"] = out[2]
        res["stash_rows"] = ns2
    return res
