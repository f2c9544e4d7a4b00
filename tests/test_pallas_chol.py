"""Pallas fused Cholesky/NLL kernel vs the XLA reference path (interpret
mode on CPU; the real-TPU path is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccgp_tpu.ops import kernels, linalg
from ccgp_tpu.ops.gp import profile_nll
from ccgp_tpu.ops.pallas_chol import (
    chol_quadratics, profile_nll_from_quadratics, mvn_nll_from_quadratics,
)


def _batch(rng, b=3, n=20):
    x = rng.uniform(size=(n, 2))
    thetas = np.linspace(1.0, 12.0, b)
    grams = jnp.stack([kernels.sqexp_gram(jnp.asarray(x), t) for t in thetas])
    y = jnp.asarray(rng.normal(size=n))
    return grams, y


def test_quadratics_xla_path_matches_dense(rng):
    grams, y = _batch(rng)
    q = chol_quadratics(grams, y, jitter=1e-10, use_pallas=False)
    for i in range(grams.shape[0]):
        r = np.asarray(grams[i]) + 1e-10 * np.eye(grams.shape[-1])
        rinv = np.linalg.inv(r)
        ones = np.ones_like(np.asarray(y))
        assert np.isclose(float(q["logdet"][i]), np.linalg.slogdet(r)[1],
                          rtol=1e-9)
        assert np.isclose(float(q["qyy"][i]), np.asarray(y) @ rinv @ np.asarray(y), rtol=1e-8)
        assert np.isclose(float(q["qoy"][i]), ones @ rinv @ np.asarray(y), rtol=1e-8)
        assert np.isclose(float(q["qoo"][i]), ones @ rinv @ ones, rtol=1e-8)


def test_pallas_interpret_matches_xla(rng):
    grams, y = _batch(rng, b=4, n=33)
    qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    qp = chol_quadratics(grams, y, jitter=1e-8, use_pallas=True,
                         interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qp[k]),
                           rtol=2e-5), k


def test_profile_nll_from_quadratics_matches_reference(rng):
    grams, y = _batch(rng)
    n = y.shape[0]
    q = chol_quadratics(grams, y, use_pallas=False)
    got = profile_nll_from_quadratics(q, n)
    for i in range(grams.shape[0]):
        ch = linalg.jitter_cholesky(grams[i])
        want = float(profile_nll(ch, y))
        assert np.isclose(float(got[i]), want, rtol=1e-9)


def test_mvn_nll_from_quadratics(rng):
    grams, y = _batch(rng, b=2)
    n = y.shape[0]
    q = chol_quadratics(grams, y, use_pallas=False)
    ls = 0.7
    got = mvn_nll_from_quadratics(q, n, ls)
    import scipy.stats
    for i in range(2):
        r = np.asarray(grams[i])
        rinv = np.linalg.inv(r)
        ones = np.ones(n)
        beta = ones @ rinv @ np.asarray(y) / (ones @ rinv @ ones)
        # -2 loglike - n log 2pi = logdet + n ls + quad
        ll = scipy.stats.multivariate_normal(
            mean=beta * ones, cov=np.exp(ls) * r).logpdf(np.asarray(y))
        want = -2.0 * ll - n * np.log(2 * np.pi)
        assert np.isclose(float(got[i]), want, rtol=1e-8)


def test_full_128_no_padding(rng):
    x = rng.uniform(size=(128, 2))
    grams = kernels.sqexp_gram(jnp.asarray(x), 8.0)[None]
    y = jnp.asarray(rng.normal(size=128))
    qx = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    qp = chol_quadratics(grams, y, jitter=1e-6, use_pallas=True,
                         interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qp[k]), rtol=2e-5), k


def test_lanes_kernel_interpret_matches_xla(rng):
    from ccgp_tpu.ops.pallas_chol_lanes import chol_quadratics_lanes

    grams, y = _batch(rng, b=5, n=33)  # odd batch -> exercises B padding
    qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    ql = chol_quadratics_lanes(grams, y, jitter=1e-8, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(ql[k]),
                           rtol=2e-5), k


def test_lanes_kernel_full_128(rng):
    from ccgp_tpu.ops.pallas_chol_lanes import chol_quadratics_lanes

    x = rng.uniform(size=(128, 2))
    grams = kernels.sqexp_gram(jnp.asarray(x), 8.0)[None]
    y = jnp.asarray(rng.normal(size=128))
    qx = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    ql = chol_quadratics_lanes(grams, y, jitter=1e-6, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(ql[k]), rtol=2e-5), k


def test_fused_gram_chol_interpret_matches_xla(rng):
    from ccgp_tpu.ops.pallas_gram_chol import fused_mix_quadratics

    n, d, b = 26, 3, 5
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    ps = jnp.asarray(rng.uniform(0.3, 0.8, b))
    r1 = jnp.asarray(rng.uniform(0.5, 2.0, (b, d)))
    r2 = jnp.asarray(rng.uniform(4.0, 12.0, (b, d)))
    scale = jnp.asarray(rng.uniform(0.5, 2.0, b))
    shift = jnp.asarray(rng.uniform(0.0, 3.0, b))

    def gram_one(p_i, r1_i, r2_i):
        w1, w2 = p_i**2, (1 - p_i) ** 2
        return (w1 * kernels.sqexp_gram(x, r1_i)
                + w2 * kernels.sqexp_gram(x, r2_i)) / (w1 + w2)

    import jax
    covs = (scale[:, None, None] * jax.vmap(gram_one)(ps, r1, r2)
            + shift[:, None, None])
    qx = chol_quadratics(covs, y, jitter=1e-8, use_pallas=False)
    qf = fused_mix_quadratics(x, y, r1, r2, ps, scale=scale, shift=shift,
                              jitter=1e-8, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qf[k]),
                           rtol=2e-5), k


def test_tpu_dispatch_guard_large_n(rng, monkeypatch):
    """TPU auto-dispatch must NOT route n > 128 to the lanes kernel (its
    tile limit, ops/pallas_chol_lanes.py) — it falls back to XLA instead of
    raising. Regression for the (n=256, B=128) crash."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    n, b = 256, 128
    x = jnp.asarray(rng.uniform(size=(n, 2)))
    thetas = np.linspace(1.0, 4.0, b)
    grams = jax.vmap(lambda t: kernels.sqexp_gram(x, t))(jnp.asarray(thetas))
    y = jnp.asarray(rng.normal(size=n))
    q = chol_quadratics(grams, y, jitter=1e-6, use_pallas=None)
    assert np.all(np.isfinite(np.asarray(q["logdet"])))
    want = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    for k in q:
        assert np.allclose(np.asarray(q[k]), np.asarray(want[k])), k


def test_smallk_interpret_matches_xla(rng):
    """Latency kernel (pallas_chol_smallk) parity on the Metropolis
    hot-loop shape: K=4 speculative candidates, padded n."""
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    grams, y = _batch(rng, b=4, n=33)
    qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    qs = chol_quadratics_smallk(grams, y, jitter=1e-8, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qs[k]),
                           rtol=2e-6), k


def test_smallk_singular_nan(rng):
    """Singular Gram -> NaN quadratics (rejection dataflow), not garbage."""
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    grams = jnp.broadcast_to(jnp.ones((6, 6)), (2, 6, 6))
    y = jnp.asarray(rng.normal(size=6))
    q = chol_quadratics_smallk(grams, y, interpret=True)
    assert not np.any(np.isfinite(np.asarray(q["qyy"])))


def test_smallk_dispatch_boundaries(rng, monkeypatch):
    """TPU auto-dispatch routing: B <= 16 -> small-K latency kernel,
    B >= 64 -> lanes kernel, in between -> XLA; n > 128 never reaches a
    Pallas kernel."""
    import ccgp_tpu.ops.pallas_chol_lanes as lanes_mod
    import ccgp_tpu.ops.pallas_chol_smallk as smallk_mod
    from ccgp_tpu.ops import pallas_chol as pc

    calls = []
    real_smallk = smallk_mod.chol_quadratics_smallk
    real_lanes = lanes_mod.chol_quadratics_lanes

    def spy_smallk(grams, y, jitter=0.0, interpret=False):
        calls.append(("smallk", grams.shape[0]))
        return real_smallk(grams, y, jitter=jitter, interpret=True)

    def spy_lanes(grams, y, jitter=0.0, interpret=False):
        calls.append(("lanes", grams.shape[0]))
        return real_lanes(grams, y, jitter=jitter, interpret=True)

    monkeypatch.setattr(smallk_mod, "chol_quadratics_smallk", spy_smallk)
    monkeypatch.setattr(lanes_mod, "chol_quadratics_lanes", spy_lanes)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    grams, y = _batch(rng, b=4, n=20)
    q4 = chol_quadratics(grams, y, jitter=1e-8)
    grams32 = jnp.concatenate([grams] * 8)
    q32 = chol_quadratics(grams32, y, jitter=1e-8)
    want = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    assert calls == [("smallk", 4)]            # 32 went to XLA, 4 to smallk
    for k in want:
        assert np.allclose(np.asarray(q4[k]), np.asarray(want[k]),
                           rtol=2e-6), k


def test_logpost_batch_matches_vmapped_logpost(rng):
    """make_logpost_batch == vmap(make_logpost) on the XLA path (the
    speculative Metropolis body consumes the batched form)."""
    from ccgp_tpu.models import MixtureSpec, InverseGamma
    from ccgp_tpu.models.likelihood import make_logpost, make_logpost_batch

    x = jnp.asarray(rng.uniform(size=(15, 2)))
    y = jnp.sin(4 * x[:, 0]) + x[:, 1]
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(), dim=2)
    kw = dict(theta1_prior=InverseGamma(3, 2),
              theta2_prior=InverseGamma(5, 16), jitter=1e-8)
    lp = make_logpost(spec, x, y, 1.3, **kw)
    lpb = make_logpost_batch(spec, x, y, 1.3, **kw)
    zs = jnp.asarray(rng.normal(size=(5, 3)))
    import jax as _jax
    want = _jax.vmap(lambda z: (lambda o: (o.val, o.beta))(lp(z)))(zs)
    got = lpb(zs)
    assert np.allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-9)
    assert np.allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=1e-9)


def test_fused_smallk_matches_mixed_gram(rng):
    """Gram-fused latency kernel == mixed_gram + XLA quadratics, for both
    the isotropic and the anisotropic tied-lambda SE mixtures."""
    from ccgp_tpu.models import MixtureSpec
    from ccgp_tpu.models.combination import (
        _effective_rates, mixed_gram, unpack)
    from ccgp_tpu.ops.pallas_chol_smallk import fused_mix_quadratics_smallk
    import jax as _jax

    x = jnp.asarray(rng.uniform(size=(23, 2)))
    y = jnp.asarray(np.sin(5 * np.asarray(x[:, 0])))
    for spec, dimz in [
        (MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                     dim=2), 3),
        (MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                     dim=2, rough="tied", anisotropic=True), 4),
    ]:
        zs = jnp.asarray(rng.normal(size=(4, dimz)))
        params, _ = _jax.vmap(lambda z: unpack(spec, z))(zs)
        th1, th2 = _effective_rates(spec, params, predict=False)
        r1 = jnp.broadcast_to(jnp.reshape(th1, (4, -1)), (4, 2))
        r2 = jnp.broadcast_to(jnp.reshape(th2, (4, -1)), (4, 2))
        qf = fused_mix_quadratics_smallk(x, y, r1, r2, params.p,
                                         jitter=1e-8, interpret=True)
        grams = _jax.vmap(lambda p: mixed_gram(spec, x, p))(params)
        qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
        for k in qx:
            assert np.allclose(np.asarray(qf[k]), np.asarray(qx[k]),
                               rtol=1e-6), (spec.rough, k)


def test_factors_lanes_interpret_matches_dense(rng):
    """chol_factors_lanes emits the exact lower factor and whitened
    right-hand sides (the build_factors cache contract)."""
    from ccgp_tpu.ops.pallas_chol_lanes import chol_factors_lanes

    grams, y = _batch(rng, b=5, n=33)
    f = chol_factors_lanes(grams, y, jitter=1e-8, interpret=True)
    yn = np.asarray(y)
    for i in range(5):
        r = np.asarray(grams[i]) + 1e-8 * np.eye(33)
        want_l = np.linalg.cholesky(r)
        assert np.allclose(np.asarray(f["chol"][i]), want_l, atol=1e-9)
        assert np.allclose(np.asarray(f["wy"][i]),
                           np.linalg.solve(want_l, yn), atol=1e-8)
        assert np.allclose(np.asarray(f["wo"][i]),
                           np.linalg.solve(want_l, np.ones(33)), atol=1e-8)
    q = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    for k in ("logdet", "qyy", "qoy", "qoo"):
        assert np.allclose(np.asarray(f[k]), np.asarray(q[k]), rtol=2e-6), k


def test_smallk_two_tile_interpret(rng, no_cache_writes):
    """n in (128, 256]: the small-K kernel pads to a 256 tile and runs a
    rolled loop; parity against the XLA path at n=150.

    `no_cache_writes`: persisting this giant unrolled executable
    segfaulted cold-cache full-lane runs (see the fixture docstring)."""
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    grams, y = _batch(rng, b=3, n=150)
    qx = chol_quadratics(grams, y, jitter=1e-8, use_pallas=False)
    qs = chol_quadratics_smallk(grams, y, jitter=1e-8, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qs[k]),
                           rtol=2e-6), k


def test_fused_mh_round_matches_sequential_oracle(rng):
    """The whole-round kernel reproduces the exact speculative-prefix MH
    decision (accept flags, first index, consumed count, new state)."""
    from ccgp_tpu.models import MixtureSpec, InverseGamma, LogNormal
    from ccgp_tpu.models.likelihood import make_logpost
    from ccgp_tpu.models.combination import (
        unpack, _effective_rates, mix_weights)
    from ccgp_tpu.ops.pallas_chol_smallk import fused_mix_mh_round
    import jax as _jax

    x = jnp.asarray(rng.uniform(size=(31, 2)))
    y = jnp.asarray(np.sin(6 * np.asarray(x[:, 0])) * np.asarray(x[:, 1]))
    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    t1p, t2p = LogNormal(-1.0, 1.0), InverseGamma(3, 4)
    lp = make_logpost(spec, x, y, 0.9, theta1_prior=t1p, theta2_prior=t2p,
                      jitter=1e-8)
    hits = set()
    for trial in range(10):
        scale = 0.4 + 0.5 * trial          # widen until both branches hit
        cands = jnp.asarray(rng.normal(size=(4, 4)) * scale)
        z = jnp.asarray(rng.normal(size=(4,)) * 0.3)
        out0 = lp(z)
        log_u = jnp.asarray(np.log(rng.uniform(size=4)))
        vals = np.array([float(lp(c).val) for c in cands])
        betas = np.array([float(lp(c).beta) for c in cands])
        acc = (vals - float(out0.val)) > np.asarray(log_u)
        params, log_jac = _jax.vmap(lambda c: unpack(spec, c))(cands)
        th1, th2 = _effective_rates(spec, params, predict=False)
        r1 = jnp.broadcast_to(jnp.reshape(th1, (4, -1)), (4, 2))
        r2 = jnp.broadcast_to(jnp.reshape(th2, (4, -1)), (4, 2))
        _, _, s = mix_weights(params.p)
        extra = (log_jac + jnp.sum(t1p.log_kernel(params.theta1), -1)
                 + t2p.log_kernel(params.theta2))
        got = fused_mix_mh_round(x, y, r1, r2, params.p, extra,
                                 jnp.log(s * 0.9), cands, out0.val,
                                 out0.beta, log_u, jitter=1e-8,
                                 interpret=True)
        if acc.any():
            f = int(np.argmax(acc))
            hits.add("acc")
            assert bool(got[3]) and int(got[4]) == f + 1
            assert np.allclose(np.asarray(got[0]), np.asarray(cands[f]),
                               atol=1e-9)
            assert abs(float(got[1]) - vals[f]) < 1e-6 * max(abs(vals[f]), 1)
            assert abs(float(got[2]) - betas[f]) < 1e-7
        else:
            hits.add("rej")
            assert not bool(got[3]) and int(got[4]) == 4
    assert hits == {"acc", "rej"}  # both branches exercised


@pytest.mark.slow
def test_smallk_two_tile_interpret_matches_xla(rng, no_cache_writes):
    """128 < n <= 256 routes through the blocked two-tile Schur core
    (`_chol_quad_core_2tile`): 128 unrolled panel steps + one MXU
    dot_general downdate + the unrolled single-tile core on the trailing
    block. Interpret-mode parity vs the XLA path (slow: the unrolled
    two-tile program is a multi-minute CPU compile)."""
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    grams, y = _batch(rng, b=3, n=150)
    # jitter 1e-6: an n=150 SE Gram is near-singular, so the blocked
    # core's different reduction order legitimately differs from the
    # sequential rank-1 order by ~kappa * eps in the quadratics
    qx = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    qs = chol_quadratics_smallk(grams, y, jitter=1e-6, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qs[k]),
                           rtol=1e-7), k


def test_rounds_kernel_beyond_envelope_rejected():
    """n > MAX_N (8 tiles) is out of the multi-round kernel's range
    entirely (stash at 128 < n <= MAX_N is supported since round 4 —
    the multi-tile core returns ASSEMBLED factors)."""
    import pytest as _pytest

    from ccgp_tpu.ops.pallas_chol_smallk import MAX_N, fused_mix_mh_rounds

    deltas = jnp.zeros((8, 4))
    log_u = jnp.zeros((2, 4))
    args = (jnp.zeros(4), 0.0, 0.0, 1.0, deltas, log_u, None)
    big = (jnp.zeros((MAX_N + 1, 2)), jnp.zeros((MAX_N + 1,))) + args
    with _pytest.raises(ValueError, match="multi-round"):
        fused_mix_mh_rounds(*big)


@pytest.mark.slow
def test_smallk_three_tile_interpret_matches_xla(rng, no_cache_writes):
    """256 < n routes through the RECURSIVE blocked multi-tile Schur core
    (128-step panel + MXU downdate per level). n=260 is the smallest
    three-level case: 128-panel -> 132-wide complement -> 128-panel ->
    4-wide single-tile core. Interpret-mode parity vs the XLA path (slow:
    the unrolled multi-tile program is a multi-minute CPU compile)."""
    from ccgp_tpu.ops.pallas_chol_smallk import chol_quadratics_smallk

    grams, y = _batch(rng, b=2, n=260)
    qx = chol_quadratics(grams, y, jitter=1e-6, use_pallas=False)
    qs = chol_quadratics_smallk(grams, y, jitter=1e-6, interpret=True)
    for k in qx:
        assert np.allclose(np.asarray(qx[k]), np.asarray(qs[k]),
                           rtol=1e-6), k

def test_smallk_dispatch_envelope():
    """dispatch_ok bounds the small-K kernel routing to the
    hardware-validated VMEM envelope: n <= 1024, K <= 16, and
    K * tiles^2 <= 256 budget units (K=4 @ n=1024 and K=16 @ n=512 are
    the widest on-chip-validated corners)."""
    from ccgp_tpu.ops.pallas_chol_smallk import (
        DISPATCH_BUDGET, DISPATCH_N_CAP, TILE, dispatch_ok)

    assert dispatch_ok(100, 4) and dispatch_ok(128, 16)
    assert dispatch_ok(512, 16)          # 16 * 4^2 = 256: at the budget
    assert not dispatch_ok(513, 16)      # 16 * 5^2 = 400: over it
    assert dispatch_ok(1024, 4)          # 4 * 8^2 = 256: at the budget
    assert not dispatch_ok(1024, 5)
    assert not dispatch_ok(DISPATCH_N_CAP + 1, 1)   # beyond the n cap
    assert not dispatch_ok(64, 17)                  # beyond the K cap
    # envelope formula self-consistency
    for n, k in [(512, 16), (1024, 4)]:
        tiles = -(-n // TILE)
        assert k * tiles * tiles == DISPATCH_BUDGET


def test_single_core_bit_identical(rng, monkeypatch, no_cache_writes):
    """Every single-tile core formulation — rowslab, its fused-pivot
    refinement, the shrinking-window core (skips downdates of finalized
    8-row slabs: the skipped write is `m - 0*llane`, value-preserving),
    the stacked-substitution shrink2, and the software-pipelined core
    (carries the corrected next pivot row, bit-equal by active-block
    symmetry) — computes every value with arithmetic identical to the
    rank-1 core, so outputs must be BIT-identical (np.array_equal:
    numeric equality, -0 == +0).

    Equality MUST be asserted through the compiled (interpret-mode)
    pallas_call, not by calling the cores eagerly: op-by-op dispatch
    lets XLA fuse `m - lrow*llane` into an fma (one rounding) or not,
    PER formulation, so eager outputs differ in ULPs while the compiled
    kernels agree (measured: rank-1 vs rowslab eager deltas ~5e-15 at
    n=7 f64). Interpret compiles of the big sizes cost ~1-2 min per
    core, so the sweep runs every core at the small sizes and only the
    DEFAULT core at the multi-slab/multitile-base sizes; the on-chip
    gate is scripts/verify_rowslab_tpu.py + scripts/ab_mhrounds_core.py
    (full-output equality at the bench shape for every core)."""
    import ccgp_tpu.ops.pallas_chol_smallk as smallk

    all_cores = (smallk._chol_quad_core_rowslab,
                 smallk._chol_quad_core_rowslab_fused,
                 smallk._chol_quad_core_shrink,
                 smallk._chol_quad_core_shrink2,
                 smallk._chol_quad_core_pipe)
    for n, cores in ((7, all_cores), (40, all_cores),
                     (100, (smallk._chol_quad_core_shrink,)),
                     (200, (smallk._chol_quad_core_shrink,))):
        grams, y = _batch(rng, b=4, n=n)
        monkeypatch.setattr(smallk, "_SINGLE_CORE", smallk._chol_quad_core)
        qa = smallk.chol_quadratics_smallk(grams, y, jitter=1e-8,
                                           interpret=True)
        for core in cores:
            monkeypatch.setattr(smallk, "_SINGLE_CORE", core)
            qb = smallk.chol_quadratics_smallk(grams, y, jitter=1e-8,
                                               interpret=True)
            for k in qa:
                assert np.array_equal(np.asarray(qa[k]),
                                      np.asarray(qb[k])), (core, n, k)


def test_multitile_core_stash_overshoot_rows(rng):
    """Rows > lane-tile in the multitile core: stash callers append wy/wo
    landing rows (pad8(n+2)) that overshoot the lane width exactly when n
    sits at / one below a tile multiple (n=255/256, 383/384, ...). The
    round-4 scaling sweep crashed at trace time on n=256 (the n=300
    on-chip gate missed the boundary); this pins the fix — the all-zero
    overshoot rows pass through as zeros and the factor quadratics match
    a dense f64 reference."""
    import ccgp_tpu.ops.pallas_chol_smallk as smallk

    for n in (255, 256, 384):
        tile = -(-n // smallk.TILE) * smallk.TILE
        ns = -(-(n + 2) // 8) * 8               # the rounds kernel's ns2
        assert ns > tile or n == 384            # 384+2 pads to 392 > 384
        ns = max(ns, tile + 8)                  # force the overshoot path
        b = 2
        a = rng.normal(size=(b, n, n))
        g = np.einsum("kij,kpj->kip", a, a) + n * np.eye(n)  # well-cond SPD
        m = np.zeros((b, ns, tile))
        for k in range(b):
            m[k, :n, :n] = g[k]
            for j in range(n, tile):
                m[k, j, j] = 1.0                # identity pad inside tile
        ry = np.zeros((b, 1, tile))
        ry[:, 0, :n] = rng.normal(size=n)
        ro = np.zeros((b, 1, tile))
        ro[:, 0, :n] = 1.0
        ld, qyy, qoy, qoo, mfin, wy, wo = smallk._chol_quad_core_multitile(
            jnp.asarray(m), jnp.asarray(ry), jnp.asarray(ro), n, b,
            jnp.float64)
        # overshoot rows come back as zeros; quadratics match dense f64
        assert mfin.shape == (b, ns, tile)
        assert np.all(np.asarray(mfin)[:, tile:, :] == 0.0)
        for k in range(b):
            chol = np.linalg.cholesky(m[k, :n, :n])
            from scipy.linalg import solve_triangular
            wyr = solve_triangular(chol, ry[k, 0, :n], lower=True)
            wor = solve_triangular(chol, ro[k, 0, :n], lower=True)
            assert np.allclose(float(ld[k, 0, 0]),
                               2 * np.log(np.diag(chol)).sum(), rtol=1e-9)
            assert np.allclose(float(qyy[k, 0, 0]), wyr @ wyr, rtol=1e-8)
            assert np.allclose(float(qoy[k, 0, 0]), wor @ wyr, rtol=1e-6,
                               atol=1e-10)
            assert np.allclose(float(qoo[k, 0, 0]), wor @ wor, rtol=1e-8)


def test_rounds_kernel_traces_at_tile_boundary_with_stash():
    """make_mh_rounds' kernel path must TRACE at the stash-overshoot
    boundary sizes (jax.eval_shape: no compile, catches exactly the
    class of crash the round-4 sweep hit at n=256)."""
    import jax as _jax

    import ccgp_tpu.models.likelihood as _lk
    import ccgp_tpu.ops.pallas_chol_smallk as sk
    from ccgp_tpu.models import InverseGamma, LogNormal, MixtureSpec

    spec = MixtureSpec(kernels.sqexp_family(), kernels.sqexp_family(),
                       dim=2, rough="tied", anisotropic=True)
    rng = np.random.default_rng(0)
    n = 256
    x = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.sin(3 * x[:, 0])
    R, K, dim = 4, 4, 4
    f32 = jnp.float32
    orig_backend = _jax.default_backend
    try:
        # the kernel-vs-fallback dispatch reads the backend at CALL time
        _jax.default_backend = lambda: "tpu"
        rounds_k = _lk.make_mh_rounds(
            spec, x, y, jnp.asarray(0.05), stash=True,
            theta1_prior=LogNormal(-1, 1), theta2_prior=InverseGamma(3, 4),
            jitter=1e-6)
        out = jax.eval_shape(
            rounds_k,
            jax.ShapeDtypeStruct((dim,), f32),
            jax.ShapeDtypeStruct((), f32),
            jax.ShapeDtypeStruct((), f32),
            jax.ShapeDtypeStruct((R * K, dim), f32),
            jax.ShapeDtypeStruct((R, K), f32))
    finally:
        _jax.default_backend = orig_backend
    ns2 = -(-(n + 2) // 8) * 8
    assert out["stash"].shape == (R, ns2, 256)
