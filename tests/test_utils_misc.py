import jax.numpy as jnp
import numpy as np

from ccgp_tpu.models.combination import MixtureSpec
from ccgp_tpu.ops import kernels
from ccgp_tpu.utils import stats, transforms


def test_tanh_box_roundtrip(rng):
    lo = jnp.asarray([-1.0, 0.0])
    hi = jnp.asarray([1.0, 5.0])
    x = jnp.asarray([[0.3, 4.2], [-0.99, 0.01]])
    z = transforms.tanh_box_inverse(x, lo, hi)
    back = transforms.tanh_box(z, lo, hi)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-6)
    # stays strictly inside the box for any z
    big = transforms.tanh_box(jnp.asarray([100.0, -100.0]), lo, hi)
    assert float(big[0]) <= 1.0 and float(big[1]) >= 0.0


def test_logit_jacobian_matches_reference_expression():
    # reference log-jacobian: -phi - 2 log(1 + e^{-phi})
    for phi in [-30.0, -2.0, 0.0, 3.0, 40.0]:
        p, jac = transforms.logit_to_unit(jnp.asarray(phi))
        if abs(phi) < 20:
            want = -phi - 2 * np.log(1 + np.exp(-phi))
            assert np.isclose(float(jac), want, rtol=1e-10)
        assert np.isfinite(float(jac))  # stable at extreme phi


def test_batch_se_iid(rng):
    x = jnp.asarray(rng.normal(size=2000))
    se = float(stats.batch_se(x, batch_size=20))
    # iid: SE of the mean ~ 1/sqrt(n)
    assert 0.5 / np.sqrt(2000) < se < 2.5 / np.sqrt(2000)


def test_quantile_type7_matches_r_default(rng):
    x = rng.normal(size=57)
    got = float(stats.quantile_type7(jnp.asarray(x), 0.3))
    want = np.quantile(x, 0.3)  # numpy 'linear' == R type 7
    assert np.isclose(got, want, rtol=1e-12)


def test_mixture_spec_n_params():
    fam = kernels.sqexp_family()
    assert MixtureSpec(fam, fam, dim=2).n_params == 3
    assert MixtureSpec(fam, fam, dim=2, rough="tied",
                       anisotropic=True).n_params == 4
    assert MixtureSpec(fam, fam, dim=9).n_params == 3


def test_mvn_logpdf_chol_scale(rng):
    import scipy.stats
    from ccgp_tpu.ops import linalg

    n = 7
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    y = rng.normal(size=n)
    ls = 0.8
    ch = linalg.jitter_cholesky(jnp.asarray(cov))
    got = float(stats.mvn_logpdf_chol(jnp.asarray(y), 0.0, ch, ls))
    want = scipy.stats.multivariate_normal(
        mean=np.zeros(n), cov=np.exp(ls) * cov).logpdf(y)
    assert np.isclose(got, want, rtol=1e-10)


def test_masked_quantile_pair_topk_equals_sort():
    """The dual-top_k tail path must be element-equal to two full-sort
    masked_quantile calls for uneven per-row valid counts."""
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils import stats

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(37, 400)))
    valid = jnp.asarray(rng.uniform(size=(37, 400)) > 0.15)
    # guarantee at least one valid entry per row
    valid = valid.at[:, 0].set(True)
    for q_lo, q_hi in [(0.025, 0.975), (0.005, 0.995), (0.25, 0.75)]:
        lo2, hi2 = stats.masked_quantile_pair(x, valid, q_lo, q_hi)
        lo1 = jax.vmap(lambda c, v: stats.masked_quantile(c, v, q_lo))(
            x, valid)
        hi1 = jax.vmap(lambda c, v: stats.masked_quantile(c, v, q_hi))(
            x, valid)
        assert np.array_equal(np.asarray(lo1), np.asarray(lo2)), (q_lo, q_hi)
        assert np.array_equal(np.asarray(hi1), np.asarray(hi2)), (q_lo, q_hi)

def test_masked_quantile_pair_all_invalid_row():
    """An all-invalid row must return +big at BOTH endpoints on the
    top_k tail path (matching the sort path); before the round-3 fix the
    'hi' tail read its -big-filled selection buffer and inverted the
    interval."""
    import jax
    import jax.numpy as jnp

    from ccgp_tpu.utils import stats

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(4, 300)))
    valid = jnp.ones((4, 300), bool).at[2].set(False)
    lo, hi = stats.masked_quantile_pair(x, valid, 0.025, 0.975)
    lo1 = jax.vmap(lambda c, v: stats.masked_quantile(c, v, 0.025))(x, valid)
    hi1 = jax.vmap(lambda c, v: stats.masked_quantile(c, v, 0.975))(x, valid)
    assert np.array_equal(np.asarray(lo), np.asarray(lo1))
    assert np.array_equal(np.asarray(hi), np.asarray(hi1))
    assert float(lo[2]) == float(hi[2]) and float(lo[2]) > 1e30
    ok = np.asarray(valid.any(-1))
    assert np.all(np.asarray(lo)[ok] <= np.asarray(hi)[ok])


def test_lane_delegation_hook(monkeypatch, tmp_path):
    """The whole-suite lane MUST delegate to per-file subprocesses (the
    long-process native-heap crash fix, conftest.pytest_cmdline_main) —
    this pins the trigger condition, option forwarding, the
    no-recursion/cache-write env contract, and the exit-code logic
    without spawning real pytest processes."""
    import subprocess
    import types

    import conftest

    calls = []

    def fake_run(cmd, cwd=None, env=None, capture_output=None, text=None):
        calls.append({"cmd": cmd, "env": env})
        rc = 1 if "test_linalg.py" in cmd[3] and fake_run.fail_linalg else 0
        return types.SimpleNamespace(returncode=rc,
                                     stdout="1 passed in 0.1s\n", stderr="")

    fake_run.fail_linalg = False
    monkeypatch.setattr(subprocess, "run", fake_run)
    # when THIS test runs inside a real delegated lane subprocess the
    # no-recursion marker is already set — clear it so the hook under
    # test sees the top-level configuration
    monkeypatch.delenv("CCGP_LANE_INPROC", raising=False)

    class Opt:
        exitfirst = False
        maxfail = 0

    class Cfg:
        args = ["tests"]
        invocation_params = types.SimpleNamespace(args=("tests", "-q", "-m",
                                                        "slow"))
        option = Opt()

    # 1) whole-suite target delegates: one subprocess per test file, with
    # options forwarded and the env contract set
    rc = conftest.pytest_cmdline_main(Cfg())
    assert rc == 0
    import pathlib

    n_files = len(list((pathlib.Path(conftest.__file__).parent
                        ).glob("test_*.py")))
    assert len(calls) == n_files >= 20
    first = calls[0]
    assert first["cmd"][:3] == [__import__("sys").executable, "-m",
                               "pytest"]
    assert "-q" in first["cmd"] and "-m" in first["cmd"] \
        and "slow" in first["cmd"]
    assert first["env"]["CCGP_LANE_INPROC"] == "1"
    assert first["env"]["CCGP_CACHE_WRITES"] == "1"

    # 2) a failing file makes the lane fail
    calls.clear()
    fake_run.fail_linalg = True
    assert conftest.pytest_cmdline_main(Cfg()) == 1

    # 3) lane subprocesses themselves run in-process (no recursion)
    monkeypatch.setenv("CCGP_LANE_INPROC", "1")
    assert conftest.pytest_cmdline_main(Cfg()) is None
    monkeypatch.delenv("CCGP_LANE_INPROC")

    # 4) targeted file invocations run in-process
    class CfgFile(Cfg):
        args = ["tests/test_linalg.py"]

    assert conftest.pytest_cmdline_main(CfgFile()) is None
    # 5) node-id targets too
    class CfgNode(Cfg):
        args = ["tests/test_linalg.py::test_tri_solve"]

    assert conftest.pytest_cmdline_main(CfgNode()) is None
