import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from ccgp_tpu.eval import (
    load_qian, load_ground_vibrations, load_maximin_2d, load_1d_designs,
    load_hyperpars_grid, load_initial_me_design, load_gv_archived_results,
    comparison_summary,
)
from ccgp_tpu.eval.compare import ModelPrediction
from ccgp_tpu.eval.functions import (
    test_function_1d as f1d, test_function_2d as f2d)
from ccgp_tpu.infer import kriging_mle
from ccgp_tpu.models import kriging_predict
from ccgp_tpu.ops import kernels
import pytest


def test_kriging_predict_interpolates(rng):
    x = jnp.asarray(rng.uniform(size=(20, 2)))
    y = f2d(x, 3)
    fam = kernels.sqexp_family()
    fit = kriging_mle(fam, x, y, jax.random.PRNGKey(0))
    pred = kriging_predict(fam, x, y, fit, x, alpha=0.05)
    # GP interpolates the training points; variance ~ 0 there
    assert np.allclose(np.asarray(pred.mean), np.asarray(y), atol=1e-5)
    assert np.all(np.asarray(pred.var) < 1e-5)


@pytest.mark.slow
def test_kriging_t_interval_width(rng):
    x = jnp.asarray(np.linspace(0, 1, 10)[:, None])
    y = f1d(x[:, 0], 2)
    fam = kernels.matern_family(5.0)
    fit = kriging_mle(fam, x, y, jax.random.PRNGKey(0))
    xn = jnp.asarray(np.linspace(0.03, 0.97, 17)[:, None])
    pred = kriging_predict(fam, x, y, fit, xn, alpha=0.05)
    # t_{n-1} interval: upper - mean = t_q * sd
    tq = scipy.stats.t.ppf(0.975, 9)
    sd = np.sqrt(np.asarray(pred.var))
    assert np.allclose(np.asarray(pred.upper) - np.asarray(pred.mean),
                       tq * sd, rtol=1e-9)
    # truth mostly inside the intervals
    yt = np.asarray(f1d(xn[:, 0], 2))
    cov = np.mean((yt >= np.asarray(pred.lower)) & (yt <= np.asarray(pred.upper)))
    assert cov >= 0.8


def test_datasets_shapes():
    q = load_qian()
    assert q["x_train"].shape == (64, 4) and q["y_train"].shape == (64,)
    assert q["x_test"].shape == (14, 4)
    gv = load_ground_vibrations(50, 1)
    assert gv["x_train"].shape == (50, 9)
    assert gv["x_test"].shape == (150, 9)
    assert load_maximin_2d(14).shape == (14, 2)
    assert load_maximin_2d(100).shape == (100, 2)
    # reference ReadMe claims 100 designs; the shipped file has 201 rows
    d1 = load_1d_designs()
    assert d1.shape[1] == 8 and d1.shape[0] >= 100
    assert load_hyperpars_grid("2d").shape == (60, 4)
    assert load_hyperpars_grid("heat").shape == (624, 4)
    assert load_initial_me_design().shape == (14, 2)


def test_gv_archived_baseline_numbers():
    """Recompute BASELINE.md's golden numbers from the archived reference
    output table."""
    cols, tab = load_gv_archived_results()
    assert tab.shape == (150, 20)
    get = lambda name: tab[:, cols.index(name) - 0]
    y = get("y.true")
    preds = {
        "combined": ModelPrediction(get("y.hat.Combined"), get("LL.Combined"),
                                    get("UL.Combined"), get("Quant.Combined")),
        "single": ModelPrediction(get("y.hat.single"), get("LL.single"),
                                  get("UL.single")),
        "cgp": ModelPrediction(get("y.hat.CGP"), get("LL.CGP"), get("UL.CGP")),
    }
    s = comparison_summary(y, preds)
    assert np.isclose(s.rmspe["combined"], 2.722, atol=2e-3)
    assert np.isclose(s.rmspe["single"], 2.687, atol=2e-3)
    assert np.isclose(s.rmspe["cgp"], 2.856, atol=2e-3)
    assert np.isclose(s.coverage["combined"], 0.973, atol=1e-3)
    assert np.isclose(s.coverage["single"], 0.867, atol=1e-3)
    assert np.isclose(s.coverage["cgp"], 0.727, atol=1e-3)
    assert np.isclose(s.average_quantile, 0.503, atol=1e-3)


def test_functions_match_r_forms():
    # spot values computed by hand from the R expressions
    assert np.isclose(float(f1d(jnp.asarray(0.3), 2)),
                      np.sin(3.0))
    x, y = 0.4, 0.6
    want = ((x - 0.2) ** 2 - (y - 0.7) ** 2) * np.exp(
        -5 * ((x - 0.8) ** 2 + (y - 0.1) ** 2)) * np.cos(10 * (x - 0.5) * y)
    assert np.isclose(float(f2d(jnp.asarray([x, y]), 2)), want)
