from ccgp_tpu.infer.optim import minimize_bfgs, multistart_minimize
from ccgp_tpu.infer.laplace import laplace
from ccgp_tpu.infer.mle import (kriging_mle, kriging_mle_grid, mlegp_fit,
                                KrigingMLE)
from ccgp_tpu.infer.geweke import geweke_z, geweke_pvalue, spectrum0_ar
from ccgp_tpu.infer.metropolis import metropolis, MetropolisResult
from ccgp_tpu.infer.diagnostics import gelman_rubin, effective_sample_size
from ccgp_tpu.infer.hmc import hmc, HMCResult
