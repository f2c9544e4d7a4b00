from ccgp_tpu.models.priors import InverseGamma, LogNormal, Uniform01, JeffreysUnit
from ccgp_tpu.models.combination import (
    MixtureSpec,
    MixParams,
    mix_weights,
    mixed_gram,
    mixed_cross,
    unpack,
    pack,
)
from ccgp_tpu.models.likelihood import (
    gls_beta,
    sigma2_mle,
    profile_nll,
    LogPost,
    make_logpost,
    make_logpost_batch,
)
from ccgp_tpu.models.kriging import kriging_predict, KrigingPrediction
from ccgp_tpu.models.composite_gp import (
    cgp_fit,
    cgp_predict,
    CGPFit,
    CGPPrediction,
)
from ccgp_tpu.models.combined_gp import (
    MCMCConfig,
    CombinedGPFit,
    fit_combined_gp,
    predict_combined_gp,
)
