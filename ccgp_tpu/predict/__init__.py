from ccgp_tpu.predict.factors import FactorCache, build_factors
from ccgp_tpu.predict.posterior import (
    predictive_moments,
    posterior_predict,
    PosteriorPrediction,
)
