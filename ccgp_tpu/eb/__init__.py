from ccgp_tpu.eb.halton import halton
from ccgp_tpu.eb.hyperpriors import (
    marginal_likelihood,
    choose_hyperpars,
    HyperparChoice,
)
