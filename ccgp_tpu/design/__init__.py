from ccgp_tpu.design.entropy import (
    me_criterion,
    augmented_me_criterion,
)
from ccgp_tpu.design.optimize import me_design, batch_me_design, DesignResult
from ccgp_tpu.design.lhs import random_lhs, maximin_lhs
from ccgp_tpu.design.kmedoids import kmedoids
