from ccgp_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from ccgp_tpu.parallel.sharded import (
    sharded_hyperpar_scan,
    sharded_design_sweep,
    multi_chain_metropolis,
    distributed_train_step,
    sharded_posterior_predict,
)
