from ccgp_tpu.utils import transforms, stats
