from ccgp_tpu.eval.functions import test_function_1d, test_function_2d, test_function_batch
from ccgp_tpu.eval.datasets import (
    load_qian,
    load_ground_vibrations,
    load_maximin_2d,
    load_1d_designs,
    load_hyperpars_grid,
    load_initial_me_design,
    load_design_txt,
    load_gv_archived_results,
)
from ccgp_tpu.eval.compare import comparison_summary, ComparisonSummary
