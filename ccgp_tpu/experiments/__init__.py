"""The eight reference case-study workflows as thin configs over the
framework (one module per reference script; see each module's docstring for
the file:line mapping)."""

from ccgp_tpu.experiments.common import StudyResult, run_study
from ccgp_tpu.experiments import (
    sim_1d,
    sim_1d_two_families,
    sim_2d_iso,
    sim_2d_iso_advanced,
    sim_2d_aniso,
    batch_me_design,
    heat_exchanger,
    ground_vibrations,
    sim_2d_sweep,
)
