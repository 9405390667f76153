from .impsamp import (ISEstimate, estimate_fer, harvest_error_supports,
                      make_is_run)
from .pipeline import BatchCounters, make_run_batch, select_decoder
from .stats import SnrPoint, rates_compatible, wilson_interval
from .sweep import Sweep, SweepResult, build_code

__all__ = ["make_run_batch", "select_decoder", "BatchCounters", "SnrPoint",
           "wilson_interval", "rates_compatible", "Sweep", "SweepResult",
           "build_code", "ISEstimate", "estimate_fer",
           "harvest_error_supports", "make_is_run"]
