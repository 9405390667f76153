"""Code-definition layer: H builders, toy fixtures, layout compiler."""
from .code import LDPCCode, expand_qc, gf2_rank, has_4cycle  # noqa: F401
from .layout import EdgeLayout, QCLayout, compile_edge_layout, compile_qc_layout  # noqa: F401
from .peg import (count_6cycles, count_8cycles,  # noqa: F401
                  degrees_from_profile, girth,
                  pbrl_construct, peg_construct, qc_peg_best,
                  qc_peg_construct)
