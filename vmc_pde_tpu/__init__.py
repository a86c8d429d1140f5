"""vmc_pde_tpu: a TPU-native (JAX/XLA/pjit/Pallas) framework for solving
time-dependent PDEs for probability densities with invertible-flow neural
ansatze evolved by TDVP Monte-Carlo.

Ground-up rebuild of the capabilities of RehMoritz/vmc_pde
(arXiv:2206.01927); see SURVEY.md at the repo root for the layer map and
component inventory, and README.md for usage.
"""

from .config import PRESETS, RunConfig, preset
from .models.coupling import BlockSpec
from .models.flow import Flow, build_flow
from .models.state import VarState, make_var_state
from .ops import evolution
from .ops.evolution import make_equation
from .parallel.mesh import MeshConfig, ParallelCtx
from .sampling.sampler import Sampler
from .solver.steppers import AdaptiveHeun, FixedStepper
from .solver.tdvp import TDVP, TDVPConfig
from .utils.dtypes import Precision
from .utils.grid import Grid
from .utils.infos import InfoRecorder, load_infos, store_infos
from .utils.timings import Timings

__version__ = "0.2.0"

__all__ = [
    "AdaptiveHeun", "BlockSpec", "FixedStepper", "Flow", "Grid",
    "InfoRecorder", "MeshConfig", "ParallelCtx", "PRESETS", "Precision",
    "RunConfig", "Sampler", "TDVP", "TDVPConfig", "Timings", "VarState",
    "build_flow", "evolution", "load_infos", "make_equation",
    "make_var_state", "preset", "store_infos",
]
