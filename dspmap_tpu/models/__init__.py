"""Map variants and the per-frame pipeline.

The reference selects among its three single-header variants at compile time
(``src/map_sim_example.cpp:22``); here a variant is just a
:class:`~dspmap_tpu.config.MapConfig` preset driving one parameterized
pipeline (`pipeline.make_step`).
"""

from .pipeline import (  # noqa: F401
    Frame,
    StepOutput,
    make_step,
    make_multisensor_step,
    init_multisensor_state,
    get_occupancy_map,
    read_occupancy,
)
from ..config import (  # noqa: F401
    dsp_dynamic,
    dsp_dynamic_multi_neighbors,
    dsp_static,
    example_node_settings,
)
