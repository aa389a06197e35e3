"""Per-frame kernels of the DSP-map signal chain.

Each module implements one stage of the reference's update cycle
(`include/dsp_dynamic.h`, see SURVEY.md section 2.2) as pure, fixed-shape JAX:

* :mod:`.common`   -- masked compaction / group-rank primitives
* :mod:`.insert`   -- capacity-limited particle insertion (slot allocation)
* :mod:`.propagate`-- constant-velocity / static prediction
* :mod:`.rebin`    -- voxel reassignment after motion (move-or-vanish)
* :mod:`.project`  -- observation binning into FOV pyramids
* :mod:`.fov`      -- particle registration into FOV pyramids
* :mod:`.update`   -- SMC-PHD measurement update (the hot kernel)
* :mod:`.birth`    -- Dempster-Shafer guided particle birth
* :mod:`.occupancy`-- occupancy extraction, future prediction, resampling
* :mod:`.cluster`  -- Euclidean clustering as grid-free label propagation
* :mod:`.assignment` -- batched auction assignment (Munkres replacement)
"""
