from raw_ngp_tpu.utils.cameras import create_dodecahedron_cameras, rand_poses
from raw_ngp_tpu.utils.logging import (
    RunLogger,
    ThroughputMeter,
    profiler_trace,
)
