from .csvdialect import (  # noqa: F401
    FluxmapMetadata,
    FluxmapWriter,
    fluxmap_filename,
    read_fluxmap,
    timestamp,
    unique_filename,
)
from .profiling import PhaseTimer, annotate, device_trace  # noqa: F401
from .progress import EtaTracker, debug_stamp, notify_bell, position_line  # noqa: F401
