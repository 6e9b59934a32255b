from .mesh import (  # noqa: F401
    init_distributed,
    RAY_AXIS,
    make_mesh,
    replicate,
    scene_spec,
    sharded_exit_histogram,
    sharded_fluxmap,
    sharded_param_sweep,
    sharded_retrace,
    sharded_retrace_binomial,
    sharded_score_traced,
    sharded_trace,
)
