from .rays import RayPaths, plot_rays, print_census, trace_paths  # noqa: F401
