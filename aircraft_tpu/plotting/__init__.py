from aircraft_tpu.plotting.plotting import (TrajectoryPlotter, aero_polars,
                                            plot_convergence, plot_polars)

__all__ = ["TrajectoryPlotter", "plot_convergence", "aero_polars",
           "plot_polars"]
