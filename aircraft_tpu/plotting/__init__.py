from aircraft_tpu.plotting.plotting import TrajectoryPlotter, plot_convergence

__all__ = ["TrajectoryPlotter", "plot_convergence"]
