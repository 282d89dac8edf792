from align3d_tpu.optim.gauss_newton import GNSystem, solve_spd, huber_weight

__all__ = ["GNSystem", "solve_spd", "huber_weight"]
