from .linsolve import dense_solve, lu_solve_gauss

__all__ = ["dense_solve", "lu_solve_gauss"]
