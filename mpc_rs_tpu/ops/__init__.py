from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_partials, mppi_solve_pallas

__all__ = ["mppi_pallas_partials", "mppi_solve_pallas"]
