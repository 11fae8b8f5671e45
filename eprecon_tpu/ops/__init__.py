from eprecon_tpu.ops.grid import generate_grid, coordinates  # noqa: F401
