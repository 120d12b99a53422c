"""Pure geometry/tile kernels (NumPy + Spark Column expressions)."""
