"""Dense quadrature grid for normalization checks and 2D plotting.
Parity with vmc_fluids/grid.py:7-28."""

from __future__ import annotations

import numpy as np


class Grid:
    def __init__(self, bounds, n_gridpoints: int, sym: bool = True):
        bounds = np.asarray(bounds, dtype=np.float64)
        self.sym = sym
        self.dim = bounds.shape[0]
        self.bounds = bounds
        self.n_gridpoints = int(n_gridpoints)
        self.widths = (2 * bounds if sym else bounds) / self.n_gridpoints
        self.bin_area = float(np.prod(self.widths))

        if sym:
            self.range = [[-b, b] for b in bounds]
            self.vals = [
                np.arange(-b, b, w) for b, w in zip(bounds, self.widths)
            ]
        else:
            self.range = [[0, b] for b in bounds]
            self.vals = [
                np.arange(0, b, w) for b, w in zip(bounds, self.widths)
            ]

        self.meshgrid = np.meshgrid(*self.vals)
        self.coords = (
            np.moveaxis(np.array(self.meshgrid), 0, -1)
            .reshape(self.n_gridpoints**self.dim, self.dim)
        )
