from .generators import (
    laplace2d, laplace3d, laplace2d_neumann, laplace3d_neumann,
    darcy2d, darcy3d, stokes2d, stokes3d, create_matrix, create_testvector,
    create_nullspace,
)

__all__ = [
    "laplace2d", "laplace3d", "laplace2d_neumann", "laplace3d_neumann",
    "darcy2d", "darcy3d", "stokes2d", "stokes3d", "create_matrix",
    "create_testvector", "create_nullspace",
]
